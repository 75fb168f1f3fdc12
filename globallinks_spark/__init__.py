"""globallinks_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kris-dev-hub/globallinks.

The reference (read-only snapshot at /root/reference) is a Go batch ELT
pipeline over Common Crawl WAT archives plus a backlink query API. This
package re-expresses every operator in idiomatic PySpark (DataFrame/SQL,
Catalyst-optimized) — it is a new engine, not a port. See SURVEY.md for the
operator inventory and file:line citations into the reference.

Layout:
    session     — tuned SparkSession builder (AQE, shuffle sizing, Arrow)
    config      — blocklists / constants (semantics of reference pkg/config)
    schemas     — explicit StructTypes for every persisted record shape
    sources/    — WAT envelope reader, pipe-text reader/writer, parquet IO
    functions/  — URL kernel, predicates, cross-engine hashing, text & vector
                  expression builders (built-in F.* first; one pandas UDF)
    operators/  — extract, compact, linkdb (query API), dedup, similarity,
                  multimodal — the engine's relational + ML-prep surface
    streaming/  — Structured Streaming ingest & windowed aggregation
    plans/      — plan-inspection helpers (pushdown / broadcast asserts)
"""

__version__ = "0.1.0"
