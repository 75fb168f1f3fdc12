"""Orchestration — the engine's equivalent of the reference's three
binaries (SURVEY §3):

    importer   → ``run_import``   (WAT paths → link/page parquet per segment)
    compacting → ``run_compact``  (segment links → compacted parquet)
    storelinks → ``run_store``    (compacted → partitioned serving table)

plus ``query_links`` standing in for the linksapi HTTP endpoint (an HTTP
layer would wrap it 1:1 — the query surface is operators/linkdb.py).

Idempotent restart (reference: skip WAT file if its output exists,
cmd/importer/main.go:227-234; mark segment done if sort_N exists,
wat.go:1053-1062) maps to *segment-level output existence* here: a
segment whose ``_SUCCESS`` marker exists is skipped. Spark's atomic
job-commit protocol makes the marker trustworthy — a killed run leaves
no _SUCCESS and the rerun overwrites cleanly. Per-file checkpointing
(finer grain) is available via streaming.ingest.stream_ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from globallinks_spark.operators import compact as C
from globallinks_spark.operators import extract as X
from globallinks_spark.operators.linkdb import LinkQuery, get_domain_links
from globallinks_spark.sources import serving as SV
from globallinks_spark.sources.wat import read_wat_pages


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def run_import(
    spark: SparkSession,
    wat_paths: list[str],
    out_dir: str,
    segment: str,
    save_pages: bool = False,
) -> None:
    """One segment: WAT files → 14-col link parquet (+ optional pages).
    One Spark task per WAT file (the reference's goroutine-per-file
    parallelism, main.go:272-291, without the hand-rolled pool)."""
    links_out = os.path.join(out_dir, "links", f"segment={segment}")
    if _done(links_out):
        return
    pages = read_wat_pages(spark, wat_paths)
    X.extract_links(pages).write.mode("overwrite").parquet(links_out)
    if save_pages:
        pages_out = os.path.join(out_dir, "pages", f"segment={segment}")
        X.extract_pages(pages).write.mode("overwrite").parquet(pages_out)


def run_compact(spark: SparkSession, out_dir: str, segment: str) -> None:
    """Segment finalize: distinct (A4) + group-merge (A5) → 16-col
    compacted parquet (compactSegmentData, main.go:507-564)."""
    compact_out = os.path.join(out_dir, "compact", f"segment={segment}")
    if _done(compact_out):
        return
    links = spark.read.parquet(
        os.path.join(out_dir, "links", f"segment={segment}")
    )
    C.compact_segment(links).write.mode("overwrite").parquet(compact_out)


def run_store(
    spark: SparkSession, out_dir: str, serving_path: str,
    buckets: int = SV.DEFAULT_BUCKETS,
) -> None:
    """All compacted segments → one domain-bucketed serving table
    (storelinks, cmd/storelinks/main.go:74-178; the F16 domain
    re-validation rides along)."""
    from globallinks_spark.functions.predicates import domain_is_valid
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(out_dir, "compact"))
    df = df.filter(domain_is_valid(F.col("link_domain")))
    SV.write_serving_table(df.drop("segment"), serving_path, buckets)


def query_links(
    spark: SparkSession, serving_path: str, request: LinkQuery,
) -> DataFrame:
    """The POST /api/links surface (§3.3): partition-pruned scan →
    filter → merge → sort → paginate. The bucket layout comes from the
    table's own metadata — callers can't desync it."""
    from globallinks_spark.functions.urltools import _etld1_one

    # prune on the registrable domain — the table is bucketed by eTLD+1;
    # a 'www.x.com' query must land in x.com's bucket (the sub_domain
    # equality is applied row-level by get_domain_links)
    parsed = _etld1_one(request.domain.lower()) or request.domain.lower()
    table = SV.read_serving_table(spark, serving_path, domain=parsed)
    return get_domain_links(table, request)
