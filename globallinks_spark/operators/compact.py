"""Dedup + compaction — A4 (segment distinct) and A5 (group-merge).

A4: the reference shells out to ``zcat tmp/*.txt.gz | sort -u -S 1G | gzip``
(/root/reference/cmd/importer/main.go:372-386) — a global external sort
whose only *semantic* content is whole-row dedup. Spark's ``distinct()``
expresses that as a partial-aggregate → shuffle → final-aggregate plan
(Tungsten external sort/spill replacing ``sort -S 1G`` + lzop, SURVEY §4
X1/X2) without the global ordering A5 no longer needs.

A5: the reference streams sorted rows and merges adjacent rows sharing
(link_domain, link_sub_domain, link_path, link_raw_query, page_host)
(``aggressiveCompacting`` + ``compareRecords``, main.go:389-476, 567-609).
The merge rules, re-expressed order-free:

- dofollow preference: when a group has any no_follow=0 row, its
  no_follow=1 rows are discarded entirely — their dates/ip/qty never merge
  (main.go:578-580). Implemented as a min-over-window filter *before* the
  aggregation, exactly matching the reference's skip.
- date_from = min, date_to = max over surviving rows (main.go:583-588).
- ip = "latest record" (main.go:591). The reference takes the last merged
  row in file order, which is not reproducible order-free; the engine's
  deterministic spec is the ip of the max (date_imported, ip) row.
- representative page_path/page_raw_query = shortest path, then shortest
  query (main.go:593-603) — deterministic spec: lexicographically smallest
  (length(path), length(query), path, query).
- qty = number of distinct (page_path, page_raw_query) variants
  (main.go:604 increments per variant change against the evolving
  representative; distinct-count is the order-free equivalent, ≥1).
- remaining columns (schemes, text, no_index) = first surviving row in the
  reference's whole-line sort order.

Known deviation (documented): when a group's rows interleave with other
groups under whole-line sort (same 5-key group split by link_scheme), the
reference emits multiple partial rows; the groupBy merges them fully. The
merged output dominates (it is what the docs LINKDB.md:203-204 describe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GROUP_KEYS = (
    "link_domain", "link_sub_domain", "link_path", "link_raw_query",
    "page_host",
)

# Reference tie-break order = whole-line string sort of the remaining
# fields in pipe order (link_scheme sorts before the page columns).
_LINE_ORDER = (
    "link_scheme", "page_path", "page_raw_query", "page_scheme",
    "link_text", "no_follow", "no_index", "date_imported", "ip",
)


def segment_distinct(links: DataFrame) -> DataFrame:
    """A4 — whole-row dedup across a segment's per-file link outputs."""
    return links.distinct()


def compact_links(links: DataFrame) -> DataFrame:
    """A5 — 14-col link rows → 16-col compacted rows.

    Two-phase aggregation, chosen for the shuffle profile at 100 TB:

    phase 1 groups by (GROUP_KEYS, no_follow) — a plain hash aggregate,
    so Tungsten's partial (map-side) aggregation collapses duplicate
    links *before* the shuffle; phase 2 reduces the ≤2 rows per key
    (one per no_follow value) with ``min_by(..., no_follow)``, which IS
    the dofollow-preference rule: when a dofollow row exists, the
    nofollow row's dates/ip/qty are discarded wholesale, exactly like
    the reference's skip (main.go:578-580).

    The alternative — a min-over-window prefilter — needs a full-data
    shuffle+sort with no partial aggregation; on Zipfian link_domain
    keys that is strictly worse. Phase 2's shuffle moves at most 2 rows
    per group of already-aggregated data.
    """
    first_order = F.struct(*[F.col(c) for c in _LINE_ORDER])
    rep_order = F.struct(
        F.length("page_path").alias("lp"),
        F.length("page_raw_query").alias("lq"),
        F.col("page_path"), F.col("page_raw_query"),
    )
    rep_value = F.struct(F.col("page_path"), F.col("page_raw_query"))
    latest_order = F.struct(F.col("date_imported"), F.col("ip"))

    per_class = links.groupBy(*GROUP_KEYS, "no_follow").agg(
        F.min_by(F.col("link_scheme"), first_order).alias("link_scheme"),
        F.min_by(rep_value, rep_order).alias("_rep"),
        F.min_by(F.col("page_scheme"), first_order).alias("page_scheme"),
        F.min_by(F.col("link_text"), first_order).alias("link_text"),
        F.min_by(F.col("no_index"), first_order).alias("no_index"),
        F.min("date_imported").alias("date_from"),
        F.max("date_imported").alias("date_to"),
        F.max_by(F.col("ip"), latest_order).alias("ip"),
        F.countDistinct("page_path", "page_raw_query").cast("int").alias("qty"),
    )

    payload = F.struct(
        "link_scheme", "_rep", "page_scheme", "link_text", "no_follow",
        "no_index", "date_from", "date_to", "ip", "qty",
    )
    best = per_class.groupBy(*GROUP_KEYS).agg(
        F.min_by(payload, F.col("no_follow")).alias("p")
    )
    return best.select(
        "link_domain", "link_sub_domain", "link_path", "link_raw_query",
        F.col("p.link_scheme").alias("link_scheme"), "page_host",
        F.col("p._rep.page_path").alias("page_path"),
        F.col("p._rep.page_raw_query").alias("page_raw_query"),
        F.col("p.page_scheme").alias("page_scheme"),
        F.col("p.link_text").alias("link_text"),
        F.col("p.no_follow").alias("no_follow"),
        F.col("p.no_index").alias("no_index"),
        F.col("p.date_from").alias("date_from"),
        F.col("p.date_to").alias("date_to"),
        F.col("p.ip").alias("ip"),
        F.col("p.qty").alias("qty"),
    )


def compact_segment(links: DataFrame) -> DataFrame:
    """Full segment finalize (compactSegmentData, main.go:507-564).

    The reference runs A4 (``sort -u``) before A5 because its streaming
    merge needs sorted, de-duplicated input. The group-merge itself does
    not: every A5 aggregate — min/max dates, min_by/max_by, countDistinct
    variants, min(no_follow) — is invariant under row duplication, so
    feeding raw (possibly duplicated) link rows produces byte-identical
    compacted output while skipping an entire full-table shuffle.
    ``segment_distinct`` remains available for emitting the reference's
    intermediate sorted file (K1 byte-compat); the serving path doesn't
    pay for it."""
    return compact_links(links)
