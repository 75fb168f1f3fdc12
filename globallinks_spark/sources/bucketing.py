"""Bucketed-table layout for co-located joins.

The serving table (serving.py) prunes point lookups via hash
partitioning; THIS module is the other layout tool: Spark bucketing
(`bucketBy` + `saveAsTable`), which persists the hash-distribution in
table metadata so a join between two tables bucketed on the same key
with the same bucket count needs NO Exchange on either side — the
sort-merge join reads co-located buckets directly. At 100 TB this is
the difference between re-shuffling both fact tables on every join and
shuffling each exactly once at write time (SURVEY §7.3's repeated
link↔page-class joins; SNIPPETS.md's Spark bucketing pattern).

`tests/test_bucketed_join.py` pins the plan property: bucketed-join
has zero Exchanges; the same join over plain parquet has two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted table on ``key``.
    Sorting within buckets lets the sort-merge join skip its sort step
    too (the read produces the required ordering)."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Join two same-key/same-count bucketed tables — shuffle-free by
    layout; Spark verifies the bucket specs match at plan time."""
    return spark.table(left).join(spark.table(right), key)
