"""Skew mitigation for Zipfian keys (link_domain is the canonical case —
the reference's ~180-domain blocklist exists precisely because a handful
of domains dominate the crawl, SURVEY §7.3).

AQE's skew-join splitting handles *joins*; for aggregations whose
per-group state is large (collect_set, count-distinct), one hot key still
pins one task. ``salted_agg`` implements the standard two-stage recipe as
a reusable operator:

    stage 1: group by (key, salt) — the hot key fans out over N tasks,
             partial aggregation happens per salt shard
    stage 2: group by key — merges N shard aggregates

The caller supplies both the shard aggregations and the merge
aggregations, since they differ (count → sum of counts, collect_set →
flatten+distinct of sets).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, salts: int = DEFAULT_SALTS) -> DataFrame:
    """Uniform pseudo-random salt derived from the whole row via a fast
    JVM hash — deterministic for a given row, no RNG state."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    shard_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage aggregation over ``keys`` with hot-key fan-out.

    ``shard_aggs`` aggregate within (keys, salt); ``merge_aggs``
    reduce the shard results per key. Aliases in shard_aggs are the
    input columns of merge_aggs.

    Example — distinct page count per (possibly hot) domain::

        salted_agg(
            links, ["link_domain"],
            [F.countDistinct("page_host").alias("c")],
            [F.sum("c").alias("pages")],        # upper bound across shards
        )

    (For exact distinct across shards, shard with collect_set and merge
    with flatten+array_distinct — see ``salted_distinct_count``.)
    """
    sharded = (
        with_salt(df, salts)
        .groupBy(*keys, "_salt")
        .agg(*shard_aggs)
    )
    return sharded.groupBy(*keys).agg(*merge_aggs)


def salted_distinct_count(
    df: DataFrame, keys: Sequence[str], value: str,
    salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Exact count-distinct of ``value`` per key, skew-safe: the value
    itself picks the salt shard, so equal values land in the same shard
    and per-shard distinct counts sum exactly."""
    sharded = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salts)).cast("int")
        )
        .groupBy(*keys, "_salt")
        .agg(F.countDistinct(value).alias("_c"))
    )
    return sharded.groupBy(*keys).agg(
        F.sum("_c").cast("bigint").alias(f"distinct_{value}")
    )
