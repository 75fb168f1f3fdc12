"""Bucketed co-located join: the layout that removes BOTH sides'
Exchanges from a fact-fact join (sources/bucketing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globallinks_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bj_left", "k", 8, str(base / "left"))
    write_bucketed(b, "bj_right", "k", 8, str(base / "right"))
    yield
    spark.sql("DROP TABLE IF EXISTS bj_left")
    spark.sql("DROP TABLE IF EXISTS bj_right")


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange"
    )


class TestBucketedJoin:
    def test_join_is_shuffle_free(self, spark, bucketed):
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "bj_left", "bj_right", "k")
            assert _exchanges(joined) == 0
            assert joined.count() == 5000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_plain_parquet_join_shuffles_both_sides(self, spark, tmp_path):
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.range(0, 5000).select(F.col("id").alias("k"))
            b = spark.range(0, 5000).select(F.col("id").alias("k"))
            a.write.parquet(str(tmp_path / "pa"))
            b.write.parquet(str(tmp_path / "pb"))
            joined = spark.read.parquet(str(tmp_path / "pa")).join(
                spark.read.parquet(str(tmp_path / "pb")), "k"
            )
            assert _exchanges(joined) >= 2    # the cost bucketing removes
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_values_correct(self, spark, bucketed):
        row = (
            bucketed_join(spark, "bj_left", "bj_right", "k")
            .filter(F.col("k") == 7).first()
        )
        assert (row.va, row.vb) == (14, 21)
