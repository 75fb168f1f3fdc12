"""Multi-way join catalog (queries_join.py): plan-shape pins and the
edge semantics the oracle gate can't distinguish (a broadcast that fell
back to sort-merge, a zero-match customer silently dropped by an inner
join, a prefix sum computed on one task)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globallinks_spark.operators import packing as PK
from globallinks_spark.plans.explain import (
    count_broadcast_joins,
    plan_string,
)
from globallinks_spark.queries_join import (
    q_customer_order_distribution,
    q_large_orders,
    q_shipping_priority,
    q_volume_by_nation,
)

SF_DIR = "/root/testdata/sf0.001"


class TestJoinPlans:
    def test_shipping_priority_broadcasts_customer(self, spark):
        df = q_shipping_priority(spark, SF_DIR)
        assert count_broadcast_joins(df) >= 1
        # both date filters reach the parquet scans
        plan = plan_string(df)
        assert plan.count("PushedFilters") >= 2
        # top-10 plans as TakeOrdered, not a global Sort + Limit
        assert "TakeOrderedAndProject" in plan

    def test_volume_by_nation_single_key_shuffle(self, spark):
        df = q_volume_by_nation(spark, SF_DIR)
        # region, nation, customer, supplier all broadcast — the only
        # shuffle joins are on the order key
        assert count_broadcast_joins(df) >= 4
        assert df.count() > 0

    def test_large_orders_broadcasts_having_frame(self, spark):
        df = q_large_orders(spark, SF_DIR)
        assert count_broadcast_joins(df) >= 1


class TestOuterJoinSemantics:
    def test_zero_order_customers_survive(self, spark):
        got = q_customer_order_distribution(spark, SF_DIR).toPandas()
        # Q13's whole point: customers with no (non-urgent) orders must
        # appear as c_count = 0, not vanish through an inner join.
        # Compute the expected orderless set independently via anti-join.
        c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") != "1-URGENT"
        )
        expected_zero = c.join(
            o, c.c_custkey == o.o_custkey, "left_anti"
        ).count()
        zero = got.loc[got["c_count"] == 0, "custdist"]
        assert (int(zero.iloc[0]) if len(zero) else 0) == expected_zero
        # distribution accounts for every customer exactly once
        assert int(got["custdist"].sum()) == c.count()

    def test_zero_survival_on_synthetic_frame(self, spark):
        """Drive the zero-count case explicitly — testdata may or may
        not contain orderless customers at a given SF."""
        c = spark.createDataFrame(
            [(1,), (2,), (3,)], ["c_custkey"]
        )
        o = spark.createDataFrame(
            [(10, 1), (11, 1), (12, 3)], ["o_orderkey", "o_custkey"]
        )
        per_cust = (
            c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
        )
        dist = {
            r.c_count: r.custdist
            for r in per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .collect()
        }
        assert dist == {0: 1, 1: 1, 2: 1}


class TestOrderedTokenShards:
    def test_matches_naive_global_window(self, spark):
        """Two-phase prefix sum ≡ the naive single-window cumsum."""
        from pyspark.sql import Window

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        from globallinks_spark.functions import text as TX

        naive = (
            d.select(
                "doc_id",
                TX.bpe_token_count(F.col("text"))
                .cast("bigint")
                .alias("n_tokens"),
            )
            .withColumn(
                "before",
                F.sum("n_tokens").over(
                    Window.orderBy("doc_id").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                )
                - F.col("n_tokens"),
            )
            .groupBy(F.floor(F.col("before") / 500).alias("shard_id"))
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                F.min("doc_id").alias("first_doc"),
                F.max("doc_id").alias("last_doc"),
            )
        )
        got = PK.ordered_token_shards(
            d, budget=500, bucket_width=37
        )  # width coprime to nothing special — buckets straddle shards
        left = {tuple(r) for r in got.collect()}
        right = {tuple(r) for r in naive.collect()}
        assert left == right

    def test_shards_are_contiguous_id_ranges(self, spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rows = sorted(
            PK.ordered_token_shards(d, budget=500, bucket_width=100)
            .collect(),
            key=lambda r: r.shard_id,
        )
        for a, b in zip(rows, rows[1:]):
            assert a.last_doc < b.first_doc
        assert sum(r.n_docs for r in rows) == d.count()

    def test_no_global_single_partition_window_on_docs(self, spark):
        """The full-corpus frame must never pass through an
        Exchange SinglePartition — only the tiny per-bucket offsets
        frame may (that single task is the point of the two-phase
        scan). We pin it structurally: the window over the DOC frame
        partitions by bucket."""
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = plan_string(
            PK.ordered_token_shards(d, budget=500, bucket_width=100)
        )
        # exactly one unpartitioned window (the bucket-offsets frame);
        # the doc-side window shuffles on hashpartitioning(__bucket…)
        assert plan.count("SinglePartition") == 1, plan
        assert "hashpartitioning(__bucket" in plan, plan

    def test_arg_validation(self, spark):
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        with pytest.raises(ValueError):
            PK.ordered_token_shards(d, budget=0)
        with pytest.raises(ValueError):
            PK.ordered_token_shards(d, bucket_width=-1)
