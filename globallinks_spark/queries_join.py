"""Multi-way join query catalog — the classic warehouse join shapes
(selective-filter 3-way join, 6-way snowflake with a co-location
predicate, having-subquery join-back, outer-join histogram) plus the
order-preserving token-shard assignment.

These exist for PLAN DIVERSITY: the rest of the catalog exercises
aggregation, window, dedup, and similarity kernels; these pin the join
planner itself — join ordering under selective filters, broadcast
choice per side, the aggregate-then-join-back shape, and null-producing
outer joins — the shapes a reference user's ad-hoc analytics hit first
when pointed at the serving tables (SURVEY §3.3's query surface
generalized beyond the API's single-table filter/sort).

Conventions follow queries.py: identical aliases both sides,
decimal-exact money sums rounded at the edge, deterministic tie-breaks
on every top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from globallinks_spark.operators import packing as PK
from globallinks_spark.queries_base import QuerySpec, _dec, _round2, load

_REV = "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"


def _revenue() -> F.Column:
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,4)") - _dec("l_discount")
    )


# ---------------------------------------------------------------------------
# Q: shipping_priority — selective-filter 3-way join + top-N (TPC-H Q3
# shape). 100-TB plan: both fact filters (o_orderdate, l_shipdate) push
# to the parquet scans; the filtered customer segment broadcasts into
# orders (dim-vs-fact), so the only real shuffle is orders ⨝ lineitem
# on the order key; the top-10 runs as TakeOrderedAndProject — no
# global sort materializes.

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-06-01").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_round2(F.sum(_revenue())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
  round(CAST(sum({_REV}) AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate  > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q: volume_by_nation — 6-way snowflake join with a CO-LOCATION
# predicate (TPC-H Q5 shape): supplier joins on BOTH l_suppkey and
# "supplier nation = customer nation", the equality that can't be
# pushed to any single scan. 100-TB plan: region/nation broadcast
# (bounded at 5/25 rows, hint is safe); customer and supplier sizes
# are data-dependent, so NO broadcast hint — AQE picks broadcast vs
# shuffle join from measured sizes at runtime (a forced hint on a
# 100-TB customer dim would OOM executors). lineitem ⨝ orders is the
# one key shuffle. The nation-equality lands as a post-join filter on
# joined columns — no extra shuffle.

def q_volume_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_round2(F.sum(_revenue())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


SQL_VOLUME_BY_NATION = f"""
SELECT n_name,
  round(CAST(sum({_REV}) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ---------------------------------------------------------------------------
# Q: large_orders — aggregate-then-join-back (TPC-H Q18 shape): the
# HAVING subquery survives as a tiny frame that re-joins its own fact
# table. 100-TB plan: the groupBy(l_orderkey) agg is one shuffle with
# map-side partials; the surviving-key frame's size is data-dependent
# (HAVING selectivity varies with the corpus), so no broadcast hint —
# AQE measures the post-agg frame at runtime and picks broadcast when
# it fits, shuffle join when it doesn't (a forced hint would OOM
# executors on a low-selectivity day).

def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__qsum"))
        .filter(F.col("__qsum") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice",
            _round2(F.col("__qsum")).alias("total_qty"),
        )
    )


SQL_LARGE_ORDERS = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS qsum
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 250
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(CAST(qsum AS DOUBLE), 2) AS total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Q: customer_order_distribution — null-producing LEFT OUTER join +
# two-level aggregation (TPC-H Q13 shape): customers with zero matching
# orders must survive as c_count = 0, the case inner-join pipelines
# silently drop. 100-TB plan: one shuffle on the customer key for the
# outer join + first agg (count ignores the null fill-in rows), then
# the second agg runs on a cardinality-of-distinct-counts frame (tiny).

def q_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


SQL_CUSTOMER_ORDER_DISTRIBUTION = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q: ordered_token_shards — order-preserving token-budget sharding via
# the two-phase distributed prefix sum (operators/packing.py — see its
# module comment for why the naive global window is a 100-TB killer and
# how the bucketed scan avoids it). The oracle IS the naive global
# window, so the hash-check proves the distributed plan equals it.

def q_ordered_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return PK.ordered_token_shards(d, budget=2_000, bucket_width=100)


EXT_JOIN_REGISTRY: dict[str, QuerySpec] = {
    "shipping_priority": QuerySpec(q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "volume_by_nation": QuerySpec(q_volume_by_nation, SQL_VOLUME_BY_NATION),
    "large_orders": QuerySpec(q_large_orders, SQL_LARGE_ORDERS),
    "customer_order_distribution": QuerySpec(
        q_customer_order_distribution, SQL_CUSTOMER_ORDER_DISTRIBUTION
    ),
    "ordered_token_shards": QuerySpec(
        q_ordered_token_shards, PK.ordered_token_shards_sql(budget=2_000)
    ),
}
