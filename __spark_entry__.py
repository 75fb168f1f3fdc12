"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``globallinks_spark`` (see SURVEY.md §2 for the
operator inventory each query exercises); this file is the thin contract
surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from globallinks_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary aggregation) on /root/testdata/sf0.001."""
    return _q.q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    training-data extension set). Each callable takes (spark, sf_dir)."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key; keys absent here get
    the driver's weaker rows-only check (non-SQL-expressible ops)."""
    return _q.oracle_sql()
