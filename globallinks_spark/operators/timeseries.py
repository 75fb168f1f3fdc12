"""Time-series regularization operators over the events feed.

``gap_fill_hourly`` — resample an irregular event stream onto each
user's hourly grid and carry the last observed value forward into
gaps. This is the standard "densify + LOCF" shape every monitoring /
feature-engineering pipeline needs before windowed models; the
reference engine (a link index, SURVEY.md §2) has no time-series
surface, so this is a brief-extension operator like asof_join
(queries_ext.q_asof_join), which it composes with.

Scale notes (100 TB): the grid explodes per-entity bounded spans
(``sequence`` between each user's own first/last hour — never a global
calendar cross join), the per-hour pre-aggregation is one keyed
shuffle that also bounds the join's left side, and the carry-forward
window partitions by user so no global sort exists. Entity-level skew
(one user with years of history) is bounded by span, not event count —
the pre-aggregation collapses event volume before the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_hourly(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, hour, n_events, hour_value, filled_value, gap) on each
    user's contiguous hourly grid from their first to last event hour.

    ``hour_value`` is the hour's summed value (NULL in gaps; DECIMAL
    sum rounded to 2 before the carry so both engines propagate
    identical values),
    ``filled_value`` carries the last non-null hour forward (LOCF;
    never NULL — the grid starts at an observed hour), ``gap`` flags
    synthesized rows.
    """
    hr = F.date_trunc("hour", F.col(ts_col))
    # DECIMAL-cast before the sum (repo convention, queries.py module
    # doc): a double Σ is shuffle-order-dependent in the last ulp, a
    # decimal Σ is exact and order-free on both engines
    per_hr = events.groupBy(F.col(user_col), hr.alias("hour")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2
        ).alias("hour_value"),
    )
    # bounds derive from the ALREADY-AGGREGATED per-hour frame, not the
    # raw events: date_trunc is monotone, so min/max of truncated hours
    # equal the truncated min/max of raw timestamps — this removes a
    # second full scan + shuffle of the events table (guide §2.4: two
    # operations keyed the same way share one pass); at 100 TB the
    # savings is an events-table-sized scan and exchange
    bounds = per_hr.groupBy(user_col).agg(
        F.min("hour").alias("h0"),
        F.max("hour").alias("h1"),
    )
    grid = bounds.select(
        user_col,
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    joined = grid.join(per_hr, [user_col, "hour"], "left")
    w = (
        Window.partitionBy(user_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        user_col,
        "hour",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        "hour_value",
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_events").isNull().alias("gap"),
    )


def gap_fill_hourly_sql(
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    return f"""
WITH per_hr AS (
  SELECT {user_col}, date_trunc('hour', {ts_col}) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         round(CAST(sum(CAST({value_col} AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS hour_value
  FROM {table} GROUP BY 1, 2
), bounds AS (
  SELECT {user_col},
         date_trunc('hour', min({ts_col})) AS h0,
         date_trunc('hour', max({ts_col})) AS h1
  FROM {table} GROUP BY 1
), grid AS (
  SELECT {user_col}, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
)
SELECT g.{user_col}, g.hour,
  coalesce(p.n_events, 0) AS n_events,
  p.hour_value,
  last_value(p.hour_value IGNORE NULLS) OVER (
    PARTITION BY g.{user_col} ORDER BY g.hour
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
  p.n_events IS NULL AS gap
FROM grid g LEFT JOIN per_hr p
  ON p.{user_col} = g.{user_col} AND p.hour = g.hour
"""
