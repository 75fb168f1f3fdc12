"""Time-series regularization operators over the events feed.

``gap_fill_hourly`` — resample an irregular event stream onto each
user's hourly grid and carry the last observed value forward into
gaps. This is the standard "densify + LOCF" shape every monitoring /
feature-engineering pipeline needs before windowed models; the
reference engine (a link index, SURVEY.md §2) has no time-series
surface, so this is a brief-extension operator like asof_join
(queries_ext.q_asof_join), which it composes with.

Scale notes (100 TB): the per-hour pre-aggregation is the ONLY
events-sized shuffle; densification is join-free (each real hour row
explodes the bounded span to its successor — never a global calendar
cross join, and no grid⋈per_hr join at all since r13), and the
carry-forward window partitions by user so no global sort exists.
Entity-level skew (one user with years of history) is bounded by span,
not event count — the pre-aggregation collapses event volume before
the window.
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
    # No-join densification: each REAL per-hour row explodes exactly the
    # grid hours [hour, next_real_hour) it is responsible for, so the
    # bounds aggregation, the grid build AND the grid⋈per_hr join of the
    # r12 form all disappear — one events scan, one aggregation
    # exchange, one per-user window (r12's form re-scanned and
    # re-aggregated events for the bounds branch: the committed r12
    # plans were isomorphic because Catalyst never shared the aggregate
    # between the two subtrees). The carry-forward (LOCF) is computed on
    # the real rows BEFORE the explode: a gap row's last-non-null
    # predecessor is by construction its parent real row, and gap rows'
    # own hour_value is NULL so they can never affect the carry. The
    # coverage is identical — the grid spans first..last real hour per
    # user, and the last real row contributes only itself.
    w = (
        Window.partitionBy(user_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlead = Window.partitionBy(user_col).orderBy("hour")
    carried = per_hr.select(
        user_col, "hour", "n_events", "hour_value",
        F.last("hour_value", ignorenulls=True).over(w).alias("__filled"),
        F.lead("hour").over(wlead).alias("__nxt"),
    )
    grid = carried.select(
        user_col, "n_events", "hour_value", "__filled",
        F.col("hour").alias("__h"),
        F.explode(
            F.sequence(
                "hour",
                F.coalesce(
                    F.col("__nxt") - F.expr("interval 1 hour"),
                    F.col("hour"),
                ),
                F.expr("interval 1 hour"),
            )
        ).alias("hour"),
    )
    real = F.col("hour") == F.col("__h")
    return grid.select(
        user_col,
        "hour",
        F.when(real, F.col("n_events"))
        .otherwise(F.lit(0).cast("bigint")).alias("n_events"),
        F.when(real, F.col("hour_value")).alias("hour_value"),
        F.col("__filled").alias("filled_value"),
        (~real).alias("gap"),
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
