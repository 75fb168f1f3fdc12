"""Z-order (Morton-curve) file layout — multi-column data clustering
for min/max pruning.

A serving table sorted on one column prunes scans filtered on THAT
column and nothing else: a narrow filter on any other column touches
every file. Interleaving the bit representations of several columns
(the Morton / Z-curve, the technique behind Delta Lake's
``OPTIMIZE ... ZORDER BY`` and the classic multidimensional-index
literature) makes file-level and row-group-level min/max statistics
selective on EVERY participating column at once: rows close on the
curve are close in all dimensions, so each parquet file covers a small
hyper-rectangle of the key space.

Scale shape: two jobs. One tiny agg collects per-column (min, max) —
a single driver row; the write job computes the z-value per row
(pure bit algebra, codegen-friendly), range-partitions on it (one
shuffle — the same shuffle ANY clustered write pays), and sorts within
partitions so row groups inside each file are tight too. Nothing here
is driver-side per-row.

Limits (documented, inherent to uniform-width bucketing): columns are
bucketed by uniform width over [min, max], so a heavily skewed column
wastes some bucket resolution (Delta has the same behavior with its
range-partitioned ids). ``bits`` trades curve resolution against
z-value width; 2 columns × 20 bits fit comfortably in an int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_value(
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
) -> F.Column:
    """int64 Morton code interleaving ``bits`` quantized bits of every
    column in ``cols`` (column i owns interleaved positions i, i+k,
    i+2k, …). ``bounds`` maps column → (min, max) from the caller's
    stats pass; a constant column (min == max) contributes zeros."""
    k = len(cols)
    if not 0 < k * bits <= 63:
        raise ValueError(
            f"{k} cols × {bits} bits = {k * bits} exceeds int64 (≤63)"
        )
    max_bucket = (1 << bits) - 1
    z = F.lit(0).cast("bigint")
    for ci, name in enumerate(cols):
        lo, hi = bounds[name]
        if hi > lo:
            scaled = (
                (F.col(name).cast("double") - F.lit(float(lo)))
                / F.lit(float(hi - lo))
                * F.lit(max_bucket)
            )
            # null/NaN values land in bucket 0 (they'd otherwise
            # null-poison the whole z-value through bitwiseOR and
            # cluster arbitrarily)
            bucket = F.coalesce(
                F.least(
                    F.greatest(
                        F.floor(F.nanvl(scaled, F.lit(0.0))), F.lit(0)
                    ),
                    F.lit(max_bucket),
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            )
        else:
            bucket = F.lit(0).cast("bigint")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                    b * k + ci,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve over ``cols``:
    range-partition into ``n_files`` tasks by z-value, sort within each,
    drop the helper column. Readers need nothing special — parquet
    min/max stats simply become selective on every ``cols`` member.

    The input is persisted for the duration of the write: three passes
    read it (the stats agg, repartitionByRange's range-boundary
    sampling, and the write itself), so an unpersisted expensive
    upstream would be recomputed twice."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if "__z" in df.columns:
        raise ValueError(
            "input already has a column named __z (reserved for the "
            "z-value helper); rename it before clustering"
        )
    import math as _math

    df = df.persist()
    try:
        # NaN sorts above every double under Spark's Max, so a single
        # NaN row would otherwise poison hi and (hi > lo) would
        # silently disable the column's clustering — filter non-finite
        # values out of the stats pass (rows keep them; zorder_value
        # buckets them to the low edge)
        row = df.agg(
            *[
                f
                for c in cols
                for cd in [F.col(c).cast("double")]
                for fin in [
                    F.when(~F.isnan(cd) & ~cd.isin(
                        float("inf"), float("-inf")
                    ), cd)
                ]
                for f in (
                    F.min(fin).alias(f"lo_{c}"),
                    F.max(fin).alias(f"hi_{c}"),
                )
            ]
        ).first()
        missing = [c for c in cols if row[f"lo_{c}"] is None]
        if missing:
            raise ValueError(
                f"no finite values to cluster on for column(s) {missing} "
                "(empty input or all-null/NaN column)"
            )
        bounds = {
            c: (float(row[f"lo_{c}"]), float(row[f"hi_{c}"])) for c in cols
        }
        assert all(
            _math.isfinite(lo) and _math.isfinite(hi)
            for lo, hi in bounds.values()
        )
        (
            df.withColumn("__z", zorder_value(cols, bounds, bits))
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        df.unpersist()
