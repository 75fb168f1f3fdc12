"""Shared primitives for the query catalogs (queries.py and its
extension modules). Lives in its own leaf module so queries_ext /
queries_join can import it without touching queries.py — which imports
THEM at its bottom to assemble the full REGISTRY. Importing any catalog
module first is safe; no cycle exists.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet has shipped with two physical types for `ts`:
        # TIMESTAMP(NANOS) (read as raw int64 via nanosAsLong, then
        # floor-converted to micros exactly like DuckDB truncates) and plain
        # TIMESTAMP(MICROS) (usable as-is). Branch on the read dtype so both
        # generations of the dataset load identically.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes)["ts"] in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # NTZ → session-zone timestamp (session pins UTC, so values are
            # unchanged); watermarks and unix_timestamp require TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every data table under ``sf_dir`` as a temp view (named
    by file stem) so ``spark.sql`` users get the full catalog — the
    interactive surface a reference user lands on after switching.
    Known tables go through :func:`load` (events ts normalization);
    unknown parquet files in the directory register as-is. Returns the
    registered view names."""
    import glob as _glob
    import os as _os

    names: list[str] = []
    for path in sorted(_glob.glob(f"{sf_dir}/*.parquet")):
        name = _os.path.splitext(_os.path.basename(path))[0]
        if not name.isidentifier() or name.startswith("_"):
            continue  # _manifest sidecars etc. are not query surface
        df = load(spark, sf_dir, name) if name in TABLES \
            else spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        names.append(name)
    return names


def _dec(col, scale: int = 4):
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) \
        else col.cast(f"decimal(18,{scale})")


def _round2(c) -> F.Column:
    return F.round(c.cast("double"), 2)


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver runs rows-only check
