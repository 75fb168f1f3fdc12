"""Pipe-delimited text interchange (S5-S7 readers, K1-K3 sinks).

The reference persists everything as gzip pipe-delimited text
(writers /root/reference/pkg/commoncrawl/wat.go:849-931,
cmd/importer/main.go:612-657; readers cmd/importer/main.go:393-431,
cmd/storelinks/main.go:87-143). Parquet is this engine's native format —
these functions exist for byte-compatible interchange with reference data.

Reading goes through ``split()`` on a raw text scan rather than the CSV
reader: the data is quote-free by construction (the pipeline scrubs '|'
from free text and drops rows containing it elsewhere), and the F15
malformed-row gate (field-count != 14/16) is a first-class filter here,
matching the reference's skip-don't-fail behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from globallinks_spark.schemas import (
    COMPACT_SCHEMA,
    LINK_SCHEMA,
    PAGE_SCHEMA,
)


def _read_pipe(
    spark: SparkSession, paths: str | list[str], schema: T.StructType
) -> DataFrame:
    n = len(schema.fields)
    parts = F.split(F.col("value"), r"\|", -1)
    cols = []
    for i, field in enumerate(schema.fields):
        c = parts.getItem(i)
        if isinstance(field.dataType, T.IntegerType):
            c = c.cast("int")
        elif isinstance(field.dataType, T.DateType):
            c = c.cast("date")
        cols.append(c.alias(field.name))
    return (
        spark.read.text(paths)
        .filter(F.size(parts) == n)  # F15 — malformed rows skipped
        .select(*cols)
    )


def read_links(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """S6 — 14-field link rows (sort_N.txt.gz shape)."""
    return _read_pipe(spark, paths, LINK_SCHEMA)


def read_compact(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """S7 — 16-field compacted rows; the domain re-validation (F16,
    cmd/storelinks/main.go:121-124) is applied by the caller so the raw
    read stays reusable."""
    return _read_pipe(spark, paths, COMPACT_SCHEMA)


def read_pages(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    return _read_pipe(spark, paths, PAGE_SCHEMA)


def write_pipe(
    df: DataFrame, path: str, schema: T.StructType, sorted_by: list[str] | None = None
) -> None:
    """K1-K3 — gzip pipe-text sink. Dates re-serialize as YYYY-MM-DD, ints
    as decimal strings — byte-identical to the reference writers. Sorting
    within partitions reproduces the reference's per-file sorted output
    (sortFileLink, wat.go:934-951) without a global shuffle."""
    cols = [F.coalesce(F.col(f.name).cast("string"), F.lit("")) for f in schema.fields]
    out = df.select(F.concat_ws("|", *cols).alias("value"))
    if sorted_by:
        out = df.sortWithinPartitions(*sorted_by).select(
            F.concat_ws("|", *cols).alias("value")
        )
    out.write.mode("overwrite").option("compression", "gzip").text(path)
