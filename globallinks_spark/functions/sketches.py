"""Guarded access to Spark's JVM-side sketch builders.

PySpark 4 dropped the Python wrappers for ``df.stat.countMinSketch`` /
``df.stat.bloomFilter``, but the JVM ``DataFrameStatFunctions`` (and the
``org.apache.spark.util.sketch`` classes they return) remain public
API. Reaching them requires the private ``_jdf`` bridge — which is
version-brittle, so that access lives HERE, once, behind a guard: if a
future PySpark moves the bridge, callers get a single clear
``SketchUnavailableError`` instead of an ``AttributeError`` deep inside
a query body, and only this module needs the fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SketchUnavailableError(RuntimeError):
    """The JVM sketch surface could not be reached through this
    PySpark build's private bridge."""


def _jvm_stat(df: DataFrame):
    try:
        return df._jdf.stat()
    except Exception as exc:  # bridge moved / py4j surface changed
        raise SketchUnavailableError(
            "cannot reach JVM DataFrameStatFunctions via _jdf on this "
            "PySpark build; update globallinks_spark.functions.sketches"
        ) from exc


def count_min_sketch(
    df: DataFrame, col: str, eps: float, confidence: float, seed: int
):
    """JVM CountMinSketch over ``df[col]`` (Cormode & Muthukrishnan
    2005 guarantees: never under-counts; over-counts ≤ ε·N w.p. ≥
    confidence). Returns the JVM sketch object (``estimateCount``)."""
    return _jvm_stat(df).countMinSketch(col, float(eps), float(confidence),
                                        int(seed))


def bloom_filter(df: DataFrame, col: str, expected_items: int, fpp: float):
    """JVM BloomFilter over ``df[col]`` (no false negatives; false-
    positive rate ≈ fpp). Returns the JVM filter (``mightContain``)."""
    return _jvm_stat(df).bloomFilter(col, int(expected_items), float(fpp))
