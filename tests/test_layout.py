"""Z-order layout (sources/layout.py): Morton-code algebra and the
pruning property the layout exists for — a narrow filter on EITHER
clustered column touches a small fraction of files, where a
single-column sort leaves the other column scattered everywhere."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globallinks_spark.sources.layout import write_zordered, zorder_value


def _files_touched(spark, path, predicate):
    df = spark.read.parquet(path).filter(predicate)
    return df.select(
        F.input_file_name().alias("f")
    ).distinct().count()


def _total_files(spark, path):
    return spark.read.parquet(path).select(
        F.input_file_name().alias("f")
    ).distinct().count()


class TestZValue:
    def test_interleave_matches_reference_bits(self, spark):
        # 2 cols, 2 bits, bounds [0,3] each → bucket == value; Morton
        # of (a,b) = b1a1b0a0 (col 0 owns even positions)
        rows = spark.createDataFrame(
            [(a, b) for a in range(4) for b in range(4)], "a int, b int"
        ).withColumn(
            "z", zorder_value(["a", "b"], {"a": (0, 3), "b": (0, 3)}, bits=2)
        ).collect()
        for r in rows:
            expect = 0
            for bit in range(2):
                expect |= ((r.a >> bit) & 1) << (2 * bit)
                expect |= ((r.b >> bit) & 1) << (2 * bit + 1)
            assert r.z == expect, (r.a, r.b)

    def test_constant_column_contributes_zero(self, spark):
        rows = spark.createDataFrame(
            [(5, 2)], "a int, b int"
        ).withColumn(
            "z", zorder_value(["a", "b"], {"a": (5, 5), "b": (0, 3)}, bits=2)
        ).collect()
        # only b contributes: bucket(b=2) = 0b10, interleaved to odd
        # positions → bit1 of b lands at position 3
        assert rows[0].z == 0b1000

    def test_bit_budget_validation(self):
        with pytest.raises(ValueError):
            zorder_value(["a", "b"], {"a": (0, 1), "b": (0, 1)}, bits=32)


class TestZorderPruning:
    @pytest.fixture(scope="class")
    def paths(self, spark, tmp_path_factory):
        # uniform 2-d grid: worst case for single-column sorting
        base = tmp_path_factory.mktemp("zorder")
        df = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
        z_path = str(base / "zordered")
        s_path = str(base / "xsorted")
        write_zordered(df, z_path, ["x", "y"], n_files=16, bits=6)
        (
            df.repartitionByRange(16, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite").parquet(s_path)
        )
        return z_path, s_path

    def test_no_rows_lost(self, spark, paths):
        z_path, _ = paths
        got = spark.read.parquet(z_path)
        assert got.count() == 64 * 64
        assert got.agg(F.sum("payload")).first()[0] == 64 * 64 * (64 * 64 - 1) // 2

    def test_prunes_on_both_dimensions(self, spark, paths):
        z_path, s_path = paths
        total = _total_files(spark, z_path)
        assert total >= 8
        # a 1/8-wide slab on either axis → few files under z-order
        x_slab = (F.col("x") >= 8) & (F.col("x") < 16)
        y_slab = (F.col("y") >= 8) & (F.col("y") < 16)
        assert _files_touched(spark, z_path, x_slab) <= total // 2
        assert _files_touched(spark, z_path, y_slab) <= total // 2
        # the x-sorted layout prunes x but scatters y across ALL files
        s_total = _total_files(spark, s_path)
        assert _files_touched(spark, s_path, x_slab) <= max(s_total // 4, 3)
        assert _files_touched(spark, s_path, y_slab) == s_total


class TestEdgeCases:
    def test_null_values_land_in_bucket_zero(self, spark):
        rows = spark.createDataFrame(
            [(None, 3), (0, 3)], "a int, b int"
        ).withColumn(
            "z", zorder_value(["a", "b"], {"a": (0, 3), "b": (0, 3)}, bits=2)
        ).collect()
        by_a = {r.a: r.z for r in rows}
        assert by_a[None] == by_a[0]  # null clusters with the low edge

    def test_empty_input_raises(self, spark):
        df = spark.createDataFrame([], "a int, b int")
        with pytest.raises(ValueError, match="finite"):
            write_zordered(df, "/tmp/never-written", ["a", "b"])

    def test_empty_cols_raises(self, spark):
        df = spark.createDataFrame([(1, 2)], "a int, b int")
        with pytest.raises(ValueError, match="non-empty"):
            write_zordered(df, "/tmp/never-written", [])

    def test_nan_in_column_does_not_disable_clustering(self, spark):
        # one NaN row must not poison the max bound (NaN sorts above
        # every double in Spark's Max) — clustering on y must survive
        df = spark.createDataFrame(
            [(float("nan"), 0.0)] + [(float(i), float(i)) for i in range(8)],
            "x double, y double",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/t"
            write_zordered(df, path, ["x", "y"], n_files=2, bits=4)
            got = spark.read.parquet(path)
            assert got.count() == 9  # NaN row survives in the data

    def test_reserved_helper_column_rejected(self, spark):
        df = spark.createDataFrame([(1, 2)], "a int, __z int")
        with pytest.raises(ValueError, match="__z"):
            write_zordered(df, "/tmp/never-written", ["a"])
