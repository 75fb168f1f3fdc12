"""Invariants for the consolidated driver registry (queries_suites.py):
the 50-entry cap contract, full capability coverage, and the pinned
checksum column specs staying in sync with the live sub-query schemas.
"""

from __future__ import annotations

import pytest

from globallinks_spark.queries import FULL_REGISTRY, REGISTRY
from globallinks_spark.queries_suites import CHECKSUM_SUITES, _LONG_FORM

SF = "/root/testdata/sf0.001"

# spark simpleString → checksum kind (mirror of queries_suites._spark_kind)
_DTYPE_KIND = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts",
}


class TestRegistryShape:
    def test_exactly_fifty_driver_entries(self):
        # the driver records at most 50 correctness rows per round
        # (r01: 35/35, r02: 48/48, r03: first-50-of-84); every slot must
        # be both used and oracle-checked
        assert len(REGISTRY) == 50

    def test_every_driver_entry_has_an_oracle(self):
        assert [k for k, v in REGISTRY.items() if v.oracle is None] == []

    def test_full_registry_superset(self):
        # every driver entry resolves in the full catalog too
        assert set(REGISTRY) <= set(FULL_REGISTRY)

    def test_all_individual_operators_still_cataloged(self):
        # spot the capability list: every sub-query folded into a suite
        # must stay individually runnable (and oracle-checked by
        # test_queries_oracle.py) under FULL_REGISTRY
        folded = [
            tag for members in CHECKSUM_SUITES.values()
            for tag, _ in members
        ] + [
            src for members in _LONG_FORM.values()
            for src, _, _ in members
        ]
        missing = [t for t in folded if t not in FULL_REGISTRY]
        assert missing == []


class TestChecksumSpecsMatchLiveSchemas:
    @pytest.mark.parametrize("suite", sorted(CHECKSUM_SUITES))
    def test_pinned_columns_match(self, spark, suite):
        # a sub-query schema change must fail HERE (loudly), not ship a
        # checksum computed over stale column/kind pairs
        for tag, cols in CHECKSUM_SUITES[suite]:
            df = FULL_REGISTRY[tag].fn(spark, SF)
            live = [
                (f.name, _DTYPE_KIND.get(f.dataType.simpleString()))
                for f in df.schema.fields
            ]
            assert live == list(cols), (
                f"{suite}/{tag}: pinned {cols} vs live {live}"
            )


class TestChecksumSensitivity:
    def test_value_change_flips_chk(self, spark):
        # the checksum must move when any cell moves — drop a row,
        # change a value, null a column: all three shift (n_rows, nn,
        # chk) away from the baseline
        from pyspark.sql import functions as F

        from globallinks_spark.queries_suites import checksum_frame

        cols = [("k", "int"), ("v", "float"), ("s", "str")]
        base = spark.createDataFrame(
            [(1, 1.5, "ab"), (2, 2.5, "cde")], "k long, v double, s string"
        )
        ref = checksum_frame(base, "t", cols).collect()[0]

        fewer = checksum_frame(base.limit(1), "t", cols).collect()[0]
        assert fewer["n_rows"] != ref["n_rows"]

        moved = checksum_frame(
            base.withColumn("v", F.col("v") + 0.25), "t", cols
        ).collect()[0]
        assert moved["chk"] != ref["chk"]
        assert moved["n_rows"] == ref["n_rows"]

        nulled = checksum_frame(
            base.withColumn("s", F.lit(None).cast("string")), "t", cols
        ).collect()[0]
        assert nulled["nn"] != ref["nn"]

    def test_same_length_string_mutation_flips_chk(self, spark):
        # the r04 gap: length-based string checksums passed same-length
        # corruptions. The md5-H30 content hash must flip chk for a
        # 1-char mutation that preserves length (and leaves n_rows/nn
        # untouched, so chk is the ONLY line of defense here).
        from pyspark.sql import functions as F

        from globallinks_spark.queries_suites import checksum_frame

        cols = [("k", "int"), ("s", "str")]
        base = spark.createDataFrame(
            [(1, "abcdef"), (2, "ghijkl")], "k long, s string"
        )
        ref = checksum_frame(base, "t", cols).collect()[0]
        mutated = checksum_frame(
            base.withColumn(
                "s", F.when(F.col("k") == 1, F.lit("abcdeX"))
                .otherwise(F.col("s"))
            ),
            "t", cols,
        ).collect()[0]
        assert mutated["n_rows"] == ref["n_rows"]
        assert mutated["nn"] == ref["nn"]
        assert mutated["chk"] != ref["chk"]

    def test_chk_is_exact_integer_cross_engine(self, spark):
        # chk must be an exact BIGINT on both engines — no double
        # rounding anywhere (a hundredths tie like 4.975 rounds
        # differently in Spark vs DuckDB). Compare the two engines on a
        # frame containing exactly such a tie-prone 4dp float.
        import duckdb

        from globallinks_spark.queries_suites import (
            checksum_frame, checksum_sql,
        )

        cols = [("k", "int"), ("v", "float"), ("s", "str")]
        rows = [(1, 4.9750, "tie"), (2, -0.0025, "neg"), (3, 0.1, "x")]
        sdf = spark.createDataFrame(rows, "k long, v double, s string")
        got = checksum_frame(sdf, "t", cols).collect()[0]
        assert isinstance(got["chk"], int)

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE sub AS SELECT * FROM (VALUES "
            + ", ".join(f"({k}, {v}, '{s}')" for k, v, s in rows)
            + ") AS t(k, v, s)"
        )
        oracle = con.execute(
            checksum_sql("t", "SELECT * FROM sub", cols)
        ).fetchone()
        assert (got["n_rows"], got["nn"], got["chk"]) == (
            oracle[1], oracle[2], oracle[3]
        )


class TestRoundtripDirEviction:
    def test_keeps_last_two_dirs_per_kind(self, tmp_path, monkeypatch):
        """ADVICE r6: a still-unmaterialized lazy frame from the
        PREVIOUS invocation must still resolve — eviction keeps the
        last TWO dirs per kind and removes older ones, bounding /tmp
        growth without breaking one-invocation-delayed consumers."""
        import os

        from globallinks_spark import queries_ext as QX

        monkeypatch.setattr(QX, "_roundtrip_live", {})
        d1 = QX._roundtrip_dir("t")
        d2 = QX._roundtrip_dir("t")
        assert os.path.isdir(d1) and os.path.isdir(d2)  # depth 2 live
        d3 = QX._roundtrip_dir("t")
        assert not os.path.exists(d1)  # oldest evicted
        assert os.path.isdir(d2) and os.path.isdir(d3)
        # kinds are independent slots
        o1 = QX._roundtrip_dir("other")
        assert os.path.isdir(o1) and os.path.isdir(d2) and os.path.isdir(d3)


class TestQueryVecGuard:
    def test_missing_vec_id_zero_raises_named_error(self, spark):
        """ADVICE r8 generalized: every catalog query that anchors on
        the vec_id=0 embedding goes through _query_vec, which raises a
        named ValueError on an empty table / missing row instead of
        TypeError on None."""
        import pytest

        from globallinks_spark import queries_ext as QX

        empty = spark.createDataFrame(
            [], "vec_id bigint, embedding array<float>")
        with pytest.raises(ValueError, match="some_query.*vec_id=0"):
            QX._query_vec(empty, "some_query")

    def test_returns_floats_for_present_row(self, spark):
        from globallinks_spark import queries_ext as QX

        emb = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
            "vec_id bigint, embedding array<float>")
        assert QX._query_vec(emb, "q") == [1.0, 2.0]
