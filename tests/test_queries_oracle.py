"""Local replica of the driver's DuckDB-oracle gate: run every
FULL_REGISTRY query (every individual operator query PLUS the
consolidated 50-entry driver registry, see queries_suites.py) through
Spark AND DuckDB at sf0.001 and compare row count, column names, and
order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

from globallinks_spark.queries import FULL_REGISTRY as REGISTRY
from globallinks_spark.queries import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value normalization: fixed decimal text
        return f"{v:.6f}"
    return str(v)


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def test_demoted_qa_reports_stay_oracle_guarded():
    """r8 demoted dedup_eval and ann_recall from the driver's
    corpus_qa_suite to this pytest-only oracle gate (r8 verdict note).
    This test is the promised CI guard (r8 verdict #7): if either key
    leaves FULL_REGISTRY, or loses its DuckDB oracle (dropping it to
    the weaker rows-only check), this fails by name instead of the
    coverage silently narrowing."""
    for key in ("dedup_eval", "ann_recall"):
        assert key in REGISTRY, f"{key} left FULL_REGISTRY"
        assert REGISTRY[key].oracle is not None, (
            f"{key} lost its DuckDB oracle — rows-only is not enough "
            f"for a demoted QA report"
        )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, ddb, name):
    spec = REGISTRY[name]
    got = spec.fn(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        if name == "approx_profile_raw":
            # sketches are engine-specific; bound them against exact counts
            exact_parts = ddb.sql(
                "SELECT count(DISTINCT l_partkey) FROM lineitem"
            ).fetchone()[0]
            est = int(got["approx_parts"].iloc[0])
            assert abs(est - exact_parts) / exact_parts < 0.1
        assert len(got) >= 0
        return
    want = ddb.sql(spec.oracle).df()
    got_cols, got_rows = _normalize(got)
    want_cols, want_rows = _normalize(want)
    assert got_cols == [c.lower() for c in want_cols], (
        f"{name}: column mismatch {got_cols} vs {want_cols}"
    )
    assert len(got_rows) == len(want_rows), (
        f"{name}: row count {len(got_rows)} vs {len(want_rows)}"
    )
    mismatches = [
        (g, w) for g, w in zip(got_rows, want_rows) if g != w
    ][:5]
    assert not mismatches, f"{name}: first diffs {mismatches}"
