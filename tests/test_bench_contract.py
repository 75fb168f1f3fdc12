"""The driver records bench.py's single stdout JSON line with a
bounded tail capture — round 3's 84-entry inline form overflowed it
and the round lost its headline artifact (`BENCH_r03.json` parsed:
null). Pin the line's shape without running Spark: build the same
`out` dict main() prints, with worst-case float widths for every
registry entry, and assert it stays one parseable line comfortably
under the observed capture bound."""

from __future__ import annotations

import json

from globallinks_spark.queries import REGISTRY


def test_bench_line_fits_driver_capture():
    out = {
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        # worst-case width: every timing printed at full rounding
        "queries": {name: 999.999 for name in REGISTRY},
        "sf": 0.1,
        "detail": "BENCH_DETAIL.json",
        "extract_pages_per_min_per_core": 999999,
        "extract_in_bench_pages_per_min_per_core": 999999,
    }
    line = json.dumps(out)
    assert "\n" not in line
    assert json.loads(line)["queries"]  # round-trips
    # r02's ~1.5k-char 48-entry line parsed; r03's ~2.6k-char 84-entry
    # line did not. Stay under 2,000 with margin.
    assert len(line) < 2000, f"bench line grew to {len(line)} chars"


def test_registry_stays_at_fifty():
    # adding a 51st entry silently drops one from the driver's
    # correctness suite AND lengthens the bench line — both gates live
    # here and in tests/test_suites.py
    assert len(REGISTRY) == 50
