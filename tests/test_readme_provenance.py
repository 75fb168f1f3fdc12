"""README "Measured" provenance gate.

Three consecutive judge rounds (r3-r5) found README's Measured section
quoting a number that the named artifact no longer contained — the
driver refreshes `BENCH_DETAIL.json` / `BENCH_r{N}.json` every round,
so a builder-era literal attributed to one of those files silently goes
stale. This test makes the drift loud instead of silent.

Convention (documented at the top of README's Measured section): every
artifact-sourced claim is a backticked token in one of two forms —

    `FILE.json:.dotted.path = VALUE`   pinned literal; this test loads
                                       FILE.json, resolves the path and
                                       asserts numeric equality.
    `FILE.json:.dotted.path`           existence claim; the path must
                                       resolve. Used for artifacts the
                                       DRIVER refreshes per round, whose
                                       exact value the builder cannot
                                       pin without re-creating the r3-r5
                                       drift.

If the driver refreshes an artifact out from under a pinned README
claim, this test fails — which is the intended signal to update the
prose, not a flake.
"""

from __future__ import annotations

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")

# `FILE.json:.a.b_c = 1,234.5`  or  `FILE.json:.a.b`
CLAIM_RE = re.compile(
    r"`([A-Za-z0-9_]+\.json):((?:\.[A-Za-z0-9_\[\]]+)+)"
    r"(?:\s*=\s*(-?[0-9][0-9_,]*(?:\.[0-9]+)?))?`"
)
# files the driver re-writes IN PLACE each round (BENCH_DETAIL.json is
# bench.py's sidecar, overwritten on every driver run): pinning a
# literal against one is exactly the r3-r5 drift bug, so the convention
# forbids it. BENCH_r{N}/CORRECTNESS_r{N} are frozen once written —
# literals against past rounds are stable and allowed.
DRIVER_REFRESHED = re.compile(r"^BENCH_DETAIL")


def _resolve(doc, dotted: str):
    """Resolve '.a.b[2].c' against parsed JSON; KeyError/IndexError on
    a miss (the test reports which claim broke)."""
    cur = doc
    for part in dotted.strip(".").split("."):
        m = re.fullmatch(r"([A-Za-z0-9_]+)(?:\[(\d+)\])?", part)
        assert m, f"bad path segment {part!r} in {dotted!r}"
        cur = cur[m.group(1)]
        if m.group(2) is not None:
            cur = cur[int(m.group(2))]
    return cur


def _claims():
    with open(README, encoding="utf-8") as fh:
        text = fh.read()
    claims = CLAIM_RE.findall(text)
    assert claims, (
        "README carries no machine-checkable artifact claims — the "
        "Measured section is expected to use the `FILE.json:.path "
        "[= value]` convention this test enforces"
    )
    return claims


@pytest.mark.parametrize(
    "fname,path,value",
    _claims(),
    ids=[f"{f}:{p}" for f, p, _ in _claims()],
)
def test_readme_claim_matches_artifact(fname, path, value):
    fpath = os.path.join(REPO, fname)
    assert os.path.exists(fpath), (
        f"README cites {fname} which is not committed at the repo root"
    )
    with open(fpath, encoding="utf-8") as fh:
        doc = json.load(fh)
    try:
        got = _resolve(doc, path)
    except (KeyError, IndexError, TypeError) as exc:
        raise AssertionError(
            f"README claims {fname}:{path} but the committed artifact "
            f"has no such field ({exc!r}) — artifact refreshed out from "
            f"under the prose; update README's Measured section"
        )
    if not value:  # findall yields '' for the absent optional group
        return  # existence claim — resolving it is the whole assertion
    assert not DRIVER_REFRESHED.match(fname), (
        f"README pins a literal against driver-refreshed {fname} — use "
        f"the existence form for per-round artifacts (this is the exact "
        f"r3-r5 drift failure mode)"
    )
    want = float(value.replace(",", "").replace("_", ""))
    got_f = float(got)
    assert got_f == pytest.approx(want, rel=1e-9), (
        f"README claims {fname}:{path} = {want} but the committed "
        f"artifact records {got_f} — update the prose to match"
    )
