"""Extraction-pipeline 10× scaling rung (r6 verdict #3).

Every registry query has a 10×/100× probe (SCALING_SF*.json); the
extraction pipeline itself had only ever been measured at 100-160k
pages — its linearity was asserted, not measured. This probe runs the
bench_extract kernel at 100k and 1M synthetic WAT pages, each rung in
its own FRESH subprocess JVM (same isolation as bench.py's headline),
interleaved A/B/A/B so a host co-tenancy window cannot land entirely
on one rung, and reports the throughput ratio

    ratio = best_rate(1M) / best_rate(100k)   (pages/min/core)

≈ 1.0 means the pipeline is linear in page count: the extract plan is
scan → JSON parse → explode → per-row kernels → per-segment dedup, so
per-page cost should be flat; a ratio well below 1 would expose a
superlinear stage (e.g. the A2 dedup shuffle degrading with volume).
Ratios are also computed on host-calibrated rates (each run's own
8-core string-hash probe, pinned as in bench.py) to cancel window
drift between interleaved runs.

r8 (verdict #2): the headline linearity figure is now the
``ratio_calibrated_median`` — each rung's calibrated MEDIAN over ≥4
fresh-JVM runs (the same fixed-count median policy as bench.py's
extract gate), because 2-runs-per-rung best-of ratios sit inside the
very host-window noise the calibration exists to tame. The best-of
ratios stay recorded for continuity.

r9 (verdict #3b): the 100k rung is fixed-overhead-dominated (its ~2.3 s
extract pays per-task scheduling + gzip-open costs that 1M amortizes),
so the 100k→1M ratio over-states "speedup with scale". The decisive
linearity pair is 1M→10M, run as
``python extract_scaling.py 3 1000000,10000000 EXTRACT_SCALING_10M.json``
(rungs and outfile are now parameters; default unchanged). Set
WATBENCH_CACHE_DIR to reuse each rung's generated corpus across the
fresh-JVM runs — generation is untimed single-threaded Python.

Writes EXTRACT_SCALING.json (default).
Usage: python extract_scaling.py [rounds] [rung1,rung2] [outfile]
"""

from __future__ import annotations

import json
import statistics
import sys

from bench import PINNED_8CORE_STRHASH_SEC, _fresh_jvm_extract_once

DEFAULT_RUNGS = (100_000, 1_000_000)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    RUNGS = tuple(
        int(x) for x in sys.argv[2].split(",")
    ) if len(sys.argv) > 2 else DEFAULT_RUNGS
    outfile = sys.argv[3] if len(sys.argv) > 3 else "EXTRACT_SCALING.json"
    assert len(RUNGS) == 2, "exactly two rungs per comparison"
    runs: dict[int, list[dict]] = {n: [] for n in RUNGS}
    for _ in range(rounds):
        for n in RUNGS:  # interleave rungs across rounds
            # the big rung's subprocess does ~10 passes over the corpus
            # plus (first run only, under WATBENCH_CACHE_DIR)
            # single-threaded corpus gen — give it room
            r = _fresh_jvm_extract_once(n, 8, timeout_sec=7200)
            if r is not None:
                runs[n].append(r)
                print(f"# {n} pages: {r['value']} pages/min/core "
                      f"(extract {r['extract_sec']}s, probe "
                      f"{r['host']['jvm_8core_160M_strhash_sec']}s)",
                      file=sys.stderr)

    def best(n: int, key: str = "value") -> float | None:
        vals = [r[key] for r in runs[n]]
        return max(vals) if vals else None

    def calibrated(r: dict) -> float:
        p = r["host"]["jvm_8core_160M_strhash_sec"]
        return r["value"] * p / PINNED_8CORE_STRHASH_SEC

    out = {
        "metric": "extract_scaling_10x",
        "rung_pair": [RUNGS[0], RUNGS[1]],
        "cores": 8,
        "rungs": {
            str(n): {
                "runs_pages_per_min_per_core": [r["value"] for r in runs[n]],
                "runs_calibrated": [round(calibrated(r)) for r in runs[n]],
                "runs_extract_sec": [r["extract_sec"] for r in runs[n]],
                "runs_materialized_ppm_core": [
                    r["materialized_pages_per_min_per_core"]
                    for r in runs[n]
                ],
            }
            for n in RUNGS
        },
    }
    b_small, b_big = best(RUNGS[0]), best(RUNGS[1])
    if b_small and b_big:
        out["ratio_raw_best"] = round(b_big / b_small, 3)
    cal = {n: [calibrated(r) for r in runs[n]] for n in RUNGS}
    if cal[RUNGS[0]] and cal[RUNGS[1]]:
        out["ratio_calibrated_best"] = round(
            max(cal[RUNGS[1]]) / max(cal[RUNGS[0]]), 3
        )
        # the headline (r7 verdict #2): calibrated MEDIAN per rung —
        # same policy as bench.py's gate figure (fixed run count,
        # host-calibrated, median absorbs the residual windows). Each
        # rung's median is also capped at its best raw rate, mirroring
        # bench.py's cancel-noise-never-manufacture rule (ADVICE r7).
        med = {
            n: min(statistics.median(cal[n]), max(r["value"]
                                                  for r in runs[n]))
            for n in RUNGS
        }
        out["calibrated_median_per_rung"] = {
            str(n): round(med[n]) for n in RUNGS
        }
        out["ratio_calibrated_median"] = round(
            med[RUNGS[1]] / med[RUNGS[0]], 3
        )
        out["runs_per_rung"] = {str(n): len(runs[n]) for n in RUNGS}
    mat = {n: [r["materialized_pages_per_min_per_core"] for r in runs[n]]
           for n in RUNGS}
    if mat[RUNGS[0]] and mat[RUNGS[1]]:
        out["ratio_materialized_best"] = round(
            max(mat[RUNGS[1]]) / max(mat[RUNGS[0]]), 3
        )
        out["ratio_materialized_median"] = round(
            statistics.median(mat[RUNGS[1]])
            / statistics.median(mat[RUNGS[0]]), 3
        )
    with open(outfile, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rungs"}))


if __name__ == "__main__":
    main()
