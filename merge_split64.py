"""Fold the cluster-split (64-file) 10M rung into EXTRACT_SCALING_10M.json
(r11 verdict #3, final piece).

EXTRACT_SCALING_SPLIT64.json is a full extract_scaling.py artifact run
with WATBENCH_N_FILES=64: the same 1M/10M rungs, but the 10M corpus is
read as 64 gzip files (~156k pages/task — the archive-layout shape a
real cluster import carries, vs the 8 fat 1.25M-page files the original
rung inherited from the one-file-per-core default). The hypothesis the
rung tests: the residual 10M count-path gap (ratio 0.823 calibrated
median / 0.857 mitigated) is the fat-gzip MAP task — per-task dedup agg
state plus a single ~200 MB gzip stream per task — and disappears when
splits are cluster-sized, recovering the materialized-path ≈1.0
linearity signal without any knob.

The auto-sizer's decisions on both layouts (prepass_probe.json, written
by prepass_probe.py) are recorded beside the ratios: the 64-file layout
must decide None (keep partial-then-final) and the 8-file layout must
decide a sized pre-exchange — the heuristic choosing correctly on the
very corpora the rung measures.

Usage: python merge_split64.py  (idempotent; rewrites the
cluster_split_64 section from the two source artifacts)
"""
import json
import os
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    with open(os.path.join(HERE, "EXTRACT_SCALING_SPLIT64.json")) as fh:
        split = json.load(fh)
    with open(os.path.join(HERE, "EXTRACT_SCALING_10M.json")) as fh:
        base = json.load(fh)

    prepass_path = "/tmp/prepass_probe.json"
    prepass = None
    if os.path.exists(prepass_path):
        with open(prepass_path) as fh:
            prepass = json.load(fh)

    rungs = split.get("rungs", {})
    r1m, r10m = rungs.get("1000000", {}), rungs.get("10000000", {})

    def med(xs):
        return round(statistics.median(xs)) if xs else None

    section = {
        "layout": "WATBENCH_N_FILES=64 — 10M pages as 64 gzip files "
                  "(~156k pages/task, archive shape) vs the original "
                  "rung's 8 x 1.25M-page fat files; 1M rung also 64 "
                  "files (~15.6k pages/task) for the same interleaved "
                  "A/B isolation",
        "runs_per_rung": split.get("runs_per_rung"),
        "rungs": rungs,
        "raw_median_per_rung": {
            "1000000": med(r1m.get("runs_pages_per_min_per_core", [])),
            "10000000": med(r10m.get("runs_pages_per_min_per_core", [])),
        },
        "ratio_raw_best": split.get("ratio_raw_best"),
        "ratio_calibrated_median": split.get("ratio_calibrated_median"),
        "ratio_materialized_best": split.get("ratio_materialized_best"),
        "ratio_materialized_median": split.get("ratio_materialized_median"),
        "prior_session_runs_note": (
            "a first pass of this rung ran 2026-08-16 ~20:00-21:40 and "
            "died with its harness mid run 2; its completed stderr "
            "lines are folded into the evidence (count-path only): 1M "
            "477,986 / 493,963 and 10M 427,587 pages/min/core -> raw "
            "ratio 0.895 and 0.866 vs that session's 1M runs"
        ),
        "prior_session_runs_ppm_core": {
            "1000000": [477986, 493963],
            "10000000": [427587],
        },
    }
    if prepass:
        section["auto_sizer_decisions"] = prepass

    base["cluster_split_64"] = section
    out = os.path.join(HERE, "EXTRACT_SCALING_10M.json")
    with open(out, "w") as fh:
        json.dump(base, fh, indent=1)
    print("ratio_materialized_median (64-file):",
          split.get("ratio_materialized_median"))
    print("ratio_calibrated_median (64-file):",
          split.get("ratio_calibrated_median"))
    print("ratio_raw_best (64-file):", split.get("ratio_raw_best"))


if __name__ == "__main__":
    main()
