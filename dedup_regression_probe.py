"""Quiet-window adjudication of the four dedup bench entries that
regressed r7→r8 on untouched code (r8 verdict #1a): dedup_incremental
(+70%), dedup_minhash_lsh (+65%), dedup_groups (+45%), simhash_near_dup
(+31%). All four plans are bit-identical since r7 (`git diff
f45cc32..HEAD -- globallinks_spark/operators/dedup.py` is empty), so
the question is whether the r8 driver numbers were a co-tenant host
window or a real regression.

Method (bench.py's own policy, isolated): per entry, warm codegen once
at sf0.001, then N timed runs at sf0.1 with System.gc() outside the
window and clearCache between; an 8-core strhash host probe brackets
the sample (quiet window = probe within ~1.2x of the pinned 2.203 s and
run spread ≤ ~1.2). Verdict per entry: quiet-window min vs the r7 and
r8 driver figures.

Writes DEDUP_REGRESSION_R9.json. Run serially on an idle machine.
"""

from __future__ import annotations

import json
import time

from bench import PINNED_8CORE_STRHASH_SEC
from globallinks_spark.queries import REGISTRY
from globallinks_spark.session import get_spark

ENTRIES = {
    # name: (r7 driver figure, r8 driver figure)
    "dedup_incremental": (1.643, 2.798),
    "dedup_minhash_lsh": (1.612, 2.658),
    "dedup_groups": (2.311, 3.36),
    "simhash_near_dup": (1.646, 2.154),
}
SF_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"
RUNS = 5


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _host_probe(spark) -> float:
    t0 = time.perf_counter()
    spark.range(160_000_000, numPartitions=8).selectExpr(
        "bit_xor(xxhash64(cast(id as string))) as s"
    ).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = get_spark(app_name="dedup_regression_probe")
    for name in ENTRIES:
        _materialize(REGISTRY[name].fn(spark, WARM_DIR))
    spark.catalog.clearCache()

    probe_before = _host_probe(spark)
    out: dict = {
        "sf_dir": SF_DIR,
        "runs_per_entry": RUNS,
        "pinned_probe_sec": PINNED_8CORE_STRHASH_SEC,
        "probe_before": probe_before,
        "entries": {},
    }
    for name, (r7, r8) in ENTRIES.items():
        samples = []
        for _ in range(RUNS):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            _materialize(REGISTRY[name].fn(spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        best = min(samples)
        out["entries"][name] = {
            "runs_sec": samples,
            "best_sec": best,
            "spread": round(max(samples) / best, 2),
            "r7_driver_sec": r7,
            "r8_driver_sec": r8,
            "vs_r7": round(best / r7, 2),
            "vs_r8": round(best / r8, 2),
            "verdict": (
                "quiet-window time within 1.2x of r7 — r8 figure was a "
                "host window, not a plan regression"
                if best <= 1.2 * r7
                else "still above 1.2x of r7 in a quiet window — "
                     "investigate the plan"
            ),
        }
        print(f"# {name}: best {best}s runs {samples} "
              f"(r7 {r7}, r8 {r8})")
    out["probe_after"] = _host_probe(spark)
    out["window_quiet"] = (
        max(out["probe_before"], out["probe_after"])
        <= 1.2 * PINNED_8CORE_STRHASH_SEC
    )
    with open("DEDUP_REGRESSION_R9.json", "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v["best_sec"] for k, v in out["entries"].items()}
                     | {"probe_before": probe_before,
                        "probe_after": out["probe_after"]}))
    spark.stop()


if __name__ == "__main__":
    main()
