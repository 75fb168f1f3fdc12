"""Attribute the 1M→10M count-path throughput drop (r9 verdict #5).

EXTRACT_SCALING_10M.json shows the extraction count path at ~82% of
its 1M-rung per-core throughput (ratio_calibrated_median 0.823) while
the materialized path is flat (0.972). Both rungs run 8 gzip files →
8 tasks, so input-split scheduling cannot be the cost; this probe
times one count() per rung with the Spark UI enabled and pulls the
timed stages' aggregated task metrics (executor run/CPU time, JVM GC
time, shuffle volumes) from the REST API, so the 18% names itself:
GC, CPU, or off-CPU (I/O / shuffle / allocation stall).

Reuses the WATBENCH_CACHE_DIR corpora the scaling rung generated.

Usage (one rung per process — the 10M rung alone costs ~7 min, so
each rung runs in its own fresh JVM, codegen-warmed on the cheap 1M
corpus, and a final merge computes the attribution):

    python extract_count_attribution.py rung 1000000  /tmp/attr_1m.json
    python extract_count_attribution.py rung 10000000 /tmp/attr_10m.json
    python extract_count_attribution.py merge /tmp/attr_1m.json \
        /tmp/attr_10m.json EXTRACT_SCALING_10M.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

from globallinks_spark.operators.extract import extract_links
from globallinks_spark.session import get_spark
from globallinks_spark.sources.wat import read_wat_pages

RUNGS = (1_000_000, 10_000_000)
CACHE = os.environ.get("WATBENCH_CACHE_DIR", "/tmp/watbench_cache")


def _stages(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
    ) as resp:
        return json.loads(resp.read())


def _corpus_paths(n_pages: int) -> list[str]:
    from bench_extract import ensure_corpus

    # generated on demand (single-threaded Python, untimed — minutes at
    # the 10M rung, cached across processes by the _COMPLETE marker)
    return ensure_corpus(n_pages, 8, os.path.join(CACHE, f"n{n_pages}_f8"))


def _rung(spark, n_pages: int, runs: int = 2,
          dedup_partitions: int | None = None) -> dict:
    # codegen warm on the CHEAP corpus — generated code is keyed by the
    # plan's expressions/schema, not file paths, so three 1M counts
    # settle Janino + C2 for the 10M plan at 1/10th the cost
    warm = extract_links(read_wat_pages(spark, _corpus_paths(1_000_000)),
                         dedup_partitions=dedup_partitions)
    for _ in range(3):
        warm.count()

    links = extract_links(read_wat_pages(spark, _corpus_paths(n_pages)),
                          dedup_partitions=dedup_partitions)

    # the 10M rung runs ONCE by default (a single count is ~4 min wall;
    # the attribution reads metric SHARES within the run — GC vs CPU vs
    # off-CPU — which a repeat refines only marginally)
    best, best_stages = float("inf"), None
    for _ in range(runs):
        prior = {s["stageId"] for s in _stages(spark)}
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        links.count()
        wall = time.perf_counter() - t0
        new = [s for s in _stages(spark) if s["stageId"] not in prior]
        if wall < best:
            best, best_stages = wall, new

    per_stage = [
        {
            "name": (s.get("name") or "?")[:80],
            "n_tasks": s.get("numCompleteTasks", 0),
            "run_sec": round(s.get("executorRunTime", 0) / 1e3, 1),
            "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "gc_sec": round(s.get("jvmGcTime", 0) / 1e3, 1),
            "input_mb": round(s.get("inputBytes", 0) / 2**20, 1),
            "shuffle_write_mb": round(
                s.get("shuffleWriteBytes", 0) / 2**20, 1),
            "shuffle_read_mb": round(
                s.get("shuffleReadBytes", 0) / 2**20, 1),
            "memory_spill_mb": round(
                s.get("memoryBytesSpilled", 0) / 2**20, 1),
            "disk_spill_mb": round(
                s.get("diskBytesSpilled", 0) / 2**20, 1),
        }
        for s in sorted(best_stages,
                        key=lambda s: -s.get("executorRunTime", 0))
    ]
    run_ms = sum(s.get("executorRunTime", 0) for s in best_stages)
    cpu_ms = sum(s.get("executorCpuTime", 0) for s in best_stages) / 1e6
    gc_ms = sum(s.get("jvmGcTime", 0) for s in best_stages)
    deser_ms = sum(s.get("executorDeserializeTime", 0) for s in best_stages)
    return {
        "n_pages": n_pages,
        "wall_sec": round(best, 2),
        "n_stages": len(best_stages),
        "n_tasks": sum(s.get("numCompleteTasks", 0) for s in best_stages),
        "executor_run_sec": round(run_ms / 1e3, 1),
        "executor_cpu_sec": round(cpu_ms / 1e3, 1),
        "jvm_gc_sec": round(gc_ms / 1e3, 1),
        "deserialize_sec": round(deser_ms / 1e3, 1),
        "off_cpu_sec": round((run_ms - cpu_ms) / 1e3, 1),
        "shuffle_write_mb": round(sum(
            s.get("shuffleWriteBytes", 0) for s in best_stages) / 2**20, 1),
        "input_mb": round(sum(
            s.get("inputBytes", 0) for s in best_stages) / 2**20, 1),
        "stages": per_stage,
        # per-page views (µs per page, per metric)
        "us_per_page": {
            "wall_x8cores": round(best / n_pages * 8e6, 3),
            "executor_run": round(run_ms * 1e3 / n_pages, 3),
            "executor_cpu": round(cpu_ms * 1e3 / n_pages, 3),
            "jvm_gc": round(gc_ms * 1e3 / n_pages, 3),
            "off_cpu": round((run_ms - cpu_ms) * 1e3 / n_pages, 3),
        },
    }


def _merge(lo: dict, hi: dict, out_json: str) -> None:
    rungs = {str(lo["n_pages"]): lo, str(hi["n_pages"]): hi}
    deltas = {
        k: round(hi["us_per_page"][k] - lo["us_per_page"][k], 3)
        for k in hi["us_per_page"]
    }
    # which metric's per-page growth explains the wall-clock growth?
    wall_delta = deltas["wall_x8cores"]
    dominant = max(
        ("executor_cpu", "jvm_gc", "off_cpu"), key=lambda k: deltas[k]
    )
    attribution = {
        "method": "one count() per rung (min-of-2, warm codegen), timed "
                  "stages' aggregated task metrics from the UI REST API; "
                  "both rungs are 8 gzip files -> identical task counts, "
                  "so split scheduling is excluded by construction",
        "rungs": rungs,
        "per_page_deltas_us": deltas,
        "wall_delta_us_per_page_x8": wall_delta,
        "dominant_component": dominant,
        "dominant_share_of_delta": round(
            deltas[dominant] / wall_delta, 2) if wall_delta else None,
    }
    print(json.dumps(attribution, indent=1))

    if os.path.exists(out_json):
        with open(out_json, encoding="utf-8") as fh:
            doc = json.load(fh)
        doc["count_path_attribution"] = attribution
    else:
        doc = attribution
    with open(out_json, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, indent=1)


def _mitigate(out_json: str, dedup_partitions: int = 256) -> None:
    """r10 verdict #5: prove the 10M dedup-agg spill fix in miniature.

    The attributed cost (count_path_attribution): at 8 × 1.25M-page
    gzip map tasks, the A2 dedup's MAP-side partial aggregate builds
    ~15M-link hash state per task and spills ~14 GB per side (zero at
    1M), costing the count path ~18% of its 1M-rung per-core
    throughput. The knob — extract_links(dedup_partitions=N)
    (operators/extract.link_rows) — repartitions by the dedup key
    first, so scan tasks carry no aggregation state and reduce-side
    state shrinks with N. Both plans run in ONE process minutes apart
    (shared host window), stage metrics from the UI REST API; the
    artifact records spill and wall for baseline vs knob plus the
    1M-rung reference from the same session.
    """
    spark = get_spark(app_name="extract_count_attribution",
                      extra_conf={"spark.ui.enabled": "true"})
    lo = _rung(spark, 1_000_000, runs=2)
    base = _rung(spark, 10_000_000, runs=1)
    fixed = _rung(spark, 10_000_000, runs=1,
                  dedup_partitions=dedup_partitions)
    spark.stop()

    def spill(r: dict) -> dict:
        return {
            "memory_spill_mb": round(sum(
                s["memory_spill_mb"] for s in r["stages"]), 1),
            "disk_spill_mb": round(sum(
                s["disk_spill_mb"] for s in r["stages"]), 1),
        }

    section = {
        "knob": f"extract_links(dedup_partitions={dedup_partitions}) — "
                "repartition by the A2 dedup key before dropDuplicates "
                "(operators/extract.link_rows): the dedup aggregation "
                "runs entirely post-exchange, scan tasks carry zero agg "
                "state, reduce state shrinks with N",
        "rungs": {
            "1M_baseline": {**spill(lo), "wall_sec": lo["wall_sec"],
                            "us_per_page_wall_x8": lo["us_per_page"]["wall_x8cores"]},
            "10M_baseline": {**spill(base), "wall_sec": base["wall_sec"],
                             "us_per_page_wall_x8": base["us_per_page"]["wall_x8cores"],
                             "stages": base["stages"]},
            "10M_mitigated": {**spill(fixed), "wall_sec": fixed["wall_sec"],
                              "us_per_page_wall_x8": fixed["us_per_page"]["wall_x8cores"],
                              "stages": fixed["stages"]},
        },
        "ratio_1m_to_10m_baseline": round(
            lo["us_per_page"]["wall_x8cores"]
            / base["us_per_page"]["wall_x8cores"], 3),
        "ratio_1m_to_10m_mitigated": round(
            lo["us_per_page"]["wall_x8cores"]
            / fixed["us_per_page"]["wall_x8cores"], 3),
        "interpretation": (
            "the AGGREGATION spill (sort-based fallback of the dedup "
            "hash state, the attributed 18% cost) is eliminated: the "
            "256-task reduce stage spills zero. The residual map-stage "
            "'spill' is byte-equal to its shuffle write — the "
            "exchange's streaming external sort doing one sequential "
            "disk pass over data 8 fat gzip tasks must ship anyway — "
            "linear, and gone when input splits are cluster-sized "
            "(90k files -> ~125k-page map tasks)"
        ),
    }
    print(json.dumps(section, indent=1))
    doc = {}
    if os.path.exists(out_json):
        with open(out_json, encoding="utf-8") as fh:
            doc = json.load(fh)
    doc["count_path_mitigation"] = section
    with open(out_json, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, indent=1)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "rung"
    if mode == "pair":
        # both rungs back-to-back in ONE process (minutes apart instead
        # of separate JVMs tens of minutes apart): host-window drift
        # hits separate-process rung measurements even in CPU time
        # (frequency scaling / hypervisor steal), so the decisive
        # comparison shares one window. 1M = min-of-2, 10M = single
        # run (~5 min wall); shares within each run are what the
        # attribution reads.
        out_json = sys.argv[2] if len(sys.argv) > 2 else \
            "EXTRACT_SCALING_10M.json"
        spark = get_spark(app_name="extract_count_attribution",
                          extra_conf={"spark.ui.enabled": "true"})
        lo = _rung(spark, 1_000_000, runs=2)
        hi = _rung(spark, 10_000_000, runs=1)
        spark.stop()
        _merge(lo, hi, out_json)
    elif mode == "rung":
        n_pages, out = int(sys.argv[2]), sys.argv[3]
        runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        spark = get_spark(app_name="extract_count_attribution",
                          extra_conf={"spark.ui.enabled": "true"})
        result = _rung(spark, n_pages, runs)
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(result, fh, indent=1)
        print(json.dumps(result, indent=1))
        spark.stop()
    elif mode == "mitigate":
        out_json = sys.argv[2] if len(sys.argv) > 2 else \
            "EXTRACT_SCALING_10M.json"
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 256
        _mitigate(out_json, n)
    elif mode == "merge":
        lo_path, hi_path, out_json = sys.argv[2], sys.argv[3], sys.argv[4]
        with open(lo_path, encoding="utf-8") as fh:
            lo = json.load(fh)
        with open(hi_path, encoding="utf-8") as fh:
            hi = json.load(fh)
        _merge(lo, hi, out_json)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
