"""Skew-preservation audit for the scaling-probe derivation (r6
verdict #5).

The 10×/100× evidence in SCALING_SF*.json rides on the isomorphic
derived datasets (scaling_probe.build). This probe answers two
questions about them:

1. **What happens to per-key frequency tails under the derivation?**
   Measured per grouping key that a skew-sensitive registry entry
   shuffles on. The derivation's rule decides the answer a priori —
   this probe MEASURES it so SCALING.md can cite numbers:

   - keys the derivation leaves UNSHIFTED (``l_returnflag`` for
     top_k_per_group, embeddings ``label``): every key's absolute
     count grows ×factor and its SHARE is exactly preserved — a true
     Zipf-preserving scale-up; the existing 10×/100× ratios for those
     entries already measure skew-growth behavior.
   - keys the derivation SHIFTS per replica ((l_partkey, l_suppkey)
     for compaction_merge; content-derived shingle/band keys for
     dedup_groups after per-replica token renaming): the hottest
     group's ABSOLUTE size stays constant while total rows grow
     ×factor, so its share shrinks ×factor — the derived rung
     UNDERSTATES hot-group growth for those entries.

2. **Do the understated entries survive a Zipf-preserving rung?**
   A skewed 10× rung where the grouping keys are NOT shifted:

   - ``lineitem``: l_orderkey shifts (row identity), l_partkey /
     l_suppkey / l_returnflag keep their base values → every
     (partkey, suppkey) group grows ×factor, share preserved.
   - ``documents``: doc_id shifts; a 5% slice (doc_id % 20 == 0)
     keeps its ORIGINAL text across replicas (real duplication: its
     LSH buckets and dedup clusters grow ×factor), the rest get the
     standard per-replica token renaming. This is the regime a 100 TB
     crawl actually presents — most new content distinct, a hot slice
     duplicated everywhere.

   compaction_merge / top_k_per_group / dedup_groups are timed at
   sf0.1 vs the skewed rung (noop-sink materialization, min-of-2,
   same policy as scaling_probe.py), with output row counts recorded
   — dedup_groups' output legitimately grows on the skewed rung
   because duplicated docs produce real dup-group rows.

Writes SKEW_PROBE.json. Usage: python skew_probe.py [factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from scaling_probe import KEY_OFF, SRC, _replicate

SKEW_DIR_TMPL = "/tmp/sparklinks_sf{factor}x_skew"


def key_tail(df, cols: list[str], top: int = 5) -> dict:
    total = df.count()
    rows = (
        df.groupBy(*cols).count().orderBy(F.desc("count"))
        .limit(top).collect()
    )
    return {
        "total_rows": total,
        "top_counts": [r["count"] for r in rows],
        "top1_share": round(rows[0]["count"] / total, 6) if rows else None,
    }


def measure_tails(spark: SparkSession, dirs: dict[str, str]) -> dict:
    """Per-key frequency tails for the skew-sensitive grouping keys, at
    every rung in ``dirs`` (tag -> dataset dir)."""
    out: dict[str, dict] = {}
    for tag, d in dirs.items():
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        docs = spark.read.parquet(f"{d}/documents.parquet")
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        # dedup_groups shuffles on content-derived shingle hashes; the
        # top word frequency is the cheap observable proxy with the
        # same derivation behavior (renamed tokens → disjoint keys)
        words = docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        out[tag] = {
            "lineitem_partkey_suppkey": key_tail(
                li, ["l_partkey", "l_suppkey"]),
            "lineitem_returnflag": key_tail(li, ["l_returnflag"]),
            "documents_word": key_tail(words, ["w"]),
            "embeddings_label": key_tail(emb, ["label"]),
        }
        ev_path = f"{d}/events.parquet"
        if os.path.exists(ev_path):
            out[tag]["events_user"] = key_tail(
                spark.read.parquet(ev_path), ["user_id"])
    return out


def build_skewed(spark: SparkSession, out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)

    def off(col: str):
        return (F.col(col) + F.col("__r") * F.lit(KEY_OFF)).alias(col)

    # lineitem: group keys (partkey, suppkey, returnflag) UNSHIFTED
    _replicate(spark, f"{SRC}/lineitem.parquet", factor).select(
        off("l_orderkey"), "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ).repartition(factor).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    # events: user_id UNSHIFTED (r7 verdict #4) — every per-user group
    # grows ×factor inside the SAME time range, the hot-user regime the
    # standard derivation's key shift hides from the windowed/sessional
    # entries (events_suite shuffles on user_id for gap_fill / anomaly
    # lookbacks / session windows / stream-stream attribution)
    _replicate(spark, f"{SRC}/events.parquet", factor).select(
        off("event_id"), "ts", "user_id", "event_type", "value", "props",
    ).repartition(factor).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    # documents: 5% verbatim duplicates across replicas, rest renamed
    docs = _replicate(spark, f"{SRC}/documents.parquet", factor)
    renamed = F.when(
        (F.col("__r") == 0) | (F.col("doc_id") % 20 == 0), F.col("text")
    ).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("x"), F.col("__r")),
            ),
            " ",
        )
    )
    docs.select(
        off("doc_id"), renamed.alias("text"), "lang", "source",
        F.length(renamed).cast("long").alias("n_chars"),
    ).repartition(factor).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def build_skewed_lineitem(spark: SparkSession, out_dir: str,
                          factor: int) -> None:
    """Just the Zipf-preserving lineitem rung (group keys unshifted —
    every (l_partkey, l_suppkey) group grows ×factor, share preserved),
    for entry-targeted runs where building documents/events too would
    dominate the probe's wall time."""
    os.makedirs(out_dir, exist_ok=True)

    def off(col: str):
        return (F.col(col) + F.col("__r") * F.lit(KEY_OFF)).alias(col)

    _replicate(spark, f"{SRC}/lineitem.parquet", factor).select(
        off("l_orderkey"), "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ).repartition(factor).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )


def build_hotkey_lineitem(spark: SparkSession, out_dir: str,
                          factor: int) -> None:
    """The Zipf HEAD the share-preserving derivation cannot produce:
    lineitem ×factor where every third replica's rows collapse onto ONE
    (l_partkey, l_suppkey) group — ~1/3 of all rows in a single group
    (at factor 100: ~20M rows in one key vs a ~12-row median group).
    This is the regime SURVEY §7.3 flags for A5's link_domain keys:
    a window prefilter must deliver every row of the hot key to one
    task, while the production two-phase aggregation bounds the hot
    key's reduce-side cost by its distinct-variant count."""
    os.makedirs(out_dir, exist_ok=True)

    def off(col: str):
        return (F.col(col) + F.col("__r") * F.lit(KEY_OFF)).alias(col)

    hot = (F.col("__r") % 3) == 0
    _replicate(spark, f"{SRC}/lineitem.parquet", factor).select(
        off("l_orderkey"),
        F.when(hot, F.lit(1).cast("bigint"))
        .otherwise(F.col("l_partkey")).alias("l_partkey"),
        F.when(hot, F.lit(1).cast("bigint"))
        .otherwise(F.col("l_suppkey")).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ).repartition(factor).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )


def _stage_task_quantiles(spark: SparkSession, stage: dict) -> list | None:
    """[min, median, max] executorRunTime (ms) across one stage's tasks
    via the UI REST taskSummary endpoint; None when unreachable."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return None
    app = spark.sparkContext.applicationId
    sid = stage.get("stageId")
    att = stage.get("attemptId", 0)
    url = (f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}"
           f"/taskSummary?quantiles=0.0,0.5,1.0")
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            summary = json.loads(resp.read())
        return [round(v, 1) for v in summary["executorRunTime"]]
    except Exception as exc:
        print(f"# taskSummary fetch failed (stage {sid}): {exc}",
              file=sys.stderr)
        return None


def _run_stage_spread(spark: SparkSession, prior_ids: set,
                      top_n: int = 2) -> list[dict]:
    """Per-stage task-time spread for the stages submitted since
    ``prior_ids`` (one timed run): the r10 verdict #4 evidence —
    max-task vs median-task time in the heavy (merge) stages, which a
    stage-total number can't show (a 32-task stage where one task does
    all the work totals the same as a balanced one)."""
    from scaling_probe import _completed_stages

    new = [s for s in _completed_stages(spark)
           if s.get("stageId") not in prior_ids]
    out = []
    for s in sorted(new, key=lambda s: -s.get("executorRunTime", 0))[:top_n]:
        run = _stage_task_quantiles(spark, s)
        row = {
            "name": (s.get("name") or "?")[:80],
            "n_tasks": s.get("numCompleteTasks", 0),
            "executor_run_ms": s.get("executorRunTime", 0),
            "input_mb": round(s.get("inputBytes", 0) / 2**20, 1),
            "shuffle_read_mb": round(
                s.get("shuffleReadBytes", 0) / 2**20, 1),
            "shuffle_write_mb": round(
                s.get("shuffleWriteBytes", 0) / 2**20, 1),
            "memory_spill_mb": round(
                s.get("memoryBytesSpilled", 0) / 2**20, 1),
        }
        if run is not None:
            row["task_run_ms_min_med_max"] = run
            if run[1]:
                row["max_over_median_task"] = round(run[2] / run[1], 2)
        out.append(row)
    return out


def compaction_main() -> None:
    """r10 verdict #4: skew-probe compaction_merge at 100×.

    Three rungs — sf0.1, the Zipf-preserving skewed rung (group keys
    unshifted: every group grows ×factor, share preserved), and a
    hot-key rung (~1/3 of all rows in ONE group, the Zipf head) — and
    BOTH plan forms: the production two-phase aggregation
    (compaction_merge, operators/compact.compact_links shape) and the
    min-over-window prefilter (compaction_merge_window). Each big-rung
    run records stage-level task-time quantiles, so the artifact shows
    max-task vs median-task in the merge stage directly.

    Usage: python skew_probe.py compaction [factor]
    Merges a "compaction_merge_100x" section into SKEW_PROBE.json.
    """
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    skew_dir = f"/tmp/sparklinks_sf{factor}x_skew_li"
    hot_dir = f"/tmp/sparklinks_sf{factor}x_hot_li"

    from globallinks_spark.queries import FULL_REGISTRY
    from globallinks_spark.session import get_spark

    spark = get_spark(app_name="skew_probe_compaction",
                      extra_conf={"spark.ui.enabled": "true"})

    for d, builder in ((skew_dir, build_skewed_lineitem),
                       (hot_dir, build_hotkey_lineitem)):
        if not os.path.exists(f"{d}/_BUILT"):
            t0 = time.perf_counter()
            builder(spark, d, factor)
            open(f"{d}/_BUILT", "w").close()
            print(f"# built {d} in {time.perf_counter() - t0:.0f}s",
                  file=sys.stderr)

    from scaling_probe import _completed_stages

    forms = ("compaction_merge", "compaction_merge_window")
    rungs = (("sf0.1", SRC), (f"skewed_{factor}x", skew_dir),
             (f"hotkey_{factor}x", hot_dir))
    results: dict[str, dict] = {}
    for name in forms:
        spec = FULL_REGISTRY[name]
        spec.fn(spark, "/root/testdata/sf0.001").write.format(
            "noop").mode("overwrite").save()  # codegen warm
        times: dict[str, float] = {}
        spreads: dict[str, list] = {}
        for tag, d in rungs:
            best, best_spread = float("inf"), None
            for _ in range(2):
                prior = {s.get("stageId") for s in _completed_stages(spark)}
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                spec.fn(spark, d).write.format("noop").mode(
                    "overwrite").save()
                wall = time.perf_counter() - t0
                spark.catalog.clearCache()
                if wall < best:
                    best = wall
                    if tag != "sf0.1":
                        best_spread = _run_stage_spread(spark, prior)
            times[tag] = round(best, 3)
            if best_spread:
                spreads[tag] = best_spread
            print(f"# {name} @ {tag}: {times[tag]}s", file=sys.stderr)
        results[name] = {
            "times_sec": times,
            "ratio_skewed": round(
                times[f"skewed_{factor}x"] / max(times["sf0.1"], 1e-9), 2),
            "ratio_hotkey": round(
                times[f"hotkey_{factor}x"] / max(times["sf0.1"], 1e-9), 2),
            "stage_task_spread": spreads,
        }

    section = {
        "factor": factor,
        "rungs": {
            "skewed": "group keys unshifted — every (l_partkey, "
                      "l_suppkey) group grows ×factor, share preserved",
            "hotkey": "~1/3 of all rows collapsed onto ONE group (the "
                      "Zipf head the share-preserving derivation "
                      "cannot produce)",
        },
        "forms": results,
        "plan_note": (
            "compaction_merge is the production two-phase aggregation "
            "(operators/compact.compact_links shape): phase 1 groups by "
            "the finer (group, flag, variant) key with map-side partial "
            "aggregation, so the phase-2 shuffle carries only distinct "
            "variants and a hot group's reduce cost is bounded by its "
            "variant count, not its row count — the salted-pre-agg "
            "bound (the variant columns ARE the salt). "
            "compaction_merge_window is the min-over-window prefilter: "
            "it must deliver every raw row of a key to one task, and "
            "AQE's skew handling cannot split it (OptimizeSkewedJoin "
            "applies to joins, not windows/aggregations), so the hot "
            "task grows linearly with the key and no runtime re-plan "
            "can bound it."
        ),
    }

    out_path = "SKEW_PROBE.json"
    doc = {}
    if os.path.exists(out_path):
        with open(out_path, encoding="utf-8") as fh:
            doc = json.load(fh)
    doc["compaction_merge_100x"] = section
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({"compaction_merge_100x": {
        f: {k: v for k, v in r.items() if k != "stage_task_spread"}
        for f, r in results.items()
    }}))
    spark.stop()


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    skew_dir = SKEW_DIR_TMPL.format(factor=factor)

    from globallinks_spark.queries import REGISTRY
    from globallinks_spark.session import get_spark

    spark = get_spark(app_name="skew_probe")

    # events joined the skewed build in r8 — a dir built by an earlier
    # round lacks it, so the build flag alone is not enough
    if not os.path.exists(f"{skew_dir}/_BUILT") or not os.path.exists(
        f"{skew_dir}/events.parquet"
    ):
        t0 = time.perf_counter()
        build_skewed(spark, skew_dir, factor)
        open(f"{skew_dir}/_BUILT", "w").close()
        print(f"# built {skew_dir} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    # tails at sf0.1 and (when present) the standard derived rungs
    dirs = {"sf0.1": SRC}
    for f_ in (factor, 100):
        d = f"/tmp/sparklinks_sf{f_}x"
        if os.path.exists(f"{d}/_BUILT"):
            dirs[f"derived_{f_}x"] = d
    dirs[f"skewed_{factor}x"] = skew_dir
    # the skewed dir only carries lineitem/documents; patch the
    # remaining tables through from sf0.1 for the tail pass
    for t in ("embeddings",):
        dst = f"{skew_dir}/{t}.parquet"
        if not os.path.exists(dst):
            spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
                "overwrite").parquet(dst)

    tails = measure_tails(spark, dirs)

    # r7 verdict #4: ≥6 skew-exposed entries, each with BOTH the wall
    # ratio and an output-normalized ratio — dedup_groups' output
    # legitimately grows ~14× on the skewed rung (duplicated docs make
    # real dup groups), so time-per-output-row separates work growth
    # from skew sensitivity. events_suite / tfidf_top_terms /
    # dedup_minhash_lsh are the added top shuffle entries (user_id,
    # term, and band-key shuffles respectively).
    entries = (
        "compaction_merge", "top_k_per_group", "dedup_groups",
        "events_suite", "tfidf_top_terms", "dedup_minhash_lsh",
    )
    results: dict[str, dict] = {}
    for name in entries:
        spec = REGISTRY[name]
        spec.fn(spark, "/root/testdata/sf0.001").write.format(
            "noop").mode("overwrite").save()  # codegen warm
        times, rows = {}, {}
        for tag, d in (("sf0.1", SRC), (f"skewed_{factor}x", skew_dir)):
            best = float("inf")
            for _ in range(2):
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                spec.fn(spark, d).write.format("noop").mode(
                    "overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            times[tag] = round(best, 3)
            rows[tag] = spec.fn(spark, d).count()
        skew_tag = f"skewed_{factor}x"
        ratio = round(times[skew_tag] / max(times["sf0.1"], 1e-9), 2)
        # seconds per 1k output rows on each side; their quotient is the
        # output-normalized ratio (1.0 = time tracked output exactly)
        per_row = {
            tag: round(times[tag] / max(rows[tag], 1) * 1000, 4)
            for tag in times
        }
        results[name] = {
            **times, "ratio": ratio, "rows": rows,
            "sec_per_1k_output_rows": per_row,
            "ratio_per_output_row": round(
                per_row[skew_tag] / max(per_row["sf0.1"], 1e-12), 2
            ),
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    out = {
        "metric": "skew_preservation_probe",
        "factor": factor,
        "key_frequency_tails": tails,
        "skewed_rung": results,
        "derivation_rules": {
            "preserved_share": ["l_returnflag", "embeddings.label"],
            "constant_absolute": [
                "(l_partkey, l_suppkey)", "documents shingle/band keys",
            ],
            "skewed_rung_rule": "group keys unshifted (lineitem; "
                                "events user_id); 5% verbatim "
                                "duplicate docs (documents)",
        },
    }
    with open("SKEW_PROBE.json", "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "factor")}))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "compaction":
        compaction_main()
    else:
        main()
