"""sf1 scaling probe: does every registry query scale ~linearly from
sf0.1 to a 10× dataset?

The driver ships sf0.001/0.01/0.1 only, so the probe DERIVES a 10×
dataset from sf0.1 (never touching /root/testdata): each table is
replicated ``factor`` times as an ISOMORPHIC copy with disjoint keys —

- fact/dim keys shift by a per-replica offset (joins stay 1:1 with the
  original fan-out; region/nation are fixed dims and stay canonical);
- document words get a per-replica suffix (a bijective token renaming:
  within-replica shingle/Jaccard structure is preserved EXACTLY,
  cross-replica shingle intersection is empty — so near-dup pair
  counts scale exactly ×factor, never quadratically);
- embeddings get a per-replica deterministic sign-flip per dimension
  (an orthogonal transform: within-replica inner products preserved
  exactly, cross-replica cosines scrambled to ~0).

That makes the probe a test of the ENGINE's scaling, not of
accidentally denser data: a query whose sf1/sf0.1 wall-time ratio is
far above ~10-12× has a superlinear plan.

File layout matters as much as row count: sf0.1 tables are single
parquet files, and a naive replicated write produces ONE ~10× file per
table — which `maxPartitionBytes=256m` scans as ONE task, serializing
every scan-bound query on one core and inflating its ratio toward the
raw data factor (r04 measured dedup_exact at 8.86× for exactly this
reason). A 100 TB table is never one file; the probe writes each
derived table as ``factor`` files so scan parallelism grows with the
data the way any real layout's would, and the ratio measures the
ENGINE's plan, not an artificial single-task scan.

Usage:  python scaling_probe.py [factor] [out_json] [only_csv] [runs]
Writes SCALING_SF1.json (per-query sf0.1/sf1 seconds + ratio) and
prints a summary. ``only_csv`` (optional; '-' = all) restricts to a
comma-list of registry entries. ``runs`` (default 2) is the timed
repetitions per side — the 100× full-registry sweep uses runs=1 to
bound wall time by sampling repetitions instead of skipping entries
(a quadratic announces itself at 10×+ the expected ratio; single-run
noise is ~±30%, far below that signal). The derived dataset lands in
/tmp/sparklinks_sfX (regenerable, not part of the repo).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
KEY_OFF = 10_000_000  # beyond every key domain in sf0.1


def _replicate(spark: SparkSession, path: str, factor: int) -> DataFrame:
    df = spark.read.parquet(path)
    reps = spark.range(factor).withColumnRenamed("id", "__r")
    return df.crossJoin(F.broadcast(reps))


def _off(col: str) -> F.Column:
    return (F.col(col) + F.col("__r") * F.lit(KEY_OFF)).alias(col)


def build(spark: SparkSession, out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)

    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")

    plans: dict[str, list] = {
        "customer": [_off("c_custkey"), "c_name", "c_nationkey",
                     "c_acctbal", "c_mktsegment"],
        "supplier": [_off("s_suppkey"), "s_name", "s_nationkey",
                     "s_acctbal"],
        "part": [_off("p_partkey"), "p_name", "p_brand", "p_type",
                 "p_size", "p_retailprice"],
        "orders": [_off("o_orderkey"), _off("o_custkey"), "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"],
        "lineitem": [_off("l_orderkey"), _off("l_partkey"),
                     _off("l_suppkey"), "l_linenumber", "l_quantity",
                     "l_extendedprice", "l_discount", "l_tax",
                     "l_returnflag", "l_linestatus", "l_shipdate"],
    }
    for t, cols in plans.items():
        _replicate(spark, f"{SRC}/{t}.parquet", factor).select(
            *cols
        ).repartition(factor).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    # events: each replica shifts uniformly past the previous one —
    # keeping timestamps unshifted would DENSIFY the event stream ×
    # factor (every time-window query's per-window row count grows ×
    # factor and window-pair counts ×factor², a quadratic workload the
    # engine is then blamed for). A uniform shift preserves per-user
    # gaps/sessions and global density exactly.
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_sec = int((hi - lo).total_seconds()) + 3600
    _replicate(spark, f"{SRC}/events.parquet", factor).select(
        _off("event_id"),
        (F.col("ts") + F.make_interval(
            secs=F.col("__r").cast("double") * span_sec
        )).alias("ts"),
        _off("user_id"), "event_type", "value", "props",
    ).repartition(factor).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    # documents: bijective per-replica token renaming (w → w + 'x<r>'
    # for r>0). Shingle sets map 1:1 within a replica, intersect empty
    # across replicas.
    docs = _replicate(spark, f"{SRC}/documents.parquet", factor)
    renamed = F.when(F.col("__r") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("x"), F.col("__r")),
            ),
            " ",
        )
    )
    docs.select(
        _off("doc_id"), renamed.alias("text"), "lang", "source",
        F.length(renamed).cast("long").alias("n_chars"),
    ).repartition(factor).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    # embeddings: per-(replica, dim) deterministic sign flip — an
    # orthogonal transform per replica (replica 0 is the identity)
    emb = _replicate(spark, f"{SRC}/embeddings.parquet", factor)
    flipped = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x * (F.lit(1) - F.lit(2)
                 * F.pmod(F.hash(F.col("__r"), i), F.lit(2)))
            .cast("float")
        ),
    )
    emb.select(
        _off("vec_id"),
        F.when(F.col("__r") == 0, F.col("embedding"))
        .otherwise(flipped).alias("embedding"),
        "label",
    ).repartition(factor).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def _completed_stages(spark: SparkSession) -> list[dict]:
    """Completed-stage metrics from the live UI's REST API (the same
    numbers the Spark UI stage table shows). Returns [] when the UI is
    disabled or unreachable — attribution is then skipped, never fatal."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return []
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            return json.loads(resp.read())
    except Exception as exc:
        print(f"# stage REST fetch failed: {exc}", file=sys.stderr)
        return []


def _dominant_stage(spark: SparkSession, prior_ids: set[int]) -> dict | None:
    """Attribute the stages submitted since ``prior_ids`` (one timed
    run) to their dominant cost: the stage with the largest
    executorRunTime, plus its share of the run's total executor time
    and its scan/shuffle volumes (r9 verdict #2 — the worst-5 100×
    ratios needed a named dominant stage, not just a wall number)."""
    new = [s for s in _completed_stages(spark)
           if s.get("stageId") not in prior_ids]
    if not new:
        return None
    total_ms = sum(s.get("executorRunTime", 0) for s in new) or 1
    top = max(new, key=lambda s: s.get("executorRunTime", 0))
    return {
        "name": (top.get("name") or "?")[:120],
        "executor_run_ms": top.get("executorRunTime", 0),
        "share_of_run": round(top.get("executorRunTime", 0) / total_ms, 3),
        "input_mb": round(top.get("inputBytes", 0) / 2**20, 1),
        "shuffle_write_mb": round(
            top.get("shuffleWriteBytes", 0) / 2**20, 1),
        "shuffle_read_mb": round(
            top.get("shuffleReadBytes", 0) / 2**20, 1),
        "n_stages_in_run": len(new),
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else "SCALING_SF1.json"
    only = (set(sys.argv[3].split(","))
            if len(sys.argv) > 3 and sys.argv[3] != "-" else None)
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    big_dir = f"/tmp/sparklinks_sf{factor}x"

    from globallinks_spark.queries import FULL_REGISTRY, REGISTRY
    from globallinks_spark.session import get_spark

    # the default sweep covers the 50 consolidated driver entries; a
    # targeted only_csv run may also name any FULL_REGISTRY entry
    # (e.g. a new operator that has not yet been folded into a driver
    # suite), with driver names winning on collision
    base: dict = dict(FULL_REGISTRY)
    base.update(REGISTRY)
    registry = {k: v for k, v in (REGISTRY if only is None
                                  else base).items()
                if only is None or k in only}
    if only and (missing := only - set(registry)):
        raise SystemExit(f"unknown registry entries: {sorted(missing)}")

    # SPARK_GRAFT_STAGE_DETAIL=1 → attribute each big-side run to its
    # dominant stage via the UI REST API (needs the UI enabled)
    stage_detail = os.environ.get("SPARK_GRAFT_STAGE_DETAIL", "0") == "1"
    spark = get_spark(
        app_name="scaling_probe",
        extra_conf={"spark.ui.enabled": "true"} if stage_detail else None,
    )

    if not os.path.exists(f"{big_dir}/_BUILT"):
        t0 = time.perf_counter()
        build(spark, big_dir, factor)
        open(f"{big_dir}/_BUILT", "w").close()
        print(f"# built {big_dir} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    results: dict[str, dict] = {}
    for name, spec in registry.items():
        try:
            # noop sink = full-column materialization (count() lets
            # ColumnPruning skip aggregate functions — see bench.py)
            spec.fn(spark, "/root/testdata/sf0.001").write.format(
                "noop").mode("overwrite").save()  # codegen warm
            times = {}
            runs_sec: dict[str, list[float]] = {}
            dominant = None
            for tag, d in (("sf0.1", SRC), (f"sf{factor}x", big_dir)):
                samples: list[float] = []
                for i_run in range(runs):
                    prior = ({s.get("stageId")
                              for s in _completed_stages(spark)}
                             if stage_detail and d == big_dir else set())
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.perf_counter()
                    spec.fn(spark, d).write.format("noop").mode(
                        "overwrite").save()
                    samples.append(time.perf_counter() - t0)
                    spark.catalog.clearCache()
                    if stage_detail and d == big_dir:
                        dom = _dominant_stage(spark, prior)
                        # keep the attribution of the FASTEST big run —
                        # the plan's reproducible cost, not a noise spike.
                        # ADVICE r10: stamp WHICH run it came from — when
                        # the fastest run's REST fetch fails, the kept
                        # attribution is a slower run's, and without the
                        # stamp that mismatch with min(runs_sec) was
                        # invisible in the artifact.
                        if dom is not None and (
                            dominant is None
                            or samples[-1] == min(samples)
                        ):
                            dominant = dict(
                                dom,
                                attributed_run_index=i_run,
                                attributed_run_sec=round(samples[-1], 3),
                            )
                times[tag] = round(min(samples), 3)
                runs_sec[tag] = [round(s, 3) for s in samples]
            ratio = round(times[f"sf{factor}x"] / max(times["sf0.1"], 1e-9), 2)
            results[name] = {**times, "ratio": ratio, "runs_sec": runs_sec}
            if dominant is not None:
                results[name]["dominant_stage"] = dominant
            print(f"# {name}: {times['sf0.1']}s -> "
                  f"{times[f'sf{factor}x']}s  ({ratio}x)", file=sys.stderr)
        except Exception as exc:
            results[name] = {"err": str(exc)[:200]}
            print(f"# {name}: ERR {exc}", file=sys.stderr)

    ok = {k: v for k, v in results.items() if "ratio" in v}
    summary = {
        "factor": factor,
        "runs_per_side": runs,
        "n_queries": len(results),
        "worst": dict(sorted(ok.items(), key=lambda kv: -kv[1]["ratio"])[:5]),
        "median_ratio": sorted(v["ratio"] for v in ok.values())[len(ok) // 2]
        if ok else None,
        "queries": results,
    }
    with open(out_json, "w", encoding="utf-8") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("factor", "n_queries", "median_ratio", "worst")}))
    spark.stop()


if __name__ == "__main__":
    main()
