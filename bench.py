"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes with a full materialization action (count on the final
plan) so the timing covers scan → shuffle → agg, not plan construction.
A warmup query absorbs JVM/codegen startup so per-query numbers reflect
steady-state throughput — the regime that matters at 100 TB.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from globallinks_spark.queries import REGISTRY
from globallinks_spark.session import get_spark

BENCH_QUERIES = (
    "pricing_summary",
    "compaction_merge",
    "api_merge",
    "api_query",
    "join_enrich",
    "counters",
    "top_k_per_group",
    "url_parse",
    "window_running",
    "sessionize",
    "dedup_exact",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash_fingerprint",
    "embedding_cosine_topk",
    "embedding_near_dup",
    "ann_sign_lsh",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "multimodal_meta",
    "streaming_window",
    "asof_join",
    "filter_sum",
    "rollup_revenue",
    "skew_distinct",
    "set_ops",
    "pivot_status",
    "winnow_fingerprint",
    "cube_revenue",
    "quantiles",
    "stats_agg",
    "approx_profile",
    "ann_ivf",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark(app_name="globallinks_bench")

    # warmup: trigger JVM init + codegen on a trivial plan
    REGISTRY["pricing_summary"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
