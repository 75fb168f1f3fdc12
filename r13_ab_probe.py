"""r13 interleaved A/B probe — same methodology as r12's opt_probe.py
but over INLINE builder pairs, so an old form and a new form alternate
in ONE JVM (min-of-N each, warmup first, noop sink, System.gc +
clearCache between runs). Cross-session absolute seconds on this host
swing with co-tenancy windows; interleaving cancels them to first
order (OPTIMIZATION_r12.md "Method").

Usage: python r13_ab_probe.py <case>[,<case>...] [runs]

Cases are registered in CASES below; each is {variant: builder(spark,
sf_dir) -> DataFrame}. Prints one JSON line
{case: {variant: {"sec": min, "runs": [...]}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from globallinks_spark.queries_base import load
from globallinks_spark.session import get_spark

# ---------------------------------------------------------------------------
# gap_fill: r12 form (no persist — per_hr aggregate recomputed by both
# branches, two events scans) vs r13 form (persist + count barrier)


def _gap_fill(events, persist: bool):
    hr = F.date_trunc("hour", F.col("ts"))
    per_hr = events.groupBy(F.col("user_id"), hr.alias("hour")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("hour_value"),
    )
    if persist:
        per_hr = per_hr.persist()
        per_hr.count()
    bounds = per_hr.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour")))
        .alias("hour"),
    )
    joined = grid.join(per_hr, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id", "hour",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        "hour_value",
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n_events").isNull().alias("gap"),
    )


def gap_fill_old(spark, sf_dir):
    return _gap_fill(load(spark, sf_dir, "events"), persist=False)


def gap_fill_new(spark, sf_dir):
    return _gap_fill(load(spark, sf_dir, "events"), persist=True)


def gap_fill_leadexplode(spark, sf_dir):
    """No-join form: each real per-hour row explodes the grid hours
    [hour, next_real_hour) it is responsible for — the bounds agg, the
    grid build AND the grid⋈per_hr join all disappear. filled_value is
    carried forward on the REAL rows (last non-null hour_value) before
    the explode, so gap rows inherit it from their parent row; the gap
    rows' own hour_value is NULL and can never affect the carry."""
    events = load(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    per_hr = events.groupBy(F.col("user_id"), hr.alias("hour")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("hour_value"),
    )
    w = (
        Window.partitionBy("user_id").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlead = Window.partitionBy("user_id").orderBy("hour")
    carried = per_hr.select(
        "user_id", "hour", "n_events", "hour_value",
        F.last("hour_value", ignorenulls=True).over(w).alias("__filled"),
        F.lead("hour").over(wlead).alias("__nxt"),
    )
    grid = carried.select(
        "user_id", "n_events", "hour_value", "__filled",
        F.col("hour").alias("__h"),
        F.explode(
            F.sequence(
                "hour",
                F.coalesce(
                    F.col("__nxt") - F.expr("interval 1 hour"),
                    F.col("hour"),
                ),
                F.expr("interval 1 hour"),
            )
        ).alias("hour"),
    )
    real = F.col("hour") == F.col("__h")
    return grid.select(
        "user_id", "hour",
        F.when(real, F.col("n_events")).otherwise(F.lit(0).cast("bigint"))
        .alias("n_events"),
        F.when(real, F.col("hour_value")).alias("hour_value"),
        F.col("__filled").alias("filled_value"),
        (~real).alias("gap"),
    )


# ---------------------------------------------------------------------------
# range_join (prior_event_stats): r12 form (LEFT join, LEFT side
# exploded into 2 bucket rows) vs r13 candidate (LEFT side single-row,
# RIGHT side exploded into the 2 buckets it can serve — halves the
# preserved-side rows and the null padding into the aggregation)


def _prior_event_stats(events, explode_side: str, lookback_sec: int = 600):
    bucket_sec = lookback_sec
    l = events.select(F.col("event_id"), F.col("ts").alias("l_ts"))
    r = events.select(F.col("ts").alias("r_ts"), F.col("value").alias("r_value"))
    lsec = F.unix_timestamp(F.col("l_ts"))
    rsec = F.unix_timestamp(F.col("r_ts"))
    n_buckets = -(-lookback_sec // bucket_sec) + 1
    exact = (
        F.col("r_ts") > F.col("l_ts") - F.expr(f"INTERVAL {lookback_sec} SECOND")
    ) & (F.col("r_ts") < F.col("l_ts"))
    if explode_side == "left":
        bbase = F.floor(lsec / bucket_sec)
        l2 = l.withColumn(
            "_bucket",
            F.explode(F.array(*[bbase - i for i in range(n_buckets)])),
        )
        r2 = r.withColumn("_bucket", F.floor(rsec / bucket_sec))
    else:
        rbase = F.floor(rsec / bucket_sec)
        l2 = l.withColumn("_bucket", F.floor(lsec / bucket_sec))
        r2 = r.withColumn(
            "_bucket",
            F.explode(F.array(*[rbase + i for i in range(n_buckets)])),
        )
    joined = l2.join(r2, (l2["_bucket"] == r2["_bucket"]) & exact, "left")
    return joined.groupBy("event_id").agg(
        F.count("r_ts").alias("n_prior"),
        F.coalesce(
            F.round(
                F.sum(F.col("r_value").cast("decimal(18,2)")).cast("double"), 2
            ),
            F.lit(0.0),
        ).alias("prior_value"),
    )


def range_join_lexplode(spark, sf_dir):
    return _prior_event_stats(load(spark, sf_dir, "events"), "left")


def range_join_rexplode(spark, sf_dir):
    return _prior_event_stats(load(spark, sf_dir, "events"), "right")


# ---------------------------------------------------------------------------
# quantiles (stats_profile member): percentile(array) whole-multiset
# TypedImperativeAggregate vs the distributed two-phase form — pre-agg
# (group, value) counts, per-group window cumsum, conditional-max rank
# lookup with Spark's own interpolation arithmetic
# ((higher - position) * vlo + (position - lower) * vhi, position =
# p * (n - 1)) so the doubles are bit-identical.

_QUANT_PS = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p99", 0.99)]


def quantiles_old(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.99))"
        ).alias("ps")
    )
    return agg.select(
        "l_returnflag",
        F.round(F.col("ps")[0], 4).alias("p25"),
        F.round(F.col("ps")[1], 4).alias("p50"),
        F.round(F.col("ps")[2], 4).alias("p75"),
        F.round(F.col("ps")[3], 4).alias("p99"),
    )


def quantiles_new(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    vc = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = F.sum("c").over(wcum)
    frame = vc.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        (cum - F.col("c")).alias("pc"),   # exclusive prefix (0-based start)
        cum.alias("cc"),                  # inclusive prefix
        F.sum("c").over(wall).alias("n"),
    )
    aggs = []
    for tag, p in _QUANT_PS:
        pos = F.lit(p) * (F.col("n") - F.lit(1)).cast("double")
        lo = F.floor(pos)
        hi = F.ceil(pos)
        aggs.append(F.max(
            F.when((F.col("pc") <= lo) & (lo < F.col("cc")), F.col("v"))
        ).alias(f"vlo_{tag}"))
        aggs.append(F.max(
            F.when((F.col("pc") <= hi) & (hi < F.col("cc")), F.col("v"))
        ).alias(f"vhi_{tag}"))
    grouped = frame.groupBy("l_returnflag", "n").agg(*aggs)
    outs = []
    for tag, p in _QUANT_PS:
        pos = F.lit(p) * (F.col("n") - F.lit(1)).cast("double")
        lo = F.floor(pos)
        hi = F.ceil(pos)
        exact = F.when(
            hi == lo, F.col(f"vlo_{tag}")
        ).otherwise(
            (hi.cast("double") - pos) * F.col(f"vlo_{tag}")
            + (pos - lo.cast("double")) * F.col(f"vhi_{tag}")
        )
        outs.append(F.round(exact, 4).alias(tag))
    return grouped.select("l_returnflag", *outs)


# ---------------------------------------------------------------------------
# bpe token count kernel: size(regexp_extract_all(...)) materializes an
# array of every token; the array-free equivalent collapses alnum runs
# to one char and strips whitespace - each alpha/digit run and each
# other non-space char is exactly one token (verified 0 mismatches over
# all documents at sf0.01/0.1 plus unicode/NBSP edge strings).

_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokcount_old(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
        .alias("n"),
    )


def tokcount_new(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), r"[A-Za-z]+|[0-9]+", "x"),
                r"\s", "",
            )
        ).alias("n"),
    )


# ---------------------------------------------------------------------------
# span_dedup_rewrite: unpersisted tokenized frame w feeds both the gram
# branch and the join-back branch -> docs scanned + tokenized twice.
# Candidate: persist w with count barrier (the PPJoin convention).


def _span_dedup(docs, persist: bool, n: int = 4):
    from globallinks_spark.functions import text as TX

    w = docs.select("doc_id", TX.words(F.col("text")).alias("w"))
    if persist:
        w = w.persist()
        w.count()
    grams = w.select(
        "doc_id",
        F.posexplode(TX.shingles_seq(F.col("w"), n)).alias("pos", "gram"),
    )
    rk = F.row_number().over(
        Window.partitionBy("gram").orderBy("doc_id", "pos")
    )
    dup_starts = (
        grams.withColumn("rk", rk)
        .filter(F.col("rk") > 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("ds"))
    )
    n_tokens = F.size("w")
    idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_tokens - 1, F.lit(0))),
        lambda t: t < n_tokens,
    )
    covered = lambda t: F.exists(
        F.col("ds"), lambda s: (s >= t - (n - 1)) & (s <= t)
    )
    mask = F.transform(idx, covered)
    kept = F.filter(
        F.zip_with(F.col("w"), mask, lambda x, m: F.when(~m, x)),
        lambda x: x.isNotNull(),
    )
    return (
        w.join(dup_starts, "doc_id", "left")
        .withColumn(
            "ds", F.coalesce(F.col("ds"), F.array().cast("array<int>"))
        )
        .select(
            "doc_id",
            n_tokens.cast("bigint").alias("n_tokens"),
            (n_tokens - F.size(kept)).cast("bigint").alias("n_removed"),
            F.concat_ws(" ", kept).alias("cleaned_text"),
        )
    )


def span_dedup_old(spark, sf_dir):
    from globallinks_spark.operators.corpus import SPAN_DEDUP_NGRAM

    return _span_dedup(
        load(spark, sf_dir, "documents"), False, SPAN_DEDUP_NGRAM
    )


def span_dedup_persist(spark, sf_dir):
    from globallinks_spark.operators.corpus import SPAN_DEDUP_NGRAM

    return _span_dedup(
        load(spark, sf_dir, "documents"), True, SPAN_DEDUP_NGRAM
    )


# ---------------------------------------------------------------------------
# shard_roundtrip: old sink (manifest re-scans + re-tokenizes the raw
# corpus) vs r13 sink (n_tokens computed once in the write pass,
# manifest from a column-pruned readback of the written files)


def _shard_roundtrip_with(spark, sf_dir, write_fn):
    import tempfile

    from pyspark.sql import functions as FF

    from globallinks_spark.functions import text as TX2
    from globallinks_spark.sources.corpus_sink import read_training_shards

    d = load(spark, sf_dir, "documents")
    split = (
        FF.when(FF.col("doc_id") % 10 < 8, "train")
        .when(FF.col("doc_id") % 10 == 8, "val")
        .otherwise("test")
    )
    path = tempfile.mkdtemp(prefix="ab_shard_")
    write_fn(d.withColumn("split", split), path)
    back = read_training_shards(spark, path, split="train")
    return back.groupBy("split", "shard").agg(
        FF.count(FF.lit(1)).alias("n_docs"),
        FF.sum(TX2.bpe_token_count(FF.col("text"))).cast("bigint")
        .alias("n_tokens"),
    )


def _old_write_training_shards(docs, path, n_shards=16):
    import os as _os

    from pyspark.sql import functions as FF

    from globallinks_spark.functions import text as TX2
    from globallinks_spark.sources.corpus_sink import shard_of

    staged = docs.withColumn("shard", shard_of(FF.col("doc_id"), n_shards))
    (
        staged.repartition(FF.col("split"), FF.col("shard"))
        .write.mode("overwrite").partitionBy("split", "shard").parquet(path)
    )
    manifest = staged.groupBy("split", "shard").agg(
        FF.count("*").cast("bigint").alias("n_docs"),
        FF.sum(TX2.bpe_token_count(FF.col("text"))).cast("bigint")
        .alias("n_tokens"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        _os.path.join(path, "_shard_manifest")
    )
    import json as _json

    with open(_os.path.join(path, "_shards_meta.json"), "w") as fh:
        _json.dump(
            {"n_shards": n_shards, "salt": "shard:", "split_col": "split"},
            fh,
        )


def shard_rt_old(spark, sf_dir):
    return _shard_roundtrip_with(spark, sf_dir, _old_write_training_shards)


def shard_rt_new(spark, sf_dir):
    from globallinks_spark.sources.corpus_sink import write_training_shards

    return _shard_roundtrip_with(
        spark, sf_dir, lambda d, p: write_training_shards(d, p, n_shards=16)
    )


# ---------------------------------------------------------------------------
# connected_components round shape: old (join + groupBy + LEFT join
# back to labels) vs union-agg (self-label rows ride the neighbor
# aggregation's exchange - one join per round instead of two)


def _cc_union_agg(pairs, a_col="doc_a", b_col="doc_b", max_iterations=20):
    from globallinks_spark.operators.dedup import _ckpt_rdd

    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    changed = -1
    prev_blocks = _ckpt_rdd(labels)
    for _ in range(max_iterations):
        contrib = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(sym["a"].alias("node"), "label",
                    F.lit(False).alias("own"))
        )
        self_rows = labels.select(
            "node", "label", F.lit(True).alias("own")
        )
        upd = (
            contrib.unionByName(self_rows)
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("own"), F.col("label"))).alias("__old"),
            )
            .select(
                "node", "label",
                (F.col("label") < F.col("__old")).alias("__chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = upd.filter(F.col("__chg")).count()
        if prev_blocks is not None:
            prev_blocks.unpersist(False)
        prev_blocks = _ckpt_rdd(upd)
        labels = upd.select("node", "label")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError("no converge")
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_groups_old(spark, sf_dir):
    from globallinks_spark.operators.dedup import dedup_groups

    return dedup_groups(load(spark, sf_dir, "documents"))


def dedup_groups_unionagg(spark, sf_dir):
    from globallinks_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(load(spark, sf_dir, "documents"))
    comp = _cc_union_agg(pairs)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("keeper_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# ann_random_projection bucket: 8 interpreted-HOF folds (zip_with +
# aggregate lambdas) per row vs unrolled literal multiply-adds in the
# same left-assoc order (bit-identical doubles, whole-stage codegen)


def _rp_bucket_unrolled(a, bits, dim, seed=0x5EED):
    from globallinks_spark.functions.vectors import projection_matrix

    M = projection_matrix(bits, dim, seed)
    out = F.lit(0.0)
    for j, row in enumerate(M):
        acc = F.lit(0.0)
        for i, x in enumerate(row):
            acc = acc + F.element_at(a, i + 1).cast("double") * F.lit(x)
        out = out + F.when(
            acc > 0, F.pow(F.lit(2.0), F.lit(float(j)))
        ).otherwise(F.lit(0.0))
    return out.cast("int")


def _ann_rp(spark, sf_dir, bucket_fn):
    from globallinks_spark.operators.similarity import cosine_topk
    from globallinks_spark.queries_ext import _query_vec

    emb = load(spark, sf_dir, "embeddings")
    qvec = _query_vec(emb, "ann_random_projection")
    dim = len(qvec)
    bucket = bucket_fn(F.col("embedding"), 8, dim)
    qb = (
        emb.filter(F.col("vec_id") == 0)
        .select(bucket.alias("b")).first()["b"]
    )
    cands = emb.withColumn("b", bucket).filter(F.col("b") == qb)
    return cosine_topk(cands, qvec, k=5)


def ann_rp_old(spark, sf_dir):
    from globallinks_spark.functions.vectors import random_projection_bucket

    return _ann_rp(spark, sf_dir, random_projection_bucket)


def ann_rp_unrolled(spark, sf_dir):
    return _ann_rp(spark, sf_dir, _rp_bucket_unrolled)


CASES: dict[str, dict[str, object]] = {
    "gap_fill": {"old_noshare": gap_fill_old, "new_persist": gap_fill_new},
    "gap_fill2": {
        "old_noshare": gap_fill_old,
        "new_leadexplode": gap_fill_leadexplode,
    },
    "range_join": {
        "r12_lexplode": range_join_lexplode,
        "r13_rexplode": range_join_rexplode,
    },
    "quantiles": {"old_percentile": quantiles_old, "new_window": quantiles_new},
    "tokcount": {"old_extractall": tokcount_old, "new_lengths": tokcount_new},
    "span_dedup": {"old_noshare": span_dedup_old, "new_persist": span_dedup_persist},
    "shard_rt": {"old_manifest_rescan": shard_rt_old, "new_pruned_manifest": shard_rt_new},
    "dedup_groups": {
        "old_two_joins": dedup_groups_old,
        "new_union_agg": dedup_groups_unionagg,
    },
    "ann_rp": {"old_hof": ann_rp_old, "new_unrolled": ann_rp_unrolled},
}


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    spark = get_spark(app_name="r13_ab_probe")

    def materialize(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for case in names:
        variants = CASES[case]
        # warmup every variant once at the smallest SF (codegen)
        for vname, fn in variants.items():
            try:
                materialize(fn(spark, warm_dir))
            except Exception as exc:
                print(f"# warmup {case}/{vname} failed: {exc}",
                      file=sys.stderr)
            spark.catalog.clearCache()
        samples: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(runs):
            for vname, fn in variants.items():  # interleave
                spark.sparkContext._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"ab:{case}:{vname}")
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                samples[vname].append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        out[case] = {
            v: {"sec": min(s), "runs": s} for v, s in samples.items()
        }
        print(f"# {case}: " + ", ".join(
            f"{v}={min(s)}s {s}" for v, s in samples.items()
        ), file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
