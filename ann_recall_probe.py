"""Measured recall behind the ANN escape hatch (round-6, VERDICT r5 #8).

The exact near-dup operators route unblocked corpora to the sign-LSH /
multi-probe / IVF variants (operators/similarity.py) — this probe pins
MEASURED recall@k for each variant at the 10× isomorphic probe scale
(the same derived dataset the scaling ladder uses, ~10× sf0.1
embeddings), so that routing claim has a number behind it, not just a
citation to the LSH literature.

Method: Q deterministic query vectors (hash-strided vec_ids — spread
across replicas, reproducible), exact brute-force cosine top-k as
ground truth (one batch knn_join pass), then each ANN variant's top-k
per query. recall@k = |variant ∩ exact| / k, averaged over queries;
per-variant wall time and the candidate fraction (share of the corpus
actually scored) are recorded alongside, since recall without its cost
is not a trade-off.

Index parameters match the registry queries' defaults (bits=8 sign-LSH,
16-cell IVF, 2 Lloyd iterations) — the point is to QA the shipped
configuration, not a tuned one. r8 adds: a cells∈{128,256} pure-IVF
sweep (pins the geometry ceiling for row pruning), the
scalar-quantized re-rank variants (sq_index/sq_rerank_topk — the
byte-pruning path; candidate_fraction becomes the EQUIVALENT
full-precision-scan fraction with its decomposition recorded), and a
dense 0.90-0.99 planted grid (step 0.01, ~584 pairs/level) behind the
0.9-1.0 routing band.

Usage: python ann_recall_probe.py [factor] [out_json] [k] [n_queries]
Writes ANN_RECALL.json (committed artifact; README/SCALING.md cite it).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from globallinks_spark.operators import similarity as S


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_json = sys.argv[2] if len(sys.argv) > 2 else "ANN_RECALL.json"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_q = int(sys.argv[4]) if len(sys.argv) > 4 else 20

    import scaling_probe
    from globallinks_spark.session import get_spark

    spark = get_spark(app_name="ann_recall_probe")
    big_dir = f"/tmp/sparklinks_sf{factor}x"
    if not os.path.exists(f"{big_dir}/_BUILT"):
        t0 = time.perf_counter()
        scaling_probe.build(spark, big_dir, factor)
        open(f"{big_dir}/_BUILT", "w").close()
        print(f"# built {big_dir} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    emb = spark.read.parquet(f"{big_dir}/embeddings.parquet")
    n_total = emb.count()

    # deterministic query sample: hash-strided vec_ids (covers replicas;
    # bounded collect of n_q rows — parameters, not data)
    queries = (
        emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(997)) == 0)
        .orderBy("vec_id")
        .limit(n_q)
        .select("vec_id", "embedding")
        .collect()
    )
    qrows = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
             for r in queries]
    print(f"# {len(qrows)} queries over {n_total} vectors", file=sys.stderr)

    # exact ground truth: ONE batch pass (broadcast queries, window top-k)
    qdf = spark.createDataFrame(
        [(i, v) for i, v in qrows], ["vec_id", "embedding"]
    )
    t0 = time.perf_counter()
    exact = {
        qid: set()
        for qid, _ in qrows
    }
    for r in S.knn_join(qdf, emb, k=k).collect():
        exact[int(r["query_id"])].add(int(r["vec_id"]))
    t_exact = time.perf_counter() - t0

    emb.persist()
    results: dict[str, dict] = {}

    def run_variant(
        name: str, topk_fn, cand_fraction: float, **cost_fields
    ) -> None:
        """``cand_fraction`` is the variant's EQUIVALENT full-precision
        scan fraction — rows_scored × bytes_per_row_ratio +
        rerank_rows_fraction. For the plain variants (full-width
        candidate scoring) it equals the row fraction; the SQ variants
        pass the decomposition in ``cost_fields``."""
        t0 = time.perf_counter()
        recalls = []
        for qid, qv in qrows:
            got = {int(r["vec_id"]) for r in topk_fn(qv).collect()}
            recalls.append(len(got & exact[qid]) / float(k))
        mean_recall = sum(recalls) / len(recalls)
        results[name] = {
            "recall_at_k": round(mean_recall, 4),
            "min_recall": round(min(recalls), 4),
            "queries_below_half": sum(1 for r in recalls if r < 0.5),
            "total_sec": round(time.perf_counter() - t0, 2),
            "candidate_fraction": round(cand_fraction, 5),
            # recall ÷ candidate fraction: how much better than a
            # random same-size candidate set. On near-uniform synthetic
            # vectors absolute recall is bounded by data geometry (the
            # true top-k sits at low cosine, spread across buckets), so
            # the lift is the methodological signal.
            "lift_over_random": round(mean_recall / cand_fraction, 1),
            **cost_fields,
        }
        print(f"# {name}: mean {results[name]['recall_at_k']} "
              f"min {results[name]['min_recall']} "
              f"({results[name]['total_sec']}s)", file=sys.stderr)

    # sign-LSH family: bucket the corpus ONCE (the registry queries'
    # bits=8), cache, then per-query isin probes — the production shape
    bits = 8
    bucketed = S.with_sign_bucket(emb, bits=bits).persist()
    bucketed.count()
    for n_probe in (1, 4, 8):
        frac = min(1.0, n_probe / float(1 << bits))

        def lsh_topk(qv, n_probe=n_probe):
            bl = S.probe_buckets(qv, bits, n_probe)
            return S.cosine_topk(
                bucketed.filter(F.col("bucket").isin(bl)), qv, k
            )

        run_variant(
            f"sign_lsh_bits{bits}_probe{n_probe}", lsh_topk, frac
        )
    bucketed.unpersist()

    # random-projection sign-LSH (the production variant: seeded
    # hyperplanes instead of the oracle-friendly coordinate axes).
    # Multi-probe margins are the PROJECTED values h_j·q — probe_buckets
    # consumes them exactly as it consumes raw coordinates for the
    # axis variant (flip the smallest |margin| first).
    from globallinks_spark.functions import vectors as V

    dim = len(qrows[0][1])
    M = V.projection_matrix(bits, dim)
    rp = emb.withColumn(
        "bucket", V.random_projection_bucket(F.col("embedding"), bits, dim)
    ).persist()
    rp.count()
    for n_probe in (1, 4, 8):
        frac = min(1.0, n_probe / float(1 << bits))

        def rp_topk(qv, n_probe=n_probe):
            margins = [
                sum(h * x for h, x in zip(row, qv)) for row in M
            ]
            bl = S.probe_buckets(margins, bits, n_probe)
            return S.cosine_topk(
                rp.filter(F.col("bucket").isin(bl)), qv, k
            )

        run_variant(f"rp_lsh_bits{bits}_probe{n_probe}", rp_topk, frac)
    rp.unpersist()

    # IVF sweep (r6 verdict #7): serving recall@10 was the weak row at
    # the shipped default (cells16/probe2 = 0.48), so measure the
    # recall/cost frontier across cells × probe — build each index
    # ONCE, cache the assignment, per-query probe the nearest n_probe
    # cells (exactly ivf_topk's plan minus the per-call rebuild).
    # candidate_fraction ≈ n_probe/n_cells is the latency lever; the
    # grid shows what fraction buys what recall on this geometry.
    centroids = None  # the cells=16 centroids feed the planted-pair QA
    assigned16 = None  # …and the IVF+SQ composed variant below
    # probe 10/12 on cells16 chart where the ≥0.9 crossing sits on this
    # geometry (near-uniform synthetic vectors push the true top-k
    # across many cells, so high serving recall costs a large fraction
    # HERE — the planted-pair dedup regime below is the cheap one).
    # cells 128/256 rungs (r7 verdict #1, the literal sweep): on this
    # geometry the true top-k spreads across cells, so recall at fixed
    # ROW fraction plateaus no matter the cell count — recorded to pin
    # the ceiling; the byte-cost lever (SQ variants below) is what
    # actually reaches high recall sublinearly.
    for n_cells, probes in (
        (16, (2, 4, 8, 10, 12)),
        (64, (2, 4, 8, 16)),
        (128, (8, 16, 24)),
        (256, (16, 32, 48)),
    ):
        t0 = time.perf_counter()
        cents, assigned = S.build_ivf_index(emb, n_cells=n_cells)
        assigned = assigned.persist()
        assigned.count()
        t_build = time.perf_counter() - t0

        for ivf_probe in probes:
            def ivf_topk_cached(qv, cents=cents, assigned=assigned,
                                ivf_probe=ivf_probe):
                def d2(c):
                    return sum((a - b) * (a - b) for a, b in zip(qv, c))
                probe = sorted(
                    range(len(cents)), key=lambda ci: d2(cents[ci])
                )
                return S.cosine_topk(
                    assigned.filter(
                        F.col("cell").isin(*probe[:ivf_probe])
                    ), qv, k,
                )

            name = f"ivf_cells{n_cells}_probe{ivf_probe}"
            run_variant(name, ivf_topk_cached, ivf_probe / float(n_cells))
            results[name]["index_build_sec"] = round(t_build, 2)
        if n_cells == 16:
            centroids, assigned16 = cents, assigned  # unpersisted below
        else:
            assigned.unpersist()

    # ------------------------------------------------------------------
    # Scalar-quantized codes + exact re-rank (r7 verdict #1): the scan
    # cost lever that works on this geometry is BYTES PER ROW, not row
    # count. The bytes ratio is the MEASURED parquet scan figure
    # (similarity.SQ_MEASURED_BYTES_RATIO from sq_bytes_probe.py —
    # id/scale/norm columns and page overhead included; the arithmetic
    # code-bytes-only ratios 0.125/0.25 under-count by 1.3-1.5×, r8
    # verdict #2); the pool re-rank touches pool/N rows at full width.
    # candidate_fraction below is the EQUIVALENT full-precision-scan
    # fraction:
    #   rows_scored_fraction × bytes_per_row_ratio + rerank_rows/N
    POOL = 50
    for nbits in (8, 4):
        bytes_ratio = S.SQ_MEASURED_BYTES_RATIO[nbits]
        idx = S.sq_index(emb, nbits=nbits).persist()
        idx.count()

        def sq_topk(qv, idx=idx, nbits=nbits):
            return S.sq_rerank_topk(
                emb, qv, k, pool=POOL, nbits=nbits, index=idx
            )

        run_variant(
            f"sq{nbits}_rerank_pool{POOL}", sq_topk,
            1.0 * bytes_ratio + POOL / float(n_total),
            rows_scored_fraction=1.0,
            bytes_per_row_ratio=round(bytes_ratio, 5),
            rerank_rows_fraction=round(POOL / float(n_total), 5),
        )
        idx.unpersist()

    # composed: IVF cell pruning (rows) × SQ codes (bytes) × re-rank —
    # both levers at once; recall ceiling is the probed cells' row set
    # (= ivf_cells16_probe10), the SQ stage loses ~nothing (see the
    # full-scan sq4 row)
    idx4c = S.sq_index(assigned16, nbits=4, keep_cols=("cell",)).persist()
    idx4c.count()
    IVF_SQ_PROBE = 10
    b4 = S.SQ_MEASURED_BYTES_RATIO[4]

    def ivf_sq_topk(qv, cents=centroids, idx=idx4c):
        def d2(c):
            return sum((a - b) * (a - b) for a, b in zip(qv, c))
        probe = sorted(range(len(cents)), key=lambda ci: d2(cents[ci]))
        sel = idx.filter(F.col("cell").isin(*probe[:IVF_SQ_PROBE]))
        return S.sq_rerank_topk(emb, qv, k, pool=POOL, nbits=4, index=sel)

    rows_frac = IVF_SQ_PROBE / 16.0
    run_variant(
        f"ivf_cells16_probe{IVF_SQ_PROBE}_sq4_rerank{POOL}", ivf_sq_topk,
        rows_frac * b4 + POOL / float(n_total),
        rows_scored_fraction=round(rows_frac, 5),
        bytes_per_row_ratio=round(b4, 5),
        rerank_rows_fraction=round(POOL / float(n_total), 5),
    )
    idx4c.unpersist()
    assigned16.unpersist()
    emb.unpersist()

    # ------------------------------------------------------------------
    # Pair-collision recall in the NEAR-DUP regime — the question the
    # escape hatch actually answers ("unblocked corpora route to
    # LSH/IVF"): of the true near-duplicate pairs (exact label-blocked
    # all-pairs, cosine >= 0.35), what fraction lands in the same
    # sign-LSH bucket (single table) or within the multi-probe set,
    # stratified by cosine band? Collision probability rises with
    # cosine ((1 - theta/pi)^bits), so this is measured, not assumed.
    pairs = (
        S.near_dup_pairs_vectorized(emb, threshold=0.35)
        .join(emb.select(F.col("vec_id").alias("vec_a"),
                         F.col("embedding").alias("emb_a")), "vec_a")
        .join(emb.select(F.col("vec_id").alias("vec_b"),
                         F.col("embedding").alias("emb_b")), "vec_b")
        .collect()
    )  # bounded: the exact near-dup pair set (hundreds at 10x)

    def _margins_axis(v):
        return [float(x) for x in v[:8]]

    def _margins_rp(v):
        return [sum(h * float(x) for h, x in zip(row, v)) for row in M]

    def _bucket(margins):
        b = 0
        for i, x in enumerate(margins):
            if x > 0:
                b |= 1 << i
        return b

    bands = [(0.35, 0.5), (0.5, 0.7), (0.7, 0.9), (0.9, 1.01)]
    collision: dict[str, dict] = {}
    for tag, marg in (("axis", _margins_axis), ("rp", _margins_rp)):
        for n_probe in (1, 4, 8):
            per_band = {}
            for lo, hi in bands:
                sel = [p for p in pairs if lo <= p["cosine"] < hi]
                if not sel:
                    per_band[f"{lo}-{hi if hi <= 1 else 1.0}"] = None
                    continue
                hit = 0
                for p in sel:
                    ma, mb = marg(p["emb_a"]), marg(p["emb_b"])
                    probes_a = set(S.probe_buckets(ma, bits, n_probe))
                    if _bucket(mb) in probes_a:
                        hit += 1
                per_band[f"{lo}-{hi if hi <= 1 else 1.0}"] = round(
                    hit / len(sel), 3
                )
            collision[f"{tag}_probe{n_probe}"] = per_band
    print(f"# pair-collision: {json.dumps(collision)}", file=sys.stderr)

    # ------------------------------------------------------------------
    # Planted pairs at EXACT cosines in the dedup regime (0.90/0.95/
    # 0.99) — the natural pair set has no 0.9+ members, which is
    # precisely the band the embedding-dedup escape hatch operates in.
    # For each corpus base vector u (unit-normalized), plant
    # v = c·u + sqrt(1-c²)·w with w ⟂ u a seeded unit normal:
    # cos(u, v) = c exactly. Collision is then measured for the two
    # LSH bucket variants (single-table and multi-probe) and for IVF
    # cell co-membership against the index built above — all
    # driver-side numpy over the collected bases (bounded, 200 rows).
    import numpy as np

    rng = np.random.default_rng(0x5EED)
    # r7 verdict #5: the routing band minima rested on three planted
    # levels × ~108 pairs; densify to a 0.90-0.99 grid (step 0.01,
    # ≥500 pairs per level) so the 0.9-1.0 band figure is a minimum
    # over ten levels with ~5× the pairs each
    base_rows = (
        emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(37)) == 0)
        .orderBy("vec_id").limit(600).select("embedding").collect()
    )
    bases = np.stack([
        np.asarray(r["embedding"], dtype="float64") for r in base_rows
    ])
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    C = np.asarray(centroids, dtype="float64")

    def _cell(v):
        return int(((C - v) ** 2).sum(axis=1).argmin())

    def _cells_topn(v, n):
        return set(((C - v) ** 2).sum(axis=1).argsort()[:n].tolist())

    # r8 verdict #5: measure OR-construction (multi-table) sign-LSH —
    # n_tables INDEPENDENT seeded hyperplane tables (seed 0x5EED + t;
    # table 0 IS the single-table seed), pair found if it collides in
    # ANY table's probe set. Per-table misses multiply, so recall
    # 1-(1-r)^t climbs where single-table probing plateaus; cost is
    # n_tables*n_probe/2^bits. Asymmetric probing (u probed, v single
    # bucket) — conservative vs near_dup_pairs_multitable's symmetric
    # index-time fan-out.
    UNION_CONFIGS = [(2, 4), (3, 4), (4, 4), (2, 8), (3, 8)]
    MATS = [np.asarray(V.projection_matrix(bits, len(bases[0]), 0x5EED + t),
                       dtype="float64")
            for t in range(max(t for t, _ in UNION_CONFIGS))]

    planted: dict[str, dict] = {}
    for target in [round(0.90 + 0.01 * i, 2) for i in range(10)]:
        s = float(np.sqrt(1.0 - target * target))
        stats = {
            "axis_probe1": 0, "axis_probe4": 0, "axis_probe8": 0,
            "rp_probe1": 0, "rp_probe4": 0, "rp_probe8": 0,
            "ivf_same_cell": 0, "ivf_probe2": 0,
            "ivf_probe3": 0, "ivf_probe4": 0,
        }
        for t, p in UNION_CONFIGS:
            stats[f"rp_union_t{t}_probe{p}"] = 0
        for u in bases:
            r = rng.standard_normal(len(u))
            w = r - (r @ u) * u
            w /= np.linalg.norm(w)
            v = target * u + s * w
            for tag, marg in (("axis", _margins_axis), ("rp", _margins_rp)):
                mu, mv = marg(u.tolist()), marg(v.tolist())
                bv = _bucket(mv)
                for n_probe in (1, 4, 8):
                    if bv in set(S.probe_buckets(mu, bits, n_probe)):
                        stats[f"{tag}_probe{n_probe}"] += 1
            # per-table margins once, reused across union configs
            tm = [(Mt @ u, Mt @ v) for Mt in MATS]
            for t, p in UNION_CONFIGS:
                if any(
                    _bucket(mv_t.tolist()) in set(
                        S.probe_buckets(mu_t.tolist(), bits, p))
                    for mu_t, mv_t in tm[:t]
                ):
                    stats[f"rp_union_t{t}_probe{p}"] += 1
            cu, cv = _cell(u), _cell(v)
            if cu == cv:
                stats["ivf_same_cell"] += 1
            for np_ivf in (2, 3, 4):
                if cv in _cells_topn(u, np_ivf):
                    stats[f"ivf_probe{np_ivf}"] += 1
        planted[f"cos_{target}"] = {
            k: round(n / len(bases), 3) for k, n in stats.items()
        }
    print(f"# planted: {json.dumps(planted)}", file=sys.stderr)

    out = {
        "metric": "ann_recall_at_k",
        "near_dup_pair_collision_recall_by_cosine_band": {
            "n_pairs": len(pairs),
            "bands": collision,
            "planted_pairs_exact_cosine": {
                "n_pairs_per_level": len(bases),
                "levels": planted,
                "note": (
                    "v = c*u + sqrt(1-c^2)*w, w orthonormal seeded — "
                    "cos(u,v) = c exactly; fills the 0.9+ band the "
                    "natural pair set lacks. r8: dense 0.90-0.99 grid "
                    "(step 0.01, ~540 pairs/level; was 3 levels x 108)."
                    " Theory single-table sign-LSH: "
                    "(1 - acos(c)/pi)^bits = 0.29 / 0.45 / 0.77 at "
                    "c = 0.90 / 0.95 / 0.99 with bits=8."
                ),
            },
        },
        "k": k,
        "n_queries": len(qrows),
        "n_vectors": n_total,
        "factor": factor,
        "dataset": big_dir,
        "exact_ground_truth_sec": round(t_exact, 2),
        "variants": results,
        "note": (
            "recall vs exact brute-force cosine top-k on the 10x "
            "isomorphic probe dataset; candidate_fraction = the "
            "variant's EQUIVALENT full-precision-scan fraction: for "
            "full-width scoring it is the row fraction; for the SQ "
            "variants it is rows_scored_fraction x bytes_per_row_ratio"
            " + rerank_rows_fraction, with bytes_per_row_ratio the "
            "MEASURED parquet scan ratio (SQ_MEASURED_BYTES_RATIO from "
            "sq_bytes_probe.py; the arithmetic ceil(dim*nbits/8) vs "
            "4*dim figure under-counts id/scale/norm + page overhead) "
            "— the scan cost lever at 100 TB is bytes, and the "
            "decomposition is recorded per variant); "
            "lift_over_random = recall / candidate_fraction. The "
            "synthetic embeddings are near-uniform outside their label "
            "blocks, so absolute recall is geometry-bounded — the lift "
            "shows each method concentrating true neighbors far above "
            "a random candidate set. The near-dup regime the escape "
            "hatch actually serves is measured separately in "
            "near_dup_pair_collision_recall_by_cosine_band: collision "
            "probability rises with cosine ((1-theta/pi)^bits), so read "
            "the 0.9+ band for the dedup use case and size tables/"
            "probes from it. Shipped defaults: bits=8 sign-LSH, "
            "16-cell/2-iter IVF."
        ),
    }
    # carry over sections owned by OTHER probes (sq_bytes_probe.py's
    # measured_bytes) — this probe owns recall, not scan-byte metrics
    try:
        with open(out_json, encoding="utf-8") as fh:
            prev = json.load(fh)
        if "measured_bytes" in prev:
            out["measured_bytes"] = prev["measured_bytes"]
    except (OSError, json.JSONDecodeError):
        pass
    with open(out_json, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({n: v["recall_at_k"] for n, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
