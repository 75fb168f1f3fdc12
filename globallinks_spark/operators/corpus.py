"""Corpus-level curation operators for LLM training-data pipelines:
benchmark-contamination detection, duplicated-span profiling,
temperature-based mixture resampling, linear quality classification and
a bigram-LM fluency score.

These extend the reference's link-curation pipeline (extract → dedup →
compact, see SURVEY.md §2) to the document-curation operations a
100 TB text pipeline needs. None exist in the reference repo — they are
brief-extension operators; the designs follow the published recipes:

- contamination: n-gram overlap against an eval/benchmark set, as in
  GPT-3 appx. C / Lee et al. 2022 ("Deduplicating Training Data ...").
- duplicated spans: exact repeated n-gram fraction per document
  (Lee et al. 2022's EXACTSUBSTR, re-expressed as gram-frequency
  algebra instead of a suffix array — the Spark-native equivalent).
- mixture resampling: temperature-scaled language rebalancing, the
  multilingual-mix recipe from XLM-R (Conneau et al. 2020, α-sampling).
- quality classifier: linear model over surface features — the
  fastText-classifier shape used by CCNet/GPT-3 quality filtering,
  with fixed illustrative weights (no learned artifact in-repo).
- bigram LM: add-one-smoothed conditional bigram negative log
  likelihood, the CCNet perplexity-bucketing proxy.

Scale notes (100 TB): every operator is linear gram/doc algebra with
keyed shuffles only — no all-pairs stage anywhere. The contamination
join broadcasts the BENCHMARK side (eval suites are MBs against a
multi-TB train corpus); duplicated-span counting is one hash
aggregation on the gram key; resampling rates derive from a tiny
per-language count table that rides a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from globallinks_spark.functions import hashing as H
from globallinks_spark.functions import text as TX
from globallinks_spark.operators.dedup import _spread

# ---------------------------------------------------------------------------
# Contamination check

CONTAM_NGRAM = 5
CONTAM_MIN_OVERLAP = 3


def contamination_pairs(
    docs: DataFrame,
    bench_docs: DataFrame,
    *,
    n: int = CONTAM_NGRAM,
    min_overlap: int = CONTAM_MIN_OVERLAP,
) -> DataFrame:
    """(train_id, bench_id, n_overlap, overlap_frac) for every train
    document sharing ≥ ``min_overlap`` distinct word ``n``-grams with a
    benchmark document.

    ``docs``/``bench_docs`` need (doc_id, text). The benchmark side is
    broadcast: eval suites are tiny relative to a training corpus, so
    the contaminated-pair search is a map-side gram join + one shuffle
    on the (train, bench) pair key — no corpus-vs-corpus shuffle.
    ``overlap_frac`` is n_overlap over the TRAIN doc's distinct gram
    count (the GPT-3 appx-C direction: how much of the candidate
    training doc is benchmark material).
    """
    def grams(d: DataFrame, out: str) -> DataFrame:
        # words staged through a named column: inlining words(text) into
        # the n element_at calls of every gram re-tokenizes the doc per
        # element (CollapseProject keeps the stage because w has many
        # non-cheap references — the with_shingle_hashes shape;
        # measured 100× on the sf0.1 bench for the inlined form)
        # _spread: a small local parquet arrives single-partition and
        # would serialize the gram scan onto one task (no-op at scale)
        return _spread(d).select(
            F.col("doc_id").alias(out),
            TX.words(F.col("text")).alias("w"),
        ).select(
            out,
            F.explode(TX.shingles(F.col("w"), n)).alias("gram"),
        )

    train = grams(docs, "train_id")
    bench = grams(bench_docs, "bench_id")
    # persist + count barrier: overlap's OUTPUT is pair-sized (tiny)
    # but its lineage is the full corpus scan; both consumers below
    # (hot, the final join) must read the cache, not re-scan
    overlap = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("train_id", "bench_id")
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .persist()
    )
    overlap.count()
    # the denominator (per-doc distinct gram count) is only needed for
    # docs that actually overlap — a tiny set. Semi-joining the corpus
    # down BEFORE re-deriving grams turns the second full corpus scan
    # (round-2 shape) into a scan of the contaminated docs only; at
    # 100 TB that is the difference between 2 corpus passes and 1.
    # shingles() is distinct-per-doc, so plain count == distinct count.
    hot = overlap.select(F.col("train_id").alias("doc_id")).distinct()
    sizes = (
        grams(docs.join(F.broadcast(hot), "doc_id", "leftsemi"), "train_id")
        .groupBy("train_id")
        .agg(F.count("*").alias("n_grams"))
    )
    return (
        overlap.join(sizes, "train_id")
        .select(
            "train_id",
            "bench_id",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_grams"), 6).alias(
                "overlap_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Duplicated-span profile

DUPSPAN_NGRAM = 8
DUPSPAN_FLAG_FRAC = 0.2


def dup_span_profile(
    docs: DataFrame, *, n: int = DUPSPAN_NGRAM, flag_frac: float = DUPSPAN_FLAG_FRAC
) -> DataFrame:
    """Per-document duplicated-text profile: (doc_id, n_grams, n_dup,
    dup_frac, flagged) where ``n_dup`` counts gram POSITIONS whose word
    ``n``-gram occurs more than once corpus-wide (within-doc repeats
    included — a doc repeating itself is duplicated text too).

    Suffix-array EXACTSUBSTR (Lee et al. 2022) re-expressed for Spark:
    a position sits inside a duplicated span of length ≥ n iff its
    n-gram is globally non-unique, so per-position gram frequency gives
    the same flagged-fraction signal with ONE hash shuffle on the gram
    key (count window) + one on doc_id — no suffix array, no sort of
    the whole corpus. Docs shorter than ``n`` words have no grams and
    are excluded (nothing to measure).
    """
    # words staged through a named column + _spread parallelism
    # (see contamination_pairs.grams)
    g = _spread(docs).select(
        "doc_id", TX.words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.explode(TX.shingles_seq(F.col("w"), n)).alias("gram"),
    )
    freq = F.count("*").over(Window.partitionBy("gram"))
    per_doc = (
        g.withColumn("c", freq)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup"),
        )
    )
    dup_frac = F.round(F.col("n_dup") / F.col("n_grams"), 6)
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_dup",
        dup_frac.alias("dup_frac"),
        (dup_frac >= flag_frac).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Temperature mixture resampling

RESAMPLE_SALT = "resample:"


def mix_resample(docs: DataFrame, *, by: str = "lang") -> DataFrame:
    """α=0.5 temperature rebalancing of the ``by`` mixture (XLM-R's
    p_l^α sampling): per group, keep-rate ∝ 1/√p_l, normalised so the
    rarest group keeps everything. Returns (lang, n_docs, rate_bp,
    n_kept): the integer basis-point rate and how many docs the
    deterministic keyed-hash keep decision retains.

    The per-group count table is tiny (|languages|), so the rate rides
    a broadcast join; the keep decision is the same keyed-hash
    membership as dataset_split — stable under corpus growth, no RNG.
    rate_bp = floor(10000·√(n_min/n_l)) keeps the rate integral so the
    hash comparison is exact across engines.
    """
    counts = docs.groupBy(by).agg(F.count("*").alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        by,
        "n_docs",
        F.floor(
            F.lit(10000.0) * F.sqrt(F.col("n_min") / F.col("n_docs"))
        ).alias("rate_bp"),
    )
    key = H.h60(
        F.concat(F.lit(RESAMPLE_SALT), F.col("doc_id").cast("string"))
    ) % 10000
    kept = (
        docs.join(F.broadcast(rates), by)
        .filter(key < F.col("rate_bp"))
        .groupBy(by)
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, by, "left")
        .select(
            by,
            "n_docs",
            "rate_bp",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def mix_resample_sql(by: str = "lang") -> str:
    """DuckDB oracle for :func:`mix_resample` (same arithmetic)."""
    key = H.h60_sql("'" + RESAMPLE_SALT + "' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH counts AS (
  SELECT {by}, count(*) AS n_docs FROM documents GROUP BY 1
), rates AS (
  SELECT {by}, n_docs,
    CAST(floor(10000.0 * sqrt(CAST((SELECT min(n_docs) FROM counts) AS DOUBLE)
                              / n_docs)) AS BIGINT) AS rate_bp
  FROM counts
), kept AS (
  SELECT d.{by}, count(*) AS n_kept
  FROM documents d JOIN rates r USING ({by})
  WHERE ({key} % 10000) < r.rate_bp
  GROUP BY 1
)
SELECT r.{by}, r.n_docs, r.rate_bp,
       coalesce(k.n_kept, 0) AS n_kept
FROM rates r LEFT JOIN kept k USING ({by})
"""


# ---------------------------------------------------------------------------
# Linear quality classifier

# Illustrative fixed weights over surface features (the CCNet/fastText
# quality-filter SHAPE; a production deployment loads learned weights
# into the same expression). Features are z-score-free raw surfaces so
# the expression stays engine-portable.
QC_WEIGHTS = {
    "log_n_words": 0.9,     # longer docs score higher
    "mean_word_len": 0.4,   # longer words ≈ denser prose
    "stopword_ratio": 2.5,  # function words ≈ natural language
    "unique_ratio": 1.2,    # vocabulary diversity
}
QC_BIAS = -4.0
QC_THRESHOLD = 0.5


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, log_n_words, mean_word_len, stopword_ratio,
    unique_ratio) — the classifier's surface features, all column
    algebra (no UDF)."""
    w = TX.words(F.col("text"))
    return docs.select(
        "doc_id",
        F.log(F.size(w) + F.lit(1.0)).alias("log_n_words"),
        TX.mean_word_len(w).alias("mean_word_len"),
        TX.stopword_ratio(w).alias("stopword_ratio"),
        (F.size(F.array_distinct(w)) / F.greatest(F.size(w), F.lit(1))).alias(
            "unique_ratio"
        ),
    )


def quality_classify(docs: DataFrame) -> DataFrame:
    """(doc_id, quality_score, keep) — σ(w·x + b) over
    :func:`quality_features`, rounded to 6 places for engine parity.

    One narrow projection, no shuffle: at 100 TB this is a map-only
    pass that fuses into whatever scan precedes it.
    """
    f = quality_features(docs)
    z = sum(
        (F.col(name) * F.lit(wt) for name, wt in QC_WEIGHTS.items()),
        F.lit(QC_BIAS),
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return f.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= QC_THRESHOLD).alias("keep"),
    )


def quality_classify_sql() -> str:
    """DuckDB oracle: the identical expression (both engines use IEEE
    doubles and libm exp; the 6-place round absorbs last-ulp drift)."""
    ws = TX.words_sql("text")
    feats = {
        "log_n_words": f"ln(len({ws}) + 1.0)",
        "mean_word_len": TX.mean_word_len_sql(ws),
        "stopword_ratio": TX.stopword_ratio_sql(ws),
        "unique_ratio": f"(len(list_distinct({ws})) * 1.0 / greatest(len({ws}), 1))",
    }
    z = " + ".join(f"({feats[k]}) * {wt}" for k, wt in QC_WEIGHTS.items())
    score = f"round(1.0 / (1.0 + exp(-(({z}) + {QC_BIAS}))), 6)"
    return f"""
SELECT doc_id, {score} AS quality_score,
       {score} >= {QC_THRESHOLD} AS keep
FROM documents
"""


# ---------------------------------------------------------------------------
# Bigram language-model fluency score

LM_NGRAM = 2


def bigram_lm_score(docs: DataFrame) -> DataFrame:
    """(doc_id, avg_nll, ppl_bucket) — add-one-smoothed conditional
    bigram NLL of each doc under the corpus's own bigram model, the
    CCNet perplexity-bucketing proxy without an external LM artifact:

        nll(d) = mean over positions i of
                 -ln( (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V) )

    ``ppl_bucket`` is the CCNet head/middle/tail third by ntile over
    the ROUNDED score (doc_id tie-break → deterministic). The exact
    global ntile is a single-task sort — fine for the per-doc SCORE
    table (3 narrow columns, ~10⁻⁴ the corpus bytes), and at 100 TB the
    drop-in replacement is two `percentile_approx` cutoffs over the
    same column, which keeps the plan fully parallel.

    Plan (round 5 shape): the positional gram stream is materialized
    ONCE, immediately reduced to per-(doc, bigram) counts — a
    partial-agg-friendly shuffle on (doc_id, bigram) — and every later
    stage works on count tables. Corpus bigram counts derive from the
    per-doc counts (second small aggregation, not a second pass over
    the stream); the smoothed per-bigram NLL is computed on the
    DISTINCT-bigram table (join with unigram counts there, where rows
    are fewest), and joins back to the per-doc counts in one keyed
    join. The round-4 shape joined the full positional stream twice
    (on bigram, then on w1) and scanned the explode twice; this shape
    shuffles the wide stream once and joins it once —
    avg = Σ k·nll / Σ k over per-doc counts is algebraically the
    positional mean. No broadcast hint on the unigram side (a 100 TB
    corpus's vocabulary is not guaranteed map-side-small; AQE
    broadcasts it when it is); nothing is collected and nothing is
    quadratic. Docs with < 2 words have no bigrams and are excluded.
    """
    # words staged through a named column + _spread parallelism
    # (see contamination_pairs.grams)
    words = _spread(docs).select("doc_id", TX.words(F.col("text")).alias("w"))
    # r12 one-pass shape: zip the word array with its own 1-shifted
    # slice (zip_with null-pads the shorter side) so each position i
    # emits (w_i, w_{i+1}-or-null) — the null-w2 row at the last
    # position is exactly the unigram occurrence the bigram stream
    # misses. ONE explode + ONE partial-aggregating shuffle on
    # (doc_id, w1, w2) then yields EVERY downstream table: per-doc
    # bigram counts (w2 non-null rows), corpus bigram counts (sum over
    # docs), and full corpus unigram counts (sum of k over ALL rows
    # groups by w1 — every position contributes its w1 once). The
    # pre-r12 form tokenized and exploded the corpus three times (the
    # unpersisted per_doc lineage ran once for the score join and once
    # for the corpus bigram counts, plus the separate unigram pass);
    # guide §1.2/§2.3. Counts are exact integers either way — results
    # identical. The (w1, w2) pair replaces the space-joined bigram
    # string as the join key (words are whitespace-split, so the
    # mapping is bijective); persist is the count-table
    # materialization, distinct-gram-sized, far below the stream.
    shift1 = F.slice(
        F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))
    )
    pdc = (
        words.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.col("w"), shift1,
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p"),
        )
        .groupBy(
            "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    pdc.count()  # materialization barrier — see exact_jaccard
    per_doc = pdc.filter(F.col("w2").isNotNull())

    uni = pdc.groupBy("w1").agg(F.sum("k").alias("c1"))
    vocab = uni.agg(F.count("*").alias("v"))
    bic = per_doc.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))

    bigram_nll = (
        bic.join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1", "w2",
            (-F.log(
                (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
            )).alias("nll"),
        )
    )
    scored = (
        per_doc.join(bigram_nll, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("k") * F.col("nll")) / F.sum("k"), 6
            ).alias("avg_nll")
        )
    )
    bucket = F.ntile(3).over(Window.orderBy("avg_nll", "doc_id"))
    names = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    return scored.select(
        "doc_id",
        "avg_nll",
        F.element_at(names, bucket).alias("ppl_bucket"),
    )


def bigram_lm_score_sql() -> str:
    """DuckDB oracle for :func:`bigram_lm_score`."""
    ws = TX.words_sql("text")
    bigrams = TX.shingles_seq_sql("w", 2)
    return f"""
WITH w AS (
  SELECT doc_id, {ws} AS w FROM documents
), bi AS (
  SELECT doc_id, unnest({bigrams}) AS bigram FROM w
), per_doc AS (
  SELECT doc_id, bigram, count(*) AS k FROM bi GROUP BY 1, 2
), toks AS (
  SELECT unnest(w) AS w1 FROM w
), uni AS (
  SELECT w1, count(*) AS c1 FROM toks GROUP BY 1
), bic AS (
  SELECT bigram, sum(k) AS c2 FROM per_doc GROUP BY 1
), bigram_nll AS (
  SELECT bigram,
    -ln((c2 + 1.0) / (c1 + (SELECT count(*) FROM uni))) AS nll
  FROM (SELECT bigram, c2, string_split(bigram, ' ')[1] AS w1 FROM bic)
  JOIN uni USING (w1)
), scored AS (
  SELECT doc_id, round(sum(k * nll) / sum(k), 6) AS avg_nll
  FROM per_doc JOIN bigram_nll USING (bigram)
  GROUP BY 1
)
SELECT doc_id, avg_nll,
  (['head','middle','tail'])[ntile(3) OVER (ORDER BY avg_nll, doc_id)]
    AS ppl_bucket
FROM scored
"""


# ---------------------------------------------------------------------------
# Cross-document duplicate-span REMOVAL (the rewrite companion to
# dup_span_profile's read-only signal)

SPAN_DEDUP_NGRAM = 8


def span_dedup_rewrite(
    docs: DataFrame, *, n: int = SPAN_DEDUP_NGRAM
) -> DataFrame:
    """Remove every duplicated ``n``-gram span except its first corpus
    occurrence — Lee et al. 2022's EXACTSUBSTR *removal* step (their
    §4.1 deletes one copy of each duplicated substring), re-expressed
    as gram algebra instead of a corpus suffix array.

    Returns (doc_id, n_tokens, n_removed, cleaned_text): every token
    covered by a non-first occurrence of a duplicated word n-gram is
    deleted, and ``cleaned_text`` re-joins the survivors. The rewrite
    operates on the normalized token stream (functions/text.words:
    lowercased, whitespace-split), so ``cleaned_text`` is lowercase —
    the form every downstream gram/dedup operator consumes. The FIRST
    occurrence (ordered by doc_id, then position) keeps its text, so
    every duplicated span survives exactly once corpus-wide —
    deterministic under any partitioning.

    Scale shape: one shuffle keyed by gram (the row_number window that
    finds first occurrences — grams are near-unique so groups are tiny
    and skew-free), one groupBy doc_id to collect each doc's duplicate
    span starts, one join back to the token arrays. The per-doc mask is
    array algebra: token ``t`` is removed iff a duplicate span starts
    in ``[t-n+1, t]``. The ``exists`` probe is O(dup_starts) per token
    — worst case O(tokens²) for a FULLY duplicated document, bounded by
    per-document size (KBs), never by corpus size; documents
    parallelize embarrassingly.
    """
    w = docs.select("doc_id", TX.words(F.col("text")).alias("w"))
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
    # [0 … n_tokens-1], EMPTY for empty docs — sequence(0, -1) would be
    # the DESCENDING [0, -1] (see text._gram_indexes), so clamp + filter
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


def span_dedup_rewrite_sql(
    n: int = SPAN_DEDUP_NGRAM, table: str = "documents"
) -> str:
    """DuckDB oracle for :func:`span_dedup_rewrite` — same first-
    occurrence rule via a window over unnested (gram, doc_id, pos).
    ``table`` lets composed oracles run the chain over a CTE."""
    ws = TX.words_sql("text")
    grams = TX.shingles_seq_sql("w", n)
    return f"""
WITH w AS (
  SELECT doc_id, {ws} AS w FROM {table}
), g AS (
  SELECT doc_id, u.pos, u.gram FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(gs) + 1),
        i -> {{'pos': i - 1, 'gram': gs[i]}})) AS u
    FROM (SELECT doc_id, {grams} AS gs FROM w)
  )
), dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, row_number() OVER (
      PARTITION BY gram ORDER BY doc_id, pos) AS rk
    FROM g
  ) WHERE rk > 1
), ds AS (
  SELECT doc_id, list_sort(list(pos)) AS ds FROM dup GROUP BY doc_id
), m AS (
  SELECT w.doc_id, w.w, coalesce(ds.ds, []) AS ds,
    list_transform(range(0, len(w.w)),
      t -> len(list_filter(coalesce(ds.ds, []),
               s -> s >= t - {n - 1} AND s <= t)) > 0) AS mask
  FROM w LEFT JOIN ds USING (doc_id)
)
SELECT doc_id, len(w) AS n_tokens,
  CAST(len(w) - len(list_filter(range(1, len(w) + 1),
      i -> NOT mask[i])) AS BIGINT) AS n_removed,
  coalesce(array_to_string(list_filter(list_transform(range(1, len(w) + 1),
      i -> CASE WHEN NOT mask[i] THEN w[i] END), x -> x IS NOT NULL), ' '),
    '') AS cleaned_text
FROM m
"""


# ---------------------------------------------------------------------------
# Inverted index (term → posting list)

INDEX_MIN_DF = 2
INDEX_MAX_POSTINGS = 20


def inverted_index(
    docs: DataFrame,
    *,
    min_df: int = INDEX_MIN_DF,
    max_postings: int = INDEX_MAX_POSTINGS,
) -> DataFrame:
    """Term-level inverted index over the corpus: (term, df,
    postings) where ``df`` is document frequency and ``postings`` the
    first ``max_postings`` doc_ids in ascending order, comma-joined
    (bounded row width — full posting lists for stopword-grade terms
    would be corpus-sized rows; real systems shard/compress them, the
    cap keeps the row bounded and the ordering deterministic).

    One explode + one hash aggregation on the term key — the classic
    map/combine index build; ``min_df`` drops hapax terms (half a
    typical vocabulary) before they reach the output.
    """
    terms = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.words(F.col("text")))).alias("term"),
    )
    return (
        terms.groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.array_join(
                F.slice(
                    F.sort_array(F.collect_list("doc_id")), 1, max_postings
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def inverted_index_sql(
    min_df: int = INDEX_MIN_DF, max_postings: int = INDEX_MAX_POSTINGS
) -> str:
    ws = TX.words_sql("text")
    return f"""
WITH t AS (
  SELECT doc_id, unnest(list_distinct({ws})) AS term FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
  array_to_string(list_sort(list(doc_id))[1:{max_postings}], ',')
    AS postings
FROM t GROUP BY term HAVING count(*) >= {min_df}
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Robertson/Sparck-Jones; the Lucene idf variant
    ln(1 + (N − df + 0.5)/(df + 0.5)), which keeps idf positive for
    df > N/2): (doc_id, score). Ties break on doc_id ascending; scores
    round to 6 so both engines rank identical values identically.

    Plan: ONE tokenize pass persisted as a narrow (doc_id, dl,
    matching-terms) frame (the term list is a literal — tiny by
    construction, so the per-doc term filter is a map-side array
    ``filter``), a per-(doc, term) count carrying dl in its group key,
    a per-term df aggregate joined back by broadcast, and corpus
    scalars (N, avgdl) via a broadcast 1-row crossJoin. No shuffle
    touches non-matching tokens, the corpus is tokenized exactly once,
    and the global top-k is a TakeOrdered, not a sort.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    # tokenize ONCE: the round-11 shape derived lens and tok from two
    # separate materializations of the words() scan, re-tokenizing the
    # whole corpus (guide §1.2 step 1 — don't compute things twice).
    # One narrow persisted frame (doc_id, dl, matching terms only —
    # the per-doc term filter runs map-side before anything is stored)
    # feeds the length join, the corpus scalars and the tf counts; the
    # doc length rides the tf groupBy key (functionally dependent on
    # doc_id), so the lens re-join disappears too.
    base = (
        _spread(docs)
        .select("doc_id", TX.words(F.col("text")).alias("w"))
        .select(
            "doc_id",
            F.size("w").alias("dl"),
            F.filter("w", lambda t: t.isin(terms)).alias("ft"),
        )
        .persist()
    )
    scalars = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("ft").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_topk_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    ws = TX.words_sql("text")
    terms = ", ".join("'" + t.lower() + "'" for t in query_terms)
    return f"""
WITH words AS (
  SELECT doc_id, {ws} AS w FROM documents
), lens AS (
  SELECT doc_id, len(w) AS dl FROM words
), scalars AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens
), tok AS (
  SELECT doc_id, unnest(w) AS term FROM words
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({terms}) GROUP BY 1, 2
), df AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
)
SELECT tf.doc_id,
  round(sum(
    ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
    * (tf.tf * ({k1} + 1))
    / (tf.tf + {k1} * (1 - {b} + {b} * lens.dl / s.avgdl))
  ), 6) AS score
FROM tf JOIN df USING (term) JOIN lens ON lens.doc_id = tf.doc_id,
     scalars s
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Fixed-size overlapping chunking — the segmentation step between
# curation and embedding/RAG indexing (every retrieval pipeline cuts
# documents into ~chunk_size-token windows with overlap so no span is
# split across a boundary without context).


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Explode each document into overlapping word windows:
    (doc_id, chunk_id, chunk_text, n_words).

    Chunk ``i`` covers words ``[i*stride, i*stride + chunk_size)`` and
    chunks are generated while ``i*stride < n_words`` — so tails
    shorter than ``chunk_size`` survive as their own (shorter) chunk
    and every word lands in ≥1 chunk. ``stride < chunk_size`` gives an
    overlap of ``chunk_size − stride`` words between neighbors;
    ``stride = chunk_size`` is exact tiling. Empty documents yield no
    chunks.

    Scale shape: pure per-row array algebra (split → transform → slice)
    followed by one explode — embarrassingly parallel, no shuffle at
    all; the output is ~n_words/stride rows per document. The chunk
    construction never concatenates per-chunk copies of the document
    (the slice happens on the shared words array), so peak row width
    stays O(doc), not O(doc × chunks).
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if not 0 < stride <= chunk_size:
        raise ValueError(
            f"stride must be in (0, chunk_size={chunk_size}], got {stride}"
        )
    # words staged through a named column BEFORE the transform lambda:
    # higher-order functions re-evaluate non-lambda subexpressions per
    # element, so inlining words(text) here re-tokenizes the document
    # once per chunk — the with_shingle_hashes failure mode (measured
    # 100× on the sf0.1 bench for the inlined form). _spread: a small
    # local parquet arrives single-partition and would serialize the
    # chunk scan onto one task (no-op at scale).
    staged = _spread(docs).select(
        F.col(id_col), TX.words(F.col(text_col)).alias("__w")
    )
    words = F.col("__w")
    n = F.size(words)
    idx = F.when(n > 0, F.sequence(
        F.lit(0).cast("bigint"),
        F.floor((n.cast("bigint") - 1) / F.lit(stride)),
    )).otherwise(F.array().cast("array<bigint>"))
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(words, (i * stride + 1).cast("int"), chunk_size)
            .alias("w"),
        ),
    )
    return (
        staged.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.array_join(F.col("c.w"), " ").alias("chunk_text"),
            F.size(F.col("c.w")).alias("n_words"),
        )
    )


def chunk_documents_sql(
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    ws = TX.words_sql(text_col)
    return f"""
WITH w AS (
  SELECT {id_col}, {ws} AS words FROM {table}
), c AS (
  SELECT {id_col},
    CASE WHEN len(words) > 0 THEN
      list_transform(
        range(0, ((len(words) - 1) // {stride}) + 1),
        i -> struct_pack(
          chunk_id := CAST(i AS BIGINT),
          w := words[(i * {stride} + 1):(i * {stride} + {chunk_size})]))
    ELSE [] END AS chunks
  FROM w
)
SELECT {id_col},
       u.chunk_id AS chunk_id,
       array_to_string(u.w, ' ') AS chunk_text,
       CAST(len(u.w) AS INTEGER) AS n_words
FROM (SELECT {id_col}, unnest(chunks) AS u FROM c)
"""
