"""Dedup-family and similarity-search operator tests: LSH guarantees,
Jaccard correctness on hand-built corpora, ANN vs brute force."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from globallinks_spark.operators import dedup as D
from globallinks_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base),
        (1, base),                 # exact dup → J = 1.0
        (2, base + " again"),      # near dup → J = 11/12 ≈ 0.92
        (3, "completely different text about spark engines and shuffles "
            "with many unrelated words in the mix"),
        (4, base + " and then some extra trailing words appended here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestShortDocs:
    """Docs with fewer than k words must yield empty shingle arrays, not
    crash: Spark's sequence(1, 0) is the DESCENDING [1, 0], so the
    unguarded transform fed index 0 into element_at and threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode (round-1 bug)."""

    @pytest.fixture(scope="class")
    def short_docs(self, spark):
        rows = [
            (0, ""),                      # 0 words
            (1, "hello"),                 # 1 word
            (2, "hello world"),           # 2 words (< k=3)
            (3, "   \t  "),               # whitespace only
            (4, "one two three four five six seven eight"),  # normal
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_shingle_hashes_empty_for_short_docs(self, short_docs):
        rows = {
            r.doc_id: r.hashes
            for r in D.with_shingle_hashes(short_docs).collect()
        }
        assert rows[0] == [] and rows[1] == [] and rows[2] == []
        assert rows[3] == []
        assert len(rows[4]) == 6  # 8 words → 6 trigrams

    def test_minhash_pipeline_survives_short_docs(self, short_docs):
        pairs = D.minhash_dedup_pairs(short_docs, threshold=0.5).collect()
        assert all(r.doc_a not in (0, 1, 2, 3) for r in pairs)

    def test_ngram_jaccard_survives_short_docs(self, short_docs):
        D.ngram_jaccard_pairs(short_docs, threshold=0.5).collect()

    def test_winnow_survives_short_docs(self, short_docs):
        # doc 4 has 6 k-gram hashes → 3 windows of w=4; docs 0-3 emit none
        fps = D.winnow_fingerprints(short_docs, k=3, w=4).collect()
        by_doc = {r.doc_id for r in fps}
        assert by_doc == {4}

    def test_winnow_doc_shorter_than_window(self, spark):
        # 4 words → 2 trigram hashes < w=4 → no fingerprints, no crash
        docs = spark.createDataFrame(
            [(0, "just four little words")], "doc_id long, text string"
        )
        assert D.winnow_fingerprints(docs, k=3, w=4).collect() == []


class TestMinhashLSH:
    def test_exact_dup_is_candidate_and_jaccard_one(self, docs):
        out = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        assert out[(0, 1)] == 1.0

    def test_near_dup_found(self, docs):
        # J ≈ 0.92 → any-band hit probability ≈ 0.99; deterministic with
        # the fixed MINHASH_PARAMS seed
        out = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        assert out[(0, 2)] == 0.9167

    def test_unrelated_not_paired(self, docs):
        out = {
            (r.doc_a, r.doc_b)
            for r in D.minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        assert not any(3 in pair for pair in out)

    def test_lsh_candidates_superset_of_high_jaccard(self, docs):
        # identical signatures must always collide on every band
        sigs = D.minhash_signatures(D.with_shingle_hashes(docs))
        cands = {
            (r.doc_a, r.doc_b)
            for r in D.lsh_candidate_pairs(sigs).collect()
        }
        assert (0, 1) in cands


class TestNgramJaccard:
    def test_matches_manual(self, spark):
        rows = [(0, "a b c d"), (1, "a b c e")]
        # shingles: {abc, bcd} vs {abc, bce} → J = 1/3
        out = D.ngram_jaccard_pairs(
            spark.createDataFrame(rows, "doc_id long, text string"),
            threshold=0.0,
        ).collect()
        assert len(out) == 1
        assert out[0].jaccard == round(1 / 3, 4)

    def test_ground_truth_superset_of_lsh(self, docs):
        lsh = {
            (r.doc_a, r.doc_b)
            for r in D.minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        exact = {
            (r.doc_a, r.doc_b)
            for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert lsh <= exact


class TestWinnowing:
    def test_identical_docs_same_fingerprints(self, spark, docs):
        fps = D.winnow_fingerprints(docs).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        assert by_doc[0] == by_doc[1]          # exact dup
        assert by_doc[0] != by_doc[3]          # unrelated

    def test_near_dup_shares_most_fingerprints(self, spark, docs):
        fps = D.winnow_fingerprints(docs).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.doc_id, set()).add(r.fp)
        inter = by_doc[0] & by_doc[2]
        assert len(inter) / len(by_doc[0] | by_doc[2]) > 0.5

    def test_density(self, spark):
        # winnowing guarantees ≥1 fingerprint per w consecutive windows;
        # expected density ≈ 2/(w+1)
        long_doc = spark.createDataFrame(
            [(1, " ".join(f"w{i * 7919 % 1000}" for i in range(500)))],
            "doc_id long, text string",
        )
        n = D.winnow_fingerprints(long_doc, k=3, w=4).count()
        n_windows = 500 - 2 - 3  # shingles - (w-1)
        assert n <= n_windows
        assert n >= n_windows * 2 / (4 + 1) * 0.5


class TestSimhash:
    def test_identical_texts_same_hash(self, docs):
        sh = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
        assert sh[0] == sh[1]
        assert 0 <= sh[0] < (1 << 16)

    def test_near_texts_close_hamming(self, docs):
        sh = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
        ham = bin(sh[0] ^ sh[2]).count("1")
        assert ham <= 6  # one word changed out of 13

    def test_dup_groups(self, docs):
        groups = D.simhash_dup_groups(docs).collect()
        assert any(g.n_docs >= 2 and g.keeper_doc_id == 0 for g in groups)


class TestSimhashNearDup:
    """Banded hamming<=k join: the pigeonhole argument makes the banded
    candidate set a superset of all true pairs, so after exact
    verification the operator must equal brute-force hamming EXACTLY
    (recall 1.0 and precision 1.0) — asserted against the real sf0.001
    documents corpus, not a hand-picked fixture."""

    SF_DIR = "/root/testdata/sf0.001"

    @pytest.fixture(scope="class")
    def corpus_docs(self, spark):
        return spark.read.parquet(f"{self.SF_DIR}/documents.parquet")

    def _brute_pairs(self, sh: dict, k: int) -> set:
        ids = sorted(sh)
        return {
            (a, b, bin(sh[a] ^ sh[b]).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if bin(sh[a] ^ sh[b]).count("1") <= k
        }

    @pytest.mark.parametrize("bits,k", [(16, 2), (16, 0), (24, 3)])
    def test_equals_brute_force_hamming(self, corpus_docs, bits, k):
        sh = {
            r.doc_id: r.simhash
            for r in D.simhash(corpus_docs, bits=bits).collect()
        }
        want = self._brute_pairs(sh, k)
        got = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in D.simhash_near_dup_pairs(
                corpus_docs, bits=bits, k=k
            ).collect()
        }
        assert want, "fixture produced no near-dup pairs — test is vacuous"
        assert got == want

    def test_k0_matches_dup_groups(self, corpus_docs):
        """hamming-0 pairs collapse to exactly the identical-fingerprint
        groups simhash_dup_groups reports."""
        pairs = D.simhash_near_dup_pairs(corpus_docs, bits=16, k=0).collect()
        assert all(p.hamming == 0 for p in pairs)

    def test_negative_k_rejected(self, corpus_docs):
        with pytest.raises(ValueError):
            D.simhash_near_dup_pairs(corpus_docs, k=-1)

    def test_segment_partition_covers_all_bits(self):
        for bits, n in [(16, 3), (16, 1), (30, 4), (7, 7)]:
            segs = D._segments(bits, n)
            covered = [
                bit for start, width in segs
                for bit in range(start, start + width)
            ]
            assert covered == list(range(bits))


@pytest.fixture(scope="module")
def embeddings(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),   # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0], 1),  # opposite
        (4, [1.0, 0.01, 0.0, 0.0], 1),  # very close to 0
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


class TestSimilarity:
    def test_topk_order(self, embeddings):
        out = S.cosine_topk(embeddings, [1.0, 0.0, 0.0, 0.0], k=3).collect()
        assert [r.vec_id for r in out] == [0, 4, 1]
        assert out[0].cosine == 1.0

    def test_bucketed_topk_excludes_other_bucket(self, embeddings):
        # vec 3 has negative first component → different sign bucket
        out = S.bucketed_topk(embeddings, [1.0, 0.0, 0.0, 0.0], k=5, bits=4)
        ids = [r.vec_id for r in out.collect()]
        assert 3 not in ids
        assert 0 in ids

    def test_near_dup_pairs_blocked_by_label(self, embeddings):
        out = S.near_dup_pairs(embeddings, threshold=0.9).collect()
        pairs = {(r.vec_a, r.vec_b) for r in out}
        assert (0, 1) in pairs          # same label, cosine ≈ 0.994
        assert (0, 4) not in pairs      # cosine ≈ 1 but different label

    def test_near_dup_allpairs_when_unblocked(self, embeddings):
        out = S.near_dup_pairs(
            embeddings, threshold=0.9, partition_col=None
        ).collect()
        assert (0, 4) in {(r.vec_a, r.vec_b) for r in out}


class TestConnectedComponents:
    def test_chain_pair_triangle(self, spark):
        from globallinks_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
            "doc_a long, doc_b long",
        )
        got = sorted(
            (r.node, r.component)
            for r in connected_components(pairs).collect()
        )
        assert got == [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
                       (20, 20), (21, 20), (22, 20)]

    def test_converges_exactly_on_budget(self, spark):
        """A path graph 0-1-2-3 reaches its fixpoint ON round 3 (every
        round changes labels), so max_iterations=3 never observes a
        zero-change round — the extra verification pass must recognize
        the correct fixpoint instead of raising (round-2 advice)."""
        from globallinks_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        got = sorted(
            (r.node, r.component)
            for r in connected_components(pairs, max_iterations=3).collect()
        )
        assert got == [(0, 0), (1, 0), (2, 0), (3, 0)]

    def test_raises_when_budget_truly_short(self, spark):
        from globallinks_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iterations=2).collect()

    def test_dedup_groups_keeper_and_delete_list(self, spark):
        """Two exact-duplicate clusters in a small corpus → smallest
        doc_id kept per cluster, the rest on the delete list; unique
        docs absent."""
        from globallinks_spark.operators.dedup import dedup_groups

        text_a = "alpha beta gamma delta epsilon zeta"
        text_b = "one two three four five six seven"
        docs = spark.createDataFrame(
            [(1, text_a), (2, text_a), (5, text_b), (7, text_b),
             (9, text_b), (11, "completely different words here entirely")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in dedup_groups(docs, threshold=0.8).collect()}
        assert set(rows) == {1, 2, 5, 7, 9}          # 11 is unique
        assert rows[1].keep and rows[1].keeper_id == 1
        assert not rows[2].keep and rows[2].keeper_id == 1
        assert rows[5].keep and rows[5].keeper_id == 5
        assert {rows[7].keeper_id, rows[9].keeper_id} == {5}
        assert not rows[7].keep and not rows[9].keep


class TestSpread:
    def test_already_parallel_input_passes_through(self, spark):
        """_spread must not shuffle an input that already has >= cores
        partitions (at 100 TB every corpus does) — round-1 repartitioned
        unconditionally, a gratuitous full-corpus shuffle."""
        from globallinks_spark.operators.dedup import _spread

        par = spark.sparkContext.defaultParallelism
        wide = spark.range(0, 10_000, 1, numPartitions=par)
        assert _spread(wide) is wide

    def test_single_partition_input_is_spread(self, spark):
        from globallinks_spark.operators.dedup import _spread

        par = spark.sparkContext.defaultParallelism
        narrow = spark.range(0, 100, 1, numPartitions=1)
        assert _spread(narrow).rdd.getNumPartitions() == par


class TestIVF:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import math
        rows = []
        for i in range(200):
            angle = (i % 8) * math.pi / 4 + (i // 8) * 0.01
            rows.append((i, [math.cos(angle), math.sin(angle), 0.0, 0.0],
                         i % 8))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_index_assigns_every_vector(self, corpus):
        _, assigned = S.build_ivf_index(corpus, n_cells=8)
        assert assigned.filter(F.col("cell").isNull()).count() == 0
        assert assigned.count() == 200

    def test_ivf_recall_against_brute_force(self, corpus):
        q = [1.0, 0.05, 0.0, 0.0]
        exact = {r.vec_id for r in S.cosine_topk(corpus, q, k=10).collect()}
        approx = {
            r.vec_id
            for r in S.ivf_topk(corpus, q, k=10, n_cells=8, n_probe=3).collect()
        }
        assert len(exact & approx) >= 8  # ≥80% recall at n_probe=3

    def test_full_probe_equals_brute_force(self, corpus):
        q = [0.0, 1.0, 0.0, 0.0]
        exact = [
            (r.vec_id, r.cosine)
            for r in S.cosine_topk(corpus, q, k=5).collect()
        ]
        full = [
            (r.vec_id, r.cosine)
            for r in S.ivf_topk(corpus, q, k=5, n_cells=8, n_probe=8).collect()
        ]
        assert exact == full

    def test_realistic_dimensions_plan_and_run(self, spark):
        """dim=128 / n_cells=256: the round-1 literal-centroid
        formulation put n_cells × dim ≈ 33k literals into the plan (and
        ~3M at production 768/4096 — an analysis-time blowup). The
        broadcast-matrix path must build and search this size in one
        short job chain."""
        import numpy as np

        rng = np.random.RandomState(42)
        dim, n = 128, 2048
        M = rng.normal(size=(n, dim)).astype("float32")
        df = spark.createDataFrame(
            [(i, M[i].tolist()) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        cents, assigned = S.build_ivf_index(
            df, n_cells=256, iterations=1
        )
        assert len(cents) == 256 and len(cents[0]) == dim
        counts = assigned.groupBy("cell").count().collect()
        assert sum(r["count"] for r in counts) == n
        assert all(0 <= r["cell"] < 256 for r in counts)
        q = M[7].tolist()
        hits = S.ivf_topk(df, q, k=5, n_cells=64, n_probe=8).collect()
        # the query vector itself must be its own nearest neighbour
        assert hits and hits[0].vec_id == 7

    def test_build_leaves_no_persisted_frames(self, spark, corpus):
        """build_ivf_index persists its input for the seed + Lloyd
        passes; a long-lived session composing many indexes must get
        that storage back deterministically, not at ContextCleaner GC's
        leisure (round-2 verdict)."""
        before = spark.sparkContext._jsc.getPersistentRDDs().size()
        _, assigned = S.build_ivf_index(corpus, n_cells=8)
        assert assigned.count() == 200  # materialize the lazy assignment
        after = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert after == before


class TestXxhashKernel:
    """The production (non-oracle) hash kernel. Two properties hold BY
    CONSTRUCTION and are what these tests pin (round-2 advice: blanket
    pair equality across kernels is fixture luck, since LSH candidate
    generation is kernel-dependent):

    - EXACT operators (n-gram Jaccard) are kernel-independent: hashing
      only relabels set elements, so the pair list and Jaccard values
      match bit-for-bit (collisions aside).
    - minhash/LSH verified pairs under ANY kernel are a subset of that
      exact ground truth (precision 1.0 — verification is exact), even
      though each kernel's candidate recall may differ."""

    def _docs(self, spark):
        from globallinks_spark.queries import load

        return load(spark, "/root/testdata/sf0.001", "documents")

    def test_exact_jaccard_identical_across_kernels(self, spark):
        from globallinks_spark.functions import hashing as H

        docs = self._docs(spark)
        md5_pairs = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        with H.kernel("xxhash64"):
            xx_pairs = {
                (r.doc_a, r.doc_b, r.jaccard)
                for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
            }
        assert md5_pairs == xx_pairs and len(md5_pairs) > 0

    def test_minhash_pairs_subset_of_ground_truth_each_kernel(self, spark):
        from globallinks_spark.functions import hashing as H

        docs = self._docs(spark)
        truth = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        md5_pairs = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D.minhash_dedup_pairs(docs, threshold=0.5).collect()
        }
        with H.kernel("xxhash64"):
            xx_pairs = {
                (r.doc_a, r.doc_b, r.jaccard)
                for r in D.minhash_dedup_pairs(docs, threshold=0.5).collect()
            }
        assert md5_pairs and md5_pairs <= truth
        assert xx_pairs and xx_pairs <= truth

    def test_xxhash_is_cheaper_shaped(self, spark):
        """Plan sanity: the xxhash kernel keeps everything JVM-side and
        drops the md5→hex→conv chain (no 'md5(' in the plan)."""
        from globallinks_spark.functions import hashing as H

        with H.kernel("xxhash64"):
            plan = D.with_shingle_hashes(
                self._docs(spark)
            )._jdf.queryExecution().optimizedPlan().toString()
        assert "xxhash64" in plan and "md5" not in plan


class TestVectorizedNearDup:
    """applyInPandas gram-matrix variant must agree with the JVM
    expression path pair-for-pair (float64 matmul vs sequential fold
    differ far below the 4-decimal rounding)."""

    def test_matches_expression_path(self, spark):
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        expr_pairs = {
            (r.vec_a, r.vec_b, r.cosine)
            for r in S.near_dup_pairs(emb, threshold=0.35)
            .select("vec_a", "vec_b", "cosine").collect()
        }
        vec_pairs = {
            (r.vec_a, r.vec_b, r.cosine)
            for r in S.near_dup_pairs_vectorized(emb, threshold=0.35).collect()
        }
        assert expr_pairs == vec_pairs and len(expr_pairs) > 0

    def test_single_row_blocks_emit_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0], "a"), (2, [1.0, 0.0], "b")],
            "vec_id long, embedding array<float>, label string",
        )
        assert S.near_dup_pairs_vectorized(df, threshold=0.5).count() == 0

    def test_tiled_blocks_match_single_gram(self, spark):
        # 100× probe regression (SCALING_SF10.json round 5): a block
        # larger than tile_size must split into tile-pair tasks yet
        # produce the same pair set — diagonal triu groups plus
        # off-diagonal cross groups cover each unordered pair once.
        # Cosines are compared with a 2e-4 tolerance, not exact-set:
        # BLAS gemm for different matrix shapes (tiled A@B.T vs whole
        # M@M.T) can differ in the last ulp, which the 4dp rounding can
        # amplify to a 1e-4 step for values on a rounding boundary.
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        whole = {
            (r.vec_a, r.vec_b): r.cosine
            for r in S.near_dup_pairs_vectorized(
                emb, threshold=0.35, tile_size=1_000_000
            ).collect()
        }
        # sf0.01 label blocks are ~hundreds of rows; tile_size=37 forces
        # every block into many tiles (uneven hash splits included)
        tiled = {
            (r.vec_a, r.vec_b): r.cosine
            for r in S.near_dup_pairs_vectorized(
                emb, threshold=0.35, tile_size=37
            ).collect()
        }
        assert whole.keys() == tiled.keys() and len(whole) > 0
        for k, c in whole.items():
            assert abs(c - tiled[k]) <= 2e-4, (k, c, tiled[k])

    def test_null_block_key_pairs_nothing_like_expression_form(self, spark):
        # Null block keys never pair: the expression form's a.p == b.p
        # is null-unsafe, and the lazy fan-out's inner counts join
        # drops null-p rows the same way. (The old eager small-path
        # grouped nulls into a block and COULD pair them — an
        # inconsistency with the expression form, gone since r7.)
        df = spark.createDataFrame(
            [(1, [1.0, 0.0], None), (2, [1.0, 0.0], None),
             (3, [0.0, 1.0], "a"), (4, [0.0, 1.0], "a")],
            "vec_id long, embedding array<float>, label string",
        )
        expr = {(r.vec_a, r.vec_b) for r in
                S.near_dup_pairs(df, threshold=0.5).collect()}
        vec = {(r.vec_a, r.vec_b) for r in
               S.near_dup_pairs_vectorized(df, threshold=0.5).collect()}
        assert expr == vec == {(3, 4)}

    def test_construction_runs_no_job(self, spark):
        # The r6 small-scale guard ran an eager counts.agg(max).first()
        # at DataFrame-construction time (ADVICE r6 medium): every
        # spec.fn() / explain / audit on this operator executed a full
        # aggregation pass, and the guard decision was a stale snapshot
        # if the source grew before materialization. The tile count is
        # now derived lazily in-plan — building the frame (and auditing
        # it) must schedule zero Spark jobs.
        from globallinks_spark.plans.explain import audit
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        emb.schema  # analysis (and any parquet footer job) paid here
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup())
        df = S.near_dup_pairs_vectorized(emb, threshold=0.35)
        findings = audit(df)
        assert len(tracker.getJobIdsForGroup()) == before
        assert not [f for f in findings if f["severity"] == "error"]

    def test_fanned_plan_scans_input_once_full_width(self, spark):
        # Scan accounting for the lazy fan-out (r6 verdict ask #2): the
        # plan must contain exactly TWO parquet scan nodes — the
        # full-width base scan and the per-block counts scan — and the
        # counts scan must be pruned to the block key alone, so the
        # only extra pass over the input at 100 TB reads one column.
        # (The r6 eager-guard shape paid up to two extra FULL scans:
        # one for the guard max, one recomputing counts in the join.)
        import re

        from globallinks_spark.plans.explain import plan_string
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        plan = plan_string(
            S.near_dup_pairs_vectorized(emb, threshold=0.35), "formatted"
        )
        schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
        assert len(schemas) == 2, plan
        col_sets = [
            {c.split(":")[0] for c in s.split(",") if c} for s in schemas
        ]
        pruned = [s for s in col_sets if s == {"label"}]
        full = [s for s in col_sets if {"vec_id", "embedding"} <= s]
        assert len(pruned) == 1 and len(full) == 1, col_sets


class TestRouteAnn:
    """route_ann encodes ANN_RECALL.json's measured recall curves as a
    code-level routing decision (r6 verdict #6). Pins: the judged
    calls — 0.9+ band routes to IVF probe2 for high targets and rp-LSH
    multi-probe for moderate ones; the mid band degrades to rp probe8
    then exact; low-cosine regimes are exact-only; the axis stand-in
    (0.0 measured recall in 0.7-0.9) is never returned."""

    def test_high_band_routes(self):
        # r9: the multi-table union (0.834 @ 0.0313) now answers 0.8
        # targets four times cheaper than IVF probe2 (0.808 @ 0.125)
        assert S.route_ann(0.8, 0.9) == (
            "random_projection_multitable",
            {"bits": 8, "n_tables": 2, "n_probe": 4})
        # ...and the 0.9-1.0 band finally has a ≥0.9-recall bucketed
        # config (r8 verdict #5): 3 tables × probe4 at 0.945 measured
        assert S.route_ann(0.9, 0.95) == (
            "random_projection_multitable",
            {"bits": 8, "n_tables": 3, "n_probe": 4})
        assert S.route_ann(0.5, 0.9) == (
            "random_projection_bucket", {"bits": 8, "n_probe": 4})
        # r8 dense planted grid lifted rp4's band minimum to 0.622, so
        # a 0.6 target now routes to the cheaper probe4 config
        assert S.route_ann(0.6, 0.95) == (
            "random_projection_bucket", {"bits": 8, "n_probe": 4})
        assert S.route_ann(0.65, 0.95) == (
            "random_projection_bucket", {"bits": 8, "n_probe": 8})
        # beyond the best measured config: exact, never extrapolate
        assert S.route_ann(0.95, 0.99) == ("exact_tiled", {})

    def test_mid_and_low_bands(self):
        assert S.route_ann(0.4, 0.7) == (
            "random_projection_bucket", {"bits": 8, "n_probe": 8})
        assert S.route_ann(0.5, 0.7) == ("exact_tiled", {})
        assert S.route_ann(0.15, 0.5) == (
            "random_projection_bucket", {"bits": 8, "n_probe": 8})
        # below cosine 0.5 nothing is measured to work: exact only
        assert S.route_ann(0.1, 0.35) == ("exact_tiled", {})

    def test_cheapest_first_and_no_axis_variant(self):
        for band, rows in S.ANN_ROUTING_TABLE.items():
            fracs = [frac for _, _, _, frac in rows]
            assert fracs == sorted(fracs), band
            assert all(v != "sign_bucket" for v, _, _, _ in rows), band

    @staticmethod
    def _artifact():
        import json
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ANN_RECALL.json",
        )
        return json.load(open(path))

    def test_table_matches_recorded_artifact_every_band(self):
        """r7 verdict #7: EVERY band figure — not just 0.7-0.9 — must
        equal the committed ANN_RECALL.json measurement it cites, so
        the routing table cannot drift from the artifact in any band
        without a named failure. The 0.9-1.0 band is the conservative
        MINIMUM over the dense planted grid (0.90-0.99, step 0.01);
        the natural bands come straight from the pair-collision
        section."""
        art = self._artifact()[
            "near_dup_pair_collision_recall_by_cosine_band"]
        bands, planted = art["bands"], art[
            "planted_pairs_exact_cosine"]["levels"]
        assert art["planted_pairs_exact_cosine"][
            "n_pairs_per_level"] >= 500  # r7 verdict #5 density floor

        def planted_min(key: str) -> float:
            vals = [lv[key] for lv in planted.values()]
            assert len(vals) >= 10  # the 0.90-0.99 grid, step 0.01
            return min(vals)

        for band, rows in S.ANN_ROUTING_TABLE.items():
            for variant, params, recall, frac in rows:
                if band == "0.9-1.0":
                    if variant == "random_projection_bucket":
                        key = f"rp_probe{params['n_probe']}"
                    elif variant == "random_projection_multitable":
                        key = (f"rp_union_t{params['n_tables']}"
                               f"_probe{params['n_probe']}")
                    else:
                        key = f"ivf_probe{params['n_probe']}"
                    assert abs(planted_min(key) - recall) < 1e-9, (
                        band, variant, params)
                else:
                    key = f"rp_probe{params['n_probe']}"
                    assert abs(bands[key][band] - recall) < 1e-9, (
                        band, variant, params)
                # the cost column is the nominal share of the corpus a
                # probed row meets: n_probe/2^bits (LSH; ×n_tables for
                # the OR-construction), probe/cells (IVF)
                if variant == "random_projection_bucket":
                    nominal = params["n_probe"] / 256.0
                elif variant == "random_projection_multitable":
                    nominal = (params["n_tables"] * params["n_probe"]
                               / 256.0)
                else:
                    nominal = params["n_probe"] / params["n_cells"]
                assert abs(frac - round(nominal, 4)) < 6e-4, (
                    band, variant, frac, nominal)


class TestRouteAnnTopk:
    """The serving-regime router (r7 verdict #1): every
    SERVING_ROUTING_TABLE row is pinned to the committed ANN_RECALL
    measurement, the done-criterion config (recall@10 ≥ 0.9 at
    equivalent candidate fraction ≤ 0.15) exists, and routing picks
    cheapest-first."""

    _KEY = {
        "ivf_sq_rerank": lambda p: (
            f"ivf_cells{p['n_cells']}_probe{p['n_probe']}"
            f"_sq{p['nbits']}_rerank{p['pool']}"),
        "sq_rerank": lambda p: f"sq{p['nbits']}_rerank_pool{p['pool']}",
        "ivf": lambda p: f"ivf_cells{p['n_cells']}_probe{p['n_probe']}",
    }

    def test_table_matches_recorded_artifact(self):
        variants = TestRouteAnn._artifact()["variants"]
        for variant, params, recall, frac in S.SERVING_ROUTING_TABLE:
            row = variants[self._KEY[variant](params)]
            assert abs(row["recall_at_k"] - recall) < 1e-9, variant
            assert abs(row["candidate_fraction"] - frac) < 1e-9, variant

    def test_sublinear_high_recall_config_exists(self):
        # the r7 verdict #1 done-criterion, pinned as a test: at least
        # one MEASURED config with recall@10 ≥ 0.9 at equivalent
        # full-precision-scan fraction ≤ 0.15
        winners = [
            (v, p) for v, p, r, f in S.SERVING_ROUTING_TABLE
            if r >= 0.9 and f <= 0.15
        ]
        assert winners, "no sublinear high-recall serving config"
        # …and the artifact decomposes the winner's cost honestly
        variants = TestRouteAnn._artifact()["variants"]
        for v, p in winners:
            row = variants[self._KEY[v](p)]
            expect = (row["rows_scored_fraction"]
                      * row["bytes_per_row_ratio"]
                      + row["rerank_rows_fraction"])
            assert abs(row["candidate_fraction"] - expect) < 1e-4

    def test_measured_bytes_ratio_pinned_to_artifact(self):
        # r8 verdict #2: the SQ cost fractions must be MEASURED parquet
        # scan bytes (sq_bytes_probe.py — scan-operator metric on a
        # high-entropy corpus), not the arithmetic code-bytes figure.
        # SQ_MEASURED_BYTES_RATIO is the single source both the routing
        # table and ann_recall_probe.py read; it must equal the
        # committed measurement, and the measurement must stay within
        # sanity bounds of the arithmetic floor (> arith: overhead only
        # ADDS bytes; < 2x arith: the layout stays genuinely narrow).
        mb = TestRouteAnn._artifact()["measured_bytes"]["variants"]
        for nbits in (4, 8):
            row = mb[f"sq{nbits}"]
            pinned = S.SQ_MEASURED_BYTES_RATIO[nbits]
            assert abs(row["measured_bytes_ratio"] - pinned) < 1e-9
            arith = row["arithmetic_bytes_ratio"]
            assert arith < pinned < 2 * arith

    def test_cheapest_first_and_routing(self):
        fracs = [f for _, _, _, f in S.SERVING_ROUTING_TABLE]
        assert fracs == sorted(fracs)
        assert S.route_ann_topk(0.9) == (
            "ivf_sq_rerank",
            {"n_cells": 16, "n_probe": 10, "nbits": 4, "pool": 50})
        assert S.route_ann_topk(0.99) == (
            "sq_rerank", {"nbits": 4, "pool": 50})
        assert S.route_ann_topk(1.0) == (
            "sq_rerank", {"nbits": 4, "pool": 50})
        # above anything measured: exact, never extrapolate
        assert S.route_ann_topk(1.01) == ("exact_brute", {})


class TestSqRerank:
    """Scalar-quantized serving ANN (r7 verdict #1): packed int4/int8
    codes scored exactly (integer dot), small pool exact-re-ranked.
    The quantization error bound (≤ scale/(2·lim) per dim) is far
    below this data's pool-boundary cosine gaps, so the result must
    EQUAL exact brute force here — recall is measured separately on
    the 10× probe corpus (ANN_RECALL.json)."""

    def test_pack_unpack_roundtrip(self):
        import numpy as np

        rng = np.random.default_rng(11)
        M = rng.standard_normal((17, 9))  # odd dim exercises padding
        scales = np.abs(M).max(axis=1)
        for nbits in (4, 8):
            codes = S._sq_quantize(M, scales, nbits)
            lim = S._SQ_LIM[nbits]
            assert codes.min() >= -lim and codes.max() <= lim
            unpacked = np.stack([
                S._sq_unpack(b, 9, nbits) for b in S._sq_pack(codes, nbits)
            ])
            assert (unpacked == codes).all()

    def test_quantize_zero_vector_codes_to_zero(self):
        import numpy as np

        Z = np.zeros((2, 6))
        assert (S._sq_quantize(Z, np.zeros(2), 4) == 0).all()

    def test_matches_exact_brute_force_both_widths(self, spark):
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        q = [float(x) for x in
             emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        exact = [(r.vec_id, r.cosine)
                 for r in S.cosine_topk(emb, q, k=10).collect()]
        for nbits in (4, 8):
            got = [(r.vec_id, r.cosine) for r in
                   S.sq_rerank_topk(emb, q, k=10, pool=50,
                                    nbits=nbits).collect()]
            assert got == exact, nbits

    def test_persisted_index_path_equals_inline(self, spark):
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        q = [float(x) for x in
             emb.filter(F.col("vec_id") == 3).first()["embedding"]]
        inline = S.sq_rerank_topk(emb, q, k=5, pool=30, nbits=4).collect()
        idx = S.sq_index(emb, nbits=4).persist()
        try:
            via_index = S.sq_rerank_topk(
                emb, q, k=5, pool=30, nbits=4, index=idx
            ).collect()
        finally:
            idx.unpersist()
        assert via_index == inline

    def test_index_is_narrow_and_binary(self, spark):
        # the serving scan's whole point: the index frame carries only
        # (id, 32-or-64-byte code, two doubles) — never the embedding
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        idx = S.sq_index(emb, nbits=4)
        assert [f.name for f in idx.schema.fields] == [
            "id", "sq_code", "sq_scale", "sq_norm"]
        row = idx.first()
        dim = len(emb.first()["embedding"])
        assert len(row["sq_code"]) == (dim + 1) // 2  # packed nibbles

    def test_rejects_unknown_nbits(self, spark, embeddings):
        with pytest.raises(ValueError):
            S.sq_index(embeddings, nbits=5)

    def test_keep_cols_carries_blocking_column(self, spark):
        # the composed serving path (route_ann_topk's ivf_sq_rerank):
        # the cell rides INTO the index so the scoring scan can prune
        # rows before touching codes — filtering the index by cell must
        # equal building the index over the pre-filtered corpus
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        cells = emb.withColumn("cell", (F.col("vec_id") % 4).cast("int"))
        idx = S.sq_index(cells, nbits=4, keep_cols=("cell",))
        assert "cell" in [f.name for f in idx.schema.fields]
        q = [float(x) for x in
             emb.filter(F.col("vec_id") == 1).first()["embedding"]]
        via_filter = S.sq_rerank_topk(
            emb, q, k=5, pool=20, nbits=4,
            index=idx.filter(F.col("cell").isin(0, 1)),
        ).collect()
        pre_filtered = cells.filter(F.col("cell").isin(0, 1))
        via_prefilter = S.sq_rerank_topk(
            pre_filtered, q, k=5, pool=20, nbits=4,
        ).collect()
        assert via_filter == via_prefilter

    def test_pack_unpack_roundtrip_property(self):
        # hypothesis-style sweep without Spark: every (dim, nbits)
        # shape round-trips, including dim=1, even/odd dims, and
        # extreme codes at ±lim
        import numpy as np

        rng = np.random.default_rng(23)
        for dim in (1, 2, 3, 8, 15, 16, 33):
            M = rng.uniform(-5, 5, size=(11, dim))
            M[0, :] = 5.0    # all-max row → codes at +lim
            M[1, :] = -5.0   # all-min row → codes at -lim
            scales = np.abs(M).max(axis=1)
            for nbits in (4, 8):
                codes = S._sq_quantize(M, scales, nbits)
                unpacked = np.stack([
                    S._sq_unpack(b, dim, nbits)
                    for b in S._sq_pack(codes, nbits)
                ])
                assert (unpacked == codes).all(), (dim, nbits)

    def test_sq_knn_join_matches_exact_knn_join(self, spark):
        # the batch serving shape: per-query quantized pool + exact
        # re-rank must equal the full-precision knn_join on this data
        # for BOTH code widths (the int4 error bound is far below the
        # pool-boundary gaps)
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        qs = emb.filter(F.col("vec_id") % 40 == 0).orderBy(
            "vec_id").limit(5)
        exact = {(r["query_id"], r["vec_id"]): r["cosine"]
                 for r in S.knn_join(qs, emb, k=3).collect()}
        for nbits in (4, 8):
            got = {(r["query_id"], r["vec_id"]): r["cosine"]
                   for r in S.sq_knn_join(qs, emb, k=3, pool=50,
                                          nbits=nbits).collect()}
            assert got == exact, nbits

    def test_sq_knn_join_pool_caps_rerank_pairs(self, spark):
        # the re-rank stage must see ≤ pool rows per query — the whole
        # point of the quantized pre-stage
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        qs = emb.filter(F.col("vec_id") < 2)
        out = S.sq_knn_join(qs, emb, k=500, pool=7, nbits=8).collect()
        per_q = {}
        for r in out:
            per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
        assert per_q and all(n <= 7 for n in per_q.values())

    def test_zero_vector_corpus_scores_zero_not_nan(self, spark):
        # the SCORING stage must survive a zero vector (codes 0,
        # approx 0.0 — guarded denominators, no NaN/ANSI error) and
        # rank it below every real candidate. The exact RE-RANK keeps
        # cosine_topk's pre-existing contract (ANSI divide-by-zero on
        # zero-norm rows), so the pool here excludes it by rank.
        rows = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0]),
                (2, [0.5, 0.5, 0.0, 0.0])]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        scored = {r.id: r.approx for r in
                  S.sq_scores(S.sq_index(df, nbits=4),
                              [1.0, 0.0, 0.0, 0.0], nbits=4).collect()}
        assert scored[0] == 0.0 and scored[1] > scored[2] > 0.0
        got = S.sq_rerank_topk(df, [1.0, 0.0, 0.0, 0.0], k=2,
                               pool=2, nbits=4).collect()
        assert [r.vec_id for r in got] == [1, 2]

    def test_zero_vector_query_scores_zero_not_nan(self, spark):
        # the symmetric case (r8 ADVICE): an all-zero QUERY vector must
        # score 0.0 against every corpus row in the SCORING stage —
        # qnorm coalesces to 1.0 on both engines, never a division by
        # zero → inf/NaN. (The exact RE-RANK keeps cosine_topk's
        # pre-existing ANSI divide-by-zero contract for zero-norm
        # inputs, same as the corpus-side test above.)
        rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.5, 0.5, 0.0, 0.0])]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        scored = S.sq_scores(S.sq_index(df, nbits=4),
                             [0.0, 0.0, 0.0, 0.0], nbits=4).collect()
        assert [r.approx for r in scored] == [0.0, 0.0]
        assert all(math.isfinite(r.approx) for r in scored)

    def test_sq_knn_join_rejects_oversized_query_side(self, spark):
        # the small-query-side contract is enforced, not just
        # documented: a query frame above max_query_rows raises instead
        # of collecting toward a driver OOM
        rows = [(i, [float(i), 1.0]) for i in range(5)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="max_query_rows"):
            S.sq_knn_join(df, df, k=1, max_query_rows=3)

    def test_knn_join_rejects_oversized_query_side(self, spark):
        rows = [(i, [float(i), 1.0]) for i in range(5)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="max_query_rows"):
            S.knn_join(df, df, k=1, max_query_rows=3)


class TestMultiTableLsh:
    """OR-construction sign-LSH (r8 verdict #5): n independent seeded
    tables, pair found on ANY probed (table, bucket) collision. The
    soundness contract is containment: single-table pairs ⊆ multi-table
    pairs ⊆ exact all-pairs at the same threshold (adding tables only
    ADDS candidate blocks; every emitted pair is exact-cosine-checked
    inside its block). The recall climb itself is measured on the
    planted grid (ANN_RECALL.json rp_union_* rows), not asserted here."""

    def _pairs(self, df):
        return {(r.vec_a, r.vec_b) for r in df.collect()}

    def test_containment_and_exactness(self, spark):
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings").limit(400)
        single = self._pairs(S.near_dup_pairs_multitable(
            emb, threshold=0.35, n_tables=1, n_probe=4))
        multi_df = S.near_dup_pairs_multitable(
            emb, threshold=0.35, n_tables=3, n_probe=4)
        multi = self._pairs(multi_df)
        exact = self._pairs(S.near_dup_pairs_vectorized(
            emb.withColumn("one", F.lit(1)), threshold=0.35,
            partition_col="one"))
        assert single <= multi <= exact
        assert len(multi) > len(single)  # the OR-construction must add
        # every pair is threshold-true and appears exactly once
        rows = multi_df.collect()
        assert len(rows) == len(multi)
        assert all(r.cosine >= 0.35 for r in rows)

    def test_large_n_probe_clamps_to_bits(self, spark):
        # ADVICE r10: argsort yields at most `bits` flip candidates, so
        # n_probe > bits+1 must clamp (as the replaced Catalyst form did
        # via F.slice), not raise IndexError inside the numpy kernel —
        # and the clamped run must equal the exhaustive bits+1 probing.
        rows = [(i, [float((i >> b) & 1) * 2 - 1 for b in range(8)])
                for i in range(40)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        kw = dict(threshold=0.5, bits=4, n_tables=2, dim=8)
        clamped = self._pairs(S.near_dup_pairs_multitable(
            emb, n_probe=16, **kw))
        full = self._pairs(S.near_dup_pairs_multitable(
            emb, n_probe=5, **kw))  # bits+1 = every 1-bit flip
        assert clamped == full

    def test_null_and_ragged_vectors_dropped(self, spark):
        # ADVICE r10: a null or ragged-length embedding must be dropped
        # (the pre-r10 zip_with form degraded it to null margins — the
        # row hashed nowhere), not np.stack-crash the task.
        # ADVICE r11: a correct-LENGTH vector with null ELEMENTS is
        # dirty too — it would pass a null/size-only filter, turn NaN
        # in the numpy kernel, and fan into bucket 0 of every table.
        clean = [(i, [1.0, 0.0, 1.0, 0.0]) for i in range(6)]
        dirty = [(100, None), (101, [1.0]), (102, [1.0] * 9),
                 (103, [1.0, None, 1.0, 0.0])]
        emb = spark.createDataFrame(
            clean + dirty, "vec_id long, embedding array<float>")
        pairs = S.near_dup_pairs_multitable(
            emb, threshold=0.9, bits=4, n_tables=2, n_probe=3, dim=4)
        got = self._pairs(pairs)
        ids = {i for p in got for i in p}
        assert ids <= {i for i, _ in clean}
        # the clean identical vectors all pair up
        assert len(got) == len(clean) * (len(clean) - 1) // 2

    def test_routing_returns_multitable_for_high_recall_pairs(self):
        # the r8 verdict #5 done-criterion: the 0.9-1.0 band now has a
        # measured ≥0.9-recall bucketed config at fraction ≤ 0.25 and
        # route_ann answers it instead of exact_tiled
        variant, params = S.route_ann(0.9, 0.95)
        assert variant == "random_projection_multitable"
        assert params["n_tables"] * params["n_probe"] / 256.0 <= 0.25


class TestMultiProbe:
    def test_probe_sequence_deterministic_and_ordered(self):
        q = [0.01, -0.5, 0.02, 3.0, -0.03, 1.0, -2.0, 0.5]
        bs = S.probe_buckets(q, bits=8, n_probe=4)
        assert len(bs) == 4 and len(set(bs)) == 4
        base = bs[0]
        # first flips are the lowest-|margin| coordinates: 0, 2, 4
        assert bs[1] == base ^ 1 and bs[2] == base ^ 4 and bs[3] == base ^ 16

    def test_recall_improves_with_probes(self, spark):
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        q = [float(x) for x in
             emb.filter(F.col("vec_id") == 7).first()["embedding"]]
        exact = {r.vec_id for r in S.cosine_topk(emb, q, k=10).collect()}

        def recall(n_probe):
            got = {
                r.vec_id
                for r in S.bucketed_topk(
                    emb, q, k=10, bits=8, n_probe=n_probe
                ).collect()
            }
            return len(got & exact) / len(exact)

        r1, r8 = recall(1), recall(8)
        assert r8 >= r1  # monotone: probing more buckets never loses
        assert r8 >= 0.3  # 8 of 256 buckets must recover a real fraction


class TestKnnJoin:
    def test_each_query_finds_itself_first(self, spark):
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.001", "embeddings")
        out = S.knn_join(emb.filter(F.col("vec_id") < 3), emb, k=2).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        assert set(by_q) == {0, 1, 2}
        for qid, rows in by_q.items():
            assert len(rows) == 2
            top = max(rows, key=lambda r: (r.cosine, -r.vec_id))
            assert top.vec_id == qid and top.cosine == 1.0

    def test_broadcasts_query_side(self, spark):
        from globallinks_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.001", "embeddings")
        plan = (
            S.knn_join(emb.filter(F.col("vec_id") < 3), emb, k=2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan


class TestIncrementalMinhash:
    """minhash_dedup_pairs_incremental: cross-boundary pairs only, and
    its pair set equals the full-corpus operator's pairs restricted to
    the boundary (same LSH family on both paths)."""

    def _corpus(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (0, base),
            (1, base + " tail"),                      # near-dup of 0
            (2, "completely different text about spark partitions"),
            (100, base + " extra"),                   # new batch: dup of 0/1
            (101, "nothing like anything else at all here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cross_boundary_pairs_found(self, spark):
        from globallinks_spark.operators.dedup import (
            minhash_dedup_pairs_incremental,
        )

        d = self._corpus(spark)
        new = d.filter("doc_id >= 100")
        old = d.filter("doc_id < 100")
        pairs = minhash_dedup_pairs_incremental(new, old, threshold=0.5)
        got = {(r.new_id, r.corpus_id) for r in pairs.collect()}
        assert (100, 0) in got and (100, 1) in got
        # no batch-internal or corpus-internal pairs
        for a, b in got:
            assert a >= 100 and b < 100

    def test_matches_full_dedup_restricted_to_boundary(self, spark):
        from globallinks_spark.operators.dedup import (
            minhash_dedup_pairs,
            minhash_dedup_pairs_incremental,
        )

        d = self._corpus(spark)
        full = {
            (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b), r.jaccard)
            for r in minhash_dedup_pairs(d, threshold=0.5).collect()
            # boundary pairs: one side < 100, the other >= 100
            if (r.doc_a < 100) != (r.doc_b < 100)
        }
        inc = {
            (min(r.new_id, r.corpus_id), max(r.new_id, r.corpus_id), r.jaccard)
            for r in minhash_dedup_pairs_incremental(
                d.filter("doc_id >= 100"), d.filter("doc_id < 100")
            ).collect()
        }
        assert inc == full


class TestPersistedLshIndex:
    """save_lsh_index / dedup_against_index: the stored-index path must
    equal the in-memory incremental operator, reject kernel mismatches,
    and push the candidate filter into the shingle-table scan."""

    def test_matches_in_memory_incremental(self, spark, tmp_path):
        from globallinks_spark.queries import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        batch = docs.filter(F.col("doc_id") % 2 == 1)
        idx = str(tmp_path / "lsh_idx")
        D.save_lsh_index(corpus, idx)
        got = {
            (r.new_id, r.corpus_id, r.jaccard)
            for r in D.dedup_against_index(
                spark, batch, idx, threshold=0.5).collect()
        }
        want = {
            (r.new_id, r.corpus_id, r.jaccard)
            for r in D.minhash_dedup_pairs_incremental(
                batch, corpus, threshold=0.5).collect()
        }
        assert got == want and len(got) > 0

    def test_kernel_mismatch_rejected(self, spark, tmp_path):
        from globallinks_spark.functions import hashing as H
        from globallinks_spark.queries import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        idx = str(tmp_path / "idx2")
        D.save_lsh_index(docs.limit(50), idx)
        with H.kernel("xxhash64"):
            with pytest.raises(ValueError, match="kernel"):
                D.dedup_against_index(spark, docs.limit(10), idx)

    def test_rerun_overwrites_cleanly(self, spark, tmp_path):
        from globallinks_spark.queries import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        idx = str(tmp_path / "idx3")
        D.save_lsh_index(docs.limit(100), idx)
        D.save_lsh_index(docs.limit(100), idx)   # rerun-safe
        bands = spark.read.parquet(str(tmp_path / "idx3" / "bands"))
        from globallinks_spark.functions import hashing as H
        assert bands.select("doc_id").distinct().count() <= 100
        assert bands.count() <= 100 * H.NUM_BANDS


class TestEmbeddingDedupGroups:
    def test_components_and_keepers(self, spark):
        from globallinks_spark.operators.similarity import (
            embedding_dedup_groups,
        )

        # label-0 block: 1~2~3 (chain via near-identical directions);
        # label-1 block: 5~6; 9 alone
        rows = [
            (1, [1.0, 0.0], 0), (2, [1.0, 1e-4], 0), (3, [1.0, 2e-4], 0),
            (5, [0.0, 1.0], 1), (6, [1e-4, 1.0], 1),
            (9, [1.0, 0.0], 1),  # same direction as 1 but other block
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {r.vec_id: r for r in embedding_dedup_groups(
            emb, threshold=0.999).collect()}
        assert out[1].keep and out[1].keeper_id == 1
        assert not out[2].keep and out[2].keeper_id == 1
        assert not out[3].keep and out[3].keeper_id == 1
        assert out[5].keep and not out[6].keep and out[6].keeper_id == 5
        assert 9 not in out     # blocked: never compared across labels
