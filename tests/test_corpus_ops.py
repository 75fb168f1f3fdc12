"""Unit tests for operators/corpus.py — the curation batch
(contamination, duplicated spans, mixture resampling, quality
classifier, bigram LM). Constructed fixtures pin the semantics the
sf-data oracle test can't isolate (exact counts on known inputs,
edge cases: short docs, single-language corpora, empty benchmark).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globallinks_spark.operators import corpus as C


def docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


class TestContamination:
    def test_planted_overlap_found(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta"
        train = docs(spark, [(shared + " filler one two", "en"),
                             ("unrelated words only here today now", "en")])
        bench = docs(spark, [(shared + " other tail words", "en")])
        out = C.contamination_pairs(train, bench, n=5, min_overlap=3).collect()
        assert len(out) == 1
        row = out[0]
        # "alpha..eta" = 7 words → 3 shared 5-grams
        assert (row.train_id, row.bench_id, row.n_overlap) == (0, 0, 3)
        # train doc 0 has 10 words → 6 distinct 5-grams
        assert row.overlap_frac == round(3 / 6, 6)

    def test_below_threshold_excluded(self, spark):
        train = docs(spark, [("a b c d e x y z", "en")])
        bench = docs(spark, [("a b c d e q r s", "en")])  # 1 shared 5-gram
        assert C.contamination_pairs(train, bench, n=5, min_overlap=3).count() == 0

    def test_empty_benchmark(self, spark):
        train = docs(spark, [("a b c d e f", "en")])
        bench = train.filter(F.lit(False))
        assert C.contamination_pairs(train, bench).count() == 0


class TestDupSpanProfile:
    def test_exact_duplicate_docs_fully_flagged(self, spark):
        body = "one two three four five six seven eight nine ten"
        d = docs(spark, [(body, "en"), (body, "en"),
                         ("totally different words " * 3, "en")])
        out = {r.doc_id: r for r in C.dup_span_profile(d, n=8).collect()}
        # 10 words → 3 positional 8-grams, all shared between docs 0/1
        for i in (0, 1):
            assert (out[i].n_grams, out[i].n_dup) == (3, 3)
            assert out[i].dup_frac == 1.0 and out[i].flagged
        assert out[2].n_dup == 0 and not out[2].flagged

    def test_within_doc_repeat_counts(self, spark):
        # the 8-gram window repeats inside ONE doc
        d = docs(spark, [("a b c d e f g h a b c d e f g h", "en")])
        row = C.dup_span_profile(d, n=8).collect()[0]
        assert row.n_grams == 9
        # positions 1 and 9 share the gram "a b c d e f g h"
        assert row.n_dup == 2

    def test_short_docs_excluded(self, spark):
        d = docs(spark, [("too short", "en")])
        assert C.dup_span_profile(d, n=8).count() == 0


class TestMixResample:
    def test_rates_and_counts(self, spark):
        rows = [("word " * 5, "en")] * 16 + [("word " * 5, "de")] * 4
        out = {r.lang: r for r in C.mix_resample(docs(spark, rows)).collect()}
        assert out["de"].rate_bp == 10000          # rarest keeps all
        assert out["en"].rate_bp == 5000           # sqrt(4/16) = 1/2
        assert out["de"].n_kept == 4               # rate 1.0 keeps every doc
        assert 0 <= out["en"].n_kept <= 16
        # determinism: same input → same kept count
        out2 = {r.lang: r for r in C.mix_resample(docs(spark, rows)).collect()}
        assert out2["en"].n_kept == out["en"].n_kept

    def test_uniform_corpus_keeps_everything(self, spark):
        rows = [("w " * 3, "en")] * 5 + [("w " * 3, "fr")] * 5
        for r in C.mix_resample(docs(spark, rows)).collect():
            assert r.rate_bp == 10000 and r.n_kept == r.n_docs


class TestQualityClassifier:
    def test_scores_bounded_and_monotone_in_length(self, spark):
        d = docs(spark, [("the a an and of to in " * 20, "en"),
                         ("zz", "en")])
        out = {r.doc_id: r for r in C.quality_classify(d).collect()}
        for r in out.values():
            assert 0.0 <= r.quality_score <= 1.0
            assert r.keep == (r.quality_score >= C.QC_THRESHOLD)
        # long stopword-rich doc must outscore a 1-word fragment
        assert out[0].quality_score > out[1].quality_score

    def test_empty_doc_scores(self, spark):
        r = C.quality_classify(docs(spark, [("", "en")])).collect()[0]
        assert 0.0 <= r.quality_score <= 1.0


class TestBigramLM:
    def test_common_patterns_score_lower(self, spark):
        common = "the cat sat"
        d = docs(spark, [(common, "en")] * 5 + [("xq zv wk", "en")])
        out = C.bigram_lm_score(d).collect()
        scores = {r.doc_id: r.avg_nll for r in out}
        rare = scores[5]
        assert all(scores[i] < rare for i in range(5))
        buckets = {r.doc_id: r.ppl_bucket for r in out}
        assert buckets[5] == "tail"
        assert set(buckets.values()) <= {"head", "middle", "tail"}

    def test_single_word_docs_excluded(self, spark):
        d = docs(spark, [("solo", "en"), ("two words", "en")])
        out = C.bigram_lm_score(d).collect()
        assert [r.doc_id for r in out] == [1]

    def test_nll_value_exact(self, spark):
        # one doc "a b": V=2, c(a)=1, c("a b")=1 → nll = -ln(2/3)
        import math

        d = docs(spark, [("a b", "en")])
        r = C.bigram_lm_score(d).collect()[0]
        assert r.avg_nll == pytest.approx(round(-math.log(2 / 3), 6))


class TestChunkDocuments:
    def test_tiling_and_overlap(self, spark):
        # 10 words, chunk 4, stride 3 → starts 0,3,6,9: last chunk 1 word
        d = docs(spark, [("w0 w1 w2 w3 w4 w5 w6 w7 w8 w9", "en")])
        rows = sorted(
            C.chunk_documents(d, chunk_size=4, stride=3).collect(),
            key=lambda r: r.chunk_id,
        )
        assert [r.chunk_text for r in rows] == [
            "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9",
        ]
        assert [r.n_words for r in rows] == [4, 4, 4, 1]

    def test_every_word_covered_no_empty_chunks(self, spark):
        d = docs(spark, [("a b c d e f g", "en")])
        rows = C.chunk_documents(d, chunk_size=3, stride=3).collect()
        got = [w for r in sorted(rows, key=lambda r: r.chunk_id)
               for w in r.chunk_text.split()]
        assert got == list("abcdefg")  # exact tiling: no overlap, no gap
        assert all(r.n_words > 0 for r in rows)

    def test_empty_and_short_docs(self, spark):
        d = docs(spark, [("", "en"), ("   ", "en"), ("only", "en")])
        rows = C.chunk_documents(d, chunk_size=8, stride=8).collect()
        # empty/whitespace docs vanish; the 1-word doc is one chunk
        assert len(rows) == 1
        assert rows[0].chunk_text == "only" and rows[0].n_words == 1

    def test_arg_validation(self, spark):
        d = docs(spark, [("a", "en")])
        with pytest.raises(ValueError):
            C.chunk_documents(d, chunk_size=0)
        with pytest.raises(ValueError):
            C.chunk_documents(d, chunk_size=4, stride=5)
        with pytest.raises(ValueError):
            C.chunk_documents(d, chunk_size=4, stride=0)

    @pytest.mark.parametrize("n,chunk,stride", [
        (1, 4, 3), (3, 4, 4), (7, 4, 3), (12, 5, 2), (13, 13, 13),
        (20, 8, 5), (25, 4, 1),
    ])
    def test_coverage_invariants_sweep(self, spark, n, chunk, stride):
        """For any (n_words, chunk_size, stride): chunk ids are
        contiguous from 0, chunk i starts at word i*stride, every word
        is covered, and de-overlapping by stride reconstructs the doc."""
        text = " ".join(f"w{i}" for i in range(n))
        d = docs(spark, [(text, "en")])
        rows = sorted(
            C.chunk_documents(d, chunk_size=chunk, stride=stride).collect(),
            key=lambda r: r.chunk_id,
        )
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        rebuilt = []
        for r in rows:
            w = r.chunk_text.split()
            assert w[0] == f"w{r.chunk_id * stride}"
            assert len(w) == min(chunk, n - r.chunk_id * stride)
            rebuilt.extend(w if r.chunk_id == 0 else w[chunk - stride:])
        assert rebuilt == text.split()
