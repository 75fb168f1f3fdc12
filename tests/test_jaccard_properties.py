"""Property test: the prefix/length/positional filters in
ngram_jaccard_pairs are LOSSLESS — its output equals a brute-force
all-pairs Jaccard computed in plain Python over the same shingle sets.

One Spark run over a batch of hypothesis-generated corpora (a per-example
Spark job would take minutes; the property is per-corpus, so batching
loses nothing)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from globallinks_spark.operators import dedup as D

# small vocabulary → heavy shingle sharing → the adversarial case for
# prefix filtering (boilerplate collisions, ties in document frequency)
_word = st.sampled_from(["a", "bb", "ccc", "dd", "e", "fff", "gg"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)


def _shingle_set(text: str, k: int = 3) -> set[str]:
    w = [x for x in text.lower().split() if x]
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _brute_force(corpus: list[str], t: float, k: int = 3):
    out = set()
    sets = {i: _shingle_set(d, k) for i, d in enumerate(corpus)}
    for i in sorted(sets):
        for j in sorted(sets):
            if i >= j or not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            jac = inter / (len(sets[i]) + len(sets[j]) - inter)
            if jac >= t:
                out.add((i, j, round(jac, 4)))
    return out


class TestPrefixFilterLossless:
    @pytest.fixture(scope="class")
    def corpora(self):
        collected = []

        @settings(max_examples=40, deadline=None)
        @given(_corpus)
        def gather(c):
            collected.append(c)

        gather()
        return collected

    def test_matches_brute_force_on_generated_corpora(self, spark, corpora):
        threshold = 0.5
        # one frame, docs namespaced per corpus via id offsets of 1000
        rows = [
            (cid * 1000 + i, doc)
            for cid, corpus in enumerate(corpora)
            for i, doc in enumerate(corpus)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D.ngram_jaccard_pairs(df, threshold=threshold).collect()
            # cross-corpus pairs can legitimately match (same vocab);
            # restrict the comparison to within-corpus pairs
            if r.doc_a // 1000 == r.doc_b // 1000
        }
        want = set()
        for cid, corpus in enumerate(corpora):
            for i, j, jac in _brute_force(corpus, threshold):
                want.add((cid * 1000 + i, cid * 1000 + j, jac))
        assert got == want
