"""Property tests for the round-3 operators, batched into single Spark
jobs over hypothesis-generated inputs (the test_jaccard_properties
pattern — a per-example Spark job would take minutes).

- span_dedup_rewrite equals a plain-Python replay of the
  first-occurrence removal rule over the SAME combined corpus (the
  semantics are global, so examples merge into one corpus rather than
  being namespaced).
- pack_sequences invariants hold on arbitrary corpora: exactly-once
  assignment, the next-fit overflow bound, shard-stride bin ids, and
  partitioning-independence.
- triangle_count equals the itertools brute force on random graphs.
"""

from __future__ import annotations

import itertools

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["a", "bb", "ccc", "dd", "e", "fff", "gg"])
_doc = st.lists(_word, min_size=0, max_size=14).map(" ".join)


def _gather(strategy, n):
    collected = []

    @settings(max_examples=n, deadline=None)
    @given(strategy)
    def g(x):
        collected.append(x)

    g()
    return collected


class TestSpanDedupMatchesBruteForce:
    N = 3  # 3-grams: duplicates actually occur in 14-word small-vocab docs

    def _brute(self, corpus, n):
        first = {}
        toks = {
            did: [t for t in text.lower().split() if t]
            for did, text in corpus
        }
        for did in sorted(toks):
            w = toks[did]
            for pos in range(max(len(w) - n + 1, 0)):
                first.setdefault(" ".join(w[pos:pos + n]), (did, pos))
        out = {}
        for did, w in toks.items():
            dup = [
                pos for pos in range(max(len(w) - n + 1, 0))
                if first[" ".join(w[pos:pos + n])] != (did, pos)
            ]
            mask = [
                any(s <= t <= s + n - 1 for s in dup) for t in range(len(w))
            ]
            kept = [w[t] for t in range(len(w)) if not mask[t]]
            out[did] = (len(w), len(w) - len(kept), " ".join(kept))
        return out

    def test_matches_brute_force(self, spark):
        from globallinks_spark.operators.corpus import span_dedup_rewrite

        docs = _gather(_doc, 60)
        corpus = list(enumerate(docs))
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_text)
            for r in span_dedup_rewrite(df, n=self.N).collect()
        }
        assert got == self._brute(corpus, self.N)


class TestPackSequencesInvariants:
    @pytest.fixture(scope="class")
    def packed(self, spark):
        from globallinks_spark.operators.packing import pack_sequences

        docs = _gather(_doc, 60)
        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        budget = 9
        rows = pack_sequences(df, budget=budget, n_shards=3).collect()
        rerows = pack_sequences(
            df.repartition(5), budget=budget, n_shards=3
        ).collect()
        return rows, rerows, budget, len(docs)

    def test_exactly_once(self, packed):
        rows, _, _, n = packed
        assert len(rows) == n
        assert len({r.doc_id for r in rows}) == n

    def test_overflow_bound(self, packed):
        rows, _, budget, _ = packed
        bins = {}
        for r in rows:
            bins.setdefault(r.bin_id, []).append(r.n_tokens)
        for toks in bins.values():
            assert sum(toks) - max(toks) < budget

    def test_bin_ids_carry_shard(self, packed):
        rows, _, _, _ = packed
        assert all(r.bin_id >> 32 == r.shard for r in rows)

    def test_partitioning_independent(self, packed):
        rows, rerows, _, _ = packed
        a = {(r.doc_id, r.bin_id) for r in rows}
        b = {(r.doc_id, r.bin_id) for r in rerows}
        assert a == b


_edge = st.tuples(
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=0, max_value=7),
)
_graph = st.lists(_edge, min_size=0, max_size=15)


class TestTriangleCountMatchesBruteForce:
    def _brute(self, edges):
        und = {
            (min(a, b), max(a, b)) for a, b in edges if a != b
        }
        counts = {}
        nodes = {n for e in und for n in e}
        for x, y, z in itertools.combinations(sorted(nodes), 3):
            if {(x, y), (y, z), (x, z)} <= und:
                for n in (x, y, z):
                    counts[n] = counts.get(n, 0) + 1
        return counts

    def test_matches_brute_force(self, spark):
        from globallinks_spark.operators.graph import triangle_count

        graphs = _gather(_graph, 40)
        # namespace graphs by node-id offset — triangles never span
        # graphs because edges never cross the offset gap
        rows, want = [], {}
        for gid, edges in enumerate(graphs):
            off = gid * 100
            rows += [(a + off, b + off) for a, b in edges]
            for n, c in self._brute(edges).items():
                want[n + off] = c
        if not rows:
            return
        df = spark.createDataFrame(rows, "src long, dst long")
        got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
        assert got == want
