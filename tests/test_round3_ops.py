"""Round-3 operators: semantic dedup, per-domain cap, sequence packing,
duplicate-span removal, inverted index, time-series gap fill.

Planted-fixture tests; each operator's corpus-scale hash check lives in
test_queries_oracle.py via the REGISTRY parametrization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globallinks_spark.operators import corpus as C
from globallinks_spark.operators.packing import domain_cap, pack_sequences
from globallinks_spark.operators.timeseries import gap_fill_hourly


class TestDomainCap:
    def test_cap_binds_and_is_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}", "en", f"src{i % 2}", 10) for i in range(40)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = domain_cap(docs, cap=5)
        rows = out.collect()
        assert len(rows) == 10  # 5 per source × 2 sources
        per_src = {}
        for r in rows:
            per_src.setdefault(r.source, []).append(r.cap_rank)
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_src.values())
        # deterministic: same result on a reshuffled input
        again = domain_cap(docs.repartition(7), cap=5)
        assert {r.doc_id for r in again.collect()} == {r.doc_id for r in rows}

    def test_small_domains_pass_through(self, spark):
        docs = spark.createDataFrame(
            [(1, "a", "en", "s", 1), (2, "b", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        assert domain_cap(docs, cap=10).count() == 2


class TestPackSequences:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def test_every_doc_assigned_exactly_once(self, spark):
        docs = self._docs(spark, [f"word{i} alpha beta" for i in range(50)])
        out = pack_sequences(docs, budget=10, n_shards=4).collect()
        assert len(out) == 50
        assert len({r.doc_id for r in out}) == 50

    def test_bin_overflow_bounded_by_one_doc(self, spark):
        """Next-fit-with-overflow contract: a bin's total may pass the
        budget only via its LAST-starting document."""
        docs = self._docs(spark, [f"tok{i} a b c d" for i in range(60)])
        out = pack_sequences(docs, budget=12, n_shards=2).collect()
        bins = {}
        for r in out:
            bins.setdefault(r.bin_id, []).append(r.n_tokens)
        for toks in bins.values():
            # remove any ONE doc and the bin fits the budget start
            assert sum(toks) - max(toks) < 12

    def test_oversized_doc_occupies_own_bin_start(self, spark):
        docs = self._docs(
            spark, ["short one", " ".join(["alpha"] * 50)]
        )
        out = {r.doc_id: r for r in pack_sequences(
            docs, budget=10, n_shards=1).collect()}
        assert out[1].n_tokens == 50
        # the giant doc starts its own bin unless it is first in order
        if out[0].bin_id == out[1].bin_id:
            # same bin only if the giant comes second and the short one
            # didn't fill the budget — allowed by next-fit; the giant
            # then spills past the budget alone
            assert out[0].n_tokens < 10

    def test_shards_partition_bins(self, spark):
        docs = self._docs(spark, [f"a b c doc{i}" for i in range(40)])
        out = pack_sequences(docs, budget=8, n_shards=4).collect()
        for r in out:
            assert r.bin_id >> 32 == r.shard


class TestSemanticDedup:
    def test_planted_twins_dropped_min_id_kept(self, spark):
        from globallinks_spark.operators.similarity import semantic_dedup

        # two tight clusters of 3 identical-direction vectors each, plus
        # lone vectors; identical directions ⇒ cosine 1 ≥ any threshold
        rows = []
        for i in range(3):
            rows.append((i, [1.0, 0.0, 0.0, float(i) * 1e-4]))
        for i in range(3, 6):
            rows.append((i, [0.0, 1.0, 0.0, float(i) * 1e-4]))
        rows.append((6, [0.0, 0.0, 1.0, 0.0]))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        out = {r.vec_id: r.keep for r in semantic_dedup(
            emb, threshold=0.99, n_cells=3).collect()}
        assert out[0] and out[3] and out[6]      # min-id keepers + loner
        assert not out[1] and not out[2]
        assert not out[4] and not out[5]

    def test_all_rows_present(self, spark):
        from globallinks_spark.operators.similarity import semantic_dedup

        emb = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
        out = semantic_dedup(emb, threshold=0.999999, n_cells=4)
        assert out.count() == 20


class TestSpanDedupRewrite:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )

    def test_cross_doc_span_removed_once(self, spark):
        span = "one two three four five six seven eight"
        docs = self._docs(spark, [
            f"intro {span} outro",
            f"prefix words here {span} suffix words here",
        ])
        out = {r.doc_id: r for r in C.span_dedup_rewrite(
            docs, n=8).collect()}
        # first occurrence keeps the span
        assert "one two three" in out[0].cleaned_text
        assert out[0].n_removed == 0
        # second occurrence loses exactly the span's 8 tokens
        assert "one" not in out[1].cleaned_text
        assert out[1].n_removed == 8
        assert out[1].cleaned_text == (
            "prefix words here suffix words here"
        )

    def test_within_doc_repeat_removed(self, spark):
        span = "a b c d e f g h"
        docs = self._docs(spark, [f"{span} filler {span}"])
        r = C.span_dedup_rewrite(docs, n=8).collect()[0]
        assert r.n_removed == 8
        assert r.cleaned_text == f"{span} filler"

    def test_unique_text_untouched(self, spark):
        docs = self._docs(spark, [
            " ".join(f"u{i}" for i in range(30)),
            " ".join(f"v{i}" for i in range(5)),  # shorter than n
        ])
        rows = {r.doc_id: r for r in C.span_dedup_rewrite(docs).collect()}
        assert rows[0].n_removed == 0 and rows[1].n_removed == 0
        assert rows[1].cleaned_text == " ".join(f"v{i}" for i in range(5))

    def test_overlapping_dup_spans_merge_coverage(self, spark):
        """Nine shared tokens = two overlapping dup 8-grams in the copy;
        removal must cover the union (9 tokens), not double-count."""
        span = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
        docs = self._docs(spark, [f"{span} taila", f"{span} tailb"])
        out = {r.doc_id: r for r in C.span_dedup_rewrite(
            docs, n=8).collect()}
        assert out[0].n_removed == 0
        assert out[1].n_removed == 9
        assert out[1].cleaned_text == "tailb"


class TestInvertedIndex:
    def test_postings_sorted_and_df_counted(self, spark):
        docs = spark.createDataFrame(
            [(3, "apple banana"), (1, "apple apple cherry"),
             (2, "banana apple")],
            "doc_id long, text string",
        )
        out = {r.term: r for r in C.inverted_index(
            docs, min_df=1, max_postings=10).collect()}
        assert out["apple"].df == 3          # per-doc distinct: df not tf
        assert out["apple"].postings == "1,2,3"
        assert out["banana"].postings == "2,3"
        assert out["cherry"].df == 1

    def test_min_df_drops_hapax(self, spark):
        docs = spark.createDataFrame(
            [(1, "common rare1"), (2, "common rare2")],
            "doc_id long, text string",
        )
        terms = {r.term for r in C.inverted_index(docs, min_df=2).collect()}
        assert terms == {"common"}

    def test_postings_capped(self, spark):
        docs = spark.createDataFrame(
            [(i, "everywhere") for i in range(30)],
            "doc_id long, text string",
        )
        r = C.inverted_index(docs, min_df=1, max_postings=5).collect()[0]
        assert r.df == 30
        assert r.postings == "0,1,2,3,4"


class TestGapFill:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )

    def test_gap_rows_synthesized_and_filled(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 10, 15)
        rows = [
            (1, t0, 7, 2.0),
            (2, t0 + dt.timedelta(minutes=20), 7, 3.0),   # same hour
            (3, t0 + dt.timedelta(hours=3), 7, 10.0),     # 2-hour gap
        ]
        out = sorted(
            gap_fill_hourly(self._events(spark, rows)).collect(),
            key=lambda r: r.hour,
        )
        assert len(out) == 4                      # hours 10,11,12,13
        assert out[0].n_events == 2 and out[0].hour_value == 5.0
        assert out[1].gap and out[1].n_events == 0
        assert out[1].filled_value == 5.0         # LOCF from hour 10
        assert out[2].gap and out[2].filled_value == 5.0
        assert not out[3].gap and out[3].filled_value == 10.0

    def test_per_user_grids_independent(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 0, 0)
        rows = [
            (1, t0, 1, 1.0),
            (2, t0 + dt.timedelta(hours=5), 1, 2.0),
            (3, t0 + dt.timedelta(hours=100), 2, 9.0),  # far-away user 2
        ]
        out = gap_fill_hourly(self._events(spark, rows))
        per_user = {r[0]: r[1] for r in
                    out.groupBy("user_id").count().collect()}
        assert per_user == {1: 6, 2: 1}  # user grids never cross-join


class TestTriangleCount:
    def test_planted_triangle_and_chain(self, spark):
        from globallinks_spark.operators.graph import triangle_count

        # triangle 1-2-3 plus a chain 3-4-5 (no triangle), a self-loop
        # and a duplicate/reversed edge that must collapse
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 5), (2, 1)],
            "src long, dst long",
        )
        out = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
        assert out == {1: 1, 2: 1, 3: 1}

    def test_two_triangles_sharing_edge(self, spark):
        from globallinks_spark.operators.graph import triangle_count

        # triangles (1,2,3) and (2,3,4) share edge 2-3
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)],
            "src long, dst long",
        )
        out = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
        assert out == {1: 1, 2: 2, 3: 2, 4: 1}


class TestBm25:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "spark shuffle join"),            # both query terms
                (2, "spark spark spark filler text"), # high tf one term
                (3, "unrelated words entirely here"),
                (4, "shuffle"),                       # short doc boost
            ],
            "doc_id long, text string",
        )

    def test_ranking_prefers_matching_docs(self, spark):
        from globallinks_spark.operators.corpus import bm25_topk

        out = bm25_topk(self._docs(spark), ["spark", "shuffle"], k=4)
        rows = out.collect()
        ids = [r.doc_id for r in rows]
        assert 3 not in ids                  # no query term, no row
        assert ids[0] == 1                   # both terms beat one term
        assert all(r.score > 0 for r in rows)

    def test_term_case_normalized(self, spark):
        from globallinks_spark.operators.corpus import bm25_topk

        out = bm25_topk(self._docs(spark), ["SPARK"], k=4).collect()
        assert {r.doc_id for r in out} == {1, 2}

    def test_k_limits_and_ties_break_on_id(self, spark):
        from globallinks_spark.operators.corpus import bm25_topk

        docs = spark.createDataFrame(
            [(i, "same text here") for i in range(5)],
            "doc_id long, text string",
        )
        out = bm25_topk(docs, ["same"], k=3).collect()
        assert [r.doc_id for r in out] == [0, 1, 2]   # equal scores → id


class TestArgumentGuards:
    def test_domain_cap_rejects_nonpositive(self, spark):
        docs = spark.createDataFrame([(1, "t", "s")],
                                     "doc_id long, text string, source string")
        with pytest.raises(ValueError, match="cap"):
            domain_cap(docs, cap=0)

    def test_pack_rejects_bad_budget_and_shards(self, spark):
        docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
        with pytest.raises(ValueError, match="budget"):
            pack_sequences(docs, budget=0)
        with pytest.raises(ValueError, match="n_shards"):
            pack_sequences(docs, n_shards=0)

    def test_bm25_rejects_empty_query(self, spark):
        docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
        with pytest.raises(ValueError, match="query_terms"):
            C.bm25_topk(docs, [])

    def test_frame_sample_rejects_bad_stride(self, spark):
        from globallinks_spark.operators.multimodal import frame_sample

        docs = spark.createDataFrame([(1, b"x")],
                                     "doc_id long, payload binary")
        with pytest.raises(ValueError, match="every_n"):
            frame_sample(docs, every_n=0)


class TestEventAnomaly:
    def test_spike_flagged_warmup_rows_null(self, spark):
        import datetime as dt

        from globallinks_spark.queries import FULL_REGISTRY

        q_event_anomaly = FULL_REGISTRY["event_anomaly"].fn

        # build a parquet events dir so the query's load() path works
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, t0 + dt.timedelta(minutes=i), 1, "click", 10.0 + (i % 3))
            for i in range(30)
        ]
        rows.append((99, t0 + dt.timedelta(minutes=99), 1, "click", 500.0))
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        import tempfile, os
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r.event_id: r for r in q_event_anomaly(spark, d).collect()}
        assert out[0].z is None          # no lookback yet
        assert out[99].anomaly and out[99].z > 2.5   # the planted spike
        normal = [r for i, r in out.items() if 2 < i < 30]
        assert all(not r.anomaly for r in normal)
