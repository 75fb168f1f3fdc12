"""PageRank operator tests — hand-checkable graphs."""

from __future__ import annotations

import pytest

from globallinks_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


class TestPagerank:
    def test_star_graph_hubs_beat_leaves(self, spark):
        # everyone links to 0; 0 links to 1. The {0,1} cycle retains the
        # damped mass; 2-4 have no in-links and decay to (1-d)/n.
        edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]
        r = _ranks(spark, edges, iterations=10)
        assert min(r[0], r[1]) > 5 * r[2]
        assert r[2] == r[3] == r[4] == pytest.approx(0.03, abs=1e-6)

    def test_cycle_is_uniform(self, spark):
        edges = [(0, 1), (1, 2), (2, 0)]
        r = _ranks(spark, edges, iterations=20)
        assert r[0] == r[1] == r[2] == pytest.approx(1 / 3, abs=1e-6)

    def test_rank_mass_conserved_without_dangling(self, spark):
        # every node has an out-edge → total rank stays 1
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
        r = _ranks(spark, edges, iterations=5)
        assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)

    def test_duplicate_edges_collapse(self, spark):
        once = _ranks(spark, [(0, 1), (1, 0)], iterations=4)
        dup = _ranks(spark, [(0, 1), (0, 1), (1, 0)], iterations=4)
        assert once == dup


class TestClusteringCoefficient:
    def test_triangle_plus_pendant(self, spark):
        from globallinks_spark.operators.graph import clustering_coefficient

        # triangle 1-2-3; node 4 pendant off 3; node 3 has degree 3,
        # one triangle among its 3 possible neighbor pairs → 1/3
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
        )
        out = {r.node: r for r in clustering_coefficient(edges).collect()}
        assert out[1].coeff == 1.0 and out[2].coeff == 1.0
        assert out[3].degree == 3 and abs(out[3].coeff - 0.333333) < 1e-6
        assert out[4].degree == 1 and out[4].coeff == 0.0

    def test_triangle_free_graph_all_zero(self, spark):
        from globallinks_spark.operators.graph import clustering_coefficient

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
        out = clustering_coefficient(edges).collect()
        assert len(out) == 4
        assert all(r.coeff == 0.0 and r.n_triangles == 0 for r in out)
