"""Similarity search over embedding columns (array<float>).

Two tiers, same cosine kernel (functions/vectors.py):

- ``cosine_topk`` — brute-force scan against a broadcast query vector.
  The exact baseline: one pass, no shuffle (the global top-k is a
  TakeOrdered, not a sort).
- ``bucketed_topk`` / ``near_dup_pairs`` — sign-LSH bucketed variants:
  candidates share the query's bucket (or label partition), so the
  pairing cost is bounded per bucket instead of corpus-quadratic.
  Production swaps the deterministic coordinate-sign projection for a
  seeded random hyperplane matrix (broadcast); the plan shape — derive
  bucket, shuffle on it, compare within — is the scale path either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globallinks_spark.functions import vectors as V


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec`` (a plain Python
    list — it ships inside the plan as a literal array, the broadcast-
    variable analogue for a single vector)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        V.cosine(F.col(vec_col), q).alias("cos"),
    )
    # rank on rounded value + id so the cutoff is reproducible across
    # engines/runs; unrounded doubles can reorder at the 1e-15 level
    return (
        scored.withColumn("cosine", F.round("cos", 4))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", "cosine")
    )


def with_sign_bucket(
    embeddings: DataFrame, bits: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    return embeddings.withColumn("bucket", V.sign_bucket(F.col(vec_col), bits))


def bucketed_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: score only the query's sign-LSH bucket. Recall < 1 by design;
    the candidate set shrinks ~2^bits-fold."""
    qbucket = 0
    for i in range(bits):
        if query_vec[i] > 0:
            qbucket |= 1 << i
    cands = with_sign_bucket(embeddings, bits, vec_col).filter(
        F.col("bucket") == qbucket
    )
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def build_ivf_index(
    embeddings: DataFrame,
    n_cells: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], DataFrame]:
    """IVF (inverted-file) index: k-means cells + per-vector cell
    assignment.

    Deterministic by construction: centroids seed from an id-stride
    sample (not random), Lloyd iterations are fixed-count, and means are
    computed per-dimension with Spark aggregates. Centroids collect to
    the driver (n_cells × dim floats — parameters, not data) and ship
    back inside the plan as literals, the broadcast pattern for small
    model state.

    Returns (centroids, assigned) where assigned = embeddings + ``cell``.
    At 100 TB the assignment pass is one narrow scan per iteration; the
    per-cell mean is a groupBy on n_cells keys (tiny shuffle).
    """
    from globallinks_spark.functions.binding import bind_once

    dim = len(embeddings.select(vec_col).first()[0])

    def with_cell(df: DataFrame, cents: list[list[float]]) -> DataFrame:
        # one distance expression per cell collected into an array, cell =
        # argmin via array_position. A running-min when-chain would embed
        # the previous best twice per step — a 2^n_cells expression tree
        # that OOMs the driver during analysis before a single row moves.
        # (dot(v,v) is constant under argmin and omitted.)
        dists = F.array(*[
            F.lit(sum(x * x for x in c))
            - 2 * V.dot(
                F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])
            )
            for c in cents
        ])
        return (
            df.withColumn("_dists", bind_once(dists))
            .withColumn(
                "cell",
                (F.array_position(F.col("_dists"), F.array_min("_dists"))
                 - 1).cast("int"),
            )
            .drop("_dists")
        )

    # seed: evenly-strided sample by id order (deterministic)
    seeds = (
        embeddings.orderBy(id_col).limit(n_cells * 7)
        .collect()
    )
    centroids = [
        [float(x) for x in seeds[min(i * 7, len(seeds) - 1)][vec_col]]
        for i in range(min(n_cells, len(seeds)))
    ]

    for _ in range(iterations):
        assigned = with_cell(embeddings, centroids)
        means = assigned.groupBy("cell").agg(
            *[
                F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"d{i}")
                for i in range(dim)
            ]
        ).collect()
        by_cell = {r["cell"]: [r[f"d{i}"] for i in range(dim)] for r in means}
        centroids = [
            by_cell.get(ci, centroids[ci]) for ci in range(len(centroids))
        ]

    assigned = with_cell(embeddings, centroids)
    return centroids, assigned


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN search: score only vectors whose cell is among the
    ``n_probe`` centroids nearest the query. Recall/latency trades on
    n_probe; n_probe = n_cells degrades gracefully to brute force."""
    centroids, assigned = build_ivf_index(
        embeddings, n_cells, id_col=id_col, vec_col=vec_col
    )

    def d2(c: list[float]) -> float:
        return sum((a - b) * (a - b) for a, b in zip(query_vec, c))

    probe = sorted(range(len(centroids)), key=lambda ci: d2(centroids[ci]))
    cands = assigned.filter(F.col("cell").isin(*probe[:n_probe]))
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (doc_a < doc_b, cosine ≥
    threshold). Pairs are generated within ``partition_col`` groups
    (a label, a sign-LSH bucket, …) — the blocking key that keeps the
    self-join linear-ish; pass None for exact all-pairs on small inputs."""
    # norms are per-vector: compute once before the self-join instead of
    # per pair (cuts the fold work ~3× on an all-pairs block)
    cols = [
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        V.norm(F.col(vec_col)).alias("nrm"),
    ]
    if partition_col is not None:
        cols.append(F.col(partition_col).alias("p"))
    base = embeddings.select(*cols)
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if partition_col is not None:
        cond = cond & (F.col("a.p") == F.col("b.p"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("vec_a"),
            F.col("b.id").alias("vec_b"),
            (V.dot(F.col("a.v"), F.col("b.v"))
             / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cosine"))
    )
