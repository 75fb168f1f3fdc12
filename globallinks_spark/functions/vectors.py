"""Vector algebra over array<float> embedding columns — pure column
expressions (``zip_with`` + ``aggregate`` fold, JVM-side, no UDF).

Both engines fold left-to-right over the array, so double-precision
results agree to far beyond the 4-decimal rounding the queries apply.

At 100 TB the same expressions run unchanged; the scale lever is the
*pairing* strategy (see operators/similarity.py — sign-LSH bucketing
bounds the candidate set), not the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def norm_sql(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def sign_bucket(a: Column, bits: int = 8) -> Column:
    """Deterministic sign-LSH bucket: bit i set iff component i > 0.
    Coordinate axes stand in for random hyperplanes so the oracle can
    reproduce the bucket; production would broadcast a seeded random
    projection matrix — the operator shape is identical."""
    idx = F.sequence(F.lit(1), F.lit(bits))
    return _fold_sum(
        F.transform(
            idx,
            lambda i: F.when(
                F.element_at(a, i) > 0,
                F.pow(F.lit(2.0), i.cast("double") - 1),
            ).otherwise(F.lit(0.0)),
        )
    ).cast("int")


def sign_bucket_sql(a: str, bits: int = 8) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {bits} + 1), "
        f"i -> CASE WHEN {a}[i] > 0 THEN 2.0 ** (i - 1) ELSE 0.0 END)) "
        f"AS INT)"
    )


# ---------------------------------------------------------------------------
# Seeded random-hyperplane projection — the production sign-LSH (the
# coordinate-axis variant above is the oracle-friendly stand-in; this is
# the real thing). The matrix is a pure function of (seed, bits, dim), so
# both engines inline identical literals and the bucket is still fully
# oracle-checkable.

def projection_matrix(
    bits: int, dim: int, seed: int = 0x5EED
) -> list[list[float]]:
    """bits × dim hyperplane normals, deterministic from the seed.
    Box–Muller over a seeded LCG-free PRNG (python's random) rounded to
    6 decimals so the literal renders identically in Spark and SQL."""
    import random

    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)]
        for _ in range(bits)
    ]


def random_projection_bucket(
    a: Column, bits: int, dim: int, seed: int = 0x5EED
) -> Column:
    """LSH bucket from sign(h_j · v) over seeded random hyperplanes.
    bits × dim literals ride the plan (16 × 64 ≈ 1k — fine; for
    dim ≥ 512 broadcast the matrix and assign in a pandas batch instead,
    the _assign_cells pattern in operators/similarity.py)."""
    M = projection_matrix(bits, dim, seed)
    out = F.lit(0.0)
    for j, row in enumerate(M):
        h = F.array(*[F.lit(x) for x in row])
        out = out + F.when(
            dot(a, h) > 0, F.pow(F.lit(2.0), F.lit(float(j)))
        ).otherwise(F.lit(0.0))
    return out.cast("int")


def random_projection_bucket_sql(
    a: str, bits: int, dim: int, seed: int = 0x5EED
) -> str:
    M = projection_matrix(bits, dim, seed)
    terms = []
    for j, row in enumerate(M):
        lits = ", ".join(repr(x) for x in row)
        terms.append(
            f"CASE WHEN {dot_sql(a, f'[{lits}]')} > 0 "
            f"THEN 2.0 ** {j} ELSE 0.0 END"
        )
    return f"CAST(({' + '.join(terms)}) AS INT)"
