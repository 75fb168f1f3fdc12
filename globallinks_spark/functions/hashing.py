"""Cross-engine deterministic hashing — the foundation of the dedup family.

Everything downstream (minhash, simhash, LSH bands, fingerprints) needs a
hash both this engine and the DuckDB oracle compute bit-identically.
Neither engine's native 64-bit hash matches the other (Spark xxhash64 vs
DuckDB's internal hash), but both expose md5 of a UTF-8 string as hex, so:

    H60(s) = int64(first 15 hex chars of md5(s))       ∈ [0, 2^60)
    H30(s) = H60(s) mod 2^30                           ∈ [0, 2^30)

Spark:  conv(substr(md5(s),1,15),16,10) cast bigint
DuckDB: CAST('0x' || substr(md5(s),1,15) AS BIGINT)

Minhash uses the classic (a·h + b) mod p family over H30 with
p = 2^31-1; a,b < 2^30 keeps every product under 2^61 — no int64
overflow on either engine. Parameters are generated from a fixed seed so
the oracle SQL can inline the same constants.

md5 costs more than xxhash64 per call; at 100 TB call
``use_kernel("xxhash64")`` (or set ``GLOBALLINKS_HASH_KERNEL=xxhash64``)
once results no longer need to be replayed in a second engine. What IS
kernel-independent (collision probability aside): any operator that
compares hashed shingle SETS — exact n-gram Jaccard's output is
identical under either kernel because hashing only relabels set
elements. What is NOT: minhash/LSH *candidate generation*, which
depends on the permutation family over the kernel's values, so each
kernel may recall a (different) subset of the true pairs; verified
pairs under either kernel are always a subset of the exact ground
truth with identical Jaccard values. TestXxhashKernel pins exactly
these two statements, not blanket pair equality.
"""

from __future__ import annotations

import contextlib
import os
import random

from pyspark.sql import Column
from pyspark.sql import functions as F

_KERNELS = ("md5", "xxhash64")
_kernel = os.environ.get("GLOBALLINKS_HASH_KERNEL", "md5")
if _kernel not in _KERNELS:  # pragma: no cover - config error path
    raise ValueError(f"GLOBALLINKS_HASH_KERNEL must be one of {_KERNELS}")


def use_kernel(name: str) -> None:
    """Select the hash kernel: ``md5`` (cross-engine, oracle-replayable,
    the default) or ``xxhash64`` (JVM-native, ~3× cheaper per call — the
    production choice when no second engine needs to replay hashes)."""
    global _kernel
    if name not in _KERNELS:
        raise ValueError(f"kernel must be one of {_KERNELS}")
    _kernel = name


@contextlib.contextmanager
def kernel(name: str):
    """Scoped kernel override (tests / mixed pipelines)."""
    prev = _kernel
    use_kernel(name)
    try:
        yield
    finally:
        use_kernel(prev)

MERSENNE_31 = (1 << 31) - 1  # 2147483647
H30_MOD = 1 << 30

# 16 minhash permutations → 4 bands × 4 rows (LSH threshold ≈ (1/4)^(1/4) ≈ 0.71
# per-band, overall s-curve midpoint ≈ 0.55 — tuned for near-dup detection).
NUM_HASHES = 16
BAND_SIZE = 4
NUM_BANDS = NUM_HASHES // BAND_SIZE

_rng = random.Random(0x5EED)
MINHASH_PARAMS: tuple[tuple[int, int], ...] = tuple(
    (_rng.randrange(1, H30_MOD), _rng.randrange(0, H30_MOD))
    for _ in range(NUM_HASHES)
)


def _md5_h60(col: Column) -> Column:
    """The md5 H60 expression — the single definition both :func:`h60`'s
    md5 branch and :func:`md5_h30` build on (and that :func:`h60_sql`
    mirrors in DuckDB syntax). Keeping one copy means an adjustment here
    cannot silently desynchronize the checksum contract."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def h60(col: Column) -> Column:
    """60-bit hash of a string column (kernel-selected; see module doc).
    Both kernels land in [0, 2^60) so the minhash modular arithmetic
    stays overflow-free either way."""
    if _kernel == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(1 << 60))
    return _md5_h60(col)


def h30(col: Column) -> Column:
    """30-bit variant (safe for modular multiplication in int64)."""
    return h60(col) % F.lit(H30_MOD)


def md5_h30(col: Column) -> Column:
    """Kernel-INDEPENDENT H30 — always md5, regardless of
    :func:`use_kernel`. The checksum contract in queries_suites.py and
    any other cross-engine verification path must stay replayable in
    DuckDB (via :func:`h30_sql`, which is likewise md5-only) even when
    the production kernel is switched to xxhash64."""
    return _md5_h60(col) % F.lit(H30_MOD)


def h60_sql(expr: str) -> str:
    """DuckDB rendering of ``h60`` for oracle SQL."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def h30_sql(expr: str) -> str:
    return f"({h60_sql(expr)} % {H30_MOD})"


def minhash_expr(hashes_col: Column, j: int) -> Column:
    """j-th minhash of an array<bigint> of H30 shingle hashes."""
    a, b = MINHASH_PARAMS[j]
    return F.array_min(
        F.transform(
            hashes_col,
            lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_31),
        )
    )


def minhash_sql(hashes_expr: str, j: int) -> str:
    a, b = MINHASH_PARAMS[j]
    return (
        f"list_min(list_transform({hashes_expr}, "
        f"h -> ({a} * h + {b}) % {MERSENNE_31}))"
    )


def band_key(minhash_cols: list[Column]) -> Column:
    """Concatenated band key from one band's minhash columns."""
    return F.concat_ws(":", *[c.cast("string") for c in minhash_cols])
