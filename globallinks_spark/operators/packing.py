"""Corpus sampling and sequence-packing operators for training-data
assembly — the step between curation (dedup/quality) and the trainer's
data loader.

Brief-extension operators (the reference — a link-index engine, see
SURVEY.md §2 — stops at serving tables; a text-corpus pipeline also has
to CAP over-represented sources and PACK documents into token-budget
bins for efficient sequence batching):

- ``domain_cap``: at most N documents per source/domain, selected by a
  deterministic keyed hash — the Common-Crawl-pipeline defense against
  a handful of boilerplate-heavy domains dominating the corpus (C4 and
  RefinedWeb both apply per-domain limits).
- ``pack_sequences``: assign documents to token-budget bins (contiguous
  next-fit packing within hash shards) — the "sequence packing" step
  that turns a document set into fixed-budget training rows.

Scale notes (100 TB):
- domain_cap is a per-domain top-N: one shuffle on the domain key.
  Ranking uses a window, so a pathological mega-domain concentrates in
  one task. The standard two-phase escape hatch (count per domain,
  broadcast a per-domain hash threshold ≈ cap/n_docs of the hash range,
  pre-filter before ranking — the skew.salted_distinct shape) bounds
  the window's input to ~cap-proportional rows per domain and is the
  fix for a truly pathological domain; it is not wired in here because
  the output side is already cap-bounded and the extra count pass
  costs more than it saves below that regime.
- pack_sequences never builds a GLOBAL prefix sum (a single-partition
  sort at 100 TB). Packing runs independently inside ``n_shards``
  hash shards — the window partitions by shard, so the cumsum
  parallelizes across shards and bins never cross shard boundaries.
  Bin quality loses nothing: next-fit only needs SOME deterministic
  order, not a global one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from globallinks_spark.functions import hashing as H
from globallinks_spark.functions import text as TX


def domain_cap(
    docs: DataFrame,
    cap: int = 50,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per ``domain_col``, chosen by a
    deterministic keyed hash (NOT arrival order — stable under corpus
    growth and re-partitioning, the same contract as
    queries_ext.q_stratified_sample).

    Returns the input rows that survive, plus ``cap_rank`` (1-based
    rank within the domain) so callers can audit which slots were used.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    key = H.h60(
        F.concat(F.lit("cap:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(domain_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("cap_rank", F.row_number().over(w))
        .filter(F.col("cap_rank") <= cap)
    )


def domain_cap_sql(
    cap: int = 50,
    domain_col: str = "source",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    key = H.h60_sql(f"'cap:' || CAST({id_col} AS VARCHAR)")
    return f"""
SELECT * FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {domain_col} ORDER BY {key} ASC, {id_col} ASC
  ) AS cap_rank FROM {table}
) WHERE cap_rank <= {cap}
"""


# bins are numbered shard * _SHARD_STRIDE + local_bin so ids stay
# unique across shards without a second pass; 2^32 local bins per
# shard is unreachable (a shard would need ~2^32 * budget tokens)
_SHARD_STRIDE = 1 << 32


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a token-budget bin:
    (doc_id, n_tokens, shard, bin_id).

    Contiguous next-fit packing: documents are ordered by a keyed hash
    inside each of ``n_shards`` hash shards, and a document opens a new
    bin when the running total would pass ``budget``. Implemented as
    ``floor((cumsum - n_tokens) / budget)`` over the per-shard running
    sum — the document belongs to the bin its FIRST token lands in, so
    a bin may overrun by at most one document's tokens (next-fit with
    overflow, the standard streaming-packing trade; exact first-fit
    packing is inherently sequential and would serialize the corpus).

    Token counts use the BPE-ish regex tokenizer
    (functions/text.bpe_token_count); documents longer than ``budget``
    occupy one or more bins alone.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 0 < n_shards <= _SHARD_STRIDE:
        raise ValueError(f"n_shards out of range: {n_shards}")
    n_tok = TX.bpe_token_count(F.col(text_col)).cast("bigint")
    shard = H.h60(
        F.concat(F.lit("pack:"), F.col(id_col).cast("string"))
    ) % F.lit(n_shards)
    order = H.h60(
        F.concat(F.lit("packorder:"), F.col(id_col).cast("string"))
    )
    base = docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        shard.cast("int").alias("shard"),
        order.alias("__ord"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__ord").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    local_bin = F.floor((cum - F.col("n_tokens")) / F.lit(budget))
    return base.select(
        id_col,
        "n_tokens",
        "shard",
        (F.col("shard").cast("bigint") * F.lit(_SHARD_STRIDE) + local_bin)
        .alias("bin_id"),
    )


def pack_sequences_sql(
    budget: int = 2048,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    n_tok = TX.bpe_token_count_sql(text_col)
    key = f"'pack:' || CAST({id_col} AS VARCHAR)"
    okey = f"'packorder:' || CAST({id_col} AS VARCHAR)"
    shard = f"({H.h60_sql(key)} % {n_shards})"
    order = H.h60_sql(okey)
    return f"""
WITH base AS (
  SELECT {id_col},
         CAST({n_tok} AS BIGINT) AS n_tokens,
         CAST({shard} AS INTEGER) AS shard,
         {order} AS ord
  FROM {table}
), packed AS (
  SELECT {id_col}, n_tokens, shard,
         sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY ord ASC, {id_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM base
)
SELECT {id_col}, n_tokens, shard,
       CAST(shard AS BIGINT) * {_SHARD_STRIDE}
         + CAST(floor((cum - n_tokens) / {budget}) AS BIGINT) AS bin_id
FROM packed
"""


# ---------------------------------------------------------------------------
# Order-preserving sharding: the distributed global prefix sum.
#
# pack_sequences (above) hash-shards because next-fit packing only needs
# SOME deterministic order. When the corpus order is meaningful —
# curriculum schedules, time-ordered crawls, locality-preserving shards
# for sequential readers — the shard boundaries must follow the GLOBAL
# id order, which needs a global running sum of token counts. A naive
# `Window.orderBy(id)` with no partition key collapses the whole corpus
# into ONE task (Spark plans an Exchange SinglePartition) — the classic
# 100-TB scale killer. The standard fix is the two-phase distributed
# scan (Blelloch 1990, "Prefix Sums and Their Applications"):
#
#   1. bucket rows by an order-preserving key range
#      (bucket = id div bucket_width — id order ⇒ bucket order);
#   2. aggregate per-bucket token totals (tiny frame: n/bucket_width
#      rows), take the running sum over THAT frame — the only
#      single-partition window, over thousands of rows, not billions;
#   3. broadcast-join each bucket's exclusive offset back and finish
#      with a per-bucket window — fully parallel, one shuffle on the
#      bucket key.
#
# The oracle (ordered_token_shards_sql) states the same result as the
# naive single window — DuckDB runs at oracle scale where that is fine —
# so the driver hash-check proves the two-phase plan computes exactly
# the global cumsum it replaces.

def ordered_token_shards(
    docs: DataFrame,
    budget: int = 2_000,
    bucket_width: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to ≈``budget``-token shards IN GLOBAL ``id_col``
    ORDER: (shard_id, n_docs, total_tokens, first_doc, last_doc).

    A document belongs to the shard its first token lands in
    (``shard = floor(exclusive_prefix / budget)``), so shards are
    contiguous id ranges and may overrun by at most one document —
    the same next-fit contract as pack_sequences, but order-preserving.

    Sizing ``bucket_width`` at scale: the offsets frame has
    ``id_range / bucket_width`` rows and rides a broadcast join AND the
    one single-partition window, so pick bucket_width ≈ id_range / 10⁴
    … 10⁵ (e.g. 100k for a billion-doc corpus → 10k offset rows). The
    default (100) matches the test corpus; it is NOT a 100-TB default.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    idc = F.col(id_col).cast("bigint")
    base = docs.select(
        idc.alias(id_col),
        TX.bpe_token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
        (idc - (idc % F.lit(bucket_width))).alias("__bucket"),
    )
    # phase 2: per-bucket totals → running sum over the bucket frame.
    # The unpartitioned window here is over n/bucket_width rows — the
    # deliberate, bounded single task of the two-phase scan.
    wb = (
        Window.orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        base.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("__btok"))
        .select(
            "__bucket",
            (F.sum("__btok").over(wb) - F.col("__btok")).alias("__offset"),
        )
    )
    # phase 3: within-bucket cumsum + broadcast offset = global prefix
    wd = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixed = (
        base.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "__before",
            F.col("__offset")
            + F.sum("n_tokens").over(wd)
            - F.col("n_tokens"),
        )
    )
    return (
        prefixed.groupBy(
            F.floor(F.col("__before") / F.lit(budget)).alias("shard_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )


def ordered_token_shards_sql(
    budget: int = 2_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """The naive global-window statement of the same result (oracle
    scale only — see the module comment on why the engine side never
    plans this shape)."""
    n_tok = TX.bpe_token_count_sql(text_col)
    return f"""
WITH t AS (
  SELECT CAST({id_col} AS BIGINT) AS {id_col},
         CAST({n_tok} AS BIGINT) AS n_tokens
  FROM {table}
), c AS (
  SELECT {id_col}, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS before
  FROM t
)
SELECT CAST(floor(before / {budget}) AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min({id_col}) AS first_doc,
       max({id_col}) AS last_doc
FROM c GROUP BY 1
"""
