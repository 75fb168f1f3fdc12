"""Training-shard sink — the terminal step of the curation pipeline:
write a curated corpus as (split, shard)-partitioned parquet plus a
shard manifest, so a trainer's data loader can address shards directly
and audit token counts without scanning data.

Mirrors the serving-table design (sources/serving.py): deterministic
keyed-hash shards (stable under corpus growth and re-partitioning — a
doc never migrates between shards when the corpus is rebuilt), layout
parameters in a sidecar, provenance as a `_shard_manifest` parquet (the
runner.run_store pattern, reference cmd/storelinks/main.go:171-175).

Scale: the pre-shuffle on (split, shard) bounds writers per directory;
shard counts size directories (n_shards=4096 at 100 TB → ~25 GB per
shard, internally row-group-splittable). Token counts are computed once
in the write pass and stored per doc; the manifest aggregates them from
a column-pruned readback of the written files — (split, shard,
n_tokens) only — so the raw corpus is scanned and tokenized exactly
once per build (the pre-r13 manifest re-scanned + re-tokenized it).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from globallinks_spark.functions import hashing as H
from globallinks_spark.functions import text as TX

_META_FILE = "_shards_meta.json"
_MANIFEST_DIR = "_shard_manifest"
DEFAULT_SHARDS = 16
SHARD_SALT = "shard:"


def shard_of(doc_id: F.Column, n_shards: int = DEFAULT_SHARDS) -> F.Column:
    return (
        H.h60(F.concat(F.lit(SHARD_SALT), doc_id.cast("string")))
        % F.lit(n_shards)
    ).cast("int")


def write_training_shards(
    docs: DataFrame,
    path: str,
    *,
    n_shards: int = DEFAULT_SHARDS,
    split_col: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write ``docs`` (must carry ``split_col``) partitioned by
    (split, shard). Overwrite-mode → rerun-safe: a rebuild replaces the
    dataset atomically per partition tree, and shard membership is a
    pure function of ``id_col`` so reruns produce identical layouts.

    The `_shard_manifest` parquet records (split, shard, n_docs,
    n_tokens) from the same frame, and the layout sidecar records the
    shard count + salt so readers re-derive shard ids exactly.
    """
    # token counts are computed ONCE, in the same pass as the write
    # (r13, guide §2.3 "shuffle keys and metadata instead of payloads" /
    # §1.2.1 "don't recompute what you already have"): the old manifest
    # aggregation re-scanned + re-tokenized the whole corpus a second
    # time. The per-doc count is itself a useful shard artifact (a
    # trainer's loader can budget batches without touching text), costs
    # 8 bytes/row, and lets the manifest below aggregate from a
    # column-pruned readback of the files just written — (split, shard,
    # n_tokens) only, never the text.
    staged = docs.withColumn(
        "shard", shard_of(F.col(id_col), n_shards)
    ).withColumn(
        "n_tokens", TX.bpe_token_count(F.col(text_col)).cast("bigint")
    )
    (
        staged.repartition(F.col(split_col), F.col("shard"))
        .write.mode("overwrite")
        .partitionBy(split_col, "shard")
        .parquet(path)
    )
    spark = docs.sparkSession
    manifest = (
        spark.read.parquet(path)
        .groupBy(split_col, "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, _MANIFEST_DIR)
    )
    with open(os.path.join(path, _META_FILE), "w") as fh:
        json.dump(
            {"n_shards": n_shards, "salt": SHARD_SALT,
             "split_col": split_col},
            fh,
        )


def read_training_shards(
    spark: SparkSession, path: str, split: str | None = None
) -> DataFrame:
    """Read the shard dataset; ``split`` prunes to one partition
    subtree (a partition filter, not a scan-then-filter)."""
    df = spark.read.parquet(path)
    if split is not None:
        with open(os.path.join(path, _META_FILE)) as fh:
            split_col = json.load(fh)["split_col"]
        df = df.filter(F.col(split_col) == split)
    return df


def read_shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, _MANIFEST_DIR))
