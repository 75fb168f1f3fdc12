"""Training-shard sink: layout, manifest accuracy, rerun determinism,
and split-subtree pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from globallinks_spark.sources.corpus_sink import (
    read_shard_manifest,
    read_training_shards,
    write_training_shards,
)


@pytest.fixture(scope="module")
def shard_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards") / "corpus")
    docs = spark.createDataFrame(
        [
            (i, f"alpha beta doc number {i}",
             "train" if i % 10 < 8 else "val")
            for i in range(200)
        ],
        "doc_id long, text string, split string",
    )
    write_training_shards(docs, out, n_shards=4)
    return out


class TestWrite:
    def test_partition_tree_layout(self, shard_dir):
        splits = {
            d for d in os.listdir(shard_dir) if d.startswith("split=")
        }
        assert splits == {"split=train", "split=val"}
        shards = os.listdir(os.path.join(shard_dir, "split=train"))
        assert all(s.startswith("shard=") for s in shards)

    def test_manifest_matches_data(self, spark, shard_dir):
        data = (
            read_training_shards(spark, shard_dir)
            .groupBy("split", "shard")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        man = {
            (r.split, r.shard): (r.n_docs, r.n_tokens)
            for r in read_shard_manifest(spark, shard_dir).collect()
        }
        assert {(r.split, r.shard) for r in data} == set(man)
        for r in data:
            n_docs, n_tokens = man[(r.split, r.shard)]
            assert r.n == n_docs
            assert n_tokens >= n_docs * 4  # every doc has ≥4 tokens

    def test_rerun_identical_layout(self, spark, shard_dir, tmp_path):
        docs = read_training_shards(spark, shard_dir).select(
            "doc_id", "text", "split"
        )
        again = str(tmp_path / "again")
        write_training_shards(docs, again, n_shards=4)
        a = {(r.doc_id, r.split, r.shard) for r in
             read_training_shards(spark, shard_dir).collect()}
        b = {(r.doc_id, r.split, r.shard) for r in
             read_training_shards(spark, again).collect()}
        assert a == b

    def test_split_read_prunes_partitions(self, spark, shard_dir):
        df = read_training_shards(spark, shard_dir, split="val")
        assert df.count() == 40
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the split predicate must land in PartitionFilters, not a
        # post-scan Filter over both subtrees
        assert "PartitionFilters: [isnotnull(split" in plan \
            or "split#" not in plan.split("Scan parquet")[0]

    def test_doc_never_migrates_shards(self, spark, shard_dir):
        from globallinks_spark.sources.corpus_sink import shard_of

        df = read_training_shards(spark, shard_dir).select(
            "doc_id", "shard",
            shard_of(F.col("doc_id"), 4).alias("expect"),
        )
        assert df.filter(F.col("shard") != F.col("expect")).count() == 0


class TestOverwriteSemantics:
    def test_shrunk_corpus_leaves_no_stale_partitions(self, spark, tmp_path):
        """Overwrite must replace the whole partition tree: a rebuild
        from a corpus that lost its 'val' docs may not leave the old
        split=val subtree behind (dynamic partition overwrite would)."""
        out = str(tmp_path / "shrink")
        full = spark.createDataFrame(
            [(i, "text here", "train" if i < 8 else "val")
             for i in range(10)],
            "doc_id long, text string, split string",
        )
        write_training_shards(full, out, n_shards=2)
        assert os.path.isdir(os.path.join(out, "split=val"))
        train_only = full.filter("split = 'train'")
        write_training_shards(train_only, out, n_shards=2)
        assert not os.path.isdir(os.path.join(out, "split=val"))
        assert read_training_shards(spark, out).count() == 8
