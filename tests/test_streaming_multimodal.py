"""Structured Streaming ingest (AvailableNow exactly-once) + windowed
aggregation vs its batch plan; multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globallinks_spark.operators.multimodal import (
    decode_image,
    extract_media_meta,
    with_binary_payload,
)
from globallinks_spark.queries import load
from globallinks_spark.streaming.ingest import (
    stream_ingest,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events re-materialized with micro-second timestamps (the raw file
    is TIMESTAMP(NANOS), unreadable by a plain streaming schema)."""
    p = tmp_path_factory.mktemp("stream") / "events"
    load(spark, SF_DIR, "events").write.parquet(str(p))
    return str(p)


class TestStreamingWindow:
    def test_stream_matches_batch(self, spark, events_dir, tmp_path_factory):
        batch_df = spark.read.parquet(events_dir)
        expected = {
            (r.win_start, r.event_type): (r.n_events, r.total_value)
            for r in windowed_event_counts(batch_df).collect()
        }

        stream = (
            spark.readStream.schema(batch_df.schema).parquet(events_dir)
        )
        agg = windowed_event_counts(stream)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory").queryName("win_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.win_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
        assert got == expected


class TestStreamIngest:
    def test_exactly_once_across_restarts(self, spark, events_dir, tmp_path_factory):
        base = tmp_path_factory.mktemp("ingest")
        ckpt, out = str(base / "ckpt"), str(base / "out")
        schema = spark.read.parquet(events_dir).schema

        stream_ingest(spark, events_dir, schema, ckpt, out)
        n1 = spark.read.parquet(out).count()
        # rerun with no new files: checkpoint must prevent reprocessing
        stream_ingest(spark, events_dir, schema, ckpt, out)
        n2 = spark.read.parquet(out).count()

        assert n1 == spark.read.parquet(events_dir).count()
        assert n2 == n1

    def test_incremental_pickup(self, spark, events_dir, tmp_path_factory):
        base = tmp_path_factory.mktemp("ingest2")
        src, ckpt, out = str(base / "src"), str(base / "ckpt"), str(base / "out")
        ev = spark.read.parquet(events_dir)
        schema = ev.schema
        ev.limit(100).write.mode("append").parquet(src)
        stream_ingest(spark, src, schema, ckpt, out)
        n1 = spark.read.parquet(out).count()
        ev.limit(250).write.mode("append").parquet(src)
        stream_ingest(spark, src, schema, ckpt, out)
        n2 = spark.read.parquet(out).count()
        assert n1 == 100
        assert n2 == 350  # only the new files were appended


class TestMultimodal:
    def test_meta_extraction(self, spark):
        df = with_binary_payload(
            spark.createDataFrame(
                [(1, "hello"), (2, "")], "doc_id long, text string"
            )
        )
        out = {r.doc_id: r for r in extract_media_meta(df).collect()}
        assert out[1].n_bytes == 5
        assert out[1].first_byte == ord("h")
        assert len(out[1].checksum_prefix) == 8
        assert out[2].n_bytes == 0
        assert out[2].first_byte == -1
        assert out[1].media_type == "image/fake"

    def test_decode_stub_raises(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG")

    def test_binary_column_type(self, spark):
        df = with_binary_payload(
            spark.createDataFrame([(1, "x")], "doc_id long, text string")
        )
        assert dict(df.dtypes)["payload"] == "binary"
