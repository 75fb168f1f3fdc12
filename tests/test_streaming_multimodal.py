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


class TestFrameSample:
    def _payload_df(self, spark, texts):
        from globallinks_spark.operators.multimodal import with_binary_payload

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        return with_binary_payload(docs)

    def test_fanout_respects_stride_and_cap(self, spark):
        from globallinks_spark.operators.multimodal import (
            FRAME_BYTES, frame_sample,
        )

        # 10 chunks → stride 2 samples chunks 0,2,4,6,8 (5 frames);
        # a 40-chunk doc caps at max_frames
        texts = ["x" * (FRAME_BYTES * 10), "y" * (FRAME_BYTES * 40), ""]
        out = frame_sample(
            self._payload_df(spark, texts), every_n=2, max_frames=8
        ).collect()
        per_doc = {}
        for r in out:
            per_doc.setdefault(r.doc_id, []).append(r)
        assert [r.frame_idx for r in sorted(
            per_doc[0], key=lambda r: r.frame_idx)] == [0, 2, 4, 6, 8]
        assert len(per_doc[1]) == 8
        assert 2 not in per_doc            # empty payload → no frames
        assert all(r.n_bytes == 256 for r in per_doc[0])
        assert all(r.ts_ms == r.frame_idx * 40 for r in out)

    def test_frame_payload_roundtrip(self, spark):
        from globallinks_spark.operators.multimodal import frame_sample

        out = frame_sample(
            self._payload_df(spark, ["abcd" * 100]), every_n=1
        ).collect()
        joined = b"".join(
            r.frame_payload
            for r in sorted(out, key=lambda r: r.frame_idx)
        )
        assert joined == b"abcd" * 100      # lossless demux (stride 1)

    def test_no_shuffle_in_plan(self, spark):
        from globallinks_spark.operators.multimodal import frame_sample

        df = frame_sample(self._payload_df(spark, ["z" * 600]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan       # partition-preserving fan-out


class TestResizeMeta:
    def test_aspect_preserving_fit(self, spark):
        from globallinks_spark.operators.multimodal import (
            resize_meta, with_binary_payload,
        )

        docs = spark.createDataFrame(
            [(1, "a" * 200), (2, "b" * 30)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in resize_meta(
            with_binary_payload(docs), 64, 64).collect()}
        for r in out.values():
            assert r.dst_w <= 64 and r.dst_h <= 64
            assert 0 < r.scale <= 1.0
            # aspect ratio preserved to integer truncation
            assert abs(r.dst_w - r.src_w * r.scale) < 1
            assert abs(r.dst_h - r.src_h * r.scale) < 1
