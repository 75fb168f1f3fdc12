"""applyInPandasWithState operators: dedup and running totals across
micro-batches (state survives between batches, duplicates don't leak)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from globallinks_spark.streaming.stateful import (
    stream_first_seen,
    stream_running_totals,
)


def _run_two_batches(spark, tmp_path, build_query, rows1, rows2, schema):
    src = str(tmp_path / "src")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = build_query(stream)
    q.processAllAvailable()
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()


SCHEMA = "user_id bigint, event_id bigint, value double"


class TestStreamFirstSeen:
    def test_dedup_across_batches(self, spark, tmp_path):
        def build(stream):
            out = stream_first_seen(stream)
            return (
                out.writeStream.format("memory").queryName("fs_out")
                .outputMode("append").start()
            )

        _run_two_batches(
            spark, tmp_path, build,
            rows1=[(1, 10, 1.0), (1, 11, 2.0), (2, 20, 3.0)],
            rows2=[(1, 12, 4.0), (3, 30, 5.0)],
            schema=SCHEMA,
        )
        rows = spark.sql("SELECT * FROM fs_out").collect()
        by_user = {r.user_id: r for r in rows}
        assert set(by_user) == {1, 2, 3}
        assert len(rows) == 3          # user 1's batch-2 row swallowed
        assert by_user[1].event_id == 10


class TestRunningTotals:
    def test_totals_accumulate(self, spark, tmp_path):
        def build(stream):
            out = stream_running_totals(stream)
            return (
                out.writeStream.format("memory").queryName("rt_out")
                .outputMode("append").start()
            )

        _run_two_batches(
            spark, tmp_path, build,
            rows1=[(1, 10, 1.0), (1, 11, 2.0)],
            rows2=[(1, 12, 4.0), (2, 20, 7.5)],
            schema=SCHEMA,
        )
        rows = spark.sql("SELECT * FROM rt_out ORDER BY key, n_events").collect()
        u1 = [r for r in rows if r.key == 1]
        assert [(r.n_events, r.total_value) for r in u1] == [(2, 3.0), (3, 7.0)]
        u2 = [r for r in rows if r.key == 2]
        assert [(r.n_events, r.total_value) for r in u2] == [(1, 7.5)]


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class TestRunningTotalsTws:
    @pytest.mark.skipif(
        not _protobuf_available(),
        reason="transformWithState's state protocol needs google.protobuf,"
               " not functional in this container; the operator is gated"
               " and applyInPandasWithState remains the tested path",
    )
    def test_parity_with_group_state_form(self, spark, tmp_path):
        """transformWithState (Spark 4 API) must produce the same rows
        as the applyInPandasWithState form on the same two-batch stream.
        TWS requires the RocksDB state store provider."""
        from globallinks_spark.streaming.stateful import (
            stream_running_totals_tws,
        )

        prev = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            def build(stream):
                out = stream_running_totals_tws(stream)
                return (
                    out.writeStream.format("memory").queryName("tws_out")
                    .outputMode("append").start()
                )

            _run_two_batches(
                spark, tmp_path, build,
                rows1=[(1, 10, 1.0), (1, 11, 2.0)],
                rows2=[(1, 12, 4.0), (2, 20, 7.5)],
                schema=SCHEMA,
            )
            rows = spark.sql(
                "SELECT * FROM tws_out ORDER BY key, n_events"
            ).collect()
            u1 = [(r.n_events, r.total_value) for r in rows if r.key == 1]
            u2 = [(r.n_events, r.total_value) for r in rows if r.key == 2]
            assert u1 == [(2, 3.0), (3, 7.0)]
            assert u2 == [(1, 7.5)]
        finally:
            if prev is not None:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
            else:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )


class TestDedupEventCounts:
    """dedup_event_counts: exactly-once counting under redelivery, in
    both the streaming (dropDuplicatesWithinWatermark) and batch forms."""

    DD_SCHEMA = "event_id bigint, ts timestamp, event_type string"

    def _rows(self):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        return [
            (1, t0, "click"),
            (2, t0 + dt.timedelta(minutes=1), "click"),
            (3, t0 + dt.timedelta(minutes=2), "view"),
        ]

    def test_streaming_redelivery_dropped(self, spark, tmp_path):
        from globallinks_spark.streaming.ingest import dedup_event_counts

        def build(stream):
            out = dedup_event_counts(stream, watermark="2 hours")
            return (
                out.writeStream.format("memory").queryName("dd_out")
                .outputMode("complete").start()
            )

        # batch 2 redelivers every batch-1 event and adds one new one
        rows = self._rows()
        import datetime as dt

        _run_two_batches(
            spark, tmp_path, build,
            rows1=rows,
            rows2=rows + [(4, rows[-1][1] + dt.timedelta(minutes=3), "view")],
            schema=self.DD_SCHEMA,
        )
        got = {
            r.event_type: r.n_events
            for r in spark.sql("SELECT * FROM dd_out").collect()
        }
        assert got == {"click": 2, "view": 2}

    def test_batch_form_matches_distinct(self, spark):
        from globallinks_spark.streaming.ingest import dedup_event_counts

        df = spark.createDataFrame(self._rows() * 3, self.DD_SCHEMA)
        got = {
            r.event_type: r.n_events
            for r in dedup_event_counts(df).collect()
        }
        assert got == {"click": 2, "view": 1}


class TestStreamStreamJoin:
    """purchase_click_pairs as a REAL stream-stream interval join:
    one file-source stream split into purchase/click sides inside the
    operator, run to completion, pinned against the batch plan."""

    SCHEMA = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )

    def _rows(self):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        s = dt.timedelta(seconds=1)
        return [
            # user 1: two clicks inside the 600 s window, one outside
            (1, t0 - 700 * s, 1, "click", 5.0),
            (2, t0 - 300 * s, 1, "click", 7.0),
            (3, t0 - 10 * s, 1, "click", 9.0),
            (4, t0, 1, "purchase", 100.0),
            # user 2: a click AFTER the purchase must not match
            (5, t0 + 60 * s, 2, "click", 1.0),
            (6, t0, 2, "purchase", 50.0),
            # noise types are ignored
            (7, t0 - 5 * s, 1, "view", 2.0),
        ]

    def test_streaming_matches_batch(self, spark, tmp_path):
        from globallinks_spark.streaming.join import purchase_click_pairs

        src = str(tmp_path / "events_src")
        batch_df = spark.createDataFrame(self._rows(), self.SCHEMA)
        batch_df.coalesce(1).write.parquet(src)

        stream = spark.readStream.schema(self.SCHEMA).parquet(src)
        out = purchase_click_pairs(stream)
        q = (
            out.writeStream.format("memory").queryName("ssj_out")
            .outputMode("append").start()
        )
        q.processAllAvailable()
        q.stop()

        got = {
            (r.purchase_id, r.c_value)
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        }
        want = {
            (r.purchase_id, r.c_value)
            for r in purchase_click_pairs(batch_df).collect()
        }
        assert got == want
        assert got == {(4, 7.0), (4, 9.0)}   # in-window clicks only

    def test_attribution_rollup_keeps_clickless_purchases(self, spark):
        from globallinks_spark.streaming.join import purchase_attribution

        batch_df = spark.createDataFrame(self._rows(), self.SCHEMA)
        rows = {r.purchase_id: r for r in
                purchase_attribution(batch_df).collect()}
        assert rows[4].n_clicks == 2 and rows[4].click_value == 16.0
        assert rows[6].n_clicks == 0 and rows[6].click_value == 0.0


class TestStreamingSessionWindow:
    """F.session_window on a watermarked stream — the native streaming
    sessionization — emits the same closed sessions the batch plan
    computes."""

    SCHEMA = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )

    def test_streaming_sessions_match_batch(self, spark, tmp_path):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
        m = dt.timedelta(minutes=1)
        rows = [
            (1, t0, 1, "click", 1.0),
            (2, t0 + 10 * m, 1, "click", 2.0),     # same session (gap 10m)
            (3, t0 + 60 * m, 1, "click", 4.0),     # new session (gap 50m)
            (4, t0, 2, "view", 8.0),
        ]
        src = str(tmp_path / "sess_src")
        spark.createDataFrame(rows, self.SCHEMA).coalesce(1).write.parquet(src)

        def sessions(df):
            sw = F.session_window("ts", "30 minutes")
            src_df = df
            if df.isStreaming:
                src_df = df.withWatermark("ts", "0 seconds")
            return (
                src_df.groupBy("user_id", sw.alias("sw"))
                .agg(F.count("*").alias("n"),
                     F.sum("value").alias("v"))
                .select("user_id", F.col("sw.start").alias("start"), "n", "v")
            )

        stream = spark.readStream.schema(self.SCHEMA).parquet(src)
        q = (
            sessions(stream).writeStream.format("memory")
            .queryName("sess_out").outputMode("append").start()
        )
        q.processAllAvailable()
        q.stop()
        got = {(r.user_id, r.start, r.n, r.v)
               for r in spark.sql("SELECT * FROM sess_out").collect()}
        batch = {(r.user_id, r.start, r.n, r.v)
                 for r in sessions(
                     spark.createDataFrame(rows, self.SCHEMA)).collect()}
        # append mode only emits sessions the watermark has CLOSED: the
        # max event time seen is t0+60m, so user 1's last session (start
        # t0+60m) is still open — everything emitted must match batch,
        # and the closed sessions must all be there
        assert got <= batch
        assert ((1, t0, 2, 3.0)) in got
        assert ((2, t0, 1, 8.0)) in got
