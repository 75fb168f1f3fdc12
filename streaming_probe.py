"""Structured Streaming throughput probe.

The streaming operators (watermarked windowed aggregation,
within-watermark dedup, AvailableNow file replay) are
correctness-verified in the driver registry and pytest; this probe
puts MEASURED throughput numbers behind them on the current host:

1. **File replay** (the importer's streaming shape, ingest.py): the
   10× derived events table (1M rows, 10 parquet files) replayed
   through ``Trigger.AvailableNow`` with a fresh checkpoint —
   end-to-end rows/sec including micro-batch planning overhead, for
   (a) the watermarked tumbling-window aggregation and (b)
   ``dropDuplicatesWithinWatermark`` + count. This is the path a
   100 TB/day feed takes; state stays watermark-bounded by design
   (ingest.py docstrings).
2. **Rate-source sustained**: an in-memory rate source at a target
   rows/sec through the same windowed aggregation for ~12 s; the
   sustained ``processedRowsPerSecond`` (median over steady batches)
   and median batch duration come from the query's own progress
   telemetry — the micro-batch engine's sustained row rate on this
   host, independent of file I/O.

Host calibration rides along (bench_extract.host_calibration), same
as every perf artifact in this repo. Writes STREAMING_PROBE.json.
Usage: python streaming_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import tempfile
import time

from pyspark.sql import functions as F

from globallinks_spark.session import get_spark
from globallinks_spark.streaming.ingest import (
    dedup_event_counts,
    windowed_event_counts,
)

EVENTS_10X = "/tmp/sparklinks_sf10x/events.parquet"
EVENTS_BASE = "/root/testdata/sf0.1/events.parquet"
EVENTS_WARM = "/root/testdata/sf0.001/events.parquet"

_staged: list[str] = []


def _as_dir(src: str) -> str:
    """The file streaming source needs a DIRECTORY; testdata ships
    single-file tables. Stage a file into a temp dir (removed at
    exit); directories pass through."""
    if os.path.isdir(src):
        return src
    d = tempfile.mkdtemp(prefix="gl_stream_src_")
    shutil.copy(src, d)
    _staged.append(d)
    return d


def _replay(spark, src: str, builder, output_mode: str) -> dict:
    """One AvailableNow replay of ``src`` through ``builder(stream)``
    into a memory sink; returns rows/sec + batch telemetry."""
    src = _as_dir(src)
    schema = spark.read.parquet(src).schema
    n_rows = spark.read.parquet(src).count()
    work = tempfile.mkdtemp(prefix="gl_stream_probe_")
    name = f"probe_{abs(hash((src, output_mode))) % 10**8}"
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        # testdata ships ts as TIMESTAMP_NTZ in some generations (the
        # queries_base.load gotcha); watermarks need TIMESTAMP
        from pyspark.sql import types as T

        if isinstance(stream.schema["ts"].dataType, T.TimestampNTZType):
            stream = stream.withColumn(
                "ts", F.col("ts").cast("timestamp")
            )
        t0 = time.perf_counter()
        q = (
            builder(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batches = [
            p for p in (q.recentProgress or []) if p.get("numInputRows")
        ]
        return {
            "rows": n_rows,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n_rows / wall),
            "n_batches": len(batches),
            "out_rows": spark.table(name).count(),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _rate_sustained(spark, rows_per_sec: int, run_sec: float) -> dict:
    """Rate source at ``rows_per_sec`` through the windowed agg;
    sustained processedRowsPerSecond from progress telemetry."""
    work = tempfile.mkdtemp(prefix="gl_stream_rate_")
    try:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_sec)
            .option("numPartitions", 8)
            .load()
            .select(
                F.col("timestamp").alias("ts"),
                (F.col("value") % 5).cast("string").alias("event_type"),
                (F.col("value") % 1000).cast("double").alias("value"),
            )
        )
        q = (
            windowed_event_counts(src, window="1 second",
                                  watermark="2 seconds")
            .writeStream.format("memory")
            .queryName("rate_probe")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .start()
        )
        time.sleep(run_sec)
        progress = [dict(p) for p in (q.recentProgress or [])]
        q.stop()
        # steady batches: drop the first (stream start + codegen)
        rates = [
            p["processedRowsPerSecond"] for p in progress[1:]
            if p.get("numInputRows")
        ]
        durs = [
            p["durationMs"]["triggerExecution"] for p in progress[1:]
            if p.get("numInputRows")
        ]
        return {
            "target_rows_per_sec": rows_per_sec,
            "n_steady_batches": len(rates),
            "sustained_rows_per_sec": round(statistics.median(rates))
            if rates else None,
            "batch_ms_median": round(statistics.median(durs))
            if durs else None,
            "kept_up": bool(rates)
            and statistics.median(rates) >= 0.9 * rows_per_sec,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="streaming_probe")
    src = EVENTS_10X if os.path.exists(EVENTS_10X) else EVENTS_BASE

    # codegen warm: one tiny replay so the timed ones measure the
    # steady-state plan, not Janino/C2 (same policy as bench.py)
    _replay(spark, EVENTS_WARM,
            lambda s: windowed_event_counts(s, "1 hour"), "complete")

    out = {
        "metric": "streaming_throughput",
        "source": src,
        "window_agg_replay": _replay(
            spark, src, lambda s: windowed_event_counts(s, "1 hour"),
            "complete",
        ),
        "dedup_replay": _replay(
            spark, src, lambda s: dedup_event_counts(s), "update",
        ),
        "rate_sustained": [
            _rate_sustained(spark, rows_per_sec=500_000, run_sec=12.0),
            _rate_sustained(spark, rows_per_sec=2_000_000, run_sec=12.0),
        ],
        "note": (
            "file replay = AvailableNow over the 10x derived events "
            "(1M rows, 10 files), fresh checkpoint, memory sink, wall "
            "time includes micro-batch planning; rate_sustained = "
            "median processedRowsPerSecond from the query's own "
            "progress telemetry after the warm-up batch. State is "
            "watermark-bounded in both shapes (ingest.py)."
        ),
    }
    try:
        from bench_extract import host_calibration

        out["host"] = host_calibration(spark)
    except Exception as exc:
        print(f"# host calibration failed: {exc}")
    for d in _staged:
        shutil.rmtree(d, ignore_errors=True)
    with open("STREAMING_PROBE.json", "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("window_agg_replay", "dedup_replay",
                       "rate_sustained")}))
    spark.stop()


if __name__ == "__main__":
    main()
