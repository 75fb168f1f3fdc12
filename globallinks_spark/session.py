"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the configs below are the
ones that survive a move to a 1000-executor cluster unchanged:

- AQE on (adaptive shuffle-partition coalescing + skew-join splitting) —
  link_domain-like keys are Zipfian (SURVEY §7.3 "Skew"), so skew handling
  is load-bearing at 100 TB, not a nicety.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE coalescing makes the static number a ceiling, not a target.
- Arrow enabled for the pandas-UDF path (the public-suffix UDF and the
  multimodal mapInPandas operators).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # local mode: the driver JVM hosts executors AND all cached/broadcast
    # state; the 1g default OOMs long test sessions. Applied only at JVM
    # launch (ignored on an existing session).
    "spark.driver.memory": "16g",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet writes of derived tables: zstd beats snappy on size at equal
    # scan speed for string-heavy link rows (SURVEY §4 X9).
    "spark.sql.parquet.compression.codec": "zstd",
    # Keep partition files big enough that a 100 TB table doesn't become
    # millions of tiny tasks, small enough to fit executor memory.
    "spark.sql.files.maxPartitionBytes": "256m",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.ui.enabled": "false",
    # -XX:-DontCompileHugeMethods: whole-stage-codegen'd methods under ANSI
    # mode (Spark 4 default) routinely exceed HotSpot's 8 KB bytecode JIT
    # ceiling — the extraction kernel's fused Project+Filter then runs as
    # INTERPRETED bytecode (measured 5× slower per row: 5.4 s → 1.2 s per
    # 1M URL-kernel rows). Spark's own spark.sql.codegen.hugeMethodLimit
    # (65535) only guards against Janino refusing to compile, not against
    # the JIT refusing to optimize the 8-64 KB middle ground. Must be set
    # at JVM launch; in local mode the driver JVM hosts the executors, and
    # on a real cluster the executor option carries the same fix.
    # -XX:ReservedCodeCacheSize=512m: the default 240 MB code cache fills
    # after a few thousand codegen stages (each WholeStageCodegen class is
    # JIT-compiled, and -XX:-DontCompileHugeMethods makes the compiled
    # blobs BIGGER) — when it fills, HotSpot disables the compiler and
    # every later stage runs interpreted. Measured in-process: the
    # extraction count-path is 2.2 s in a fresh JVM but 7.0 s when timed
    # after the 50-query catalog (~5,000 stages) with the default cache.
    # A long-lived production executor compiles far more than 5,000
    # stages, so the headroom is the realistic setting, not a bench tweak.
    "spark.driver.extraJavaOptions":
        "-Djava.net.preferIPv4Stack=true -XX:-DontCompileHugeMethods "
        "-XX:ReservedCodeCacheSize=512m",
    "spark.executor.extraJavaOptions":
        "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
}


def get_spark(
    app_name: str = "globallinks_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback ``*``)
    so the driver's bench harness controls parallelism. On a real cluster,
    pass ``master=None`` with a cluster manager already configured and this
    function only applies SQL-level configs.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus_s) if cpus_s.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
