"""SparkSession factory with scale-appropriate defaults.

Mirrors DataX's Engine.start() environment binding (reference:
core/src/main/java/com/alibaba/datax/core/Engine.java:169-238 — ColumnCast.bind
timezone/encoding defaults) — we pin UTC and Arrow batching once, centrally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datax-spark-cdc",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the CDC/ingest workload.

    ``parallelism``: local core count (``local[N]``); None = ``local[*]`` or
    whatever master the environment provides. On a real cluster this function
    is a no-op passthrough for master — all other settings still apply.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic oracle comparison: UTC everywhere (duckdb is UTC-naive)
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime coalescing + skew-join splitting; essential at 100 TB
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow: the only sanctioned Python<->JVM path (no per-row Python UDFs)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # keep partition sizes bounded for wide binary (html) columns
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus or 32))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
