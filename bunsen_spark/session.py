"""SparkSession factory tuned for the local test harness.

On a real cluster these settings come from spark-submit / cluster conf;
everything here is also sane at 1000-executor scale (AQE on, adaptive
coalescing, Arrow for the pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bunsen_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the harness SparkSession.

    ``extra_conf`` lets tools (e.g. ``tools/profile_gate.py``'s event
    log) layer additive settings on top of the ONE shared conf set —
    never copy this builder's conf into another tool: a drifted copy
    silently breaks the bench parity those tools claim (ADVICE r13)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = str(shuffle_partitions or cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # the events table carries parquet TIMESTAMP(NANOS); Spark 4 has no
        # nanosecond timestamp type — read as epoch-nanos int64 instead
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
