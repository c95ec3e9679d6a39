"""Headline query registry.

Aggregates per-module ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> equivalent DuckDB SQL) dicts that
``__spark_entry__`` exposes to the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Some testdata generations write parquet TIMESTAMP(NANOS), which Spark
    # can only read as int64 epoch-nanos with this conf; other generations
    # write plain microsecond timestamps, where the conf is a no-op. The
    # driver's correctness gate builds its own SparkSession (not our session
    # factory), so the conf must be applied here, on whatever session we are
    # handed. It is runtime-settable. Query code must not assume either
    # representation — use ts_us() to get epoch-microseconds.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin the session timezone on whatever session we are handed, for
    # the same reason: ts_us() documents that the NTZ→TZ cast
    # reinterprets naive values as UTC. On a driver session inheriting
    # a non-UTC machine timezone, unix_micros(cast(ntz as timestamp))
    # would shift by the zone offset while DuckDB's epoch_us(ts) would
    # not — every events-based gate query would hash-mismatch.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_us(df: DataFrame, col: str = "ts"):
    """Epoch-microseconds Column for a timestamp column, regardless of how
    the parquet fixture encodes it: int64 epoch-nanos (nanosAsLong read of
    TIMESTAMP(NANOS)) or a real timestamp/timestamp_ntz (microsecond
    parquet). Matches DuckDB's ``epoch_us(ts)`` on the same files — the
    session timezone is pinned to UTC, so the NTZ→TZ cast reinterprets the
    naive value as UTC exactly like DuckDB's naive epoch."""
    from pyspark.sql import functions as F

    dt = df.schema[col].dataType.simpleString()
    if dt in ("bigint", "long"):
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # no ImportError swallowing: these modules depend only on pyspark +
    # stdlib, so a failure here is a bug that must surface, not a
    # missing optional dependency (silently dropping a module would
    # shrink the correctness gate by 20+ queries)
    from . import domain, pipeline, pipeline_extra, relational, tpch_extra

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(tpch_extra.QUERIES)
    out.update(pipeline.QUERIES)
    out.update(pipeline_extra.QUERIES)
    out.update(domain.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from . import domain, pipeline, pipeline_extra, relational, tpch_extra

    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(tpch_extra.ORACLES)
    out.update(pipeline.ORACLES)
    out.update(pipeline_extra.ORACLES)
    out.update(domain.ORACLES)
    return out
