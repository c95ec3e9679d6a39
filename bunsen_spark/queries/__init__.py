"""Headline query registry.

Aggregates per-module ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLES`` (name -> equivalent DuckDB SQL) dicts that
``__spark_entry__`` exposes to the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The testdata fixtures write parquet TIMESTAMP(NANOS), which Spark can
    # only read as int64 epoch-nanos with this conf. The driver's correctness
    # gate builds its own SparkSession (not our session factory), so the conf
    # must be applied here, on whatever session we are handed. It is
    # runtime-settable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # no ImportError swallowing: these modules depend only on pyspark +
    # stdlib, so a failure here is a bug that must surface, not a
    # missing optional dependency (silently dropping a module would
    # shrink the correctness gate by 20+ queries)
    from . import domain, pipeline, relational

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(pipeline.QUERIES)
    out.update(domain.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from . import domain, pipeline, relational

    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(pipeline.ORACLES)
    out.update(domain.ORACLES)
    return out
