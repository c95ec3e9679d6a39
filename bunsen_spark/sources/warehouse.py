"""Warehouse layout utilities for cluster-scale joins.

Bucketing pre-shuffles a table ONCE at write time: two tables bucketed
by the same key into the same bucket count join with NO exchange on
either side (verified by the plan test — no ``Exchange`` under the
SortMergeJoin). At 100 TB this converts every recurring
resource-to-resource join (observations ⋈ patients on subject id,
lineitem ⋈ orders on orderkey) from a per-query 2-sided shuffle into a
zero-shuffle merge — the single biggest recurring-cost lever a
warehouse layout controls. Spark buckets require ``saveAsTable``
(metastore-backed), matching the reference's Hive-table warehouse
(SURVEY S9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    num_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    by ``bucket_key`` — repeat for every co-joined table with the SAME
    key and bucket count to get shuffle-free joins."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.format("parquet").mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def joins_without_shuffle(spark: SparkSession, left: str, right: str, on: list[str]) -> bool:
    """True when sort-merge-joining two (bucketed) tables on ``on``
    produces a plan with no Exchange — the bucketing layout is being
    exploited. The merge hint models the big-table case; at test scale
    the planner would otherwise pick a broadcast join (where bucketing
    is moot by design)."""
    j = spark.table(left).hint("merge").join(spark.table(right), on)
    plan = j._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
