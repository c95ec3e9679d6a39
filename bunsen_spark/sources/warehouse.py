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

from pyspark.sql import Column, DataFrame, SparkSession


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


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: str | list[str],
    num_files: int | None = None,
) -> None:
    """Write a globally range-ordered parquet layout: rows are
    range-partitioned on ``sort_cols`` (one contiguous, disjoint key
    range per output file) and sorted within each file.

    This is the scan-pruning complement to :func:`write_bucketed`
    (which optimizes joins): with disjoint per-file ranges, parquet
    footer min/max statistics let a point or range predicate on the
    sort key skip whole files and row groups, so a time-range query
    over a 100 TB event table touches only the files that overlap the
    range. ``repartitionByRange`` samples the key distribution, so
    files are balanced even under skew (hot keys split across files —
    the ranges stay disjoint but one key may span several files).
    """
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_ranges(spark: SparkSession, path: str, col: str) -> DataFrame:
    """(file, lo, hi, n) per physical parquet file — the audit query
    for range layouts: a correct :func:`write_range_sorted` output has
    pairwise-disjoint [lo, hi] intervals across files."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 8, rel_err: float = 0.001
) -> Column:
    """Z-order (Morton) value Column over numeric ``cols``: each
    column is quantile-bucketed into ``2^bits`` ranks (boundaries from
    one driver-side ``approxQuantile`` pass, so skewed distributions
    still fill all buckets), then the per-column bucket bits are
    interleaved. Sorting by this value clusters rows that are close in
    EVERY dimension."""
    from pyspark.sql import functions as F

    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    ndim = len(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * ndim > 63:
        # bit 63 is the long's sign bit: an interleaved bit landing
        # there makes those rows sort FIRST (negative z), silently
        # scattering each hyper-rectangle across distant files
        raise ValueError(
            f"bits*len(cols) = {bits * ndim} exceeds 63 — reduce bits "
            f"(e.g. {63 // ndim}) or the column count"
        )
    nb = 1 << bits
    probs = [i / nb for i in range(1, nb)]
    # one scan computes every column's cut list (list overload)
    all_cuts = df.stat.approxQuantile(list(cols), probs, rel_err)
    z: Column = F.lit(0).cast("long")
    for d, (c, cuts) in enumerate(zip(cols, all_cuts)):
        arr = F.array(*[F.lit(float(b)).cast("double") for b in cuts])
        bucket = F.size(
            F.filter(arr, lambda b: b <= F.col(c).cast("double"))
        ).cast("long")
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)), i * ndim + d
            )
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Write a multi-dimension scan-pruning parquet layout: rows are
    range-partitioned and sorted by their :func:`zorder_value`, so
    each file covers a small hyper-rectangle of the key space and
    parquet footer min/max statistics prune files for predicates on
    ANY of ``cols`` — the multi-column generalization of
    :func:`write_range_sorted`, which prunes only its leading sort
    key. The standard layout for a 100 TB event table queried by both
    time range and entity id."""
    z = zorder_value(df, cols, bits)
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.withColumn("__z", z)
        .repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
