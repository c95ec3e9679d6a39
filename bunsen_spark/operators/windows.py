"""Running-aggregate windows with an opt-in hot-key guard.

``prefix_sum`` is the general distributed-prefix-sum companion to
:mod:`sessionize`'s flag-counting variant: the plain form is one
cumulative-sum window per key; with ``time_bucket`` set, the scan is
windowed per ``(key, floor(ts / time_bucket))`` and each bucket adds a
carried offset — the exclusive prefix of the per-bucket totals (a tiny
``(key, bucket)`` frame) — so one pathological key becomes many bounded
sort tasks instead of one. The value column must be exactly summable
(integers, longs, decimals — cast floats to ``decimal`` first), which
also makes the split mathematically exact: decimal/integer addition is
associative, so intra-bucket + carried prefix equals the global scan
bit-for-bit. (This is precisely why the guard does NOT offer plain
double sums — their non-associativity would make the bucketed result
differ in last-ulp from the unbucketed one.)

No reference counterpart (the reference has no window functions at
all; SURVEY §6) — beyond-reference operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .routing import route_hot_keys


def prefix_sum(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value: str | Column,
    order_cols: list[str] | None = None,
    time_bucket: int | float | None = None,
    out_col: str = "running",
    hot_key_threshold: int | None = None,
) -> DataFrame:
    """Append ``out_col``: the running total of ``value`` per ``keys``
    in ``(ts, *order_cols)`` order, inclusive of the current row.
    ``ts`` must be numeric when ``time_bucket`` is set (epoch micros by
    engine convention). ``value`` may be a column name or Column; it
    must be an exactly-summable type (see module docstring).
    ``hot_key_threshold`` (requires ``time_bucket``) routes only keys
    with ≥ threshold rows through the bucketed guard — same split as
    ``sessionize``; the per-key union is exact."""
    order_cols = order_cols or []
    val = F.col(value) if isinstance(value, str) else value
    if hot_key_threshold is not None:
        if time_bucket is None:
            raise ValueError("hot_key_threshold requires time_bucket")
        return route_hot_keys(
            df,
            keys,
            hot_key_threshold,
            lambda d: prefix_sum(d, keys, ts, value, order_cols, None, out_col),
            lambda d: prefix_sum(
                d, keys, ts, value, order_cols, time_bucket, out_col
            ),
        )
    if time_bucket is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(ts, *order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out_col, F.sum(val).over(w))

    bkt = "__bkt"
    bdf = df.withColumn(bkt, F.floor(F.col(ts) / F.lit(time_bucket))).withColumn(
        "__v", val
    )
    wb = (
        Window.partitionBy(*keys, bkt)
        .orderBy(ts, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-bucket totals → exclusive prefix across buckets (tiny frame)
    wprev = (
        Window.partitionBy(*keys)
        .orderBy(bkt)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bdf.groupBy(*keys, bkt)
        .agg(F.sum("__v").alias("__bkt_sum"))
        .select(*keys, bkt, F.sum("__bkt_sum").over(wprev).alias("__offset"))
    )
    return (
        bdf.join(offsets, [*keys, bkt], "left")
        .withColumn(
            out_col,
            F.sum("__v").over(wb) + F.coalesce(F.col("__offset"), F.lit(0)),
        )
        .drop(bkt, "__v", "__offset")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str = "rn",
    partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global ``row_number`` over a TOTAL order, without
    the single-partition global window (``WindowExec`` moves the whole
    table to one task — serial and OOM-prone at scale). Plan:

    1. ``repartitionByRange`` on the order columns (sampled range
       boundaries — rank is boundary-invariant, so sampling cannot
       change the result, only the balance);
    2. count rows per range partition — a tiny P-row table — and turn
       it into exclusive prefix offsets with a P² self-join (P =
       shuffle partitions; deliberately NOT a window, so no global
       window appears anywhere in the plan);
    3. per-partition ``row_number`` + broadcast offset.

    The range-tagged frame is materialized once: both consumers (the
    counts and the ranking) must see the SAME sampled boundaries.
    ``order_cols`` must be a total order (include a unique tiebreaker);
    ascending with NULLS FIRST, matching ``orderBy`` defaults.
    """
    from ..persist import materialize

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    rp = (
        df.repartitionByRange(partitions, *cols)
        if partitions is not None
        else df.repartitionByRange(*cols)
    )
    tagged = materialize(rp.withColumn("__pid", F.spark_partition_id()))
    counts = tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    earlier = counts.select(
        F.col("__pid").alias("__pid2"), F.col("__c").alias("__c2")
    )
    offsets = (
        counts.join(earlier, F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__c2"), F.lit(0)).alias("__off"))
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )


def ntile_from_rank(rank_col: str, total_col: str, n_bins: int) -> Column:
    """SQL-standard ``ntile`` bin computed ARITHMETICALLY from a
    1-based global rank column and a total-count column — with
    q = N div b and r = N mod b, the first r bins take q+1 rows:

        bin(k) = ceil(k / (q+1))             if k <= r·(q+1)
               = r + ceil((k - r·(q+1)) / q)  otherwise

    Integer ``div``-ceil throughout (no doubles). Combined with
    :func:`global_row_number` this reproduces a global ``ntile(b)
    OVER (ORDER BY ...)`` bit-for-bit without the single-partition
    window (used by ``engagement.rfm_segments`` and
    ``stats.equi_depth_histogram``; the DuckDB gates pin the identity
    on real data)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    q = f"({total_col} div {n_bins})"
    r = f"({total_col} - {q} * {n_bins})"
    takes = f"({r} * ({q} + 1))"
    return (
        F.when(
            F.expr(f"{rank_col} <= {takes}"),
            F.expr(f"({rank_col} + {q}) div ({q} + 1)"),
        )
        .otherwise(
            F.expr(
                f"{r} + ({rank_col} - {takes} + {q} - 1) div greatest({q}, 1)"
            )
        )
        .cast("long")
    )


def global_weighted_cumsum(
    df: DataFrame,
    order_cols: list[str | Column],
    weight: str | Column,
    out_col: str = "cumw",
    partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE global running total of ``weight`` in
    ``order_cols`` order, without a single-partition window — the same
    range-repartition + broadcast-offset shape as
    :func:`global_row_number`, with per-range-partition weight TOTALS
    as the offsets. ``weight`` must be exactly summable (integers /
    decimals): exact associativity is what makes the split equal the
    global scan bit-for-bit. The primitive behind exact distributed
    weighted quantiles / equi-mass binning."""
    from ..persist import materialize

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = F.col(weight) if isinstance(weight, str) else weight
    rp = (
        df.repartitionByRange(partitions, *cols)
        if partitions is not None
        else df.repartitionByRange(*cols)
    )
    tagged = materialize(
        rp.withColumn("__pid", F.spark_partition_id()).withColumn("__w", w)
    )
    counts = tagged.groupBy("__pid").agg(F.sum("__w").alias("__c"))
    earlier = counts.select(
        F.col("__pid").alias("__pid2"), F.col("__c").alias("__c2")
    )
    offsets = (
        counts.join(earlier, F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__c2"), F.lit(0)).alias("__off"))
    )
    win = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.sum("__w").over(win) + F.col("__off"))
        .drop("__pid", "__w", "__off")
    )


def global_rank_and_cumsum(
    df: DataFrame,
    order_cols: list[str | Column],
    weight: str | Column,
    rank_col: str = "rn",
    cum_col: str = "cum",
    partitions: int | None = None,
) -> DataFrame:
    """Both :func:`global_row_number` AND :func:`global_weighted_cumsum`
    in ONE range-repartition pass: exact 1-based global rank plus the
    INCLUSIVE running total of ``weight``, over the same total order.
    Consumers that need rank and prefix together (e.g. the water-filling
    budget allocator, which tests ``avail·(n-rank+1) <= budget-prefix``
    per row) would otherwise pay two range shuffles and two
    materializations of the same frame. Same contracts as the two
    single-output primitives: total order required, weight exactly
    summable."""
    from ..persist import materialize

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    wcol = F.col(weight) if isinstance(weight, str) else weight
    rp = (
        df.repartitionByRange(partitions, *cols)
        if partitions is not None
        else df.repartitionByRange(*cols)
    )
    tagged = materialize(
        rp.withColumn("__pid", F.spark_partition_id()).withColumn("__w", wcol)
    )
    counts = tagged.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__w").alias("__s")
    )
    earlier = counts.select(
        F.col("__pid").alias("__pid2"),
        F.col("__n").alias("__n2"),
        F.col("__s").alias("__s2"),
    )
    offsets = (
        counts.join(earlier, F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(
            F.coalesce(F.sum("__n2"), F.lit(0)).alias("__offn"),
            F.coalesce(F.sum("__s2"), F.lit(0)).alias("__offs"),
        )
    )
    wr = Window.partitionBy("__pid").orderBy(*cols)
    ws = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, F.row_number().over(wr) + F.col("__offn"))
        .withColumn(cum_col, F.sum("__w").over(ws) + F.col("__offs"))
        .drop("__pid", "__w", "__offn", "__offs")
    )
