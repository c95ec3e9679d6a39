"""Batch sessionization (gap-based session ids) with an opt-in hot-key
guard.

The plain form is the classic two-window shape — ``lag`` per key to
flag session starts, then a cumulative sum of flags to number sessions:
one shuffle on the key, but one pathological key (a bot user holding
50% of the events) becomes one giant sort task.

``time_bucket`` turns the per-key prefix scan into a DISTRIBUTED prefix
sum over ``(key, floor(ts / time_bucket))`` groups:

1. per-bucket ``lag`` flags session starts locally;
2. a tiny ``(key, bucket)`` summary carries the previous bucket's max
   timestamp forward (exclusive window) so each bucket's FIRST row can
   test the cross-boundary gap;
3. per-bucket flag counts are prefix-summed across buckets (another
   tiny window) and joined back as each bucket's session-id offset.

Per-task input is bounded by the densest single bucket; the big frame
shuffles twice (bucket window + offset join) instead of once, and the
two summary frames are one row per (key, bucket). Same session ids as
the unbucketed scan — equal timestamps share a bucket, so the
``(ts, *order_cols)`` tie-break order is preserved.

No reference counterpart (the reference has no sessionization;
SURVEY §2.3) — beyond-reference operator shared by the batch gate query
and available standalone; the streaming twin is
``streaming/sessionize.py``'s ``applyInPandasWithState`` operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..persist import materialize, materialize_eager
from .routing import route_hot_keys


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap: int | float,
    order_cols: list[str] | None = None,
    time_bucket: int | float | None = None,
    session_col: str = "session_id",
    hot_key_threshold: int | None = None,
) -> DataFrame:
    """Append ``session_col``: a per-``keys`` session number (1-based,
    in time order) where a new session starts whenever the gap from
    the previous event exceeds ``gap``. ``ts`` must be numeric (epoch
    micros by engine convention); ``order_cols`` break timestamp ties
    deterministically. ``time_bucket`` (same units as ``ts``) bounds
    per-task input for skewed keys — see module docstring.

    ``hot_key_threshold`` (requires ``time_bucket``) confines the
    guard to the keys that need it: one map-side-combined per-key
    count feeds a broadcast hot-key flag, keys with ≥ threshold rows
    take the bucketed path, the rest the plain single-window path, and
    the union is exact (keys are independent). This removes the
    guard's fixed overhead from the cold majority — measured at 2M
    rows / 10k keys with one 50%-hot key: plain 4.6 s (straggler),
    all-bucketed 8-12 s, hot-only ~3.5 s (see PERF.md r5)."""
    order_cols = order_cols or []
    if hot_key_threshold is not None:
        if time_bucket is None:
            raise ValueError("hot_key_threshold requires time_bucket")
        return route_hot_keys(
            df,
            keys,
            hot_key_threshold,
            lambda d: sessionize(d, keys, ts, gap, order_cols, None, session_col),
            lambda d: sessionize(
                d, keys, ts, gap, order_cols, time_bucket, session_col
            ),
        )
    if time_bucket is None:
        w = Window.partitionBy(*keys).orderBy(ts, *order_cols)
        wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        prev = F.lag(ts).over(w)
        flagged = df.withColumn(
            "__is_new",
            F.when(F.col(ts) - prev > gap, 1).when(prev.isNull(), 1).otherwise(0),
        )
        return flagged.withColumn(session_col, F.sum("__is_new").over(wcum)).drop(
            "__is_new"
        )

    bkt = "__bkt"
    bdf = df.withColumn(bkt, F.floor(F.col(ts) / F.lit(time_bucket)))
    wb = Window.partitionBy(*keys, bkt).orderBy(ts, *order_cols)
    wb_cum = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # carry-in: max ts of the nearest preceding non-empty bucket
    # (one row per (key, bucket) — tiny)
    wprev = (
        Window.partitionBy(*keys)
        .orderBy(bkt)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_ts = (
        bdf.groupBy(*keys, bkt)
        .agg(F.max(ts).alias("__bkt_max_ts"))
        .select(*keys, bkt, F.last("__bkt_max_ts").over(wprev).alias("__prev_ts"))
        # consumed by BOTH flagged copies below; one row per (key,
        # bucket), so materializing is cheap and halves the agg+window
        .transform(materialize)
    )
    flagged = (
        bdf.join(prev_ts, [*keys, bkt], "left")
        .withColumn(
            "__prev",
            F.coalesce(F.lag(ts).over(wb), F.col("__prev_ts")),
        )
        .withColumn(
            "__is_new",
            F.when(F.col(ts) - F.col("__prev") > gap, 1)
            .when(F.col("__prev").isNull(), 1)
            .otherwise(0),
        )
        # consumed twice (offset aggregate + final join): without this,
        # the whole join+window subtree over the BIG frame runs twice —
        # measured 36 s vs 8 s at 2M rows / 1.2M (key, bucket) groups.
        # EAGER: the two consumers are independent AQE query stages that
        # can launch concurrently, and a lazy checkpoint's blocks only
        # exist after one full job computes them — concurrent first
        # touches each recompute the subtree (r13 measured this on the
        # signature tables), which eager materialization forecloses.
        .transform(materialize_eager)
    )
    # per-bucket session-start counts, prefix-summed EXCLUSIVELY across
    # buckets -> each bucket's session-id offset (tiny frame again)
    offsets = (
        flagged.groupBy(*keys, bkt)
        .agg(F.sum("__is_new").alias("__n_new"))
        .select(
            *keys,
            bkt,
            F.coalesce(F.sum("__n_new").over(wprev), F.lit(0)).alias("__offset"),
        )
    )
    return (
        flagged.join(offsets, [*keys, bkt], "left")
        .withColumn(
            session_col, (F.col("__offset") + F.sum("__is_new").over(wb_cum))
        )
        .drop(bkt, "__prev_ts", "__prev", "__is_new", "__offset")
    )
