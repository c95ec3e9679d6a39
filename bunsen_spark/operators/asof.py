"""As-of (most-recent-prior) join — a join family the reference lacks
entirely (SURVEY §2.3: "range/as-of joins: not implemented anywhere").

Implementation is the scalable union+window form, NOT a range join:

    left(keys, ts, payload) ∪ right(keys, ts, payload)
    → window per key ordered by (ts, side, …)
    → carry the nearest right ROW forward as one struct with
      last(..., ignoreNulls)
    → keep left rows

One shuffle on the key, zero join fan-out, and the state per key is a
single carried struct — this survives arbitrarily skewed key × time
distributions where a theta/range join explodes. Strict inequality
(right.ts < left.ts) is encoded purely in the sort order: left rows
sort BEFORE right rows at equal timestamps, so an equal-ts right row
is never visible to the left row's window frame.

The carried value is ONE struct of (right ts, payload...), so the
matched row is atomic: the tolerance gap test and every payload column
refer to the same right row — pandas ``merge_asof`` semantics. A null
payload VALUE in the nearest right row therefore stays null (it is not
skipped in favor of an older row's value).

Ties on (key, ts) within the right side must be pre-collapsed by the
caller (e.g. ``max_by`` a tiebreaker) for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..persist import materialize, materialize_eager


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    payload: list[str],
    strict: bool = True,
    direction: str = "backward",
    tolerance: int | float | None = None,
    time_bucket: int | float | None = None,
) -> DataFrame:
    """For each left row, attach the ``payload`` columns of the nearest
    right row with the same ``on`` keys — the latest prior one
    (``direction="backward"``, ``right.ts < left.ts``; ``<=`` when
    ``strict=False``) or the earliest following one
    (``direction="forward"``, ``right.ts > left.ts``). ``tolerance``
    bounds the time gap (same units as ``ts``): matches farther away
    yield nulls, pandas ``merge_asof``-style. Right payload columns
    must not collide with left column names; unmatched left rows keep
    nulls. Payload values come from the nearest right row itself —
    nulls in that row stay null (``merge_asof`` row semantics).

    Forward is backward on the reversed time axis: only the window's
    ts sort direction flips — same single shuffle, same O(1) state.

    ``time_bucket`` is the HOT-KEY GUARD: when set (same units as
    ``ts``), rows are windowed per ``(key, floor(ts / time_bucket))``
    instead of per key, so one pathological key no longer becomes one
    giant sort task — per-task input is bounded by the densest single
    bucket. Cross-bucket visibility is restored by a boundary stitch:
    the per-bucket final right match (a tiny ``(key, bucket)``
    aggregate) is carried across buckets with an exclusive window and
    joined back, and each left row coalesces its intra-bucket match
    with the carry-in. Strictness is unaffected — equal timestamps
    always share a bucket, so the tie-breaking sort order still sees
    them; carried matches are strictly earlier (later, for forward)
    buckets. Same results as the unbucketed path; costs one extra
    shuffle of the big frame plus two tiny summary jobs, which is the
    price of straggler-proofing a 50%-hot key at 100 TB."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    for c in payload + [ts]:
        if c in left.columns and c != ts:
            raise ValueError(f"payload column {c!r} collides with left side")
    rts = "__right_ts"
    # the matched right row travels as ONE nullable struct so the gap
    # test and the payload always describe the same row
    match_t = T.StructType(
        [T.StructField(rts, right.schema[ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(match_t).alias("__match"),
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(ts),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c != ts
        ],
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(ts).alias(rts), *[F.col(c) for c in payload]
        ).cast(match_t).alias("__match"),
    ).select(*lhs.columns)
    # strict: left sorts before right at equal ts, so the frame up to
    # the current row excludes same-ts right rows; non-strict reverses
    side_order = F.desc("__is_left") if strict else F.asc("__is_left")
    ts_order = F.asc(ts) if direction == "backward" else F.desc(ts)
    unioned = lhs.unionByName(rhs)
    if time_bucket is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            *[c for c in left.columns],
            "__is_left",
            F.last("__match", ignorenulls=True).over(w).alias("__match"),
        )
    else:
        # hot-key guard: window per (key, time bucket); requires a
        # numeric ts (epoch micros/millis — the engine convention)
        bkt = "__bkt"
        # consumed three times below (intra window, per-bucket summary,
        # carry key-set); materialize once so the input subplans are
        # not re-derived per consumer
        unioned = unioned.withColumn(
            bkt, F.floor(F.col(ts) / F.lit(time_bucket))
        ).transform(materialize_eager)
        wb = (
            Window.partitionBy(*on, bkt)
            .orderBy(ts_order, side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        intra = unioned.select(
            *[c for c in left.columns],
            "__is_left",
            bkt,
            F.last("__match", ignorenulls=True).over(wb).alias("__match"),
        )
        # per-bucket final right match: one row per (key, bucket) —
        # tiny relative to the data, safe to window per key
        pick = F.max_by if direction == "backward" else F.min_by
        summary = (
            unioned.where(F.col("__is_left") == 0)
            .groupBy(*on, bkt)
            .agg(pick("__match", F.col(ts)).alias("__bucket_final"))
        )
        # every (key, bucket) present on either side gets a carry-in:
        # the final match of the nearest preceding (following, for
        # forward) bucket — exclusive window, so strictly out-of-bucket
        bkt_order = F.asc(bkt) if direction == "backward" else F.desc(bkt)
        wc = (
            Window.partitionBy(*on)
            .orderBy(bkt_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            unioned.select(*on, bkt)
            .distinct()
            .join(summary, [*on, bkt], "left")
            .select(
                *on,
                bkt,
                F.last("__bucket_final", ignorenulls=True).over(wc).alias("__carry"),
            )
        )
        carried = (
            intra.join(carry, [*on, bkt], "left")
            .withColumn("__match", F.coalesce("__match", "__carry"))
            .drop("__carry", bkt)
        )
    out = carried.where(F.col("__is_left") == 1).drop("__is_left")
    match = F.col("__match")
    if tolerance is not None:
        gap = (
            F.col(ts) - match[rts]
            if direction == "backward"
            else match[rts] - F.col(ts)
        )
        match = F.when(match.isNotNull() & (gap <= tolerance), match)
    return out.select(
        *[c for c in left.columns],
        *[match[c].alias(c) for c in payload],
    )
