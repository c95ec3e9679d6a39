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


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    payload: list[str],
    strict: bool = True,
    direction: str = "backward",
    tolerance: int | float | None = None,
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
    ts sort direction flips — same single shuffle, same O(1) state."""
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
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        *[c for c in left.columns],
        "__is_left",
        F.last("__match", ignorenulls=True).over(w).alias("__match"),
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
