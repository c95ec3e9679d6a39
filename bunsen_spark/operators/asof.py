"""As-of (most-recent-prior) join — a join family the reference lacks
entirely (SURVEY §2.3: "range/as-of joins: not implemented anywhere").

Implementation is the scalable union+window form, NOT a range join:

    left(keys, ts, payload) ∪ right(keys, ts, payload)
    → window per key ordered by (ts, side, …)
    → carry the right payload forward with last(..., ignoreNulls)
    → keep left rows

One shuffle on the key, zero join fan-out, and the state per key is a
single carried value — this survives arbitrarily skewed key × time
distributions where a theta/range join explodes. Strict inequality
(right.ts < left.ts) is encoded purely in the sort order: left rows
sort BEFORE right rows at equal timestamps, so an equal-ts right row
is never visible to the left row's window frame.

Ties on (key, ts) within the right side must be pre-collapsed by the
caller (e.g. ``max_by`` a tiebreaker) for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    payload: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the ``payload`` columns of the latest
    right row with the same ``on`` keys and ``right.ts < left.ts``
    (``<=`` when ``strict=False``). Right payload columns must not
    collide with left column names; unmatched left rows keep nulls."""
    for c in payload + [ts]:
        if c in left.columns and c != ts:
            raise ValueError(f"payload column {c!r} collides with left side")
    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
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
        *[F.col(c) for c in payload],
    ).select(*lhs.columns)
    # strict: left sorts before right at equal ts, so the frame up to
    # the current row excludes same-ts right rows; non-strict reverses
    side_order = F.desc("__is_left") if strict else F.asc("__is_left")
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc(ts), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        *[c for c in left.columns],
        "__is_left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return carried.where(F.col("__is_left") == 1).drop("__is_left")
