"""Hot-key routing shared by the skew-guarded window operators.

One map-side-combined per-key count feeds a broadcast hot-key flag;
keys at or above the threshold take the guarded (bucketed) path, the
rest the plain single-window path. Because these operators are
independent per key, the union of the two routes is EXACT — routing
changes the plan, never the answer (tested per operator in
``tests/test_skew_guard.py``)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_hot_keys(
    df: DataFrame,
    keys: list[str],
    threshold: int,
    cold: Callable[[DataFrame], DataFrame],
    hot: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Apply ``cold`` to the sub-frame of keys with < ``threshold``
    rows and ``hot`` to the rest; union the results. The hot-key set is
    tiny by construction (≥ threshold rows each), so the flag join is a
    broadcast; NULL-keyed rows route cold (a NULL key never matches the
    flag join), which is correct — NULL groups cannot be hot in a
    meaningful per-entity sense and the plain path handles them."""
    hot_keys = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__kn"))
        .where(F.col("__kn") >= threshold)
        .select(*keys, F.lit(True).alias("__hot"))
    )
    tagged = df.join(F.broadcast(hot_keys), keys, "left")
    cold_out = cold(tagged.where(F.col("__hot").isNull()).drop("__hot"))
    hot_out = hot(tagged.where(F.col("__hot")).drop("__hot"))
    return cold_out.unionByName(hot_out)
