"""Range (interval) join — with as-of joins, the second join family the
reference lacks (SURVEY §2.3 "range/as-of joins: not implemented").

A naive ``l.ts - W <= r.ts < l.ts`` condition forces Spark into a
broadcast-nested-loop or cartesian plan. The scalable form is
BUCKETING: quantize time into width-``W`` buckets, replicate the right
side into its own bucket and the NEXT one (every left row's window
spans at most those two), equi-join on (key, bucket), then refine with
the exact predicate. The join is hash-based with fan-out 2×|right|, no
nested loop — the same trick DuckDB/kdb apply natively for ASOF/range,
expressed in plain DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window: int,
) -> DataFrame:
    """Pairs (l, r) sharing ``on`` keys with ``l.left_ts - window <=
    r.right_ts < l.left_ts`` (strictly-prior rows within the window;
    timestamps are integers in any unit). Returns left columns + right
    columns (names must not collide apart from ``on``)."""
    bucket_l = (F.col(left_ts) / window).cast("long")
    bucket_r = (F.col(right_ts) / window).cast("long")
    l = left.withColumn("__b", bucket_l)
    r = right.withColumn(
        "__b", F.explode(F.array(bucket_r, bucket_r + 1))
    )
    joined = l.join(r, [*on, "__b"]).where(
        (F.col(right_ts) >= F.col(left_ts) - window)
        & (F.col(right_ts) < F.col(left_ts))
    )
    return joined.drop("__b")
