"""Measure the hot-key guard crossover for the bucketed sessionize /
prefix-sum twins (VERDICT r4 item 7).

The `time_bucket` guard costs ~2-4× on uniform data at sf0.1 (fixed
overhead: two extra tiny windows + one join). This script demonstrates
the regime it exists for: a skewed stream where ONE key holds half the
events, so the unbucketed form's single-key sort task is a straggler
holding 50% of the data. Prints plain-vs-bucketed medians for a
uniform and a 50%-hot-key frame of the same size; record the result in
PERF.md so users know when to set `time_bucket`.

Usage: python tools/bench_guard_crossover.py [n_rows]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from bunsen_spark.operators.sessionize import sessionize  # noqa: E402
from bunsen_spark.session import get_spark  # noqa: E402

GAP_US = 30 * 60 * 1_000_000
BUCKET_US = 6 * 3600 * 1_000_000  # 6h buckets
DAY_US = 86_400 * 1_000_000


def make_events(spark, n_rows: int, hot_frac: float):
    """n_rows events over ~30 days; `hot_frac` of rows on user 0, the
    rest uniform over 10k users. Deterministic (hash-derived jitter)."""
    base = spark.range(n_rows).withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("id"), 1_000_000) < int(hot_frac * 1_000_000),
            F.lit(0),
        ).otherwise(F.pmod(F.xxhash64("id", F.lit(1)), 10_000) + 1),
    )
    return base.select(
        "user_id",
        (F.pmod(F.xxhash64("id", F.lit(2)), 30 * DAY_US)).alias("us"),
    )


def run(df, time_bucket, hot_key_threshold=None):
    out = sessionize(
        df, ["user_id"], "us", GAP_US,
        time_bucket=time_bucket, hot_key_threshold=hot_key_threshold,
    )
    # consume sessions fully (count() alone would prune the windows on
    # the plain path? no — window exprs survive count, but be explicit)
    return out.agg(F.max("session_id"), F.count(F.lit(1))).collect()


def med3(fn) -> float:
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[1]


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("guard_crossover", shuffle_partitions=32)
    thr = max(n_rows // 100, 1000)  # "hot" = holds >=1% of all rows
    for label, hot in (("uniform", 0.0), ("50%-hot-key", 0.5)):
        df = make_events(spark, n_rows, hot).localCheckpoint()
        plain = med3(lambda: run(df, None))
        bucketed = med3(lambda: run(df, BUCKET_US))
        hot_only = med3(lambda: run(df, BUCKET_US, hot_key_threshold=thr))
        print(
            f"{label}: plain={plain:.2f}s all-bucketed={bucketed:.2f}s "
            f"hot-only-bucketed={hot_only:.2f}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
