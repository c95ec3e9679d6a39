"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action (collect) so the full
plan runs; per-query wall time is reported, plus the total.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from bunsen_spark.queries import all_queries
    from bunsen_spark.session import get_spark

    spark = get_spark("bunsen_spark_bench")

    qs = all_queries()
    timings: dict[str, float] = {}
    # warm the session once: a trivial JVM job, the Python->JVM
    # createDataFrame bridge (first use costs seconds of class loading
    # — it was 90% of translate_order_priority's r1 outlier), and a
    # parquet footer read
    spark.range(1).count()
    spark.createDataFrame([(1, "warm")], "a int, b string").count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.collect()
            timings[name] = round(time.time() - t0, 3)
            print(f"# {name}: {timings[name]}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error in {name}: {e}", file=sys.stderr)
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
