"""Driver-side frame-CONSTRUCTION cost ledger (VERDICT r13 #6).

For each gate, times ``fn(spark, sf_dir)`` — the pure Python/py4j work
of building the DataFrame (expression construction, plan assembly, any
probe actions / eager materializations the operator runs before
returning) — WITHOUT the final collect. The bench pays this on every
run, so a gate spending >0.3 s here in an O(k) Column loop is a real
per-run tax (the r13 SimHash finding: 2.55 s of F.when chains).

Construction that launches Spark jobs (guard probes, eager barriers)
is genuine work, not py4j overhead; the ledger separates the two by
also reporting how many jobs ran during construction.

Usage:
    python tools/build_ledger.py [--sf-dir DIR] [--gates a,b,c] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--gates", default=None, help="comma list; default all")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from bunsen_spark.queries import all_queries
    from bunsen_spark.session import get_spark

    spark = get_spark("build_ledger")
    sc = spark.sparkContext
    qs = all_queries()
    names = args.gates.split(",") if args.gates else list(qs)

    # session warm-up: first py4j roundtrips + parquet footer read
    spark.range(1).count()
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    tracker = sc.statusTracker()
    rows: list[dict] = []
    for name in names:
        fn = qs[name]
        try:
            fn(spark, args.sf_dir)  # warm-up build (class loading, parse cache)
        except Exception as e:  # noqa: BLE001
            rows.append({"gate": name, "err": str(e)[:120]})
            continue
        samples = []
        jobs_before = len(tracker.getJobIdsForGroup(None))
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir)
            samples.append(time.perf_counter() - t0)
        jobs_after = len(tracker.getJobIdsForGroup(None))
        rows.append(
            {
                "gate": name,
                "build_s": round(min(samples), 3),
                "jobs_during_build": (jobs_after - jobs_before) // args.reps,
            }
        )
        import gc

        gc.collect()
    spark.stop()

    rows.sort(key=lambda r: -(r.get("build_s") or 0))
    for r in rows:
        if "err" in r:
            print(f"{r['gate']:45s} ERR {r['err']}")
        else:
            print(
                f"{r['gate']:45s} {r['build_s']:7.3f}s  "
                f"jobs/build={r['jobs_during_build']}"
            )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
