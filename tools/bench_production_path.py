"""Production-path vs gate-path timing for the hash-family operators.

Several gates pin ``portable=True`` — the md5-derived 31-bit hash
family — solely so their DuckDB twins can reproduce every value
bit-for-bit. The DEPLOY path is ``portable=False``: Spark's native
``xxhash64`` (one JVM intrinsic per shingle instead of an md5 +
substring + conv chain), which no oracle can mirror. The committed
bench therefore slightly overstates what these operators cost in
production; this table keeps the record honest (VERDICT r11 #8).

Usage: python tools/bench_production_path.py [sf_dir] [reps]
Prints one JSON line per operator with both medians.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from pyspark.sql import functions as F

    from bunsen_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from bunsen_spark.operators.sketches import countmin_table, heavy_hitters
    from bunsen_spark.operators.text_analysis import fingerprint
    from bunsen_spark.queries import load
    from bunsen_spark.queries.pipeline_extra import CM_DEPTH, CM_WIDTH
    from bunsen_spark.queries.pipeline_r5 import HH_MIN_COUNT
    from bunsen_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("bench-production-path")
    docs = load(spark, sf_dir, "documents")
    events = load(spark, sf_dir, "events")

    # operator invocations mirror the gate parameters exactly — only
    # the hash family flips (gate pins portable=True for the oracle)
    cases = {
        "text_fingerprint": lambda p: fingerprint(docs, portable=p),
        "dedup_jaccard": lambda p: jaccard_pairs(docs, portable=p),
        "dedup_minhash_lsh": lambda p: minhash_lsh_pairs(docs, portable=p),
        "dedup_simhash": lambda p: simhash_pairs(docs, portable=p),
        "dedup_containment": lambda p: containment_pairs(
            docs, threshold=0.8, portable=p
        ),
        "countmin_user_frequencies": lambda p: countmin_table(
            events, "user_id", width=CM_WIDTH, depth=CM_DEPTH, portable=p
        ),
        "heavy_hitter_users": lambda p: heavy_hitters(
            events, "user_id", HH_MIN_COUNT, portable=p
        ),
    }

    for name, build in cases.items():
        rec = {"operator": name}
        rows = {}
        for label, p in (("gate_md5_s", True), ("prod_xxhash_s", False)):
            ts = []
            for _ in range(reps):
                t0 = time.time()
                out = build(p).collect()
                ts.append(round(time.time() - t0, 3))
            ts.sort()
            rec[label] = ts[len(ts) // 2]
            rec[label.replace("_s", "_all")] = ts
            rows[label] = len(out)
        rec["speedup"] = (
            round(rec["gate_md5_s"] / rec["prod_xxhash_s"], 2)
            if rec["prod_xxhash_s"]
            else None
        )
        # row counts may legitimately differ: different hash families
        # produce different LSH band collisions / sketch cells — record
        # both so the table is honest about WHAT differs
        rec["rows_gate"] = rows["gate_md5_s"]
        rec["rows_prod"] = rows["prod_xxhash_s"]
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
