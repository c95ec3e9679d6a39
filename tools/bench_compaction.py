"""Measure the IVF-PQ delete lifecycle's steady-state claim: persisted
-index search latency with accumulated tombstone batches vs after
``compact_ivfpq_index`` folds them, plus the one-off compaction cost.

The delete path's contract (``operators/similarity.py``): tombstones
make erasure immediate at the price of an anti-join per search that
grows with accumulated deletes; compaction folds them into a new base
codes generation so searches return to the no-anti-join steady state.
This script produces the PERF.md evidence for that trade.

Usage: python tools/bench_compaction.py [sf_dir] [n_delete_batches]
Prints one JSON line per step.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from bunsen_spark.operators.similarity import (
        append_ivfpq_index,
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        ivfpq_index_topk,
        write_ivfpq_index,
    )
    from bunsen_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    spark = get_spark("bench-compaction")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = "/tmp/bunsen_compact_bench"
    shutil.rmtree(path, ignore_errors=True)

    t0 = time.time()
    write_ivfpq_index(emb.where("vec_id % 5 < 4"), path)
    append_ivfpq_index(emb.where("vec_id % 5 >= 4"), path)
    print(json.dumps({"step": "build+append", "sec": round(time.time() - t0, 3)}))

    queries = emb.where("vec_id < 32")

    def search():
        return ivfpq_index_topk(spark, path, queries, k=5).collect()

    def timed(tag, fn, n=3, extra=None):
        ts = []
        out = None
        for _ in range(n):
            t1 = time.time()
            out = fn()
            ts.append(time.time() - t1)
        ts.sort()
        rec = {"step": tag, "sec": round(ts[len(ts) // 2], 3),
               "all": [round(t, 3) for t in ts]}
        if extra:
            rec.update(extra)
        print(json.dumps(rec))
        return out

    base_rows = sorted(map(tuple, timed("search_no_tombstones", search)))

    # accumulate distinct delete batches — each lands on its own
    # content-derived partition (~n_batches/97 of the corpus total)
    t0 = time.time()
    for r in range(n_batches):
        delete_from_ivfpq_index(emb.where(f"vec_id % 97 = {r}"), path)
    print(json.dumps({
        "step": f"issue_{n_batches}_delete_batches",
        "sec": round(time.time() - t0, 3),
    }))

    tomb_rows = sorted(map(tuple, timed(
        f"search_{n_batches}_tombstone_batches", search
    )))

    t0 = time.time()
    assert compact_ivfpq_index(spark, path) is True
    print(json.dumps({"step": "compact", "sec": round(time.time() - t0, 3)}))

    post_rows = sorted(map(tuple, timed("search_post_compaction", search)))
    assert post_rows == tomb_rows, "compaction changed search results"
    assert post_rows != base_rows or n_batches == 0
    print(json.dumps({"step": "verified", "results_identical_pre_post": True}))


if __name__ == "__main__":
    main()
