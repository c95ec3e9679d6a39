"""Generate the closing-bench PERF.md paragraph data FROM the committed
artifact — never hand-copy numbers (VERDICT r12 #2: the round-12
closing paragraph quoted rows from an uncommitted first attempt; the
ledger must quote bench_full_latest.json as committed).

Usage: python tools/perf_close_summary.py [bench_json] [prev_bench_json]

Prints: total / gate count / error count / unsettled list, the 5
slowest gates, any gate whose row is >2x its previous-artifact row
(the standing perf-weak rule's trigger), and the canary probe ratios.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    cur_p = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "bench_full_latest.json")
    with open(cur_p) as f:
        cur = json.load(f)
    q = cur["queries"]
    errors = [n for n, v in q.items() if v < 0]
    unsettled = sorted(cur.get("unsettled", []))
    print(
        f"total {cur['value']} s / {len(q)} gates / {len(errors)} errors"
        f" / {len(unsettled)} unsettled {unsettled}"
    )
    top = sorted(q.items(), key=lambda kv: -kv[1])[:5]
    print("slowest 5: " + ", ".join(f"{n} {v}s" for n, v in top))
    for fam in ("ann_ivfpq_index_topk", "ann_ivfpq_index_append_topk",
                "ann_ivfpq_index_delete_topk", "dedup_minhash_lsh"):
        if fam in q:
            print(f"watch-row {fam}: {q[fam]}s")
    pf = cur.get("preflight", {})
    if "ratios" in pf:
        print(
            f"canary state={pf.get('state')} ratios="
            + " ".join(f"{k}={v}" for k, v in pf["ratios"].items())
        )

    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            prev = json.load(f)["queries"]
        breaches = {
            n: (prev[n], v, round(v / prev[n], 2))
            for n, v in q.items()
            if n in prev and prev[n] > 0 and v > 0 and v / prev[n] > 2.0
        }
        if breaches:
            print("gates >2x their previous-artifact row (perf-weak rule):")
            for n, (p, c, r) in sorted(breaches.items(), key=lambda kv: -kv[1][2]):
                print(f"  {n}: {p}s -> {c}s ({r}x)")
        else:
            print("no gate >2x its previous-artifact row")


if __name__ == "__main__":
    main()
