"""Physical-plan audit across every gate query.

Prints one line per query: join strategies, exchange count, whether a
Python eval node appears, pushed filters and scan width — the plan
properties the engine is designed around. Run after changing any
operator to spot a silently degraded plan (a new CartesianProduct, a
lost pushdown, a Python fallback).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_JOINS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def audit(plan: str) -> dict:
    out = {j: plan.count(j + " ") + plan.count(j + "\n") for j in _JOINS}
    out["Exchange"] = len(re.findall(r"\bExchange\b", plan))
    out["python"] = ("BatchEvalPython" in plan) or ("ArrowEvalPython" in plan)
    out["pandas"] = ("MapInPandas" in plan) or ("FlatMapGroupsInPandas" in plan)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    out["pushed"] = bool(pushed and pushed.group(1).strip())
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    out["scan_cols"] = max((s.count(":") for s in schemas), default=0)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from bunsen_spark.session import get_spark

    spark = get_spark("plan_audit")
    bad = 0
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {e}")
            bad += 1
            continue
        a = audit(plan)
        joins = " ".join(f"{k}x{v}" for k, v in a.items() if k in _JOINS and v)
        flags = []
        if a["python"]:
            flags.append("PYTHON-EVAL")
        if a["pandas"]:
            flags.append("pandas")
        if a["CartesianProduct"]:
            flags.append("!!CARTESIAN")
            bad += 1
        print(
            f"{name}: exchanges={a['Exchange']} scan_cols<={a['scan_cols']} "
            f"{joins or 'no-joins'} {' '.join(flags)}"
        )
    print("PLAN AUDIT CLEAN" if bad == 0 else f"{bad} PROBLEM PLANS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
