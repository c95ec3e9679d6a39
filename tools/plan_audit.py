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

# Gates ALLOWED to carry an unpartitioned WindowExec, each with the reason
# the single-partition sort is not a scale hazard. The audit fails any
# OTHER gate whose plan contains one (the class the round-9 verdict found
# the audit blind to).
GLOBAL_WINDOW_WHITELIST = {
    "cumulative_distinct_users": (
        "window input is the per-hour first-seen aggregate — row count is "
        "bounded by the calendar span (~9k rows/year), not corpus size; "
        "the corpus-scale work is the two upstream groupBys"
    ),
}


def _unpartitioned_windows(plan: str) -> int:
    """Count Window nodes with NO partition spec (Spark then requires
    AllTuples and inserts ``Exchange SinglePartition`` below them —
    the whole input on one task). Node print shapes, top-level bracket
    groups tracked with depth so nested ``[..]`` inside expressions
    can't miscount:

    - ``[exprs], [partition], [order]`` (3 groups)  -> partitioned, ok
    - ``[exprs], [partition]``          (2 groups)  -> whole-partition
      frame aggregate, ok — the second group is bare attribute refs
    - ``[exprs], [order]``              (2 groups)  -> GLOBAL ordered
      window — the second group carries the ``ASC/DESC NULLS`` order
      suffix a partition spec never prints
    - ``[exprs]`` / ``[exprs], []``                 -> GLOBAL frame

    The 2-group ambiguity is exactly how the first version of this
    detector false-positived six partition-only gates (mad/winsorize/
    median/report/sweep-line/substring-spans)."""
    n = 0
    for line in plan.splitlines():
        m = re.search(r"(?:^|[\s:+-])Window (\[.*)$", line)
        if not m:
            continue
        groups: list[str] = []
        depth = 0
        buf: list[str] = []
        for ch in m.group(1):
            if ch == "[":
                depth += 1
                if depth == 1:
                    buf = []
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(buf))
                    continue
                depth = max(0, depth)
            if depth >= 1:
                buf.append(ch)
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and groups[1].strip() and not re.search(
            r"(ASC|DESC) NULLS", groups[1]
        ):
            continue  # partition-only whole-frame aggregate
        n += 1
    return n


def audit(plan: str) -> dict:
    out = {j: plan.count(j + " ") + plan.count(j + "\n") for j in _JOINS}
    out["Exchange"] = len(re.findall(r"\bExchange\b", plan))
    out["python"] = ("BatchEvalPython" in plan) or ("ArrowEvalPython" in plan)
    out["pandas"] = ("MapInPandas" in plan) or ("FlatMapGroupsInPandas" in plan)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    out["pushed"] = bool(pushed and pushed.group(1).strip())
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    out["scan_cols"] = max((s.count(":") for s in schemas), default=0)
    out["global_window"] = _unpartitioned_windows(plan)
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
        if a["global_window"]:
            if name in GLOBAL_WINDOW_WHITELIST:
                flags.append("global-window(whitelisted)")
            else:
                flags.append("!!GLOBAL-WINDOW")
                bad += 1
        print(
            f"{name}: exchanges={a['Exchange']} scan_cols<={a['scan_cols']} "
            f"{joins or 'no-joins'} {' '.join(flags)}"
        )
    print("PLAN AUDIT CLEAN" if bad == 0 else f"{bad} PROBLEM PLANS")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
