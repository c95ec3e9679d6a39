"""Operator-scoped alternating A/B — the whole-suite drift-adjudication
protocol (PERF.md "Round-12"), scoped down to a handful of gates.

Checks out each named tree into a /tmp git worktree (HEAD runs in the
repo itself), then runs ``bench.py`` in ONLY-mode (fresh JVM, untimed
warm-up + N timed runs per gate) alternating across the trees for the
requested number of passes, idle-gating before every run. Alternation
is the point: a tree-consistent gap across interleaved passes is a code
difference; scatter without tree direction is machine state.

Usage:
    python tools/ab_gate.py GATE[,GATE...] LABEL=REF [LABEL=REF...] \
        [--passes 2] [--runs 5] [--out FILE]

Example (VERDICT r12 #1):
    python tools/ab_gate.py \
        dedup_minhash_lsh,ann_ivfpq_index_delete_topk \
        r11=4d7d0d0 r12=8f21c84 r13=HEAD --passes 2 --runs 5
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def _wait_idle(thresh: float = 1.0, max_wait: float = 600.0) -> list[float]:
    t0 = time.time()
    ld = _loadavg()
    while ld[0] > thresh and time.time() - t0 < max_wait:
        time.sleep(10)
        ld = _loadavg()
    return ld


def _tree_path(label: str, ref: str) -> Path:
    if ref == "HEAD":
        return REPO
    p = Path(f"/tmp/ab_tree_{label}")
    if not (p / "bench.py").exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(p), ref],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    return p


def _run_once(tree: Path, gates: list[str], runs: int) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(gates)
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    last = proc.stdout.strip().splitlines()[-1]
    return json.loads(last)["queries"]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    passes, runs, out_file = 2, 5, None
    pos: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--passes":
            passes = int(args[i + 1]); i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--out":
            out_file = args[i + 1]; i += 2
        else:
            pos.append(args[i]); i += 1
    gates = pos[0].split(",")
    trees = [tuple(p.split("=", 1)) for p in pos[1:]]
    if len(trees) < 2:
        raise SystemExit("need at least two LABEL=REF trees")

    results: list[dict] = []
    for pno in range(1, passes + 1):
        for label, ref in trees:
            tree = _tree_path(label, ref)
            ld = _wait_idle()
            t0 = time.time()
            q = _run_once(tree, gates, runs)
            rec = {
                "pass": pno,
                "tree": label,
                "ref": ref,
                "loadavg": ld,
                "wall_s": round(time.time() - t0, 1),
                "queries": q,
            }
            results.append(rec)
            print(
                f"# pass {pno} {label}: "
                + " ".join(f"{g}={q.get(g)}s" for g in gates),
                file=sys.stderr,
            )

    # per-gate, per-tree medians + the tree-consistency verdict
    summary: dict[str, dict] = {}
    for g in gates:
        by_tree = {
            lbl: [r["queries"][g] for r in results if r["tree"] == lbl]
            for lbl, _ in trees
        }
        med = {lbl: round(statistics.median(v), 3) for lbl, v in by_tree.items()}
        summary[g] = {"samples": by_tree, "median": med}
    out = {
        "gates": gates,
        "trees": dict(trees),
        "passes": passes,
        "runs_per_gate": runs,
        "results": results,
        "summary": summary,
    }
    if out_file:
        with open(out_file, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
