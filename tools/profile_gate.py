"""Per-gate job-level profiler (optimization rounds, guide §1).

For each named gate: build the frame, dump ``explain("formatted")`` to
``plans/<tag>/<gate>_<suffix>.txt`` (optional), run one untimed warm-up
+ N timed ``collect()``s (the bench's timed action), and — via the
Spark event log — print the per-JOB wall-time breakdown of the LAST
timed run: how many Spark jobs one logical query launches and where
the seconds go. At sf0.1 the fixed cost per job (scheduling, broadcast
build, checkpoint write) dominates several gates, so "number of jobs"
is the first metric to read, before any per-stage tuning.

Usage:
    python tools/profile_gate.py GATE[,GATE...] [--sf-dir DIR]
        [--runs 3] [--plans plans/r13] [--suffix before]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("gates")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--json-out",
        default=None,
        help="write {gate: {wall_median_s, task_time_s, n_tasks}} here "
        "(the committed per-round task-time artifact)",
    )
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="profile_gate_ev_")
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

    # the ONE shared bench-parity conf set (bunsen_spark.session), plus
    # the event log as an additive layer (ADVICE r13: never copy the
    # builder's conf — a drifted copy silently breaks bench parity)
    from bunsen_spark.session import get_spark

    spark = get_spark(
        "profile_gate",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )

    from bunsen_spark.queries import all_queries

    qs = all_queries()
    names = args.gates.split(",")
    for n in names:
        if n not in qs:
            raise SystemExit(f"unknown gate {n}")

    # session warm-up (bench parity)
    spark.range(1).count()
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, args.sf_dir)
        if args.plans:
            pdir = REPO / args.plans
            pdir.mkdir(parents=True, exist_ok=True)
            jvm = spark.sparkContext._jvm
            mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
            (pdir / f"{name}_{args.suffix}.txt").write_text(plan)
        spark.sparkContext.setJobDescription(f"{name}|warmup")
        fn(spark, args.sf_dir).collect()
        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}|run{i}")
            t0 = time.time()
            fn(spark, args.sf_dir).collect()
            samples.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        results[name] = {
            "median": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log: per-job (description, duration) + per-task
    # executor time. Task time is the scale-honest signal (VERDICT r13
    # #4): at sf0.1 wall time is driver-overhead-bound (the 8-core
    # suite total beats 32-core), so per-gate summed executor-task
    # milliseconds is what actually tracks the work a cluster would do.
    jobs: list[dict] = []
    starts: dict[int, dict] = {}
    stage_desc: dict[int, str] = {}
    task_ms: dict[str, float] = {}  # job desc -> summed executor run time
    task_n: dict[str, int] = {}
    # Spark 4 rolling layout: eventlog_v2_<appId>/events_1_<appId>...
    candidates = [
        p
        for p in Path(evdir).rglob("*")
        if p.is_file() and app_id in str(p) and "appstatus" not in p.name
    ]
    for p in candidates:
        if p.name.endswith(".zstd"):
            import zstandard

            raw = zstandard.ZstdDecompressor().stream_reader(open(p, "rb"))
            import io

            fobj = io.TextIOWrapper(raw)
        else:
            fobj = open(p)
        with fobj as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties") or {}
                    desc = props.get("spark.job.description", "")
                    starts[jid] = {
                        "desc": desc,
                        "t0": ev["Submission Time"],
                        "stages": len(ev.get("Stage IDs", [])),
                    }
                    for sid in ev.get("Stage IDs", []):
                        stage_desc[sid] = desc
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev.get("Stage ID")
                    m = ev.get("Task Metrics") or {}
                    run = m.get("Executor Run Time")
                    if sid in stage_desc and isinstance(run, (int, float)):
                        d = stage_desc[sid]
                        task_ms[d] = task_ms.get(d, 0.0) + run
                        task_n[d] = task_n.get(d, 0) + 1
                elif ev.get("Event") == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in starts:
                        s = starts[jid]
                        jobs.append(
                            {
                                "job": jid,
                                "desc": s["desc"],
                                "sec": round(
                                    (ev["Completion Time"] - s["t0"]) / 1000.0, 3
                                ),
                                "stages": s["stages"],
                            }
                        )

    for name in names:
        r = results[name]
        last_desc = f"{name}|run{args.runs - 1}"
        r["task_time_s"] = round(task_ms.get(last_desc, 0.0) / 1000.0, 3)
        r["n_tasks"] = task_n.get(last_desc, 0)
        print(f"\n== {name}: median {r['median']}s  samples {r['samples']}")
        last = [j for j in jobs if j["desc"] == last_desc]
        tot = sum(j["sec"] for j in last)
        print(
            f"   last timed run: {len(last)} jobs, {tot:.3f}s in jobs, "
            f"{r['task_time_s']:.3f}s summed executor task time "
            f"({r['n_tasks']} tasks)"
        )
        for j in sorted(last, key=lambda x: -x["sec"])[:15]:
            print(f"   {j['sec']:7.3f}s  job {j['job']:>4}  stages={j['stages']}")
    print()
    summary = {
        n: {
            "wall_median_s": results[n]["median"],
            "task_time_s": results[n]["task_time_s"],
            "n_tasks": results[n]["n_tasks"],
        }
        for n in names
    }
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
