"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {worst-10 name: sec}, "sf": ..., "n_queries": ...}.
The FULL per-query medians + spreads are written to
``bench_full_latest.json`` at the repo root — the stdout line is kept
under ~1.6 KB because the driver's capture retains only the last ~2 KB
of output (a full 130-query JSON line loses its head to truncation and
parses as null, which is what happened to BENCH_r04/r05).

Methodology (round 4, noise-hardened; round 8, order-independent):
  - one untimed warm-up execution per query (JIT, code cache, page
    cache, shuffle-file reuse), then ``$SPARK_GRAFT_BENCH_RUNS``
    (default 3) timed executions;
  - the reported per-query number is the MEDIAN of the timed runs —
    robust to a single GC pause or a background-process blip;
  - per-query relative spread ((max-min)/median of the timed runs) is
    reported under "spread" so a noisy measurement is visible instead
    of silently polluting round-over-round comparisons;
  - os.getloadavg() is recorded before and after the run under
    "loadavg" — a 1-minute load far above $SPARK_GRAFT_CPUS at start
    means the box was contended and the numbers are suspect;
  - OUTLIER re-measurement (VERDICT r7 #1): a query whose in-session
    spread exceeds ``$SPARK_GRAFT_BENCH_FRESH_SPREAD`` (default 0.5),
    or whose median exceeds 2x its previous committed median (by more
    than 0.3 s absolute), is re-run in a FRESH JVM — a subprocess
    re-invocation of this script pinned to that query — and the fresh
    median is the one committed, annotated per-query under
    "fresh_session". This removes the in-session block-manager /
    session-state order effect that put a 12x phantom
    (negative_pairs_sample 6.82 s vs 0.5 s fresh) into the r7
    artifact. Sub-0.15 s medians are exempt from the spread trigger
    (pure jitter; a fresh JVM costs ~20 s). At most
    ``$SPARK_GRAFT_BENCH_FRESH_MAX`` (default 20) queries are re-run,
    worst excess first.

Each timed execution drives the full plan with .collect(). The total is
the sum of per-query medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - platform without getloadavg
        return []


def _wait_for_idle() -> dict:
    """Measurements taken on a contended box are worthless for
    round-over-round comparison (the r6 driver bench was 1.5× inflated
    by loadavg 5.65 — VERDICT r6 'Performance'). Wait for the 1-minute
    loadavg to drop below $SPARK_GRAFT_BENCH_IDLE_LOAD (default 1.0)
    AND the 5-minute loadavg below $SPARK_GRAFT_BENCH_IDLE_LOAD5
    (default 2.5 — a box that just finished a heavy soak shows a quiet
    1-minute average while still thermally/cache-polluted; the r10
    driver artifact needed after-the-fact adjudication for exactly
    this, VERDICT r10 #3) for up to $SPARK_GRAFT_BENCH_IDLE_WAIT
    seconds (default 600), then run REGARDLESS — refusing would leave
    the round with no bench at all — and record the gate outcome in
    the JSON so a loaded run is self-describing instead of silently
    polluting the record."""
    thresh = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOAD", "1.0"))
    thresh5 = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOAD5", "2.5"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT", "600"))
    t0 = time.time()
    load = _loadavg()

    def busy(ld: list[float]) -> bool:
        return bool(ld) and (ld[0] >= thresh or ld[1] >= thresh5)

    while busy(load) and time.time() - t0 < max_wait:
        print(
            f"# box busy (loadavg {load[:2]} vs gates [{thresh}, {thresh5}]);"
            " waiting...",
            file=sys.stderr,
        )
        time.sleep(10)
        load = _loadavg()
    waited = round(time.time() - t0, 1)
    satisfied = bool(load) and not busy(load)
    if not satisfied:
        print(
            f"# WARNING: starting bench on a busy box (loadavg "
            f"{load[:2] if load else '?'}); timings are suspect",
            file=sys.stderr,
        )
    return {
        "threshold": thresh,
        "threshold5": thresh5,
        "waited_sec": waited,
        "idle": satisfied,
    }


def _canary() -> dict:
    """Fixed CPU work whose wall time is a machine-speed probe,
    recorded in the artifact next to a committed reference
    (BENCH_CANARY_REF.json, captured on a verified-idle box). A
    driver-triggered bench on a degraded box (post-soak thermal state,
    background load the loadavg gate missed, page-cache pressure) then
    carries its own evidence — the canary ratio — instead of needing
    after-the-fact prose adjudication of phantom regressions
    (VERDICT r10 #3: two same-protocol runs 25 s apart). Two probes:
    a single-thread pure-Python loop (interpreter/cycle speed, immune
    to BLAS threading) and a parallel numpy matmul (effective
    multi-core throughput, the profile Spark tasks see)."""
    import hashlib

    def py_once() -> float:
        t0 = time.perf_counter()
        h = hashlib.md5()
        buf = b"x" * 65536
        for _ in range(800):
            h.update(buf)
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        return time.perf_counter() - t0

    # MIN of individually-timed reps: interference only ever slows a
    # fixed-work probe, so the minimum is the least-interfered sample.
    # A single timed batch was measured 4.4x jittery for the matmul on
    # an IDLE box (BLAS thread-pool scheduling), which would flag clean
    # runs as degraded.
    py_s = round(min(py_once() for _ in range(3)), 4)

    try:
        import numpy as np

        a = np.ones((1024, 1024))
        a @ a  # untimed warm-up: BLAS thread-pool spin-up
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            (a @ a).sum()
            times.append(time.perf_counter() - t0)
        np_s = round(min(times), 4)
    except Exception:  # noqa: BLE001 - canary is best-effort
        np_s = None

    # Memory-bandwidth probe (round 12): the r11→r12 A/B showed the
    # CPU probes' blind spot — byte-identical r10-close code measured
    # 10-16% slower than its commit-time bench while BOTH CPU probes
    # read FASTER than the committed reference. A cache-blocked matmul
    # is compute-bound and a pure-Python loop fits in L1; neither sees
    # host-level memory-bandwidth contention, which is exactly what
    # wide-shuffle Spark stages feel first. One streaming reduction
    # over a 256 MB array is the missing class.
    try:
        import numpy as np

        big = np.ones(32 * 1024 * 1024)  # 256 MB of float64
        big.sum()  # untimed warm-up: faulting the pages in
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            big.sum()
            times.append(time.perf_counter() - t0)
        mem_s = round(min(times), 4)
        del big
    except Exception:  # noqa: BLE001 - canary is best-effort
        mem_s = None

    # Disk-write probe (round 12): shuffle spill / index-cache writes
    # land on the same device; a contended or throttled disk inflates
    # bench totals invisibly to every CPU probe. 64 MB write + fsync.
    try:
        import tempfile

        times = []
        buf = b"\x5a" * (8 * 1024 * 1024)
        for _ in range(3):
            with tempfile.NamedTemporaryFile(dir="/tmp", delete=True) as f:
                t0 = time.perf_counter()
                for _ in range(8):
                    f.write(buf)
                f.flush()
                os.fsync(f.fileno())
                times.append(time.perf_counter() - t0)
        io_s = round(min(times), 4)
    except Exception:  # noqa: BLE001 - canary is best-effort
        io_s = None
    return {
        "python_loop_s": py_s,
        "numpy_matmul_s": np_s,
        "mem_bw_s": mem_s,
        "disk_write_s": io_s,
    }


#: per-probe degraded thresholds (ratio vs the committed reference,
#: which tools/capture_canary_ref.py pins as a long-window minimum —
#: the box's true best). python_loop is single-thread and stable to
#: ~5% on an idle box, so a 1.3x slowdown is a real signal (CPU steal
#: / frequency state). The parallel matmul is the probe that sees
#: multi-core contention — the thing that actually inflates local[32]
#: query times — but even at loadavg < 1 its minimum oscillates up to
#: ~5x with sub-minute external bursts (measured while building this:
#: 0.010 s fast state, 0.036-0.05 s ambient), so only a slowdown past
#: 8x the pinned best is flagged; the r10-style polluted state that
#: inflated the whole suite ~27% measured ~12x, comfortably inside
#: the flag and far outside the ambient band. Raw ratios are always
#: recorded — the classification is the tripwire, not the evidence.
#: mem_bw is a streaming reduction — stable to ~10% on a healthy box.
#: Two rounds of evidence (r12 close: ratios 1.13/1.20 alongside a
#: +14% suite total; r13 baseline/smoke: 1.34/1.36 alongside a +15-30%
#: total, with python_loop flat at 0.86-1.02 throughout) show the
#: memory-bandwidth probe IS the correlate of whole-suite inflation on
#: this box, at ratios far below the original 2.5x band — so per
#: VERDICT r12 #4 the band is tightened to 1.25x (2.5x the ~10%
#: healthy jitter): a box in the measured slow state now self-flags
#: as degraded BEFORE a slow close gets committed as if comparable.
#: disk_write on shared/virtualized storage legitimately oscillates
#: several-fold; 4x (was 10x) still clears the measured ambient band
#: (0.86-1.36) with margin while catching sustained write-back theft.
CANARY_TOL = {
    "python_loop_s": 1.3,
    "numpy_matmul_s": 8.0,
    "mem_bw_s": 1.25,
    "disk_write_s": 4.0,
}


def classify_machine_state(
    ref: dict | None, measured: dict, tol: dict | None = None
) -> dict:
    """Pure classification of a canary measurement against the
    committed reference: ``ok`` (every probe within its tolerance),
    ``degraded`` (any probe slower than tol x reference — timings are
    suspect and the artifact says so), or ``unreferenced`` (no
    committed reference). Unit-tested without Spark."""
    tol = tol or CANARY_TOL
    if not ref:
        return {"state": "unreferenced", "ratios": {}}
    ratios = {}
    for k, m in measured.items():
        r = ref.get(k)
        if isinstance(m, (int, float)) and isinstance(r, (int, float)) and r > 0:
            ratios[k] = round(m / r, 3)
    state = (
        "degraded"
        if any(v > tol.get(k, 1.3) for k, v in ratios.items())
        else "ok"
    )
    return {"state": state, "ratios": ratios, "tolerance": tol}


def _preflight() -> dict:
    """Idle gate + machine-speed canary, recorded in the artifact.
    The canary takes the per-probe MIN over three samples spread a few
    seconds apart: the box's throughput oscillates with sub-minute
    bursts, and a single point sample at an unlucky instant flags a
    clean run as degraded (observed: matmul ratio 8.45 at loadavg
    0.25). If even the best of three is past the band, the pollution
    is sustained — exactly what the flag is for."""
    gate = _wait_for_idle()
    samples = []
    for i in range(3):
        samples.append(_canary())
        if i < 2:
            time.sleep(3)
    measured = {
        k: (
            min(v for v in (s.get(k) for s in samples) if v is not None)
            if any(s.get(k) is not None for s in samples)
            else None
        )
        for k in samples[0]
    }
    try:
        ref = json.loads((REPO / "BENCH_CANARY_REF.json").read_text())
    except (OSError, json.JSONDecodeError):
        ref = None
    cls = classify_machine_state(ref and ref.get("canary"), measured)
    if cls["state"] == "degraded":
        # Corroboration pass (ADVICE r13): the tightened mem_bw band
        # (1.25x over a probe stable to ~10%) can catch a single jitter
        # tail spanning the 3-sample window. A transient won't
        # reproduce 30 s later; sustained degradation will — so a
        # degraded first read gets ONE re-measure and the per-probe min
        # of both windows is what's classified. Both reads land in the
        # artifact ("canary_first_read"), so a flag that only the
        # retry cleared stays visible.
        first = dict(measured)
        time.sleep(30)
        retry = _canary()
        measured = {
            k: (
                min(v for v in (measured.get(k), retry.get(k)) if v is not None)
                if (measured.get(k) is not None or retry.get(k) is not None)
                else None
            )
            for k in measured
        }
        cls = classify_machine_state(ref and ref.get("canary"), measured)
        cls["canary_first_read"] = first
    if cls["state"] == "degraded":
        print(
            f"# WARNING: machine-speed canary degraded vs committed "
            f"reference (ratios {cls['ratios']}); timings are suspect",
            file=sys.stderr,
        )
    return {"load_gate": gate, "canary": measured, **cls}


def _previous_medians(sf_val) -> dict[str, float]:
    """Per-query medians of the last committed bench artifact (read
    BEFORE this run overwrites it) — the >2x-regression re-run
    trigger's baseline. Only comparable when the previous artifact was
    taken at the SAME scale factor."""
    try:
        prev = json.loads((REPO / "bench_full_latest.json").read_text())
        if prev.get("sf") != sf_val:
            return {}
        return {
            n: t for n, t in prev.get("queries", {}).items() if isinstance(t, (int, float))
        }
    except (OSError, json.JSONDecodeError):
        return {}


def select_outliers(
    timings: dict[str, float],
    spreads: dict[str, float],
    prev_medians: dict[str, float],
    spread_thresh: float,
) -> list[str]:
    """Queries whose in-session measurement is untrustworthy, worst
    excess first. Triggers: in-session spread > ``spread_thresh`` with
    a median above 0.15 s (sub-0.15 s medians are pure jitter — a
    fresh JVM costs ~20 s), or median > 2x the previously committed
    median with > 0.3 s absolute excess (the floor keeps 20 ms jitter
    from burning a JVM start). Pure function — unit-tested without
    Spark in tests/test_bench_harness.py."""

    def _excess(n: str) -> float:
        prev = prev_medians.get(n)
        reg = timings[n] - 2 * prev if prev and prev > 0 else 0.0
        return max(reg, (spreads[n] - spread_thresh) * timings[n])

    outliers = [
        n
        for n in timings
        if timings[n] >= 0
        and (
            (spreads[n] > spread_thresh and timings[n] > 0.15)
            or (
                n in prev_medians
                and prev_medians[n] > 0
                and timings[n] > 2 * prev_medians[n]
                and timings[n] - prev_medians[n] > 0.3
            )
        )
    ]
    outliers.sort(key=_excess, reverse=True)
    return outliers


def _fresh_once(name: str, runs: int) -> dict | None:
    """One fresh-JVM measurement of one query: subprocess re-invocation
    of this script with $SPARK_GRAFT_BENCH_ONLY=<name>. Returns
    {"median": s, "spread": s, "runs": n} or None if the run failed."""
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = name
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    try:
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).resolve())],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        last = proc.stdout.strip().splitlines()[-1]
        child = json.loads(last)
        med = child["queries"][name]
        if med < 0:
            return None
        return {"median": med, "spread": child["spread"][name], "runs": runs}
    except Exception as e:  # noqa: BLE001 — keep the in-session number
        print(f"# fresh-session re-run failed for {name}: {e}", file=sys.stderr)
        return None


def _fresh_rerun(
    names: list[str], runs: int, spread_thresh: float
) -> dict[str, dict]:
    """Re-measure each query in fresh JVMs until its spread clears the
    bar — the artifact's own invariant ("no committed row above
    spread_thresh"), ENFORCED rather than asserted: a first attempt
    that still exceeds the bar gets one escalated retry with more
    timed runs (more samples tighten the median AND the relative
    spread of a genuinely stable query; a genuinely bimodal one keeps
    its spread and is then committed with ``"unsettled": true`` so the
    artifact never silently carries an unreproducible number).
    Subprocesses run sequentially, after the parent session stops —
    one Spark JVM at a time. Returns name -> {"median", "spread",
    "runs"[, "unsettled"]} for runs that parsed."""
    out: dict[str, dict] = {}
    for name in names:
        best = _fresh_once(name, runs)
        if best is not None and best["spread"] > spread_thresh and best["median"] > 0.15:
            retry = _fresh_once(name, runs * 2 + 1)
            if retry is not None and retry["spread"] < best["spread"]:
                best = retry
        if best is None:
            continue
        if best["spread"] > spread_thresh and best["median"] > 0.15:
            best["unsettled"] = True
        out[name] = best
        note = " UNSETTLED" if best.get("unsettled") else ""
        print(
            f"# fresh-session {name}: {best['median']}s "
            f"(spread {best['spread']:.0%}, n={best['runs']}){note}",
            file=sys.stderr,
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Child mode: re-invoked by _fresh_rerun for ONE query in a fresh
    # JVM. Runs just that query (its own untimed warm-up + timed runs),
    # prints the full JSON, and skips the idle gate (the parent already
    # gated; its just-stopped JVM still inflates the 1-minute loadavg),
    # the artifact write, and any further re-run recursion.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    sf_float = float(sf) if sf.replace(".", "").isdigit() else sf
    prev_medians = _previous_medians(sf_float) if not only else {}

    from bunsen_spark.queries import all_queries
    from bunsen_spark.session import get_spark

    spark = get_spark("bunsen_spark_bench")

    qs = all_queries()
    if only:
        missing = [n for n in only.split(",") if n not in qs]
        if missing:
            raise SystemExit(f"unknown bench query {missing}")
        qs = {n: qs[n] for n in only.split(",")}
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    preflight = _preflight() if not only else {"skipped": "child mode"}
    load_gate = preflight.get("load_gate", preflight)
    load_before = _loadavg()
    # Warm the session once: a trivial JVM job, the Python->JVM
    # createDataFrame bridge (first use costs seconds of class loading
    # — it was 90% of translate_order_priority's r1 outlier), and a
    # parquet footer read.
    spark.range(1).count()
    spark.createDataFrame([(1, "warm")], "a int, b string").count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # Global JVM warm-up: registry order now leads with the HEAVY
    # queries (driver-coverage reordering), so without this the first
    # few absorb all of C2-JIT-compiling Spark's shuffle/window/codegen
    # machinery (measured: ann_ivf_kmeans 11.5 s cold-head vs ~3 s on a
    # warm JVM). Run one untimed representative of each execution path
    # (agg+join codegen, window, shuffle-heavy dedup, Arrow/Python).
    if not only:
        for wname in (
            "q1_pricing_summary",
            "window_order_rank",
            "dedup_minhash_lsh",
            "multimodal_image_features",
        ):
            if wname in qs:
                try:
                    qs[wname](spark, sf_dir).collect()
                except Exception:  # noqa: BLE001 — warm-up only
                    pass
    for name, fn in qs.items():
        try:
            # Untimed warm-up: builds the plan, loads classes, primes
            # the page cache for this query's inputs.
            fn(spark, sf_dir).collect()
            samples: list[float] = []
            for _ in range(runs):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                samples.append(time.time() - t0)
            med = statistics.median(samples)
            timings[name] = round(med, 3)
            spreads[name] = round((max(samples) - min(samples)) / med, 3) if med > 0 else 0.0
            print(
                f"# {name}: {timings[name]}s (spread {spreads[name]:.0%}, n={runs})",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            spreads[name] = -1.0
            print(f"# bench error in {name}: {e}", file=sys.stderr)
        # drop this query's DataFrame refs so Spark's ContextCleaner can
        # unpersist its (lazy-localCheckpoint) RDD blocks before the next
        # query, AND force a JVM GC so the cleaner actually runs NOW:
        # Python gc alone leaves the JVM-side checkpoint/shuffle blocks
        # to an eventual collection, and the accumulated block-manager
        # pressure degraded mid/late-run queries 3-6x once the heavy
        # materialize-laden families moved to the head of the registry
        # (measured r7: daily_top_event_types 5.85 s in-session vs
        # 0.44 s with per-query System.gc(); fresh-session 0.3-0.5 s).
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 - measurement hygiene only
            pass
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    if only:
        # Child mode: emit the full (single-query) JSON and stop.
        print(
            json.dumps(
                {
                    "queries": timings,
                    "spread": spreads,
                    "sf": sf_val,
                    "runs": runs,
                    "loadavg": {"before": load_before, "after": _loadavg()},
                }
            )
        )
        return

    # Order-independence pass (VERDICT r7 #1): re-measure outliers in a
    # fresh JVM each and commit the fresh medians.
    spread_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_FRESH_SPREAD", "0.5"))
    fresh_max = int(os.environ.get("SPARK_GRAFT_BENCH_FRESH_MAX", "20"))
    outliers = select_outliers(timings, spreads, prev_medians, spread_thresh)
    dropped = outliers[fresh_max:]
    if dropped:
        print(
            f"# fresh-session cap {fresh_max} reached; keeping in-session "
            f"numbers for {dropped}",
            file=sys.stderr,
        )
    fresh: dict[str, dict] = {}
    if outliers[:fresh_max]:
        print(
            f"# re-measuring {len(outliers[:fresh_max])} outlier(s) in fresh "
            f"JVMs: {outliers[:fresh_max]}",
            file=sys.stderr,
        )
        spark.stop()  # one Spark JVM at a time
        fresh = _fresh_rerun(outliers[:fresh_max], runs, spread_thresh)
        for n, f in fresh.items():
            f["in_session"] = {"median": timings[n], "spread": spreads[n]}
            timings[n] = f["median"]
            spreads[n] = f["spread"]

    # The committed invariant: every row above the spread bar is either
    # fresh-measured below it or explicitly annotated. Rows past the
    # fresh-session cap (or whose re-runs stayed noisy) land here.
    unsettled = sorted(
        n
        for n, s in spreads.items()
        if s > spread_thresh and timings[n] > 0.15
    )
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "spread": spreads,
        "runs": runs,
        "loadavg": {"before": load_before, "after": _loadavg()},
        "load_gate": load_gate,
        "preflight": preflight,
        "fresh_session": fresh,
        "unsettled": unsettled,
    }
    # The driver's capture keeps only the last ~2 KB of output, so a
    # 130-query JSON line gets its head truncated and fails to parse
    # (BENCH_r04/r05 both recorded "parsed": null — two rounds of perf
    # work invisible to the gate). Write the FULL per-query JSON to a
    # repo file, and make the FINAL stdout line a compact summary —
    # total, counts, loadavg, and only the worst-K query medians —
    # guaranteed to fit inside the tail window.
    full_path = REPO / "bench_full_latest.json"
    try:
        full_path.write_text(json.dumps(full, indent=1) + "\n")
    except OSError as e:  # pragma: no cover - read-only checkout
        print(f"# could not write {full_path}: {e}", file=sys.stderr)
    errors = sorted(n for n, t in timings.items() if t < 0)
    worst = dict(
        sorted(
            ((n, t) for n, t in timings.items() if t >= 0),
            key=lambda kv: -kv[1],
        )[:10]
    )
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "n_fresh_session": len(fresh),
        "n_unsettled": len(unsettled),
        "runs": runs,
        "loadavg": {"before": load_before, "after": _loadavg()},
        "load_gate": load_gate,
        "machine_state": preflight.get("state"),
        "canary_ratios": preflight.get("ratios"),
        "queries": worst,
        "queries_note": f"worst 10 of {len(timings)} medians; full per-query JSON in bench_full_latest.json",
    }
    line = json.dumps(compact)
    while len(line) > 1600 and compact["queries"]:
        compact["queries"].pop(list(compact["queries"])[-1])
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
