"""Capture the committed machine-speed canary reference
(BENCH_CANARY_REF.json) for bench.py's pre-flight machine-state
classifier. REFUSES to capture on a busy box (unlike the bench itself,
which runs regardless and annotates) — a polluted reference would make
every later clean run look "fast" and every polluted run look "ok".

The committed value per probe is the MINIMUM of N runs spread over
~30 s: the canary is fixed CPU work, so the minimum is the least-
interfered sample and the right denominator for "how much slower is
this box than its best" — the long window matters because the box's
multi-core throughput oscillates with sub-minute external bursts even
at loadavg < 1 (see bench.py:CANARY_TOL).

Usage: python tools/capture_canary_ref.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    import bench

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    # the same gates (env vars AND defaults) bench._wait_for_idle uses —
    # a tuned environment must gate the bench and the reference capture
    # consistently (ADVICE r11)
    thresh = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOAD", "1.0"))
    thresh5 = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOAD5", "2.5"))
    load = os.getloadavg()
    if load[0] >= thresh or load[1] >= thresh5:
        raise SystemExit(
            f"REFUSED: box busy (loadavg {load[:2]} vs gates "
            f"[{thresh}, {thresh5}]); a reference captured under load is "
            "worse than none"
        )
    samples = []
    for _ in range(n):
        samples.append(bench._canary())
        time.sleep(2.0)
    ref = {
        k: min(s[k] for s in samples if isinstance(s[k], (int, float)))
        for k in samples[0]
        if any(isinstance(s[k], (int, float)) for s in samples)
    }
    out = {
        "canary": ref,
        "samples": samples,
        "loadavg": [round(x, 2) for x in load],
        "captured_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    path = REPO / "BENCH_CANARY_REF.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}: {ref}")


if __name__ == "__main__":
    main()
