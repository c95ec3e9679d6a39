"""Generate LOCAL scale-soak fixtures: documents / events / embeddings
tables with the driver testdata's statistical shape at arbitrary scale
factors, for measuring how the heavy operator families scale
(VERDICT r5 item 5 — an ~O(n^2) candidate blowup in the dedup/setjoin
family would be invisible at sf0.1 and only show here).

Shape matched to /root/testdata (inspected, not copied): documents are
word-salad over a ~60-word tech vocab (uniform 8-110 words, ~0.2%
exact duplicates plus ~1% near-duplicates with a few word edits, 5
langs, 20 zipf-ish sources); events are one month of timestamps over
sf*15000 users (uniform-gap arrivals, 5 event types, value ~U[0,560],
props JSON); embeddings are 64-dim float vectors in [-0.5, 0.5] with
10 labels.

Both scales are written by the SAME generator so the soak compares
generator-consistent inputs (gen-sf0.1 vs gen-sf1), never the driver's
files against ours. Output under ``scale_testdata/`` (gitignored —
regenerate with this script; ~40 MB at sf1).

Usage: python tools/make_scale_fixtures.py [sf ...]   (default 0.1 1)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path(__file__).resolve().parent.parent / "scale_testdata"

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query plan join shuffle stage task executor "
    "driver memory disk cache block row table schema type null int long "
    "string array map struct read write merge split skew salt bucket "
    "range limit count sum avg min max first last lead lag rank dense "
    "window frame"
).split()

LANGS = ["en", "en", "en", "en", "de", "fr", "es", "zh"]  # en-heavy


def make_documents(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(50000 * sf)
    lens = rng.integers(8, 111, size=n)
    texts: list[str] = []
    v = np.array(VOCAB)
    for ln in lens:
        texts.append(" ".join(v[rng.integers(0, len(v), size=ln)]))
    # near-duplicates: ~1% of docs are a copy of an earlier doc with a
    # few word substitutions; ~0.2% exact copies
    n_near = int(n * 0.01)
    n_exact = int(n * 0.002)
    for i in rng.integers(1, n, size=n_near):
        words = texts[int(i) - 1].split()
        for j in rng.integers(0, len(words), size=max(1, len(words) // 20)):
            words[int(j)] = v[int(rng.integers(0, len(v)))]
        texts[int(i)] = " ".join(words)
    for i in rng.integers(1, n, size=n_exact):
        texts[int(i)] = texts[int(i) - 1]
    langs = [LANGS[int(x)] for x in rng.integers(0, len(LANGS), size=n)]
    # zipf-ish source popularity over 20 sources
    src_w = 1.0 / np.arange(1, 21)
    src_w /= src_w.sum()
    sources = [f"src{int(x)}" for x in rng.choice(20, size=n, p=src_w)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def make_events(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(1_000_000 * sf)
    base = np.datetime64("2024-01-01T00:00:00.000000")
    # one month of uniform-gap arrivals regardless of sf (density scales)
    gaps = rng.integers(0, 2_592_000_000_000 // max(n, 1) * 2, size=n)
    ts = base + np.cumsum(gaps).astype("timedelta64[us]")
    users = rng.integers(0, int(15000 * sf) or 100, size=n)
    types = np.array(["view", "click", "purchase", "error", "login"])
    etype = types[rng.integers(0, len(types), size=n)]
    value = np.round(rng.uniform(0, 560.22, size=n), 2)
    props = [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(users, pa.int64()),
            "event_type": etype,
            "value": value,
            "props": props,
        }
    )


def make_embeddings(sf: float, rng: np.random.Generator) -> pa.Table:
    n = int(20000 * sf)
    vecs = np.round(rng.uniform(-0.5, 0.5, size=(n, 64)), 6).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
        }
    )


def main() -> None:
    sfs = [float(x) for x in (sys.argv[1:] or ["0.1", "1"])]
    for sf in sfs:
        rng = np.random.default_rng(42)
        d = OUT / f"sf{sf:g}"
        d.mkdir(parents=True, exist_ok=True)
        pq.write_table(make_documents(sf, rng), d / "documents.parquet")
        pq.write_table(make_events(sf, rng), d / "events.parquet")
        pq.write_table(make_embeddings(sf, rng), d / "embeddings.parquet")
        print(f"wrote {d} (docs={int(50000 * sf)}, events={int(1_000_000 * sf)}, vecs={int(20000 * sf)})")


if __name__ == "__main__":
    main()
