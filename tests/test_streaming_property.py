"""Property sweeps for the stateful streaming operators (VERDICT r4 #4):
randomized inputs × multiple micro-batch splits, asserting exact
stream-vs-batch equality.

- Sessionizer: 25 random per-user event streams (deterministic seed per
  split), split into 1 / 3 / 7 time-ordered micro-batches — the
  `applyInPandasWithState` sessions must equal the batch
  `operators.sessionize` result regardless of how the stream is cut.
- Near-dup filter: random doc stream split into 1 / 2 / 4 micro-batches
  — the `foreachBatch` pipeline's kept set and final state must equal a
  driver-side sequential application of the BATCH operators
  (`minhash_state` + `incremental_near_dup`) over the same cuts. (The
  operator is monotone but not cut-invariant — docstring contract — so
  the twin replays the same cut sequence, not one big batch.)

Batches are time-/id-ordered so the watermark never drops rows: each
micro-batch's minimum event time is >= the previous batch's maximum.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _random_events(seed: int, n_users: int = 25, max_events: int = 30):
    """(user_id, ts_us) rows with gap-straddling spacings: ~1/3 of
    consecutive deltas exceed the 30-min gap, exercising both
    continuation and session-break paths."""
    rng = random.Random(seed)
    base_us = 1_700_000_000 * 1_000_000
    rows = []
    for u in range(n_users):
        t = base_us + rng.randrange(0, 3_600_000_000)
        for _ in range(rng.randrange(1, max_events)):
            rows.append((u, t))
            if rng.random() < 0.35:
                t += 30 * 60 * 1_000_000 + rng.randrange(1, 7_200_000_000)
            else:
                t += rng.randrange(1, 30 * 60 * 1_000_000)  # within gap
    return rows


@pytest.mark.slow
@pytest.mark.parametrize("n_batches,seed", [(1, 11), (3, 12), (7, 13)])
def test_streaming_sessionize_any_cut_matches_batch(spark, tmp_path, n_batches, seed):
    from bunsen_spark.operators.sessionize import sessionize
    from bunsen_spark.streaming.stateful import sessionize_events

    rows = _random_events(seed)
    gap_us = 30 * 60 * 1_000_000
    e = spark.createDataFrame(rows, "user_id long, us long")
    batch = (
        sessionize(e, ["user_id"], "us", gap_us)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    expected = {
        (r.user_id, r.start_us, r.end_us, r.n_events) for r in batch.collect()
    }

    # time-ordered cut into n_batches files + a far-future sentinel
    # file so the watermark flushes every open session
    rows_sorted = sorted(rows, key=lambda r: r[1])
    src = tmp_path / "stream"
    src.mkdir()
    per = -(-len(rows_sorted) // n_batches)
    for i in range(n_batches):
        chunk = rows_sorted[i * per : (i + 1) * per]
        if chunk:
            spark.createDataFrame(chunk, "user_id long, us long").select(
                "user_id", F.timestamp_micros(F.col("us")).alias("ts")
            ).coalesce(1).write.parquet(str(src / f"b{i:02d}"))
    sentinel_us = rows_sorted[-1][1] + 30 * 24 * 3600 * 1_000_000
    spark.createDataFrame(
        [(999_999, sentinel_us)], "user_id long, us long"
    ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts")).write.parquet(
        str(src / "zz_sentinel")
    )

    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    name = f"sess_sweep_{n_batches}_{seed}"
    q = (
        sessionize_events(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (
            r.user_id,
            int(r.session_start.timestamp() * 1_000_000),
            int(r.session_end.timestamp() * 1_000_000),
            r.n_events,
        )
        for r in spark.table(name).collect()
        if r.user_id != 999_999
    }
    assert got == expected, f"split={n_batches} seed={seed}"


def _random_docs(seed: int, n_docs: int = 30):
    """Docs with deliberate near-dup structure: clusters built from a
    base sentence with small per-member edits, plus unique fillers."""
    rng = random.Random(seed)
    vocab = (
        "spark shuffle parquet catalyst codegen partition executor driver "
        "broadcast join window watermark state stream batch corpus token "
        "gram shingle signature cluster bucket probe filter merge"
    ).split()
    docs, doc_id = [], 0
    while doc_id < n_docs:
        base = [rng.choice(vocab) for _ in range(rng.randrange(12, 20))]
        size = rng.choice([1, 1, 2, 3])  # cluster size
        for _ in range(min(size, n_docs - doc_id)):
            words = list(base)
            if rng.random() < 0.8:
                words[rng.randrange(len(words))] = rng.choice(vocab)
            docs.append((doc_id, " ".join(words)))
            doc_id += 1
    return docs


@pytest.mark.parametrize("n_batches,seeds", [
    (1, range(21, 28)), (2, range(31, 38)), (4, range(41, 48)),
])
def test_streaming_near_dup_any_cut_matches_batch_twin(
    spark, tmp_path, n_batches, seeds
):
    """21 distinct seeds across the three splits — each run mixes 7
    seeds' corpora under disjoint doc_id ranges, so one streaming query
    property-checks 7 independent random corpora at once."""
    import json as jsonlib

    from bunsen_spark.operators.dedup import incremental_near_dup, minhash_state
    from bunsen_spark.streaming.ingest import stream_near_dup_filter

    docs = []
    for k, s in enumerate(seeds):
        docs.extend(
            (k * 1000 + d, text) for d, text in _random_docs(s)
        )
    seed = f"{seeds.start}-{seeds.stop}"
    schema = "doc_id long, text string"

    # driver-side batch twin: same cut sequence through the batch ops
    per = -(-len(docs) // n_batches)
    cuts = [docs[i * per : (i + 1) * per] for i in range(n_batches)]
    state_df = None
    expected_kept: set[int] = set()
    for chunk in cuts:
        if not chunk:
            continue
        cdf = spark.createDataFrame(chunk, schema)
        if state_df is None:
            kept = minhash_state(cdf)
        else:
            kept = incremental_near_dup(cdf, state_df, 0.5)
        kept = kept.localCheckpoint()
        expected_kept |= {r.doc_id for r in kept.select("doc_id").collect()}
        state_df = kept if state_df is None else state_df.unionByName(kept)

    # the streaming pipeline over the same cuts (one jsonl file per cut,
    # lexicographic file order = cut order, maxFilesPerTrigger=1)
    src = tmp_path / "docs"
    src.mkdir()
    for i, chunk in enumerate(cuts):
        with open(src / f"b{i:02d}.jsonl", "w") as f:
            for d, t in chunk:
                f.write(jsonlib.dumps({"doc_id": d, "text": t}) + "\n")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    state = str(tmp_path / "state")
    out = str(tmp_path / "kept")
    q = stream_near_dup_filter(
        stream, state, str(tmp_path / "ckpt"), out_path=out, threshold=0.5
    )
    q.awaitTermination(300)

    got_kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    got_state = {r.doc_id for r in spark.read.parquet(state).collect()}
    assert got_kept == expected_kept, f"split={n_batches} seed={seed}"
    assert got_state == expected_kept
