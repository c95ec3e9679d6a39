"""Streaming segment-dedup parity: the foreachBatch stream must equal
running the incremental batch operator per cut, the incremental form
must equal the all-at-once batch operator on ascending-id batches, and
the streamed state must equal the batch segment_state union."""

from __future__ import annotations

import json as jsonlib
import os

import pyspark.sql.types as T

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

B0 = {1: "a b c d e f", 2: "x y z w v u"}
# doc 3 repeats doc 1's first segment then adds new words; doc 4 is new
B1 = {3: "a b c m m m", 4: "p q r s t n"}


def test_incremental_equals_batch_on_ascending_ids(spark):
    from bunsen_spark.operators.dedup import (
        segment_dedup,
        segment_dedup_against_state,
        segment_state,
    )

    df0 = spark.createDataFrame(list(B0.items()), SCHEMA)
    df1 = spark.createDataFrame(list(B1.items()), SCHEMA)
    both = df0.unionByName(df1)
    want = {r.doc_id: (r.n_segs, r.n_kept, r.clean_text) for r in segment_dedup(both, seg_words=3).collect()}
    empty = spark.createDataFrame([], "seg string")
    got = {
        r.doc_id: (r.n_segs, r.n_kept, r.clean_text)
        for r in segment_dedup_against_state(df0, empty, seg_words=3).collect()
    }
    got.update(
        {
            r.doc_id: (r.n_segs, r.n_kept, r.clean_text)
            for r in segment_dedup_against_state(
                df1, segment_state(df0, seg_words=3), seg_words=3
            ).collect()
        }
    )
    assert got == want


def test_stream_segment_dedup_parity_with_batch(spark, tmp_path):
    from bunsen_spark.operators.dedup import (
        segment_dedup,
        segment_state,
    )
    from bunsen_spark.streaming.ingest import stream_segment_dedup

    src = tmp_path / "seg_stream"
    src.mkdir()
    with open(src / "b0.jsonl", "w") as f:
        for i, t in B0.items():
            f.write(jsonlib.dumps({"doc_id": i, "text": t}) + "\n")
    with open(src / "b1.jsonl", "w") as f:
        for i, t in B1.items():
            f.write(jsonlib.dumps({"doc_id": i, "text": t}) + "\n")
    # FileStreamSource orders files by modification time; back-to-back
    # writes can land with equal mtimes and process b1 first, breaking
    # the batch-order parity assumption. Pin distinct mtimes.
    os.utime(src / "b0.jsonl", (1_000_000_000, 1_000_000_000))
    os.utime(src / "b1.jsonl", (1_000_000_100, 1_000_000_100))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    out = str(tmp_path / "seg_out")
    state = str(tmp_path / "seg_state")
    q = stream_segment_dedup(
        stream, state, str(tmp_path / "seg_ckpt"), out, seg_words=3
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.n_segs, r.n_kept, r.clean_text)
        for r in spark.read.parquet(out).collect()
    }
    df0 = spark.createDataFrame(list(B0.items()), SCHEMA)
    df1 = spark.createDataFrame(list(B1.items()), SCHEMA)
    both = df0.unionByName(df1)
    want = {
        r.doc_id: (r.n_segs, r.n_kept, r.clean_text)
        for r in segment_dedup(both, seg_words=3).collect()
    }
    assert got == want
    # the cross-batch repeat was dropped, the intra-batch originals kept
    assert got[3][1] == 1 and got[1][1] == 2
    # streamed state == batch union state (exactly, no duplicates)
    streamed = sorted(r.seg for r in spark.read.parquet(state).collect())
    union = sorted(
        r.seg
        for r in segment_state(df0, seg_words=3)
        .unionByName(segment_state(df1, seg_words=3))
        .distinct()
        .collect()
    )
    assert streamed == sorted(set(streamed)) == union
