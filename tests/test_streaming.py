"""Structured Streaming tests: streaming bundle ingest matches batch
results; watermarked windowed aggregation; stateful sessionization."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest

FIXTURES = Path("fixtures/bundles/json")


@pytest.fixture()
def bundle_dir(tmp_path):
    d = tmp_path / "bundles"
    d.mkdir()
    for f in FIXTURES.glob("*.json"):
        shutil.copy(f, d / f.name)
    return str(d)


def test_stream_ingest_matches_batch(spark, bundle_dir, tmp_path):
    from bunsen_spark.sources.bundles import extract_entry, load_from_directory
    from bunsen_spark.streaming.ingest import (
        stream_bundles_from_directory,
        stream_extract_entry,
        write_resource_stream,
    )

    batch = extract_entry(
        spark, load_from_directory(spark, bundle_dir), "Condition"
    )
    stream = stream_extract_entry(
        spark, stream_bundles_from_directory(spark, bundle_dir), "Condition"
    )
    assert stream.isStreaming
    assert stream.schema == batch.schema

    out = str(tmp_path / "out")
    q = write_resource_stream(stream, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == batch.count()
    assert sorted(r["id"] for r in got.select("id").collect()) == sorted(
        r["id"] for r in batch.select("id").collect()
    )


def test_windowed_observation_counts(spark, bundle_dir, tmp_path):
    from bunsen_spark.sources.bundles import load_from_directory, extract_entry
    from bunsen_spark.streaming.ingest import (
        stream_bundles_from_directory,
        stream_extract_entry,
        windowed_observation_counts,
    )
    from pyspark.sql import functions as F

    stream_obs = stream_extract_entry(
        spark, stream_bundles_from_directory(spark, bundle_dir), "Observation"
    )
    counts = windowed_observation_counts(stream_obs)
    q = (
        counts.writeStream.format("memory")
        .queryName("obs_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("obs_counts")
    # append mode only emits windows the watermark has closed; with a
    # single availableNow batch nothing closes — the plan itself and a
    # complete-mode run are validated instead
    batch_obs = extract_entry(
        spark, load_from_directory(spark, bundle_dir), "Observation"
    )
    n_batch = (
        batch_obs.where(F.to_timestamp("effective.dateTime").isNotNull()).count()
    )
    assert n_batch > 0
    assert got.columns == ["window_start", "window_end", "code_text", "n"]


def test_sessionize_stateful(spark, tmp_path):
    from bunsen_spark.streaming.stateful import sessionize_events
    from pyspark.sql import functions as F
    import pyspark.sql.types as T

    # user 1: two sessions (gap > 30 min); user 2: one session.
    # a late sentinel (user 99, far future) advances the watermark so
    # every earlier session flushes via event-time timeout.
    events = [
        (1, "2024-01-01T10:00:00"),
        (1, "2024-01-01T10:10:00"),
        (1, "2024-01-01T12:00:00"),
        (2, "2024-01-01T09:00:00"),
        (99, "2024-01-03T00:00:00"),
    ]
    src = tmp_path / "events"
    src.mkdir()
    with open(src / "batch0.jsonl", "w") as f:
        for uid, ts in events:
            f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .select("user_id", F.to_timestamp("ts").alias("ts"))
    )
    sessions = sessionize_events(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.table("sessions").collect()
    }
    # user 1 session A closed in-batch (gap), session B + user 2 flush
    # by timeout when the sentinel advances the watermark
    assert (1, "2024-01-01 10:00:00", 2) in got
    assert (1, "2024-01-01 12:00:00", 1) in got
    assert (2, "2024-01-01 09:00:00", 1) in got


def test_stream_dedup(spark, tmp_path):
    import json as jsonlib

    from pyspark.sql import functions as F
    import pyspark.sql.types as T

    from bunsen_spark.streaming.ingest import stream_dedup

    src = tmp_path / "dup_events"
    src.mkdir()
    rows = [
        {"k": "a", "ts": "2024-01-01T10:00:00"},
        {"k": "a", "ts": "2024-01-01T10:00:05"},  # duplicate key within horizon
        {"k": "b", "ts": "2024-01-01T10:01:00"},
        {"k": "a", "ts": "2024-01-01T10:02:00"},  # still within horizon -> dropped
    ]
    with open(src / "batch0.jsonl", "w") as f:
        for r in rows:
            f.write(jsonlib.dumps(r) + "\n")
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("ts", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .json(str(src))
        .select("k", F.to_timestamp("ts").alias("ts"))
    )
    q = (
        stream_dedup(stream, ["k"], "ts")
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["k"] for r in spark.table("deduped").collect())
    assert got == ["a", "b"]


def test_stream_static_enrich(spark, tmp_path):
    """Stream-static join: micro-batches pick up dimension columns;
    result equals the batch join."""
    import json as jsonlib

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from bunsen_spark.streaming.joins import enrich_stream

    src = tmp_path / "enrich_events"
    src.mkdir()
    rows = [(1, 5.0), (2, 7.0), (3, 1.0)]
    with open(src / "b0.jsonl", "w") as f:
        for uid, v in rows:
            f.write(jsonlib.dumps({"user_id": uid, "value": v}) + "\n")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("value", T.DoubleType())]
    )
    stream = spark.readStream.schema(schema).json(str(src))
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    q = (
        enrich_stream(stream, dim, ["user_id"])
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r["user_id"], r["tier"]) for r in spark.table("enriched").collect()}
    assert got == {(1, "gold"), (2, "silver"), (3, None)}


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: purchases pair with views of the
    same user within [0, 30 min] AFTER the view; out-of-window and
    cross-user pairs are excluded."""
    import json as jsonlib

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from bunsen_spark.streaming.joins import interval_join

    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    vdir.mkdir(), pdir.mkdir()
    views = [(1, "2024-01-01T10:00:00"), (2, "2024-01-01T10:00:00")]
    purchases = [
        (1, "2024-01-01T10:10:00"),  # in window → pairs
        (1, "2024-01-01T11:30:00"),  # > 30 min after the view → no pair
        (2, "2024-01-01T09:50:00"),  # before the view → no pair
    ]
    with open(vdir / "b0.jsonl", "w") as f:
        for uid, ts in views:
            f.write(jsonlib.dumps({"user_id": uid, "vts": ts}) + "\n")
    with open(pdir / "b0.jsonl", "w") as f:
        for uid, ts in purchases:
            f.write(jsonlib.dumps({"user_id": uid, "pts": ts}) + "\n")

    vschema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("vts", T.StringType())]
    )
    pschema = T.StructType(
        [T.StructField("user_id", T.LongType()), T.StructField("pts", T.StringType())]
    )
    vstream = (
        spark.readStream.schema(vschema)
        .json(str(vdir))
        .select("user_id", F.to_timestamp("vts").alias("view_ts"))
    )
    pstream = (
        spark.readStream.schema(pschema)
        .json(str(pdir))
        .select("user_id", F.to_timestamp("pts").alias("purchase_ts"))
    )
    joined = interval_join(
        vstream,
        pstream,
        on="user_id",
        left_ts="view_ts",
        right_ts="purchase_ts",
        upper="30 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("vp_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["view_ts"]), str(r["purchase_ts"]))
        for r in spark.table("vp_pairs").collect()
    }
    assert got == {(1, "2024-01-01 10:00:00", "2024-01-01 10:10:00")}


def test_streaming_sessionize_matches_batch_operator(spark, tmp_path):
    """Batch/streaming parity on the REAL events fixture: the
    applyInPandasWithState sessionizer must produce exactly the
    sessions the batch `operators.sessionize` scan produces (which is
    itself oracle-gated via sessionize_events). Cross-validates the
    two implementations' gap semantics end-to-end."""
    from pyspark.sql import functions as F
    import pyspark.sql.types as T

    from bunsen_spark.operators.sessionize import sessionize
    from bunsen_spark.queries import load, ts_us
    from bunsen_spark.streaming.stateful import sessionize_events

    e = load(spark, "/root/testdata/sf0.001", "events")
    e = e.select("user_id", ts_us(e).alias("us"))

    gap_us = 30 * 60 * 1_000_000
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
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in batch.collect()
    }

    # materialize the same events as a file stream + a watermark
    # sentinel 3 days past the horizon so every session flushes
    src = tmp_path / "events_stream"
    e.select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    ).coalesce(1).write.parquet(str(src))
    max_us = e.agg(F.max("us")).collect()[0][0]
    sentinel_us = max_us + 3 * 24 * 3600 * 1_000_000
    spark.createDataFrame([(999_999, sentinel_us)], "user_id long, us long").select(
        "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    ).write.mode("append").parquet(str(src))

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        sessionize_events(stream)
        .writeStream.format("memory")
        .queryName("sessions_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
        )
        for r in spark.table("sessions_parity").collect()
        if r["user_id"] != 999_999
    }
    assert got == expected


def test_stream_near_dup_filter(spark, tmp_path):
    import json as jsonlib

    import pyspark.sql.types as T

    from bunsen_spark.streaming.ingest import stream_near_dup_filter

    src = tmp_path / "doc_stream"
    src.mkdir()
    d1 = "the quick brown fox jumps over the lazy dog near the river bank today"
    d2 = "the quick brown fox jumps over the lazy dog near the river bank now"  # near-dup of d1
    d3 = "completely different text about spark distributed query planning engines"
    with open(src / "b0.jsonl", "w") as f:
        f.write(jsonlib.dumps({"doc_id": 1, "text": d1}) + "\n")
        f.write(jsonlib.dumps({"doc_id": 2, "text": d3}) + "\n")
    with open(src / "b1.jsonl", "w") as f:
        f.write(jsonlib.dumps({"doc_id": 3, "text": d2}) + "\n")  # must drop vs state
        f.write(jsonlib.dumps({"doc_id": 4, "text": "another unrelated parquet shuffle story"}) + "\n")

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
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
    q.awaitTermination(180)

    kept_ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    # d2 (id 3) is a near-dup of state doc 1 and must be dropped; file
    # order of the two micro-batches is lexicographic (b0 then b1)
    assert kept_ids == [1, 2, 4]
    state_ids = sorted(r.doc_id for r in spark.read.parquet(state).collect())
    assert state_ids == [1, 2, 4]
    assert set(spark.read.parquet(state).columns) == {
        "doc_id", "hs", "sig", "batch_id"
    }
    # the batch operator can probe the streaming-written state directly
    # (shared-state contract): a near-dup of doc 4 is dropped
    from bunsen_spark.operators.dedup import incremental_near_dup

    probe = spark.createDataFrame(
        [(9, "another unrelated parquet shuffle story again")], schema
    )
    kept2 = incremental_near_dup(probe, spark.read.parquet(state), 0.5)
    assert kept2.count() == 0


def test_stream_near_dup_replay_idempotent(spark, tmp_path):
    """A crashed-and-replayed micro-batch must not lose survivors or
    duplicate state: the foreachBatch body overwrites only its own
    batch_id partition and filters against strictly-earlier state, so
    re-running the same (batch_df, batch_id) — including after a crash
    between the state write and the out_path write — converges to the
    same state and survivor sets."""
    import pyspark.sql.types as T

    from bunsen_spark.streaming import ingest as ing

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    b0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (2, "completely different text about spark distributed query planning engines"),
        ],
        schema,
    )
    b1 = spark.createDataFrame(
        [
            (3, "the quick brown fox jumps over the lazy dog near the river bank now"),
            (4, "another unrelated parquet shuffle story"),
        ],
        schema,
    )
    state = str(tmp_path / "state")
    out = str(tmp_path / "kept")

    # reach into the operator: build the same _process closure the sink uses
    captured = {}

    class _FakeStream:
        class writeStream:  # noqa: N801 — mimic the attribute chain
            @staticmethod
            def foreachBatch(fn):
                captured["fn"] = fn

                class _W:
                    @staticmethod
                    def option(*a, **k):
                        return _W

                    @staticmethod
                    def trigger(**k):
                        return _W

                    @staticmethod
                    def start():
                        return None

                return _W

    ing.stream_near_dup_filter(_FakeStream, state, str(tmp_path / "ck"), out_path=out)
    process = captured["fn"]

    def snapshot():
        s = sorted(r.doc_id for r in spark.read.parquet(state).collect())
        o = sorted(r.doc_id for r in spark.read.parquet(out).collect())
        return s, o

    process(b0, 0)
    process(b1, 1)
    want = snapshot()
    assert want == ([1, 2, 4], [1, 2, 4])
    # replay batch 1 (as after a crash post-state-write, pre-out-write):
    # state already contains batch 1's own signatures — they must be
    # excluded from the filter, not self-match
    process(b1, 1)
    assert snapshot() == want
    # replay batch 0 too (both partitions already present)
    process(b0, 0)
    assert snapshot() == want


def test_stream_novelty_scores_parity_with_batch(spark, tmp_path):
    """Two micro-batches scored by the stream must equal running the
    batch operator per cut: batch0 vs empty state, batch1 vs batch0's
    grams — and the streamed state is the batch gram_state union."""
    import json as jsonlib

    import pyspark.sql.types as T

    from bunsen_spark.operators.text_analysis import (
        gram_state,
        novelty_against_state,
    )
    from bunsen_spark.streaming.ingest import stream_novelty_scores

    src = tmp_path / "nov_stream"
    src.mkdir()
    b0 = {1: "a b c d e", 2: "x y z w v"}
    b1 = {3: "a b c d e", 4: "p q r s t"}  # 3 repeats 1 exactly
    with open(src / "b0.jsonl", "w") as f:
        for i, t in b0.items():
            f.write(jsonlib.dumps({"doc_id": i, "text": t}) + "\n")
    with open(src / "b1.jsonl", "w") as f:
        for i, t in b1.items():
            f.write(jsonlib.dumps({"doc_id": i, "text": t}) + "\n")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = str(tmp_path / "nov_scores")
    state = str(tmp_path / "nov_state")
    q = stream_novelty_scores(
        stream, state, str(tmp_path / "nov_ckpt"), out, n=3
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: (r.total_grams, r.novel_grams)
        for r in spark.read.parquet(out).collect()
    }
    df0 = spark.createDataFrame(list(b0.items()), schema)
    df1 = spark.createDataFrame(list(b1.items()), schema)
    empty = spark.createDataFrame([], "gram string")
    want = {
        r.doc_id: (r.total_grams, r.novel_grams)
        for r in novelty_against_state(df0, empty, 3).collect()
    }
    want.update(
        {
            r.doc_id: (r.total_grams, r.novel_grams)
            for r in novelty_against_state(df1, gram_state(df0, 3), 3).collect()
        }
    )
    assert got == want
    # doc 3 (exact repeat across the batch cut) scored zero novel
    assert got[3][1] == 0 and got[1][1] == got[1][0]
    # streamed state == batch union state
    streamed = sorted(r.gram for r in spark.read.parquet(state).collect())
    union = sorted(
        r.gram
        for r in gram_state(df0, 3).unionByName(gram_state(df1, 3)).distinct().collect()
    )
    assert streamed == sorted(set(streamed)) == union
