"""Streaming SCD2 dimension maintenance: end-to-end file stream,
replay idempotence, and parity with the batch scd2_apply fold."""

from __future__ import annotations

import pytest

import json as jsonlib

import pyspark.sql.types as T
from pyspark.sql import functions as F

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("payload", T.StringType())]
)


def _dim_rows(spark, dim_path):
    from bunsen_spark.streaming.scd2 import read_scd2

    return sorted(
        (r.k, r.payload, r.valid_from, r.valid_to)
        for r in read_scd2(spark, dim_path, ["payload"], "k").collect()
    )


def test_stream_scd2_end_to_end(spark, tmp_path):
    from bunsen_spark.streaming.scd2 import stream_scd2_upserts

    src = tmp_path / "upserts"
    src.mkdir()
    with open(src / "b0.jsonl", "w") as f:
        f.write(jsonlib.dumps({"k": 1, "payload": "a"}) + "\n")
        f.write(jsonlib.dumps({"k": 2, "payload": "b"}) + "\n")
    with open(src / "b1.jsonl", "w") as f:
        f.write(jsonlib.dumps({"k": 1, "payload": "a"}) + "\n")  # no-op
        f.write(jsonlib.dumps({"k": 2, "payload": "c"}) + "\n")  # change
        f.write(jsonlib.dumps({"k": 3, "payload": "d"}) + "\n")  # insert
    with open(src / "b2.jsonl", "w") as f:
        f.write(jsonlib.dumps({"k": 1, "payload": "e"}) + "\n")  # change

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    dim = str(tmp_path / "dim")
    q = stream_scd2_upserts(
        stream, dim, str(tmp_path / "ckpt"), "k", ["payload"]
    )
    q.awaitTermination(180)

    assert _dim_rows(spark, dim) == [
        (1, "a", 1, 3),
        (1, "e", 3, None),
        (2, "b", 1, 2),
        (2, "c", 2, None),
        (3, "d", 2, None),
    ]


def _capture_process(fn_builder):
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

    fn_builder(_FakeStream)
    return captured["fn"]


def test_stream_scd2_replay_idempotent(spark, tmp_path):
    from bunsen_spark.streaming import scd2 as mod

    dim = str(tmp_path / "dim")
    process = _capture_process(
        lambda fake: mod.stream_scd2_upserts(
            fake, dim, str(tmp_path / "ck"), "k", ["payload"]
        )
    )
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    b1 = spark.createDataFrame([(2, "c"), (3, "d")], SCHEMA)
    process(b0, 0)
    process(b1, 1)
    want = _dim_rows(spark, dim)
    assert want == [
        (1, "a", 1, None),
        (2, "b", 1, 2),
        (2, "c", 2, None),
        (3, "d", 2, None),
    ]
    # replay both batches (crash-and-retry): the log must converge
    process(b1, 1)
    assert _dim_rows(spark, dim) == want
    process(b0, 0)
    assert _dim_rows(spark, dim) == want


@pytest.mark.slow
def test_stream_scd2_matches_batch_fold(spark, tmp_path):
    """Folding the same upsert batches through the BATCH scd2_apply
    (emulating upserts by overlaying each batch onto the open rows)
    yields the same versioned dimension the stream builds."""
    import random

    from bunsen_spark.operators.snapshot import scd2_apply
    from bunsen_spark.streaming import scd2 as mod

    rng = random.Random(23)
    batches = []
    for _ in range(4):
        ks = rng.sample(range(1, 8), k=rng.randint(1, 5))
        batches.append([(k, f"v{rng.randint(0, 2)}") for k in ks])

    dim = str(tmp_path / "dim")
    process = _capture_process(
        lambda fake: mod.stream_scd2_upserts(
            fake, dim, str(tmp_path / "ck"), "k", ["payload"]
        )
    )
    for i, rows in enumerate(batches):
        process(spark.createDataFrame(rows, SCHEMA), i)

    # batch fold: start from an empty dim; each step's "snapshot" is
    # the current open rows overlaid with the batch's upserts
    folded = spark.createDataFrame(
        [], "k long, payload string, valid_from long, valid_to long"
    )
    for i, rows in enumerate(batches):
        ts = i + 1
        batch = spark.createDataFrame(rows, SCHEMA).dropDuplicates(["k"])
        open_rows = folded.where(F.col("valid_to").isNull()).select(
            "k", "payload"
        )
        snapshot = open_rows.join(batch, "k", "left_anti").unionByName(batch)
        folded = scd2_apply(folded, snapshot, "k", ["payload"], ts)

    want = sorted(
        (r.k, r.payload, r.valid_from, r.valid_to) for r in folded.collect()
    )
    assert _dim_rows(spark, dim) == want


SEQ_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _apply_batches(spark, tmp_path, tag, batches):
    from bunsen_spark.streaming import scd2 as mod

    dim = str(tmp_path / f"dim_{tag}")
    process = _capture_process(
        lambda fake: mod.stream_scd2_upserts(
            fake, dim, str(tmp_path / f"ck_{tag}"), "k", ["payload"],
            seq_col="seq",
        )
    )
    for i, rows in enumerate(batches):
        process(spark.createDataFrame(rows, SEQ_SCHEMA), i)
    return dim


@pytest.mark.slow
def test_stream_scd2_open_rows_invariant_to_batch_cuts(spark, tmp_path):
    """However an upsert sequence is cut into micro-batches, the OPEN
    rows of the resulting dimension are identical (version timestamps
    differ — they count batches — but the final state must not)."""
    import random

    rng = random.Random(47)
    upserts = [
        (rng.randint(1, 6), f"v{rng.randint(0, 3)}", seq)
        for seq in range(24)
    ]

    def cut(n_batches):
        # contiguous cuts preserving order
        bounds = sorted(rng.sample(range(1, len(upserts)), n_batches - 1))
        out, prev = [], 0
        for b in [*bounds, len(upserts)]:
            out.append(upserts[prev:b])
            prev = b
        return [b for b in out if b]

    def open_rows(dim):
        from bunsen_spark.streaming.scd2 import read_scd2

        rows = read_scd2(spark, dim, ["payload"], "k").collect()
        return sorted(
            (r.k, r.payload) for r in rows if r.valid_to is None
        )

    # per key, the LAST upsert in sequence order wins (seq_col makes
    # intra-batch duplicates deterministic)
    expected = sorted({k: p for k, p, _ in upserts}.items())
    for tag, n in (("a", 2), ("b", 5), ("c", 8)):
        dim = _apply_batches(spark, tmp_path, tag, cut(n))
        assert open_rows(dim) == expected, f"cut into {n} batches diverged"
