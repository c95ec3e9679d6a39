"""Streaming count-min maintenance: the merged per-batch sketch must
EQUAL the all-at-once batch sketch (mergeability is exact)."""

from __future__ import annotations

import json as jsonlib

import pyspark.sql.types as T

SCHEMA = T.StructType([T.StructField("v", T.StringType())])


def _cells(df):
    return sorted((r.row, r.col, r.cnt) for r in df.collect())


def test_stream_countmin_equals_batch_sketch(spark, tmp_path):
    from bunsen_spark.operators.sketches import countmin_table
    from bunsen_spark.streaming.sketches import read_countmin, stream_countmin

    src = tmp_path / "vals"
    src.mkdir()
    all_rows = []
    for b in range(3):
        with open(src / f"b{b}.jsonl", "w") as f:
            for i in range(40):
                v = f"user{(b * 7 + i) % 13}"
                all_rows.append((v,))
                f.write(jsonlib.dumps({"v": v}) + "\n")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    path = str(tmp_path / "sketch")
    q = stream_countmin(
        stream, "v", path, str(tmp_path / "ckpt"), width=32, depth=3
    )
    q.awaitTermination(180)

    merged = read_countmin(spark, path)
    batch = countmin_table(
        spark.createDataFrame(all_rows, SCHEMA), "v", width=32, depth=3
    )
    assert _cells(merged) == _cells(batch)
    # three per-batch partitions exist
    n_parts = (
        spark.read.parquet(path).select("batch_id").distinct().count()
    )
    assert n_parts == 3


def test_stream_countmin_replay_idempotent(spark, tmp_path):
    from bunsen_spark.operators.sketches import countmin_table
    from bunsen_spark.streaming import sketches as mod
    from bunsen_spark.streaming.sketches import read_countmin

    captured = {}

    class _FakeStream:
        class writeStream:  # noqa: N801
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

    path = str(tmp_path / "sketch")
    mod.stream_countmin(
        _FakeStream, "v", path, str(tmp_path / "ck"), width=16, depth=2
    )
    process = captured["fn"]
    b0 = spark.createDataFrame([("a",), ("b",), ("a",)], SCHEMA)
    b1 = spark.createDataFrame([("b",), ("c",)], SCHEMA)
    process(b0, 0)
    process(b1, 1)
    want = _cells(read_countmin(spark, path))
    process(b0, 0)  # replay: overwrites only its own partition
    process(b1, 1)
    assert _cells(read_countmin(spark, path)) == want
    # and the estimates still match the batch-built sketch
    batch = countmin_table(
        spark.createDataFrame(
            [("a",), ("b",), ("a",), ("b",), ("c",)], SCHEMA
        ),
        "v", width=16, depth=2,
    )
    assert want == _cells(batch)


def test_stream_hll_matches_all_at_once(spark, tmp_path):
    from bunsen_spark.operators.sketches import distinct_sketches
    from bunsen_spark.streaming.sketches import (
        read_distinct_sketches,
        stream_distinct_sketches,
    )

    schema = T.StructType(
        [T.StructField("g", T.StringType()), T.StructField("v", T.StringType())]
    )
    src = tmp_path / "gv"
    src.mkdir()
    all_rows = []
    for b in range(3):
        with open(src / f"b{b}.jsonl", "w") as f:
            for i in range(60):
                g, v = f"g{i % 2}", f"val{(b * 31 + i) % 45}"
                all_rows.append((g, v))
                f.write(jsonlib.dumps({"g": g, "v": v}) + "\n")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    path = str(tmp_path / "hll")
    q = stream_distinct_sketches(
        stream, "g", "v", path, str(tmp_path / "ckpt"), lg_k=12
    )
    q.awaitTermination(180)

    merged = {
        r.grp: r.estimate
        for r in read_distinct_sketches(spark, path).collect()
    }
    batch = {
        r.grp: r.estimate
        for r in distinct_sketches(
            spark.createDataFrame(all_rows, schema), "g", "v", 12
        ).collect()
    }
    assert merged == batch
    # sanity: estimates are near the true distinct counts
    import collections

    true = collections.defaultdict(set)
    for g, v in all_rows:
        true[g].add(v)
    for g, est in merged.items():
        assert abs(est - len(true[g])) <= max(2, 0.05 * len(true[g]))


def test_stream_bloom_matches_batch_filter(spark, tmp_path):
    from bunsen_spark.operators.bloom import bloom_prefilter, bloom_words
    from bunsen_spark.streaming.sketches import read_bloom, stream_bloom

    src = tmp_path / "keys"
    src.mkdir()
    all_rows = []
    for b in range(3):
        with open(src / f"b{b}.jsonl", "w") as f:
            for i in range(50):
                v = f"key{(b * 50 + i)}"
                all_rows.append((v,))
                f.write(jsonlib.dumps({"v": v}) + "\n")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    path = str(tmp_path / "bloom")
    q = stream_bloom(
        stream, "v", path, str(tmp_path / "ckpt"), num_bits=1 << 12, num_hashes=3
    )
    q.awaitTermination(180)

    merged = read_bloom(spark, path)
    batch = bloom_words(
        spark.createDataFrame(all_rows, SCHEMA), "v", 1 << 12, 3
    )
    assert sorted((r.word_idx, r.word) for r in merged.collect()) == sorted(
        (r.word_idx, r.word) for r in batch.collect()
    )
    # no false negatives: every seen key passes the streamed filter
    probes = spark.createDataFrame(all_rows, SCHEMA)
    kept = bloom_prefilter(probes, "v", merged, 1 << 12, 3)
    assert kept.count() == len(all_rows)
