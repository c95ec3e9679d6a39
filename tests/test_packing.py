"""Sequence packing (operators.packing) — shard-count derivation and
offset invariants. The value-level gate is ``pack_chunks`` in
CORRECTNESS (DuckDB oracle with num_shards pinned to 32)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bunsen_spark.operators.packing import pack_concat_chunks


def _docs(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word "), F.repeat(F.lit("tok "), (F.col("id") % 7 + 1).cast("int"))).alias(
            "text"
        ),
    )


def test_default_num_shards_tracks_input_partitions(spark):
    docs = _docs(spark).repartition(7)
    out = pack_concat_chunks(docs)
    shards = {r["shard"] for r in out.select("shard").distinct().collect()}
    assert shards <= set(range(7))
    assert len(shards) > 1  # hash actually spreads across derived shards


def test_explicit_num_shards_and_offset_invariants(spark):
    out = pack_concat_chunks(_docs(spark), max_tokens=8, num_shards=4).collect()
    assert {r["shard"] for r in out} <= set(range(4))
    # first_chunk is integer division of the running offset
    assert all(r["first_chunk"] == r["start_off"] // 8 for r in out)
    # exactly one document per shard starts at offset 0
    starts = [r for r in out if r["start_off"] == 0]
    assert len(starts) == len({r["shard"] for r in out})
