"""Streaming ANN-index maintenance: encode arriving embedding rows
against a FROZEN product-quantization codebook and append their 8-byte
codes to the persisted index — the standard production split (train the
quantizer offline on a sample; keep the index fresh online without
retraining). Follows this package's foreachBatch conventions
(per-batch-partition writes, dynamic overwrite for replay idempotence,
availableNow triggers for bounded catch-up runs).

No reference counterpart (the reference is batch-only; SURVEY §2) —
beyond-reference extension composing `operators/similarity.py`'s PQ
family with Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_pq_encode(
    embeddings_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    n_subs: int | None = None,
    trigger_available_now: bool = True,
):
    """Append PQ codes for streaming (vec_id, embedding) rows to
    ``{index_path}/codes_stream`` (kept separate from the batch-built
    ``codes`` so replayed micro-batches can dynamic-overwrite their own
    partition; readers merge both sides via :func:`read_stream_codes`,
    which :func:`operators.similarity.read_pq_index` delegates to).
    The codebooks are read from
    ``{index_path}/books`` once per micro-batch (tiny; broadcast by the
    encoder) and NEVER modified — geometry is pinned by the index
    builder (:func:`operators.similarity.write_pq_index`). Replayed
    batches overwrite their own partition (idempotent)."""
    from ..operators.similarity import PQ_SUBS, pq_encode

    subs = PQ_SUBS if n_subs is None else n_subs

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        books = batch_df.sparkSession.read.parquet(f"{index_path}/books")
        (
            pq_encode(batch_df, books, subs)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{index_path}/codes_stream")
        )

    writer = embeddings_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_codes(spark, index_path: str) -> DataFrame:
    """All live codes of a streamed-into PQ index: the manifest's base
    generation plus every streaming/batch append partition a compaction
    has not folded — the frame :func:`pq_index_topk`-style scoring
    consumes (tombstones are applied by
    :func:`operators.similarity.read_pq_index`, not here)."""
    from ..operators.similarity import _merged_index_codes

    return _merged_index_codes(spark, index_path, ["vec_id", "sub", "code"])


def stream_ivfpq_encode(
    embeddings_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    n_subs: int | None = None,
    trigger_available_now: bool = True,
):
    """Append IVF-PQ codes for streaming (vec_id, embedding) rows to
    ``{index_path}/codes_stream``: each arrival is coarse-assigned to
    its nearest FROZEN cell centroid and its residual encoded against
    the FROZEN shared codebooks — the standard IVFADC online-insert
    path (no retraining; geometry pinned by
    :func:`operators.similarity.write_ivfpq_index`). Both quantizer
    tables are read once per micro-batch (tiny; broadcast by the
    encoder); replayed batches dynamic-overwrite their own partition
    (idempotent). Readers merge base + stream via
    :func:`read_stream_ivfpq_codes`, which
    :func:`operators.similarity.read_ivfpq_index` delegates to."""
    from ..operators.similarity import PQ_SUBS, ivfpq_encode

    subs = PQ_SUBS if n_subs is None else n_subs

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        coarse = spark.read.parquet(f"{index_path}/coarse")
        books = spark.read.parquet(f"{index_path}/books")
        (
            ivfpq_encode(batch_df, coarse, books, subs)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{index_path}/codes_stream")
        )

    writer = embeddings_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_ivfpq_codes(spark, index_path: str) -> DataFrame:
    """All live (vec_id, ccid, sub, code) rows of a streamed-into
    IVF-PQ index — batch-built base plus streaming appends, minus
    partitions a compaction already folded into the base. Delegates to
    the manifest-aware merge so batch and streaming readers can never
    disagree about which partitions are live
    (:func:`operators.similarity.compact_ivfpq_index`)."""
    from ..operators.similarity import _merged_ivfpq_codes

    return _merged_ivfpq_codes(spark, index_path)


def stream_tombstones(
    ids_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Append tombstone partitions for streaming (vec_id, ...) rows —
    the erasure half of the online index lifecycle (a GDPR/takedown
    queue is a stream exactly like the ingest side): each micro-batch
    writes ``{index_path}/tombstones/batch_id={engine_batch_id}`` with
    dynamic partition overwrite, so a replayed micro-batch overwrites
    its own partition (idempotent) while distinct batches accumulate —
    the same discipline as :func:`stream_pq_encode` /
    :func:`stream_ivfpq_encode`, and the same layout batch deletes
    write (:func:`operators.similarity.delete_from_ivfpq_index`;
    engine batch ids are small monotonic ints, content-derived batch
    ids 63-bit hashes, so the two writers cannot collide). Readers of
    BOTH index types apply the merged live tombstone set on their
    side; ``compact_*_index`` folds and retires the partitions."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select("vec_id")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{index_path}/tombstones")
        )

    writer = ids_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
