"""Streaming joins: static enrichment and watermarked stream-stream.

Beyond-reference extension (the reference is batch-only). Two shapes a
continuous training-data pipeline needs:

- **stream-static enrich**: every micro-batch joins against a slowly-
  changing dimension (user tiers, document metadata, allow/deny
  lists). The static side is re-planned per micro-batch, so metadata
  updates between triggers are picked up; broadcast it when small.
- **stream-stream join**: correlate two event streams (views ⋈
  purchases, requests ⋈ completions). Both sides carry watermarks and
  the join condition carries a time interval — this is what lets Spark
  EVICT buffered state: rows older than (watermark − interval) can
  never match and are dropped, keeping state O(window), not O(stream).

At scale the stream-stream join shuffles both streams on the key per
micro-batch; size ``spark.sql.shuffle.partitions`` to the executor
count and keep the interval as tight as the use-case allows — state
size is rate × interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static join: attach dimension columns to each streaming
    row. ``broadcast=True`` hints the static side (correct whenever the
    dimension fits an executor — the common case for metadata tables)."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    lower: str = "0 seconds",
    upper: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: pairs where
    ``right_ts ∈ [left_ts + lower, left_ts + upper]`` and the keys
    match. Both watermarks plus the bounded interval give Spark a state
    eviction rule on BOTH buffers (unbounded stream-stream joins are
    rejected by the engine for exactly this reason)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= F.expr(f"{left_ts} + interval {lower}"))
        & (rw[right_ts] <= F.expr(f"{left_ts} + interval {upper}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[on])
