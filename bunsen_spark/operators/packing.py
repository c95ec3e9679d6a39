"""Sequence packing for LLM pretraining: concat-and-chunk assignment.

Beyond-reference training-data operator. Pretraining pipelines pack
documents into fixed-size context windows by concatenating a shard's
token stream and slicing it into ``max_tokens`` chunks. The assignment
(which chunk does each document start in, at what offset) is computed
here entirely with deterministic hashing + one window cumulative sum —
no RNG, no driver state, and the only shuffle is the per-shard sort.

Scale shape: documents hash into ``num_shards`` independent streams
(shards ≈ writer tasks at 100 TB); within a shard the running token
offset is a window cumsum ordered by (md5(doc_id), doc_id) — a single
sort-based window whose partitions are the shards, so the plan is one
exchange + one sorted window regardless of corpus size.

``num_shards`` is the scale knob: each shard is one sort task, so it
must grow with the corpus. The default derives from the input's
partition count (``df.rdd.getNumPartitions()``), which already tracks
input bytes / ``spark.sql.files.maxPartitionBytes``:

=============  ==================  =======================
corpus         input partitions    derived shards (~task)
=============  ==================  =======================
60 MB local    ~32                 32 × ~2 MB sorts
1 TB cluster   ~8,000              8,000 × ~128 MB sorts
100 TB         ~800,000            800,000 × ~128 MB sorts
=============  ==================  =======================

Pass ``num_shards`` explicitly when the output layout is contractual
(the correctness gate pins 32 so its DuckDB oracle can mirror the
shard assignment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import md5int, md5int_sql

#: token estimator shared with the oracle: whitespace-ish word count
_TOKENS = "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
_TOKENS_SQL = "len(regexp_extract_all(lower(text), '[a-z0-9]+'))"


def pack_concat_chunks(
    docs: DataFrame, max_tokens: int = 512, num_shards: int | None = None
) -> DataFrame:
    """(doc_id, shard, start_off, first_chunk): where each document
    lands in its shard's concatenated token stream. ``start_off`` is
    the running token offset before the document; ``first_chunk`` is
    the ``max_tokens`` window that offset falls in.

    ``num_shards=None`` derives the shard count from the cluster's
    default parallelism — a stable proxy for available cores that does
    NOT depend on the input's physical partitioning (AQE, file-split
    config, upstream repartitions), so identical data on the same
    cluster packs identically. It still varies ACROSS clusters: any
    consumer that caches or compares packed layouts between
    environments must pass an explicit ``num_shards`` — that is the
    contractual, layout-stable path (tested in
    ``tests/test_packing.py``). Reading ``defaultParallelism`` is also
    free, where the previous input-partition probe forced a full
    physical-plan → RDD conversion just to read a count."""
    if num_shards is None:
        num_shards = max(docs.sparkSession.sparkContext.defaultParallelism, 1)
    base = docs.select(
        "doc_id",
        F.expr(_TOKENS).alias("n_tokens"),
        (md5int(F.col("doc_id").cast("string")) % num_shards).alias("shard"),
        md5int(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = base.select(
        "doc_id",
        "shard",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("start_off"),
    )
    # integer `div` matches DuckDB's `//` on non-negative longs (a
    # double-cast BIGINT would round, not truncate, in DuckDB)
    return offs.withColumn("first_chunk", F.expr(f"start_off div {max_tokens}"))


def pack_concat_chunks_sql(
    table: str = "documents", max_tokens: int = 512, num_shards: int = 32
) -> str:
    h = md5int_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKENS_SQL} AS n_tokens,
         {h} % {num_shards} AS shard, {h} AS h
  FROM {table}
)
SELECT doc_id, shard, start_off, start_off // {max_tokens} AS first_chunk
FROM (
  SELECT doc_id, shard,
         -- CAST: DuckDB SUM(int) is HUGEINT → float64 under a pandas fetch;
         -- Spark's window SUM is BIGINT, so pin the oracle type for hash parity.
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_off
  FROM base
) __offs
"""


def padding_waste_stats(docs: DataFrame, bucket_width: int = 32) -> DataFrame:
    """Length-bucketed batching ROI report: group documents into
    token-length buckets of ``bucket_width`` and report, per bucket,
    how many pad tokens batch-padding costs INSIDE the bucket versus
    padding everything to the global maximum — the numbers behind the
    "bucket your sequences" throughput win (dynamic batching à la
    fairseq/HF ``group_by_length``). Output per bucket:

        ``(bucket, n_docs, max_len, sum_tokens, pad_in_bucket,
           pad_to_global)``

    where ``pad_in_bucket = n_docs·max_len − sum_tokens`` (pad to the
    bucket's own max) and ``pad_to_global = n_docs·global_max −
    sum_tokens``. All exact longs; corpus padding efficiency =
    ``sum(pad_in_bucket) / sum(pad_to_global)`` left to the consumer.

    One map-side-combined aggregate on ``floor(len/width)`` plus a
    broadcast 1-row global max — no window, no second scan of the
    corpus (the global max reduces the tiny bucket table)."""
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    lens = docs.select(
        F.expr(_TOKENS).cast("long").alias("__len")
    ).withColumn("bucket", F.expr(f"__len div {bucket_width}"))
    agg = lens.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("__len").alias("max_len"),
        F.sum("__len").alias("sum_tokens"),
    )
    gmax = F.broadcast(agg.agg(F.max("max_len").alias("__gmax")))
    return agg.crossJoin(gmax).select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_docs",
        F.col("max_len").cast("long").alias("max_len"),
        F.col("sum_tokens").cast("long").alias("sum_tokens"),
        (F.col("n_docs") * F.col("max_len") - F.col("sum_tokens"))
        .cast("long")
        .alias("pad_in_bucket"),
        (F.col("n_docs") * F.col("__gmax") - F.col("sum_tokens"))
        .cast("long")
        .alias("pad_to_global"),
    )


def padding_waste_stats_sql(
    table: str = "documents", bucket_width: int = 32
) -> str:
    """DuckDB twin of :func:`padding_waste_stats`."""
    return f"""
WITH lens AS (
  SELECT CAST({_TOKENS_SQL} AS BIGINT) AS l,
         CAST({_TOKENS_SQL} AS BIGINT) // {bucket_width} AS bucket
  FROM {table}
),
agg AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(max(l) AS BIGINT) AS max_len,
         CAST(sum(l) AS BIGINT) AS sum_tokens
  FROM lens GROUP BY bucket
),
g AS (SELECT max(max_len) AS gmax FROM agg)
SELECT bucket, n_docs, max_len, sum_tokens,
       CAST(n_docs * max_len - sum_tokens AS BIGINT) AS pad_in_bucket,
       CAST(n_docs * g.gmax - sum_tokens AS BIGINT) AS pad_to_global
FROM agg CROSS JOIN g
"""


def snake_shard_assign(
    df: DataFrame,
    size_col: str | F.Column,
    n_shards: int,
    id_col: str = "doc_id",
    out_col: str = "shard_id",
) -> DataFrame:
    """Deterministic BALANCED shard assignment by size — the output-
    sharding step of a training-data writer ("split this corpus into N
    shard files of near-equal token mass"): order documents by
    ``(size desc, id)`` and deal them into ``n_shards`` in SNAKE
    (boustrophedon) order, so each shard receives one document per
    round and alternating rounds reverse direction — the classic
    near-optimal LPT-lite guarantee (shard masses differ by at most one
    document's size per round pair) with ZERO coordination: the shard
    id is pure arithmetic on the global rank.

    100 TB design: the only machinery is :func:`~bunsen_spark.operators.
    windows.global_row_number` (range repartition + broadcast offsets);
    no greedy driver loop, no single-partition window. Appends
    ``out_col`` (0-based shard id)."""
    from .windows import global_row_number

    sized = df.withColumn("__sz", F.col(size_col) if isinstance(size_col, str) else size_col)
    ranked = global_row_number(sized, [F.desc("__sz"), F.asc(id_col)], out_col="__rn")
    block = ((F.col("__rn") - 1) / n_shards).cast("long")
    pos = (F.col("__rn") - 1) % n_shards
    snake = F.when(block % 2 == 0, pos).otherwise(F.lit(n_shards - 1) - pos)
    return ranked.withColumn(out_col, snake.cast("long")).drop("__rn", "__sz")


def snake_shard_stats_sql(
    table: str,
    size_expr: str,
    n_shards: int,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``snake_shard_assign(...).groupBy(shard_id)``:
    the same snake arithmetic over a plain global ``row_number``."""
    return f"""
WITH sized AS (SELECT {id_col}, {size_expr} AS sz FROM {table}),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY sz DESC, {id_col}) AS rn FROM sized
),
assigned AS (
  SELECT sz,
         CASE WHEN ((rn - 1) // {n_shards}) % 2 = 0
              THEN (rn - 1) % {n_shards}
              ELSE {n_shards - 1} - ((rn - 1) % {n_shards}) END AS shard_id
  FROM ranked
)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(sz) AS BIGINT) AS token_mass
FROM assigned GROUP BY shard_id
"""
