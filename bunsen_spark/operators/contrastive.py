"""Deterministic negative-pair sampling for contrastive training —
every anchor document gets ``k`` pseudo-random partners, reproducibly,
without a global index or a cartesian join.

Beyond-reference scale extension (SURVEY §7 M7 family). The naive
formulations both fail at 100 TB: ``ORDER BY rand()`` self-joins are
cartesian, and "partner = hash mod n" needs a dense global row index
(a total-order sort). Hash-bucket sampling avoids both:

1. every doc is assigned to one of ``n_buckets`` by a hash of its id
   (map-only);
2. one representative per bucket is chosen by a min-hash aggregate —
   a ``n_buckets``-row table, built with one map-side-combined
   aggregate and broadcast;
3. each anchor draws its slot-``i`` partner by hashing
   ``(id, i, seed)`` into a bucket and broadcast-joining the
   representative table. Self-pairs are dropped.

Trade-off (documented, not hidden): per slot, the partner pool is the
``n_buckets`` representatives, not the full corpus — size ``n_buckets``
to the negative-pool diversity the trainer needs (2^16+ in practice;
the pool re-randomizes with ``seed`` every epoch). In exchange the
whole operator is two broadcast joins and zero corpus-wide shuffles.

The hash is the portable md5 family so an oracle reproduces the exact
pairs; a seed change re-draws everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_analysis import md5int, md5int_sql


def negative_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    n_buckets: int = 1 << 10,
    seed: int = 0,
) -> DataFrame:
    """``(anchor_id, slot, neg_id)``: ``k`` deterministic negatives per
    anchor, drawn from per-bucket representatives.

    An anchor can receive FEWER than ``k`` negatives for two reasons,
    both deterministic: (a) a slot whose representative is the anchor
    itself is dropped (self-collision), and (b) a slot whose draw
    lands in an EMPTY bucket — one no document hashed into — has no
    representative to join, so the inner join drops it silently. (b)
    matters when the corpus is small relative to ``n_buckets``
    (expected empty fraction ``~exp(-n_docs/n_buckets)``); size
    ``n_buckets`` well below the corpus count if a near-``k``
    per-anchor guarantee matters. Both engines (this operator and the
    SQL twin) share the identical drop semantics, so the gate stays
    exact either way."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    ids = docs.select(F.col(id_col).alias("id"))
    bucket = md5int(F.concat_ws(":", F.lit("b"), F.lit(seed), F.col("id"))) % n_buckets
    # representative = the id with the smallest (hash, id) in its bucket
    rep_rank = md5int(F.concat_ws(":", F.lit("r"), F.lit(seed), F.col("id")))
    reps = (
        ids.select(bucket.alias("bucket"), F.struct(rep_rank.alias("h"), F.col("id").alias("id")).alias("s"))
        .groupBy("bucket")
        .agg(F.min("s").alias("s"))
        .select("bucket", F.col("s.id").alias("neg_id"))
    )
    slots = ids.select(
        F.col("id").alias("anchor_id"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("slot"),
    )
    draw = (
        md5int(
            F.concat_ws(":", F.lit("d"), F.lit(seed), F.col("anchor_id"), F.col("slot"))
        )
        % n_buckets
    )
    return (
        slots.withColumn("bucket", draw)
        .join(F.broadcast(reps), "bucket")
        .where(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", F.col("slot").cast("long").alias("slot"), "neg_id")
    )


def negative_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    k: int = 4,
    n_buckets: int = 1 << 10,
    seed: int = 0,
) -> str:
    """DuckDB twin of :func:`negative_pairs`."""
    b = md5int_sql(f"concat_ws(':', 'b', '{seed}', {id_col})")
    r = md5int_sql(f"concat_ws(':', 'r', '{seed}', {id_col})")
    d = md5int_sql("concat_ws(':', 'd', '" + str(seed) + "', anchor_id, slot)")
    return f"""
WITH ids AS (
  SELECT {id_col} AS id, ({b}) % {n_buckets} AS bucket, ({r}) AS h
  FROM {table}
), reps AS (
  SELECT bucket, id AS neg_id FROM (
    SELECT bucket, id,
           row_number() OVER (PARTITION BY bucket ORDER BY h, id) AS rn
    FROM ids
  ) WHERE rn = 1
), slots AS (
  SELECT id AS anchor_id, CAST(s AS BIGINT) AS slot
  FROM ids, unnest(generate_series(1, {k})) u(s)
), drawn AS (
  SELECT anchor_id, slot, ({d}) % {n_buckets} AS bucket FROM slots
)
SELECT anchor_id, slot, reps.neg_id
FROM drawn JOIN reps USING (bucket)
WHERE reps.neg_id <> anchor_id
"""
