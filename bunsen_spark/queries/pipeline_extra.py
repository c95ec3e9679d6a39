"""Gate queries for the round-4 additions: Bloom-prefiltered semi join
and overlapping token-window chunking."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load
from ..persist import materialize, materialize_eager


def bloom_prefilter_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier shipped volume, restricted to high-balance
    suppliers via a Bloom-prefiltered exact semi join
    (`operators/bloom.py`). The result is identical to a plain semi
    join — the oracle IS the plain semi join — which gates the
    no-false-negative property on real data. The fact table never
    shuffles before the prefilter; rows surviving the ~KiB broadcast
    word-table probes are the only ones that reach the join."""
    from ..operators.bloom import bloom_semi_join

    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    dim = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 8000)
    kept = bloom_semi_join(li, "l_suppkey", dim, "s_suppkey",
                           num_bits=1 << 14, num_hashes=5)
    return (
        kept.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(20,6)")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_suppkey")
    )


BLOOM_PREFILTER_SQL = """
SELECT l_suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 8000)
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token windows (stride 48) over every document —
    one zero-shuffle map stage (`operators/chunking.py`)."""
    from ..operators.chunking import chunk_documents

    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=64, overlap=16)


def _chunk_sql() -> str:
    from ..operators.chunking import chunk_documents_sql

    return chunk_documents_sql(chunk_size=64, overlap=16)


CM_WIDTH, CM_DEPTH = 512, 4


def countmin_user_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-count estimates from a count-min cell table
    (`operators/sketches.py`): build with one bounded aggregate
    (≤ depth×width cells), probe the distinct users against the
    broadcast table, return the top 25 by estimate. The estimate is
    deterministic (min over fixed hash rows, portable md5 hash
    family), so the DuckDB twin reproduces it bit-for-bit — the sketch
    itself is under the gate, not just its error bound."""
    from ..operators.sketches import countmin_estimate, countmin_table

    e = load(spark, sf_dir, "events").select("user_id")
    table = countmin_table(e, "user_id", width=CM_WIDTH, depth=CM_DEPTH, portable=True)
    probes = e.distinct()
    est = countmin_estimate(probes, "user_id", table,
                            width=CM_WIDTH, depth=CM_DEPTH, portable=True)
    return (
        est.select("user_id", "cm_estimate")
        .orderBy(F.col("cm_estimate").desc(), "user_id")
        .limit(25)
    )


def _countmin_sql() -> str:
    from ..operators.sketches import cm_pos_sql

    cell_rows = " UNION ALL ".join(
        f"SELECT {r} AS row, {cm_pos_sql('v', r, CM_WIDTH)} AS col FROM vals"
        for r in range(CM_DEPTH)
    )
    probe_cols = ", ".join(
        f"{cm_pos_sql('user_id', r, CM_WIDTH)} AS col_{r}" for r in range(CM_DEPTH)
    )
    # COALESCE mirrors countmin_estimate's 0 for missing cells; DuckDB's
    # least() ignores NULLs, so a bare scalar subquery would diverge from
    # Spark for probes absent from the build set (advisor r4 finding)
    mins = ", ".join(
        f"COALESCE((SELECT cnt FROM cells WHERE row = {r} AND col = p.col_{r}), 0)"
        for r in range(CM_DEPTH)
    )
    return f"""
WITH vals AS (
  SELECT user_id AS v FROM events
), cells AS (
  SELECT row, col, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({cell_rows})
  GROUP BY row, col
), probes AS (
  SELECT DISTINCT user_id, {probe_cols} FROM events
)
SELECT user_id, CAST(least({mins}) AS BIGINT) AS cm_estimate
FROM probes p
ORDER BY cm_estimate DESC, user_id
LIMIT 25
"""


def dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One incremental near-dup step (`operators/dedup.py:
    incremental_near_dup`): state = MinHash signatures of docs with
    doc_id < 250, batch = the rest; returns the surviving batch docs.
    LSH band join bounds candidates; exact-Jaccard verify keeps
    precision 1 — the oracle recomputes the identical hash pipeline."""
    from ..operators.dedup import incremental_near_dup, minhash_state

    docs = load(spark, sf_dir, "documents")
    # the state feeds both the bucket join and the verify join inside
    # the operator; a real deployment reads it from parquet (one scan
    # per consumer), but here it is computed — materialize it once
    state = minhash_state(
        docs.where(F.col("doc_id") < 250), portable=True
    ).transform(materialize_eager)
    batch = docs.where(F.col("doc_id") >= 250)
    kept = incremental_near_dup(batch, state, threshold=0.5, portable=True)
    return kept.select("doc_id", F.size("hs").cast("long").alias("n_shingles"))


def _incr_near_sql() -> str:
    from ..operators.dedup import incremental_near_dup_sql

    return incremental_near_dup_sql("documents", "doc_id < 250", 0.5)


def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (Markov/sequence-feature
    prep): one lag window partitioned by user + one aggregate. The
    window shuffles each user's events once; the transition matrix is
    |event_types|² rows — tiny at any corpus scale. Ties on identical
    timestamps are broken by event_id so the sequence (and the oracle's)
    is total-ordered."""
    from pyspark.sql import Window as W
    from . import ts_us

    e = load(spark, sf_dir, "events")
    e = e.select("user_id", "event_id", "event_type", ts_us(e).alias("us"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
"""


MIX_TARGETS = {"en": 0.5, "de": 0.15, "es": 0.15, "fr": 0.1, "zh": 0.1}


def corpus_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing mix (`operators/sampling.py:
    mix_to_proportions`): down-sample each language to approximate the
    target char-mass shares, then report per-language survivors. The
    corpus is never shuffled — one tiny per-language aggregate feeds a
    broadcast rate table and a single hash filter."""
    from ..operators.sampling import mix_to_proportions

    docs = load(spark, sf_dir, "documents")
    mixed = mix_to_proportions(docs, "doc_id", "lang", "n_chars", MIX_TARGETS)
    return (
        mixed.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("char_mass"),
        )
        .orderBy("lang")
    )


def _mix_sql() -> str:
    from ..operators.sampling import mix_to_proportions_sql

    inner = mix_to_proportions_sql("documents", "doc_id", "lang", "n_chars", MIX_TARGETS)
    return f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS char_mass
FROM ({inner}) m
GROUP BY lang
ORDER BY lang
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bloom_prefilter_supplier_volume": bloom_prefilter_supplier_volume,
    "doc_chunk_windows": doc_chunk_windows,
    "countmin_user_frequencies": countmin_user_frequencies,
    "dedup_incremental_near": dedup_incremental_near,
    "corpus_mix_counts": corpus_mix_counts,
    "event_transition_counts": event_transition_counts,
}

ORACLES: dict[str, str] = {
    "bloom_prefilter_supplier_volume": BLOOM_PREFILTER_SQL,
    "doc_chunk_windows": _chunk_sql(),
    "countmin_user_frequencies": _countmin_sql(),
    "dedup_incremental_near": _incr_near_sql(),
    "corpus_mix_counts": _mix_sql(),
    "event_transition_counts": EVENT_TRANSITIONS_SQL,
}
