"""Gate queries for the round-5 operator batches: exact substring-dup
spans, lossless prefix-filtered Jaccard join, surprisal scoring
(unigram + bigram), SCD2 dimension merge, Gram matrix, decayed
engagement, session paths, compaction planning, time-series resample,
vocab encoding, contrastive negative/positive pairs, daily top-k,
grouped median / min-max / winsorization, vocab drift, source
overlap, linkage blocking, budget-constrained selection, and the
per-source corpus report."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, ts_us

SCD2_TS = 100


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level duplicated-mass measurement
    (`operators/substrings.py:substring_dup_spans`): per document, how
    many chars sit inside a 20-gram that occurs >= 2 times corpus-wide
    — merged-interval arithmetic, all windows + integer columns."""
    from ..operators.substrings import substring_dup_spans

    docs = load(spark, sf_dir, "documents")
    return substring_dup_spans(
        docs.select("doc_id", "text"), k=20, min_df=2, portable=True
    ).orderBy("doc_id")


def _substring_sql() -> str:
    from ..operators.substrings import substring_dup_spans_sql

    return substring_dup_spans_sql("documents", k=20, min_df=2) + " ORDER BY doc_id"


def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless exact-Jaccard pair join via prefix filtering
    (`operators/setjoin.py:prefix_jaccard_pairs`, 3-gram shingle sets,
    t=0.5). The oracle is BRUTE-FORCE all-pairs, so a green row proves
    the prefix filter misses nothing — the recall guarantee the
    MinHash band family cannot give."""
    from ..operators.setjoin import prefix_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(
        docs.select("doc_id", "text"), threshold=0.5, shingle_n=3
    ).orderBy("doc_a", "doc_b")


def _prefix_jaccard_sql() -> str:
    from ..operators.setjoin import prefix_jaccard_pairs_sql

    return (
        prefix_jaccard_pairs_sql("documents", threshold=0.5, shingle_n=3)
        + " ORDER BY doc_a, doc_b"
    )


def text_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-bit unigram surprisal quality score
    (`operators/text_analysis.py:surprisal_score`): corpus vocab
    aggregate -> broadcast bits table -> per-doc sum; every number is
    bit-exact integer arithmetic (floor-log2 via binary length, no
    float log)."""
    from ..operators.text_analysis import surprisal_score

    docs = load(spark, sf_dir, "documents")
    return surprisal_score(docs.select("doc_id", "text")).orderBy("doc_id")


def _surprisal_sql() -> str:
    from ..operators.text_analysis import surprisal_score_sql

    return surprisal_score_sql("documents") + " ORDER BY doc_id"


def _scd2_frames(spark: SparkSession, sf_dir: str):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dim = docs.select(
        "doc_id",
        "text",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    survivors = docs.where(F.col("doc_id") % 7 != 0)
    changed = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
    ).otherwise(F.col("text"))
    inserts = docs.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("new-"), F.col("text")).alias("text"),
    )
    snapshot = survivors.select("doc_id", changed.alias("text")).unionByName(
        inserts
    )
    return dim, snapshot


_SCD2_DIM_SQL = """
SELECT doc_id, text, CAST(0 AS BIGINT) AS valid_from,
       CAST(NULL AS BIGINT) AS valid_to
FROM documents
"""

_SCD2_SNAP_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END AS text
FROM documents WHERE doc_id % 7 <> 0
UNION ALL
SELECT doc_id + 1000000 AS doc_id, 'new-' || text AS text
FROM documents WHERE doc_id < 20
"""


def scd2_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD merge (`operators/snapshot.py:scd2_apply`): roll a
    versioned documents dimension forward to a snapshot with deletes
    (doc_id%7=0), changes (doc_id%5=0), and inserts — one full-outer
    join + one generator explode, no per-case re-joins."""
    from ..operators.snapshot import scd2_apply

    dim, snapshot = _scd2_frames(spark, sf_dir)
    merged = scd2_apply(dim, snapshot, "doc_id", ["text"], SCD2_TS)
    # the gate projection maps the open-row NULL valid_to to -1: the
    # driver fetches DuckDB through pandas, where a NULL-able BIGINT
    # column widens to float64 ("100.0") and hash-mismatches Spark's
    # int — the operator itself keeps real NULL semantics
    return merged.select(
        "doc_id",
        "text",
        "valid_from",
        F.coalesce(F.col("valid_to"), F.lit(-1).cast("long")).alias("valid_to"),
    ).orderBy("doc_id", "valid_from")


def _scd2_sql() -> str:
    from ..operators.snapshot import scd2_apply_sql

    inner = scd2_apply_sql(
        _SCD2_DIM_SQL, _SCD2_SNAP_SQL, "doc_id", ["text"], SCD2_TS
    )
    return f"""
SELECT doc_id, text, valid_from,
       COALESCE(valid_to, CAST(-1 AS BIGINT)) AS valid_to
FROM ({inner}) __m
ORDER BY doc_id, valid_from
"""


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass distributed Gram matrix
    (`operators/similarity.py:gram_matrix`): the PCA/whitening/OPQ
    input statistic — map-side partial aggregation into d(d+1)/2
    integer-exact cells, one tiny final shuffle."""
    from ..operators.similarity import gram_matrix

    emb = load(spark, sf_dir, "embeddings")
    return gram_matrix(emb.select("embedding")).orderBy("i", "j")


def _gram_sql() -> str:
    from ..operators.similarity import gram_matrix_sql

    return gram_matrix_sql("embeddings") + " ORDER BY i, j"


_DECAY_REF_US = 1707955200000000  # 2024-02-15T00:00:00Z
_DECAY_HALF_LIFE_US = 3 * 24 * 3600 * 1_000_000  # 3 days


def decayed_user_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact half-life-decayed per-user engagement
    (`operators/engagement.py:decayed_counts`): weights are whole
    powers of two from integer half-life buckets, so the decayed sums
    are int64-exact in any partition order — the hash-gateable form of
    exponential decay scoring. One map-side-combined groupBy."""
    from ..operators.engagement import decayed_counts

    e = load(spark, sf_dir, "events")
    e = e.select(
        "user_id",
        ts_us(e).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return decayed_counts(
        e,
        "user_id",
        "us",
        ref_us=_DECAY_REF_US,
        half_life_us=_DECAY_HALF_LIFE_US,
        value_cents="cents",
    ).orderBy("user_id")


def _decay_sql() -> str:
    from ..operators.engagement import decayed_counts_sql

    inner = (
        "SELECT user_id, epoch_us(ts) AS us, "
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events"
    )
    return (
        decayed_counts_sql(
            inner,
            "user_id",
            "us",
            ref_us=_DECAY_REF_US,
            half_life_us=_DECAY_HALF_LIFE_US,
            value_cents="cents",
        )
        + " ORDER BY user_id"
    )


def session_path_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining (`operators/engagement.py:
    session_path_counts`): 3-step event-type paths inside 30-minute
    sessions — the sessionizer's shuffle is reused by the path window
    (same partition key), then one map-side-combined count."""
    from ..operators.engagement import session_path_counts
    from ..operators.sessionize import sessionize

    e = load(spark, sf_dir, "events")
    e = e.select("user_id", "event_id", "event_type", ts_us(e).alias("us"))
    gap = 30 * 60 * 1_000_000
    sessions = sessionize(
        e, ["user_id"], "us", gap, order_cols=["event_id"]
    )
    return session_path_counts(
        sessions,
        "user_id",
        "us",
        "session_id",
        "event_type",
        depth=3,
        order_cols=["event_id"],
    ).orderBy("path")


def _session_path_sql() -> str:
    from ..operators.engagement import session_path_counts_sql

    sessions = """
SELECT user_id, event_id, event_type, us,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, event_type, us,
         CASE WHEN us - LAG(us) OVER w > 1800000000 THEN 1
              WHEN LAG(us) OVER w IS NULL THEN 1
              ELSE 0 END AS is_new
  FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
) flagged
"""
    return (
        session_path_counts_sql(
            sessions,
            "user_id",
            "us",
            "session_id",
            "event_type",
            depth=3,
            order_cols=["event_id"],
        )
        + " ORDER BY path"
    )


def compaction_plan_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning
    (`sources/warehouse.py:plan_compaction`): documents stand in for a
    per-source file listing (doc_id = file, n_chars = bytes); files
    are packed into ~5000-byte bins with one window cumulative sum and
    the plan is summarized per (source, bin)."""
    from ..sources.warehouse import plan_compaction

    docs = load(spark, sf_dir, "documents")
    files = docs.select("source", "doc_id", F.col("n_chars").alias("bytes"))
    plan = plan_compaction(
        files,
        "bytes",
        target_bytes=5000,
        partition_cols=["source"],
        order_cols=["doc_id"],
    )
    return (
        plan.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(F.col("bytes").cast("long")).alias("bin_bytes"),
            F.min("doc_id").alias("first_file"),
        )
        .orderBy("source", "bin_id")
    )


def _compaction_sql() -> str:
    from ..sources.warehouse import plan_compaction_sql

    inner = plan_compaction_sql(
        "SELECT source, doc_id, n_chars AS bytes FROM documents",
        "bytes",
        target_bytes=5000,
        partition_cols=["source"],
        order_cols=["doc_id"],
    )
    return f"""
SELECT source, bin_id, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CAST(bytes AS BIGINT)) AS BIGINT) AS bin_bytes,
       min(doc_id) AS first_file
FROM ({inner}) __p
GROUP BY source, bin_id ORDER BY source, bin_id
"""


def resample_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-user daily resample
    (`operators/timeseries.py:resample_counts`): dense (user, day)
    grid between each user's first and last event, zero-filled — one
    aggregate, one span explode, one left join."""
    from ..operators.timeseries import resample_counts

    e = load(spark, sf_dir, "events")
    e = e.select(
        "user_id",
        ts_us(e).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    day_us = 24 * 3600 * 1_000_000
    return resample_counts(
        e, "user_id", "us", day_us, value_col="cents"
    ).orderBy("user_id", "bucket")


def _resample_sql() -> str:
    from ..operators.timeseries import resample_counts_sql

    inner = (
        "SELECT user_id, epoch_us(ts) AS us, "
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events"
    )
    body = resample_counts_sql(
        inner, "user_id", "us", 24 * 3600 * 1_000_000, value_col="cents"
    )
    # wrap: the twin's final select has user_id visible from both join
    # sides, so a bare ORDER BY user_id is ambiguous in DuckDB
    return f"SELECT * FROM ({body}) __r ORDER BY user_id, bucket"


def vocab_encode_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-vocab tokenization (`operators/vocab.py`): top-64
    frequency-ranked vocab, id-encode every document, then emit the
    position-weighted id checksum (the gate-safe scalar form of the id
    array — same convention as the quantization stats)."""
    from ..operators.vocab import build_vocab, encode_docs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    enc = encode_docs(docs, build_vocab(docs, max_size=64))
    idx = F.sequence(F.lit(1), F.size("ids"))
    checksum = F.aggregate(
        F.zip_with(F.col("ids"), idx, lambda x, i: x * i),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return enc.select(
        "doc_id", "n_tokens", "n_oov", checksum.alias("ids_checksum")
    ).orderBy("doc_id")


def _vocab_sql() -> str:
    from ..operators.vocab import encode_docs_sql

    inner = encode_docs_sql("documents", max_size=64)
    return f"""
SELECT doc_id, n_tokens, n_oov,
       CAST(COALESCE(list_sum(list_transform(range(1, len(ids) + 1),
                i -> ids[CAST(i AS INTEGER)] * i)), 0) AS BIGINT)
           AS ids_checksum
FROM ({inner}) __e
ORDER BY doc_id
"""


def negative_pairs_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling
    (`operators/contrastive.py:negative_pairs`): 4 hash-bucket
    negatives per anchor via two broadcast joins — no global index, no
    cartesian, bit-reproducible from the seed."""
    from ..operators.contrastive import negative_pairs

    docs = load(spark, sf_dir, "documents")
    return negative_pairs(
        docs, "doc_id", k=4, n_buckets=64, seed=7
    ).orderBy("anchor_id", "slot")


def _negative_sql() -> str:
    from ..operators.contrastive import negative_pairs_sql

    return (
        negative_pairs_sql("documents", "doc_id", k=4, n_buckets=64, seed=7)
        + " ORDER BY anchor_id, slot"
    )


def chunk_positive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive positive pairs from adjacent chunks
    (`operators/chunking.py:adjacent_chunk_pairs`) — the positive
    counterpart of `negative_pairs_sample`, one lead-window over the
    chunker's own partitioning."""
    from ..operators.chunking import adjacent_chunk_pairs, chunk_documents

    docs = load(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_size=64, overlap=16)
    return adjacent_chunk_pairs(chunks).orderBy("doc_id", "chunk_a")


def _chunk_pairs_sql() -> str:
    from ..operators.chunking import adjacent_chunk_pairs_sql, chunk_documents_sql

    inner = chunk_documents_sql(chunk_size=64, overlap=16)
    return (
        adjacent_chunk_pairs_sql(inner) + " ORDER BY doc_id, chunk_a"
    )


def daily_top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k per group: each day's 3 most frequent event
    types (ties broken by type name) — partial-aggregated count +
    one rank window per day partition."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    day_us = 24 * 3600 * 1_000_000
    counts = (
        e.select(ts_us(e).alias("us"), "event_type")
        .select(F.expr(f"us div {day_us}").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("day").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .orderBy("day", "rnk")
    )


_DAILY_TOP_SQL = """
SELECT day, event_type, n, rnk FROM (
  SELECT day, event_type, n,
         CAST(row_number() OVER (
             PARTITION BY day ORDER BY n DESC, event_type ASC
         ) AS BIGINT) AS rnk
  FROM (
    SELECT epoch_us(ts) // 86400000000 AS day, event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
  ) __c
) WHERE rnk <= 3 ORDER BY day, rnk
"""


def median_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped median (`operators/stats.py:grouped_median2`):
    per return flag, twice-the-median of l_quantity as an integer
    (lower+upper middle) — rank-window selection here, DuckDB's own
    median() in the oracle: two independent algorithms, one answer."""
    from ..operators.stats import grouped_median2

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    return grouped_median2(li, "l_returnflag", "qty").orderBy("l_returnflag")


def _median_sql() -> str:
    from ..operators.stats import grouped_median2_sql

    inner = "SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty FROM lineitem"
    return (
        grouped_median2_sql(inner, "l_returnflag", "qty")
        + " ORDER BY l_returnflag"
    )


def minmax_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact min-max feature scaling (`operators/stats.py:
    minmax_normalize`): per order priority, each order's price as the
    rational (num, den) scaling pair — aggregate+broadcast-join here,
    a window formulation in the oracle."""
    from ..operators.stats import minmax_normalize

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return minmax_normalize(o, "o_orderpriority", "cents").orderBy("o_orderkey")


def _minmax_sql() -> str:
    from ..operators.stats import minmax_normalize_sql

    inner = (
        "SELECT o_orderkey, o_orderpriority, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders"
    )
    return (
        minmax_normalize_sql(
            inner,
            "o_orderpriority",
            "cents",
            "o_orderkey, o_orderpriority, cents",
        )
        + " ORDER BY o_orderkey"
    )


def vocab_shift_even_odd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift report (`operators/drift.py:vocab_shift`): top-50
    tokens by cross-multiplied frequency shift between even- and
    odd-doc_id halves — division-free, so the ranking is exact."""
    from ..operators.drift import vocab_shift

    docs = load(spark, sf_dir, "documents")
    return vocab_shift(docs, F.col("doc_id") % 2 == 0, top_k=50)


def _vocab_shift_sql() -> str:
    from ..operators.drift import vocab_shift_sql

    return vocab_shift_sql("documents", "doc_id % 2 = 0", top_k=50)


def source_overlap_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix (`operators/drift.py:
    source_overlap_matrix`): the fixture corpus has no exact dups, so
    the gate unions a deterministic 'mirror' feed (every 3rd doc
    re-attributed) and counts shared digests per source pair."""
    from ..operators.drift import source_overlap_matrix

    docs = load(spark, sf_dir, "documents").select("source", "text")
    mirror = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select(F.lit("mirror").alias("source"), "text")
    )
    return source_overlap_matrix(docs.unionByName(mirror)).orderBy(
        "source_a", "source_b"
    )


_SOURCE_OVERLAP_SQL = """
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 3 = 0
), d AS (
  SELECT DISTINCT md5(text) AS dg, source AS s FROM corpus
)
SELECT a.s AS source_a, b.s AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM d a JOIN d b ON a.dg = b.dg AND a.s < b.s
GROUP BY 1, 2
ORDER BY source_a, source_b
"""


def linkage_candidates_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood record-linkage blocking
    (`operators/setjoin.py:sorted_neighborhood_pairs`): customers
    blocked by nation, sorted by account balance, candidates within a
    3-wide neighborhood — O(n*w) pairs from one window per block, no
    self-join."""
    from ..operators.setjoin import sorted_neighborhood_pairs

    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    return sorted_neighborhood_pairs(
        c, "c_custkey", "c_nationkey", "bal_cents", window=3
    ).orderBy("id_a", "gap", "id_b")


def _linkage_sql() -> str:
    from ..operators.setjoin import sorted_neighborhood_pairs_sql

    inner = (
        "SELECT c_custkey, c_nationkey, "
        "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer"
    )
    return (
        sorted_neighborhood_pairs_sql(
            inner, "c_custkey", "c_nationkey", "bal_cents", window=3
        )
        + " ORDER BY id_a, gap, id_b"
    )


def corpus_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report card — the dataset-card numbers a
    release pipeline publishes: volume, language spread, exact-dup
    exposure, and the exact median document length
    (`operators/stats.py:grouped_median2` composed with plain
    aggregates; one scan feeds everything)."""
    from ..operators.stats import grouped_median2

    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "source", "lang", F.col("n_chars").cast("long").alias("n_chars"),
        F.md5("text").alias("__d"),
    )
    dup_digests = (
        base.groupBy("__d")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .select("__d")
    )
    # dup_digests is corpus-dependent (could be huge in a mirror-heavy
    # corpus) — let AQE pick broadcast vs shuffle
    flagged = base.join(
        dup_digests.withColumn("__dup", F.lit(1)), "__d", "left"
    )
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(F.coalesce(F.col("__dup"), F.lit(0)).cast("long")).alias(
            "n_dup_docs"
        ),
    )
    med = grouped_median2(
        base.select("source", "n_chars"), "source", "n_chars"
    ).select("source", F.col("median2").alias("len_median2"))
    return agg.join(med, "source").orderBy("source")


_CORPUS_REPORT_SQL = """
WITH base AS (
  SELECT source, lang, CAST(n_chars AS BIGINT) AS n_chars, md5(text) AS d
  FROM documents
), dups AS (
  SELECT d FROM base GROUP BY d HAVING count(*) > 1
), agg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(sum(CASE WHEN d IN (SELECT d FROM dups) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dup_docs
  FROM base GROUP BY source
), med AS (
  SELECT source, CAST(round(2 * median(n_chars)) AS BIGINT) AS len_median2
  FROM base GROUP BY source
)
SELECT agg.source, n_docs, total_chars, n_langs, n_dup_docs, len_median2
FROM agg JOIN med ON agg.source = med.source
ORDER BY agg.source
"""


def budget_select_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained curation (`operators/sampling.py:
    budget_select`) composed with the surprisal scorer: each language
    keeps its highest-surprisal documents until a 20k-char budget is
    spent; reports per-language kept mass."""
    from ..operators.sampling import budget_select
    from ..operators.text_analysis import surprisal_score

    docs = load(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang", "n_chars").join(
        surprisal_score(docs.select("doc_id", "text")), "doc_id"
    )
    kept = budget_select(
        scored, "lang", "n_chars", "surprisal_bits", budget=20_000
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum(F.col("n_chars").cast("long")).alias("kept_chars"),
            F.sum("surprisal_bits").cast("long").alias("kept_bits"),
        )
        .orderBy("lang")
    )


def _budget_sql() -> str:
    from ..operators.sampling import budget_select_sql
    from ..operators.text_analysis import surprisal_score_sql

    scored = f"""
SELECT d.doc_id, d.lang, d.n_chars, s.surprisal_bits
FROM documents d JOIN ({surprisal_score_sql("documents")}) s USING (doc_id)
"""
    inner = budget_select_sql(
        scored, "lang", "n_chars", "surprisal_bits", budget=20_000
    )
    return f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS kept_chars,
       CAST(sum(surprisal_bits) AS BIGINT) AS kept_bits
FROM ({inner}) __k
GROUP BY lang ORDER BY lang
"""


def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring
    (`operators/text_analysis.py:bigram_surprisal_score`): integer-bit
    surprisal over adjacent token pairs — boilerplate scores low even
    when its unigrams look normal."""
    from ..operators.text_analysis import bigram_surprisal_score

    docs = load(spark, sf_dir, "documents")
    return bigram_surprisal_score(docs.select("doc_id", "text")).orderBy(
        "doc_id"
    )


def _bigram_sql() -> str:
    from ..operators.text_analysis import bigram_surprisal_score_sql

    return bigram_surprisal_score_sql("documents") + " ORDER BY doc_id"


def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (`operators/stats.py:grouped_winsorize`):
    order prices clipped at the priority group's [5th, 95th] discrete
    percentiles — integer rank thresholds here, DuckDB's own
    quantile_disc in the oracle."""
    from ..operators.stats import grouped_winsorize

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    w = grouped_winsorize(o, "o_orderpriority", "cents", 5, 95)
    return (
        w.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("clipped").cast("long").alias("sum_clipped"),
            F.max("lo_val").cast("long").alias("lo_val"),
            F.max("hi_val").cast("long").alias("hi_val"),
            F.sum((F.col("cents") < F.col("lo_val")).cast("long")).alias(
                "n_lo_clipped"
            ),
            F.sum((F.col("cents") > F.col("hi_val")).cast("long")).alias(
                "n_hi_clipped"
            ),
        )
        .orderBy("o_orderpriority")
    )


def _winsorize_sql() -> str:
    from ..operators.stats import grouped_winsorize_sql

    inner = (
        "SELECT o_orderkey, o_orderpriority, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders"
    )
    wz = grouped_winsorize_sql(
        inner, "o_orderpriority", "cents", 5, 95,
        cols="o_orderkey, o_orderpriority, cents",
    )
    return f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(clipped) AS BIGINT) AS sum_clipped,
       max(lo_val) AS lo_val, max(hi_val) AS hi_val,
       CAST(sum(CASE WHEN cents < lo_val THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lo_clipped,
       CAST(sum(CASE WHEN cents > hi_val THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hi_clipped
FROM ({wz}) __w
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def outlier_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact k-sigma outlier detection
    (`operators/stats.py:flag_outliers`): per event type, count values
    failing the cross-multiplied 3-sigma test — no division, sqrt, or
    float anywhere, so the flags are hash-exact."""
    from ..operators.stats import flag_outliers

    e = load(spark, sf_dir, "events")
    e = e.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    flagged = flag_outliers(e, "event_type", "cents", k_num=3, k_den=1)
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def _outlier_sql() -> str:
    from ..operators.stats import flag_outliers_sql

    inner = (
        "SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents "
        "FROM events"
    )
    wz = flag_outliers_sql(
        inner, "event_type", "cents", 3, 1, cols="event_type, cents"
    )
    return f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM ({wz}) __f
GROUP BY event_type ORDER BY event_type
"""


def engagement_pipeline_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events-side capstone — the engagement chain composed as one
    query, mirroring `curation_pipeline_counts` on the documents side:
    sessionize (30-min gap) → per-user session/event/value rollup →
    exact power-of-two decay weighting → integer-exact 3-sigma outlier
    flag on per-user event counts. One row per user, every column
    integer or boolean."""
    from ..operators.engagement import decayed_counts
    from ..operators.sessionize import sessionize
    from ..operators.stats import flag_outliers

    e = load(spark, sf_dir, "events")
    e = e.select(
        "user_id",
        "event_id",
        ts_us(e).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    gap = 30 * 60 * 1_000_000
    sessions = sessionize(e, ["user_id"], "us", gap, order_cols=["event_id"])
    per_user = sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )
    decayed = decayed_counts(
        e, "user_id", "us",
        ref_us=_DECAY_REF_US, half_life_us=_DECAY_HALF_LIFE_US,
    ).select("user_id", "decayed_weight")
    joined = per_user.join(decayed, "user_id").withColumn(
        "__g", F.lit(1)
    )
    flagged = flag_outliers(joined, "__g", "n_events", k_num=3, k_den=1)
    return flagged.select(
        "user_id", "n_sessions", "n_events", "sum_cents",
        "decayed_weight", "is_outlier",
    ).orderBy("user_id")


def _engagement_pipeline_sql() -> str:
    from ..operators.engagement import decayed_counts_sql

    sessions = """
SELECT user_id, us, cents,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_id
FROM (
  SELECT user_id, event_id, us, cents,
         CASE WHEN us - LAG(us) OVER w > 1800000000 THEN 1
              WHEN LAG(us) OVER w IS NULL THEN 1
              ELSE 0 END AS is_new
  FROM (SELECT user_id, event_id, epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events) e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
) flagged
"""
    decay = decayed_counts_sql(
        "SELECT user_id, epoch_us(ts) AS us FROM events",
        "user_id", "us",
        ref_us=_DECAY_REF_US, half_life_us=_DECAY_HALF_LIFE_US,
    )
    return f"""
WITH sess AS ({sessions}), per_user AS (
  SELECT user_id,
         CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(cents) AS BIGINT) AS sum_cents
  FROM sess GROUP BY user_id
), decay AS (
  SELECT user_id, decayed_weight FROM ({decay}) __d
), joined AS (
  SELECT p.*, d.decayed_weight FROM per_user p JOIN decay d USING (user_id)
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS __n,
         CAST(sum(n_events) AS BIGINT) AS __s,
         CAST(sum(n_events * n_events) AS BIGINT) AS __ss
  FROM joined
)
SELECT user_id, n_sessions, n_events, sum_cents, decayed_weight,
       ((__n * n_events - __s) * (__n * n_events - __s))
           > (9 * (__n * __ss - __s * __s)) AS is_outlier
FROM joined, stats
ORDER BY user_id
"""


def rfm_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM engagement segmentation
    (`operators/engagement.py:rfm_segments`): per-user recency /
    frequency / monetary quintile bins with deterministic ntile
    tie-breaks."""
    from ..operators.engagement import rfm_segments

    e = load(spark, sf_dir, "events")
    e = e.select(
        "user_id",
        ts_us(e).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return rfm_segments(e, "user_id", "us", "cents").orderBy("user_id")


def _rfm_sql() -> str:
    from ..operators.engagement import rfm_segments_sql

    inner = (
        "SELECT user_id, epoch_us(ts) AS us, "
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events"
    )
    return (
        rfm_segments_sql(inner, "user_id", "us", "cents")
        + " ORDER BY user_id"
    )


QUERIES = {
    "dedup_substring_spans": dedup_substring_spans,
    "dedup_prefix_jaccard": dedup_prefix_jaccard,
    "text_surprisal_score": text_surprisal_score,
    "scd2_documents": scd2_documents,
    "embedding_gram_matrix": embedding_gram_matrix,
    "decayed_user_engagement": decayed_user_engagement,
    "session_path_top": session_path_top,
    "compaction_plan_bins": compaction_plan_bins,
    "resample_user_days": resample_user_days,
    "vocab_encode_checksums": vocab_encode_checksums,
    "negative_pairs_sample": negative_pairs_sample,
    "chunk_positive_pairs": chunk_positive_pairs,
    "daily_top_event_types": daily_top_event_types,
    "median_quantity_by_flag": median_quantity_by_flag,
    "minmax_order_prices": minmax_order_prices,
    "vocab_shift_even_odd": vocab_shift_even_odd,
    "source_overlap_mirror": source_overlap_mirror,
    "linkage_candidates_customers": linkage_candidates_customers,
    "corpus_report_by_source": corpus_report_by_source,
    "budget_select_per_lang": budget_select_per_lang,
    "text_bigram_surprisal": text_bigram_surprisal,
    "winsorized_price_stats": winsorized_price_stats,
    "outlier_event_values": outlier_event_values,
    "engagement_pipeline_users": engagement_pipeline_users,
    "rfm_user_segments": rfm_user_segments,
}

ORACLES = {
    "dedup_substring_spans": _substring_sql(),
    "dedup_prefix_jaccard": _prefix_jaccard_sql(),
    "text_surprisal_score": _surprisal_sql(),
    "scd2_documents": _scd2_sql(),
    "embedding_gram_matrix": _gram_sql(),
    "decayed_user_engagement": _decay_sql(),
    "session_path_top": _session_path_sql(),
    "compaction_plan_bins": _compaction_sql(),
    "resample_user_days": _resample_sql(),
    "vocab_encode_checksums": _vocab_sql(),
    "negative_pairs_sample": _negative_sql(),
    "chunk_positive_pairs": _chunk_pairs_sql(),
    "daily_top_event_types": _DAILY_TOP_SQL,
    "median_quantity_by_flag": _median_sql(),
    "minmax_order_prices": _minmax_sql(),
    "vocab_shift_even_odd": _vocab_shift_sql(),
    "source_overlap_mirror": _SOURCE_OVERLAP_SQL,
    "linkage_candidates_customers": _linkage_sql(),
    "corpus_report_by_source": _CORPUS_REPORT_SQL,
    "budget_select_per_lang": _budget_sql(),
    "text_bigram_surprisal": _bigram_sql(),
    "winsorized_price_stats": _winsorize_sql(),
    "outlier_event_values": _outlier_sql(),
    "engagement_pipeline_users": _engagement_pipeline_sql(),
    "rfm_user_segments": _rfm_sql(),
}
