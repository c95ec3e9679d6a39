"""Late round-7 gate queries: water-filling budget allocation, n-gram
novelty, and the BPE fertility audit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


def waterfill_lang_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-fill 70% of the corpus's total word count across languages
    (`operators/sampling.py:waterfill_allocation`): equal target shares
    capped at each language's availability, remainder re-leveled among
    the uncapped — max-min fair, all-integer, allocations summing
    exactly to the budget. The budget derives from the data (one 1-row
    scalar fetch), so the gate is scale-invariant: small languages cap,
    large ones share."""
    from ..operators.sampling import waterfill_allocation
    from ..operators.text_analysis import words_col

    counts = (
        load(spark, sf_dir, "documents")
        .select("lang", F.size(words_col(F.col("text"))).alias("__nw"))
        .groupBy("lang")
        .agg(F.sum("__nw").cast("long").alias("avail"))
    )
    from ..persist import materialize

    # one documents scan: the budget collect is the checkpoint's first
    # reader, and the allocator's rank pass then reads blocks instead
    # of re-running the words_col regex aggregate (r14)
    counts = materialize(counts)
    total = counts.agg(F.sum("avail")).collect()[0][0]
    return waterfill_allocation(counts, "lang", "avail", total * 7 // 10)


def _waterfill_sql() -> str:
    from ..operators.sampling import waterfill_allocation_sql
    from ..operators.text_analysis import WORDS_SQL

    counts = (
        f"SELECT lang, CAST(sum(len({WORDS_SQL})) AS BIGINT) AS avail"
        " FROM documents GROUP BY lang"
    )
    budget = (
        f"(SELECT sum(avail) * 7 // 10 FROM"
        f" ({counts}) __b)"
    )
    return waterfill_allocation_sql(counts, "lang", "avail", budget)


def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty vs the lower-doc_id corpus
    (`operators/text_analysis.py:ngram_novelty`): distinct-gram explode,
    min(doc_id) first-occurrence join, per-doc novel/total counts."""
    from ..operators.text_analysis import ngram_novelty

    return ngram_novelty(load(spark, sf_dir, "documents"), n=3)


def _novelty_sql() -> str:
    from ..operators.text_analysis import ngram_novelty_sql

    return ngram_novelty_sql("documents", n=3)


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility of a corpus-trained 6-merge BPE tokenizer
    (`operators/vocab.py:bpe_fertility`): integer word/subword/char
    masses after segmenting each language's vocabulary with the shared
    merges — the cross-lingual tokenizer-equity audit."""
    from ..operators.vocab import bpe_fertility

    return bpe_fertility(
        load(spark, sf_dir, "documents"), n_merges=6, group_col="lang"
    )


def _fertility_sql() -> str:
    from ..operators.vocab import bpe_fertility_sql

    return bpe_fertility_sql("documents", n_merges=6, group_col="lang")


QUERIES = {
    "waterfill_lang_budget": waterfill_lang_budget,
    "ngram_novelty_scores": ngram_novelty_scores,
    "bpe_fertility_by_lang": bpe_fertility_by_lang,
}
ORACLES = {
    "waterfill_lang_budget": _waterfill_sql(),
    "ngram_novelty_scores": _novelty_sql(),
    "bpe_fertility_by_lang": _fertility_sql(),
}


def cluster_purity_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster label purity of the bit-exact Lloyd codebook
    (`operators/similarity.py:cluster_label_purity`): windowless
    max-of-struct assignment + majority vote, vs the oracle's unrolled
    Lloyd CTE chain."""
    from ..operators.similarity import cluster_label_purity

    return cluster_label_purity(load(spark, sf_dir, "embeddings"))


def _purity_sql() -> str:
    from ..operators.similarity import cluster_label_purity_sql

    return cluster_label_purity_sql()


def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest different-label neighbor within each query's exact
    top-8 (`operators/similarity.py:hard_negative_mining`) — the
    DPR-style contrastive hard-negative miner."""
    from ..operators.similarity import hard_negative_mining

    return hard_negative_mining(load(spark, sf_dir, "embeddings"))


def _hardneg_sql() -> str:
    from ..operators.similarity import hard_negative_mining_sql

    return hard_negative_mining_sql()


QUERIES.update(
    {
        "cluster_purity_embeddings": cluster_purity_embeddings,
        "hard_negatives_topk": hard_negatives_topk,
    }
)
ORACLES.update(
    {
        "cluster_purity_embeddings": _purity_sql(),
        "hard_negatives_topk": _hardneg_sql(),
    }
)


def rrf_fused_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer reciprocal-rank fusion of the exact brute-force and the
    JL-projected rankings (`operators/retrieval.py:rrf_fuse`): scores
    scaled by lcm(61..65) so the hybrid ranking is float-free."""
    from ..operators.retrieval import rrf_fuse
    from ..operators.similarity import brute_force_topk, jl_topk

    emb = load(spark, sf_dir, "embeddings")
    return rrf_fuse(
        [brute_force_topk(emb, 5, 32), jl_topk(emb, 5, 32)],
        k_out=5,
        k_in=5,
    )


def _rrf_sql() -> str:
    from ..operators.retrieval import rrf_fuse_sql
    from ..operators.similarity import brute_force_topk_sql, jl_topk_sql

    return rrf_fuse_sql(
        [brute_force_topk_sql("embeddings", 5, 32),
         jl_topk_sql("embeddings", 5, 32)],
        k_out=5,
        k_in=5,
    )


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations among the 100 most document-frequent words,
    ranked by integer milli-lift (`operators/text_analysis.py:
    pmi_term_pairs`): broadcast vocab, codegen'd per-doc pair
    expansion, cross-multiplied PMI ordering with no floats."""
    from ..operators.text_analysis import pmi_term_pairs

    return pmi_term_pairs(load(spark, sf_dir, "documents"), 100, 50)


def _pmi_sql() -> str:
    from ..operators.text_analysis import pmi_term_pairs_sql

    return pmi_term_pairs_sql("documents", 100, 50)


def padding_waste_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed padding-waste report
    (`operators/packing.py:padding_waste_stats`): per 32-token bucket,
    pad tokens to the bucket max vs to the global max — the sequence-
    bucketing throughput ROI, exact longs."""
    from ..operators.packing import padding_waste_stats

    return padding_waste_stats(load(spark, sf_dir, "documents"), 32)


def _padding_sql() -> str:
    from ..operators.packing import padding_waste_stats_sql

    return padding_waste_stats_sql("documents", 32)


QUERIES.update(
    {
        "rrf_fused_topk": rrf_fused_topk,
        "pmi_collocations": pmi_collocations,
        "padding_waste_buckets": padding_waste_buckets,
    }
)
ORACLES.update(
    {
        "rrf_fused_topk": _rrf_sql(),
        "pmi_collocations": _pmi_sql(),
        "padding_waste_buckets": _padding_sql(),
    }
)


def cluster_safe_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe splitting (`operators/sampling.py:
    cluster_safe_split`): hash the near-dup cluster representative so
    no cluster spans train/val/test; reports the per-split doc/cluster
    counts and how many docs the naive per-doc hash would have leaked."""
    from ..operators.dedup import minhash_lsh_pairs
    from ..operators.sampling import cluster_safe_split

    docs = load(spark, sf_dir, "documents")
    return cluster_safe_split(
        docs,
        minhash_lsh_pairs(docs, portable=True),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )


def _cluster_split_sql() -> str:
    from ..operators.dedup import minhash_lsh_pairs_sql
    from ..operators.sampling import cluster_safe_split_sql

    return cluster_safe_split_sql(
        minhash_lsh_pairs_sql(),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )


QUERIES.update({"cluster_safe_split_counts": cluster_safe_split_counts})
ORACLES.update({"cluster_safe_split_counts": _cluster_split_sql()})


def novelty_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental novelty (`operators/text_analysis.py:
    novelty_against_state`): odd-doc_id batch scored against the
    even-doc_id corpus's persisted distinct-gram state — the
    ingest-time "did this snapshot add anything" check."""
    from ..operators.text_analysis import gram_state, novelty_against_state

    docs = load(spark, sf_dir, "documents")
    state = gram_state(docs.where(F.col("doc_id") % 2 == 0), n=3)
    return novelty_against_state(
        docs.where(F.col("doc_id") % 2 == 1), state, n=3
    )


def _novelty_inc_sql() -> str:
    from ..operators.text_analysis import novelty_against_state_sql

    return novelty_against_state_sql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1",
        "SELECT text FROM documents WHERE doc_id % 2 = 0",
        n=3,
    )


QUERIES.update({"novelty_incremental": novelty_incremental})
ORACLES.update({"novelty_incremental": _novelty_inc_sql()})


def bot_cadence_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Too-regular event cadence screen (`operators/engagement.py:
    regular_cadence_users`): users with >= 4 inter-event gaps but <= 2
    distinct gap values — scheduler/replay signatures in behavioral
    data."""
    from . import ts_us
    from ..operators.engagement import regular_cadence_users

    e = load(spark, sf_dir, "events")
    return regular_cadence_users(e, ts_us(e), min_gaps=4, max_distinct_gaps=2)


def _cadence_sql() -> str:
    from ..operators.engagement import regular_cadence_users_sql

    return regular_cadence_users_sql("events", 4, 2)


def embedding_drift_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even-vs-odd-half centroid drift per label as an exact integer
    L1 numerator (`operators/drift.py:embedding_drift_by_label`)."""
    from ..operators.drift import embedding_drift_by_label

    return embedding_drift_by_label(load(spark, sf_dir, "embeddings"))


def _emb_drift_sql() -> str:
    from ..operators.drift import embedding_drift_by_label_sql

    return embedding_drift_by_label_sql()


def zipf_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-shape card: tokens, distinct words, hapax
    legomena, modal frequency (`operators/text_analysis.py:zipf_stats`)."""
    from ..operators.text_analysis import zipf_stats

    return zipf_stats(load(spark, sf_dir, "documents"), "source")


def _zipf_sql() -> str:
    from ..operators.text_analysis import zipf_stats_sql

    return zipf_stats_sql("documents", "source")


QUERIES.update(
    {
        "bot_cadence_users": bot_cadence_users,
        "embedding_drift_labels": embedding_drift_labels,
        "zipf_stats_by_source": zipf_stats_by_source,
    }
)
ORACLES.update(
    {
        "bot_cadence_users": _cadence_sql(),
        "embedding_drift_labels": _emb_drift_sql(),
        "zipf_stats_by_source": _zipf_sql(),
    }
)


def quality_dup_decile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile × exact-duplication joint counts
    (`operators/text_analysis.py:quality_dup_deciles`): distributed
    arithmetic ntile over the quality score vs the oracle's native
    ntile window — the 'is low-quality text also the duplicated text'
    ablation scatter."""
    from ..operators.text_analysis import quality_dup_deciles

    return quality_dup_deciles(load(spark, sf_dir, "documents"), 10)


def _qdup_sql() -> str:
    from ..operators.text_analysis import quality_dup_deciles_sql

    return quality_dup_deciles_sql("documents", 10)


QUERIES.update({"quality_dup_decile_counts": quality_dup_decile_counts})
ORACLES.update({"quality_dup_decile_counts": _qdup_sql()})


# ann_recall_jl was folded into ann_recall_scorecard (round 9), which
# was itself folded — together with pipeline_r8's
# retrieval_mrr_variants — into pipeline_r10.ann_eval_scorecard
# (round 10): the two gates ran five variant searches between them
# with the exact brute scan and the JL run duplicated; the union gate
# runs each distinct variant once. The freed slots paid for
# ann_ivfpq_index_topk (r9) and ann_ivfpq_index_append_topk (r10);
# registry frozen at 182 per VERDICT r8 #1.


def cusum_event_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM upward-shift alerts on daily per-type event-value totals
    (`operators/timeseries.py:cusum_alerts`): the sequential
    S_t = max(0, S_{t-1} + x_t - k) recursion computed as two
    cumulative windows (running sum minus running min) — exact
    integers, no recursion, no UDF. Allowance and threshold derive
    from global per-day scale so the gate is scale-invariant."""
    from . import ts_us
    from ..operators.timeseries import cusum_alerts

    e = load(spark, sf_dir, "events")
    daily = (
        e.withColumn("__us", ts_us(e))
        .select(
            "event_type",
            F.expr("__us div 86400000000").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    # per-(type,day) mean cents, integer-floored: the in-control drift
    # integer div on BOTH engines: DuckDB CAST(double AS BIGINT)
    # rounds while Spark's cast truncates — sidestep floats entirely
    from ..persist import materialize

    # one events scan: the mean collect materializes the checkpoint,
    # cusum_alerts reads blocks (r14)
    daily = materialize(daily)
    k = int(daily.agg(F.expr("sum(cents) div count(1)")).collect()[0][0])
    return cusum_alerts(daily, "event_type", "day", "cents", k, k // 2)


def _cusum_sql() -> str:
    from ..operators.timeseries import cusum_alerts_sql

    series = """
SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY event_type, epoch_us(ts) // 86400000000
"""
    return f"""
WITH s AS ({series}),
kk AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS k FROM s),
c AS (
  SELECT event_type, day, cents,
         sum(cents - kk.k) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM s CROSS JOIN kk
),
m AS (
  SELECT *, min(cum) OVER (
      PARTITION BY event_type ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS mn
  FROM c
)
SELECT event_type, day, CAST(cents AS BIGINT) AS cents,
       CAST(cum - least(0, mn) AS BIGINT) AS cusum
FROM m CROSS JOIN kk WHERE cum - least(0, mn) > kk.k // 2
"""


QUERIES.update({"cusum_event_alerts": cusum_event_alerts})
ORACLES.update({"cusum_event_alerts": _cusum_sql()})
