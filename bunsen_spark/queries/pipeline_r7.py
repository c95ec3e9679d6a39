"""Round-7 gate queries: SemDeDup-style semantic dedup and the
distributed global-rank primitive that replaced the RFM global windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


def semantic_dedup_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-prune semantic dedup over the embeddings table
    (`operators/similarity.py:semantic_dedup`): Lloyd codebook
    assignment, then within-cluster cosine dominance by a lower id."""
    from ..operators.similarity import semantic_dedup

    return semantic_dedup(load(spark, sf_dir, "embeddings"))


def _semantic_dedup_sql() -> str:
    from ..operators.similarity import semantic_dedup_sql

    return semantic_dedup_sql()


def global_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global row_number over (totalprice DESC, orderkey) with NO
    single-partition window (`operators/windows.py:global_row_number`:
    range-repartition + per-partition rank + broadcast offsets) — the
    distributed-rank primitive behind rfm_segments' ntile rewrite,
    gated against the engine-native global window in DuckDB."""
    from ..operators.windows import global_row_number

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_row_number(
        orders,
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        out_col="rank",
    )
    return ranked.select(
        "o_orderkey", "o_totalprice", F.col("rank").cast("long").alias("rank")
    )


_GLOBAL_RANK_SQL = """
SELECT o_orderkey, o_totalprice,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT)
           AS rank
FROM orders
"""


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k over the embeddings table
    (`operators/similarity.py:pq_topk`): per-subspace integer-lattice
    Lloyd codebooks, 8-byte codes, integral asymmetric-distance
    scoring."""
    from ..operators.similarity import pq_topk

    return pq_topk(load(spark, sf_dir, "embeddings"))


def _pq_sql() -> str:
    from ..operators.similarity import pq_topk_sql

    return pq_topk_sql()


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ (IVFADC): coarse inverted-list pruning + residual
    product quantization, both integer-lattice Lloyd
    (`operators/similarity.py:ivfpq_topk`)."""
    from ..operators.similarity import ivfpq_topk

    return ivfpq_topk(load(spark, sf_dir, "embeddings"))


def _ivfpq_sql() -> str:
    from ..operators.similarity import ivfpq_topk_sql

    return ivfpq_topk_sql()


QUERIES = {
    "semantic_dedup_drops": semantic_dedup_drops,
    "global_rank_orders": global_rank_orders,
    "ann_pq_topk": ann_pq_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
}

ORACLES = {
    "semantic_dedup_drops": _semantic_dedup_sql(),
    "global_rank_orders": _GLOBAL_RANK_SQL,
    "ann_pq_topk": _pq_sql(),
    "ann_ivfpq_topk": _ivfpq_sql(),
}


def equi_depth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth histogram of order totals, 8 bins
    (`operators/stats.py:equi_depth_histogram` — distributed global
    rank + arithmetic ntile, no single-partition window)."""
    from ..operators.stats import equi_depth_histogram

    return equi_depth_histogram(
        load(spark, sf_dir, "orders"), "o_totalprice", 8, tiebreak=["o_orderkey"]
    )


def _equi_depth_sql() -> str:
    from ..operators.stats import equi_depth_histogram_sql

    return equi_depth_histogram_sql(
        "SELECT o_totalprice, o_orderkey FROM orders",
        "o_totalprice",
        8,
        tiebreak=["o_orderkey"],
    )


_WQ = [("0.25", 1, 4), ("0.5", 1, 2), ("0.75", 3, 4), ("0.9", 9, 10)]


def weighted_median_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted quantiles of lineitem price with quantity as the
    weight (`operators/stats.py:weighted_quantiles` — distributed
    weighted running total, integer targets): 'the price below which q
    of the shipped-quantity mass lies'."""
    from ..operators.stats import weighted_quantiles

    return weighted_quantiles(
        load(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        _WQ,
        tiebreak=["l_orderkey", "l_linenumber"],
    )


def _weighted_median_sql() -> str:
    from ..operators.stats import weighted_quantiles_sql

    return weighted_quantiles_sql(
        "SELECT l_extendedprice, l_quantity, l_orderkey, l_linenumber FROM lineitem",
        "l_extendedprice",
        "l_quantity",
        _WQ,
        tiebreak=["l_orderkey", "l_linenumber"],
    )


QUERIES.update(
    {
        "equi_depth_prices": equi_depth_prices,
        "weighted_median_prices": weighted_median_prices,
    }
)
ORACLES.update(
    {
        "equi_depth_prices": _equi_depth_sql(),
        "weighted_median_prices": _weighted_median_sql(),
    }
)


def epoch_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic epoch permutation of the documents corpus
    (`operators/sampling.py:epoch_positions` — distributed global rank
    over the portable hash order)."""
    from ..operators.sampling import epoch_positions

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return epoch_positions(docs, "doc_id", "epoch7")


def _epoch_shuffle_sql() -> str:
    from ..operators.sampling import epoch_positions_sql

    return epoch_positions_sql(
        "(SELECT doc_id, source FROM documents) __d", "doc_id", "epoch7",
        "doc_id, source",
    )


_MIX_WEIGHTS = {"src0": 3, "src1": 2, "src2": 2, "src3": 1}


def interleave_mix_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture-interleaved reading order over the
    documents corpus (`operators/sampling.py:interleave_positions`):
    the chosen sources appear throughout the epoch at 3:2:2:1 weights."""
    from ..operators.sampling import interleave_positions

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return interleave_positions(docs, "doc_id", "source", _MIX_WEIGHTS)


def _interleave_sql() -> str:
    from ..operators.sampling import interleave_positions_sql

    return interleave_positions_sql(
        "(SELECT doc_id, source FROM documents)",
        "doc_id",
        "source",
        _MIX_WEIGHTS,
        "doc_id, source",
    )


QUERIES.update(
    {
        "epoch_shuffle_positions": epoch_shuffle_positions,
        "interleave_mix_positions": interleave_mix_positions,
    }
)
ORACLES.update(
    {
        "epoch_shuffle_positions": _epoch_shuffle_sql(),
        "interleave_mix_positions": _interleave_sql(),
    }
)


def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-64 adjacent character pairs of the corpus vocabulary,
    frequency-weighted (`operators/vocab.py:bpe_pair_counts`) — one
    BPE tokenizer-training merge iteration's candidate statistics."""
    from ..operators.vocab import bpe_pair_counts

    return bpe_pair_counts(load(spark, sf_dir, "documents"), top_n=64)


def _bpe_sql() -> str:
    from ..operators.vocab import bpe_pair_counts_sql

    return bpe_pair_counts_sql("documents", top_n=64)


def mad_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority robust (median/MAD, k=2) outlier counts over order
    totals in integer cents (`operators/stats.py:mad_outliers`) — the
    50%-contamination-proof twin of the k-sigma gate."""
    from ..operators.stats import mad_outliers

    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    return mad_outliers(orders, "o_orderpriority", "cents", k_num=2, k_den=1)


def _mad_sql() -> str:
    from ..operators.stats import mad_outliers_sql

    return mad_outliers_sql(
        "SELECT o_orderpriority,"
        " CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders",
        "o_orderpriority",
        "cents",
        k_num=2,
        k_den=1,
    )


QUERIES.update(
    {
        "bpe_top_pairs": bpe_top_pairs,
        "mad_outlier_orders": mad_outlier_orders,
    }
)
ORACLES.update(
    {
        "bpe_top_pairs": _bpe_sql(),
        "mad_outlier_orders": _mad_sql(),
    }
)


def pareto_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal documents on (word count, distinct word count) —
    the skyline selection no single-axis threshold expresses
    (`operators/stats.py:pareto_frontier`: per-x reduce + distributed
    strict-suffix max, vs the oracle's literal NOT EXISTS dominance
    anti-join)."""
    from ..operators.stats import pareto_frontier
    from ..operators.text_analysis import words_col

    ws = words_col(F.col("text"))
    m = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct"),
    )
    return pareto_frontier(m, "n_words", "n_distinct")


def _pareto_sql() -> str:
    from ..operators.stats import pareto_frontier_sql
    from ..operators.text_analysis import WORDS_SQL

    metrics = (
        "SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,"
        " CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct"
        f" FROM (SELECT doc_id, {WORDS_SQL} AS ws FROM documents) __w"
    )
    return pareto_frontier_sql(
        metrics, "n_words", "n_distinct", "a.doc_id, a.n_words, a.n_distinct"
    )


QUERIES.update({"pareto_docs": pareto_docs})
ORACLES.update({"pareto_docs": _pareto_sql()})


def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six learned BPE merges over the corpus — the full
    count→argmax→merge training cycle (`operators/vocab.py:bpe_train`),
    replayed by the oracle as an unrolled CTE chain."""
    from ..operators.vocab import bpe_train

    return bpe_train(load(spark, sf_dir, "documents"), n_merges=6)


def _bpe_train_sql() -> str:
    from ..operators.vocab import bpe_train_sql

    return bpe_train_sql("documents", n_merges=6)


QUERIES.update({"bpe_learned_merges": bpe_learned_merges})
ORACLES.update({"bpe_learned_merges": _bpe_train_sql()})


def bpe_subword_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-40 subword frequencies after segmenting the corpus with the
    6 learned merges — the apply half of the BPE lifecycle
    (`operators/vocab.py:bpe_train` → `bpe_subword_counts`; the oracle
    reads the training CTE chain's final symbol table directly)."""
    from ..operators.vocab import bpe_subword_counts, bpe_train, word_counts
    from ..persist import materialize

    docs = load(spark, sf_dir, "documents")
    # tokenize the corpus ONCE: train and apply share the materialized
    # frequency-weighted word table
    words = materialize(word_counts(docs))
    merges = [
        (r.lhs, r.rhs)
        for r in sorted(
            bpe_train(docs, n_merges=6, words=words).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    return bpe_subword_counts(docs, merges, top_n=40, words=words)


def _bpe_subword_sql() -> str:
    from ..operators.vocab import bpe_subword_counts_sql

    return bpe_subword_counts_sql("documents", n_merges=6, top_n=40)


QUERIES.update({"bpe_subword_top": bpe_subword_top})
ORACLES.update({"bpe_subword_top": _bpe_subword_sql()})


def coverage_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five documents picked by greedy maximum shingle coverage — the
    submodular "small seed set that spans the corpus" curation rule
    (`operators/sampling.py:coverage_select`; the oracle unrolls the
    identical greedy cycle as a CTE chain)."""
    from ..operators.sampling import coverage_select

    return coverage_select(
        load(spark, sf_dir, "documents"), k=5, n=3, portable=True
    )


def _coverage_sql() -> str:
    from ..operators.sampling import coverage_select_sql

    return coverage_select_sql("documents", k=5, n=3)


QUERIES.update({"coverage_select_docs": coverage_select_docs})
ORACLES.update({"coverage_select_docs": _coverage_sql()})


def histogram_drift_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin document-length drift between source src0 and the rest
    of the corpus, 16 equi-width bins with exact cross-multiplied
    proportion gaps (`operators/drift.py:histogram_drift` — summing
    gap_num/(2·Na·Nb) is the exact total-variation distance)."""
    from ..operators.drift import histogram_drift

    docs = load(spark, sf_dir, "documents")
    return histogram_drift(
        docs, "n_chars", F.col("source") == "src0", n_bins=16
    )


def _hist_drift_sql() -> str:
    from ..operators.drift import histogram_drift_sql

    return histogram_drift_sql(
        "SELECT n_chars, source FROM documents",
        "n_chars",
        "source = 'src0'",
        n_bins=16,
    )


QUERIES.update({"histogram_drift_chars": histogram_drift_chars})
ORACLES.update({"histogram_drift_chars": _hist_drift_sql()})


def dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style target-likeness score for every document, target =
    source src0, 256 hashed-bigram buckets, portable hash family
    (`operators/text_analysis.py:importance_score`; integer
    cross-multiplied gap in place of DSIR's log-ratio)."""
    from ..operators.text_analysis import importance_score

    docs = load(spark, sf_dir, "documents")
    return importance_score(
        docs, F.col("source") == "src0", n_buckets=256, portable=True
    )


def _dsir_sql() -> str:
    from ..operators.text_analysis import importance_score_sql

    return importance_score_sql("source = 'src0'", n_buckets=256)


QUERIES.update({"dsir_importance_scores": dsir_importance_scores})
ORACLES.update({"dsir_importance_scores": _dsir_sql()})


def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diverse top-4 for query vector 0, lambda = 7/10, on the
    round(x*1000) integer lattice
    (`operators/similarity.py:mmr_select`; oracle = the greedy cycle
    unrolled as a CTE chain)."""
    from ..operators.similarity import mmr_select

    emb = load(spark, sf_dir, "embeddings")
    return mmr_select(emb, query_id=0, k=4, lam=(7, 10))


def _mmr_sql() -> str:
    from ..operators.similarity import mmr_select_sql

    return mmr_select_sql("embeddings", query_id=0, k=4, lam=(7, 10))


QUERIES.update({"mmr_diverse_topk": mmr_diverse_topk})
ORACLES.update({"mmr_diverse_topk": _mmr_sql()})


def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN majority-vote label audit over the first 32
    embedding vectors (`operators/similarity.py:knn_label_vote`)."""
    from ..operators.similarity import knn_label_vote

    emb = load(spark, sf_dir, "embeddings")
    return knn_label_vote(emb, k=5, num_queries=32)


def _knn_vote_sql() -> str:
    from ..operators.similarity import knn_label_vote_sql

    return knn_label_vote_sql("embeddings", k=5, num_queries=32)


QUERIES.update({"knn_label_accuracy": knn_label_accuracy})
ORACLES.update({"knn_label_accuracy": _knn_vote_sql()})


def ann_jl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random-projection ANN top-5 for the first 32 queries:
    64-dim -> 8-dim deterministic ±1 projection, exact integer dot
    ranking in the projected space
    (`operators/similarity.py:jl_topk`)."""
    from ..operators.similarity import jl_topk

    emb = load(spark, sf_dir, "embeddings")
    return jl_topk(emb, k=5, num_queries=32, out_dim=8)


def _jl_sql() -> str:
    from ..operators.similarity import jl_topk_sql

    return jl_topk_sql("embeddings", k=5, num_queries=32, out_dim=8)


QUERIES.update({"ann_jl_topk": ann_jl_topk})
ORACLES.update({"ann_jl_topk": _jl_sql()})
