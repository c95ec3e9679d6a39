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
