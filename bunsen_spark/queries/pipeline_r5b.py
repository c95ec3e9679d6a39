"""Gate queries for the second round-5 batch: exact substring-dup
spans, lossless prefix-filtered Jaccard join, integer-bit surprisal
scoring, SCD2 dimension merge, and the single-pass Gram matrix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load

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


QUERIES = {
    "dedup_substring_spans": dedup_substring_spans,
    "dedup_prefix_jaccard": dedup_prefix_jaccard,
    "text_surprisal_score": text_surprisal_score,
    "scd2_documents": scd2_documents,
    "embedding_gram_matrix": embedding_gram_matrix,
}

ORACLES = {
    "dedup_substring_spans": _substring_sql(),
    "dedup_prefix_jaccard": _prefix_jaccard_sql(),
    "text_surprisal_score": _surprisal_sql(),
    "scd2_documents": _scd2_sql(),
    "embedding_gram_matrix": _gram_sql(),
}
