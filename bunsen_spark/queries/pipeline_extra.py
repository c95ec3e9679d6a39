"""Gate queries for the round-4 additions: Bloom-prefiltered semi join
and overlapping token-window chunking."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bloom_prefilter_supplier_volume": bloom_prefilter_supplier_volume,
    "doc_chunk_windows": doc_chunk_windows,
}

ORACLES: dict[str, str] = {
    "bloom_prefilter_supplier_volume": BLOOM_PREFILTER_SQL,
    "doc_chunk_windows": _chunk_sql(),
}
