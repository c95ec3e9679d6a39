"""Round-9 gate queries: the persisted IVF-PQ index lifecycle.

One registry entry this round by design — the round-9 driver budget is
dedicated to the staleness backlog (VERDICT r8 #1), so new gates only
enter by replacing a near-duplicate (`ann_recall_jl`, folded into
`ann_recall_scorecard`'s jl row, paid for this slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


def ann_ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC search against a PERSISTED index
    (`operators/similarity.py:write_ivfpq_index` / `ivfpq_index_topk`):
    coarse centroids + residual codebooks + packed codes are written
    once, then the search reads ONLY the codes table and the two tiny
    broadcast quantizer tables — the build-once/search-many lifecycle a
    100 TB deployment runs (probe pruning × 8-byte codes compose; raw
    vectors are never re-read). Training is the same deterministic
    integer-lattice Lloyd as the inline `ann_ivfpq_topk` gate, so the
    round-tripped index reproduces the DuckDB twin bit-for-bit —
    which makes the oracle also a PERSISTENCE check: any loss of
    precision through the parquet round-trip would break the hash."""
    import shutil
    import tempfile

    from ..operators.similarity import ivfpq_index_topk, write_ivfpq_index

    emb = load(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="bunsen_ivfpq_gate_")
    shutil.rmtree(path, ignore_errors=True)
    write_ivfpq_index(emb, path)
    return ivfpq_index_topk(
        spark, path, emb.where(F.col("vec_id") < 32), k=5
    )


def _ivfpq_index_sql() -> str:
    from ..operators.similarity import ivfpq_topk_sql

    return ivfpq_topk_sql()


QUERIES = {"ann_ivfpq_index_topk": ann_ivfpq_index_topk}
ORACLES = {"ann_ivfpq_index_topk": _ivfpq_index_sql()}
