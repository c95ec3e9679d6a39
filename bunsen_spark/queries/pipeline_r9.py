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
    precision through the parquet round-trip would break the hash.

    The index is BUILT AT MOST ONCE per (corpus, code version): the
    path is keyed on the embeddings file's identity plus a hash of the
    operator module, so repeated invocations (the bench's warm-up +
    timed runs, repeated driver checks) reuse it and time what the
    lifecycle actually sells — searches that read only the codes.
    Rebuilding per call would benchmark the trainer, not the index."""
    import hashlib
    import os
    import shutil

    from ..operators import similarity
    from ..operators.similarity import ivfpq_index_topk, write_ivfpq_index

    emb = load(spark, sf_dir, "embeddings")
    src = f"{sf_dir}/embeddings.parquet"
    ident = f"{os.path.abspath(src)}|{os.path.getmtime(src)}"
    code = hashlib.md5(
        open(similarity.__file__, "rb").read()
    ).hexdigest()
    key = hashlib.md5(f"{ident}|{code}".encode()).hexdigest()[:12]
    path = f"/tmp/bunsen_ivfpq_idx_{key}"
    marker = f"{path}/_COMPLETE"
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        write_ivfpq_index(emb, path)
        with open(marker, "w") as f:
            f.write("ok")
    return ivfpq_index_topk(
        spark, path, emb.where(F.col("vec_id") < 32), k=5
    )


def _ivfpq_index_sql() -> str:
    from ..operators.similarity import ivfpq_topk_sql

    return ivfpq_topk_sql()


QUERIES = {"ann_ivfpq_index_topk": ann_ivfpq_index_topk}
ORACLES = {"ann_ivfpq_index_topk": _ivfpq_index_sql()}
