"""Round-11 gate: tombstone DELETION from the persisted IVF-PQ index —
the right-to-erasure half of the lifecycle (train once → batch/stream
append → delete without rebuild → search codes only).

Registry stays frozen at 182 (VERDICT r8 #1): `ann_ivf_probe_curve` is
folded into `ann_eval_scorecard` as the ivf_p1/ivf_p4 recall variants
(sharing the scorecard's materialized exact run — the standalone gate
re-ran its own exact scan), paying for this gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load
from .pipeline_r10 import APPEND_BASE_PRED, _cached_index

#: tombstoned slice of the delete gate, over vec_id — sf-independent
#: and SQL-expressible, so the DuckDB twin excludes exactly the rows
#: the Spark tombstone partition holds. Deliberately CROSSES the
#: base/append split (vec_id % 7 hits both residue classes of
#: vec_id % 5), so the gate proves deletes land on base-built AND
#: appended codes alike.
DELETE_PRED = "vec_id % 7 = 3"


def ann_ivfpq_index_delete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full persisted-index lifecycle in one gate
    (`operators/similarity.py:delete_from_ivfpq_index`): train on the
    80% base slice, absorb the 20% remainder with one frozen-quantizer
    append pass, tombstone the `vec_id % 7 = 3` slice (~14%, spanning
    base and appended codes), then search the surviving index. The
    DuckDB twin recomputes the whole pipeline with training restricted
    to the base predicate and the tombstoned rows excluded from the
    CANDIDATE side only (`ivfpq_topk_sql(train_pred=..,
    delete_pred=..)`), so a green hash proves (a) deletion touches
    zero existing codes — the surviving ranks are bit-identical to a
    from-scratch base-trained build, and (b) no tombstoned vector ever
    surfaces as a neighbor, from either the base table or an appended
    partition. Queries (vec_id < 32) are NOT filtered: erased corpus
    members must stop being FOUND immediately; callers keep the right
    to probe with any vector. The 100 TB story is the point — a GDPR
    drop is one bounded tombstone append plus an AQE-broadcast
    anti-join at search time, never an index rebuild or a random
    rewrite of cell files."""
    from ..operators.similarity import (
        append_ivfpq_index,
        delete_from_ivfpq_index,
        ivfpq_index_topk,
        write_ivfpq_index,
    )

    def build(emb: DataFrame, path: str) -> None:
        write_ivfpq_index(emb.where(F.expr(APPEND_BASE_PRED)), path)
        append_ivfpq_index(emb.where(~F.expr(APPEND_BASE_PRED)), path)
        delete_from_ivfpq_index(emb.where(F.expr(DELETE_PRED)), path)

    path = _cached_index(spark, sf_dir, "delete-v1", build)
    emb = load(spark, sf_dir, "embeddings")
    return ivfpq_index_topk(spark, path, emb.where(F.col("vec_id") < 32), k=5)


def _ivfpq_delete_sql() -> str:
    from ..operators.similarity import ivfpq_topk_sql

    return ivfpq_topk_sql(
        train_pred=APPEND_BASE_PRED, delete_pred=DELETE_PRED
    )


QUERIES = {"ann_ivfpq_index_delete_topk": ann_ivfpq_index_delete_topk}
ORACLES = {"ann_ivfpq_index_delete_topk": _ivfpq_delete_sql()}
