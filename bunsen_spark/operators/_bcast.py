"""Shared row-cap gate for HINT-FORCED broadcasts (ADVICE r14 close-out).

The fixpoint/verify operators broadcast node-sized relations (labels,
ranks, candidate pairs) whose built size deliberately exceeds the
auto-broadcast threshold — that is the point of the hint. But the row
caps those hints honor must still TRACK the cluster's memory posture,
not just treat ``spark.sql.autoBroadcastJoinThreshold`` as an on/off
switch: a memory-tight cluster that lowered the threshold should get a
proportionally lower hint budget, not a fixed few-hundred-MB relation
(ADVICE r13 #2).

Semantics of :func:`broadcast_row_cap`:

- auto-broadcast disabled (threshold ``-1``/``0``) → cap 0: "never
  broadcast" stays one switch.
- the operator's own conf key set explicitly → honored verbatim (the
  per-cluster override outranks any derivation).
- otherwise → the operator's default row cap scaled by
  ``threshold / 64 MB`` — 64 MB being the reference threshold the row
  defaults were sized against (session.py). A cluster at the stock
  10 MB threshold gets ~16% of the default cap; one that raised the
  threshold gets proportionally more. The scaling never exceeds the
  stated default by more than the threshold ratio, so the documented
  "few hundred MB built" contract degrades gracefully instead of
  silently forcing it on tight executors.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: threshold the per-operator row defaults were sized against
_REFERENCE_THRESHOLD = 64 * 1024 * 1024


def _threshold_bytes(spark: SparkSession) -> int:
    thr = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suffix, m in (
        ("kb", 1024), ("mb", 1024**2), ("gb", 1024**3), ("tb", 1024**4),
        ("k", 1024), ("m", 1024**2), ("g", 1024**3), ("t", 1024**4),
        ("b", 1),
    ):
        if thr.endswith(suffix):
            thr = thr[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(thr) * mult)
    except ValueError:
        return 0


def broadcast_row_cap(
    spark: SparkSession, conf_key: str, default_rows: int
) -> int:
    thr = _threshold_bytes(spark)
    if thr <= 0:
        return 0
    explicit = spark.conf.get(conf_key, None)
    if explicit is not None:
        return int(explicit)
    return max(1, int(default_rows * thr / _REFERENCE_THRESHOLD))
