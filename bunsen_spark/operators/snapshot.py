"""Dataset snapshot diff — the data-versioning primitive of a managed
corpus: what changed between two releases of the same keyed table.

Beyond-reference scale extension (SURVEY §7 M7 family). A training-data
warehouse re-releases its corpus (new crawl, re-filtered, re-scrubbed);
downstream consumers need the delta — which documents appeared,
disappeared, or changed content — without diffing text by hand.

Plan shape: one full outer join on the key with a direct column-wise
comparison — a single shuffle on the key for each side, no text
hashing required (the comparison runs JVM-side inside the join's
generated code; rows that differ in ANY compared column are
``changed``). At 100 TB both snapshots shuffle once; if the snapshots
are stored bucketed by the key (`sources/warehouse.py`), the join is
co-partitioned and shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Rows of the keyed delta between two snapshots: ``(key, status)``
    with status ∈ {added, removed, changed}. Unchanged rows are
    omitted (the overwhelming majority at scale — the output is the
    delta, not the corpus). NULL-safe comparison (``<=>``): a column
    going NULL→value or value→NULL counts as changed.
    """
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    same = None
    for c in compare_cols:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = eq if same is None else (same & eq)
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    status = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("added"))
        .when(F.col(f"n.{key}").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            status.alias("status"),
        )
        .where(F.col("status").isNotNull())
    )


def snapshot_diff_sql(
    old_sql: str, new_sql: str, key: str, compare_cols: list[str]
) -> str:
    """DuckDB twin of :func:`snapshot_diff` over two SELECT bodies."""
    same = " AND ".join(
        f"(o.{c} IS NOT DISTINCT FROM n.{c})" for c in compare_cols
    )
    return f"""
WITH o AS ({old_sql}), n AS ({new_sql})
SELECT COALESCE(o.{key}, n.{key}) AS {key},
       CASE WHEN o.{key} IS NULL THEN 'added'
            WHEN n.{key} IS NULL THEN 'removed'
            WHEN NOT ({same}) THEN 'changed'
       END AS status
FROM o FULL OUTER JOIN n ON o.{key} = n.{key}
WHERE (CASE WHEN o.{key} IS NULL THEN 'added'
            WHEN n.{key} IS NULL THEN 'removed'
            WHEN NOT ({same}) THEN 'changed'
       END) IS NOT NULL
"""
