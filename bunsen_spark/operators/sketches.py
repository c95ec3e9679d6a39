"""Mergeable-sketch operators: approximate distinct counts, quantiles
and their exact twins.

These are the scale-path complements to the exact aggregations in the
gate queries (e.g. ``events_daily_active_users``). The exact
COUNT(DISTINCT) shuffle is bounded by groups × distinct values; once
THAT is the bottleneck (billions of users, thousands of slices), the
sketch path trades a fixed relative error for a fixed-size state:

- **HLL sketches** (``hll_sketch_agg`` — Apache DataSketches HLL,
  JVM-side): one sub-kilobyte binary per group that is MERGEABLE —
  per-partition (or per-day, per-shard) sketches union into rollups
  without re-reading the raw data. That mergeability is the warehouse
  pattern: persist per-partition sketches once, answer any
  slice-rollup distinct-count later at sketch-size cost.
- **approx quantiles** (``percentile_approx`` — a positional sketch):
  rank-error-bounded quantiles in one pass, no global sort.

None of these enter the DuckDB correctness gate: their results are
estimator outputs, not unique answers (DataSketches HLL and DuckDB's
approx_count_distinct disagree by design). The contract tested in
``tests/test_sketches.py`` is (a) relative error vs. the exact twin is
within the configured bound, and (b) merged sketches equal the
all-at-once sketch exactly (same binary → same estimate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, group_col: str, value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketches: ``(group, sketch binary, estimate)``.

    One aggregation; the shuffle carries fixed-size sketch state per
    (partition × group) instead of distinct values, so the cost is
    independent of value cardinality. ``lg_k=12`` → ~2.5 KB per sketch,
    ~1.6% standard error."""
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias("sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k))
        ).cast("long").alias("estimate"),
    )


def merge_sketches(sketches: DataFrame) -> DataFrame:
    """Roll per-group sketches up to one global estimate WITHOUT
    touching raw data — the mergeability contract. Input must have a
    ``sketch`` column from :func:`distinct_sketches`."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).cast("long").alias(
            "estimate"
        )
    )


def approx_distinct_by(
    df: DataFrame, group_col: str, value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group approximate distinct count (HyperLogLog++,
    ``approx_count_distinct``): the drop-in approximate form of the
    exact two-phase distinct aggregate. ``rsd`` is the target relative
    standard deviation."""
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.approx_count_distinct(F.col(value_col), rsd).alias("approx_distinct")
    )


def exact_distinct_by(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """The exact twin of :func:`approx_distinct_by` (two-phase
    distinct aggregate)."""
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(F.col(value_col)).alias("n_distinct")
    )


def approx_quantiles(
    df: DataFrame, value_col: str, probs: tuple[float, ...], accuracy: int = 10000
) -> DataFrame:
    """One-pass rank-sketch quantiles: a single row with one column per
    requested probability. No global sort, no collect — the sketch
    merges map-side like any partial aggregate. ``accuracy`` bounds the
    rank error at ``1/accuracy`` of the row count."""
    aggs: list[Column] = [
        F.percentile_approx(F.col(value_col), F.lit(p), F.lit(accuracy)).alias(
            f"p{int(p * 100):02d}"
        )
        for p in probs
    ]
    return df.agg(*aggs)


# ---------------------------------------------------------------------------
# Count-min sketch, pure Catalyst — the frequency twin of the Bloom
# filter in operators/bloom.py. Spark's builtin count_min_sketch()
# aggregate emits an opaque binary the SQL surface cannot query, so the
# sketch here is a first-class DataFrame of (row, col, cnt) cells:
# buildable with one aggregate, probeable with broadcast joins,
# mergeable with a sum — and auditable.
# ---------------------------------------------------------------------------

DEFAULT_CM_WIDTH = 1 << 12
DEFAULT_CM_DEPTH = 4


def _cm_pos(value: Column, r: int, width: int, portable: bool) -> Column:
    """Hash position of ``value`` in sketch row ``r``. The default
    family is xxhash64 (JVM-fast); ``portable=True`` switches to the
    md5-based family shared with the dedup operators, reproducible
    bit-for-bit in DuckDB (the hash the oracle gate uses)."""
    if portable:
        from .text_analysis import md5int

        return F.pmod(
            md5int(F.concat_ws("#", value.cast("string"), F.lit(str(r)))),
            F.lit(width),
        )
    return F.pmod(F.xxhash64(value, F.lit(r)), F.lit(width))


def cm_pos_sql(value_expr: str, r: int, width: int) -> str:
    """DuckDB twin of the portable hash family in :func:`_cm_pos`."""
    from .text_analysis import md5int_sql

    h = md5int_sql(f"concat_ws('#', CAST({value_expr} AS VARCHAR), '{r}')")
    return f"(({h}) % {width})"


def countmin_table(
    df: DataFrame,
    value_col: str,
    width: int = DEFAULT_CM_WIDTH,
    depth: int = DEFAULT_CM_DEPTH,
    portable: bool = False,
) -> DataFrame:
    """Build a count-min sketch as a cell table (row, col, cnt).

    Each value hashes into one column per row (``xxhash64(value, r)``
    mod width); a single groupBy aggregates cell counts. The shuffle is
    bounded by ``depth × width`` distinct cells regardless of input
    size, and the table is MERGEABLE: union two tables and sum cnt per
    (row, col) to get the sketch of the concatenated inputs — the same
    warehouse pattern as the HLL sketches above (persist per-partition
    sketches, roll up later without raw data)."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _cm_pos(F.col(value_col), r, width, portable).alias("col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(cells)
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two cell tables built with identical (width, depth)."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def countmin_estimate(
    probes: DataFrame,
    value_col: str,
    table: DataFrame,
    width: int = DEFAULT_CM_WIDTH,
    depth: int = DEFAULT_CM_DEPTH,
    portable: bool = False,
) -> DataFrame:
    """Estimated frequency for every probe row: min over rows of the
    cell counts at the probe's hash positions. One broadcast left join
    per depth level (cell tables are ≤ depth × width rows ≈ KiBs);
    probe cardinality never changes. Guarantee: estimate >= true count,
    and P[estimate > true + eps*N] < delta with eps = e/width,
    delta = exp(-depth)."""
    out = probes
    mins: list[Column] = []
    for r in range(depth):
        t = table.where(F.col("row") == r).select(
            F.col("col").alias(f"_cm_col_{r}"), F.col("cnt").alias(f"_cm_cnt_{r}")
        )
        out = out.join(
            F.broadcast(t),
            _cm_pos(F.col(value_col), r, width, portable) == F.col(f"_cm_col_{r}"),
            "left",
        )
        mins.append(F.coalesce(F.col(f"_cm_cnt_{r}"), F.lit(0)))
    est = F.least(*mins) if len(mins) > 1 else mins[0]
    return out.withColumn("cm_estimate", est.cast("long")).drop(
        *[c for r in range(depth) for c in (f"_cm_col_{r}", f"_cm_cnt_{r}")]
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    min_count: int,
    width: int = DEFAULT_CM_WIDTH,
    depth: int = DEFAULT_CM_DEPTH,
    portable: bool = False,
) -> DataFrame:
    """EXACT heavy hitters — every value occurring at least
    ``min_count`` times, with its exact count — via a count-min
    prefilter. Output: (value, n).

    The naive plan (groupBy all values, HAVING) shuffles every
    occurrence of every value; on a long-tailed 100 TB column almost
    all of that shuffle is tail keys that can never clear the
    threshold. This plan builds the bounded count-min cell table
    (shuffle ≤ depth × width cells), broadcast-probes it back onto the
    rows, and drops sub-threshold rows MAP-SIDE before the exact
    aggregation — the exact groupBy then only sees occurrences of
    candidate values. Count-min never underestimates, so the prefilter
    has no false negatives and the final HAVING makes collisions
    harmless: the result is exactly the naive plan's, which is also
    why the DuckDB oracle is the plain GROUP BY/HAVING."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    from ..persist import materialize

    # the cell table feeds one broadcast join per depth level; one-shot
    # call, so no release (persist.py's documented convention)
    cm = countmin_table(df, value_col, width, depth, portable).transform(
        materialize
    )
    candidates = countmin_estimate(
        df.select(value_col), value_col, cm, width, depth, portable
    ).where(F.col("cm_estimate") >= min_count)
    return (
        candidates.groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )


def heavy_hitters_sql(table: str, value_col: str, min_count: int) -> str:
    """DuckDB twin of :func:`heavy_hitters` — the plain exact
    aggregation the prefilter provably reduces to."""
    return f"""
SELECT {value_col} AS value, CAST(count(*) AS BIGINT) AS n
FROM {table} GROUP BY {value_col} HAVING count(*) >= {min_count}
"""
