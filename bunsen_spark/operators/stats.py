"""Grouped order statistics and feature scaling, integer-exact.

Beyond-reference scale extensions (SURVEY §7 M7 family): the feature-
engineering passes a training pipeline runs over metric columns —
robust centers (median) and bounded scaling (min-max) — expressed so
every emitted number is integer arithmetic and therefore
hash-gateable against an independent DuckDB formulation.

The median trick: an exact grouped median over integers is emitted as
``median2 = lower_middle + upper_middle`` (twice the median) — an
integer for both odd and even group sizes, avoiding the float ``.5``
that an averaged even-count median would introduce. The oracle
computes it from DuckDB's own ``median()`` (a DIFFERENT algorithm —
order-statistics interpolation vs this operator's two-window rank
selection), so a green gate row checks the semantics, not a shared
implementation.

Plan shapes: the median is one rank window + one filtered aggregate
per group (state bounded by group size; use the hot-key guards'
bucketing pattern if a group is pathological); min-max normalization
is one grouped min/max aggregate broadcast back onto the rows — at
100 TB the row side never shuffles (broadcast join), the aggregate is
map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_median2(df: DataFrame, key: str, col: str) -> DataFrame:
    """Per-``key`` exact ``(n, median2)`` where ``median2`` is twice
    the median of the integer column ``col`` (lower+upper middle)."""
    ranked = df.select(
        key,
        F.col(col).cast("long").alias("__v"),
        F.row_number().over(
            Window.partitionBy(key).orderBy(F.col(col).asc())
        ).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key)).alias("__n"),
    )
    # middle selection: rn == floor((n+1)/2) or rn == ceil((n+1)/2)
    middles = ranked.where(
        (F.col("__rn") == F.expr("(__n + 1) div 2"))
        | (F.col("__rn") == F.expr("(__n + 2) div 2"))
    )
    return middles.groupBy(key).agg(
        F.max("__n").cast("long").alias("n"),
        # odd n: both predicates hit the SAME row -> double it;
        # even n: two distinct rows -> their sum
        F.when(F.max("__n") % 2 == 1, F.sum("__v") * 2)
        .otherwise(F.sum("__v"))
        .cast("long")
        .alias("median2"),
    )


def grouped_median2_sql(table_sql: str, key: str, col: str) -> str:
    """DuckDB twin via the engine's own ``median()`` — an independent
    algorithm; ``2*median`` of integers is exactly representable."""
    return f"""
SELECT {key}, CAST(count(*) AS BIGINT) AS n,
       CAST(round(2 * median({col})) AS BIGINT) AS median2
FROM ({table_sql}) __t
GROUP BY {key}
"""


def _join_stats_back(df: DataFrame, stats: DataFrame, key: str) -> DataFrame:
    """Null-safe join of a per-group stats table back onto the rows.

    ``groupBy`` keeps NULL keys as their own group, but a plain
    ``df.join(stats, key)`` equi-join silently DROPS those rows — while
    the DuckDB window twins (``PARTITION BY key``) keep them as the NULL
    partition. ``eqNullSafe`` restores window semantics: NULL-key rows
    join their own group's stats instead of vanishing.
    """
    extra = [c for c in stats.columns if c != key]
    left, right = df.alias("__rows"), stats.alias("__stats")
    return left.join(
        right, F.col(f"__rows.{key}").eqNullSafe(F.col(f"__stats.{key}"))
    ).select(
        *[F.col(f"__rows.{c}") for c in df.columns],
        *[F.col(f"__stats.{c}") for c in extra],
    )


def minmax_normalize(df: DataFrame, key: str, col: str) -> DataFrame:
    """Append exact min-max scaling terms per group: ``num = x - min``
    and ``den = max - min`` (the normalized value is ``num/den``;
    emitting the rational pair keeps the gate float-free, and callers
    divide at the edge). Constant groups get ``den = 0`` — the caller
    decides the convention (the usual one: treat as 0.5 or drop).

    One map-side-combined aggregate + one broadcast join back: the
    data rows never shuffle.
    """
    stats = df.groupBy(key).agg(
        F.min(F.col(col).cast("long")).alias("__mn"),
        F.max(F.col(col).cast("long")).alias("__mx"),
    )
    # no forced broadcast: group cardinality is caller-controlled — AQE
    # broadcasts the stats when they fit (the usual case: row side
    # never shuffles) and degrades to a shuffle join on million-group
    # keys instead of blowing the broadcast limit
    return _join_stats_back(df, stats, key).select(
        *df.columns,
        (F.col(col).cast("long") - F.col("__mn")).alias("num"),
        (F.col("__mx") - F.col("__mn")).alias("den"),
    )


def minmax_normalize_sql(table_sql: str, key: str, col: str, cols: str) -> str:
    """DuckDB twin (window formulation — independent of the
    aggregate+join plan)."""
    return f"""
SELECT {cols},
       CAST({col} - min({col}) OVER (PARTITION BY {key}) AS BIGINT) AS num,
       CAST(max({col}) OVER (PARTITION BY {key})
            - min({col}) OVER (PARTITION BY {key}) AS BIGINT) AS den
FROM ({table_sql}) __t
"""


def grouped_winsorize(
    df: DataFrame,
    key: str,
    col: str,
    lo_num: int,
    hi_num: int,
    den: int = 100,
) -> DataFrame:
    """Winsorize (clip) an integer column at per-group discrete
    percentiles — the outlier-taming pass feature pipelines run before
    scaling. Thresholds are DISCRETE order statistics (the value at
    rank ``ceil(p*n)``, DuckDB ``quantile_disc`` semantics) computed
    with the integer rank formula ``(num*n + den - 1) div den`` — no
    float percentile anywhere, so the result is hash-exact.

    Appends ``clipped`` (the winsorized value), ``lo_val`` and
    ``hi_val`` (the group's thresholds). One rank window per group +
    one threshold aggregate joined back (AQE broadcasts the per-group
    threshold table when it fits).
    """
    if not (0 < lo_num <= hi_num <= den):
        raise ValueError("need 0 < lo_num <= hi_num <= den")
    v = F.col(col).cast("long")
    ranked = df.select(
        "*",
        F.row_number()
        .over(Window.partitionBy(key).orderBy(v.asc()))
        .alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(key)).alias("__n"),
    )
    lo_rank = F.expr(f"({lo_num} * __n + {den - 1}) div {den}")
    hi_rank = F.expr(f"({hi_num} * __n + {den - 1}) div {den}")
    thresholds = (
        ranked.groupBy(key)
        .agg(
            F.max(F.when(F.col("__rn") == lo_rank, v)).alias("lo_val"),
            F.max(F.when(F.col("__rn") == hi_rank, v)).alias("hi_val"),
        )
    )
    return _join_stats_back(df, thresholds, key).select(
        "*",
        F.greatest(
            F.col("lo_val"), F.least(F.col("hi_val"), v)
        ).alias("clipped"),
    )


def grouped_winsorize_sql(
    table_sql: str,
    key: str,
    col: str,
    lo_num: int,
    hi_num: int,
    den: int = 100,
    cols: str = "*",
) -> str:
    """DuckDB twin via the engine's own ``quantile_disc`` — an
    independent order-statistics implementation. The default
    ``cols='*'`` is qualified to ``src.*`` so the internal ``__key``
    join column never leaks into the output shape (ADVICE r6)."""
    lo = lo_num / den
    hi = hi_num / den
    if cols == "*":
        cols = "src.*"
    return f"""
WITH src AS ({table_sql}), th AS (
  SELECT {key} AS __key,
         CAST(quantile_disc({col}, {lo}) AS BIGINT) AS lo_val,
         CAST(quantile_disc({col}, {hi}) AS BIGINT) AS hi_val
  FROM src GROUP BY {key}
)
SELECT {cols}, lo_val, hi_val,
       greatest(lo_val, least(hi_val, CAST({col} AS BIGINT))) AS clipped
FROM src JOIN th ON src.{key} IS NOT DISTINCT FROM th.__key
"""


def flag_outliers(
    df: DataFrame,
    key: str,
    col: str,
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """Per-group k-sigma outlier flag, INTEGER-exact: a row is flagged
    when ``(x - mean)^2 > k^2 * variance`` — evaluated as the
    cross-multiplied integer predicate

        den^2 * (n*x - sum)^2  >  num^2 * (n*sumsq - sum^2)

    (both sides are the k-sigma test multiplied by ``n^2``), so no
    division, no sqrt, no
    float — the flag is hash-exact and partition-order-invariant.
    ``k = k_num/k_den`` (defaults to the classic 3 sigma).

    Plan: one map-side-combined (sum, sumsq, n) aggregate per group
    joined back (AQE broadcast when it fits) + a map-stage predicate.
    Overflow headroom: ``(n*x)^2`` must fit int64 — fine for
    quantized metrics in the 1e4 range up to ~1e6-row groups; quantize
    coarser (or lift to decimal) beyond that, the predicate is
    unchanged.
    """
    if k_num <= 0 or k_den <= 0:
        raise ValueError("k_num and k_den must be positive")
    v = F.col(col).cast("long")
    stats = df.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__ss"),
    )
    dev = F.col("__n") * v - F.col("__s")          # n*(x - mean)
    nvar = F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")  # n^2*var
    flagged = (F.lit(k_den * k_den) * dev * dev) > (
        F.lit(k_num * k_num) * nvar
    )
    return _join_stats_back(df, stats, key).select(
        *df.columns, flagged.alias("is_outlier")
    )


def flag_outliers_sql(
    table_sql: str,
    key: str,
    col: str,
    k_num: int = 3,
    k_den: int = 1,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`flag_outliers` (window formulation)."""
    n = f"count(*) OVER (PARTITION BY {key})"
    s = f"sum(CAST({col} AS BIGINT)) OVER (PARTITION BY {key})"
    ss = (
        f"sum(CAST({col} AS BIGINT) * CAST({col} AS BIGINT))"
        f" OVER (PARTITION BY {key})"
    )
    return f"""
SELECT {cols},
       ({k_den * k_den} * (__n * CAST({col} AS BIGINT) - __s)
            * (__n * CAST({col} AS BIGINT) - __s))
       > ({k_num * k_num} * (__n * __ss - __s * __s)) AS is_outlier
FROM (
  SELECT *, CAST({n} AS BIGINT) AS __n, CAST({s} AS BIGINT) AS __s,
         CAST({ss} AS BIGINT) AS __ss
  FROM ({table_sql}) __t
) __w
"""


def mad_outliers(
    df: DataFrame,
    key: str,
    col: str,
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """Per-group robust outlier counts by the median/MAD rule,
    INTEGER-exact — the robust twin of :func:`flag_outliers`: a value
    is an outlier when ``|x - median| > k * MAD`` (MAD = median
    absolute deviation), the estimator that survives the 50%
    contamination a mean/sigma rule does not — the standard robust
    filter for metric columns with heavy tails (a handful of corrupt
    rows cannot move the threshold).

    Doubled-integer algebra keeps every intermediate an int64: with
    ``med2 = 2*median`` and ``d = |2x - med2| = 2|x - median|`` (both
    integers for integer ``x``, odd or even group size), ``mad2 =
    median2(d) = 4*MAD``, and the flag cross-multiplies to

        2 * k_den * d  >  k_num * mad2

    — no halves, no floats, hash-exact against the oracle's own
    ``median()`` (a different algorithm: interpolated order statistic
    vs this module's two-window rank selection).

    Output: ``(key, n, median2, mad2, n_outliers)``. Plan: two
    :func:`grouped_median2` passes (value ranks, then deviation ranks)
    + null-safe stat joins back + one counted aggregate; the rank
    windows partition by ``key`` — for pathological single-key tables
    use the bucketed hot-key machinery noted in the module doc."""
    if k_num <= 0 or k_den <= 0:
        raise ValueError("k_num and k_den must be positive")
    base = df.select(key, F.col(col).cast("long").alias("__x"))
    med = grouped_median2(base, key, "__x")
    devs = _join_stats_back(base, med, key).select(
        key,
        "n",
        "median2",
        F.abs(2 * F.col("__x") - F.col("median2")).alias("__d"),
    )
    mad = grouped_median2(devs.select(key, "__d"), key, "__d").select(
        key, F.col("median2").alias("mad2")
    )
    return _join_stats_back(devs, mad, key).groupBy(key).agg(
        F.max("n").cast("long").alias("n"),
        F.max("median2").cast("long").alias("median2"),
        F.max("mad2").cast("long").alias("mad2"),
        F.sum(
            (
                F.lit(2 * k_den) * F.col("__d")
                > F.lit(k_num) * F.col("mad2")
            ).cast("long")
        ).alias("n_outliers"),
    )


def mad_outliers_sql(
    table_sql: str,
    key: str,
    col: str,
    k_num: int = 3,
    k_den: int = 1,
) -> str:
    """DuckDB twin of :func:`mad_outliers` via the engine's own
    ``median()`` (interpolated; ``2*median`` of integers is exactly
    representable, so the ``round`` casts are lossless)."""
    return f"""
WITH src AS (
  SELECT {key} AS k, CAST({col} AS BIGINT) AS x FROM ({table_sql}) __t
), med AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
         CAST(round(2 * median(x)) AS BIGINT) AS median2
  FROM src GROUP BY k
), dev AS (
  SELECT src.k, n, median2, abs(2 * x - median2) AS d
  FROM src JOIN med ON src.k IS NOT DISTINCT FROM med.k
), mad AS (
  SELECT k, CAST(round(2 * median(d)) AS BIGINT) AS mad2
  FROM dev GROUP BY k
)
SELECT dev.k AS {key}, max(n) AS n, max(median2) AS median2,
       max(mad2) AS mad2,
       CAST(sum(CASE WHEN 2 * {k_den} * d > {k_num} * mad2
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.k IS NOT DISTINCT FROM mad.k
GROUP BY dev.k
"""


def pareto_frontier(df: DataFrame, x: str, y: str) -> DataFrame:
    """Distributed 2D Pareto frontier (skyline) over integer metric
    columns ``x`` and ``y``: keep the rows not DOMINATED by any other
    row, where b dominates a when ``b.x >= a.x`` and ``b.y >= a.y``
    with at least one strict. Duplicates of a frontier point are all
    kept (neither dominates the other). The curation shape: "keep the
    documents no other document beats on both quality axes at once" —
    a cut no single-axis threshold can express.

    The naive skyline is an O(n²) self-join; this plan is three
    bounded passes with the row table never shuffling:

    1. reduce to the per-``x`` max-``y`` table (one map-side-combined
       aggregate, |distinct x| rows);
    2. on that table compute the STRICT-suffix max ``M(x) =
       max{maxy(x') : x' > x}`` with the `global_row_number` pattern —
       range-repartition by ``x`` desc, per-partition EXCLUSIVE
       running max (one row per ``x``, so row-exclusive = x-strict),
       P² offset self-join, broadcast back — no single-partition
       window anywhere;
    3. join the tiny per-``x`` stats onto the rows (AQE broadcast) and
       keep a row iff ``y == maxy(x)`` (not beaten at its own x) and
       ``y > M(x)`` (not beaten by any strictly larger x; M is null at
       the global max x).

    Values must be non-null; ``y`` is compared as int64."""
    from ..persist import materialize

    yl = F.col(y).cast("long")
    t = df.groupBy(x).agg(F.max(yl).alias("__maxy"))
    tagged = materialize(
        t.repartitionByRange(F.col(x).desc()).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    pmax = tagged.groupBy("__pid").agg(F.max("__maxy").alias("__pm"))
    earlier = pmax.select(
        F.col("__pid").alias("__pid2"), F.col("__pm").alias("__pm2")
    )
    offsets = (
        pmax.join(earlier, F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.max("__pm2").alias("__off"))
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(x).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stats = (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn("__cm", F.max("__maxy").over(w))
        # greatest() skips nulls: null only when BOTH are (global max x)
        .select(x, "__maxy", F.greatest("__cm", "__off").alias("__m"))
    )
    return (
        df.join(stats, x)
        .where(
            (yl == F.col("__maxy"))
            & (F.col("__m").isNull() | (yl > F.col("__m")))
        )
        .select(*df.columns)
    )


def pareto_frontier_sql(table_sql: str, x: str, y: str, cols: str) -> str:
    """DuckDB twin of :func:`pareto_frontier` — the literal dominance
    definition as a NOT EXISTS anti-self-join (quadratic; oracle-scale
    only)."""
    return f"""
SELECT {cols} FROM ({table_sql}) a
WHERE NOT EXISTS (
  SELECT 1 FROM ({table_sql}) b
  WHERE b.{x} >= a.{x} AND b.{y} >= a.{y}
    AND (b.{x} > a.{x} OR b.{y} > a.{y})
)
"""


def equi_depth_histogram(
    df: DataFrame,
    col: str,
    n_bins: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact equi-depth (equal-frequency) histogram — the optimizer-
    statistics / feature-binning shape: ``n_bins`` buckets of (near-)
    equal row count with their value ranges. Output: (bin, lo, hi, n),
    bin 1 = lowest values, ntile row-split semantics (first ``N mod
    n_bins`` bins take the extra row).

    Distributed-exact: global rank via
    :func:`windows.global_row_number` (range repartition + broadcast
    offsets — no single-partition window), the bin from the rank
    arithmetic (:func:`windows.ntile_from_rank`), then one aggregate.
    ``tiebreak`` columns must complete a total order; the histogram
    VALUES are tie-order-invariant (tied values share a bin boundary
    value by construction), the gate just needs determinism."""
    from .windows import global_row_number, ntile_from_rank

    tiebreak = tiebreak or []
    src = df.select(col, *tiebreak)
    ranked = global_row_number(
        src, [F.col(col).asc()] + [F.col(t).asc() for t in tiebreak], "__k"
    )
    n_tot = src.agg(F.count(F.lit(1)).alias("__n"))
    binned = ranked.crossJoin(F.broadcast(n_tot)).withColumn(
        "bin", ntile_from_rank("__k", "__n", n_bins)
    )
    return binned.groupBy("bin").agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


def equi_depth_histogram_sql(
    table_sql: str, col: str, n_bins: int, tiebreak: list[str] | None = None
) -> str:
    """DuckDB twin via the engine's own ntile window."""
    order = ", ".join([col] + (tiebreak or []))
    return f"""
WITH src AS ({table_sql}), b AS (
  SELECT {col} AS v, CAST(ntile({n_bins}) OVER (ORDER BY {order}) AS BIGINT) AS bin
  FROM src
)
SELECT bin, min(v) AS lo, max(v) AS hi, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bin
"""


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    qs: list[tuple[str, int, int]],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Exact WEIGHTED quantiles at scale — "the value below which q of
    the total weight lies" (weighted median = q 1/2), the curation
    shape for token-mass / byte-mass cutoffs where row-count quantiles
    mislead. ``qs`` are (label, num, den) rational quantiles; weights
    must be positive integers (cast to long). Output: (q, value).

    Plan: one exact global weighted running total
    (:func:`windows.global_weighted_cumsum` — range repartition +
    broadcast per-partition totals, NO single-partition window), the
    total weight W broadcast as one row, and the selection "first row
    with cumw >= ceil(q·W)" as a map-side filter — integer targets via
    ``(W·num + den - 1) div den``, so the DuckDB twin is bit-exact."""
    from .windows import global_weighted_cumsum

    tiebreak = tiebreak or []
    w = F.col(weight_col).cast("long")
    src = df.select(value_col, *tiebreak, w.alias("__wt"))
    cum = global_weighted_cumsum(
        src,
        [F.col(value_col).asc()] + [F.col(t).asc() for t in tiebreak],
        "__wt",
        "__cumw",
    )
    spark = df.sparkSession
    from ..localrel import values_df

    targets = values_df(spark, qs, "q string, num long, den long")
    tot = src.agg(F.sum("__wt").alias("__W"))
    targets = targets.crossJoin(tot).select(
        "q",
        F.expr("(__W * num + den - 1) div den").alias("__target"),
    )
    hit = cum.crossJoin(F.broadcast(targets)).where(
        (F.col("__cumw") >= F.col("__target"))
        & (F.col("__cumw") - F.col("__wt") < F.col("__target"))
    )
    return hit.select("q", F.col(value_col).alias("value"))


def weighted_quantiles_sql(
    table_sql: str,
    value_col: str,
    weight_col: str,
    qs: list[tuple[str, int, int]],
    tiebreak: list[str] | None = None,
) -> str:
    """DuckDB twin: global window cumsum + the same integer targets."""
    order = ", ".join([value_col] + (tiebreak or []))
    values = ", ".join(f"('{q}', {num}, {den})" for q, num, den in qs)
    return f"""
WITH src AS ({table_sql}), o AS (
  SELECT {value_col} AS v, CAST({weight_col} AS BIGINT) AS wt,
         sum(CAST({weight_col} AS BIGINT)) OVER (
             ORDER BY {order} ROWS UNBOUNDED PRECEDING
         ) AS cumw
  FROM src
), tot AS (SELECT sum(CAST({weight_col} AS BIGINT)) AS W FROM src),
targets(q, num, den) AS (VALUES {values})
SELECT q, v AS value
FROM o, tot, targets
WHERE cumw >= (W * num + den - 1) // den
  AND cumw - wt < (W * num + den - 1) // den
"""
