"""Per-key time-series resampling with gap fill — the feature-pipeline
primitive that turns an irregular event stream into a dense regular
grid (one row per key per bucket, zeros where nothing happened), which
downstream windowed models and anomaly detectors require.

Beyond-reference scale extension (SURVEY §7 M7 family). Plan shape:

1. one map-side-combined aggregate to (key, bucket) — the only
   corpus-wide shuffle, already partial-aggregated per partition;
2. per-key span aggregate (min/max bucket — tiny, same shuffle key);
3. ``sequence()`` explode of each key's span to the dense grid;
4. one left join of grid onto the sparse counts (same key, AQE
   broadcasts the smaller side when it fits).

The explode in step 3 is bounded by ``span_cap`` buckets per key:
at 100 TB a single pathological key spanning years at second
resolution would otherwise emit tens of millions of grid rows inside
one task. Exceeding keys raise rather than silently truncate —
resampling a multi-year key at seconds is a caller bug, not data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_counts(
    events: DataFrame,
    key: str,
    ts_us: str,
    bucket_us: int,
    value_col: str | None = None,
    span_cap: int = 1_000_000,
) -> DataFrame:
    """Dense per-``key`` bucket grid between each key's first and last
    event: ``(key, bucket, n_events[, value_sum])`` with gap buckets
    zero-filled. ``bucket = ts div bucket_us``; ``value_col`` must be
    integer (quantize first) so the sums are hash-exact.
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    b = F.expr(f"{ts_us} div {bucket_us}")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("long")).alias("value_sum")
        )
    sparse = events.groupBy(F.col(key), b.alias("bucket")).agg(*aggs)
    spans = sparse.groupBy(key).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    # the guard is IN the plan (raise_error), not an eager count job at
    # call time — operators must stay job-free until the caller acts
    guarded = F.expr(
        f"CASE WHEN __b1 - __b0 < {span_cap} THEN sequence(__b0, __b1) "
        f"ELSE cast(raise_error('resample_counts: a key spans >= {span_cap}"
        f" buckets; raise bucket_us or span_cap') AS array<bigint>) END"
    )
    grid = spans.select(key, F.explode(guarded).alias("bucket"))
    zeros = {"n_events": F.lit(0).cast("long")}
    if value_col is not None:
        zeros["value_sum"] = F.lit(0).cast("long")
    out = grid.join(sparse, [key, "bucket"], "left")
    for c, z in zeros.items():
        out = out.withColumn(c, F.coalesce(F.col(c), z))
    return out


def resample_counts_sql(
    events_sql: str,
    key: str,
    ts_us: str,
    bucket_us: int,
    value_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`resample_counts` over a SELECT body
    yielding ``(key, ts_us[, value_col])``."""
    val_agg = (
        f", CAST(sum(CAST({value_col} AS BIGINT)) AS BIGINT) AS value_sum"
        if value_col is not None
        else ""
    )
    val_fill = (
        ", COALESCE(s.value_sum, 0) AS value_sum" if value_col is not None else ""
    )
    return f"""
WITH sparse AS (
  SELECT {key}, {ts_us} // {bucket_us} AS bucket,
         CAST(count(*) AS BIGINT) AS n_events{val_agg}
  FROM ({events_sql}) __e GROUP BY 1, 2
), spans AS (
  SELECT {key}, min(bucket) AS b0, max(bucket) AS b1 FROM sparse GROUP BY 1
), grid AS (
  SELECT {key}, CAST(g AS BIGINT) AS bucket
  FROM spans, unnest(generate_series(b0, b1)) u(g)
)
SELECT grid.{key}, grid.bucket,
       COALESCE(s.n_events, 0) AS n_events{val_fill}
FROM grid LEFT JOIN sparse s
  ON s.{key} = grid.{key} AND s.bucket = grid.bucket
"""


def cusum_alerts(
    df: DataFrame,
    key: str,
    bucket_col: str,
    value_col: str,
    drift_k: int,
    threshold_h: int,
) -> DataFrame:
    """One-sided CUSUM change-point detection per key over a bucketed
    integer series (Page 1954 — the standard "did this metric shift
    upward" monitor for pipeline observability): the textbook
    recursion ``S_t = max(0, S_{t-1} + x_t − k)`` is sequential, but
    it has a closed WINDOW form — with ``C_t = Σ_{j<=t}(x_j − k)``
    (and the implicit C_0 = 0),

        ``S_t = C_t − min(0, min_{j<=t} C_j)``

    so the whole detector is two cumulative windows per key (running
    sum + running min), no recursion, no UDF, exact integers. Output:
    one row per (key, bucket) whose ``cusum > threshold_h`` —
    ``(key, bucket, value, cusum)``. ``drift_k`` is the per-bucket
    allowance (set to the in-control mean plus slack); both it and the
    values must be integers for cross-engine exactness.

    Scale shape: one shuffle by key; per-key state is the bucketed
    series (bounded by the time span, not the event count — aggregate
    to buckets FIRST, e.g. via `resample_counts`). Keys are
    independent — the usual per-key-window contract."""
    w = (
        Window.partitionBy(key)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = F.sum(F.col(value_col).cast("long") - F.lit(drift_k)).over(w)
    base = df.withColumn("__c", c).withColumn(
        "__m", F.min("__c").over(w)
    )
    cusum = F.col("__c") - F.least(F.lit(0), F.col("__m"))
    return (
        base.withColumn("cusum", cusum.cast("long"))
        .where(F.col("cusum") > threshold_h)
        .select(
            key,
            bucket_col,
            F.col(value_col).cast("long").alias(value_col),
            "cusum",
        )
    )


def cusum_alerts_sql(
    series_sql: str,
    key: str,
    bucket_col: str,
    value_col: str,
    drift_k: int,
    threshold_h: int,
) -> str:
    """DuckDB twin of :func:`cusum_alerts`; ``series_sql`` produces
    the bucketed (key, bucket, value) series."""
    return f"""
WITH s AS ({series_sql}),
c AS (
  SELECT {key}, {bucket_col}, CAST({value_col} AS BIGINT) AS v,
         sum(CAST({value_col} AS BIGINT) - {drift_k}) OVER (
             PARTITION BY {key} ORDER BY {bucket_col}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM s
),
m AS (
  SELECT *, min(cum) OVER (
      PARTITION BY {key} ORDER BY {bucket_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS mn
  FROM c
)
SELECT {key}, {bucket_col}, v AS {value_col},
       CAST(cum - least(0, mn) AS BIGINT) AS cusum
FROM m WHERE cum - least(0, mn) > {threshold_h}
"""


def fano_dispersion(
    df: DataFrame,
    key_col: str,
    bucket_col: str | Column,
    out_scale: int = 1_000_000,
) -> DataFrame:
    """Per-key burstiness audit via the Fano factor (index of
    dispersion) of per-bucket event counts: variance/mean == 1 for a
    Poisson arrival process, >> 1 for bursty machine traffic, << 1 for
    metronomic schedulers. With integer counts the ratio is exact
    integer arithmetic:  var/mean = (n·ΣQ − S²) / (n·S)  over n
    buckets with count sum ``S`` and square-sum ``Q`` — reported
    micro-scaled plus the over-dispersion verdict, no floats anywhere.

    100 TB design: two map-side-combinable aggregates (events → bucket
    counts → per-key moments); state is keys × buckets, never events."""
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    counts = (
        df.select(F.col(key_col), b.alias("__b"))
        .groupBy(key_col, "__b")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        counts.groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("c").cast("long").alias("total"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("__q"),
        )
        .withColumn(
            "__num",
            (
                F.col("n_buckets").cast("decimal(38,0)") * F.col("__q")
                - F.col("total").cast("decimal(38,0)") * F.col("total")
            )
            * out_scale,
        )
        .withColumn(
            "__den", F.col("n_buckets").cast("decimal(38,0)") * F.col("total")
        )
        .select(
            key_col,
            "n_buckets",
            "total",
            # decimal(38,0) intermediates: n·Q and S² overflow int64 well
            # before the per-key bucket counts do; div floor == trunc
            # since n·Q ≥ S² (Cauchy–Schwarz)
            F.expr("__num div __den").cast("long").alias("fano_micro"),
            (F.col("__num") > F.col("__den") * out_scale).alias("overdispersed"),
        )
    )


def fano_dispersion_sql(
    table: str, key_col: str, bucket_expr: str, out_scale: int = 1_000_000
) -> str:
    return f"""
WITH counts AS (
  SELECT {key_col}, {bucket_expr} AS b, CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY {key_col}, {bucket_expr}
),
mom AS (
  SELECT {key_col}, CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(c) AS BIGINT) AS total,
         CAST(sum(c * c) AS BIGINT) AS q
  FROM counts GROUP BY {key_col}
)
SELECT {key_col}, n_buckets, total,
       CAST(((CAST(n_buckets AS HUGEINT) * q - CAST(total AS HUGEINT) * total) * {out_scale})
            // (CAST(n_buckets AS HUGEINT) * total) AS BIGINT) AS fano_micro,
       ((CAST(n_buckets AS HUGEINT) * q - CAST(total AS HUGEINT) * total) * {out_scale})
           > (CAST(n_buckets AS HUGEINT) * total * {out_scale}) AS overdispersed
FROM mom
"""
