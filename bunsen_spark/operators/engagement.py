"""Event-stream engagement analytics: exact time-decayed scoring and
session path mining.

Beyond-reference scale extensions (SURVEY §7 M7 family — the reference
has no event analytics). Both operators are single-aggregation /
single-window plans over the events table.

The decay operator solves the usual impossibility of hash-gating an
exponentially-decayed score (``sum(v * exp(-age/τ))`` depends on float
summation order) by quantizing TIME instead of the weight: age is
bucketed into whole half-lives, so every weight is an exact power of
two ``2^(B - bucket)`` representable as an int64, and the aggregate is
pure integer arithmetic — bit-identical in any engine, any partition
order, any corpus size. The classic streaming trick (decay = shift) at
Spark scale: one map-side-combined ``groupBy`` and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def decayed_counts(
    events: DataFrame,
    key: str,
    ts_us: str,
    ref_us: int,
    half_life_us: int,
    value_cents: str | None = None,
    max_half_lives: int = 30,
) -> DataFrame:
    """Per-``key`` exact half-life-decayed engagement: each event at
    age ``a`` contributes weight ``2^(B - (a div half_life))`` (0 once
    older than ``B = max_half_lives`` half-lives; a weight of ``2^B``
    means "now"). Returns ``(key, n_events, decayed_weight[, decayed_value])``
    — all int64.

    Headroom: the largest weight is ``2^B``; with the default B=30 an
    int64 sum holds ~2^33 fresh events per key (scale ``B`` down, or
    cast the sum to decimal(38,0), for hotter keys). Events from the
    future of ``ref_us`` are clamped into bucket 0 rather than
    amplified.
    """
    if not 0 < max_half_lives < 62:
        raise ValueError("max_half_lives must be in (0, 62)")
    if half_life_us <= 0:
        raise ValueError("half_life_us must be positive")
    # integer division, not float floor: (x div y) semantics
    b = F.greatest(
        F.expr(f"({ref_us} - {ts_us}) div {half_life_us}"), F.lit(0).cast("long")
    )
    w = F.when(b >= max_half_lives, F.lit(0).cast("long")).otherwise(
        F.expr(f"shiftleft(1L, cast({max_half_lives} - "
               f"greatest(({ref_us} - {ts_us}) div {half_life_us}, 0L) as int))")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(w).cast("long").alias("decayed_weight"),
    ]
    if value_cents is not None:
        aggs.append(
            F.sum(w * F.col(value_cents).cast("long"))
            .cast("long")
            .alias("decayed_value")
        )
    return events.groupBy(key).agg(*aggs)


def decayed_counts_sql(
    events_sql: str,
    key: str,
    ts_us: str,
    ref_us: int,
    half_life_us: int,
    value_cents: str | None = None,
    max_half_lives: int = 30,
) -> str:
    """DuckDB twin of :func:`decayed_counts` over a SELECT body that
    yields ``(key, ts_us[, value_cents])``."""
    b = f"greatest(({ref_us} - {ts_us}) // {half_life_us}, 0)"
    w = (
        f"CASE WHEN {b} >= {max_half_lives} THEN CAST(0 AS BIGINT) "
        f"ELSE (CAST(1 AS BIGINT) << CAST({max_half_lives} - {b} AS INTEGER)) END"
    )
    val = (
        f", CAST(sum(({w}) * CAST({value_cents} AS BIGINT)) AS BIGINT)"
        f" AS decayed_value"
        if value_cents is not None
        else ""
    )
    return f"""
SELECT {key}, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({w}) AS BIGINT) AS decayed_weight{val}
FROM ({events_sql}) __e
GROUP BY {key}
"""


def session_path_counts(
    events: DataFrame,
    key: str,
    ts_us: str,
    session_col: str,
    step_col: str,
    depth: int = 3,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Frequent ``depth``-step paths across sessionized events: for
    every consecutive window of ``depth`` steps inside one session,
    count the path string ``a>b>c``. Compose with
    `sessionize.sessionize` to build ``session_col`` first.

    One window (partitioned by the session key — same shuffle the
    sessionizer already produced, so back-to-back the exchange is
    reused) + one map-side-combined count. The output is the path
    distribution, bounded by the distinct step-type ** depth — tiny.

    NULL steps are dropped BEFORE the window (in both this operator
    and the SQL twin): ``concat_ws`` would silently skip a NULL in the
    middle of a window (shortening ``a>NULL>c`` to ``a>c``) while
    SQL's ``||`` would NULL the whole path — filtering first gives one
    well-defined semantics (paths over the non-NULL step sequence) in
    both engines.
    """
    if depth < 2:
        raise ValueError("depth must be >= 2")
    order_cols = order_cols or []
    events = events.where(F.col(step_col).isNotNull())
    w = Window.partitionBy(key, session_col).orderBy(ts_us, *order_cols)
    steps = [F.col(step_col)] + [
        F.lead(step_col, i).over(w) for i in range(1, depth)
    ]
    path = F.concat_ws(">", *steps)
    complete = F.lead(step_col, depth - 1).over(w).isNotNull()
    return (
        events.select(path.alias("path"), complete.alias("__c"))
        .where(F.col("__c"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )


def session_path_counts_sql(
    events_sql: str,
    key: str,
    ts_us: str,
    session_col: str,
    step_col: str,
    depth: int = 3,
    order_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`session_path_counts` over a SELECT body
    already carrying ``session_col``. Mirrors the operator's NULL-step
    pre-filter so both engines path over the non-NULL step sequence."""
    if depth < 2:
        raise ValueError("depth must be >= 2")
    order = ", ".join([ts_us] + (order_cols or []))
    over = f"OVER (PARTITION BY {key}, {session_col} ORDER BY {order})"
    parts = [step_col] + [
        f"lead({step_col}, {i}) {over}" for i in range(1, depth)
    ]
    concat = " || '>' || ".join(parts)
    last = f"lead({step_col}, {depth - 1}) {over}"
    return f"""
WITH __s AS (
  SELECT * FROM ({events_sql}) __raw WHERE {step_col} IS NOT NULL
),
__p AS (
  SELECT ({concat}) AS path, ({last}) IS NOT NULL AS __c FROM __s
)
SELECT path, CAST(count(*) AS BIGINT) AS n_paths
FROM __p WHERE __c GROUP BY path
"""


def rfm_segments(
    events: DataFrame,
    key: str,
    ts_us: str,
    value_cents: str,
    n_bins: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    engagement-segmentation rollup: each key's last-activity time,
    event count, and value mass are binned into ``n_bins`` quantile
    buckets with ``ntile`` semantics (SQL-standard even split, so the
    DuckDB twin matches exactly), tie-broken by the key for
    determinism. Output: one row per key with ``(r_bin, f_bin,
    m_bin)``, 1 = lowest.

    Plan: one map-side-combined per-key aggregate, then — instead of
    three global ``ntile`` windows, which each move the WHOLE per-key
    table into a single ``WindowExec`` task (serial and OOM-prone when
    the key is users over a 100 TB event stream) — three distributed
    exact global ranks (:func:`windows.global_row_number`:
    range-repartition + per-partition row_number + broadcast offsets)
    with the ntile bin computed ARITHMETICALLY from (rank, N): with
    q = N div n_bins and r = N mod n_bins, the first r bins take q+1
    rows and the rest q, so

        bin(k) = ceil(k / (q+1))                   if k <= r·(q+1)
               = r + ceil((k - r·(q+1)) / q)        otherwise

    which reproduces ``ntile`` exactly (the DuckDB twin keeps using
    ntile, so the gate proves the identity on real data). Every stage
    is partition-parallel; the only broadcast is P offset rows + one
    total-count row.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    from ..persist import materialize
    from .windows import global_row_number, ntile_from_rank

    per_key = materialize(
        events.groupBy(key).agg(
            F.max(F.col(ts_us)).cast("long").alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col(value_cents).cast("long")).alias("cents"),
        )
    )
    n_tot = per_key.agg(F.count(F.lit(1)).alias("__n"))
    out = per_key
    for metric, bin_name in (
        ("last_us", "r_bin"),
        ("n_events", "f_bin"),
        ("cents", "m_bin"),
    ):
        # asc_nulls_last pins the order DuckDB's ntile uses (ASC
        # defaults to NULLS LAST there, NULLS FIRST here), so nullable
        # metrics — e.g. cents when every value in a group is NULL —
        # bin identically (ADVICE r7).
        ranked = global_row_number(
            per_key.select(key, metric),
            [F.col(metric).asc_nulls_last(), F.col(key).asc_nulls_last()],
            out_col="__k",
        ).crossJoin(F.broadcast(n_tot))
        bins = ranked.select(
            F.col(key).alias("__bk"),
            ntile_from_rank("__k", "__n", n_bins).alias(bin_name),
        )
        # eqNullSafe: groupBy keeps a NULL-key group, and a plain inner
        # join on the key would silently drop it (ADVICE r7) — the
        # DuckDB twin's ntile retains that row.
        out = out.join(bins, out[key].eqNullSafe(bins["__bk"])).drop("__bk")
    return out.select(key, "last_us", "n_events", "cents", "r_bin", "f_bin", "m_bin")


def rfm_segments_sql(
    events_sql: str,
    key: str,
    ts_us: str,
    value_cents: str,
    n_bins: int = 5,
) -> str:
    """DuckDB twin of :func:`rfm_segments`."""
    return f"""
WITH per_key AS (
  SELECT {key}, CAST(max({ts_us}) AS BIGINT) AS last_us,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST({value_cents} AS BIGINT)) AS BIGINT) AS cents
  FROM ({events_sql}) __e GROUP BY {key}
)
SELECT {key}, last_us, n_events, cents,
       CAST(ntile({n_bins}) OVER (ORDER BY last_us ASC, {key} ASC) AS BIGINT)
           AS r_bin,
       CAST(ntile({n_bins}) OVER (ORDER BY n_events ASC, {key} ASC) AS BIGINT)
           AS f_bin,
       CAST(ntile({n_bins}) OVER (ORDER BY cents ASC, {key} ASC) AS BIGINT)
           AS m_bin
FROM per_key
"""


def regular_cadence_users(
    events: DataFrame,
    ts_col,
    min_gaps: int = 4,
    max_distinct_gaps: int = 2,
    order_col: str = "event_id",
) -> DataFrame:
    """Bot-likeness screen on event cadence: flag users whose
    inter-event gaps are TOO regular — humans are bursty, schedulers
    and replay scripts tick (the classic behavioral-data-quality cut
    before events feed any training pipeline). A user is flagged when
    they have at least ``min_gaps`` consecutive-event gaps but at most
    ``max_distinct_gaps`` DISTINCT gap values. Output per flagged
    screened user (>= ``min_gaps`` gaps): ``(user_id, n_events,
    n_gaps, n_distinct_gaps, min_gap, max_gap, flagged)`` — exact
    longs (gaps in epoch-microseconds) plus the boolean verdict, so
    the report doubles as the cadence-distribution audit even when
    nothing trips the rule.

    ``ts_col`` is a Column of epoch-micros (pass ``ts_us(df)``).
    Plan: one ``lag`` window per user ordered by (ts, order_col) — the
    same per-key window contract as sessionize: state bounded by a
    user's events; a pathological hot key can ride the same
    ``route_hot_keys`` guard if needed — then one map-side-combined
    aggregate. No corpus-wide state."""
    w = Window.partitionBy("user_id").orderBy(F.col("__us"), F.col(order_col))
    gaps = (
        events.withColumn("__us", ts_col)
        .withColumn("__gap", F.col("__us") - F.lag("__us").over(w))
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("__gap").cast("long").alias("n_gaps"),
        F.countDistinct("__gap").cast("long").alias("n_distinct_gaps"),
        F.min("__gap").cast("long").alias("min_gap"),
        F.max("__gap").cast("long").alias("max_gap"),
    )
    return agg.where(F.col("n_gaps") >= min_gaps).withColumn(
        "flagged", F.col("n_distinct_gaps") <= max_distinct_gaps
    )


def regular_cadence_users_sql(
    table: str = "events",
    min_gaps: int = 4,
    max_distinct_gaps: int = 2,
) -> str:
    """DuckDB twin of :func:`regular_cadence_users`."""
    return f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS gap
  FROM {table}
),
a AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(gap) AS BIGINT) AS n_gaps,
         CAST(count(DISTINCT gap) AS BIGINT) AS n_distinct_gaps,
         CAST(min(gap) AS BIGINT) AS min_gap,
         CAST(max(gap) AS BIGINT) AS max_gap
  FROM g GROUP BY user_id
)
SELECT *, n_distinct_gaps <= {max_distinct_gaps} AS flagged
FROM a WHERE n_gaps >= {min_gaps}
"""
