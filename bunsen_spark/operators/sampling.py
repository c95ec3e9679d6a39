"""Deterministic sampling / dataset splitting for training pipelines.

Beyond-reference scale extension (SURVEY §7 M7). ``split_assign`` maps
each row to a named split (train/val/test/…) from the md5 hash of its
key — no RNG, no state: the assignment is a pure function of the key,
so it is stable across runs, engines, partitionings and scale factors
(rows keep their split when the corpus grows), and needs zero shuffle.
``deterministic_sample`` keeps a fixed fraction the same way.

This is the horizontally-scalable replacement for ``randomSplit`` /
``sample``, whose outputs depend on partition layout and seed plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..persist import materialize
from .text_analysis import md5int, md5int_sql

#: hash-space size for split bucketing; 10^6 gives ppm-resolution weights
BUCKETS = 1_000_000


def _bucket(key: Column) -> Column:
    return md5int(key.cast("string")) % BUCKETS


def _bucket_sql(key: str) -> str:
    return f"{md5int_sql(f'CAST({key} AS VARCHAR)')} % {BUCKETS}"


def split_assign(
    df: DataFrame, key: str, splits: dict[str, float], col_name: str = "split"
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named fraction.

    ``splits`` maps name → weight (weights must sum to ≤ 1; any
    remainder is assigned null). Assignment is by half-open bucket
    ranges over md5(key) mod 1e6, evaluated in the given order."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    b = _bucket(F.col(key))
    expr = F.lit(None).cast("string")
    hi = 0.0
    chain: list[tuple[str, int, int]] = []
    for name, w in splits.items():
        lo_b = int(round(hi * BUCKETS))
        hi += w
        chain.append((name, lo_b, int(round(hi * BUCKETS))))
    for name, lo_b, hi_b in reversed(chain):
        expr = F.when((b >= lo_b) & (b < hi_b), F.lit(name)).otherwise(expr)
    return df.withColumn(col_name, expr)


def split_assign_sql(
    table: str, key: str, splits: dict[str, float], col_name: str = "split"
) -> str:
    b = _bucket_sql(key)
    hi = 0.0
    cases = []
    for name, w in splits.items():
        lo_b = int(round(hi * BUCKETS))
        hi += w
        cases.append(f"WHEN {b} >= {lo_b} AND {b} < {int(round(hi * BUCKETS))} THEN '{name}'")
    return f"SELECT *, CASE {' '.join(cases)} END AS {col_name} FROM {table}"


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen purely by key hash."""
    return df.where(_bucket(F.col(key)) < int(round(fraction * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[stratum]``
    of each stratum (``default_fraction`` for unlisted strata), chosen
    purely by key hash — the scalable replacement for
    ``sampleBy``'s seeded Bernoulli draw (stable across runs, engines
    and scale; zero shuffle: it is a single codegen'd filter)."""
    b = _bucket(F.col(key))
    cutoff = F.lit(int(round(default_fraction * BUCKETS)))
    for name, frac in fractions.items():
        cutoff = F.when(
            F.col(strata_col) == name, F.lit(int(round(frac * BUCKETS)))
        ).otherwise(cutoff)
    return df.where(b < cutoff)


def stratified_sample_sql(
    table: str,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> str:
    b = _bucket_sql(key)
    cases = " ".join(
        f"WHEN {strata_col} = '{name}' THEN {int(round(frac * BUCKETS))}"
        for name, frac in fractions.items()
    )
    cutoff = f"CASE {cases} ELSE {int(round(default_fraction * BUCKETS))} END"
    return f"SELECT * FROM {table} WHERE {b} < {cutoff}"


def mix_to_proportions(
    df: DataFrame,
    key: str,
    strata_col: str,
    size_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Deterministically down-sample strata so the surviving corpus
    approximates the ``targets`` mixture by ``size_col`` mass (the
    data-mixing step of training pipelines: e.g. rebalance languages
    or sources to target token shares, without upsampling).

    The achievable total is ``T = min_s(size_s / w_s)`` — the largest
    corpus for which every stratum can supply its share from existing
    rows; each stratum keeps ``rate_s = T*w_s/size_s`` of its mass via
    the same md5-bucket filter as :func:`deterministic_sample` (no RNG,
    stable across runs/engines/partitionings). Strata absent from
    ``targets`` are dropped. Plan shape: one tiny per-stratum aggregate
    → broadcast rate table → single codegen'd filter over the corpus;
    the corpus itself is never shuffled."""
    if not targets or any(w <= 0 for w in targets.values()):
        raise ValueError("targets must be a non-empty {stratum: weight>0} dict")
    wexpr = F.lit(None).cast("double")
    for name, w in targets.items():
        wexpr = F.when(F.col(strata_col) == name, F.lit(float(w))).otherwise(wexpr)
    per = (
        df.groupBy(strata_col)
        .agg(F.sum(F.col(size_col).cast("long")).alias("_sz"))
        .withColumn("_w", wexpr)
        .where(F.col("_w").isNotNull())
    )
    t = per.agg(F.min(F.col("_sz") / F.col("_w")).alias("_t"))
    rates = (
        per.crossJoin(F.broadcast(t))
        .select(
            strata_col,
            F.floor(
                F.least(F.lit(1.0), F.col("_t") * F.col("_w") / F.col("_sz"))
                * F.lit(BUCKETS)
            ).cast("long").alias("_cutoff"),
        )
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(_bucket(F.col(key)) < F.col("_cutoff"))
        .drop("_cutoff")
    )


def mix_to_proportions_sql(
    table: str,
    key: str,
    strata_col: str,
    size_col: str,
    targets: dict[str, float],
) -> str:
    """DuckDB twin of :func:`mix_to_proportions` (same floor/bucket
    arithmetic; identical double expression order)."""
    cases = " ".join(
        f"WHEN {strata_col} = '{name}' THEN CAST({float(w)} AS DOUBLE)"
        for name, w in targets.items()
    )
    return f"""
WITH per AS (
  SELECT {strata_col},
         CAST(SUM(CAST({size_col} AS BIGINT)) AS BIGINT) AS _sz,
         CASE {cases} END AS _w
  FROM {table}
  GROUP BY {strata_col}
  HAVING CASE {cases} END IS NOT NULL
), t AS (
  SELECT MIN(_sz / _w) AS _t FROM per
), rates AS (
  SELECT {strata_col},
         CAST(floor(least(CAST(1.0 AS DOUBLE), _t * _w / _sz) * {BUCKETS}) AS BIGINT)
           AS _cutoff
  FROM per, t
)
SELECT d.*
FROM {table} d
JOIN rates r USING ({strata_col})
WHERE {_bucket_sql(f'd.{key}')} < r._cutoff
"""


def temperature_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    size_col: str,
    tau: float = 2.0,
) -> DataFrame:
    """Temperature-flattened stratum rebalancing — the multilingual
    sampling rule of mT5/XLM-class pipelines: target shares
    ∝ (observed share)^(1/τ), so τ=1 keeps the natural mix and larger
    τ flattens toward uniform, boosting low-resource strata *without
    upsampling* (the smallest stratum keeps everything; bigger strata
    are deterministically down-sampled by the same md5-bucket coin as
    :func:`deterministic_sample`).

    No normalization pass is needed: with p_s = (sz_s/N)^(1/τ), the
    kept fraction ``min(1, T·p_s/sz_s)`` where ``T = min_j(sz_j/p_j)``
    is invariant under scaling all p by a constant, so the only
    cross-strata reductions are an exact integer total and an
    order-independent min — no float summation whose order could
    differ across engines. For τ=2 the power is ``sqrt``, which IEEE
    754 requires exactly rounded, so the whole rate computation is
    bit-reproducible in DuckDB (the gate pins τ=2); other τ go through
    ``pow``, whose last-ulp is libm-defined (documented caveat, same
    as the BM25 module's ``ln`` note).

    Plan: tiny per-stratum aggregate → broadcast rate table → one
    codegen'd filter; the corpus is never shuffled."""
    if tau < 1.0:
        raise ValueError("tau must be >= 1 (tau=1 keeps the natural mix)")

    def _pow(x: Column) -> Column:
        return F.sqrt(x) if tau == 2.0 else F.pow(x, F.lit(1.0 / tau))

    per = df.groupBy(strata_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("_sz")
    )
    tot = per.agg(F.sum("_sz").alias("_n"))
    p = per.crossJoin(F.broadcast(tot)).withColumn(
        "_p", _pow(F.col("_sz") / F.col("_n"))
    )
    t = p.agg(F.min(F.col("_sz") / F.col("_p")).alias("_t"))
    rates = p.crossJoin(F.broadcast(t)).select(
        strata_col,
        F.floor(
            F.least(F.lit(1.0), F.col("_t") * F.col("_p") / F.col("_sz"))
            * F.lit(BUCKETS)
        ).cast("long").alias("_cutoff"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(_bucket(F.col(key)) < F.col("_cutoff"))
        .drop("_cutoff")
    )


def temperature_sample_sql(
    table: str, key: str, strata_col: str, size_col: str, tau: float = 2.0
) -> str:
    """DuckDB twin of :func:`temperature_sample` (same expression
    order; τ=2 uses sqrt for exact-rounding parity)."""
    x = "_sz / _n"
    pexpr = f"sqrt({x})" if tau == 2.0 else f"pow({x}, CAST({1.0 / tau!r} AS DOUBLE))"
    return f"""
WITH per AS (
  SELECT {strata_col}, CAST(SUM(CAST({size_col} AS BIGINT)) AS BIGINT) AS _sz
  FROM {table} GROUP BY {strata_col}
), tot AS (
  SELECT CAST(SUM(_sz) AS BIGINT) AS _n FROM per
), p AS (
  SELECT {strata_col}, _sz, {pexpr} AS _p FROM per, tot
), t AS (
  SELECT MIN(_sz / _p) AS _t FROM p
), rates AS (
  SELECT {strata_col},
         CAST(floor(least(CAST(1.0 AS DOUBLE), _t * _p / _sz) * {BUCKETS}) AS BIGINT)
           AS _cutoff
  FROM p, t
)
SELECT d.*
FROM {table} d
JOIN rates r USING ({strata_col})
WHERE {_bucket_sql(f'd.{key}')} < r._cutoff
"""


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, best-first by
    ``(score_col DESC, id_col ASC)`` — the per-domain cap policy of
    web-crawl curation ("no source may contribute more than N
    documents, keep its highest-quality ones"). The deterministic
    tie-break makes the kept set identical across runs and engines.

    One window ``row_number`` per group: the shuffle is on
    ``group_col`` and each group is sorted once. A pathologically hot
    group becomes one large sort task — for crawl-scale skew (one
    domain holding >~10⁷ rows) pre-filter that group with a score
    threshold from `approx_quantiles`, or bound it the way
    `keep_best`'s docstring discusses; for typical per-source caps the
    single window is the right plan."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    w = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def cap_per_group_sql(
    table: str, group_col: str, cap: int, score_col: str, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`cap_per_group`."""
    return f"""
SELECT * EXCLUDE (__rn) FROM (
  SELECT *, row_number() OVER (
      PARTITION BY {group_col} ORDER BY {score_col} DESC, {id_col} ASC
  ) AS __rn
  FROM {table}
)
WHERE __rn <= {cap}
"""


def quantile_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q: float,
    exact: bool = True,
) -> DataFrame:
    """Per-group relative-threshold filter: keep rows whose
    ``score_col`` clears the group's ``q``-quantile — "keep the top
    30% of documents *per language*", the adaptive form of quality
    filtering (a fixed global threshold over- or under-prunes
    strata with different score distributions). Returns the input
    rows unchanged (no helper columns).

    ``exact=True``: one ``cume_dist`` window per group — keep rows
    with ``cume_dist > q``. Ties share a cume_dist, so a boundary
    cohort is kept or dropped atomically (deterministic across
    engines; the division is a single exactly-rounded IEEE op). The
    shuffle is on ``group_col`` and each group is sorted once; like
    :func:`cap_per_group`, a pathologically hot group becomes one
    large sort task.

    ``exact=False``: the 100 TB path — per-group thresholds from one
    map-side-combined ``percentile_approx`` aggregate, broadcast back
    as a join, then a streaming ``score > threshold`` filter. No sort,
    no per-group buffering; the kept fraction is approximate within
    the sketch's rank error (no cross-engine oracle — tested by
    bound in pytest instead)."""
    if not 0.0 <= q < 1.0:
        raise ValueError("q must be in [0, 1)")
    if exact:
        w = Window.partitionBy(group_col).orderBy(F.asc(score_col))
        return (
            df.withColumn("__cd", F.cume_dist().over(w))
            .where(F.col("__cd") > q)
            .drop("__cd")
        )
    thresholds = df.groupBy(group_col).agg(
        F.percentile_approx(score_col, q).alias("__thr")
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .where(F.col(score_col) > F.col("__thr"))
        .drop("__thr")
    )


def quantile_filter_sql(
    table: str, group_col: str, score_col: str, q: float
) -> str:
    """DuckDB twin of :func:`quantile_filter` (exact form): same
    ``cume_dist`` tie semantics (rows preceding or peer / total) and
    the same single-division comparison."""
    return f"""
SELECT * EXCLUDE (__cd) FROM (
  SELECT *, cume_dist() OVER (
      PARTITION BY {group_col} ORDER BY {score_col} ASC
  ) AS __cd
  FROM {table}
)
WHERE __cd > {q}
"""


def weighted_sample(
    df: DataFrame, key: str, weight: Column
) -> DataFrame:
    """Deterministic importance sampling: keep each row with
    probability ``weight`` (a per-row Column in [0, 1] — e.g. a quality
    score, or a per-source temperature), decided by the same md5-bucket
    coin as :func:`deterministic_sample` so the kept set is stable
    across runs, engines, partitionings, and re-ingestions of the same
    keys. The training-data use: quality-weighted downsampling where
    better documents survive with higher probability, without an RNG
    whose seed/ordering would make the corpus irreproducible.

    Zero shuffle — one codegen'd filter; rows with weight ≥ 1 always
    survive, ≤ 0 never do."""
    cutoff = F.floor(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), weight.cast("double")))
        * F.lit(BUCKETS)
    ).cast("long")
    return df.where(_bucket(F.col(key)) < cutoff)


def weighted_sample_sql(table: str, key: str, weight_sql: str) -> str:
    """DuckDB twin of :func:`weighted_sample` (same floor/bucket
    arithmetic and clamp order)."""
    cutoff = (
        f"CAST(floor(greatest(CAST(0.0 AS DOUBLE), "
        f"least(CAST(1.0 AS DOUBLE), CAST({weight_sql} AS DOUBLE))) * {BUCKETS}) AS BIGINT)"
    )
    return f"SELECT * FROM {table} WHERE {_bucket_sql(key)} < {cutoff}"


def budget_select(
    df: DataFrame,
    group_col: str,
    cost_col: str,
    score_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Budget-constrained greedy selection per group — the curation
    endgame: each group (language, source, domain) gets a COST budget
    (tokens, chars, bytes) and keeps its highest-``score_col`` rows
    until the budget is spent. The greedy-by-score rule is the
    standard corpus-assembly policy (exact knapsack is NP-hard and
    pointless at this granularity).

    One rank window per group (score desc, id asc — deterministic
    ties) computing the running cost INCLUSIVE of the current row; a
    row is kept while the cost spent BEFORE it is under budget, so
    the first overflowing row is still taken (budgets are targets,
    not hard ceilings — matching how training-token budgets are
    specified; pass ``budget - max_cost`` for a hard ceiling).
    Per-task state is bounded by group size; groups are independent —
    the same partition-independence contract as `cap_per_group`.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spent_before = F.coalesce(
        F.sum(F.col(cost_col).cast("long")).over(w), F.lit(0)
    )
    return (
        df.withColumn("__spent", spent_before)
        .where(F.col("__spent") < budget)
        .drop("__spent")
    )


def budget_select_sql(
    table_sql: str,
    group_col: str,
    cost_col: str,
    score_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`budget_select`."""
    return f"""
SELECT * EXCLUDE (__spent) FROM (
  SELECT *, COALESCE(sum(CAST({cost_col} AS BIGINT)) OVER (
      PARTITION BY {group_col}
      ORDER BY {score_col} DESC, {id_col} ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  ), 0) AS __spent
  FROM ({table_sql}) __t
) WHERE __spent < {budget}
"""


def coverage_select(
    docs: DataFrame,
    k: int = 5,
    n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Greedy maximum-coverage document selection: ``k`` rounds, each
    picking the document whose word ``n``-gram shingle set adds the
    most NOT-yet-covered shingles — the classic (1-1/e)-approximate
    submodular curation rule ("a small seed set that spans the
    corpus": diverse few-shot pools, eval-set seeding, dedup anchors).
    Output: ``(sel_rank, doc_id, gain)``, ``gain`` = newly covered
    shingles at pick time.

    Per round: one anti-join of the posting table against the covered
    set (both distributed — the covered set is never a driver
    structure), one map-side-combined gain count, one
    ``orderBy().limit(1)`` distributed argmax; only the single winning
    row is collected (Lloyd/BPE-style round coordination). The
    newly-covered delta is disjoint from the covered set by
    construction (it comes from the anti-joined frame), so the union
    needs no distinct. Shingles ride as int64 hashes
    (:func:`text_analysis.hash31` family; ``portable`` pins the
    md5 twin the oracle replays — collisions affect both engines
    identically). Ties break (gain desc, doc_id asc).

    Raises if the corpus is exhausted (every shingle covered) before
    ``k`` picks — choose ``k`` within the corpus's coverage capacity."""
    from .dedup import _shingle_hashes, _with_shingles

    if k < 1:
        raise ValueError("k must be >= 1")
    posts = materialize(
        _with_shingles(docs, n).select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    _shingle_hashes(F.col("shingles"), portable)
                )
            ).alias("tok"),
        )
    )
    spark = docs.sparkSession
    covered: DataFrame | None = None
    winners: list[tuple[int, int, int]] = []
    for rank in range(1, k + 1):
        uncov = (
            posts
            if covered is None
            else posts.join(covered, "tok", "left_anti")
        )
        top = (
            uncov.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("doc_id").asc())
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                f"corpus covered after {rank - 1} picks; k={k} too large"
            )
        [r] = top
        winners.append((rank, r.doc_id, r.gain))
        newly = uncov.where(F.col("doc_id") == r.doc_id).select("tok")
        # LAZY checkpoint: the next round's argmax is the first (and
        # only) reader, so the covered-set union materializes inside
        # that job instead of costing an eager job per pick; the
        # winner-doc filter pushes below the anti-join, so the
        # recompute inside the checkpoint touches one doc's postings
        covered = materialize(
            newly if covered is None else covered.union(newly)
        )
    from ..localrel import values_df

    # LocalRelation result frame (r14): collect()s of it are
    # driver-only instead of a 32-Python-task pickle scan per read
    return values_df(spark, winners, "sel_rank long, doc_id long, gain long")


def coverage_select_sql(table: str = "documents", k: int = 5, n: int = 3) -> str:
    """DuckDB twin of :func:`coverage_select` (portable hash family):
    the greedy cycle unrolled as a CTE chain — per round a NOT EXISTS
    anti-join gain count, a top-1, and a covered-set union."""
    from .dedup import MERSENNE31, shingles_sql

    shingle_hash = f"{md5int_sql('s')} % {MERSENNE31}"
    parts = [
        f"""g AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform({shingles_sql(n)}, s -> {shingle_hash}))) AS tok
  FROM {table}
)"""
    ]
    for r in range(1, k + 1):
        uncov = (
            "g"
            if r == 1
            else (
                f"(SELECT g.doc_id, g.tok FROM g WHERE NOT EXISTS"
                f" (SELECT 1 FROM c{r - 1} WHERE c{r - 1}.tok = g.tok)) __u{r}"
            )
        )
        parts.append(
            f"""r{r} AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
  FROM {uncov} GROUP BY doc_id
  ORDER BY gain DESC, doc_id ASC LIMIT 1
)"""
        )
        prev = f"SELECT tok FROM c{r - 1} UNION " if r > 1 else ""
        parts.append(
            f"""c{r} AS (
  {prev}SELECT g.tok FROM g JOIN r{r} USING (doc_id)
)"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS sel_rank, doc_id, gain FROM r{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + unions


def epoch_positions(
    df: DataFrame, id_col: str, seed: str, out_col: str = "position"
) -> DataFrame:
    """Deterministic seeded epoch shuffle: assign every row a dense
    1..N training position by the portable hash order
    ``(md5(seed || id), id)`` — the reproducible global permutation a
    training run needs per epoch (same seed ⇒ same order on any
    cluster, any partitioning; new seed ⇒ fresh permutation).
    Positions come from :func:`windows.global_row_number` (range
    repartition + broadcast offsets), so there is NO single-partition
    sort — the permutation is computed scale-out, unlike a naive
    ``orderBy(rand(seed))`` + zipWithIndex."""
    from .text_analysis import md5int
    from .windows import global_row_number

    h = md5int(F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string")))
    tagged = df.withColumn("__h", h)
    return (
        global_row_number(
            tagged, [F.col("__h").asc(), F.col(id_col).asc()], out_col
        )
        .drop("__h")
    )


def epoch_positions_sql(
    table: str, id_col: str, seed: str, cols: str, out_col: str = "position"
) -> str:
    """DuckDB twin via the engine-native global window over the same
    portable hash order."""
    from .text_analysis import md5int_sql

    h = md5int_sql(f"'{seed}' || '|' || CAST({id_col} AS VARCHAR)")
    return f"""
SELECT {cols},
       CAST(row_number() OVER (ORDER BY {h}, {id_col}) AS BIGINT) AS {out_col}
FROM {table}
"""


def interleave_positions(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights: dict[str, int],
    out_col: str = "position",
) -> DataFrame:
    """Deterministic mixture INTERLEAVING: a global 1..N reading order
    in which each group appears throughout the epoch in proportion to
    its integer weight (the data-mixing schedule shape — "2 parts web,
    1 part code, evenly interleaved", not block-concatenated). The
    i-th document of group g (1-based, seeded-hash order within the
    group) gets schedule key ``i / w_g``; the global order of keys
    interleaves groups at their target rates (a group with twice the
    weight appears twice as often in any prefix, ±1). Both the
    within-group ranks and the final order are
    :func:`windows.global_row_number` — fully distributed, no
    single-task group windows even when one group dominates the corpus.

    Keys are compared as ``i * L div w_g`` with ``L = lcm(weights)`` —
    pure integers, so cross-engine order is exact; ties (groups hitting
    the same schedule slot) break by (group, id). Groups absent from
    ``weights`` are excluded (curation chooses the mixture)."""
    import math

    from .text_analysis import md5int
    from .windows import global_row_number

    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    lcm = math.lcm(*weights.values())
    h = md5int(F.col(id_col).cast("string"))
    kept = df.where(F.col(group_col).isin(*weights)).withColumn("__h", h)
    # Within-group ranks WITHOUT per-group jobs: ONE global ranking
    # over (group, hash, id) minus broadcast per-group offsets (the
    # cumulative sizes of earlier groups in the same order) — two
    # bounded ranking passes total, regardless of how many groups the
    # mixture has or how dominant one group is.
    granked = global_row_number(
        kept,
        [F.col(group_col).asc(), F.col("__h").asc(), F.col(id_col).asc()],
        "__gr",
    )
    sizes = kept.groupBy(group_col).agg(F.count(F.lit(1)).alias("__sz"))
    earlier = sizes.select(
        F.col(group_col).alias("__g2"), F.col("__sz").alias("__sz2")
    )
    offsets = (
        sizes.join(earlier, F.col("__g2") < F.col(group_col), "left")
        .groupBy(group_col)
        .agg(F.coalesce(F.sum("__sz2"), F.lit(0)).alias("__goff"))
    )
    # Build the weights table with the caller's ACTUAL group-column
    # type (ADVICE r7: a hardcoded `string` schema made non-string
    # groups — e.g. int source codes — fail the broadcast join or
    # mismatch via implicit casts).
    from ..localrel import values_df

    gtype = df.schema[group_col].dataType
    wtab = values_df(
        df.sparkSession,
        [(str(g), int(w)) for g, w in sorted(weights.items())],
        f"{group_col} string, __wt long",
    ).withColumn(group_col, F.col(group_col).cast(gtype))
    keyed = (
        granked.join(F.broadcast(offsets), group_col)
        .join(F.broadcast(wtab), group_col)
        .withColumn("__i", F.col("__gr") - F.col("__goff"))
        .withColumn("__key", F.expr(f"(__i * {lcm}) div __wt"))
    )
    return (
        global_row_number(
            keyed,
            [F.col("__key").asc(), F.col(group_col).asc(), F.col(id_col).asc()],
            out_col,
        )
        .drop("__key", "__i", "__h", "__gr", "__goff", "__wt")
    )


def interleave_positions_sql(
    table: str,
    id_col: str,
    group_col: str,
    weights: dict[str, int],
    cols: str,
    out_col: str = "position",
) -> str:
    """DuckDB twin via engine-native windows over the same integer
    schedule keys."""
    import math

    from .text_analysis import md5int_sql

    lcm = math.lcm(*weights.values())
    h = md5int_sql(f"CAST({id_col} AS VARCHAR)")
    groups = ", ".join(f"('{g}', {w})" for g, w in sorted(weights.items()))
    return f"""
WITH __w(grp, w) AS (VALUES {groups}),
__r AS (
  SELECT t.*, w.w,
         row_number() OVER (
             PARTITION BY {group_col} ORDER BY {h}, {id_col}
         ) AS __i
  FROM {table} t JOIN __w w ON t.{group_col} = w.grp
)
SELECT {cols},
       CAST(row_number() OVER (
           ORDER BY (__i * {lcm}) // w, {group_col}, {id_col}
       ) AS BIGINT) AS {out_col}
FROM __r
"""


def waterfill_allocation(
    counts: DataFrame,
    group_col: str,
    avail_col: str,
    budget: int,
    out_col: str = "allocated",
) -> DataFrame:
    """Water-filling (max-min fair) allocation of an integer ``budget``
    across groups with equal target shares, each group capped at its
    own availability — the token-budget split step of corpus mixing
    ("give every language/source an equal slice of the training budget,
    but never more than it has"). Small groups absorb their whole
    availability; the leftover re-levels among the rest, exactly:

    1. sort groups by (avail asc, group asc); the capped set is a
       PREFIX of that order (standard water-filling property);
    2. group i (1-based rank ``rn``, inclusive running availability
       ``cum``) caps iff every remaining group could still get at least
       ``avail_i``: ``avail_i * (n - rn + 1) <= budget - (cum -
       avail_i)``; the first rank violating it starts the uncapped set
       (prefix-min via one tiny ``min(rn)`` aggregate — robust even if
       the monotonicity assumption were broken by ties);
    3. the uncapped groups share the remainder: ``base = R div u``
       each, the first ``R mod u`` by group name getting +1 — all
       integer arithmetic, allocations sum EXACTLY to
       ``min(budget, total availability)``.

    Scale shape: runs on the already-aggregated ``(group, avail)``
    table. Rank and running sum come from ONE range-repartition pass
    (:func:`~bunsen_spark.operators.windows.global_rank_and_cumsum`),
    so there is no single-partition window even at millions of groups
    (domain-level corpus mixes); the three scalar aggregates (n, first
    violation, capped mass) broadcast as 1-row cross joins. Returns
    ``(group, avail, allocated)`` with ``avail``/``allocated`` as
    longs. ``avail_col`` must be non-negative."""
    from .windows import global_rank_and_cumsum, global_row_number

    if budget < 0:
        raise ValueError("budget must be non-negative")
    g, a = F.col(group_col), F.col(avail_col).cast("long")
    base = counts.select(g.alias("__g"), a.alias("__a"))
    ranked = global_rank_and_cumsum(
        base,
        [F.col("__a").asc(), F.col("__g").asc()],
        "__a",
        rank_col="__rn",
        cum_col="__cum",
    )
    tot = F.broadcast(ranked.agg(F.count(F.lit(1)).alias("__n")))
    flagged = ranked.crossJoin(tot).withColumn(
        "__ok",
        F.col("__a") * (F.col("__n") - F.col("__rn") + F.lit(1))
        <= F.lit(budget) - (F.col("__cum") - F.col("__a")),
    )
    first_viol = F.broadcast(
        flagged.where(~F.col("__ok")).agg(F.min("__rn").alias("__fv"))
    )
    capped = flagged.crossJoin(first_viol).withColumn(
        "__capped",
        F.col("__fv").isNull() | (F.col("__rn") < F.col("__fv")),
    )
    cap_mass = F.broadcast(
        capped.agg(
            F.coalesce(
                F.sum(F.when(F.col("__capped"), 1).otherwise(0)), F.lit(0)
            ).alias("__m"),
            F.coalesce(
                F.sum(F.when(F.col("__capped"), F.col("__a"))), F.lit(0)
            ).alias("__scap"),
        )
    )
    unc_ranked = global_row_number(
        capped.where(~F.col("__capped")).select("__g"),
        [F.col("__g").asc()],
        out_col="__r2",
    )
    # greatest(u, 1): u == 0 only when NO uncapped row exists, so the
    # expression is never consumed then — the guard just keeps any
    # speculative evaluation away from a division by zero.
    joined = (
        capped.join(unc_ranked, "__g", "left")
        .crossJoin(cap_mass)
        .withColumn("__u", F.greatest(F.col("__n") - F.col("__m"), F.lit(1)))
        .withColumn("__r", F.lit(budget) - F.col("__scap"))
    )
    alloc = F.when(F.col("__capped"), F.col("__a")).otherwise(
        F.expr("__r div __u")
        + F.when(F.col("__r2") <= F.expr("__r % __u"), 1).otherwise(0)
    )
    return joined.select(
        F.col("__g").alias(group_col),
        F.col("__a").alias("avail"),
        alloc.cast("long").alias(out_col),
    )


def waterfill_allocation_sql(
    counts_sql: str,
    group_col: str,
    avail_col: str,
    budget_sql: str,
    out_col: str = "allocated",
) -> str:
    """DuckDB twin of :func:`waterfill_allocation` (engine-native
    global windows instead of the distributed rank/cumsum pass).
    ``budget_sql`` is a scalar SQL expression so gates can derive the
    budget from the data itself (e.g. 70% of total availability)."""
    g, a = group_col, avail_col
    return f"""
WITH c0 AS (SELECT {g} AS grp, CAST({a} AS BIGINT) AS avail FROM ({counts_sql}) __c),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST({budget_sql} AS BIGINT) AS b FROM c0),
ord AS (
  SELECT grp, avail,
         CAST(row_number() OVER (ORDER BY avail ASC, grp ASC) AS BIGINT) AS rn,
         CAST(sum(avail) OVER (ORDER BY avail ASC, grp ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM c0),
flg AS (SELECT o.*, t.n, t.b,
               (o.avail * (t.n - o.rn + 1) <= t.b - (o.cum - o.avail)) AS ok
        FROM ord o CROSS JOIN tot t),
fv AS (SELECT min(rn) AS first_viol FROM flg WHERE NOT ok),
cap AS (SELECT f.*, (v.first_viol IS NULL OR f.rn < v.first_viol) AS capped
        FROM flg f CROSS JOIN fv v),
agg AS (SELECT CAST(coalesce(sum(CASE WHEN capped THEN 1 ELSE 0 END), 0) AS BIGINT) AS m,
               CAST(coalesce(sum(CASE WHEN capped THEN avail END), 0) AS BIGINT) AS s_cap
        FROM cap),
unc AS (SELECT grp, CAST(row_number() OVER (ORDER BY grp ASC) AS BIGINT) AS r2
        FROM cap WHERE NOT capped)
SELECT c.grp AS {g}, c.avail,
       CAST(CASE WHEN c.capped THEN c.avail
            ELSE (c.b - x.s_cap) // greatest(c.n - x.m, 1)
                 + (CASE WHEN u.r2 <= (c.b - x.s_cap) % greatest(c.n - x.m, 1)
                    THEN 1 ELSE 0 END)
       END AS BIGINT) AS {out_col}
FROM cap c CROSS JOIN agg x LEFT JOIN unc u ON c.grp = u.grp
"""


def _split_case_sql(key_expr: str, splits: dict[str, float]) -> str:
    """CASE expression assigning ``key_expr``'s md5 bucket to a named
    split — the expression form of :func:`split_assign_sql`."""
    b = f"{md5int_sql(f'CAST({key_expr} AS VARCHAR)')} % {BUCKETS}"
    hi = 0.0
    cases = []
    for name, w in splits.items():
        lo_b = int(round(hi * BUCKETS))
        hi += w
        cases.append(
            f"WHEN {b} >= {lo_b} AND {b} < {int(round(hi * BUCKETS))}"
            f" THEN '{name}'"
        )
    return f"CASE {' '.join(cases)} END"


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe train/val/test split: hash the near-dup CLUSTER
    representative instead of the document, so every cluster lands in
    exactly one split — the dedup-aware split discipline that keeps
    eval sets honest (a near-duplicate of a training document in the
    test split is leakage, the failure mode Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better"
    documents). Reports, per split:

        ``(split, n_docs, n_clusters, n_moved)``

    ``n_moved`` = documents whose naive PER-DOCUMENT hash split would
    have differed — the leakage exposure the cluster-safe rule just
    closed. By construction (split = f(cluster rep)) no cluster spans
    splits.

    Scale shape: connected components come from the bounded-round
    fixpoint (:func:`~bunsen_spark.operators.dedup.near_dup_clusters`);
    docs outside any pair are their own singleton reps via one left
    join; both split assignments are codegen'd hash CASEs; the final
    aggregate is map-side-combined on the handful of split names."""
    from .dedup import near_dup_clusters

    clusters = near_dup_clusters(pairs).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    rep = F.coalesce(F.col("cluster_id"), F.col(id_col))
    tagged = (
        docs.select(id_col)
        .join(clusters, id_col, "left")
        .withColumn("__rep", rep)
    )
    safe = split_assign(tagged, "__rep", splits, col_name="split")
    both = split_assign(safe, id_col, splits, col_name="__naive")
    return (
        both.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("__rep").cast("long").alias("n_clusters"),
            F.sum(
                F.when(F.col("__naive") != F.col("split"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_moved"),
        )
    )


def cluster_safe_split_sql(
    pairs_sql: str,
    splits: dict[str, float],
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`cluster_safe_split` over the WITH
    RECURSIVE reachability components."""
    from .dedup import near_dup_clusters_sql

    cl = near_dup_clusters_sql(pairs_sql)
    safe = _split_case_sql("rep", splits)
    naive = _split_case_sql(id_col, splits)
    return f"""
WITH cl AS ({cl}),
j AS (
  SELECT d.{id_col}, coalesce(cl.cluster_id, d.{id_col}) AS rep
  FROM {table} d LEFT JOIN cl ON cl.doc_id = d.{id_col}
),
a AS (SELECT {id_col}, rep, {safe} AS split, {naive} AS naive FROM j)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT rep) AS BIGINT) AS n_clusters,
       CAST(sum(CASE WHEN naive <> split THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved
FROM a GROUP BY split
"""
