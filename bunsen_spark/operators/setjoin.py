"""Prefix-filtered EXACT Jaccard set-similarity self-join — the
lossless counterpart of the LSH/banding family in `operators/dedup.py`.

Beyond-reference scale extension (SURVEY §7 M7 family). MinHash-LSH
(`dedup.py:minhash_lsh_pairs`) is probabilistic: pairs can be missed.
When the pipeline needs EVERY pair above a Jaccard threshold (legal
dedup audits, recall measurement for the LSH path), the classic
scalable exact algorithm is prefix filtering (PPJoin's core): order
each record's token set by ascending global token frequency and index
only its first ``|s| - ceil(t*|s|) + 1`` tokens. Two sets with Jaccard
``>= t`` MUST share at least one prefix token (pigeonhole on the
required overlap), so joining on prefix tokens alone is lossless —
and prefixes are built from the RAREST tokens, so the candidate join
avoids the stop-token blowup that forces the inverted-index path
(`dedup.py:jaccard_pairs`) to prune frequent shingles lossily.

Plan shape (pure Catalyst):

1. token explode + global document-frequency aggregate (map-side
   partial agg; shuffle bounded by distinct tokens per partition).
2. per-doc frequency ordering via one window on ``doc_id`` (unique
   key, no skew) — rank tokens by ``(df ASC, tok ASC)``; keep ranks
   ``<= prefix_len``.
3. candidate generation: self-join of the PREFIX index on the token,
   with the size filter ``t*|a| <= |b| <= |a|/t`` applied inside the
   join, then PPJoin's POSITIONAL filter over the grouped matches —
   a sound intersection upper bound from the last shared prefix
   token's positions that prunes the candidate set by ~2 orders of
   magnitude before verification (see inline proof sketch). Join key
   frequency is bounded by construction — a token this common would
   not be in prefixes — so no salting is needed.
4. exact verification: join candidates back to the full token sets and
   count the intersection; keep pairs with ``den*inter >= num*union``
   where ``t = num/den`` exactly (integer cross-multiplication — no
   float threshold anywhere, so the DuckDB brute-force twin matches
   bit-for-bit).

At 100 TB: step 1 is the only corpus-wide aggregate; steps 3-4 shuffle
token/candidate rows whose volume prefix filtering keeps near-linear
in the matching pairs. Tokens are joined as strings (short words), not
hashes: a hash collision would merge two tokens and silently change
EXACT results, which this operator exists to guarantee.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..persist import materialize
from .text_analysis import WORDS_SQL, words_col


def _threshold_fraction(threshold: float) -> Fraction:
    frac = Fraction(threshold).limit_denominator(1000)
    if not 0 < frac <= 1:
        raise ValueError("threshold must be in (0, 1]")
    return frac


def _lossless_fraction(threshold: float) -> Fraction:
    """A rational ``num/den <= threshold`` with a small denominator —
    used when the prefix/size filters must be LOSSLESS upper bounds for
    a final float-threshold comparison that happens elsewhere (the
    dedup-family operators pin their oracle parity on the exact IEEE
    ``inter/union >= threshold`` double test, so every pre-filter here
    may only relax, never tighten). Small ``den`` keeps the integer
    cross-multiplications (``den * sz``) far from long overflow even at
    per-doc set sizes in the billions."""
    frac = Fraction(threshold).limit_denominator(10**6)
    if frac > Fraction(threshold):
        frac -= Fraction(1, 10**6)
    if frac <= 0:
        raise ValueError("threshold must be positive")
    return frac


def ranked_tokens(toks: DataFrame, has_df: bool = False) -> tuple[DataFrame, DataFrame]:
    """Shared prefix-filter substrate: rank each document's (distinct)
    tokens under the global ``(df ASC, tok ASC)`` total order — rarest
    first — so prefixes are built from the least-frequent tokens.
    ``toks`` is ``(doc_id, tok)`` with per-doc distinct tokens (any
    orderable token type: strings or shingle hashes); pass
    ``has_df=True`` when it already carries a ``df`` document-frequency
    column (the dedup family's stop-token prune computes it anyway) to
    skip the corpus-wide df aggregate+join here. Returns ``(ranked,
    sizes)`` where ranked is ``(tok, doc_id, rnk, sz)`` and sizes is
    ``(doc_id, sz)``. The ranking window partitions by ``doc_id``
    (unique key, no skew); the df aggregate is the only corpus-wide
    shuffle and is map-side combinable."""
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if not has_df:
        df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        toks = toks.join(df, "tok")
    ranked = (
        toks.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("df").asc(), F.col("tok").asc()
                )
            ),
        )
        .join(sizes, "doc_id")
    )
    return ranked, sizes


def _prefix_rows(ranked: DataFrame, num: int, den: int) -> DataFrame:
    """The PPJoin prefix relation: each doc's first
    ``sz - ceil(t*sz) + 1`` rarest tokens (integer ceil on ``t =
    num/den``). Shared by both candidate generators and the
    saturation probe so the three always agree on what "prefix"
    means. Carries ``df`` so the asymmetric probe can bound the
    prefix×full join without touching the full relation. Callers that
    consume the prefix twice (probe + candidates) should
    ``materialize`` it once and pass it through the ``prefix=``
    parameters — the ranking window then runs a single time."""
    prefix_len = (
        F.col("sz") - ((F.col("sz") * num + (den - 1)) / den).cast("long") + 1
    )
    return ranked.where(F.col("rnk") <= prefix_len).select(
        "doc_id", "tok", "sz", "rnk", "df"
    )


def prefix_candidate_volume(
    ranked: DataFrame,
    num: int,
    den: int,
    asymmetric: bool = False,
    prefix: DataFrame | None = None,
) -> int:
    """Upper bound on the candidate-match rows the prefix join would
    produce, computed from TOKEN HISTOGRAMS alone — Θ(distinct tokens),
    never a pair row. This is the cheap df-distribution probe that
    keeps the exact set-join family out of the silent-quadratic regime:
    prefix filtering is only subquadratic when the rarest-prefix
    document frequencies stay O(1), which real Zipf corpora deliver but
    a SATURATED token space (tiny vocabulary, e.g. short n over a
    boilerplate corpus) does not — there every prefix token is shared
    by a constant fraction of the corpus and the join explodes as
    Σ df² ~ n² (PERF.md round-8: the 61-word sf10 fixture put the n=3
    join at ~1e9 candidates, >1500 s).

    ``asymmetric=False`` bounds the Jaccard prefix×prefix self-join
    (Σ c·(c-1)/2 over per-token prefix counts c); ``asymmetric=True``
    bounds the containment prefix×full join (Σ (df−1) over the prefix
    rows — each prefix row meets every OTHER posting of its token, and
    the per-token document frequency already rides on the row, so no
    second full-relation aggregate runs). Both ignore the size and
    positional filters, so they only over-estimate — a volume under
    budget is PROOF the join is safe. Sums run in decimal(38,0): c²
    terms overflow int64 exactly in the regimes the probe exists to
    catch.

    Pass a pre-``materialize``d ``prefix`` (from :func:`_prefix_rows`)
    when the caller will also feed it to a candidate generator — the
    ranking window then executes once for both.

    One 1-row collect — driver coordination, documented; the aggregate
    itself is map-side combinable and vocabulary-sized."""
    if prefix is None:
        prefix = _prefix_rows(ranked, num, den)
    if asymmetric:
        vol = prefix.select(
            F.sum((F.col("df") - 1).cast("decimal(38,0)")).alias("v")
        )
    else:
        pc = prefix.groupBy("tok").agg(F.count(F.lit(1)).alias("p"))
        vol = pc.select(
            F.sum(
                F.col("p").cast("decimal(38,0)") * (F.col("p") - 1) / 2
            ).cast("decimal(38,0)").alias("v")
        )
    row = vol.collect()[0][0]
    return int(row) if row is not None else 0


def jaccard_prefix_candidates(
    ranked: DataFrame, num: int, den: int, prefix: DataFrame | None = None
) -> DataFrame:
    """PPJoin candidate pairs ``(doc_a, doc_b)`` with ``doc_a < doc_b``
    whose Jaccard CAN reach ``num/den`` — lossless by the prefix-filter
    theorem (pigeonhole on the required overlap), tightened by the size
    filter inside the join and the positional filter after it. See the
    module docstring for the plan shape and proof sketches. Pass the
    saturation guard's materialized ``prefix`` to share one ranking
    window with the probe."""
    if prefix is None:
        prefix = _prefix_rows(ranked, num, den)
    a, b = prefix.alias("a"), prefix.alias("b")
    matches = a.join(
        b,
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        # size filter: t*|a| <= |b| and |b| <= |a|/t, integer form
        & (F.col("b.sz") * den >= F.col("a.sz") * num)
        & (F.col("b.sz") * num <= F.col("a.sz") * den),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.sz").alias("sza"),
        F.col("b.sz").alias("szb"),
        F.col("a.rnk").alias("pa"),
        F.col("b.rnk").alias("pb"),
    )
    # POSITIONAL filter (PPJoin's second filter — the one that makes
    # prefix filtering scale): for a pair, let T be its last shared
    # prefix token. Every shared token outside both prefixes sorts
    # AFTER T (the (df, tok) order is total and identical in both
    # docs), so inter <= cnt + min(sza - max_pa, szb - max_pb). Pairs
    # whose bound cannot reach the threshold never enter verification
    # — measured 309,803 -> ~thousands of candidates at sf0.1. The
    # anchor argument needs REAL token equality in the operator's
    # token space: strings for the lossless word join, shingle hashes
    # for the hash-defined dedup family (there the hash IS the token).
    bound = F.col("cnt") + F.least(
        F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")
    )
    return (
        matches.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("pa").alias("pa"),
            F.max("pb").alias("pb"),
            F.min("sza").alias("sza"),
            F.min("szb").alias("szb"),
        )
        .where(bound * (den + num) >= num * (F.col("sza") + F.col("szb")))
        # the set sizes ride along so verification never has to join
        # them back from the corpus-wide sizes relation
        .select("doc_a", "doc_b", "sza", "szb")
    )


def containment_prefix_candidates(
    ranked: DataFrame, num: int, den: int, prefix: DataFrame | None = None
) -> DataFrame:
    """Asymmetric prefix filter for containment C(A→B) = |A∩B| / |A|:
    a directed pair with C >= t needs overlap o = ceil(t·|A|), which
    depends only on the CONTAINED side — so index the prefix of each
    doc as a contained-candidate (length |A| - o + 1) and probe it
    against the FULL token lists (the container side has no set-local
    overlap bound: a tiny doc can be contained in any superset). Every
    qualifying directed pair must share a token between prefix(A) and
    full(B); emitting the unordered pair and verifying BOTH directions
    afterwards keeps the filter lossless. Candidate volume per token is
    prefix_df × df — rare-token-biased — instead of the df² of a full
    posting self-join. Size filter inside the join: containment needs
    inter <= min(|A|,|B|) >= t·|A|, i.e. |B|·den >= |A|·num."""
    if prefix is None:
        prefix = _prefix_rows(ranked, num, den)
    full = ranked.select("doc_id", "tok", "sz", "rnk")
    a, b = prefix.alias("a"), full.alias("b")
    matches = a.join(
        b,
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.doc_id") != F.col("b.doc_id"))
        & (F.col("b.sz") * den >= F.col("a.sz") * num),
    ).select(
        F.col("a.doc_id").alias("da"),
        F.col("b.doc_id").alias("db"),
        F.col("a.sz").alias("sza"),
        F.col("b.sz").alias("szb"),
        F.col("a.rnk").alias("pa"),
        F.col("b.rnk").alias("pb"),
    )
    # POSITIONAL filter for the DIRECTED hypothesis A contained-in B
    # (the same PPJoin bound the jaccard candidates use): the (df, tok)
    # order is total and identical in both docs, so every shared token
    # beyond this pair's last matched positions sorts after them and
    # inter <= cnt + min(sza - max_pa, szb - max_pb). A directed pair
    # with C(A→B) >= num/den needs inter >= ceil(num·sza/den); rows
    # whose bound cannot reach it are dropped BEFORE the exact-
    # intersection explode. Lossless per direction: each direction's
    # hypothesis is generated from its own contained-side prefix, and
    # the bound only ever over-estimates inter. On the saturated-vocab
    # soak fixture this is the difference between the verify stage
    # seeing every pair that shares one common token and seeing only
    # early-prefix agreements (PERF.md round-8).
    bound = F.col("cnt") + F.least(
        F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")
    )
    return (
        matches.groupBy("da", "db")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("pa").alias("pa"),
            F.max("pb").alias("pb"),
            F.min("sza").alias("sza"),
            F.min("szb").alias("szb"),
        )
        .where(bound * den >= F.col("sza") * num)
        # canonicalize the unordered pair and keep the sizes aligned to
        # (doc_a, doc_b); sizes are functionally determined by the ids,
        # so the wider distinct dedups exactly the same pairs
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            F.when(F.col("da") < F.col("db"), F.col("sza"))
            .otherwise(F.col("szb"))
            .alias("sza"),
            F.when(F.col("da") < F.col("db"), F.col("szb"))
            .otherwise(F.col("sza"))
            .alias("szb"),
        )
        .distinct()
    )


def exact_intersections(
    toks: DataFrame,
    cands: DataFrame,
    sizes: DataFrame | None = None,
    candidate_volume: int | None = None,
) -> DataFrame:
    """Verification stage shared by the prefix-filtered operators:
    exact intersection counts for the candidate pairs. Returns
    ``(doc_a, doc_b, inter, sza, szb)``.

    ``cands`` carries ``sza``/``szb`` (both generators emit them), so
    the two sizes joins of the old shape are gone; ``sizes`` is only
    consulted for legacy candidate frames without size columns.

    ``candidate_volume`` is accepted for call-site compatibility but no
    longer forces a broadcast: the r13 probe-gated candidate-broadcast
    hint measured SLOWER or flat in every clean alternating A/B
    (r13 close containment 5.97→7.29; r14 `plans/r14/ab_setjoin_r14.json`
    — the no-broadcast tree beats the hinted tree on dedup_jaccard and
    dedup_containment in BOTH passes). Join strategy is left to AQE,
    which broadcast-converts a small candidate side from its REAL
    runtime size instead of a pre-join row-bound estimate — the same
    conclusion the r13 A/B reached for the LSH verify joins.

    r14 session 2 (guide §2.3/§2.4), NUMERIC tokens only: intersections
    are computed with ONE native ``size(array_intersect(...))`` per
    candidate pair over per-doc token ARRAYS (rebuilt from the same —
    possibly df-pruned — ``toks`` relation, so the pruned-measure
    semantics are untouched). The former shape exploded every candidate
    against doc_a's full token list and shuffled |pairs| × |set| skinny
    rows through an equi-join + groupBy; the array form attaches two
    array payloads by doc-id joins (AQE broadcast-converts the
    doc-count-sized array table when it fits; the two sides reuse one
    exchange) and deletes the per-pair aggregation exchange outright.
    ``array_intersect`` over distinct-element arrays returns exactly
    |A∩B| — the same count(*) the equi-join produced. Measured
    (profile_gate sf0.1 task time): int64-hash tokens 7.6→4.0 s
    (jaccard) / 4.8→3.3 s (containment); STRING tokens got SLOWER
    (prefix_jaccard 11.2→12.9 s — array_intersect's per-pair hash-set
    over ~17-char shingle strings costs more than the skinny
    equi-join), so string-token callers keep the explode form."""
    from pyspark.sql.types import NumericType

    if isinstance(toks.schema["tok"].dataType, NumericType):
        arrs = toks.groupBy("doc_id").agg(F.collect_list("tok").alias("__arr"))
        sa = arrs.select(F.col("doc_id").alias("doc_a"), F.col("__arr").alias("__sa"))
        sb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("__arr").alias("__sb"))
        inter_col = F.size(F.array_intersect("__sa", "__sb")).cast("long").alias("inter")
        joined = cands.join(sa, "doc_a").join(sb, "doc_b")
        if "sza" in cands.columns:
            return joined.select("doc_a", "doc_b", inter_col, "sza", "szb")
        szs_a = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza")
        szs_b = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb")
        return (
            joined.select("doc_a", "doc_b", inter_col)
            .join(szs_a, "doc_a")
            .join(szs_b, "doc_b")
        )
    ta = toks.withColumnRenamed("doc_id", "doc_a")
    tb = toks.withColumnRenamed("doc_id", "doc_b")
    carries = "sza" in cands.columns
    first = cands.join(ta, "doc_a")
    agg = [F.count(F.lit(1)).alias("inter")]
    if carries:
        agg += [F.min("sza").alias("sza"), F.min("szb").alias("szb")]
    inter = (
        first.join(tb, ["doc_b", "tok"])  # equi-join: only shared tokens survive
        .groupBy("doc_a", "doc_b")
        .agg(*agg)
    )
    if carries:
        return inter.select("doc_a", "doc_b", "inter", "sza", "szb")
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb")
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def prefix_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 0,
    candidate_budget: int | None = None,
) -> DataFrame:
    """ALL pairs of documents whose set-Jaccard similarity is
    ``>= threshold`` — exact, no probabilistic misses. The set is the
    distinct words (``shingle_n=0``) or the distinct word n-gram
    shingles (``shingle_n>=2``, the same sets the MinHash family
    banding approximates). Returns ``(doc_a, doc_b, inter, uni)``
    with ``doc_a < doc_b`` and exact intersection / union sizes.

    Guarded against the saturated-token regime: before the candidate
    join runs, a histogram probe (:func:`prefix_candidate_volume`)
    bounds its row count and raises if it exceeds
    ``candidate_budget`` (default ``max(2_000_000, 500 · n_docs)``)
    — prefix filtering is only subquadratic while rarest-prefix dfs
    stay O(1), and this operator's token space is caller-chosen.
    """
    frac = _threshold_fraction(threshold)
    num, den = frac.numerator, frac.denominator
    if shingle_n >= 2:
        from .dedup import _with_shingles

        sets = _with_shingles(docs, shingle_n).select(
            "doc_id", F.col("shingles").alias("__s")
        )
    else:
        sets = docs.select(
            "doc_id", F.array_distinct(words_col(F.col("text"))).alias("__s")
        )
    # the token stream feeds FOUR consumers (global df aggregate, the
    # per-doc ranking, and both sides of the intersection count);
    # materialize it once — recomputing the tokenize+shingle explode
    # four times dominated the runtime (15.8 s -> see PERF.md)
    toks = materialize(sets.select("doc_id", F.explode("__s").alias("tok")))
    ranked, sizes = ranked_tokens(toks)
    # one materialized prefix feeds both the probe and the candidate
    # join — the per-doc ranking window executes exactly once
    prefix = materialize(_prefix_rows(ranked, num, den))
    vol = prefix_candidate_volume(ranked, num, den, prefix=prefix)
    if candidate_budget is not None:
        cap = candidate_budget
    elif vol <= 2_000_000:
        # absolute floor admits the join without the n_docs count job
        cap = 2_000_000
    else:
        cap = max(2_000_000, 500 * sizes.count())
    # decision log shared with the dedup-side guard so soak harnesses
    # pin (probe volume, width, verdict) for THIS operator too — it
    # probes itself rather than going through _guarded_prefix_inputs
    from .dedup import GUARD_TRACE

    GUARD_TRACE.append(
        {
            "width": shingle_n,
            "volume": vol,
            "cap": cap,
            "admitted": vol <= cap,
            "asymmetric": False,
        }
    )
    if vol > cap:
        raise ValueError(
            "token space is saturated for prefix filtering: the "
            f"candidate join would produce ~{vol:,} match rows "
            f"(budget {cap:,}). Use a larger shingle_n (wider shingles "
            "shrink document frequencies geometrically) or raise "
            "candidate_budget to force the join anyway."
        )
    cands = jaccard_prefix_candidates(ranked, num, den, prefix=prefix)
    return (
        exact_intersections(toks, cands, sizes, candidate_volume=vol)
        .withColumn("uni", F.col("sza") + F.col("szb") - F.col("inter"))
        .where(F.col("inter") * den >= F.col("uni") * num)
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("uni").cast("long").alias("uni"),
        )
    )


def prefix_jaccard_pairs_sql(
    table: str = "documents", threshold: float = 0.5, shingle_n: int = 0
) -> str:
    """DuckDB twin: BRUTE-FORCE all-pairs exact Jaccard — deliberately
    a different algorithm, so the gate also proves the prefix filter
    loses no pair."""
    frac = _threshold_fraction(threshold)
    num, den = frac.numerator, frac.denominator
    if shingle_n >= 2:
        from .dedup import shingles_sql

        set_sql = shingles_sql(shingle_n)
    else:
        set_sql = f"list_distinct({WORDS_SQL})"
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({set_sql}) AS tok FROM {table}
), sz AS (
  SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(inter AS BIGINT) AS inter,
       CAST(sa.sz + sb.sz - inter AS BIGINT) AS uni
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE inter * {den} >= (sa.sz + sb.sz - inter) * {num}
"""


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    block_col: str,
    sort_col: str,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood candidate generation — the classic record-
    linkage blocking method: within each block, sort by ``sort_col``
    and emit every pair at most ``window-1`` positions apart. The
    quadratic all-pairs comparison collapses to ``O(n·window)``
    candidates; a verify stage (exact Jaccard, edit distance, a
    model) runs after.

    One window per block (lead at ``1..window-1`` — no self-join at
    all), so the plan is a single shuffle on the block key; per-task
    state is bounded by block size. Blocks are the scale contract: a
    degenerate single-block input serializes into one task, exactly
    like running classic SNM on one machine — pick blocking keys with
    bounded cardinality skew (or pre-salt hot blocks).

    Output: ``(id_a, id_b, gap)`` with ``gap`` = rank distance,
    deterministic under ties via the id tiebreak.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    w = Window.partitionBy(block_col).orderBy(
        F.col(sort_col).asc(), F.col(id_col).asc()
    )
    pairs = None
    base = df.select(block_col, id_col, sort_col)
    for gap in range(1, window):
        nxt = base.select(
            F.col(id_col).alias("id_a"),
            F.lead(id_col, gap).over(w).alias("id_b"),
            F.lit(gap).cast("long").alias("gap"),
        ).where(F.col("id_b").isNotNull())
        pairs = nxt if pairs is None else pairs.unionByName(nxt)
    return pairs


def sorted_neighborhood_pairs_sql(
    table_sql: str,
    id_col: str,
    block_col: str,
    sort_col: str,
    window: int = 3,
) -> str:
    """DuckDB twin of :func:`sorted_neighborhood_pairs`."""
    over = (
        f"OVER (PARTITION BY {block_col} "
        f"ORDER BY {sort_col} ASC, {id_col} ASC)"
    )
    parts = [
        f"""
SELECT {id_col} AS id_a, lead({id_col}, {gap}) {over} AS id_b,
       CAST({gap} AS BIGINT) AS gap
FROM ({table_sql}) __t{gap}
"""
        for gap in range(1, window)
    ]
    union = " UNION ALL ".join(f"({p})" for p in parts)
    return f"SELECT id_a, id_b, gap FROM ({union}) __u WHERE id_b IS NOT NULL"
