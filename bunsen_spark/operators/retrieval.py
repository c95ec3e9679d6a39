"""Full-text retrieval scoring: BM25 top-k over an inverted term view.

Beyond-reference scale extension (SURVEY §7 M7) — the ranking half of a
training-data pipeline's search/inspection tooling (the dedup half lives
in :mod:`dedup`). Design for 100 TB:

- **one corpus scan**: the per-doc (dl, tf per query term) projection is
  computed in a single map stage over the tokenized text and
  materialized once; it feeds both the corpus-statistics aggregate
  (N, Σdl, per-term df — map-side combined, one 1-row result) and the
  scoring pass. The corpus is never shuffled.
- **broadcast stats**: the 1-row statistics frame is broadcast-joined
  (a literal cross join of one row), so scoring stays a zero-shuffle
  map stage.
- **global top-k without a full sort**: ``orderBy(...).limit(k)``
  compiles to ``TakeOrderedAndProject`` — per-partition heaps plus a
  driver merge of k·partitions rows, not a total sort.
- **two forms**: :func:`bm25_topk` turns a small literal term set into
  columns (interactive-scale, ≲ tens of terms, zero shuffle);
  :func:`bm25_topk_by_query` takes a (query_id, term) *DataFrame* and
  builds a real posting-table plan — tokens are filtered against the
  broadcast query vocabulary BEFORE the (doc, term) aggregation
  shuffle, so the shuffle is bounded by matching tokens, not corpus
  tokens, and the per-query top-k is a bounded window. That is the
  batch-retrieval shape (benchmark-query mining, eval-set lookup) that
  scales with the query set.

Determinism / oracle parity: the classic BM25 idf uses ``ln``, whose
last-ulp behavior is libm-implementation-defined, so cross-engine
bit-parity cannot be promised. This operator uses the log-free rational
idf ``(N - df + 0.5) / (df + 0.5)`` instead (the raw odds the Robertson
idf is the log of — same ordering for a single term, always positive).
Every remaining operation is IEEE-754 +,-,*,/ on doubles, which SQL
engines must round exactly, and the per-term summation is folded in
sorted-term order with one fixed parenthesization — the *same generated
expression text* runs on Spark and DuckDB, so scores match bit-for-bit
and ``round(score, 6)`` is cosmetic, not a tolerance.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..persist import materialize, materialize_eager

BM25_K1 = 1.2
BM25_B = 0.75

_TERM_RE = re.compile(r"^[a-z0-9]+$")


def _check_terms(terms: list[str]) -> list[str]:
    """Validated, sorted, de-duplicated query terms. Terms are embedded
    in generated expressions, so anything outside the tokenizer's
    [a-z0-9]+ alphabet is rejected (it could never match a token
    anyway)."""
    if not terms:
        raise ValueError("bm25: empty query term list")
    for t in terms:
        if not _TERM_RE.match(t):
            raise ValueError(f"bm25: invalid query term {t!r} (want [a-z0-9]+)")
    return sorted(set(terms))


def _dbl(x: float) -> str:
    """A double literal rendered identically for Spark SQL and DuckDB —
    CAST of the decimal literal, so neither parser keeps it as DECIMAL
    arithmetic (both would: bare 0.5 is DECIMAL(1,1) in each)."""
    return f"CAST({x!r} AS DOUBLE)"


def bm25_score_expr(terms: list[str], k1: float = BM25_K1, b: float = BM25_B) -> str:
    """The BM25 score as one expression string over columns
    ``dl, n_docs, sumdl, tf_<term>, df_<term>`` — valid, and evaluated
    through the identical exactly-rounded IEEE op sequence, in BOTH
    Spark SQL and DuckDB. Terms are folded in sorted order with fixed
    left-nested parentheses so the summation order is pinned."""
    parts = []
    for t in _check_terms(terms):
        idf = f"(((n_docs - df_{t}) + {_dbl(0.5)}) / (df_{t} + {_dbl(0.5)}))"
        num = f"(tf_{t} * {_dbl(k1 + 1.0)})"
        den = (
            f"(tf_{t} + {_dbl(k1)} * ({_dbl(1.0 - b)} + {_dbl(b)}"
            f" * (dl / (sumdl / n_docs))))"
        )
        parts.append(f"({idf} * ({num} / {den}))")
    expr = parts[0]
    for p in parts[1:]:
        expr = f"({expr} + {p})"
    return expr


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 (rational-idf variant, module doc)
    for a literal query term set. Output: (``id_col``, bm25) ordered by
    (score desc, id) — ties are broken by id so the cut is
    deterministic; zero-scoring docs (no query term present) are
    dropped before the top-k."""
    terms = _check_terms(terms)
    words = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z0-9]+"), 0)
    proj = (
        docs.select(F.col(id_col), words.alias("__w"))
        .select(
            id_col,
            F.size("__w").alias("dl"),
            *[
                F.expr(f"size(filter(__w, x -> x = '{t}'))").alias(f"tf_{t}")
                for t in terms
            ],
        )
        # consumed twice: corpus stats + scoring; one tokenize scan
        .transform(materialize)
    )
    stats = proj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("dl").cast("long")).alias("sumdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0)).alias(f"df_{t}")
            for t in terms
        ],
    )
    scored = proj.crossJoin(F.broadcast(stats)).select(
        id_col, F.expr(bm25_score_expr(terms, k1, b)).alias("score")
    )
    return (
        scored.where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("score", 6).alias("bm25"))
    )


#: the per-(doc, term) BM25 contribution over columns
#: ``tf, df, dl, n_docs, sumdl`` — same text for both engines.
def _term_score_expr(k1: float, b: float) -> str:
    idf = f"(((n_docs - df) + {_dbl(0.5)}) / (df + {_dbl(0.5)}))"
    num = f"(tf * {_dbl(k1 + 1.0)})"
    den = (
        f"(tf + {_dbl(k1)} * ({_dbl(1.0 - b)} + {_dbl(b)}"
        f" * (dl / (sumdl / n_docs))))"
    )
    return f"({idf} * ({num} / {den}))"


def bm25_topk_by_query(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Batch BM25: top-``k`` documents per query for a (query_id, term)
    DataFrame of queries. Output: (query_id, ``id_col``, rank, bm25),
    rank 1..k by (score desc, id) within each query.

    Plan (the scale path — see module doc): one tokenize scan explodes
    to (doc, dl, term) rows that are semi-joined against the BROADCAST
    distinct query vocabulary before anything shuffles — the (doc,
    term) tf aggregation then only sees tokens that can score. Corpus
    stats (N, Σdl) are one separate map-side-combined aggregate on the
    raw corpus (docs with zero query terms never reach the posting
    path but still count in N and avgdl, exactly as in
    :func:`bm25_topk`). Per-term df falls out of the tf table. The
    per-(query, doc) summation folds the per-term contributions in
    sorted-term order from an explicit 0.0 accumulator, so the result
    is the same exactly-rounded IEEE sequence in Spark and DuckDB."""
    from pyspark.sql import Window

    words = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z0-9]+"), 0)
    # ONE tokenize pass: the regex dominates the corpus scan, and both
    # the posting explode and the corpus-stats aggregate need its
    # output, so the tokenized projection is materialized once (same
    # shape as minhash_signature's shared signature scan; measured ~25%
    # off the whole query vs re-running the regex for the stats pass)
    toks = docs.select(F.col(id_col), words.alias("__w")).transform(materialize_eager)
    base = toks.select(
        F.col(id_col),
        F.size("__w").alias("dl"),
        F.explode("__w").alias("term"),
    )
    vocab = queries.select("term").distinct()
    tf = (
        base.join(F.broadcast(vocab), "term")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
        # feeds df_term and the scoring join: aggregate once. Lazy is
        # right here: tf contains its groupBy exchange, so AQE already
        # materializes the expensive stages at checkpoint-creation time
        # — the fan-out race only bites map-only subplans (persist.py)
        .transform(materialize)
    )
    df_term = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("__w").cast("long")).alias("sumdl"),
    )
    contrib = (
        tf.join(F.broadcast(df_term), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col, "term", F.expr(_term_score_expr(k1, b)).alias("s")
        )
    )
    scored = (
        contrib.join(F.broadcast(queries), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(term, s))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.s)"
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", id_col, "rank", F.round("score", 6).alias("bm25")
        )
    )


def bm25_topk_by_query_sql(
    table: str,
    queries_sql: str,
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk_by_query`; ``queries_sql`` must
    select (query_id, term). The per-(query, doc) fold prepends the 0.0
    accumulator and reduces in sorted-term order, mirroring Spark's
    ``aggregate`` init + left fold."""
    return f"""
WITH q AS ({queries_sql}),
toks AS (
  SELECT {id_col}, len(w) AS dl, unnest(w) AS term
  FROM (SELECT {id_col}, regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS w
        FROM {table})
), tf AS (
  SELECT t.{id_col}, t.term,
         CAST(count(*) AS BIGINT) AS tf, CAST(max(t.dl) AS BIGINT) AS dl
  FROM toks t JOIN (SELECT DISTINCT term FROM q) v USING (term)
  GROUP BY t.{id_col}, t.term
), df_term AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(lower({text_col}), '[a-z0-9]+'))) AS BIGINT)
           AS sumdl
  FROM {table}
), contrib AS (
  SELECT tf.{id_col}, tf.term, {_term_score_expr(k1, b)} AS s
  FROM tf JOIN df_term USING (term), stats
), scored AS (
  SELECT q.query_id, c.{id_col},
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list(c.s ORDER BY c.term)),
           (acc, x) -> acc + x) AS score
  FROM contrib c JOIN q USING (term)
  GROUP BY q.query_id, c.{id_col}
), ranked AS (
  SELECT query_id, {id_col},
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, {id_col}) AS rank,
         score
  FROM scored
)
SELECT query_id, {id_col}, CAST(rank AS INT) AS rank, round(score, 6) AS bm25
FROM ranked WHERE rank <= {k}
"""


def bm25_topk_sql(
    table: str,
    terms: list[str],
    k: int = 15,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — shares the generated score
    expression verbatim (see module doc for why that yields bit
    parity)."""
    terms = _check_terms(terms)
    tf_cols = ",\n         ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}" for t in terms
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in terms
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, len(w) AS dl,
         {tf_cols}
  FROM (SELECT {id_col}, regexp_extract_all(lower({text_col}), '[a-z0-9]+') AS w
        FROM {table})
), stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sumdl,
         {df_cols}
  FROM toks
), scored AS (
  SELECT {id_col}, {bm25_score_expr(terms, k1, b)} AS score
  FROM toks, stats
)
SELECT {id_col}, round(score, 6) AS bm25
FROM scored WHERE score > 0
ORDER BY score DESC, {id_col}
LIMIT {k}
"""


def _rrf_lcm(c: int, k: int) -> int:
    """lcm(c+1 .. c+k): scaling that turns every reciprocal-rank
    1/(c+rank), rank <= k, into an exact integer."""
    import math

    out = 1
    for r in range(1, k + 1):
        out = out * (c + r) // math.gcd(out, c + r)
    return out


def rrf_fuse(
    runs: list[DataFrame],
    k_out: int = 5,
    k_in: int = 5,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked
    ``(query_id, neighbor_id, rank)`` runs — the standard hybrid-search
    combiner (BM25 + dense, exact + ANN): score(d) = Σ_runs
    1/(c + rank_run(d)), missing runs contribute 0. Scores are scaled
    by ``lcm(c+1 .. c+k_in)`` so every addend — and therefore every
    sum and every comparison — is an EXACT integer: the fused ranking
    is engine-reproducible with no float in sight (c = 60 and k = 10
    keep the scaled scores < 2^40). Output: ``(query_id, neighbor_id,
    rrf_score, rrf_rank)`` for the top ``k_out`` per query by
    (score desc, neighbor_id asc).

    Scale shape: a union of per-run rank tables (each already
    bounded by queries × k_in), one (query, neighbor) aggregate, and a
    rank window whose partitions hold at most runs × k_in rows — the
    fusion never touches the corpus, only the rank tables."""
    if not runs:
        raise ValueError("runs must be non-empty")
    scale = _rrf_lcm(c, k_in)
    parts = [
        r.select(
            "query_id",
            "neighbor_id",
            F.expr(f"{scale} div ({c} + rank)").alias("__w"),
        )
        for r in runs
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    s = u.groupBy("query_id", "neighbor_id").agg(
        F.sum("__w").cast("long").alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    return (
        s.withColumn("rrf_rank", F.row_number().over(w).cast("long"))
        .where(F.col("rrf_rank") <= k_out)
    )


def rrf_fuse_sql(
    run_sqls: list[str],
    k_out: int = 5,
    k_in: int = 5,
    c: int = 60,
) -> str:
    """DuckDB twin of :func:`rrf_fuse`; each entry of ``run_sqls`` is a
    full SELECT (CTEs allowed — it is wrapped as a subquery) producing
    ``(query_id, neighbor_id, rank)``."""
    scale = _rrf_lcm(c, k_in)
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, neighbor_id, {scale} // ({c} + rank) AS w"
        f" FROM ({sql}) __r{i}"
        for i, sql in enumerate(run_sqls)
    )
    return f"""
WITH u AS (
{union}
), s AS (
  SELECT query_id, neighbor_id, CAST(sum(w) AS BIGINT) AS rrf_score
  FROM u GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, rrf_score, rrf_rank FROM (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY query_id ORDER BY rrf_score DESC, neighbor_id ASC
  ) AS BIGINT) AS rrf_rank
  FROM s
) WHERE rrf_rank <= {k_out}
"""


def topk_overlap(run_a: DataFrame, run_b: DataFrame, k: int) -> DataFrame:
    """Recall@k of one ranked run against another: per query, how many
    of run_b's top-``k`` appear in run_a's top-``k`` — THE
    approximate-nearest-neighbor quality metric (recall vs the exact
    scan) and the regression gate any index change should run. Both
    runs are ``(query_id, neighbor_id, rank)`` tables; rows ranked
    beyond ``k`` are ignored. Output: ``(query_id, hits)`` — exact
    longs, ``hits/k`` is the per-query recall and ``sum(hits)/(n·k)``
    the corpus recall.

    Queries present in run_a but absent from run_b score 0 (never
    silently dropped). The join is rank-table-sized (queries × k per
    side) — the corpus is never touched."""
    a = run_a.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    b = run_b.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    # both sides are bounded by queries x k BY CONTRACT — broadcast
    # the reference run so the overlap join never shuffles run_a
    hits = (
        a.join(F.broadcast(b), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return (
        a.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
        )
    )


def topk_overlap_sql(run_a_sql: str, run_b_sql: str, k: int) -> str:
    """DuckDB twin of :func:`topk_overlap`; each run SQL is a full
    SELECT (CTEs allowed) producing ``(query_id, neighbor_id, rank)``."""
    return f"""
WITH a AS (
  SELECT query_id, neighbor_id FROM ({run_a_sql}) __a WHERE rank <= {k}
),
b AS (
  SELECT query_id, neighbor_id FROM ({run_b_sql}) __b WHERE rank <= {k}
),
h AS (
  SELECT a.query_id, CAST(count(*) AS BIGINT) AS hits
  FROM a JOIN b USING (query_id, neighbor_id)
  GROUP BY a.query_id
)
SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits
FROM (SELECT DISTINCT query_id FROM a) q
LEFT JOIN h USING (query_id)
"""


def _lcm_1_to_k(k: int) -> int:
    import math

    out = 1
    for i in range(1, k + 1):
        out = out * i // math.gcd(out, i)
    return out


def mrr_by_query(
    run: DataFrame,
    labels: DataFrame,
    k: int,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Exact-integer Mean-Reciprocal-Rank per query: a neighbor is
    RELEVANT when its label equals the query's own label (the standard
    intrinsic retrieval audit over a labeled corpus), and the per-query
    score is ``lcm(1..k) / first_relevant_rank`` — scaled by the lcm so
    every reciprocal is a whole integer and the metric is bit-exact
    across engines (the same trick as RRF fusion). Queries whose top-k
    contains no relevant neighbor score 0 with ``first_rel = 0``,
    never dropped. ``k`` is capped at 42: lcm(1..43) exceeds int64, so
    larger cutoffs cannot keep the scaled metric exact.

    100 TB design: ``run`` is a rank table (queries x k rows) and is
    BROADCAST against the corpus-sized label table twice (query label,
    neighbor label) — the labels never shuffle. Output:
    (query_id, first_rel, mrr_scaled)."""
    if not 1 <= k <= 42:
        raise ValueError(
            "k must be in [1, 42]: lcm(1..43) overflows int64 and the "
            "lcm-scaled reciprocal would stop being exact"
        )
    scale = _lcm_1_to_k(k)
    lab = labels.select(F.col(id_col).alias("__id"), F.col(label_col).alias("__lab"))
    tagged = (
        lab.join(F.broadcast(run), F.col("__id") == F.col("neighbor_id"))
        .withColumnRenamed("__lab", "n_lab")
        .drop("__id")
    )
    tagged = (
        lab.join(F.broadcast(tagged), F.col("__id") == F.col("query_id"))
        .withColumnRenamed("__lab", "q_lab")
        .drop("__id")
    )
    per_q = (
        tagged.where(F.col("rank") <= k)
        .groupBy("query_id")
        .agg(
            F.min(F.when(F.col("n_lab") == F.col("q_lab"), F.col("rank"))).alias("__fr")
        )
    )
    # left-join back to the full query list so no-hit queries emit 0
    queries = run.select("query_id").distinct()
    return (
        queries.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("__fr"), F.lit(0)).cast("long").alias("first_rel"),
            # integral division, NOT double `/`: lcm(1..k) exceeds the
            # 2^53 double mantissa for k >= 41, so a float round-trip
            # would diverge from the DuckDB oracle's integer `//`
            F.coalesce(
                F.expr(f"{scale} div __fr"), F.lit(0).cast("long")
            ).alias("mrr_scaled"),
        )
    )


def mrr_by_query_sql(run_sql: str, k: int, table: str = "embeddings") -> str:
    """DuckDB twin: wrap any ranked-run SELECT (query_id, neighbor_id,
    rank) and score it with the same lcm-scaled reciprocal rank."""
    scale = _lcm_1_to_k(k)
    return f"""
WITH run AS ({run_sql}),
perq AS (
  SELECT r.query_id,
         min(CASE WHEN nl.label = ql.label THEN r.rank END) AS fr
  FROM run r
  JOIN {table} nl ON nl.vec_id = r.neighbor_id
  JOIN {table} ql ON ql.vec_id = r.query_id
  WHERE r.rank <= {k}
  GROUP BY r.query_id
)
SELECT query_id,
       CAST(COALESCE(fr, 0) AS BIGINT) AS first_rel,
       CAST(COALESCE({scale} // fr, 0) AS BIGINT) AS mrr_scaled
FROM perq
"""
