"""Gate queries for the round-5 additions: per-source caps, cross-corpus
fuzzy join, and snapshot diff."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


def source_cap_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation cap (`operators/sampling.py:cap_per_group`):
    keep each source's 40 longest documents (ties broken by doc_id),
    report per-source kept counts + total kept chars. One window on the
    source key + one aggregate."""
    from ..operators.sampling import cap_per_group

    docs = load(spark, sf_dir, "documents")
    kept = cap_per_group(docs, "source", cap=40, score_col="n_chars")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.col("n_chars").cast("long")).alias("kept_chars"),
            F.min("doc_id").alias("min_kept_id"),
        )
        .orderBy("source")
    )


SOURCE_CAP_SQL = """
WITH kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
    ) AS __rn
    FROM documents
  ) WHERE __rn <= 40
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS kept_chars,
       min(doc_id) AS min_kept_id
FROM kept
GROUP BY source
ORDER BY source
"""


def fuzzy_join_even_odd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus record linkage (`operators/dedup.py:
    fuzzy_text_join`): even-doc_id documents vs odd-doc_id documents,
    MinHash-LSH candidates + exact-Jaccard verify. The two "corpora"
    stand in for e.g. this-crawl vs last-crawl."""
    from ..operators.dedup import fuzzy_text_join_split

    docs = load(spark, sf_dir, "documents")
    return fuzzy_text_join_split(
        docs.select("doc_id", "text"),
        F.col("doc_id") % 2 == 0,
        threshold=0.5,
        portable=True,
    )


def _fuzzy_sql() -> str:
    from ..operators.dedup import fuzzy_text_join_sql

    return fuzzy_text_join_sql("documents", "doc_id % 2 = 0", 0.5)


def snapshot_diff_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-to-release delta (`operators/snapshot.py`): snapshot B
    simulates the next corpus release — every 97th doc dropped, every
    89th re-scrubbed (text suffixed), every 101st doc re-ingested under
    a new id. The diff returns exactly the touched keys with their
    status; one full outer join on doc_id."""
    from ..operators.snapshot import snapshot_diff

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dropped = F.col("doc_id") % 97 == 0
    edited = F.col("doc_id") % 89 == 0
    readded = F.col("doc_id") % 101 == 0
    new = (
        docs.where(~dropped)
        .withColumn(
            "text",
            F.when(edited, F.concat(F.col("text"), F.lit(" [rev2]"))).otherwise(
                F.col("text")
            ),
        )
        .unionByName(
            docs.where(readded).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang"
            )
        )
    )
    return (
        snapshot_diff(docs, new, "doc_id", ["text", "lang"])
        .orderBy("doc_id")
    )


SNAPSHOT_DIFF_SQL = """
WITH o AS (
  SELECT doc_id, text, lang FROM documents
), n AS (
  SELECT doc_id,
         CASE WHEN doc_id % 89 = 0 THEN text || ' [rev2]' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang
  FROM documents WHERE doc_id % 101 = 0
)
SELECT * FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN NOT ((o.text IS NOT DISTINCT FROM n.text)
                        AND (o.lang IS NOT DISTINCT FROM n.lang)) THEN 'changed'
         END AS status
  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
) WHERE status IS NOT NULL
ORDER BY doc_id
"""


def split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: deterministic 90/10 split
    (`split_assign`, md5-bucket on doc_id) followed by a cross-corpus
    near-dup join (`fuzzy_text_join`) — every (train doc, test doc)
    pair whose shingle Jaccard ≥ 0.5 is a leak a benchmark score would
    silently inherit. The composition every eval pipeline needs before
    trusting held-out numbers."""
    from ..operators.dedup import fuzzy_text_join_split
    from ..operators.sampling import split_assign

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tagged = split_assign(docs, "doc_id", {"train": 0.9, "test": 0.1})
    return fuzzy_text_join_split(
        tagged,
        F.col("split") == "train",
        threshold=0.5,
        portable=True,
    )


def _leakage_sql() -> str:
    from ..operators.dedup import fuzzy_text_join_sql
    from ..operators.sampling import BUCKETS, _bucket_sql

    train = f"{_bucket_sql('doc_id')} < {int(round(0.9 * BUCKETS))}"
    return fuzzy_text_join_sql("documents", train, 0.5)


def part_basket_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the 1995 market-basket graph
    (parts are adjacent when shipped in the same order during 1995) —
    the graph clustering-density feature
    (`operators/graph.py:triangle_count`). The date restriction keeps
    the co-occurrence graph sparse (~1% density); the ordered
    two-path + closing-edge plan is then linear in Σ deg⁺². (The
    UNRESTRICTED co-supply graph is ~90% dense — triangle counting is
    a sparse-graph operator and a dense input is the user's modeling
    error, not a plan problem.) Top 25 by (count, partkey)."""
    from ..operators.graph import triangle_count

    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    ).select("l_orderkey", "l_partkey")
    pairs = (
        l.alias("a")
        .join(l.alias("b"), "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    return (
        triangle_count(pairs)
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(25)
        .select(F.col("node").alias("p_partkey"), "n_triangles")
    )


def _triangles_sql() -> str:
    from ..operators.graph import triangle_count_sql

    edges = """
SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
WHERE a.l_partkey < b.l_partkey
  AND a.l_shipdate >= DATE '1995-01-01' AND a.l_shipdate < DATE '1996-01-01'
  AND b.l_shipdate >= DATE '1995-01-01' AND b.l_shipdate < DATE '1996-01-01'
"""
    inner = triangle_count_sql(edges)
    return f"""
SELECT node AS p_partkey, n_triangles FROM ({inner})
ORDER BY n_triangles DESC, node
LIMIT 25
"""


def weighted_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling
    (`operators/sampling.py:weighted_sample`): each document survives
    with probability n_chars/2000 (clamped to [0,1]) decided by the
    deterministic md5 coin — longer (better-for-this-demo) docs are
    favored, no RNG. Reported per language: survivors and their char
    mass. Zero-shuffle filter + one aggregate."""
    from ..operators.sampling import weighted_sample

    docs = load(spark, sf_dir, "documents")
    kept = weighted_sample(docs, "doc_id", F.col("n_chars") / 2000.0)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.col("n_chars").cast("long")).alias("kept_chars"),
        )
        .orderBy("lang")
    )


def _weighted_sql() -> str:
    from ..operators.sampling import weighted_sample_sql

    inner = weighted_sample_sql("documents", "doc_id", "n_chars / 2000.0")
    return f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS kept_chars
FROM ({inner})
GROUP BY lang
ORDER BY lang
"""


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs
    (`operators/dedup.py:containment_pairs`): C(A→B) = |A∩B|/|A| over
    3-gram shingle sets via the shared inverted-index core — the
    doc-inside-doc / boilerplate-inclusion cases a symmetric Jaccard
    threshold never fires on. One direction row per clearing side."""
    from ..operators.dedup import containment_pairs

    docs = load(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=0.8, portable=True)


def _containment_sql() -> str:
    from ..operators.dedup import containment_pairs_sql

    return containment_pairs_sql("documents", threshold=0.8)


#: fixed demo query for the BM25 gate — terms from the fixture vocab
BM25_TERMS = ["hash", "merge", "spark", "window"]


def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-15 retrieval (`operators/retrieval.py:bm25_topk`) for a
    4-term query: one tokenize scan feeding both the corpus-stats
    aggregate and the zero-shuffle scoring map, broadcast 1-row stats,
    TakeOrderedAndProject top-k. Log-free rational idf + fixed-order
    folded summation make the double-precision scores bit-exact vs the
    DuckDB twin (same generated expression text runs in both)."""
    from ..operators.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=15)


def _bm25_sql() -> str:
    from ..operators.retrieval import bm25_topk_sql

    return bm25_topk_sql("documents", BM25_TERMS, k=15)


#: fixed query table for the batch-BM25 gate — three queries over the
#: fixture vocab, exercising shared and disjoint terms
BM25_QUERY_ROWS = [
    ("q1", "hash"), ("q1", "table"), ("q2", "spark"), ("q2", "merge"),
    ("q3", "window"), ("q3", "sort"), ("q3", "scan"),
]


def bm25_multiquery_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25 (`operators/retrieval.py:bm25_topk_by_query`): top-10
    docs for each of three queries given as a (query_id, term) table —
    the posting-table scale path (broadcast query vocabulary filters
    tokens BEFORE the tf shuffle, per-query window top-k). Ordered-fold
    summation keeps the double scores bit-exact vs DuckDB."""
    from ..operators.retrieval import bm25_topk_by_query

    docs = load(spark, sf_dir, "documents")
    from ..localrel import values_df

    qdf = values_df(spark, BM25_QUERY_ROWS, "query_id string, term string")
    return bm25_topk_by_query(docs, qdf, k=10)


def _bm25_multi_sql() -> str:
    from ..operators.retrieval import bm25_topk_by_query_sql

    values = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERY_ROWS)
    qsql = f"SELECT * FROM (VALUES {values}) AS t(query_id, term)"
    return bm25_topk_by_query_sql("documents", qsql, k=10)


def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language relative quality bar
    (`operators/sampling.py:quantile_filter`, exact form): keep each
    language's top half by quality score (cume_dist > 0.5, boundary
    ties move atomically) and return the kept (doc_id, lang,
    quality_score) rows — the adaptive filter a multi-lingual corpus
    needs where a global threshold over-prunes low-resource strata."""
    from ..operators.sampling import quantile_filter
    from ..operators.text_analysis import quality_score

    docs = load(spark, sf_dir, "documents")
    scored = quality_score(docs).select("doc_id", "quality_score").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return quantile_filter(scored, "lang", "quality_score", q=0.5).select(
        "doc_id", "lang", "quality_score"
    )


def _quantile_filter_sql() -> str:
    from ..operators.sampling import quantile_filter_sql
    from ..operators.text_analysis import quality_score_sql

    scored = (
        "SELECT q.doc_id, d.lang, q.quality_score "
        f"FROM ({quality_score_sql('documents')}) q "
        "JOIN documents d USING (doc_id)"
    )
    return quantile_filter_sql(f"({scored})", "lang", "quality_score", 0.5)


def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection
    (`operators/dedup.py:cluster_keep_best`): MinHash-LSH near-dup
    pairs → connected components → per cluster keep the member
    maximizing the quality score (ties → min doc_id), via the
    map-side partial-max struct aggregate (no per-cluster sort)."""
    from ..operators.dedup import cluster_keep_best, minhash_lsh_pairs
    from ..operators.text_analysis import quality_score

    docs = load(spark, sf_dir, "documents")
    return cluster_keep_best(
        minhash_lsh_pairs(docs, portable=True), quality_score(docs)
    )


def _cluster_keep_best_sql() -> str:
    from ..operators.dedup import cluster_keep_best_sql, minhash_lsh_pairs_sql
    from ..operators.text_analysis import quality_score_sql

    return cluster_keep_best_sql(
        minhash_lsh_pairs_sql(), quality_score_sql("documents")
    )


#: end-to-end curation parameters (shared by query + oracle)
CURATION_QUANTILE = 0.4  # keep each language's top 60% by quality
CURATION_SOURCE_CAP = 10  # max docs any single source may contribute
CURATION_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def curation_pipeline_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation chain as one composed query — the proof the
    operator families slot together the way a real training-data
    pipeline uses them: quality scoring → per-language relative quality
    bar (`quantile_filter`) → exact dedup (keep min doc_id per distinct
    text) → near-dup keep-best (`near_dup_filter_best` over MinHash-LSH
    pairs) → per-source cap (`cap_per_group`) → deterministic split
    assignment (`split_assign`), reported as per-(lang, split) counts,
    total chars, and the min/max surviving quality (order-insensitive
    extremes — never a float sum whose order could differ across
    engines)."""
    from ..operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        near_dup_filter_best,
    )
    from ..operators.sampling import cap_per_group, quantile_filter, split_assign
    from ..operators.text_analysis import quality_score

    from ..persist import materialize

    docs = load(spark, sf_dir, "documents")
    scored = docs.join(
        quality_score(docs).select("doc_id", "quality_score"), "doc_id"
    )
    # bar and exact each feed TWO consumers (the dedup digest aggregate
    # AND the survivor join-back; the LSH signature build AND the
    # keep-best join). Unmaterialized, each subtree — including the
    # corpus scan + quality scoring under it — executes twice in the
    # final plan: measured 6.1 s -> 4.5 s at sf0.1, and at 100 TB the
    # recompute would be two extra full-corpus passes.
    bar = materialize(
        quantile_filter(scored, "lang", "quality_score", q=CURATION_QUANTILE)
    )
    exact = materialize(
        bar.join(
            exact_dedup(bar).select(F.col("keep_id").alias("doc_id")), "doc_id"
        )
    )
    near = near_dup_filter_best(
        exact, minhash_lsh_pairs(exact, portable=True), "quality_score"
    )
    capped = cap_per_group(
        near, "source", cap=CURATION_SOURCE_CAP, score_col="quality_score"
    )
    split = split_assign(capped, "doc_id", CURATION_SPLITS)
    return (
        split.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
            F.min("quality_score").alias("min_q"),
            F.max("quality_score").alias("max_q"),
        )
        .orderBy("lang", "split")
    )


def _curation_sql() -> str:
    from ..operators.dedup import minhash_lsh_pairs_sql, near_dup_clusters_sql
    from ..operators.sampling import (
        cap_per_group_sql,
        quantile_filter_sql,
        split_assign_sql,
    )
    from ..operators.text_analysis import quality_score_sql

    labels = near_dup_clusters_sql(minhash_lsh_pairs_sql("stage_exact"))
    return f"""
WITH scored AS (
  SELECT d.*, q.quality_score
  FROM documents d JOIN ({quality_score_sql("documents")}) q USING (doc_id)
), stage_bar AS (
  {quantile_filter_sql("scored", "lang", "quality_score", CURATION_QUANTILE)}
), exact_keep AS (
  SELECT min(doc_id) AS doc_id FROM stage_bar GROUP BY md5(text)
), stage_exact AS (
  SELECT s.* FROM stage_bar s JOIN exact_keep USING (doc_id)
), labels AS (
  {labels}
), best AS (
  SELECT cluster_id, min(doc_id) FILTER (WHERE __s = mx) AS keep_id
  FROM (
    SELECT m.*, max(__s) OVER (PARTITION BY cluster_id) AS mx
    FROM (
      SELECT l.doc_id, l.cluster_id, s.quality_score AS __s
      FROM labels l JOIN stage_exact s USING (doc_id)
    ) m
  )
  GROUP BY cluster_id
), losers AS (
  SELECT l.doc_id FROM labels l JOIN best USING (cluster_id)
  WHERE l.doc_id != best.keep_id
), stage_near AS (
  SELECT * FROM stage_exact
  WHERE doc_id NOT IN (SELECT doc_id FROM losers)
), stage_cap AS (
  {cap_per_group_sql("stage_near", "source", CURATION_SOURCE_CAP, "quality_score")}
), stage_split AS (
  {split_assign_sql("stage_cap", "doc_id", CURATION_SPLITS)}
)
SELECT lang, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
       min(quality_score) AS min_q,
       max(quality_score) AS max_q
FROM stage_split
GROUP BY lang, split
ORDER BY lang, split
"""


#: exact heavy-hitter threshold for the gate query (binding at sf0.01:
#: ~150 users averaging ~66 events, so only the heavy fifth clears 75)
HH_MIN_COUNT = 75


def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (`operators/sketches.py:heavy_hitters`):
    users with >= 75 events, found by count-min prefilter (bounded cell
    shuffle + broadcast probe drops the tail map-side) then an exact
    count of the survivors — provably identical to the naive GROUP
    BY/HAVING the oracle runs, because count-min never underestimates."""
    from ..operators.sketches import heavy_hitters

    events = load(spark, sf_dir, "events")
    return heavy_hitters(events, "user_id", HH_MIN_COUNT, portable=True)


def _hh_sql() -> str:
    from ..operators.sketches import heavy_hitters_sql

    return heavy_hitters_sql("events", "user_id", HH_MIN_COUNT)


def temperature_mix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language rebalancing
    (`operators/sampling.py:temperature_sample`, τ=2): per-language
    kept counts and kept char mass after down-sampling toward
    share^(1/2) proportions — low-resource languages keep everything,
    the dominant one is thinned, nothing is upsampled."""
    from ..operators.sampling import temperature_sample

    docs = load(spark, sf_dir, "documents")
    kept = temperature_sample(docs, "doc_id", "lang", "n_chars", tau=2.0)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.col("n_chars").cast("long")).alias("kept_chars"),
        )
        .orderBy("lang")
    )


def _temperature_sql() -> str:
    from ..operators.sampling import temperature_sample_sql

    inner = temperature_sample_sql("documents", "doc_id", "lang", "n_chars", 2.0)
    return f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS kept_chars
FROM ({inner}) __k
GROUP BY lang ORDER BY lang
"""


QUERIES = {
    "curation_pipeline_counts": curation_pipeline_counts,
    "heavy_hitter_users": heavy_hitter_users,
    "temperature_mix_counts": temperature_mix_counts,
    "dedup_containment": dedup_containment,
    "bm25_search_topk": bm25_search_topk,
    "bm25_multiquery_topk": bm25_multiquery_topk,
    "quality_quantile_filter": quality_quantile_filter,
    "dedup_cluster_keep_best": dedup_cluster_keep_best,
    "source_cap_kept": source_cap_kept,
    "fuzzy_join_even_odd": fuzzy_join_even_odd,
    "snapshot_diff_documents": snapshot_diff_documents,
    "split_leakage_pairs": split_leakage_pairs,
    "part_basket_triangles": part_basket_triangles,
    "weighted_sample_counts": weighted_sample_counts,
}

ORACLES = {
    "curation_pipeline_counts": _curation_sql(),
    "heavy_hitter_users": _hh_sql(),
    "temperature_mix_counts": _temperature_sql(),
    "dedup_containment": _containment_sql(),
    "bm25_search_topk": _bm25_sql(),
    "bm25_multiquery_topk": _bm25_multi_sql(),
    "quality_quantile_filter": _quantile_filter_sql(),
    "dedup_cluster_keep_best": _cluster_keep_best_sql(),
    "source_cap_kept": SOURCE_CAP_SQL,
    "fuzzy_join_even_odd": _fuzzy_sql(),
    "snapshot_diff_documents": SNAPSHOT_DIFF_SQL,
    "split_leakage_pairs": _leakage_sql(),
    "part_basket_triangles": _triangles_sql(),
    "weighted_sample_counts": _weighted_sql(),
}
