"""Exact substring-duplication spans — the character-level dedup
signal from the "deduplicating training data" line of work: for every
document, how many of its characters sit inside a length-``k``
substring that occurs (anywhere in the corpus, including elsewhere in
the same document) at least ``min_df`` times.

Beyond-reference scale extension (SURVEY §7 M7 family; the reference —
a FHIR/terminology engine — has no text dedup at all, cf.
`bunsen-core/src/main/java/com/cerner/bunsen/FhirEncoders.java` which
is the closest it gets to bulk data handling). Near-dup operators
(`operators/dedup.py`) decide at document granularity; this operator
measures WITHIN-document duplicated mass, the signal used to strip
boilerplate and templated spans before training.

Plan shape (all pure Catalyst — no Python anywhere):

1. gram explode: each doc emits one row per character position
   ``1..L-k+1`` with the 31-bit hash of the k-gram starting there.
   Map-only; the gram string itself is hashed immediately so the
   shuffle rows are ``(doc_id, pos, gh)`` — 20 bytes, never the text.
2. duplicate-gram selection: ONE shuffle on ``gh`` with a window
   ``count() >= min_df`` — the gram stream is computed and hashed
   exactly once (a groupBy + join-back formulation recomputes the
   whole explode on the probe side). Window partitions are per
   distinct gram; a pathological corpus-wide hot gram bounds at the
   occurrence count of one gram, the same bound the join formulation
   has on its probe side.
3. interval merge per doc (gaps-and-islands): a window ordered by
   ``pos`` computes the running ``max(pos + k)`` of preceding rows; a
   position starts a new island when it clears that running end. Sum of
   ``max(end) - min(pos)`` over islands = duplicated chars. Window
   state is bounded by positions-per-document, so a 100 TB corpus of
   bounded-length documents never builds a large window partition;
   ``doc_id`` is the natural partition key and is unique, so there is
   no hot key.

At 100 TB the dominant cost is step 1's explode (L rows per doc);
raising ``k`` both shrinks matches and is free at explode time, and
steps 2-3 only carry 8-byte hashes. The output is one row per document
— integer columns only, so the DuckDB twin is bit-exact.

``portable=True`` pins the md5 hash family for cross-engine gates
(`text_analysis.hash31`); production default is xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import hash31, md5int_sql

DEFAULT_K = 20


def substring_dup_spans(
    docs: DataFrame,
    k: int = DEFAULT_K,
    min_df: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Per-document duplicated-character mass from shared k-grams.

    Returns one row per input document: ``(doc_id, n_chars,
    dup_chars)`` where ``dup_chars`` is the total length of the merged
    position intervals covered by k-grams occurring ``>= min_df``
    times corpus-wide. Documents shorter than ``k`` (or with no
    duplicated gram) report ``dup_chars = 0``.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if min_df < 2:
        raise ValueError("min_df must be >= 2")
    base = docs.select("doc_id", F.length("text").alias("n_chars"), "text")
    # the gram array is built INSIDE one projection (transform over the
    # position sequence) and posexploded: the exploded rows carry only
    # the k-char gram, never the full document text (k bytes/row vs
    # document-length bytes/row), and the gram stream is computed
    # exactly once — the duplicate-gram count is a window over the
    # same shuffle instead of a groupBy + join back onto a recomputed
    # gram stream (which doubled both the explode and the hashing)
    gram_arr = F.expr(
        f"transform(sequence(1, length(text) - {k - 1}),"
        f" p -> substring(text, p, {k}))"
    )
    grams = (
        base.where(F.col("n_chars") >= k)
        .select("doc_id", F.posexplode(gram_arr).alias("pos0", "g"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            hash31(F.col("g"), portable).alias("gh"),
        )
    )
    w_gh = Window.partitionBy("gh")
    hits = (
        grams.withColumn("__df", F.count(F.lit(1)).over(w_gh))
        .where(F.col("__df") >= min_df)
        .select("doc_id", "pos", (F.col("pos") + F.lit(k)).alias("end"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "island",
        F.sum(
            (prev_end.isNull() | (F.col("pos") > prev_end)).cast("int")
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "island").agg(
        (F.max("end") - F.min("pos")).alias("span")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span").cast("long").alias("dup_chars")
    )
    return (
        base.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce(F.col("dup_chars"), F.lit(0).cast("long")).alias(
                "dup_chars"
            ),
        )
    )


def substring_dup_spans_sql(
    table: str = "documents", k: int = DEFAULT_K, min_df: int = 2
) -> str:
    """DuckDB twin of :func:`substring_dup_spans` (portable hash)."""
    gh = md5int_sql(f"substring(text, CAST(p AS INTEGER), {k})")
    return f"""
WITH g AS (
  SELECT doc_id, CAST(p AS BIGINT) AS pos,
         ({gh}) % 2147483647 AS gh
  FROM {table}, unnest(generate_series(1, length(text) - {k - 1})) u(p)
  WHERE length(text) >= {k}
), d AS (
  SELECT gh FROM g GROUP BY gh HAVING count(*) >= {min_df}
), hits AS (
  SELECT g.doc_id, g.pos, g.pos + {k} AS e FROM g JOIN d USING (gh)
), marked AS (
  SELECT doc_id, pos, e,
         CASE WHEN max(e) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR pos > max(e) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
              THEN 1 ELSE 0 END AS brk
  FROM hits
), isl AS (
  SELECT doc_id, pos, e,
         sum(brk) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS island
  FROM marked
), spans AS (
  SELECT doc_id, island, max(e) - min(pos) AS span
  FROM isl GROUP BY doc_id, island
), per_doc AS (
  SELECT doc_id, CAST(sum(span) AS BIGINT) AS dup_chars
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id, CAST(length(t.text) AS BIGINT) AS n_chars,
       COALESCE(p.dup_chars, CAST(0 AS BIGINT)) AS dup_chars
FROM {table} t LEFT JOIN per_doc p USING (doc_id)
"""
