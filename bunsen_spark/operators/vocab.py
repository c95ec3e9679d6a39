"""Corpus vocabulary induction and broadcast-vocab token encoding —
the tokenizer plumbing of a training pipeline: build a top-N vocab
once, then map every document to its id sequence in a single
broadcast-join pass. (The id assignment is frequency-ranked like a
real tokenizer's vocab file; swapping in externally-trained BPE merges
changes the vocab table, not the Spark plan.)

Plan shape: vocab = one map-side-combined token count + one window
rank over the top-N survivors (N rows, driver-free); encoding = token
position explode → broadcast hash join against the vocab → one
``array_sort(collect_list(struct(pos, id)))`` re-assembly per doc.
The re-assembly groups by ``doc_id`` — unique key, no skew, state
bounded by tokens-per-document. Nothing corpus-wide shuffles except
the vocab count itself.

``collect_list`` order is partition-dependent, so the struct carries
the position and ``array_sort`` makes the result deterministic before
the ids are projected out — never rely on collection order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import WORDS_SQL, words_col


def build_vocab(docs: DataFrame, max_size: int = 1 << 15) -> DataFrame:
    """Frequency-ranked vocabulary: ``(tok, tok_id, cnt)`` with ids
    1..N by (count desc, token asc) — 0 is reserved for OOV."""
    if max_size < 1:
        raise ValueError("max_size must be >= 1")
    counts = (
        docs.select(F.explode(words_col(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # orderBy().limit() runs as a distributed partial top-k (per-
    # partition heads + one merge), so the global-rank window after it
    # sees AT MOST max_size rows — bounded by the vocab budget, never
    # by the corpus's distinct-token count. Ranking the full counts
    # table directly would funnel the whole vocab through one task.
    top = counts.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(max_size)
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    return top.withColumn(
        "tok_id", F.row_number().over(w).cast("long")
    ).select("tok", "tok_id", F.col("cnt").cast("long").alias("cnt"))


def build_vocab_sql(table: str = "documents", max_size: int = 1 << 15) -> str:
    """DuckDB twin of :func:`build_vocab`."""
    return f"""
SELECT tok, tok_id, cnt FROM (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt,
         CAST(row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS BIGINT)
             AS tok_id
  FROM (SELECT unnest({WORDS_SQL}) AS tok FROM {table}) __t
  GROUP BY tok
) WHERE tok_id <= {max_size}
"""


def bpe_pair_counts(docs: DataFrame, top_n: int = 64) -> DataFrame:
    """One BPE merge-iteration statistic: corpus counts of adjacent
    character pairs, aggregated over the DISTINCT-word table weighted
    by word frequency — the classic byte-pair-encoding trick (Sennrich
    et al. 2016): pair counting scales with the vocabulary's total
    characters, not corpus positions, so a 100 TB corpus pays one
    map-side-combined word count and the pair work runs over a
    vocabulary-sized table. Output: ``(pair, cnt, rank)`` for the top
    ``top_n`` pairs by (cnt desc, pair asc) — the next-merge candidate
    list a tokenizer trainer consumes each iteration.

    Pairs keep within-word multiplicity ('aaa' contributes 'aa'
    twice), matching the reference BPE counting. Words shorter than 2
    chars are filtered BEFORE the position expansion: Spark's
    ``sequence(1, 0)`` counts DOWN (yielding [1, 0]) while DuckDB's
    ``generate_series(1, 0)`` is empty — the filter keeps both engines
    off that divergent edge entirely.

    Plan: word count (same scan shape as :func:`build_vocab`) → per-
    distinct-word pair explode via ``transform(sequence(...))`` +
    ``substring`` (whole-stage codegen, no Python) → one pair
    aggregate → distributed partial top-k (``orderBy().limit()``), so
    the final rank window sees at most ``top_n`` rows."""
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    words = (
        docs.select(F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .where(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
            )
        ).alias("pair"),
        "wcnt",
    )
    agg = pairs.groupBy("pair").agg(F.sum("wcnt").cast("long").alias("cnt"))
    top = agg.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def bpe_pair_counts_sql(table: str = "documents", top_n: int = 64) -> str:
    """DuckDB twin of :func:`bpe_pair_counts` (``generate_series``
    position expansion — an independent formulation of the same pair
    multiset)."""
    return f"""
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wcnt
  FROM (SELECT unnest({WORDS_SQL}) AS w FROM {table}) __w
  GROUP BY w
), pairs AS (
  SELECT substring(k.w, CAST(u.i AS INTEGER), 2) AS pair, k.wcnt
  FROM (SELECT * FROM words WHERE length(w) >= 2) k,
       unnest(generate_series(1, length(k.w) - 1)) u(i)
), agg AS (
  SELECT pair, CAST(sum(wcnt) AS BIGINT) AS cnt FROM pairs GROUP BY pair
)
SELECT pair, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rank
FROM agg
ORDER BY rank
LIMIT {top_n}
"""


def encode_docs(docs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Encode each document against ``vocab``: ``(doc_id, n_tokens,
    n_oov, ids)`` where ``ids`` is the in-order id sequence with OOV
    tokens as 0."""
    toks = docs.select(
        "doc_id", F.posexplode(words_col(F.col("text"))).alias("pos", "tok")
    )
    joined = toks.join(
        F.broadcast(vocab.select("tok", "tok_id")), "tok", "left"
    ).select(
        "doc_id",
        "pos",
        F.coalesce(F.col("tok_id"), F.lit(0).cast("long")).alias("tok_id"),
    )
    encoded = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum((F.col("tok_id") == 0).cast("long")).alias("n_oov"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok_id"))),
            lambda s: s["tok_id"],
        ).alias("ids"),
    )
    return (
        docs.select("doc_id")
        .join(encoded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            F.coalesce(F.col("n_oov"), F.lit(0).cast("long")).alias("n_oov"),
            F.coalesce(F.col("ids"), F.array().cast("array<bigint>")).alias(
                "ids"
            ),
        )
    )


def encode_docs_sql(
    table: str = "documents", vocab_sql: str | None = None, max_size: int = 1 << 15
) -> str:
    """DuckDB twin of :func:`encode_docs` (vocab built inline unless
    ``vocab_sql`` is given)."""
    v = vocab_sql or build_vocab_sql(table, max_size)
    return f"""
WITH vocab AS ({v}), toksrc AS (
  SELECT doc_id, {WORDS_SQL} AS ws FROM {table}
), toks AS (
  SELECT doc_id, CAST(p AS BIGINT) AS pos, ws[CAST(p AS INTEGER)] AS tok
  FROM toksrc, unnest(generate_series(1, len(ws))) u(p)
), joined AS (
  SELECT t.doc_id, t.pos, COALESCE(v.tok_id, 0) AS tok_id
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
), enc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN tok_id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         list(tok_id ORDER BY pos) AS ids
  FROM joined GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(e.n_tokens, 0) AS n_tokens,
       COALESCE(e.n_oov, 0) AS n_oov,
       COALESCE(e.ids, CAST([] AS BIGINT[])) AS ids
FROM {table} d LEFT JOIN enc e USING (doc_id)
"""
