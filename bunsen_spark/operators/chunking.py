"""Overlapping token-window document chunking — training-data prep.

Splits each document into fixed-size whitespace-token windows with a
configurable overlap (the standard long-document preprocessing step
before tokenization/packing in LLM data pipelines; the sibling of
``operators/packing.py`` which concatenates *short* docs up to a
budget).

Pure Catalyst: tokenize once (`split`), derive the chunk count with
integer ceiling arithmetic (no float `ceil` — bit-identical across
engines), `posexplode(sequence(...))` to one row per chunk, `slice` +
`array_join` to materialize the window. Zero shuffle — the whole
operator is one map stage, so it scales as a pure scan and pipelines
into whatever shuffle follows (dedup, packing, ...).

Chunk-count contract: zero rows when the document is empty or
whitespace-only (no phantom-token chunks); ``n_chunks = 1`` when
``0 < n_tokens <= chunk_size``
else ``1 + ceil((n_tokens - chunk_size) / stride)`` with
``stride = chunk_size - overlap`` — every token is covered, the last
chunk may be shorter than ``chunk_size``, and consecutive chunks share
exactly ``overlap`` tokens (except possibly the final pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): (id_col, chunk_id, n_chunks,
    chunk_tokens, chunk_text). ``chunk_id`` is 0-based."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # split('') yields [''] — drop empty tokens so empty/whitespace-only
    # docs emit ZERO chunks (not one phantom-token chunk) and declared
    # token counts stay honest for downstream packing budgets
    toks = docs.select(
        F.col(id_col),
        F.array_remove(
            F.split(F.trim(F.col(text_col)), r"\s+"), ""
        ).alias("_toks"),
    ).select(
        id_col,
        "_toks",
        F.size("_toks").alias("_n"),
    ).where(F.col("_n") > 0)
    # integer ceiling: 1 + (n - chunk_size + stride - 1) div stride
    n_chunks = F.when(F.col("_n") <= chunk_size, F.lit(1)).otherwise(
        F.lit(1) + F.expr(f"(_n - {chunk_size} + {stride - 1}) div {stride}")
    )
    exploded = toks.select(
        id_col,
        "_toks",
        n_chunks.cast("long").alias("n_chunks"),
    ).select(
        id_col,
        "_toks",
        "n_chunks",
        F.posexplode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias(
            "chunk_id", "_start_mult"
        ),
    )
    start = F.col("chunk_id") * stride  # 0-based token offset
    window = F.slice(F.col("_toks"), (start + 1).cast("int"), chunk_size)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "n_chunks",
        F.size(window).cast("long").alias("chunk_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (1-based list slicing,
    same integer ceiling arithmetic)."""
    stride = chunk_size - overlap
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(trim({text_col}), '\\s+'),
                     x -> x <> '') AS t
  FROM {table}
), meta AS (
  SELECT {id_col}, t, len(t) AS n,
         CASE WHEN len(t) <= {chunk_size} THEN 1
              ELSE 1 + (n - {chunk_size} + {stride - 1}) // {stride}
         END AS n_chunks
  FROM toks
  WHERE len(t) > 0
)
, chunks AS (
  SELECT {id_col}, t, n_chunks,
         unnest(range(0, n_chunks)) AS i
  FROM meta
)
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_id,
       CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(len(t[i * {stride} + 1 : i * {stride} + {chunk_size}]) AS BIGINT)
         AS chunk_tokens,
       array_to_string(t[i * {stride} + 1 : i * {stride} + {chunk_size}], ' ')
         AS chunk_text
FROM chunks
"""


def adjacent_chunk_pairs(chunks: DataFrame) -> DataFrame:
    """Positive pairs for contrastive training: consecutive chunks of
    the same document (the standard "adjacent spans agree" positive
    signal, the counterpart of `contrastive.negative_pairs`). One
    window per document over the chunker's own (doc_id, chunk_id)
    output — zero extra shuffles when run right after
    :func:`chunk_documents` (same partition key), map-bounded state.

    Output: ``(doc_id, chunk_a, chunk_b, pair_tokens)`` for each
    consecutive (chunk_id, chunk_id+1) pair; single-chunk documents
    emit nothing.
    """
    w = Window.partitionBy("doc_id").orderBy("chunk_id")
    nxt_id = F.lead("chunk_id").over(w)
    nxt_tokens = F.lead("chunk_tokens").over(w)
    return (
        chunks.select(
            "doc_id",
            F.col("chunk_id").alias("chunk_a"),
            nxt_id.alias("chunk_b"),
            (F.col("chunk_tokens") + nxt_tokens).cast("long").alias(
                "pair_tokens"
            ),
        )
        .where(F.col("chunk_b").isNotNull())
    )


def adjacent_chunk_pairs_sql(chunks_sql: str) -> str:
    """DuckDB twin of :func:`adjacent_chunk_pairs` over a SELECT body
    yielding (doc_id, chunk_id, chunk_tokens)."""
    return f"""
SELECT doc_id, chunk_a, chunk_b, pair_tokens FROM (
  SELECT doc_id, chunk_id AS chunk_a,
         lead(chunk_id) OVER w AS chunk_b,
         CAST(chunk_tokens + lead(chunk_tokens) OVER w AS BIGINT)
             AS pair_tokens
  FROM ({chunks_sql}) __c
  WINDOW w AS (PARTITION BY doc_id ORDER BY chunk_id)
) WHERE chunk_b IS NOT NULL
"""
