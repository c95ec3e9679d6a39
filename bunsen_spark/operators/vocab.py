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

from ..persist import materialize
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
    # Constant-VALUED (cnt % 1 == 0) but non-foldable partition key: a
    # single-partition window over the <= max_size surviving rows is
    # the design, not an oversight; a plain literal would be folded
    # away by the optimizer, re-triggering the noisy WindowExec
    # no-partition warning in every bench/gate log.
    w = Window.partitionBy(F.pmod(F.col("cnt"), F.lit(1))).orderBy(
        F.col("cnt").desc(), F.col("tok").asc()
    )
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
    # Constant-valued non-foldable partition key: bounded (<= top_n
    # rows) by the limit above — see build_vocab.
    w = Window.partitionBy(F.pmod(F.col("cnt"), F.lit(1))).orderBy(
        F.col("cnt").desc(), F.col("pair").asc()
    )
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


def word_counts(docs: DataFrame) -> DataFrame:
    """The frequency-weighted DISTINCT-word table ``(w, wcnt)`` every
    BPE operator starts from — exposed so a gate composing train +
    apply tokenizes the corpus ONCE (materialize the result and pass
    it via the operators' ``words=`` parameter) instead of paying the
    corpus scan per stage."""
    return (
        docs.select(F.explode(words_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def bpe_train(
    docs: DataFrame, n_merges: int = 4, words: DataFrame | None = None
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus (Sennrich et al.
    2016) and return the merge table ``(merge_rank, lhs, rhs, cnt)`` —
    the tokenizer-training loop itself, completing the vocab story:
    :func:`bpe_pair_counts` is one iteration's statistics, this runs
    the argmax-merge-recount cycle.

    Symbol sequences live in a separator-wrapped string (word 'abab' →
    ``'|a||b||a||b|'``: every symbol wrapped as ``|s|``, symbols never
    contain '|'), so applying merge (l, r) is ``replace(sym, '|l||r|',
    '|lr|')`` — built-in ``replace`` scans left-to-right replacing
    non-overlapping occurrences, which IS greedy BPE merge application,
    and Spark and DuckDB agree on it bit-for-bit (the oracle replays
    the identical cycle as a CTE chain). Ties in the argmax break by
    (cnt desc, lhs asc, rhs asc) — a total order, so the learned
    merges are deterministic cross-engine.

    Scale shape per round: pair counting and merging run over the
    DISTINCT-word table weighted by frequency (vocabulary-bounded, the
    classic BPE trick — corpus scale is paid once in the word count);
    the argmax is a distributed ``orderBy().limit(1)`` partial top-k;
    only the single winning pair is collected per round — driver-side
    coordination identical to the Lloyd trainer's round loop, never a
    data collect. Each round's symbol table is materialized so round
    k+1 rescans a table, not a k-deep replace chain.

    Raises if a round finds no adjacent pair (corpus exhausted —
    every word fully merged); choose ``n_merges`` below the corpus's
    merge capacity."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    if words is None:
        words = word_counts(docs)
    cur = materialize(
        words.select(
            F.expr(
                "'|' || concat_ws('||', transform(sequence(1, length(w)),"
                " i -> substring(w, i, 1))) || '|'"
            ).alias("sym"),
            "wcnt",
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, n_merges + 1):
        sy = F.split(F.expr("substring(sym, 2, length(sym) - 2)"), r"\|\|")
        pairs = (
            cur.select(sy.alias("sy"), "wcnt")
            .where(F.size("sy") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sy) - 1), i -> struct("
                        "element_at(sy, i) AS lhs,"
                        " element_at(sy, i + 1) AS rhs))"
                    )
                ).alias("p"),
                "wcnt",
            )
            .select("p.lhs", "p.rhs", "wcnt")
        )
        top = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("wcnt").cast("long").alias("cnt"))
            .orderBy(
                F.col("cnt").desc(), F.col("lhs").asc(), F.col("rhs").asc()
            )
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                f"no adjacent pair left at merge {k}; corpus supports only"
                f" {k - 1} merges"
            )
        [r] = top
        merges.append((k, r.lhs, r.rhs, r.cnt))
        # symbols are [a-z0-9]+ (words_col alphabet), safe to embed.
        # LAZY materialize: nothing reads the new table until the next
        # round's argmax (or never, on the last round), so the
        # checkpoint rides that action instead of costing its own job
        # per merge — and the lineage is still cut round-by-round
        nxt = materialize(
            cur.select(
                F.expr(
                    f"replace(sym, '|{r.lhs}||{r.rhs}|', '|{r.lhs}{r.rhs}|')"
                ).alias("sym"),
                "wcnt",
            )
        )
        cur = nxt
    from ..localrel import values_df

    # LocalRelation result frame (r14): driver-only collects
    return values_df(spark, merges, "merge_rank long, lhs string, rhs string, cnt long")


def bpe_train_sql(table: str = "documents", n_merges: int = 4) -> str:
    """DuckDB twin of :func:`bpe_train`: the identical
    count→argmax→replace cycle unrolled as a CTE chain, one
    (pairs, top-1, replaced-symbols) stage per merge."""
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_rank, lhs, rhs, cnt FROM t{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(_bpe_train_parts(table, n_merges)) + "\n" + unions
    )


def _bpe_train_parts(table: str, n_merges: int) -> list[str]:
    """The shared CTE chain of the BPE twins: word counts, initial
    wrapped symbols, then one (pairs, top-1, replaced) stage per
    merge."""
    parts = [
        f"""w0 AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wcnt
  FROM (SELECT unnest({WORDS_SQL}) AS w FROM {table}) __w
  GROUP BY w
), s0 AS (
  SELECT '|' || array_to_string(
           list_transform(generate_series(1, length(w)),
                          i -> substring(w, i, 1)), '||') || '|' AS sym,
         wcnt
  FROM w0
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f"""p{k} AS (
  SELECT sy[CAST(i AS INTEGER)] AS lhs, sy[CAST(i AS INTEGER) + 1] AS rhs,
         wcnt
  FROM (SELECT str_split(substring(sym, 2, length(sym) - 2), '||') AS sy,
               wcnt FROM s{k - 1}) __t,
       unnest(generate_series(1, len(sy) - 1)) u(i)
), t{k} AS (
  SELECT lhs, rhs, CAST(sum(wcnt) AS BIGINT) AS cnt
  FROM p{k} GROUP BY lhs, rhs
  ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1
), s{k} AS (
  SELECT replace(sym, '|' || lhs || '||' || rhs || '|',
                 '|' || lhs || rhs || '|') AS sym, wcnt
  FROM s{k - 1}, t{k}
)"""
        )
    return parts


def _merge_chain_sql(merges: list[tuple[str, str]], base: str) -> str:
    """Nest ``replace`` calls applying ``merges`` in order over the
    wrapped-symbol expression ``base``. Symbols must stay in the
    words_col alphabet ([a-z0-9]+) — validated, since they are embedded
    in generated SQL."""
    import re

    acc = base
    for lhs, rhs in merges:
        if not re.fullmatch(r"[a-z0-9]+", lhs) or not re.fullmatch(
            r"[a-z0-9]+", rhs
        ):
            raise ValueError(f"merge symbols outside [a-z0-9]+: {lhs!r},{rhs!r}")
        acc = f"replace({acc}, '|{lhs}||{rhs}|', '|{lhs}{rhs}|')"
    return acc


def bpe_subword_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    top_n: int = 50,
    words: DataFrame | None = None,
) -> DataFrame:
    """Apply a trained merge list (:func:`bpe_train` output) to segment
    the corpus into subword tokens and count them: ``(subword, cnt,
    rank)`` for the top ``top_n`` by (cnt desc, subword asc) — the
    "what vocabulary did the tokenizer actually learn" report, and the
    apply half of the BPE lifecycle (train → segment → count).

    Entirely map-side after the word count: the merge chain is ``len
    (merges)`` nested ``replace`` calls over the wrapped-symbol string
    (whole-stage codegen, no shuffle, no Python), evaluated on the
    DISTINCT-word table weighted by frequency — corpus scale is paid
    only by the initial word count."""
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    wrapped = (
        "'|' || concat_ws('||', transform(sequence(1, length(w)),"
        " i -> substring(w, i, 1))) || '|'"
    )
    chain = _merge_chain_sql(merges, wrapped)
    if words is None:
        words = word_counts(docs)
    sub = words.select(
        F.explode(
            F.split(
                F.expr(f"substring({chain}, 2, length({chain}) - 2)"),
                r"\|\|",
            )
        ).alias("subword"),
        "wcnt",
    )
    agg = sub.groupBy("subword").agg(F.sum("wcnt").cast("long").alias("cnt"))
    top = agg.orderBy(F.col("cnt").desc(), F.col("subword").asc()).limit(top_n)
    # Constant-valued non-foldable partition key: bounded (<= top_n
    # rows) by the limit above — see build_vocab.
    w = Window.partitionBy(F.pmod(F.col("cnt"), F.lit(1))).orderBy(
        F.col("cnt").desc(), F.col("subword").asc()
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def bpe_subword_counts_sql(
    table: str = "documents", n_merges: int = 4, top_n: int = 50
) -> str:
    """DuckDB twin of :func:`bpe_train` + :func:`bpe_subword_counts`
    composed: the training CTE chain's FINAL symbol table (``s{n}``)
    is already the segmented vocabulary — count its subwords."""
    ctes = "WITH " + ",\n".join(_bpe_train_parts(table, n_merges))
    return f"""{ctes}
SELECT subword, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, subword ASC) AS BIGINT)
           AS rank
FROM (
  SELECT subword, CAST(sum(wcnt) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(str_split(substring(sym, 2, length(sym) - 2), '||'))
               AS subword,
           wcnt
    FROM s{n_merges}
  ) __u
  GROUP BY subword
) __c
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


def bpe_fertility(
    docs: DataFrame, n_merges: int = 4, group_col: str = "lang"
) -> DataFrame:
    """Tokenizer fertility audit per group: train ``n_merges`` BPE
    merges on the WHOLE corpus (:func:`bpe_train`), segment every
    group's words with them, and report the integer mass balance

        ``(group, n_words, n_subwords, n_chars)``

    — subwords-per-word and chars-per-subword (the fertility /
    compression-rate pair every tokenizer report tracks, and the
    classic cross-lingual equity check: a shared vocab trained on an
    en-heavy corpus segments minority languages into more pieces) are
    left as ratios for the consumer, keeping this output exact longs.

    Plan: the trained merge list (``n_merges`` rows) is driver-side
    coordination like the Lloyd codebook; segmentation is the nested
    ``replace`` chain over the wrapped-symbol string applied to the
    DISTINCT ``(group, word)`` table — map-only whole-stage codegen,
    weighted by word frequency, so corpus scale is paid once in the
    word count and the replace work is vocabulary-bounded."""
    # ONE corpus tokenize: the per-group word table is materialized and
    # the trainer's global word counts fold from it (a vocabulary-sized
    # re-aggregate, sum over groups == the direct corpus count), so the
    # corpus text is scanned once instead of once per stage
    wl = materialize(
        docs.select(
            F.col(group_col).alias("__grp"),
            F.explode(words_col(F.col("text"))).alias("w"),
        )
        .groupBy("__grp", "w")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )
    words = wl.groupBy("w").agg(F.sum("wcnt").alias("wcnt"))
    merges_rows = bpe_train(docs, n_merges, words=words).collect()
    merges = [(r.lhs, r.rhs) for r in merges_rows]
    sym0 = (
        "'|' || concat_ws('||', transform(sequence(1, length(w)),"
        " i -> substring(w, i, 1))) || '|'"
    )
    seg = _merge_chain_sql(merges, sym0)
    nsub = F.size(
        F.split(F.expr(f"substring({seg}, 2, length({seg}) - 2)"), r"\|\|")
    ).cast("long")
    return (
        wl.withColumn("__nsub", nsub)
        .groupBy("__grp")
        .agg(
            F.sum("wcnt").cast("long").alias("n_words"),
            F.sum(F.col("wcnt") * F.col("__nsub")).cast("long").alias(
                "n_subwords"
            ),
            F.sum(F.col("wcnt") * F.length("w")).cast("long").alias("n_chars"),
        )
        .select(
            F.col("__grp").alias(group_col),
            "n_words",
            "n_subwords",
            "n_chars",
        )
    )


def bpe_fertility_sql(
    table: str = "documents", n_merges: int = 4, group_col: str = "lang"
) -> str:
    """DuckDB twin of :func:`bpe_fertility`: the shared training CTE
    chain (:func:`_bpe_train_parts`), then one per-group replace stage
    per merge — the merge values flow through the ``t{k}`` CTEs instead
    of driver-collected literals, an independent formulation of the
    same segmentation."""
    parts = _bpe_train_parts(table, n_merges)
    parts.append(
        f"""wl0 AS (
  SELECT grp, w, CAST(count(*) AS BIGINT) AS wcnt
  FROM (SELECT {group_col} AS grp, unnest({WORDS_SQL}) AS w FROM {table}) __x
  GROUP BY grp, w
), ls0 AS (
  SELECT grp, '|' || array_to_string(
           list_transform(generate_series(1, length(w)),
                          i -> substring(w, i, 1)), '||') || '|' AS sym,
         wcnt, CAST(length(w) AS BIGINT) AS wlen
  FROM wl0
)"""
    )
    for k in range(1, n_merges + 1):
        parts.append(
            f"""ls{k} AS (
  SELECT grp, replace(sym, '|' || lhs || '||' || rhs || '|',
                      '|' || lhs || rhs || '|') AS sym, wcnt, wlen
  FROM ls{k - 1}, t{k}
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT grp AS {group_col},
       CAST(sum(wcnt) AS BIGINT) AS n_words,
       CAST(sum(wcnt * len(str_split(substring(sym, 2, length(sym) - 2),
                                     '||'))) AS BIGINT) AS n_subwords,
       CAST(sum(wcnt * wlen) AS BIGINT) AS n_chars
FROM ls{n_merges}
GROUP BY grp
"""
    )
