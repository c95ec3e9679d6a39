"""repetition_stats (operators.text_analysis) — hand-computed values
on crafted documents; the corpus-scale value gate is ``text_repetition``
in CORRECTNESS (DuckDB twin)."""

from __future__ import annotations

from bunsen_spark.operators.text_analysis import repetition_stats


def test_repetition_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # heavy word + bigram repetition
            (2, "w x y z"),          # no repetition
            (3, "spam spam spam spam"),  # degenerate
            (4, ""),                 # empty text
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}

    r = out[1]  # words [a,a,a,b]; bigrams [a a, a a, a b]
    assert r["n_words"] == 4
    assert r["dup_word_frac"] == 0.5           # (4-2)/4
    assert r["dup_bigram_frac"] == 0.333333    # (3-2)/3
    assert r["top_word_frac"] == 0.75          # 3/4

    r = out[2]
    assert r["dup_word_frac"] == 0.0
    assert r["dup_bigram_frac"] == 0.0
    assert r["top_word_frac"] == 0.25

    r = out[3]  # all same word: bigrams [spam spam] * 3 -> (3-1)/3
    assert r["dup_word_frac"] == 0.75
    assert r["dup_bigram_frac"] == 0.666667
    assert r["top_word_frac"] == 1.0

    r = out[4]  # empty: everything guarded to 0
    assert r["n_words"] == 0
    assert r["dup_word_frac"] == 0.0 and r["top_word_frac"] == 0.0
