"""Per-group quantile filtering and cluster-level keep-best selection."""

from __future__ import annotations

import pytest


def test_quantile_filter_exact_keeps_top_share(spark):
    """q=0.5 over distinct scores keeps exactly the top half per group
    and returns the input columns unchanged."""
    from bunsen_spark.operators.sampling import quantile_filter

    rows = [(i, "en", float(i)) for i in range(1, 11)] + [
        (100 + i, "de", float(i)) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    out = quantile_filter(df, "lang", "s", q=0.5).collect()
    assert sorted(r.doc_id for r in out if r.lang == "en") == [6, 7, 8, 9, 10]
    assert sorted(r.doc_id for r in out if r.lang == "de") == [103, 104]
    assert set(out[0].asDict()) == {"doc_id", "lang", "s"}


def test_quantile_filter_tie_cohort_moves_atomically(spark):
    """All rows sharing the boundary score have the same cume_dist, so
    they are kept or dropped together — never split by doc_id."""
    from bunsen_spark.operators.sampling import quantile_filter

    # four rows at score 1.0 (cume_dist 0.8), one at 2.0 (1.0)
    rows = [(i, "en", 1.0) for i in range(4)] + [(9, "en", 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    kept_60 = {r.doc_id for r in quantile_filter(df, "lang", "s", 0.6).collect()}
    assert kept_60 == {0, 1, 2, 3, 9}  # 0.8 > 0.6: whole tie cohort survives
    kept_80 = {r.doc_id for r in quantile_filter(df, "lang", "s", 0.8).collect()}
    assert kept_80 == {9}  # 0.8 > 0.8 is false: whole cohort drops


def test_quantile_filter_approx_within_rank_error(spark):
    """The sketch-threshold scale path keeps roughly the top (1-q)
    share; with distinct scores the kept set is a suffix of the sorted
    order (score > threshold never skips a better row)."""
    from bunsen_spark.operators.sampling import quantile_filter

    rows = [(i, "en", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
    kept = sorted(r.doc_id for r in quantile_filter(df, "lang", "s", 0.7, exact=False).collect())
    assert kept == list(range(kept[0], 200))  # contiguous top suffix
    assert abs(len(kept) - 60) <= 10  # ~top 30% within sketch error


def test_quantile_filter_rejects_bad_q(spark):
    from bunsen_spark.operators.sampling import quantile_filter

    df = spark.createDataFrame([(1, "en", 1.0)], "doc_id long, lang string, s double")
    with pytest.raises(ValueError):
        quantile_filter(df, "lang", "s", 1.0)
    with pytest.raises(ValueError):
        quantile_filter(df, "lang", "s", -0.1)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a_id long, b_id long")


def _scores(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, quality_score double")


def test_cluster_keep_best_picks_max_score(spark):
    """Two clusters: {1,2,3} and {7,8}. The keeper is the max-score
    member regardless of id; best_score and n_members report per
    cluster."""
    from bunsen_spark.operators.dedup import cluster_keep_best

    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 8)])
    scores = _scores(
        spark, [(1, 0.2), (2, 0.9), (3, 0.5), (7, 0.4), (8, 0.1)]
    )
    out = {r.cluster_id: r for r in cluster_keep_best(pairs, scores).collect()}
    assert set(out) == {1, 7}
    assert (out[1].keep_id, out[1].best_score, out[1].n_members) == (2, 0.9, 3)
    assert (out[7].keep_id, out[7].best_score, out[7].n_members) == (7, 0.4, 2)


def test_cluster_keep_best_tie_breaks_min_id(spark):
    from bunsen_spark.operators.dedup import cluster_keep_best

    pairs = _pairs(spark, [(5, 6), (6, 4)])
    scores = _scores(spark, [(4, 0.7), (5, 0.7), (6, 0.3)])
    (row,) = cluster_keep_best(pairs, scores).collect()
    assert (row.cluster_id, row.keep_id, row.n_members) == (4, 4, 3)


def test_near_dup_filter_best_drops_losers_keeps_singletons(spark):
    """Filtering form: cluster losers go, the best member and all
    unpaired docs stay, columns untouched."""
    from bunsen_spark.operators.dedup import near_dup_filter_best

    docs = spark.createDataFrame(
        [(1, "en", 0.2), (2, "en", 0.9), (3, "en", 0.5), (9, "de", 0.1)],
        "doc_id long, lang string, quality_score double",
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    out = near_dup_filter_best(docs, pairs).collect()
    assert sorted(r.doc_id for r in out) == [2, 9]
    assert set(out[0].asDict()) == {"doc_id", "lang", "quality_score"}


def test_near_dup_filter_best_agrees_with_cluster_keep_best(spark):
    """The kept ids are exactly the keep_ids cluster_keep_best reports
    plus the unpaired docs."""
    from bunsen_spark.operators.dedup import cluster_keep_best, near_dup_filter_best

    docs = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i in range(12)],
        "doc_id long, quality_score double",
    )
    pairs = _pairs(spark, [(0, 1), (1, 2), (4, 5), (7, 8), (8, 9), (9, 10)])
    kept = {r.doc_id for r in near_dup_filter_best(docs, pairs).collect()}
    keep_ids = {
        r.keep_id
        for r in cluster_keep_best(pairs, docs).collect()
    }
    paired = {0, 1, 2, 4, 5, 7, 8, 9, 10}
    assert kept == keep_ids | (set(range(12)) - paired)


def test_cluster_keep_best_matches_duckdb_twin(spark):
    """Operator vs its SQL twin on a corpus with real near-dup text —
    the full composition (minhash pairs → components → argmax)."""
    import duckdb

    from bunsen_spark.operators.dedup import (
        cluster_keep_best,
        cluster_keep_best_sql,
        minhash_lsh_pairs,
        minhash_lsh_pairs_sql,
    )
    from bunsen_spark.operators.text_analysis import quality_score, quality_score_sql

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest tonight"
    )
    rows = [
        (1, base),
        (2, base + " extra"),
        (3, base.replace("quick", "swift")),
        (4, "completely different text about spark query engines and shuffles"),
        (5, "completely different text about spark query engines and shuffles ok"),
        (6, "a singleton document that matches nothing else at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.cluster_id, r.keep_id, r.best_score, r.n_members)
        for r in cluster_keep_best(
            minhash_lsh_pairs(docs, portable=True), quality_score(docs)
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(
        tuple(r)
        for r in con.execute(
            cluster_keep_best_sql(minhash_lsh_pairs_sql(), quality_score_sql("documents"))
        ).fetchall()
    )
    assert got == want and len(got) >= 2
