"""Unit tests for the MAD robust-outlier operator and the BPE
pair-count tokenizer statistic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


# -- mad_outliers -------------------------------------------------------------


def test_mad_known_small_group(spark):
    from bunsen_spark.operators.stats import mad_outliers

    # values 1..5 plus a wild 100: median 3.5 -> med2 7;
    # devs |2x-7| = [5,3,1,1,3,193] -> sorted [1,1,3,3,5,193],
    # median2(dev) = 3+3 = 6 (=4*MAD, MAD=1.5); outlier iff
    # 2*d > 3*6=18 -> only d=193 (the 100).
    df = _vals(spark, [("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 5), ("a", 100)])
    [r] = mad_outliers(df, "g", "v", k_num=3, k_den=1).collect()
    assert (r.n, r.median2, r.mad2, r.n_outliers) == (6, 7, 6, 1)


def test_mad_constant_group_zero_mad(spark):
    from bunsen_spark.operators.stats import mad_outliers

    # constant group: MAD = 0, every equal value has d = 0, strict >
    # keeps them in; one differing value is an outlier at any k
    df = _vals(spark, [("c", 5)] * 9 + [("c", 6)])
    [r] = mad_outliers(df, "g", "v", k_num=1000, k_den=1).collect()
    assert (r.mad2, r.n_outliers) == (0, 1)


def test_mad_matches_python_reference(spark):
    import random
    import statistics

    from bunsen_spark.operators.stats import mad_outliers

    rng = random.Random(11)
    rows = [
        ("g%d" % (i % 3), rng.randint(-500, 500)) for i in range(301)
    ]
    got = {
        r.g: (r.n, r.median2, r.mad2, r.n_outliers)
        for r in mad_outliers(_vals(spark, rows), "g", "v", 2, 1).collect()
    }
    for g in ("g0", "g1", "g2"):
        vals = [v for k, v in rows if k == g]
        med = statistics.median(vals)
        devs = [abs(x - med) for x in vals]
        mad = statistics.median(devs)
        n_out = sum(1 for d in devs if d > 2 * mad)
        assert got[g] == (len(vals), int(2 * med), int(4 * mad), n_out)


def test_mad_null_key_group(spark):
    from bunsen_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [(None, 1), (None, 3), (None, 50), ("a", 7)], "g string, v long"
    )
    got = {
        r.g: (r.n, r.n_outliers)
        for r in mad_outliers(df, "g", "v", 1, 1).collect()
    }
    # null group survives (eqNullSafe joins): med 3, devs [2,0,47],
    # MAD 2 -> only 50 flagged
    assert got[None] == (3, 1)
    assert got["a"] == (1, 0)


def test_mad_rejects_bad_k(spark):
    from bunsen_spark.operators.stats import mad_outliers

    with pytest.raises(ValueError):
        mad_outliers(_vals(spark, [("a", 1)]), "g", "v", k_num=0)


# -- bpe_pair_counts ----------------------------------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_pairs_known_counts(spark):
    from bunsen_spark.operators.vocab import bpe_pair_counts

    # 'abab' x2 docs + 'ab': word counts {abab: 2, ab: 1};
    # abab pairs [ab, ba, ab] weighted 2 -> ab 4, ba 2; ab word -> ab +1
    got = {
        r.pair: (r.cnt, r.rank)
        for r in bpe_pair_counts(_docs(spark, ["abab", "abab", "ab"])).collect()
    }
    assert got == {"ab": (5, 1), "ba": (2, 2)}


def test_bpe_pairs_multiplicity_within_word(spark):
    from bunsen_spark.operators.vocab import bpe_pair_counts

    # 'aaa' contributes 'aa' twice (positions 1 and 2)
    got = {r.pair: r.cnt for r in bpe_pair_counts(_docs(spark, ["aaa"])).collect()}
    assert got == {"aa": 2}


def test_bpe_pairs_skip_single_char_words(spark):
    from bunsen_spark.operators.vocab import bpe_pair_counts

    got = bpe_pair_counts(_docs(spark, ["a b c xy"])).collect()
    assert {r.pair: r.cnt for r in got} == {"xy": 1}


def test_bpe_pairs_top_n_and_tie_order(spark):
    from bunsen_spark.operators.vocab import bpe_pair_counts

    # equal counts break ties by pair asc; top_n truncates after rank
    rows = bpe_pair_counts(_docs(spark, ["zz yy xx ww"]), top_n=3).collect()
    assert [(r.pair, r.cnt, r.rank) for r in sorted(rows, key=lambda r: r.rank)] == [
        ("ww", 1, 1),
        ("xx", 1, 2),
        ("yy", 1, 3),
    ]


def test_bpe_pairs_matches_python_reference(spark):
    import random
    from collections import Counter

    from bunsen_spark.operators.vocab import bpe_pair_counts

    rng = random.Random(23)
    alphabet = "abcd"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(40)
    ]
    words = Counter(w for t in texts for w in t.split())
    expect = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            expect[w[i : i + 2]] += c
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:16]
    got = {
        r.rank: (r.pair, r.cnt)
        for r in bpe_pair_counts(_docs(spark, texts), top_n=16).collect()
    }
    assert got == {i + 1: (p, c) for i, (p, c) in enumerate(ranked)}


def test_bpe_pairs_rejects_bad_top_n(spark):
    from bunsen_spark.operators.vocab import bpe_pair_counts

    with pytest.raises(ValueError):
        bpe_pair_counts(_docs(spark, ["ab"]), top_n=0)


# -- pareto_frontier ----------------------------------------------------------


def _xy(spark, rows):
    return spark.createDataFrame(rows, "id long, x long, y long")


def _py_frontier(rows):
    return sorted(
        i
        for i, x, y in rows
        if not any(
            bx >= x and by >= y and (bx > x or by > y) for _, bx, by in rows
        )
    )


def test_pareto_known_frontier(spark):
    from bunsen_spark.operators.stats import pareto_frontier

    rows = [(1, 1, 5), (2, 3, 3), (3, 5, 1), (4, 2, 2), (5, 3, 2)]
    got = sorted(
        r.id for r in pareto_frontier(_xy(spark, rows), "x", "y").collect()
    )
    assert got == [1, 2, 3]  # (2,2) and (3,2) dominated


def test_pareto_duplicates_all_kept(spark):
    from bunsen_spark.operators.stats import pareto_frontier

    rows = [(1, 4, 4), (2, 4, 4), (3, 1, 1)]
    got = sorted(
        r.id for r in pareto_frontier(_xy(spark, rows), "x", "y").collect()
    )
    assert got == [1, 2]  # equal points don't dominate each other


def test_pareto_same_x_lower_y_dominated(spark):
    from bunsen_spark.operators.stats import pareto_frontier

    rows = [(1, 4, 4), (2, 4, 3), (3, 5, 3)]
    got = sorted(
        r.id for r in pareto_frontier(_xy(spark, rows), "x", "y").collect()
    )
    # (4,3) beaten by (4,4); (5,3) is frontier (nothing >= on both)
    assert got == [1, 3]


def test_pareto_equal_y_at_larger_x_dominates(spark):
    from bunsen_spark.operators.stats import pareto_frontier

    rows = [(1, 4, 7), (2, 6, 7)]
    got = sorted(
        r.id for r in pareto_frontier(_xy(spark, rows), "x", "y").collect()
    )
    assert got == [2]  # strict x, equal y -> 1 dominated


def test_pareto_single_row(spark):
    from bunsen_spark.operators.stats import pareto_frontier

    got = pareto_frontier(_xy(spark, [(9, 0, 0)]), "x", "y").collect()
    assert [r.id for r in got] == [9]


@pytest.mark.parametrize("seed", [3, 17])
def test_pareto_matches_python_quadratic(spark, seed):
    import random

    from bunsen_spark.operators.stats import pareto_frontier

    rng = random.Random(seed)
    rows = [
        (i, rng.randint(0, 30), rng.randint(0, 30)) for i in range(200)
    ]
    got = sorted(
        r.id for r in pareto_frontier(_xy(spark, rows), "x", "y").collect()
    )
    assert got == _py_frontier(rows)


# -- bpe_train ----------------------------------------------------------------


def _py_bpe(texts, n_merges):
    """Reference BPE trainer: greedy left-to-right merge application,
    argmax by (count desc, lhs asc, rhs asc)."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split())
    syms = {w: list(w) for w in words}
    merges = []
    for k in range(1, n_merges + 1):
        pairs = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            raise ValueError("exhausted")
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((k, l, r, cnt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_train_known_merges(spark):
    from bunsen_spark.operators.vocab import bpe_train

    # 'low lower lowest' x repeats: first merge must be ('l','o')
    texts = ["low low lower lowest", "low lower"]
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.cnt)
        for r in sorted(
            bpe_train(_docs(spark, texts), n_merges=3).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    assert got == _py_bpe(texts, 3)
    assert got[0][1:3] == ("l", "o")


def test_bpe_train_greedy_overlap(spark):
    from bunsen_spark.operators.vocab import bpe_train

    # 'aaaa': pairs (a,a) x3 -> merge 1 = (a,a); greedy application
    # gives [aa, aa] (NOT overlapping), so merge 2 = (aa, aa) cnt 1
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.cnt)
        for r in sorted(
            bpe_train(_docs(spark, ["aaaa"]), n_merges=2).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_bpe_train_matches_python_reference(spark):
    import random

    from bunsen_spark.operators.vocab import bpe_train

    rng = random.Random(41)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(2, 10))
        )
        for _ in range(30)
    ]
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.cnt)
        for r in sorted(
            bpe_train(_docs(spark, texts), n_merges=5).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    assert got == _py_bpe(texts, 5)


def test_bpe_train_exhaustion_raises(spark):
    from bunsen_spark.operators.vocab import bpe_train

    # single 2-char word supports exactly 1 merge
    with pytest.raises(ValueError):
        bpe_train(_docs(spark, ["ab"]), n_merges=2)


def test_bpe_train_rejects_bad_n(spark):
    from bunsen_spark.operators.vocab import bpe_train

    with pytest.raises(ValueError):
        bpe_train(_docs(spark, ["ab"]), n_merges=0)


# -- bpe_subword_counts -------------------------------------------------------


def _py_segment_counts(texts, n_merges):
    from collections import Counter

    merges = _py_bpe(texts, n_merges)
    words = Counter(w for t in texts for w in t.split())
    counts = Counter()
    for w, c in words.items():
        s = list(w)
        for _, l, r, _c in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        for sub in s:
            counts[sub] += c
    return counts


def test_bpe_subword_counts_matches_reference(spark):
    import random

    from bunsen_spark.operators.vocab import bpe_subword_counts, bpe_train

    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 5)))
            for _ in range(rng.randint(2, 10))
        )
        for _ in range(30)
    ]
    docs = _docs(spark, texts)
    merges = [
        (r.lhs, r.rhs)
        for r in sorted(
            bpe_train(docs, n_merges=4).collect(), key=lambda r: r.merge_rank
        )
    ]
    got = {
        r.subword: (r.cnt, r.rank)
        for r in bpe_subword_counts(docs, merges, top_n=10).collect()
    }
    expect = _py_segment_counts(texts, 4)
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == {s: (c, i + 1) for i, (s, c) in enumerate(ranked)}


def test_bpe_subword_counts_rejects_bad_symbols(spark):
    from bunsen_spark.operators.vocab import bpe_subword_counts

    with pytest.raises(ValueError):
        bpe_subword_counts(_docs(spark, ["ab"]), [("a'", "b")])


# -- coverage_select ----------------------------------------------------------


def _py_coverage(texts, k, n=3):
    """Reference greedy max-coverage on word n-gram shingles (string
    shingles — collision-free baseline for small alphabets)."""

    def sh(t):
        ws = t.split()
        if len(ws) < n:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    covered, out = set(), []
    for rank in range(1, k + 1):
        gains = {
            d: len(s - covered) for d, s in sets.items() if len(s - covered)
        }
        if not gains:
            raise ValueError("exhausted")
        d = min(gains, key=lambda d: (-gains[d], d))
        out.append((rank, d, gains[d]))
        covered |= sets[d]
    return out


def test_coverage_select_known(spark):
    from bunsen_spark.operators.sampling import coverage_select

    texts = [
        "a b c d e f",        # 4 shingles
        "a b c",               # 1 shingle, subset of doc 0
        "x y z w",             # 2 new shingles
        "a b c d",             # 2 shingles, subset of doc 0
    ]
    got = [
        (r.sel_rank, r.doc_id, r.gain)
        for r in sorted(
            coverage_select(_docs(spark, texts), k=2).collect(),
            key=lambda r: r.sel_rank,
        )
    ]
    assert got == _py_coverage(texts, 2)
    assert got[0][1] == 0 and got[1][1] == 2  # widest doc, then the x-y-z one


def test_coverage_select_matches_python(spark):
    import random

    from bunsen_spark.operators.sampling import coverage_select

    rng = random.Random(91)
    texts = [
        " ".join(rng.choice("abcdefgh") for _ in range(rng.randint(3, 20)))
        for _ in range(60)
    ]
    got = [
        (r.sel_rank, r.doc_id, r.gain)
        for r in sorted(
            coverage_select(_docs(spark, texts), k=6).collect(),
            key=lambda r: r.sel_rank,
        )
    ]
    assert got == _py_coverage(texts, 6)


def test_coverage_select_exhaustion_raises(spark):
    from bunsen_spark.operators.sampling import coverage_select

    with pytest.raises(ValueError):
        coverage_select(_docs(spark, ["a b c", "a b c"]), k=2)


def test_coverage_select_rejects_bad_k(spark):
    from bunsen_spark.operators.sampling import coverage_select

    with pytest.raises(ValueError):
        coverage_select(_docs(spark, ["a b c"]), k=0)


# -- histogram_drift ----------------------------------------------------------


def test_histogram_drift_known_bins(spark):
    from bunsen_spark.operators.drift import histogram_drift

    # values 0..9, A = evens. 5 bins over [0, 10): width 2 -> each bin
    # holds {2k, 2k+1}: cnt_a = cnt_b = 1 everywhere, Na = Nb = 5 ->
    # gap_num 0 in every bin (identical distributions)
    df = spark.createDataFrame([(v,) for v in range(10)], "v long")
    rows = histogram_drift(df, "v", F.col("v") % 2 == 0, n_bins=5).collect()
    got = {r.bin: (r.lo, r.cnt_a, r.cnt_b, r.gap_num) for r in rows}
    assert got == {b: (2 * b, 1, 1, 0) for b in range(5)}


def test_histogram_drift_disjoint_ranges(spark):
    from bunsen_spark.operators.drift import histogram_drift

    # A occupies [0,4], B occupies [5,9]: total variation = 1 ->
    # sum(gap_num) == 2*Na*Nb
    df = spark.createDataFrame(
        [(v, v < 5) for v in range(10)], "v long, is_a boolean"
    )
    rows = histogram_drift(df, "v", F.col("is_a"), n_bins=2).collect()
    na = nb = 5
    assert sum(r.gap_num for r in rows) == 2 * na * nb
    got = {r.bin: (r.cnt_a, r.cnt_b) for r in rows}
    assert got == {0: (5, 0), 1: (0, 5)}


def test_histogram_drift_matches_python(spark):
    import random

    from bunsen_spark.operators.drift import histogram_drift

    rng = random.Random(13)
    rows = [
        (rng.randint(-50, 200), rng.random() < 0.4) for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "v long, is_a boolean")
    n_bins = 8
    mn, mx = min(v for v, _ in rows), max(v for v, _ in rows)
    width = mx - mn + 1
    expect = {}
    for v, is_a in rows:
        b = min(n_bins - 1, (v - mn) * n_bins // width)
        ca, cb = expect.get(b, (0, 0))
        expect[b] = (ca + (1 if is_a else 0), cb + (0 if is_a else 1))
    na = sum(a for a, _ in expect.values())
    nb = sum(b for _, b in expect.values())
    got = {
        r.bin: (r.lo, r.cnt_a, r.cnt_b, r.gap_num)
        for r in histogram_drift(df, "v", F.col("is_a"), n_bins=n_bins).collect()
    }
    assert got == {
        b: (mn + b * width // n_bins, ca, cb, abs(ca * nb - cb * na))
        for b, (ca, cb) in expect.items()
    }


def test_histogram_drift_rejects_bad_bins(spark):
    from bunsen_spark.operators.drift import histogram_drift

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        histogram_drift(df, "v", F.lit(True), n_bins=0)


# -- importance_score (DSIR-style) -------------------------------------------


def _imp_py(rows, n_buckets):
    """Pure-python reference for importance_score(portable=True)."""
    import hashlib
    import re

    M = 2147483647

    def bucket(bg):
        h = int(hashlib.md5(bg.encode()).hexdigest()[:13], 16) % M
        return h % n_buckets

    toks = []  # (doc_id, is_target, bucket)
    for doc_id, text, is_t in rows:
        ws = re.findall("[a-z0-9]+", text.lower())
        for a, b in zip(ws, ws[1:]):
            toks.append((doc_id, is_t, bucket(f"{a} {b}")))
    cnt = {}
    for _, t, bk in toks:
        ct, cb = cnt.get(bk, (0, 0))
        cnt[bk] = (ct + (1 if t else 0), cb + (0 if t else 1))
    nt = sum(a for a, _ in cnt.values())
    nb = sum(b for _, b in cnt.values())
    out = {doc_id: (0, 0) for doc_id, _, _ in rows}
    for doc_id, _, bk in toks:
        ct, cb = cnt[bk]
        n, s = out[doc_id]
        out[doc_id] = (n + 1, s + ct * nb - cb * nt)
    return out


def test_importance_score_matches_python(spark):
    import random

    from bunsen_spark.operators.text_analysis import importance_score

    rng = random.Random(7)
    vocab_a = ["alpha", "beta", "gamma", "delta"]
    vocab_b = ["omega", "sigma", "beta", "tau"]
    rows = []
    for i in range(60):
        is_t = i % 3 == 0
        pool = vocab_a if is_t else vocab_b
        text = " ".join(rng.choice(pool) for _ in range(rng.randint(0, 12)))
        rows.append((i, text, is_t))
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r.doc_id: (r.n_bigrams, r.score_num)
        for r in importance_score(
            df, F.col("is_t"), n_buckets=32, portable=True
        ).collect()
    }
    assert got == _imp_py(rows, 32)
    assert len(got) == 60  # every doc present, including <2-token ones


def test_importance_score_direction(spark):
    from bunsen_spark.operators.text_analysis import importance_score

    # target docs repeat "x y", background repeat "p q": a target doc's
    # buckets are exclusively target-heavy -> strictly positive score
    rows = [(i, "x y x y x y", True) for i in range(5)] + [
        (i + 5, "p q p q p q", False) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r.doc_id: r.score_num
        for r in importance_score(df, F.col("is_t"), n_buckets=64).collect()
    }
    assert all(got[i] > 0 for i in range(5))
    assert all(got[i + 5] < 0 for i in range(5))


def test_importance_score_rejects_bad_buckets(spark):
    from bunsen_spark.operators.text_analysis import importance_score

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        importance_score(df, F.lit(True), n_buckets=0)


# -- mmr_select ---------------------------------------------------------------


def _mmr_py(vecs, query_id, k, a, b):
    q = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}

    def dot(u, v):
        return sum(x * y for x, y in zip(u, v))

    cands = {i: dot(q[i], q[query_id]) for i in q if i != query_id}
    sel, out = [], []
    for rank in range(1, k + 1):
        best = None
        for i, rel in cands.items():
            if i in sel:
                continue
            ms = max((dot(q[i], q[j]) for j in sel), default=None)
            score = a * rel if ms is None else a * rel - (b - a) * ms
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, score)
        sel.append(best[1])
        out.append((rank, best[1], best[2]))
    return out


def test_mmr_select_matches_python(spark):
    import random

    from bunsen_spark.operators.similarity import mmr_select

    rng = random.Random(11)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    # quantize from the FLOAT-rounded values, as the operator sees them
    import struct

    f32 = {
        i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        for i, v in vecs.items()
    }
    got = [
        (r.sel_rank, r.vec_id, r.score_num)
        for r in mmr_select(df, query_id=0, k=5, lam=(7, 10)).collect()
    ]
    assert sorted(got) == _mmr_py(f32, 0, 5, 7, 10)


def test_mmr_prefers_diverse_over_redundant(spark):
    from bunsen_spark.operators.similarity import mmr_select

    # query along +x; vec 1 and 2 both near +x (2 slightly closer),
    # vec 3 off-axis but still relevant. Pure relevance picks {2, 1};
    # with lambda=1/4 (heavy redundancy penalty: score = rel - 3*maxsim)
    # MMR must pick the diverse 3 second:
    #   cand1: 940000 - 3*896000 = -1748000
    #   cand3: 500000 - 3*518000 = -1054000  -> 3 wins
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.94, 0.06]),
        (2, [0.95, 0.05]),
        (3, [0.5, 0.86]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [r.vec_id for r in mmr_select(df, 0, k=2, lam=(1, 4)).collect()]
    assert got == [2, 3]


def test_mmr_rejects_bad_args(spark):
    from bunsen_spark.operators.similarity import mmr_select

    df = spark.createDataFrame(
        [(0, [1.0]), (1, [0.5])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        mmr_select(df, 0, k=0)
    with pytest.raises(ValueError):
        mmr_select(df, 0, k=1, lam=(3, 2))
    with pytest.raises(ValueError):
        mmr_select(df, 0, k=5)  # only 1 candidate


# -- knn_label_vote -----------------------------------------------------------


def test_knn_label_vote_separable_clusters(spark):
    from bunsen_spark.operators.similarity import knn_label_vote

    # two tight clusters around +x and +y: every query's neighbors
    # share its label -> LOO accuracy 1.0, votes == k
    rows = []
    for i in range(8):
        rows.append((i, [1.0, 0.01 * i], 0))
        rows.append((8 + i, [0.01 * i, 1.0], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = knn_label_vote(df, k=3, num_queries=16).collect()
    assert len(got) == 16
    assert all(r.correct == 1 and r.votes == 3 for r in got)
    assert all(r.pred_label == r.true_label for r in got)


def test_knn_label_vote_tie_breaks_small_label(spark):
    from bunsen_spark.operators.similarity import knn_label_vote

    # query 0 at +x; k=2 neighbors are one label-5 and one label-3 at
    # equal vote count -> tie must resolve to the SMALLER label 3
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [0.99, 0.1], 5),
        (2, [0.99, -0.1], 3),
        (3, [-1.0, 0.0], 7),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    [r] = knn_label_vote(df, k=2, num_queries=1).collect()
    assert (r.true_label, r.pred_label, r.votes, r.correct) == (9, 3, 1, 0)


# -- jl_topk ------------------------------------------------------------------


def test_jl_topk_recall_on_separable_clusters(spark):
    import random

    from bunsen_spark.operators.similarity import EMBED_DIM, jl_topk

    # two well-separated clusters: JL projection preserves the gap, so
    # every query's projected top-3 stays inside its own cluster
    rng = random.Random(5)

    def vec(center):
        return [c + rng.uniform(-0.05, 0.05) for c in center]

    ca = [1.0] * (EMBED_DIM // 2) + [0.0] * (EMBED_DIM // 2)
    cb = [0.0] * (EMBED_DIM // 2) + [1.0] * (EMBED_DIM // 2)
    rows = [(i, vec(ca)) for i in range(10)] + [
        (10 + i, vec(cb)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = jl_topk(df, k=3, num_queries=20, out_dim=8).collect()
    assert len(got) == 60
    for r in got:
        assert (r.query_id < 10) == (r.neighbor_id < 10)


def test_jl_sign_matrix_deterministic_and_balanced(spark):
    from bunsen_spark.operators.similarity import EMBED_DIM, _jl_matrix

    m1 = _jl_matrix(8, EMBED_DIM)
    m2 = _jl_matrix(8, EMBED_DIM)
    assert m1 == m2
    flat = [s for row in m1 for s in row]
    assert set(flat) == {-1, 1}
    # md5 parity should be roughly balanced (not constant/degenerate)
    assert 0.3 < flat.count(1) / len(flat) < 0.7
