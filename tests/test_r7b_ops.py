"""Late round-7 operators vs pure-Python references: water-filling
budget allocation (randomized sweeps including the all-capped /
none-capped edges), n-gram novelty, and the BPE fertility mass
balance."""

from __future__ import annotations

import random

import pytest


def _py_waterfill(avail: dict[str, int], budget: int) -> dict[str, int]:
    """Reference: literal iterative water-filling — repeatedly give
    every unfinished group an equal share of what remains, capping
    groups at availability, until no group caps; then distribute the
    final equal shares (+1 to the first ``rem`` by name). Independent
    of the prefix-scan formulation under test."""
    alloc = {g: 0 for g in avail}
    active = set(avail)
    remaining = budget
    while True:
        if not active or remaining <= 0:
            break
        share = remaining // len(active)
        capped = {g for g in active if avail[g] <= share}
        if not capped:
            base = remaining // len(active)
            rem = remaining % len(active)
            for i, g in enumerate(sorted(active)):
                alloc[g] = base + (1 if i < rem else 0)
            return alloc
        for g in capped:
            alloc[g] = avail[g]
            remaining -= avail[g]
        active -= capped
    return alloc


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_waterfill_random_matches_reference(spark, seed):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.sampling import waterfill_allocation

    rng = random.Random(seed)
    n = rng.randint(1, 12)
    avail = {f"g{i:02d}": rng.randint(0, 500) for i in range(n)}
    total = sum(avail.values())
    for budget in (0, total // 3, total, total * 2 + 1):
        df = spark.createDataFrame(
            [(g, a) for g, a in avail.items()], "grp string, avail long"
        )
        got = {
            r.grp: r.allocated
            for r in waterfill_allocation(
                df, "grp", "avail", budget
            ).collect()
        }
        want = _py_waterfill(avail, budget)
        assert got == want, f"budget={budget}"
        # exact mass conservation: allocations sum to min(budget, total)
        assert sum(got.values()) == min(budget, total)
        assert all(0 <= got[g] <= avail[g] for g in avail)


def test_waterfill_equal_availability_splits_evenly(spark):
    from bunsen_spark.operators.sampling import waterfill_allocation

    df = spark.createDataFrame(
        [(f"g{i}", 100) for i in range(4)], "grp string, avail long"
    )
    got = {
        r.grp: r.allocated
        for r in waterfill_allocation(df, "grp", "avail", 203).collect()
    }
    # 203 = 4*50 + 3: first three groups by name get 51
    assert got == {"g0": 51, "g1": 51, "g2": 51, "g3": 50}


def _py_novelty(texts: dict[int, str], n: int):
    def shingles(t: str) -> set[str]:
        import re

        ws = re.findall(r"[a-z0-9]+", t.lower())
        if len(ws) <= n:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    first: dict[str, int] = {}
    for did in sorted(texts):
        for g in shingles(texts[did]):
            first.setdefault(g, did)
    return {
        did: (
            len(shingles(t)),
            sum(1 for g in shingles(t) if first[g] == did),
        )
        for did, t in texts.items()
    }


@pytest.mark.parametrize("seed", [2, 17])
def test_ngram_novelty_random_matches_reference(spark, seed):
    from bunsen_spark.operators.text_analysis import ngram_novelty

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for i in range(20)
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.total_grams, r.novel_grams)
        for r in ngram_novelty(df, n=3).collect()
    }
    assert got == _py_novelty(texts, 3)
    # corpus-wide: novel grams partition the distinct-gram universe
    all_grams = set()
    for t in texts.values():
        import re

        ws = re.findall(r"[a-z0-9]+", t.lower())
        if len(ws) <= 3:
            all_grams.add(" ".join(ws))
        else:
            all_grams.update(
                " ".join(ws[i : i + 3]) for i in range(len(ws) - 3 + 1)
            )
    assert sum(v[1] for v in got.values()) == len(all_grams)


def test_bpe_fertility_mass_balance(spark):
    """Fertility invariants on a tiny corpus: n_chars is conserved by
    segmentation (merges never drop characters), n_subwords <= n_chars,
    n_subwords shrinks monotonically with more merges, and the groups
    partition the corpus word mass."""
    from pyspark.sql import functions as F

    from bunsen_spark.operators.vocab import bpe_fertility

    rows = [
        (1, "aaab aaab abab", "x"),
        (2, "aaab cd cd cd", "x"),
        (3, "abab abab aaab cd", "y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out1 = {r.lang: r for r in bpe_fertility(df, 1, "lang").collect()}
    out3 = {r.lang: r for r in bpe_fertility(df, 3, "lang").collect()}
    total_words = sum(len(t.split()) for _, t, _ in rows)
    assert sum(r.n_words for r in out1.values()) == total_words
    for lang in ("x", "y"):
        a, b = out1[lang], out3[lang]
        assert a.n_chars == b.n_chars  # segmentation conserves chars
        assert b.n_subwords <= a.n_subwords <= a.n_chars
        assert a.n_words == b.n_words
    # with zero un-merged symbols impossible: every subword >= 1 char,
    # every word >= 1 subword
    assert all(r.n_subwords >= r.n_words for r in out3.values())


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
    return num / den


@pytest.mark.parametrize("seed", [5])
def test_hard_negative_mining_matches_reference(spark, seed):
    from bunsen_spark.operators.similarity import hard_negative_mining

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], rng.randint(0, 2))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    k, nq = 6, 10
    got = {
        r.query_id: (r.true_label, r.neg_id, r.neg_label, r.neg_rank)
        for r in hard_negative_mining(df, k=k, num_queries=nq).collect()
    }
    # reference: float32 storage then exact replay
    import struct as _struct

    vecs = {
        i: [_struct.unpack("f", _struct.pack("f", x))[0] for x in v]
        for i, v, _ in rows
    }
    labels = {i: l for i, _, l in rows}
    want = {}
    for q in range(nq):
        ranked = sorted(
            (i for i in vecs if i != q),
            key=lambda i: (-_cos(vecs[q], vecs[i]), i),
        )[:k]
        for rank, i in enumerate(ranked, start=1):
            if labels[i] != labels[q]:
                want[q] = (labels[q], i, labels[i], rank)
                break
    assert got == want


def test_cluster_label_purity_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from bunsen_spark.queries import load
    from bunsen_spark.operators.similarity import cluster_label_purity

    emb = load(spark, sf_dir, "embeddings")
    out = cluster_label_purity(emb).collect()
    n_vecs = emb.count()
    assert sum(r.n_members for r in out) == n_vecs  # partition of corpus
    for r in out:
        assert 1 <= r.majority_votes <= r.n_members
    labels = {r.label for r in emb.select("label").distinct().collect()}
    assert all(r.majority_label in labels for r in out)


def test_rrf_fuse_matches_reference(spark):
    from bunsen_spark.operators.retrieval import rrf_fuse, _rrf_lcm

    r1 = [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1), (1, 21, 2)]
    r2 = [(0, 11, 1), (0, 13, 2), (0, 10, 3), (1, 21, 1), (1, 22, 2)]
    mk = lambda rows: spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank long"
    )
    got = {
        (r.query_id, r.neighbor_id): (r.rrf_score, r.rrf_rank)
        for r in rrf_fuse([mk(r1), mk(r2)], k_out=3, k_in=3, c=60).collect()
    }
    L = _rrf_lcm(60, 3)
    import collections

    score = collections.Counter()
    for q, d, rank in r1 + r2:
        score[(q, d)] += L // (60 + rank)
    want = {}
    for q in (0, 1):
        ranked = sorted(
            ((d, s) for (qq, d), s in score.items() if qq == q),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        for i, (d, s) in enumerate(ranked, 1):
            want[(q, d)] = (s, i)
    assert got == want
    # doc 11 (ranks 2+1 across runs) out-fuses doc 10 (ranks 1+3):
    # 1/61+1/62 > 1/61+1/63 — and both beat any single-run doc
    assert got[(0, 11)][1] == 1 and got[(0, 10)][1] == 2


def test_pmi_term_pairs_perfect_collocation(spark):
    from bunsen_spark.operators.text_analysis import pmi_term_pairs

    # x and y always co-occur (4 docs of 8); fillers co-occur randomly
    rows = [
        (1, "x y a"), (2, "x y b"), (3, "x y c"), (4, "x y a b"),
        (5, "a b"), (6, "b c"), (7, "a c"), (8, "a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_term_pairs(df, top_v=10, top_n=5).collect()
    top = out[0]
    assert (top.w1, top.w2) == ("x", "y")
    # lift = 8*4/(4*4) = 2.0 -> 2000 milli
    assert top.lift_milli == 2000 and top.pair_docs == 4
    assert [r.rank for r in out] == list(range(1, len(out) + 1))


def test_padding_waste_stats_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from bunsen_spark.queries import load
    from bunsen_spark.operators.packing import padding_waste_stats

    docs = load(spark, sf_dir, "documents")
    out = padding_waste_stats(docs, 32).collect()
    assert sum(r.n_docs for r in out) == docs.count()
    gmax = max(r.max_len for r in out)
    for r in out:
        assert r.bucket * 32 <= r.max_len < (r.bucket + 1) * 32
        assert 0 <= r.pad_in_bucket <= r.pad_to_global
        assert r.pad_to_global == r.n_docs * gmax - r.sum_tokens
    # bucketing strictly helps on a multi-bucket corpus
    if len(out) > 1:
        assert sum(r.pad_in_bucket for r in out) < sum(
            r.pad_to_global for r in out
        )


def test_cluster_safe_split_no_cluster_spans_splits(spark):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.sampling import (
        cluster_safe_split,
        split_assign,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # chain clusters {0..4}, {10,11}, rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)],
        "a_id long, b_id long",
    )
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r.split: r for r in cluster_safe_split(docs, pairs, splits).collect()}
    assert sum(r.n_docs for r in out.values()) == 200
    # clusters: 200 - 4 - 1 merged away
    assert sum(r.n_clusters for r in out.values()) == 195
    # invariant: recompute splits from cluster reps — every member of
    # {0..4} shares doc 0's split, {10,11} shares doc 10's
    rep_split = {
        r.doc_id: r.split
        for r in split_assign(docs, "doc_id", splits).collect()
    }
    # moved = members whose own-hash split differs from their root's
    # (cluster members take the root's split by construction)
    expected_moved = sum(
        1
        for members, root in (((0, 1, 2, 3, 4), 0), ((10, 11), 10))
        for m in members
        if rep_split[m] != rep_split[root]
    )
    assert sum(r.n_moved for r in out.values()) == expected_moved


def test_novelty_against_state_batch_split_associative(spark):
    """Scoring semantics + state-advance associativity: grams, once in
    any earlier batch's state, stop being novel; the final union state
    is identical for any batch split."""
    from pyspark.sql import functions as F

    from bunsen_spark.operators.text_analysis import (
        gram_state,
        novelty_against_state,
    )

    texts = {
        1: "a b c d",
        2: "a b c e",
        3: "x y z w",
        4: "a b c d",  # exact repeat of 1
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    b1 = df.where(F.col("doc_id") <= 2)
    b2 = df.where(F.col("doc_id") > 2)
    st1 = gram_state(b1, n=3)
    out = {
        r.doc_id: (r.total_grams, r.novel_grams)
        for r in novelty_against_state(b2, st1, n=3).collect()
    }
    # doc 3 all-new (2 grams: 'x y z','y z w'); doc 4 repeats doc 1
    assert out == {3: (2, 2), 4: (2, 0)}
    # associativity: state(b1) U state(b2) == state(all)
    st_union = st1.unionByName(gram_state(b2, n=3)).distinct()
    st_all = gram_state(df, n=3)
    assert sorted(r.gram for r in st_union.collect()) == sorted(
        r.gram for r in st_all.collect()
    )


def test_regular_cadence_flags_ticker_not_bursty(spark):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.engagement import regular_cadence_users

    rows = []
    # user 1: perfect 10s ticker (6 events, 5 identical gaps)
    for i in range(6):
        rows.append((i, 1, 1_000_000 + i * 10_000_000))
    # user 2: bursty human (irregular gaps)
    for i, t in enumerate((0, 3, 50, 51, 300, 1000)):
        rows.append((100 + i, 2, 2_000_000 + t * 1_000_000))
    # user 3: too few events to screen
    rows += [(200, 3, 0), (201, 3, 5)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, us long")
    out = {
        r.user_id: r
        for r in regular_cadence_users(
            df, F.col("us"), min_gaps=4, max_distinct_gaps=2
        ).collect()
    }
    assert set(out) == {1, 2}  # user 3 below the screen threshold
    assert out[1].flagged and out[1].n_distinct_gaps == 1
    assert not out[2].flagged
    assert out[1].min_gap == out[1].max_gap == 10_000_000


def test_embedding_drift_zero_for_identical_halves(spark):
    from bunsen_spark.operators.drift import embedding_drift_by_label

    # even/odd vec pairs identical -> centroids equal -> l1_num = 0
    rows = []
    for i in range(10):
        v = [float(i), float(-i), 0.5 * i]
        rows.append((2 * i, v, i % 2))
        rows.append((2 * i + 1, v, i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.label: r for r in embedding_drift_by_label(df).collect()}
    for lab in (0, 1):
        assert out[lab].l1_num == 0
        assert out[lab].n_even == out[lab].n_odd == 5
    # shift one odd vector -> strictly positive numerator for its label
    rows[1] = (1, [100.0, 0.0, 0.0], 0)
    df2 = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out2 = {r.label: r for r in embedding_drift_by_label(df2).collect()}
    assert out2[0].l1_num > 0 and out2[1].l1_num == 0


def test_zipf_stats_hand_corpus(spark):
    from bunsen_spark.operators.text_analysis import zipf_stats

    df = spark.createDataFrame(
        [
            (1, "a a a b c", "s1"),
            (2, "a b b d", "s1"),
            (3, "z z", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in zipf_stats(df, "source").collect()}
    s1 = out["s1"]
    # s1: a=4, b=3, c=1, d=1
    assert (s1.n_tokens, s1.n_distinct, s1.n_hapax, s1.top_freq) == (9, 4, 2, 4)
    s2 = out["s2"]
    assert (s2.n_tokens, s2.n_distinct, s2.n_hapax, s2.top_freq) == (2, 1, 0, 2)


def test_quality_dup_deciles_partitions_and_counts(spark):
    from bunsen_spark.operators.text_analysis import quality_dup_deciles

    rows = []
    # 12 distinct docs of varying quality + 3 exact repeats of doc 0's text
    base = "the quick brown fox jumps over the lazy dog"
    for i in range(12):
        rows.append((i, base + " extra" * i))
    for j in range(3):
        rows.append((100 + j, rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_dup_deciles(df, n_bins=5).collect()
    assert sorted(r.q_bin for r in out) == [1, 2, 3, 4, 5]
    assert sum(r.n_docs for r in out) == 15
    # exactly the 4 copies of doc 0's text are dup docs
    assert sum(r.n_dup_docs for r in out) == 4
    assert all(0 <= r.n_dup_docs <= r.n_docs for r in out)


def test_topk_overlap_counts_and_zero_fill(spark):
    from bunsen_spark.operators.retrieval import topk_overlap

    mk = lambda rows: spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank long"
    )
    a = mk([(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 7, 1), (1, 8, 2), (1, 9, 3)])
    b = mk([(0, 2, 1), (0, 9, 2), (0, 1, 3), (1, 4, 1), (1, 5, 2), (1, 6, 3)])
    got = {r.query_id: r.hits for r in topk_overlap(a, b, 3).collect()}
    assert got == {0: 2, 1: 0}  # query 1 zero-filled, not dropped
    # rank-k cutoff respected: beyond-k rows ignored on both sides
    a2 = mk([(0, 1, 1), (0, 2, 4)])
    b2 = mk([(0, 2, 1), (0, 1, 2)])
    got2 = {r.query_id: r.hits for r in topk_overlap(a2, b2, 2).collect()}
    assert got2 == {0: 1}
    # self-overlap is k
    assert {r.hits for r in topk_overlap(a, a, 3).collect()} == {3}


def _py_cusum(xs: list[int], k: int) -> list[int]:
    out, s = [], 0
    for x in xs:
        s = max(0, s + x - k)
        out.append(s)
    return out


@pytest.mark.parametrize("seed", [7, 23])
def test_cusum_alerts_matches_textbook_recursion(spark, seed):
    from bunsen_spark.operators.timeseries import cusum_alerts

    rng = random.Random(seed)
    rows = []
    series = {}
    for key in ("a", "b"):
        xs = [rng.randint(0, 20) for _ in range(30)]
        # inject an upward shift in the back half of 'a'
        if key == "a":
            xs = xs[:15] + [x + 15 for x in xs[15:]]
        series[key] = xs
        rows += [(key, t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, bucket long, v long")
    drift, h = 10, 30
    got = {
        (r.k, r.bucket): r.cusum
        for r in cusum_alerts(df, "k", "bucket", "v", drift, h).collect()
    }
    want = {}
    for key, xs in series.items():
        for t, s in enumerate(_py_cusum(xs, drift)):
            if s > h:
                want[(key, t)] = s
    assert got == want
    assert any(k[0] == "a" for k in want), "shift must trigger alerts"
