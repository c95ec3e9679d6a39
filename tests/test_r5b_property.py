"""Property tests for the round-5b operators against pure-Python
references: substring-dup spans and the batch SCD2 fold."""

from __future__ import annotations

import random

import pytest


def _py_dup_spans(texts: dict[int, str], k: int, min_df: int = 2):
    """Reference: count gram occurrences, merge covered intervals."""
    from collections import Counter

    grams = Counter()
    for t in texts.values():
        for p in range(len(t) - k + 1):
            grams[t[p : p + k]] += 1
    out = {}
    for did, t in texts.items():
        spans = []
        for p in range(len(t) - k + 1):
            if grams[t[p : p + k]] >= min_df:
                spans.append((p, p + k))
        merged = 0
        cur_s = cur_e = None
        for s, e in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    merged += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            merged += cur_e - cur_s
        out[did] = (len(t), merged)
    return out


@pytest.mark.parametrize("seed", [1, 8, 21])
def test_substring_spans_random_matches_reference(spark, seed):
    from bunsen_spark.operators.substrings import substring_dup_spans

    rng = random.Random(seed)
    alphabet = "abcd"  # small alphabet -> plenty of natural repeats
    texts = {
        i: "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for i in range(25)
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chars, r.dup_chars)
        for r in substring_dup_spans(df, k=5, min_df=2).collect()
    }
    assert got == _py_dup_spans(texts, k=5)


def _py_scd2_fold(batches, start=None):
    """Reference: fold full snapshots through SCD2 semantics."""
    versions = list(start or [])  # (k, payload, vf, vt)
    for i, snap in enumerate(batches):
        ts = i + 1
        snap = dict(snap)
        nxt = []
        open_keys_seen = set()
        for k, p, vf, vt in versions:
            if vt is not None:
                nxt.append((k, p, vf, vt))
                continue
            open_keys_seen.add(k)
            if k not in snap:
                nxt.append((k, p, vf, ts))  # deleted
            elif snap[k] == p:
                nxt.append((k, p, vf, None))  # unchanged
            else:
                nxt.append((k, p, vf, ts))
                nxt.append((k, snap[k], ts, None))
        for k, p in snap.items():
            if k not in open_keys_seen:
                nxt.append((k, p, ts, None))
        versions = nxt
    return sorted(versions)


@pytest.mark.parametrize("seed", [4, 13, 29])
def test_scd2_fold_random_matches_reference(spark, seed):
    from bunsen_spark.operators.snapshot import scd2_apply

    rng = random.Random(seed)
    folded = spark.createDataFrame(
        [], "k long, payload string, valid_from long, valid_to long"
    )
    batches = []
    for _ in range(4):
        # full snapshots over a small key space: inserts, deletes, and
        # changes all occur naturally
        snap = {
            k: f"v{rng.randint(0, 2)}"
            for k in rng.sample(range(1, 8), k=rng.randint(2, 6))
        }
        batches.append(snap)
    for i, snap in enumerate(batches):
        sdf = spark.createDataFrame(
            list(snap.items()), "k long, payload string"
        )
        folded = scd2_apply(folded, sdf, "k", ["payload"], i + 1)
    got = sorted(
        (r.k, r.payload, r.valid_from, r.valid_to) for r in folded.collect()
    )
    assert got == _py_scd2_fold(batches)


def test_scd2_fold_reopen_after_delete(spark):
    """A key deleted by one snapshot and re-inserted by a later one
    must get a fresh open version, with the closed history intact."""
    from bunsen_spark.operators.snapshot import scd2_apply

    dim = spark.createDataFrame(
        [(1, "a", 0, None)], "k long, payload string, valid_from long, valid_to long"
    )
    gone = spark.createDataFrame([], "k long, payload string")
    dim = scd2_apply(dim, gone, "k", ["payload"], 5)
    back = spark.createDataFrame([(1, "a2")], "k long, payload string")
    dim = scd2_apply(dim, back, "k", ["payload"], 9)
    got = sorted((r.k, r.payload, r.valid_from, r.valid_to) for r in dim.collect())
    assert got == [(1, "a", 0, 5), (1, "a2", 9, None)]
