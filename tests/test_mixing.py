"""mix_to_proportions: achieved shares track targets, determinism,
no-upsampling contract."""

from __future__ import annotations

import pytest


def _mixed(spark, targets):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.sampling import mix_to_proportions

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = mix_to_proportions(docs, "doc_id", "lang", "n_chars", targets)
    per = {
        r.lang: r.mass
        for r in out.groupBy("lang").agg(F.sum("n_chars").alias("mass")).collect()
    }
    return per


def test_mix_shares_track_targets(spark):
    targets = {"en": 0.5, "de": 0.15, "es": 0.15, "fr": 0.1, "zh": 0.1}
    per = _mixed(spark, targets)
    total = sum(per.values())
    for lang, w in targets.items():
        share = per[lang] / total
        # hash sampling at a few hundred docs/stratum: allow a loose band
        assert abs(share - w) < 0.08, (lang, share, w)


def test_mix_never_upsamples_and_keeps_min_stratum_whole(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    orig = {
        r.lang: r.mass
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("mass")).collect()
    }
    targets = {"en": 0.5, "de": 0.15, "es": 0.15, "fr": 0.1, "zh": 0.1}
    per = _mixed(spark, targets)
    for lang, mass in per.items():
        assert mass <= orig[lang]
    # the binding stratum (min size/weight) must keep ~all its mass
    binding = min(targets, key=lambda s: orig[s] / targets[s])
    assert per[binding] == orig[binding]


def test_mix_deterministic_and_validates(spark):
    from bunsen_spark.operators.sampling import mix_to_proportions

    targets = {"en": 0.6, "de": 0.4}
    a = _mixed(spark, targets)
    b = _mixed(spark, targets)
    assert a == b
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    with pytest.raises(ValueError):
        mix_to_proportions(docs, "doc_id", "lang", "n_chars", {})
    with pytest.raises(ValueError):
        mix_to_proportions(docs, "doc_id", "lang", "n_chars", {"en": -1.0})


def test_temperature_sample_smallest_stratum_keeps_all(spark):
    """With tau=2 the achievable total is pinned by the smallest
    stratum (min of sz/sqrt(sz/N) = sqrt(sz*N)), so it keeps every
    row while larger strata are thinned toward sqrt-share."""
    from pyspark.sql import functions as F

    from bunsen_spark.operators.sampling import temperature_sample

    rows = [(i, "en", 100) for i in range(900)] + [
        (10_000 + i, "is", 100) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    kept = temperature_sample(df, "doc_id", "lang", "n_chars", tau=2.0)
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["is"] == 100  # smallest stratum: rate 1, nothing dropped
    # en target mass = T*p_en = sqrt(90000*100000) ~ 94868 chars -> ~1/3 of en
    assert 250 <= counts["en"] <= 350
    # flattening: en share fell from 90% toward sqrt-balanced ~75%
    assert counts["en"] / (counts["en"] + counts["is"]) < 0.80


def test_temperature_tau1_keeps_natural_mix(spark):
    """tau=1: p_s = share, T*p_s = sz_s * (T/N) and T = N, so every
    rate is exactly 1 — the operator is the identity."""
    from bunsen_spark.operators.sampling import temperature_sample

    rows = [(i, "en" if i % 3 else "de", 10 + i % 7) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    kept = temperature_sample(df, "doc_id", "lang", "n_chars", tau=1.0)
    assert kept.count() == 120


def test_temperature_sample_deterministic_and_validated(spark):
    import pytest

    from bunsen_spark.operators.sampling import temperature_sample

    rows = [(i, "en" if i % 4 else "fr", 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    a = sorted(r.doc_id for r in temperature_sample(df, "doc_id", "lang", "n_chars").collect())
    b = sorted(r.doc_id for r in temperature_sample(df, "doc_id", "lang", "n_chars").collect())
    assert a == b and len(a) > 0
    with pytest.raises(ValueError):
        temperature_sample(df, "doc_id", "lang", "n_chars", tau=0.5)


def test_epoch_positions_deterministic_permutation(spark):
    from pyspark.sql import functions as F

    from bunsen_spark.operators.sampling import epoch_positions

    df = spark.range(0, 200).select(F.col("id").alias("doc_id")).repartition(7)
    a = {r["doc_id"]: r["position"] for r in epoch_positions(df, "doc_id", "s1").collect()}
    b = {r["doc_id"]: r["position"] for r in epoch_positions(df.repartition(3), "doc_id", "s1").collect()}
    c = {r["doc_id"]: r["position"] for r in epoch_positions(df, "doc_id", "s2").collect()}
    assert a == b  # layout-invariant
    assert sorted(a.values()) == list(range(1, 201))  # dense permutation
    assert a != c  # a new seed reshuffles
    # hash order is not identity order
    assert [a[i] for i in range(200)] != list(range(1, 201))


def test_interleave_positions_prefix_proportions(spark):
    """Every prefix of the schedule contains each group in proportion
    to its weight (±1 per group) — the interleaving contract that
    block concatenation or naive shuffling does not give."""
    from bunsen_spark.operators.sampling import interleave_positions

    rows = [(i, "a") for i in range(120)] + [(1000 + i, "b") for i in range(60)] \
        + [(2000 + i, "c") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, grp string").repartition(5)
    out = sorted(
        (r["position"], r["grp"])
        for r in interleave_positions(df, "doc_id", "grp", {"a": 2, "b": 1, "c": 1}).collect()
    )
    assert [p for p, _ in out] == list(range(1, 241))
    seen = {"a": 0, "b": 0, "c": 0}
    total_w = 4
    for p, g in out:
        seen[g] += 1
        for grp, w in (("a", 2), ("b", 1), ("c", 1)):
            expected = p * w / total_w
            assert abs(seen[grp] - expected) <= 2.0, (p, grp, seen)
    # weights-absent groups are excluded
    out2 = interleave_positions(df, "doc_id", "grp", {"a": 1, "b": 1}).collect()
    assert {r["grp"] for r in out2} == {"a", "b"}
    # bad weights rejected
    import pytest

    with pytest.raises(ValueError):
        interleave_positions(df, "doc_id", "grp", {"a": 0})


def test_interleave_positions_non_string_group(spark):
    """An int group column must work: the weights table is built with
    the caller's group-column type, not a hardcoded string schema
    (ADVICE r7)."""
    from bunsen_spark.operators.sampling import interleave_positions

    rows = [(i, 1) for i in range(40)] + [(100 + i, 2) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, grp int").repartition(3)
    out = sorted(
        (r["position"], r["grp"])
        for r in interleave_positions(df, "doc_id", "grp", {1: 2, 2: 1}).collect()
    )
    assert [p for p, _ in out] == list(range(1, 61))
    assert {g for _, g in out} == {1, 2}
    # group 1 (weight 2) appears ~2/3 of any prefix
    seen = 0
    for p, g in out:
        seen += g == 1
        assert abs(seen - p * 2 / 3) <= 2.0, (p, seen)
