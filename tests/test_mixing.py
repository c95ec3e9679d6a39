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
