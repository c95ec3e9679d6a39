"""Hash-family switch (`text_analysis.hash31`): the xxhash64 fast path
and the md5 portable (DuckDB-twin) path must make the SAME dedup
DECISIONS — pairs found, clusters formed, docs kept — on the fixture
corpus, even though the hash values differ. Individual hash-dependent
values (fp_min, sig) legitimately differ between families; decisions
must not (collisions are the only mechanism for divergence and are
~2^-31 per comparison)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def _pairs(df):
    return sorted((r.a_id, r.b_id) for r in df.collect())


def test_hash31_families_differ_in_values(spark):
    from bunsen_spark.operators.text_analysis import MERSENNE31, hash31

    df = spark.createDataFrame([("alpha",), ("beta",)], "s string").select(
        hash31(F.col("s")).alias("fast"),
        hash31(F.col("s"), portable=True).alias("portable"),
    )
    rows = df.collect()
    assert all(0 <= r.fast < MERSENNE31 and 0 <= r.portable < MERSENNE31 for r in rows)
    assert any(r.fast != r.portable for r in rows)


def test_jaccard_pairs_same_decisions(docs):
    from bunsen_spark.operators.dedup import jaccard_pairs

    fast = _pairs(jaccard_pairs(docs, threshold=0.5))
    portable = _pairs(jaccard_pairs(docs, threshold=0.5, portable=True))
    assert fast == portable and fast


def test_minhash_lsh_same_decisions(docs):
    from bunsen_spark.operators.dedup import minhash_lsh_pairs

    fast = _pairs(minhash_lsh_pairs(docs, threshold=0.5))
    portable = _pairs(minhash_lsh_pairs(docs, threshold=0.5, portable=True))
    assert fast == portable and fast


def test_simhash_decisions_mostly_agree(docs):
    """SimHash is the one family-SENSITIVE operator: the Hamming verify
    runs on the signatures themselves (majority votes over hash bits),
    so near-threshold pairs can legitimately flip between families —
    unlike MinHash-LSH, whose exact-Jaccard verify makes decisions
    family-agnostic. Gate: both families find a substantially
    overlapping pair set (Jaccard ≥ 0.7 on the fixture corpus, observed
    ~0.83)."""
    from bunsen_spark.operators.dedup import simhash_pairs

    fast = set(_pairs(simhash_pairs(docs)))
    portable = set(_pairs(simhash_pairs(docs, portable=True)))
    assert fast and portable
    assert len(fast & portable) / len(fast | portable) >= 0.7


def test_clusters_same_decisions(docs):
    from bunsen_spark.operators.dedup import minhash_lsh_pairs, near_dup_clusters

    def run(portable):
        cl = near_dup_clusters(minhash_lsh_pairs(docs, 0.5, portable=portable))
        return sorted(
            (r.doc_id, r.cluster_id, r.is_keeper) for r in cl.collect()
        )

    assert run(False) == run(True)


def test_incremental_near_dup_same_kept_set(docs):
    from bunsen_spark.operators.dedup import incremental_near_dup, minhash_state

    def run(portable):
        state = minhash_state(docs.where(F.col("doc_id") < 250), portable=portable)
        kept = incremental_near_dup(
            docs.where(F.col("doc_id") >= 250), state, 0.5, portable=portable
        )
        return sorted(r.doc_id for r in kept.collect())

    assert run(False) == run(True)


def test_fingerprint_sizes_match(docs):
    """fp_min differs between families by construction; the STRUCTURAL
    outputs (gram count, winnowed-set size) must agree — winnowing
    keeps per-window minima whose count depends only weakly on the
    family, and n_grams not at all."""
    from bunsen_spark.operators.text_analysis import fingerprint

    fast = {r.doc_id: r.n_grams for r in fingerprint(docs).collect()}
    portable = {
        r.doc_id: r.n_grams for r in fingerprint(docs, portable=True).collect()
    }
    assert fast == portable and fast
