"""Distributed Bloom-filter build + join prefilter, pure Catalyst.

Spark's own runtime row-level filtering builds a Bloom filter on the
small side of a join and pushes `might_contain` into the big-side scan,
but the aggregate (`bloom_filter_agg`) is not registered for public SQL
and PySpark exposes no handle to it. This module re-expresses the same
idea with public DataFrame primitives only, so it composes with any
plan and the filter itself is a first-class DataFrame:

- **build**: each key is hashed ``num_hashes`` times
  (``xxhash64(key, seed_i)``, positions mod ``num_bits``); positions
  explode to (word_index, bit) pairs and a single ``bit_or`` aggregate
  folds them into at most ``num_bits / 64`` one-long "words". The build
  shuffles only distinct word indexes — bounded by the filter size, not
  the input — and is mergeable (bit_or is associative/commutative), so
  it works as an incremental accumulator too.
- **probe**: the word table broadcasts (a 2^20-bit filter is 16 Ki
  rows ≈ 128 KiB); the fact side computes its ``num_hashes`` positions
  and checks each against one broadcast hash join + a shiftright bit
  test, dropping rows at the first miss. The fact table is never
  shuffled and never fans out — row cardinality is constant through
  every join.

Guarantee: NO false negatives (every key present in the build set
passes the probe), tunable false-positive rate
``(1 - exp(-k*n/m))^k``. ``bloom_semi_join`` therefore returns exactly
the plain left-semi join result: the Bloom pass only prunes rows the
exact join would drop anyway. At 100 TB the win is that the pruned
rows never reach the join shuffle.

The reference has no Bloom operator; this is a beyond-reference scale
primitive (same role as its broadcast valueset membership,
BroadcastableValueSets.java, but with bounded memory for arbitrarily
large key sets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    # xxhash64 has a fixed internal seed; varying an appended literal
    # column yields independent hash families, same trick as
    # minhash_signature (operators/dedup.py).
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_words(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Aggregate ``df[key_col]`` into Bloom words: (word_idx long,
    word long). At most ``num_bits / 64`` rows; absent rows mean an
    all-zero word. Mergeable: union two word tables and re-aggregate
    with bit_or to get the filter of the union of key sets."""
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    return (
        df.select(pos)
        .groupBy(F.expr("pos div 64").alias("word_idx"))
        .agg(
            # shiftleft's shift amount must be a column here, which the
            # Python API doesn't accept — SQL form does.
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), cast(pmod(pos, 64) as int))")
            ).alias("word")
        )
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two word tables built with identical (num_bits,
    num_hashes): the filter of the UNION of the two key sets. Bitwise
    OR per word — the warehouse pattern: persist per-partition /
    per-day word tables, roll up later without re-reading keys."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    words: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Keep only fact rows whose key *might* be in the filter.

    One broadcast left join + bit test per hash function; rows drop at
    the first unset bit, so the common-case negative probe costs one
    broadcast lookup. Row cardinality never grows (each word_idx is
    unique in ``words``). No false negatives."""
    out = fact
    for i in range(num_hashes):
        pos_sql = f"pmod(xxhash64({key_col}, {i}), {num_bits})"
        w = words.select(
            F.col("word_idx").alias(f"_bw_idx_{i}"),
            F.col("word").alias(f"_bw_val_{i}"),
        )
        out = (
            out.join(
                F.broadcast(w),
                F.expr(f"{pos_sql} div 64") == F.col(f"_bw_idx_{i}"),
                "left",
            )
            .where(
                F.expr(
                    f"(shiftright(coalesce(_bw_val_{i}, cast(0 as bigint)), "
                    f"cast(pmod({pos_sql}, 64) as int)) & 1) = 1"
                )
            )
            .drop(f"_bw_idx_{i}", f"_bw_val_{i}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Exact left-semi join with a Bloom prefilter on the fact side.

    Result is identical to ``fact.join(dim, fact_key == dim_key,
    "left_semi")`` — the prefilter only removes rows the exact join
    would drop (no false negatives) and the semi join removes the
    Bloom's false positives. The dim side is scanned twice (once into
    the ~KiB word table, once for the exact join); the fact side is
    scanned once and only surviving rows reach the join."""
    words = bloom_words(dim, dim_key, num_bits, num_hashes)
    pre = bloom_prefilter(fact, fact_key, words, num_bits, num_hashes)
    return pre.join(
        dim.select(F.col(dim_key)).distinct(),
        F.col(fact_key) == F.col(dim_key),
        "left_semi",
    )
