"""Training-data pipeline queries over the synthetic ``documents`` /
``embeddings`` tables: text analysis, deduplication, similarity search.

Each entry pairs a Spark DataFrame implementation (Catalyst
expressions, no Python UDFs) with a DuckDB oracle that reproduces the
result bit-for-bit (determinism contracts in the operator modules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import load


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import language_id

    return language_id(load(spark, sf_dir, "documents"))


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import quality_score

    return quality_score(load(spark, sf_dir, "documents"))


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import token_stats

    return token_stats(load(spark, sf_dir, "documents"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import fingerprint

    return fingerprint(load(spark, sf_dir, "documents"), portable=True)


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text_analysis import repetition_stats

    return repetition_stats(load(spark, sf_dir, "documents"))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_dedup

    return exact_dedup(load(spark, sf_dir, "documents"))


def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_pairs

    return jaccard_pairs(load(spark, sf_dir, "documents"), portable=True)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(load(spark, sf_dir, "documents"), portable=True)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_pairs

    return simhash_pairs(load(spark, sf_dir, "documents"), portable=True)


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import embedding_near_dup_pairs

    # exercise the blocked (no-driver-collect) strategy — the 100 TB
    # path — so the oracle verifies its exactness, not just broadcast's
    return embedding_near_dup_pairs(load(spark, sf_dir, "embeddings"), strategy="blocked")


def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 vector compression under the oracle gate: every emitted
    stat is integer-exact or comparison-selected (no float sums), so
    the DuckDB twin matches bit-for-bit."""
    from ..operators.similarity import quantize_embeddings_stats

    return quantize_embeddings_stats(load(spark, sf_dir, "embeddings"))


def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import brute_force_topk

    return brute_force_topk(load(spark, sf_dir, "embeddings"))


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_topk

    return lsh_topk(load(spark, sf_dir, "embeddings"))


def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level 2-gram frequency table (top 25, ties broken by the
    ngram text): one explode + one aggregation + a top-k — the shape of
    every corpus-statistics job; at scale the explode fan-out is the
    cost and the agg is map-side combined."""
    from pyspark.sql import functions as F

    from ..operators.dedup import _with_shingles

    grams = _with_shingles(load(spark, sf_dir, "documents"), 2).select(
        F.explode("shingles").alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("ngram"))
        .limit(25)
    )


CORPUS_TOP_NGRAMS_SQL = """
WITH grams AS (
  SELECT unnest(list_distinct(list_transform(
      range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 1, 1) + 1),
      i -> array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[CAST(i AS INTEGER):CAST(i + 1 AS INTEGER)], ' ')
  ))) AS ngram
  FROM documents
)
SELECT ngram, count(*) AS n_docs FROM grams
GROUP BY ngram ORDER BY n_docs DESC, ngram LIMIT 25
"""


def corpus_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language length quantiles (percentile aggregate
    family): Spark's exact ``percentile`` and DuckDB's ``quantile_cont``
    share the linear-interpolation formula bit-for-bit on integer
    inputs, so even interpolated values hash-match."""
    from pyspark.sql import functions as F

    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.expr("percentile(n_chars, 0.25)").alias("q25"),
            F.expr("percentile(n_chars, 0.5)").alias("q50"),
            F.expr("percentile(n_chars, 0.9)").alias("q90"),
            F.count("*").alias("n_docs"),
        )
    )


CORPUS_LENGTH_QUANTILES_SQL = """
SELECT lang,
       quantile_cont(n_chars, 0.25) AS q25,
       quantile_cont(n_chars, 0.5) AS q50,
       quantile_cont(n_chars, 0.9) AS q90,
       count(*) AS n_docs
FROM documents GROUP BY lang
"""


#: canonical corpus split used by the split query + its oracle
SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment over documents, reported
    as per-split counts (stable across runs/engines/scale — see
    operators.sampling)."""
    from pyspark.sql import functions as F

    from ..operators.sampling import split_assign

    assigned = split_assign(load(spark, sf_dir, "documents"), "doc_id", SPLITS)
    return assigned.groupBy("split").agg(F.count("*").alias("n_docs"))


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair graph → dedup clusters + keep list (connected
    components by distributed min-label propagation, verified against
    a WITH RECURSIVE reachability oracle)."""
    from ..operators.dedup import minhash_lsh_pairs, near_dup_clusters

    return near_dup_clusters(
        minhash_lsh_pairs(load(spark, sf_dir, "documents"), portable=True)
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    return ivf_topk(load(spark, sf_dir, "embeddings"))


def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over a distributed Lloyd-trained (spherical k-means)
    codebook — the trained upgrade of ``ann_ivf_topk``'s seeded
    quantizer. The DuckDB twin re-trains the same codebook (unrolled
    iterations, bit-exact integer-mean updates) and must reproduce the
    same candidate lists and ranks."""
    from ..operators.similarity import ivf_kmeans_topk

    return ivf_kmeans_topk(load(spark, sf_dir, "embeddings"))


#: canonical per-language sampling fractions used by the gate query
STRATA_FRACTIONS = {"en": 0.5, "de": 0.25}
STRATA_DEFAULT = 0.1


def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling, reported as kept-row counts
    per stratum (zero-shuffle filter; stable across engines/scale)."""
    from pyspark.sql import functions as F

    from ..operators.sampling import stratified_sample

    kept = stratified_sample(
        load(spark, sf_dir, "documents"), "doc_id", "lang", STRATA_FRACTIONS, STRATA_DEFAULT
    )
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document distinctive terms: top 3 by (term frequency desc,
    document frequency asc, term) — the integer-exact flavor of tf-idf
    ranking (the same ordering a tf·idf score induces when tf
    dominates, with no cross-engine float-log hazards). Two map-side-
    combined aggregations + one join + one per-doc window."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    words = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
        ).alias("term"),
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "rank")
    )


DOC_TOP_TERMS_SQL = """
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents WHERE doc_id < 100
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM words GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT doc_id, term, tf, df, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
             PARTITION BY tf.doc_id ORDER BY tf.tf DESC, df.df ASC, tf.term
         ) AS rank
  FROM tf JOIN df USING (term)
) WHERE rank <= 3
"""


def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing assignment (deterministic
    shard + window cumsum; see operators.packing). num_shards is
    pinned so the DuckDB oracle mirrors the shard hash exactly; the
    operator's default derives it from the cluster parallelism."""
    from ..operators.packing import pack_concat_chunks

    return pack_concat_chunks(load(spark, sf_dir, "documents"), num_shards=32)


def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing word 3-gram
    shingles with the probe set (doc_id < 10 stands in for the
    benchmark suite), with overlap counts."""
    from pyspark.sql import functions as F

    from ..operators.dedup import ngram_contamination

    docs = load(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.where(F.col("doc_id") >= 10), docs.where(F.col("doc_id") < 10)
    )


def sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group curation sample: the 5 docs per language
    with the smallest md5(doc_id) — a reservoir-style 'N per stratum'
    pick that is stable across runs, engines and scale (one window)."""
    from pyspark.sql import Window, functions as F

    from ..operators.text_analysis import md5int

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", md5int(F.col("doc_id").cast("string")).alias("h")
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("lang", "doc_id", "rank")
    )


def _sample_per_lang_sql() -> str:
    from ..operators.text_analysis import md5int_sql

    h = md5int_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT lang, doc_id, rank FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rank
  FROM documents
) WHERE rank <= 5
"""


def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel a real pipeline runs: per language, total
    docs vs docs surviving each quality bar (length, alpha ratio,
    type-token ratio) and the final keep count — one pass, conditional
    aggregation, no UDFs."""
    from pyspark.sql import functions as F

    from ..operators.text_analysis import quality_score

    q = quality_score(load(spark, sf_dir, "documents")).join(
        load(spark, sf_dir, "documents").select("doc_id", "lang"), "doc_id"
    )
    len_ok = F.col("n_words") >= 5
    alpha_ok = F.col("alpha_ratio") >= 0.5
    ttr_ok = F.col("ttr") >= 0.3
    return q.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(len_ok.cast("long")).alias("n_len_ok"),
        F.sum((len_ok & alpha_ok).cast("long")).alias("n_alpha_ok"),
        F.sum((len_ok & alpha_ok & ttr_ok).cast("long")).alias("n_kept"),
    )


def _quality_funnel_sql() -> str:
    from ..operators.text_analysis import quality_score_sql

    return f"""
WITH q AS ({quality_score_sql()}),
j AS (SELECT q.*, d.lang FROM q JOIN documents d USING (doc_id))
SELECT lang,
       COUNT(*) AS n_total,
       -- CAST: DuckDB SUM(int) is HUGEINT → float64 under a pandas fetch;
       -- Spark sums longs, so pin the oracle to BIGINT for hash parity.
       CAST(SUM(CASE WHEN n_words >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
       CAST(SUM(CASE WHEN n_words >= 5 AND alpha_ratio >= 0.5 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alpha_ok,
       CAST(SUM(CASE WHEN n_words >= 5 AND alpha_ratio >= 0.5 AND ttr >= 0.3
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM j GROUP BY lang
"""


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column media pipeline end-to-end (synthesize → decode →
    per-channel feature extraction in Arrow-batched mapInPandas). The
    decode is the deterministic fake (no codecs in this container), so
    the gate output is exactly reproducible: payload byte ``p`` is
    ``md5('media'+i)[p % 16]`` tiled to ``w*h*3``, so the per-channel
    means are integer-sum averages with a bit-exact DuckDB twin
    (``MULTIMODAL_FEATURES_SQL``). ``entropy_bits`` is excluded from
    the gate columns — its float64 ``Σ p·log2 p`` depends on summation
    order, so it is covered by ``tests/test_multimodal.py`` instead."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import decode_images, image_features, synthesize_media

    media = synthesize_media(spark, n=64, kind="image")
    # image_features carries width/height through, so the whole gate is
    # ONE decode pass — no self-join back to `decoded`, which would run
    # the dominant-cost mapInPandas decode stage twice
    # (plan-asserted single-decode in tests/test_plans.py).
    feats = image_features(decode_images(media))
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.element_at("mean", 1), 6).alias("mean_c0"),
        F.round(F.element_at("mean", 2), 6).alias("mean_c1"),
        F.round(F.element_at("mean", 3), 6).alias("mean_c2"),
    )


# DuckDB twin of the deterministic fake decode: byte q of the tiled
# pixel buffer is md5('media'+i)[(q % payload_len) % 16]; channel j is
# the positions with q % 3 = j. Integer sums are order-independent and
# exact in float64, so round(avg, 6) matches Spark bit-for-bit.
MULTIMODAL_FEATURES_SQL = """
WITH media AS (
  SELECT i,
         md5('media' || CAST(i AS VARCHAR)) AS h,
         64 + (i % 5) * 16 AS plen,
         8 + (i % 4) AS w,
         6 + (i % 3) AS ht
  FROM range(64) t(i)
),
px AS (
  SELECT m.i, m.w, m.ht, t.q,
         (strpos('0123456789abcdef',
                 substr(m.h, 2 * ((t.q % m.plen) % 16) + 1, 1)) - 1) * 16
         + strpos('0123456789abcdef',
                  substr(m.h, 2 * ((t.q % m.plen) % 16) + 2, 1)) - 1 AS val
  FROM media m
  CROSS JOIN range(264) t(q)      -- 264 = max w (11) * max h (8) * 3
  WHERE t.q < m.w * m.ht * 3
)
SELECT i AS media_id, w AS width, ht AS height,
       round(avg(CASE WHEN q % 3 = 0 THEN val END), 6) AS mean_c0,
       round(avg(CASE WHEN q % 3 = 1 THEN val END), 6) AS mean_c1,
       round(avg(CASE WHEN q % 3 = 2 THEN val END), 6) AS mean_c2
FROM px
GROUP BY i, w, ht
"""


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of ``multimodal_image_features``: synthesize → decode
    (deterministic fake: payload bytes tiled to ``n_samples`` PCM-8
    samples) → per-clip signal statistics in one Arrow-batched pass.
    All statistics are integer sums over samples ``md5('media'+i)[(q %
    plen) % 16] - 128``, so the DuckDB twin is bit-exact. Single decode
    by construction: ``audio_features`` carries n_samples through
    (plan-asserted in tests/test_plans.py)."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import audio_features, decode_audio, synthesize_media

    media = synthesize_media(spark, n=64, kind="audio")
    feats = audio_features(decode_audio(media))
    return feats.select(
        "media_id",
        "n_samples",
        F.round("mean_amp", 6).alias("mean_amp"),
        F.round("mean_abs", 6).alias("mean_abs"),
        "zero_crossings",
        "peak",
    )


# DuckDB twin of the fake audio decode: sample q of clip i is
# md5('media'+i)[(q % plen) % 16] - 128 (same tiled-digest scheme the
# image oracle mirrors); zero-crossings via LAG, everything else plain
# integer aggregation — order-independent, exact in float64.
MULTIMODAL_AUDIO_SQL = """
WITH media AS (
  SELECT i,
         md5('media' || CAST(i AS VARCHAR)) AS h,
         64 + (i % 5) * 16 AS plen,
         1024 + 64 * (i % 7) AS ns
  FROM range(64) t(i)
),
smp AS (
  SELECT m.i, m.ns, t.q,
         (strpos('0123456789abcdef',
                 substr(m.h, 2 * ((t.q % m.plen) % 16) + 1, 1)) - 1) * 16
         + strpos('0123456789abcdef',
                  substr(m.h, 2 * ((t.q % m.plen) % 16) + 2, 1)) - 1 - 128 AS s
  FROM media m
  CROSS JOIN range(1408) t(q)     -- 1408 = max n_samples (i % 7 = 6)
  WHERE t.q < m.ns
),
flags AS (
  SELECT i, ns, s,
         CASE WHEN LAG(s) OVER w IS NULL THEN 0
              WHEN (s >= 0) <> (LAG(s) OVER w >= 0) THEN 1
              ELSE 0 END AS zc
  FROM smp WINDOW w AS (PARTITION BY i ORDER BY q)
)
SELECT i AS media_id, ns AS n_samples,
       round(avg(s), 6) AS mean_amp,
       round(avg(abs(s)), 6) AS mean_abs,
       CAST(SUM(zc) AS BIGINT) AS zero_crossings,
       MAX(abs(s)) AS peak
FROM flags
GROUP BY i, ns
"""


def multimodal_resize_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage under the oracle gate: decode → nearest-neighbour
    resize to 4×4 → per-channel means, one chained Arrow pipeline
    (decode runs once; resize and features are buffer-local numpy).
    The fake decode + integer index arithmetic make the resized
    buffer's channel means exactly reproducible in SQL."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import (
        decode_images,
        image_features,
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(spark, n=64, kind="image")
    feats = image_features(resize_images(decode_images(media), 4, 4))
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round(F.element_at("mean", 1), 6).alias("mean_c0"),
        F.round(F.element_at("mean", 2), 6).alias("mean_c1"),
        F.round(F.element_at("mean", 3), 6).alias("mean_c2"),
    )


# DuckDB twin of decode→4×4-nearest-neighbour-resize→channel means:
# resized pixel j (0..47) maps back to source byte
# ((y*h//4)*w + (x*w//4))*3 + ch, whose value is the tiled digest byte
# as in MULTIMODAL_FEATURES_SQL.
MULTIMODAL_RESIZE_SQL = """
WITH media AS (
  SELECT i,
         md5('media' || CAST(i AS VARCHAR)) AS h,
         64 + (i % 5) * 16 AS plen,
         8 + (i % 4) AS w,
         6 + (i % 3) AS ht
  FROM range(64) t(i)
),
px AS (
  SELECT m.i, t.j % 3 AS ch,
         ((((t.j // 12) * m.ht // 4) * m.w + (((t.j % 12) // 3) * m.w // 4)) * 3
          + (t.j % 3)) AS q,
         m.h, m.plen
  FROM media m CROSS JOIN range(48) t(j)
),
vals AS (
  SELECT i, ch,
         (strpos('0123456789abcdef',
                 substr(h, 2 * ((q % plen) % 16) + 1, 1)) - 1) * 16
         + strpos('0123456789abcdef',
                  substr(h, 2 * ((q % plen) % 16) + 2, 1)) - 1 AS val
  FROM px
)
SELECT i AS media_id, 4 AS width, 4 AS height,
       round(avg(CASE WHEN ch = 0 THEN val END), 6) AS mean_c0,
       round(avg(CASE WHEN ch = 1 THEN val END), 6) AS mean_c1,
       round(avg(CASE WHEN ch = 2 THEN val END), 6) AS mean_c2
FROM vals
GROUP BY i
"""


def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling stage under the oracle gate: every-2nd
    frame as fixed-size payload slabs (the demux stand-in boundary),
    then per-frame length + byte checksum. Slab slicing and fan-out
    are the real distributed work; the checksum verifies frame bytes
    end-to-end against SQL."""
    from ..operators.multimodal import frame_stats, sample_frames, synthesize_media

    media = synthesize_media(spark, n=64, kind="video")
    return frame_stats(sample_frames(media, every_k=2))


# DuckDB twin: clip i has plen payload bytes (tiled 16-byte digest),
# n_frames = 4 + i%5 slabs of plen // n_frames bytes; sampled frames
# are the even indices; byte p of frame f is digest[(f*slab + p) % 16].
MULTIMODAL_FRAMES_SQL = """
WITH media AS (
  SELECT i,
         md5('media' || CAST(i AS VARCHAR)) AS h,
         64 + (i % 5) * 16 AS plen,
         4 + (i % 5) AS nf
  FROM range(64) t(i)
),
frames AS (
  SELECT i, h, plen, plen // nf AS slab, f.fi
  FROM media CROSS JOIN range(8) f(fi)
  WHERE f.fi < nf AND f.fi % 2 = 0
),
bytes AS (
  SELECT i, fi, slab,
         (strpos('0123456789abcdef',
                 substr(h, 2 * (((fi * slab + p.p) % plen) % 16) + 1, 1)) - 1) * 16
         + strpos('0123456789abcdef',
                  substr(h, 2 * (((fi * slab + p.p) % plen) % 16) + 2, 1)) - 1 AS val
  FROM frames CROSS JOIN range(32) p(p)
  WHERE p.p < slab
)
SELECT i AS media_id, fi AS frame_index,
       CAST(count(*) AS INTEGER) AS frame_len,
       CAST(sum(val) AS BIGINT) AS byte_sum
FROM bytes
GROUP BY i, fi
"""


#: denylist for the scrub gate query — high-frequency corpus words so the
#: redaction path is exercised on every document (the corpus has no real PII)
SCRUB_DENYLIST = ("customer", "table", "order")


def text_scrub_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-redaction-shaped denylist scrub (see operators.text_analysis
    .scrub_terms): per-doc redaction count + scrubbed length."""
    from ..operators.text_analysis import scrub_terms

    return scrub_terms(load(spark, sf_dir, "documents"), SCRUB_DENYLIST)


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best curation dedup: one representative per source (max
    n_chars, min doc_id tie-break) via a single map-side-combined
    struct-max aggregate — no window sort."""
    from ..operators.dedup import keep_best

    return keep_best(load(spark, sf_dir, "documents"))


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: docs 250+ arrive as a new batch against
    the fingerprint state built from docs 0-249; returns the batch
    texts not seen before (see operators.dedup.incremental_dedup)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import exact_dedup, incremental_dedup

    docs = load(spark, sf_dir, "documents")
    seen = exact_dedup(docs.where(F.col("doc_id") < 250)).select("fingerprint")
    return incremental_dedup(docs.where(F.col("doc_id") >= 250), seen)


DEDUP_INCREMENTAL_SQL = """
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_docs
FROM documents
WHERE doc_id >= 250
  AND md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id < 250)
GROUP BY md5(text)
"""


def _oracles() -> dict[str, str]:
    from ..operators.text_analysis import (
        scrub_terms_sql,
        fingerprint_sql,
        repetition_stats_sql,
        language_id_sql,
        quality_score_sql,
        token_stats_sql,
    )

    from ..operators.dedup import (
        embedding_near_dup_pairs_sql,
        exact_dedup_sql,
        keep_best_sql,
        jaccard_pairs_sql,
        minhash_lsh_pairs_sql,
        near_dup_clusters_sql,
        simhash_pairs_sql,
    )
    from ..operators.packing import pack_concat_chunks_sql
    from ..operators.sampling import split_assign_sql, stratified_sample_sql
    from ..operators.dedup import ngram_contamination_sql
    from ..operators.similarity import (
        brute_force_topk_sql,
        ivf_kmeans_topk_sql,
        quantize_embeddings_stats_sql,
        ivf_topk_sql,
        lsh_topk_sql,
    )

    return {
        "text_language_id": language_id_sql(),
        "text_quality": quality_score_sql(),
        "text_token_stats": token_stats_sql(),
        "text_fingerprint": fingerprint_sql(),
        "text_repetition": repetition_stats_sql(),
        "dedup_exact": exact_dedup_sql(),
        "dedup_keep_best": keep_best_sql(),
        "dedup_incremental": DEDUP_INCREMENTAL_SQL,
        "text_scrub_counts": scrub_terms_sql(SCRUB_DENYLIST),
        "dedup_jaccard": jaccard_pairs_sql(),
        "dedup_minhash_lsh": minhash_lsh_pairs_sql(),
        "dedup_simhash": simhash_pairs_sql(),
        "dedup_embedding": embedding_near_dup_pairs_sql(),
        "ann_brute_topk": brute_force_topk_sql(),
        "ann_lsh_topk": lsh_topk_sql(),
        "dataset_split_counts": (
            "SELECT split, count(*) AS n_docs FROM ("
            + split_assign_sql("documents", "doc_id", SPLITS)
            + ") GROUP BY split"
        ),
        "corpus_top_ngrams": CORPUS_TOP_NGRAMS_SQL,
        "corpus_length_quantiles": CORPUS_LENGTH_QUANTILES_SQL,
        "dedup_clusters": near_dup_clusters_sql(minhash_lsh_pairs_sql()),
        "pack_chunks": pack_concat_chunks_sql(),
        "decontaminate_overlap": ngram_contamination_sql(),
        "sample_per_lang": _sample_per_lang_sql(),
        "quality_filter_funnel": _quality_funnel_sql(),
        "ann_ivf_topk": ivf_topk_sql(),
        "ann_ivf_kmeans_topk": ivf_kmeans_topk_sql(),
        "embedding_quantize_stats": quantize_embeddings_stats_sql(),
        "stratified_sample_counts": (
            "SELECT lang, count(*) AS n_kept FROM ("
            + stratified_sample_sql(
                "documents", "doc_id", "lang", STRATA_FRACTIONS, STRATA_DEFAULT
            )
            + ") GROUP BY lang"
        ),
        "doc_top_terms": DOC_TOP_TERMS_SQL,
        "multimodal_image_features": MULTIMODAL_FEATURES_SQL,
        "multimodal_audio_features": MULTIMODAL_AUDIO_SQL,
        "multimodal_resize_means": MULTIMODAL_RESIZE_SQL,
        "multimodal_frame_stats": MULTIMODAL_FRAMES_SQL,
    }


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_language_id": text_language_id,
    "text_quality": text_quality,
    "text_token_stats": text_token_stats,
    "text_fingerprint": text_fingerprint,
    "text_repetition": text_repetition,
    "dedup_exact": dedup_exact,
    "dedup_keep_best": dedup_keep_best,
    "dedup_incremental": dedup_incremental,
    "text_scrub_counts": text_scrub_counts,
    "dedup_jaccard": dedup_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding": dedup_embedding,
    "ann_brute_topk": ann_brute_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "dataset_split_counts": dataset_split_counts,
    "corpus_top_ngrams": corpus_top_ngrams,
    "corpus_length_quantiles": corpus_length_quantiles,
    "dedup_clusters": dedup_clusters,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_kmeans_topk": ann_ivf_kmeans_topk,
    "embedding_quantize_stats": embedding_quantize_stats,
    "stratified_sample_counts": stratified_sample_counts,
    "doc_top_terms": doc_top_terms,
    "pack_chunks": pack_chunks,
    "decontaminate_overlap": decontaminate_overlap,
    "sample_per_lang": sample_per_lang,
    "quality_filter_funnel": quality_filter_funnel,
    "multimodal_image_features": multimodal_image_features,
    "multimodal_audio_features": multimodal_audio_features,
    "multimodal_resize_means": multimodal_resize_means,
    "multimodal_frame_stats": multimodal_frame_stats,
}

ORACLES: dict[str, str] = _oracles()
