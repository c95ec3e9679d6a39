"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

Beyond-reference scale extension (SURVEY §7 M7). The Spark-side
plumbing — schemas, partitioning, UDF signatures, Arrow batch shapes —
is real and tested; only the codec boundary is swappable:

- ``decode_media`` uses a real decoder when one is importable (PIL for
  images) and otherwise falls back to a clearly-marked DETERMINISTIC
  FAKE that expands the payload into a pixel/sample buffer from the
  payload bytes themselves, so every downstream stage (resize,
  features, frame sampling) exercises real numpy math on real buffer
  shapes.
- resize is true nearest-neighbour numpy indexing; per-channel feature
  extraction is numpy vectorized; frame sampling is pure arithmetic on
  the frame axis. None of these need an image library.

Design for 100 TB: payloads stay opaque bytes end-to-end (Parquet
binary columns; never JSON-encoded), metadata lives in a narrow struct
so filters (``kind = 'image'``, ``width >= 64``) prune row groups
without touching payload pages; ``mapInPandas`` streams Arrow batches
(bound by ``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor
memory is O(batch), not O(partition). Repartition by a key before
heavy decode stages to balance skewed media sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_samples", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pixels", T.BinaryType(), True),  # H*W*C uint8, row-major
    ]
)


def synthesize_media(
    spark: SparkSession, n: int = 64, kind: str = "image"
) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derive
    from md5(media_id), metadata is small but varied."""
    rows = []
    for i in range(n):
        seed = hashlib.md5(f"media{i}".encode()).digest()
        content = (seed * 8)[: 64 + (i % 5) * 16]
        if kind == "image":
            meta = (8 + i % 4, 6 + i % 3, 3, None, None, None, "fake-rgb")
        elif kind == "audio":
            meta = (None, None, 1, 16000, 1024 + 64 * (i % 7), None, "fake-pcm")
        else:
            meta = (4, 4, 3, None, None, 4 + i % 5, "fake-video")
        rows.append((i, kind, bytearray(content), meta))
    # ONE source slice (r14): createDataFrame parallelizes n=64 fixture
    # rows into 32 pickled RDD partitions, and every chained
    # mapInPandas stage over them then spins up 32 Python worker
    # pipelines for ~2 rows each — measured 112 s of summed executor
    # task time on the resize gate, all fixed per-worker overhead.
    # (A downstream coalesce(1) is NOT the fix: the coalesced task
    # computes the 32 parent python-RDD slices serially — measured
    # 4.8 s for the bare 64-row source.) The rows are KiB-sized test
    # media; one task does the whole table in milliseconds. Production
    # media tables enter through parquet scans, not this synthesizer.
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), MEDIA_SCHEMA
    )


def _fake_decode_image(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """DETERMINISTIC FAKE decoder: tile the payload bytes into an
    (height, width, channels) uint8 buffer. Replaces PIL.Image.open in
    environments without codecs; same shape/dtype contract."""
    need = width * height * channels
    buf = np.frombuffer((payload * (need // max(len(payload), 1) + 1))[:need], dtype=np.uint8)
    return buf.reshape((height, width, channels))


def _try_real_decode(payload: bytes):  # pragma: no cover - codec-dependent
    try:
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except Exception:
        return None


def decode_images(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Image payloads → raw pixel buffers via ``mapInPandas``: streams
    Arrow record batches, emits (media_id, width, height, channels,
    pixels). The real-codec path is attempted per batch only when
    requested; the deterministic fake keeps the full pipeline testable
    without image libraries."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            # column-zip iteration: per-row numpy work on variable-size
            # buffers is unavoidable, but pulling the columns once beats
            # iterrows' per-row Series construction by ~100x
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                arr = None
                if use_real_codec:
                    arr = _try_real_decode(content)
                if arr is None:
                    arr = _fake_decode_image(bytes(content), w, h, c)
                out["media_id"].append(mid)
                out["height"].append(arr.shape[0])
                out["width"].append(arr.shape[1])
                out["channels"].append(arr.shape[2])
                out["pixels"].append(arr.tobytes())
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "content", "meta")
        .mapInPandas(decode, DECODED_IMAGE_SCHEMA)
    )


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize on raw buffers (pure numpy indexing —
    no codec needed). Output schema matches DECODED_IMAGE_SCHEMA with
    the new dimensions."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            for mid, h, w, c, pixels in zip(
                pdf["media_id"], pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
            ):
                h, w, c = int(h), int(w), int(c)
                arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape((h, w, c))
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                res = arr[ys][:, xs]
                out["media_id"].append(mid)
                out["height"].append(out_h)
                out["width"].append(out_w)
                out["channels"].append(c)
                out["pixels"].append(res.tobytes())
            yield pd.DataFrame(out)

    return decoded.mapInPandas(resize, DECODED_IMAGE_SCHEMA)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean", T.ArrayType(T.DoubleType()), True),  # per channel
        T.StructField("std", T.ArrayType(T.DoubleType()), True),
        T.StructField("entropy_bits", T.DoubleType(), True),
    ]
)


def image_features(decoded: DataFrame) -> DataFrame:
    """Per-channel mean/std + byte-histogram entropy, numpy-vectorized
    inside ``mapInPandas`` (the shape a real embedding-extraction stage
    would take; swap the body for a model forward pass). Carries
    width/height through so consumers never need a second pass over
    the decoded frame — decode is the dominant cost at scale and must
    run exactly once."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "mean": [],
                "std": [],
                "entropy_bits": [],
            }
            for mid, h, w, c, pixels in zip(
                pdf["media_id"], pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
            ):
                h, w, c = int(h), int(w), int(c)
                arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape((h, w, c))
                flat = arr.reshape(-1, c).astype(np.float64)
                hist = np.bincount(arr.reshape(-1), minlength=256)
                p = hist[hist > 0] / hist.sum()
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean"].append(flat.mean(axis=0).tolist())
                out["std"].append(flat.std(axis=0).tolist())
                out["entropy_bits"].append(float(-(p * np.log2(p)).sum()))
            yield pd.DataFrame(out)

    return decoded.mapInPandas(feats, IMAGE_FEATURES_SCHEMA)


DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("samples", T.BinaryType(), True),  # uint8 PCM-ish
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Audio payloads → raw sample buffers, the audio twin of
    :func:`decode_images`. The deterministic fake tiles the payload
    bytes to ``meta.n_samples`` unsigned 8-bit samples (a real codec
    — soundfile/ffmpeg — slots in at this boundary with the same
    shape contract: one buffer row per media row)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "n_samples": [], "samples": []}
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                n = int(meta["n_samples"])
                payload = bytes(content)
                buf = np.frombuffer(
                    (payload * (n // max(len(payload), 1) + 1))[:n], dtype=np.uint8
                )
                out["media_id"].append(mid)
                out["sample_rate"].append(int(meta["sample_rate"]))
                out["n_samples"].append(n)
                out["samples"].append(buf.tobytes())
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "audio")
        .select("media_id", "content", "meta")
        .mapInPandas(decode, DECODED_AUDIO_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("mean_amp", T.DoubleType(), True),
        T.StructField("mean_abs", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def audio_features(decoded: DataFrame) -> DataFrame:
    """Signal statistics per clip, numpy-vectorized in one
    ``mapInPandas`` pass (swap the body for a real feature extractor /
    embedding model). Samples are centered at 128 (unsigned PCM-8
    convention); all statistics are integer sums, so float64 averages
    are summation-order-independent and the DuckDB oracle can mirror
    them bit-exactly. Carries sample_rate/n_samples through so no
    consumer ever re-runs the decode (the r3 image double-decode
    lesson, applied from the start)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "sample_rate": [],
                "n_samples": [],
                "mean_amp": [],
                "mean_abs": [],
                "zero_crossings": [],
                "peak": [],
            }
            for mid, sr, n, samples in zip(
                pdf["media_id"], pdf["sample_rate"], pdf["n_samples"], pdf["samples"]
            ):
                s = np.frombuffer(bytes(samples), dtype=np.uint8).astype(np.int64) - 128
                nonneg = s >= 0
                out["media_id"].append(mid)
                out["sample_rate"].append(int(sr))
                out["n_samples"].append(int(n))
                out["mean_amp"].append(float(s.mean()))
                out["mean_abs"].append(float(np.abs(s).mean()))
                out["zero_crossings"].append(int(np.sum(nonneg[1:] != nonneg[:-1])))
                out["peak"].append(int(np.abs(s).max()))
            yield pd.DataFrame(out)

    return decoded.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_len", T.IntegerType(), True),
        T.StructField("byte_sum", T.LongType(), True),
    ]
)


def frame_stats(frames: DataFrame) -> DataFrame:
    """Per-frame length + byte checksum (the verification stage a
    frame-sampling pipeline runs before handing frames to a model;
    integer sums → bit-exact DuckDB twin)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame_len": [], "byte_sum": []}
            for mid, idx, frame in zip(
                pdf["media_id"], pdf["frame_index"], pdf["frame"]
            ):
                buf = np.frombuffer(bytes(frame), dtype=np.uint8)
                out["media_id"].append(mid)
                out["frame_index"].append(int(idx))
                out["frame_len"].append(len(buf))
                out["byte_sum"].append(int(buf.sum()))
            yield pd.DataFrame(out)

    return frames.mapInPandas(stats, FRAME_STATS_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video payloads → every k-th frame as its own row. The payload is
    treated as ``n_frames`` equal slabs (a real container demuxer slots
    in at the slab boundary — marked below); slab slicing, index
    arithmetic and row fan-out are the real distributed work."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame": []}
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                n = int(meta["n_frames"])
                payload = bytes(content)
                # NotImplemented: real demux (pyav/ffmpeg) — fixed-size
                # slab split stands in, same per-frame bytes contract
                slab = max(len(payload) // max(n, 1), 1)
                for idx in range(0, n, every_k):
                    out["media_id"].append(mid)
                    out["frame_index"].append(idx)
                    out["frame"].append(payload[idx * slab : (idx + 1) * slab])
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "content", "meta")
        .mapInPandas(frames, FRAME_SCHEMA)
    )
