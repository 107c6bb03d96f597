"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas`` kernels.

Codec inventory (probed 2026-08-16 in this container): PIL, cv2, imageio,
skimage, av, soundfile and librosa are all ABSENT; the only codec shipped is
the stdlib ``wave`` module. Consequently:

- ``decode_audio`` is a REAL decoder for PCM WAV payloads (stdlib wave +
  numpy frombuffer — no external deps), with real features over mapInPandas.
- ``decode_image`` stays STUBBED: it raises ``NotImplementedError`` unless
  ``fake=True``, in which case a deterministic fake decoder (pure function
  of the bytes) stands in so the Spark-side plumbing — schema, batch shape,
  partitioning, UDF signature — is real and fully tested. Swapping in PIL
  later touches exactly one function.

Scale design: media bytes never pass through the driver; each worker sees an
Arrow batch of (id, bytes, meta) and emits fixed-width feature rows. Batch
size is bounded by bytes not rows (``media_repartition`` sizes partitions by
total payload) so one 4K video can't OOM a task that also holds 10k thumbnails.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, sha256 string, feat array<float>"


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    STUB: real decoding needs an image codec not present in this container.
    ``fake=True`` produces a deterministic 8x8x3 array derived from the
    payload's sha256 — stable plumbing stand-in for tests/benchmarks.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec (e.g. PIL); "
            "not available in this environment — use fake=True for plumbing tests"
        )
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).copy()


def decode_audio(payload: bytes) -> tuple[int, int, np.ndarray]:
    """REAL decode of a PCM WAV payload → (sample_rate, n_channels,
    samples float32 in [-1, 1], shape (n_frames, n_channels)).

    Stdlib-only (wave + numpy): 8-bit unsigned, 16-bit and 32-bit signed
    PCM. Raises ``wave.Error`` on non-WAV bytes — callers in kernels catch
    and null out the row rather than failing the task."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return rate, nch, x.reshape(-1, nch)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, duration_ms long, "
    "rms float, peak float"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """(media_id, sample_rate, n_channels, duration_ms, rms, peak) — real
    WAV decode + per-clip stats over Arrow batches. Non-WAV/corrupt payloads
    yield a row of nulls (ingest must not die on one bad file)."""
    import wave

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in ("sample_rate", "n_channels", "duration_ms", "rms", "peak")}
            for payload in pdf["payload"]:
                try:
                    rate, nch, x = decode_audio(bytes(payload or b""))
                    out["sample_rate"].append(rate)
                    out["n_channels"].append(nch)
                    out["duration_ms"].append(int(1000 * len(x) / rate) if rate else 0)
                    out["rms"].append(float(np.sqrt((x**2).mean())) if x.size else 0.0)
                    out["peak"].append(float(np.abs(x).max()) if x.size else 0.0)
                except (wave.Error, EOFError, ValueError):
                    for k in out:
                        out[k].append(None)
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(), **out})

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=AUDIO_FEATURE_SCHEMA
    )


def media_repartition(media: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Partition media rows so each task holds ≈``target_bytes`` of payload:
    repartition on a byte-budget bucket key instead of row count. (Media
    sizes are wildly skewed; row-count partitioning puts ten 4K videos in
    one task.)"""
    sized = media.withColumn("_sz", F.coalesce(F.length("payload"), F.lit(0)))
    total = sized.agg(F.sum("_sz")).collect()[0][0] or 0
    n_parts = max(1, int(total / target_bytes) + 1)
    return sized.repartition(n_parts, F.pmod(F.xxhash64("media_id"), F.lit(n_parts))).drop(
        "_sz"
    )


def extract_media_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """(media_id, n_bytes, sha256, feat) — decode + feature-extract over
    Arrow batches. Features: 12-dim mean-pooled channel stats of the decoded
    array (deterministic with the fake decoder)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, hashes, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest())
                arr = decode_image(b, fake=fake_decode).astype(np.float32)
                # 12-dim: per-channel mean/std/min/max — vectorized numpy
                feats.append(
                    np.concatenate(
                        [
                            arr.mean(axis=(0, 1)),
                            arr.std(axis=(0, 1)),
                            arr.min(axis=(0, 1)),
                            arr.max(axis=(0, 1)),
                        ]
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": np.asarray(sizes, dtype=np.int64),
                    "sha256": hashes,
                    "feat": [f for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_ts_ms) — the frame-sampling plan for video rows:
    pure column arithmetic (sequence over duration), no decode. The decode
    of each sampled frame would run through the same mapInPandas pattern as
    extract_media_features."""
    return (
        media.filter(F.col("kind") == "video")
        .filter(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the plumbing: payload is a
    pure function of (seed, id); sizes are skewed (one 'video' per 50 rows
    is 100× larger) so byte-budget partitioning is actually tested."""
    kinds = F.when(F.pmod(F.col("media_id"), F.lit(50)) == 0, F.lit("video")).otherwise(
        F.when(F.pmod(F.col("media_id"), F.lit(2)) == 0, F.lit("image")).otherwise(
            F.lit("audio")
        )
    )
    rep = F.when(F.pmod(F.col("media_id"), F.lit(50)) == 0, F.lit(400)).otherwise(F.lit(4))
    return (
        spark.range(n)
        .withColumnRenamed("id", "media_id")
        .select(
            "media_id",
            kinds.alias("kind"),
            F.repeat(
                F.conv(
                    F.abs(F.xxhash64(F.lit(seed), F.col("media_id"))).cast("string"),
                    10,
                    16,
                ),
                rep,
            )
            .cast("binary")
            .alias("payload"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.when(
                F.pmod(F.col("media_id"), F.lit(50)) == 0,
                (F.pmod(F.xxhash64(F.col("media_id")), F.lit(10000)) + 1000),
            ).alias("duration_ms"),
        )
    )
