"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns + typed metadata structs; all
decode/resize/frame-sample kernels run as Arrow-batched ``mapInPandas`` stages so
the Spark-side contract (schema, partitioning, batch shape) is real and tested.

The decode boundary is REAL for lossless formats: PNG and RIFF/WAVE payloads are
sniffed by signature and decoded with the pure-stdlib codecs in
``functions/codecs.py`` (DEFLATE lives in stdlib zlib; WAV PCM is plain struct
layout). Lossy formats (JPEG/MP3/...) stay honestly STUBBED — their codec
libraries are absent in this container — raising NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded from the
bytes) produces stable pseudo-pixels/PCM so downstream feature extraction is
exercisable end-to-end for arbitrary payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_image(payload: bytes, width: int, height: int, channels: int, *, fake: bool = False) -> np.ndarray:
    """Decode an image payload to (height, width, channels) uint8.

    REAL decode for PNG (sniffed by signature) via the pure-stdlib codec
    (functions/codecs.py — DEFLATE lives in stdlib zlib, so no external lib is
    needed); the decoded file's own dimensions win over the metadata hints.
    Lossy formats (JPEG etc.) remain STUBBED — their codecs (PIL/libjpeg) are
    absent in this container — and raise unless ``fake=True``, in which case a
    deterministic fake decoder (seeded from sha256(payload)) produces stable
    pseudo-pixels shaped by the metadata.
    """
    from .codecs import PNG_MAGIC, decode_png

    if payload and bytes(payload[:8]) == PNG_MAGIC:
        try:
            return decode_png(bytes(payload))
        except Exception:
            if not fake:
                raise
            # fake mode keeps its contract: NEVER raise — a corrupt or
            # unsupported-variant PNG falls through to the fake decoder
    if not fake:
        raise NotImplementedError(
            "only PNG decode is available without external codec libraries "
            "(lossy formats need PIL/libjpeg, absent in this environment); "
            "pass fake=True for the deterministic test decoder"
        )
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.RandomState(seed % (2**32))
    return rng.randint(0, 256, size=(height, width, channels), dtype=np.uint8)


def image_features(media: DataFrame, *, grid: int = 4, fake_decode: bool = True) -> DataFrame:
    """Decode → downsample to a grid×grid mean-intensity feature vector.

    The Spark-side shape is the production one: mapInPandas over Arrow batches of
    (media_id, payload, meta); only the innermost decode is stubbed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            # zip over raw numpy columns — decode is inherently per-image but
            # per-row pandas Series construction (iterrows) is pure overhead
            for mid, payload, m in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(), pdf["meta"].to_numpy()
            ):
                w = int(m["width"] or 16)
                h = int(m["height"] or 16)
                c = int(m["channels"] or 3)
                img = decode_image(payload, w, h, c, fake=fake_decode).astype(np.float32)
                h, w, c = img.shape  # decoded file's own dims win (real codecs)
                gh, gw = max(1, h // grid), max(1, w // grid)
                if h < grid or w < grid:
                    # image smaller than the grid in some dimension: NN-expand
                    # to exactly (grid*gh, grid*gw) so pooling always reshapes
                    ridx = (np.arange(grid * gh) * h) // (grid * gh)
                    cidx = (np.arange(grid * gw) * w) // (grid * gw)
                    img = img[ridx][:, cidx]
                else:
                    img = img[: gh * grid, : gw * grid]
                pooled = img.reshape(grid, gh, grid, gw, c).mean(axis=(1, 3, 4))
                feats.append((pooled / 255.0).ravel().astype(np.float32))
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return media.filter(F.col("kind") == "image").select("media_id", "payload", "meta").mapInPandas(
        run, FEATURE_SCHEMA
    )


PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("pix", T.ArrayType(T.IntegerType()), False),
    ]
)


def decoded_pixels(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """Decode → flattened HWC uint8 pixel buffer as array<int> (row-major).

    Debug/verification surface: materializing this table makes everything
    DOWNSTREAM of the decode (grid pooling, feature arithmetic) independently
    replayable by an external engine, isolating the only non-replayable step
    (the codec) — the same artifact-oracle trick the dedup family uses for
    xxhash64 signatures.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pixes = [], []
            for mid, payload, m in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(), pdf["meta"].to_numpy()
            ):
                w = int(m["width"] or 16)
                h = int(m["height"] or 16)
                c = int(m["channels"] or 3)
                img = decode_image(payload, w, h, c, fake=fake_decode)
                ids.append(mid)
                pixes.append(img.ravel().astype(np.int32))  # actual decoded dims
            yield pd.DataFrame({"media_id": ids, "pix": pixes})

    return media.filter(F.col("kind") == "image").select("media_id", "payload", "meta").mapInPandas(
        run, PIXELS_SCHEMA
    )


SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("samples", T.ArrayType(T.FloatType()), False),
    ]
)


def decoded_samples(media: DataFrame, n_samples: int, *, fake_decode: bool = True) -> DataFrame:
    """Materializes the audio decode boundary (analog of ``decoded_pixels``):
    (media_id, float32 PCM array of length ``n_samples``) for every audio row.
    Written to parquet by the oracle harness so window-RMS arithmetic can be
    replayed independently downstream of the codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, arrs = [], []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"].to_numpy()):
                ids.append(mid)
                arrs.append(decode_audio(payload, n_samples, fake=fake_decode))
            yield pd.DataFrame({"media_id": ids, "samples": arrs})

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        run, SAMPLES_SCHEMA
    )


def decode_audio(payload: bytes, n_samples: int, *, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to float32 PCM of length ``n_samples``.

    REAL decode for RIFF/WAVE (sniffed by signature) via the pure-stdlib codec
    (functions/codecs.py): PCM 8/16/32-bit and IEEE float32, multi-channel
    mixed to mono, truncated/zero-padded to ``n_samples`` (deterministic fixed-
    length contract for windowed features). Compressed formats (MP3/AAC/OGG)
    remain STUBBED — no codec libs in this container — and raise unless
    ``fake=True`` (deterministic pseudo-PCM seeded from sha256(payload))."""
    if payload and bytes(payload[:4]) == b"RIFF":
        from .codecs import decode_wav

        try:
            x, _rate = decode_wav(bytes(payload))
        except Exception:
            if not fake:
                raise
            x = None  # fake mode: corrupt/non-WAVE RIFF falls through to fake
        if x is not None:
            if len(x) >= n_samples:
                return x[:n_samples]
            return np.pad(x, (0, n_samples - len(x)))
    if not fake:
        raise NotImplementedError(
            "only WAV decode is available without external codec libraries "
            "(compressed audio needs libsndfile/ffmpeg, absent in this environment); "
            "pass fake=True for the deterministic test decoder"
        )
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[8:16], "big")
    rng = np.random.RandomState(seed % (2**32))
    return (rng.rand(n_samples).astype(np.float32) * 2.0) - 1.0


def audio_features(
    media: DataFrame, *, n_windows: int = 8, window_samples: int = 256, fake_decode: bool = True
) -> DataFrame:
    """Audio → per-window RMS-energy feature vector (length ``n_windows``).

    Same production shape as image_features: mapInPandas over Arrow batches,
    only the innermost decode stubbed. RMS per fixed-size window is the
    standard cheap audio fingerprint input (silence detection, energy
    profiles) and needs no FFT library.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        total = n_windows * window_samples
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"].to_numpy(), pdf["payload"].to_numpy()):
                pcm = decode_audio(payload, total, fake=fake_decode)
                # float64 accumulation: PCM16-derived samples are k/2^15 (≤16
                # mantissa bits), so products are exact in double and a 256-term
                # window sum stays ≤40 bits — exact regardless of summation
                # order, which makes the RMS bit-reproducible by any engine.
                w = pcm.reshape(n_windows, window_samples).astype(np.float64)
                feats.append(np.sqrt((w * w).mean(axis=1)).astype(np.float32))
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), False),
                    T.StructField("height", T.IntegerType(), False),
                    T.StructField("channels", T.IntegerType(), False),
                ]
            ),
            False,
        ),
    ]
)


def image_resize(
    media: DataFrame, *, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """Decode → nearest-neighbour resize → raw-pixel payload + updated meta.

    The resize kernel itself is real numpy index arithmetic (the part a
    production pipeline keeps when swapping in a real codec); output payload
    is the raw HWC uint8 buffer, the interchange form a downstream training
    loader consumes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for mid, payload, m in zip(
                pdf["media_id"].to_numpy(), pdf["payload"].to_numpy(), pdf["meta"].to_numpy()
            ):
                w0 = int(m["width"] or 16)
                h0 = int(m["height"] or 16)
                c = int(m["channels"] or 3)
                img = decode_image(payload, w0, h0, c, fake=fake_decode)
                h0, w0, c = img.shape  # decoded file's own dims win
                rows = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                cols = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                out = img[rows][:, cols]
                ids.append(mid)
                payloads.append(out.tobytes())
                metas.append({"width": width, "height": height, "channels": c})
            yield pd.DataFrame({"media_id": ids, "payload": payloads, "meta": metas})

    return media.filter(F.col("kind") == "image").select("media_id", "payload", "meta").mapInPandas(
        run, RESIZED_SCHEMA
    )


def frame_sample(media: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Video → (media_id, frame_idx) rows for frames 0, n, 2n, … — pure JVM
    (sequence+explode); the frame *decode* would attach via image_features."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def synthesize_media_lossless(
    spark, n: int, *, seed: int = 42, width: int = 16, height: int = 16,
    n_samples: int = 2048, sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic media table with REAL lossless payloads: images are PNG
    bytes (encoded with the pure-stdlib codec, filter cycling through all five
    types so every unfilter path is exercised in the wild) and audio is PCM16
    WAV. Generated distributively via mapInPandas — per-row content is a pure
    function of (seed, id), so the table is identical at any parallelism.
    Exercises the production decode path end-to-end (``fake_decode=False``)."""
    from .codecs import encode_png, encode_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads, metas = [], [], [], []
            for i in pdf["id"].to_numpy():
                i = int(i)
                rng = np.random.RandomState((seed * 1_000_003 + i) % (2**32))
                if i % 2 == 0:
                    img = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
                    payloads.append(encode_png(img, filter_type=(i // 2) % 5))
                    kinds.append("image")
                    metas.append({"width": width, "height": height, "channels": 3,
                                  "sample_rate": None, "n_frames": None})
                else:
                    pcm = ((rng.rand(n_samples) * 2.0) - 1.0) * 0.5
                    payloads.append(encode_wav(pcm, sample_rate))
                    kinds.append("audio")
                    metas.append({"width": None, "height": None, "channels": None,
                                  "sample_rate": sample_rate, "n_frames": None})
                ids.append(f"L-{i}")
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def synthesize_media(spark, n: int, *, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks (no external data)."""
    df = spark.range(n).select(
        F.concat(F.lit("m-"), F.col("id").cast("string")).alias("media_id"),
        F.when(F.col("id") % 3 == 0, F.lit("image"))
        .when(F.col("id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256).cast("binary").alias("payload"),
        F.struct(
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(16000).alias("sample_rate"),
            (F.col("id") % 100 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    return df
