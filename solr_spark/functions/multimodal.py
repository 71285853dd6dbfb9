"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

A 100-TB training-data pipeline carries media as `binary` content columns with a
typed metadata struct, processed by Arrow-batched kernels over mapInPandas. The
Spark-side plumbing here — schemas, batch shapes, partition-size control, UDF
signatures — is real and tested; the actual codec calls (PIL/ffmpeg/soundfile are
not in this environment) sit behind `_decode_image_bytes` etc., which raise
NotImplementedError unless `fake=True` picks the deterministic stand-in
(md5-seeded, reproducible across engines/retries).

Schema conventions:
    content:  binary                      raw encoded bytes (never parsed JVM-side)
    meta:     struct<mime string, width int, height int, duration_ms int>
Feature output: array<float> of fixed dimension (joins the ANN path in
solr_spark.functions.vectors).

Scale notes: media rows are orders of magnitude wider than text rows — callers
should write media tables with small `spark.sql.files.maxPartitionBytes` and
treat `content` as the LAST column (parquet column pruning then skips the blobs
for metadata-only queries).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "mime string, width int, height int, duration_ms int"


# ------------------------------------------------------------- codec boundary

def _decode_image_bytes(content: bytes, fake: bool) -> np.ndarray:
    """Decode encoded image bytes -> HxWx3 uint8 array.

    REAL path (fake=False): pure-Python PPM (P3/P6) and 24bpp BMP decoders
    (solr_spark/codec/media.py — no PIL needed). Other formats (JPEG/PNG)
    still require an external codec and raise NotImplementedError. The
    deterministic fake derives an 8x8x3 'image' from md5(content) so every
    downstream kernel has honest array shapes and reproducible values.
    """
    if not fake:
        from solr_spark.codec import media

        if content[:2] in (b"P3", b"P6"):
            return media.decode_ppm(content)
        if content[:2] == b"BM":
            return media.decode_bmp(content)
        raise NotImplementedError(
            "real decode supports PPM/BMP (codec/media.py); JPEG/PNG need "
            "PIL/turbojpeg — or pass fake=True for the deterministic test "
            "codec")
    seed = np.frombuffer(hashlib.md5(content).digest(), dtype=np.uint8)
    return np.tile(seed, 12)[: 8 * 8 * 3].reshape(8, 8, 3)


def _decode_audio_bytes(content: bytes, sr: int, fake: bool) -> np.ndarray:
    """Decode audio bytes -> float32 mono PCM at `sr` Hz (1 second in the fake).

    REAL path (fake=False): pure-Python RIFF/WAVE PCM decoder + deterministic
    linear resample to `sr` (codec/media.py). Compressed formats need
    soundfile/ffmpeg and raise NotImplementedError."""
    if not fake:
        from solr_spark.codec import media

        if content[:4] == b"RIFF":
            pcm, rate = media.decode_wav(content)
            return media.resample_linear(pcm, rate, sr)
        raise NotImplementedError(
            "real decode supports WAV PCM (codec/media.py); compressed audio "
            "needs soundfile/ffmpeg — or pass fake=True for the "
            "deterministic test codec")
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(sr).astype(np.float32)


# ------------------------------------------------------------------ operators

def image_features(df: DataFrame, content_col: str = "content",
                   id_col: str = "media_id", dim: int = 64,
                   fake: bool = True) -> DataFrame:
    """Batch feature extraction: binary column -> array<float> embedding.

    mapInPandas processes a whole Arrow batch of blobs per Python call; the
    per-image work is the decode + a pooled projection (mean-pooled pixel blocks
    in the fake; a real model slots into the same loop). Output: id, features.
    """
    id_field = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            feats = []
            for blob in pdf[content_col]:
                img = _decode_image_bytes(bytes(blob), fake).astype(np.float32)
                flat = img.reshape(-1)
                pooled = np.resize(flat, dim) / 255.0
                feats.append(pooled.tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return (df.select(id_col, content_col)
              .mapInPandas(kernel, f"{id_col} {id_field}, features array<float>"))


def resize_images(df: DataFrame, content_col: str = "content",
                  id_col: str = "media_id", size: tuple[int, int] = (4, 4),
                  fake: bool = True) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-emit raw bytes + new meta.

    Output: id, content (binary, raw HxWx3), meta struct with updated dims.
    """
    h, w = size
    id_field = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            blobs, metas = [], []
            for blob in pdf[content_col]:
                img = _decode_image_bytes(bytes(blob), fake)
                ys = (np.arange(h) * img.shape[0] // h)
                xs = (np.arange(w) * img.shape[1] // w)
                small = img[np.ix_(ys, xs)]
                blobs.append(small.tobytes())
                metas.append({"mime": "image/raw", "width": w, "height": h,
                              "duration_ms": 0})
            yield pd.DataFrame({id_col: pdf[id_col], "content": blobs,
                                "meta": metas})

    return (df.select(id_col, content_col)
              .mapInPandas(kernel,
                           f"{id_col} {id_field}, content binary, "
                           f"meta struct<{META_SCHEMA}>"))


def sample_frames(df: DataFrame, content_col: str = "content",
                  id_col: str = "media_id", every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (explode shape).

    The fake derives frame count from meta-less content length; a real decoder
    reads container timestamps. Output: id, frame_idx, frame (binary).
    """
    id_field = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(blob)
                n_frames = max(1, len(blob) % 7)  # deterministic fake cadence
                for i in range(n_frames):
                    img = _decode_image_bytes(blob + i.to_bytes(4, "big"), fake)
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(img.tobytes())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return (df.select(id_col, content_col)
              .mapInPandas(kernel,
                           f"{id_col} {id_field}, frame_idx int, frame binary"))


def audio_features(df: DataFrame, content_col: str = "content",
                   id_col: str = "media_id", sr: int = 1600, n_bands: int = 16,
                   fake: bool = True) -> DataFrame:
    """Audio -> band-energy features (|rFFT| pooled into n_bands), Arrow-batched."""
    id_field = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            feats = []
            for blob in pdf[content_col]:
                pcm = _decode_audio_bytes(bytes(blob), sr, fake)
                spec = np.abs(np.fft.rfft(pcm))
                bands = np.array_split(spec, n_bands)
                feats.append([float(b.mean()) for b in bands])
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return (df.select(id_col, content_col)
              .mapInPandas(kernel, f"{id_col} {id_field}, features array<float>"))


def synth_media(spark, n: int, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table (binary blobs + typed metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        blob = rng.integers(0, 256, size=int(rng.integers(64, 257)),
                            dtype=np.uint8).tobytes()
        rows.append((i, blob, {"mime": "image/jpeg", "width": 640, "height": 480,
                               "duration_ms": 0}))
    return spark.createDataFrame(
        rows, f"media_id long, content binary, meta struct<{META_SCHEMA}>")
