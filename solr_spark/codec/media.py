"""Pure-Python media codecs for the multimodal pipeline: PPM/BMP images and
WAV audio — formats simple enough to decode correctly with numpy alone, so the
multimodal operators (functions/multimodal.py) have a REAL `fake=False` path
in environments without PIL/ffmpeg. Encoders are provided for synthesizing
test bytes and for resize_images round-trips.

Written from the published format specifications (netpbm P3/P6, Windows
BITMAPINFOHEADER 24bpp BI_RGB, RIFF/WAVE PCM); no external code.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- PPM (P3/P6)


def _ppm_tokens(buf: bytes):
    """Netpbm header tokenizer: whitespace-separated tokens, '#' comments run
    to end of line. Yields (token, offset-after-token)."""
    i = 0
    n = len(buf)
    while i < n:
        c = buf[i:i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"#":
            while i < n and buf[i:i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and buf[j:j + 1] not in b" \t\r\n":
                j += 1
            yield buf[i:j], j
            i = j


def decode_ppm(content: bytes) -> np.ndarray:
    """PPM -> HxWx3 uint8. P6 (binary) and P3 (ASCII), maxval <= 255."""
    toks = _ppm_tokens(content)
    magic, _ = next(toks)
    if magic not in (b"P3", b"P6"):
        raise ValueError(f"not a PPM: magic {magic!r}")
    (w, _), (h, _), (maxval, off) = next(toks), next(toks), next(toks)
    w, h, maxval = int(w), int(h), int(maxval)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    if magic == b"P6":
        # exactly ONE whitespace byte separates the header from raster data
        raster = content[off + 1: off + 1 + w * h * 3]
        if len(raster) != w * h * 3:
            raise ValueError("truncated P6 raster")
        img = np.frombuffer(raster, dtype=np.uint8)
    else:
        vals = [int(t) for t, _ in _ppm_tokens(content[off:])]
        if len(vals) < w * h * 3:
            raise ValueError("truncated P3 raster")
        img = np.asarray(vals[: w * h * 3], dtype=np.uint8)
    return img.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ------------------------------------------------------- BMP (24bpp, BI_RGB)


def decode_bmp(content: bytes) -> np.ndarray:
    """BMP -> HxWx3 uint8 (RGB). Uncompressed 24bpp BITMAPINFOHEADER only;
    positive height = bottom-up rows (the common case), negative = top-down."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    comp = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (bpp={bpp} comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(content, dtype=np.uint8,
                         count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = raster.tobytes()
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(data), 2835, 2835, 0, 0))
    return header + data


# --------------------------------------------------------- WAV (RIFF, PCM)


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """WAV -> (float32 mono PCM in [-1, 1], sample_rate). PCM 8/16-bit,
    any channel count (channels average to mono)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only PCM 8/16-bit supported (fmt={audio_format}, "
                         f"bits={bits})")
    if bits == 16:
        pcm = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        pcm = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
               - 128.0) / 128.0
    n = (len(pcm) // channels) * channels
    return pcm[:n].reshape(-1, channels).mean(axis=1).astype(np.float32), rate


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """float [-1,1] mono -> 16-bit PCM WAV."""
    samples = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    raw = np.round(samples * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)


def resample_linear(pcm: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Deterministic linear-interpolation resample (mono float32)."""
    if src_rate == dst_rate or len(pcm) == 0:
        return pcm.astype(np.float32)
    n_out = max(1, int(round(len(pcm) * dst_rate / src_rate)))
    x_out = np.linspace(0.0, len(pcm) - 1.0, n_out)
    return np.interp(x_out, np.arange(len(pcm)), pcm).astype(np.float32)
