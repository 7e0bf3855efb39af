"""Multimodal (image/audio/video) columns for training-data pipelines.

Media rides in opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels (numpy inside, nothing row-at-a-time in Python
beyond the per-blob loop a codec requires).

REAL decoders (stdlib + numpy only — no codec libraries needed):
  - WAV audio (``wave`` module): duration, rate, channels, RMS,
    zero-crossing rate, 8-band spectral energy profile (rFFT).
  - PPM (P6) images: full pixel decode.
  - BMP (24-bit uncompressed) images: full pixel decode.
  - PNG (8-bit gray/RGB/RGBA, non-interlaced): zlib inflate + scanline
    unfiltering (filters 0-4 incl. Paeth), pure numpy per row.
  - Image features: mean/std per channel + 4x4 block-mean luma grid
    (a pooled 16-dim embedding stand-in); block-mean resize.
  - Video frame sampling for concatenated-PPM streams AND MP4/ISO-BMFF
    containers (mp4.py: box walk + full sample-table expansion);
    Motion-JPEG tracks decode to pixels, other codecs yield per-frame
    bytes + metadata; ``video_metadata`` probes codec/dims/fps/keyframes.
  - JPEG (jpeg.py): from-scratch ITU T.81 codec — baseline sequential
    AND progressive (SOF2), Huffman + DCT in numpy, 4:4:4/4:2:0,
    restart markers, spectral selection + successive approximation.

Formats still needing real codec libs (H.264/HEVC entropy decode,
arithmetic-coded JPEG, ...) raise ``UnsupportedMediaError`` per blob and
land in the ``error`` column — the pipeline keeps flowing (bad blobs are
data, not crashes).
"""
from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)


class UnsupportedMediaError(ValueError):
    """Raised per-blob for formats that need external codec libraries."""


MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),    # opaque encoded bytes
    StructField("mime", StringType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha1", StringType()),
    StructField("features", ArrayType(FloatType())),  # pooled embedding
    StructField("error", StringType()),
])

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_sec", FloatType()),
    StructField("rms", FloatType()),
    StructField("zero_cross_rate", FloatType()),
    StructField("spectral", ArrayType(FloatType())),  # 8-band energy
    StructField("error", StringType()),
])

FRAME_SAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("frame_sha1", StringType()),
    StructField("mean_luma", FloatType()),
])

RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("pixels", BinaryType()),  # uint8 RGB, row-major
    StructField("error", StringType()),
])


# ---------------------------------------------------------------------------
# image decode (pure numpy + stdlib)
# ---------------------------------------------------------------------------

def _ppm_header(data: bytes, pos: int = 0) -> Tuple[int, int, int, int]:
    """Parse a P6 header at ``pos`` -> (w, h, maxval, pixel_offset).
    Handles arbitrary whitespace and # comments."""
    if data[pos:pos + 2] != b"P6":
        raise UnsupportedMediaError("not a P6 PPM")
    pos += 2
    fields = []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise UnsupportedMediaError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    return fields[0], fields[1], fields[2], pos


def decode_ppm(data: bytes, pos: int = 0) -> np.ndarray:
    """P6 binary PPM -> (h, w, 3) uint8."""
    w, h, maxval, off = _ppm_header(data, pos)
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PPM unsupported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=off)
    return px.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> P6 PPM bytes (test/fixture helper)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 (RGB)."""
    if data[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    px_offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={comp} unsupported")
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # 4-byte row padding
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h,
                         offset=px_offset).reshape(h, row_bytes)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flipped else img


_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """8-bit gray/RGB/RGBA non-interlaced PNG -> (h, w, c) uint8.

    Full scanline unfiltering (types 0-4 incl. Paeth) with numpy row
    ops; the sequential left-dependency of filters 1/3/4 runs per row.
    """
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise UnsupportedMediaError("not a PNG")
    pos = 8
    idat = []
    w = h = None
    bit_depth = color_type = interlace = None
    while pos < len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise UnsupportedMediaError("malformed PNG")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace:
        raise UnsupportedMediaError(
            f"PNG depth={bit_depth} color={color_type} interlace={interlace} "
            "unsupported (8-bit gray/RGB/RGBA only)")
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_pix = np.zeros(c, dtype=np.int32)
    for y in range(h):
        line = raw[y, 1:]
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: per-channel modular prefix sum (vectorized)
            out[y] = line.reshape(w, c).cumsum(axis=0, dtype=np.uint8) \
                .reshape(stride)
        elif f == 2:  # Up
            out[y] = line + out[y - 1] if y else line
        elif f in (3, 4):  # Average / Paeth: left-sequential, so iterate
            # pixel columns (c channels decoded per step, vectorized)
            prev = (out[y - 1].astype(np.int32) if y
                    else np.zeros(stride, np.int32)).reshape(w, c)
            line_px = line.astype(np.int32).reshape(w, c)
            cur = np.empty((w, c), dtype=np.int32)
            a = zero_pix
            for x in range(w):
                b = prev[x]
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    cc = prev[x - 1] if x else zero_pix
                    p = a + b - cc
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
                    pred = np.where((pa <= pb) & (pa <= pc), a,
                                    np.where(pb <= pc, b, cc))
                a = (line_px[x] + pred) & 0xFF
                cur[x] = a
            out[y] = cur.astype(np.uint8).reshape(stride)
        else:
            raise UnsupportedMediaError(f"PNG filter {f} invalid")
    return out.reshape(h, w, c)


def decode_image(data: bytes) -> Tuple[np.ndarray, str]:
    """Sniff + decode -> ((h, w, c) uint8, format name)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data), "png"
    if data[:2] == b"P6":
        return decode_ppm(data), "ppm"
    if data[:2] == b"BM":
        return decode_bmp(data), "bmp"
    if data[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg  # baseline JFIF, pure numpy
        return decode_jpeg(data), "jpeg"
    raise UnsupportedMediaError("unknown image format")


def _luma(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2 or img.shape[2] == 1:
        return img.reshape(img.shape[0], img.shape[1]).astype(np.float32)
    rgb = img[:, :, :3].astype(np.float32)
    return 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]


def block_mean_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average resize to (out_h, out_w, c) uint8 — pure numpy
    (index-mapped box filter; good enough for thumbnailing/pooling)."""
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = img[:, :, None]
    ys = (np.arange(out_h + 1) * h / out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w / out_w).astype(np.int64)
    csum = np.zeros((h + 1, w + 1, img.shape[2]), dtype=np.float64)
    csum[1:, 1:] = img.astype(np.float64).cumsum(0).cumsum(1)
    areas = ((ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :])
    out = (csum[ys[1:], :, :][:, xs[1:], :] - csum[ys[1:], :, :][:, xs[:-1], :]
           - csum[ys[:-1], :, :][:, xs[1:], :] + csum[ys[:-1], :, :][:, xs[:-1], :])
    return np.clip(out / areas[:, :, None], 0, 255).astype(np.uint8)


def image_feature_vec(img: np.ndarray) -> np.ndarray:
    """Pooled 22-dim feature: per-channel mean/std (first 3 channels) +
    16-dim 4x4 block-mean luma grid, all scaled to [0, 1]."""
    ch = img.reshape(img.shape[0], img.shape[1], -1)[:, :, :3].astype(np.float32)
    means = ch.mean(axis=(0, 1)) / 255.0
    stds = ch.std(axis=(0, 1)) / 255.0
    if means.shape[0] < 3:
        means = np.pad(means, (0, 3 - len(means)), constant_values=means[0])
        stds = np.pad(stds, (0, 3 - len(stds)), constant_values=stds[0])
    grid = block_mean_resize(_luma(img)[:, :, None], 4, 4).reshape(16) / 255.0
    return np.concatenate([means, stds, grid]).astype(np.float32)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def image_features(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Decode + feature-extract images (PNG/PPM/BMP real decode; other
    formats land in ``error``). At scale: repartition by size-balanced
    ranges first so no task gets all the large blobs."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                sha = hashlib.sha1(b).hexdigest()
                try:
                    img, fmt = decode_image(b)
                    rows.append((int(mid), img.shape[1], img.shape[0],
                                 img.shape[2] if img.ndim == 3 else 1, fmt,
                                 len(b), sha,
                                 image_feature_vec(img).tolist(), None))
                except (UnsupportedMediaError, ValueError, zlib.error,
                        struct.error) as e:
                    rows.append((int(mid), None, None, None, None, len(b),
                                 sha, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels", "format",
                "n_bytes", "sha1", "features", "error"])

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, out_w: int = 64, out_h: int = 64,
                  id_col: str = "media_id",
                  payload_col: str = "payload") -> DataFrame:
    """Thumbnail images to (out_w, out_h) RGB via block-mean resize;
    returns raw uint8 pixel bytes (row-major)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    img, _ = decode_image(bytes(payload))
                    if img.ndim == 2 or img.shape[2] == 1:
                        img = np.repeat(img.reshape(*img.shape[:2], 1), 3, axis=2)
                    small = block_mean_resize(img[:, :, :3], out_w, out_h)
                    rows.append((int(mid), out_w, out_h, small.tobytes(), None))
                except (UnsupportedMediaError, ValueError, zlib.error,
                        struct.error) as e:
                    rows.append((int(mid), None, None, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "pixels", "error"])

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(kernel, RESIZE_SCHEMA)


def audio_features(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Decode WAV audio (stdlib ``wave``) and compute duration, RMS,
    zero-crossing rate, and an 8-band spectral energy profile."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    with wave.open(io.BytesIO(bytes(payload))) as wf:
                        rate = wf.getframerate()
                        nch = wf.getnchannels()
                        width = wf.getsampwidth()
                        n = wf.getnframes()
                        raw = wf.readframes(n)
                    if width == 2:
                        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
                    elif width == 1:
                        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128) / 128.0
                    else:
                        raise UnsupportedMediaError(f"sample width {width} unsupported")
                    if nch > 1:
                        x = x.reshape(-1, nch).mean(axis=1)
                    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
                    if len(x):
                        spec = np.abs(np.fft.rfft(x)) ** 2
                        bands = np.array_split(spec, 8)
                        total = sum(float(b.sum()) for b in bands) or 1.0
                        prof = [float(b.sum()) / total for b in bands]
                    else:
                        prof = [0.0] * 8
                    rows.append((int(mid), rate, nch, int(n),
                                 float(n / rate) if rate else 0.0,
                                 rms, zcr, prof, None))
                except (UnsupportedMediaError, wave.Error, EOFError,
                        ValueError) as e:
                    rows.append((int(mid), None, None, None, None, None,
                                 None, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "channels", "n_samples",
                "duration_sec", "rms", "zero_cross_rate", "spectral", "error"])

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, id_col: str = "media_id",
                  payload_col: str = "payload",
                  sync_only: bool = False) -> DataFrame:
    """Frame sampling over video blobs. Two containers are parsed for
    real (stdlib + numpy only):

    - **MP4 / ISO-BMFF** (:mod:`searcharray_spark.mp4`): the sample
      table gives every frame's byte extent + timestamp + sync flag;
      Motion-JPEG tracks decode fully through the from-scratch T.81
      codec (mean luma populated), other codecs (avc1/hev1/...) yield
      fingerprint + size + track dimensions with ``mean_luma`` null
      (entropy decode needs a codec lib the container lacks).
    - **concatenated-PPM streams** (back-to-back P6 frames): full decode.

    ``sync_only`` restricts MP4 sampling to keyframes (stss)."""

    def iter_ppm_frames(b: bytes):
        # frame length comes from each header (never scan pixel bytes
        # for the next magic — "P6" can occur inside pixel data)
        pos = 0
        idx = 0
        while pos < len(b) and b[pos:pos + 2] == b"P6":
            w, h, _, off = _ppm_header(b, pos)
            end = off + w * h * 3
            yield idx, b[pos:end]
            idx += 1
            pos = end

    def mp4_rows(mid: int, b: bytes) -> list:
        from .jpeg import decode_jpeg
        from .mp4 import MJPEG_CODECS, iter_video_samples, probe_mp4
        info = probe_mp4(b)
        track = info.video_track()
        rows = []
        for idx, _pts, sample in iter_video_samples(
                b, every_n=every_n, sync_only=sync_only, info=info):
            sha = hashlib.sha1(sample).hexdigest()
            if track.codec in MJPEG_CODECS:
                img = decode_jpeg(sample)
                rows.append((mid, idx, img.shape[1], img.shape[0], sha,
                             float(_luma(img).mean())))
            else:
                # opaque codec: container metadata + fingerprint only
                rows.append((mid, idx, track.width or None,
                             track.height or None, sha, None))
        return rows

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import Mp4Error, is_mp4
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                b = bytes(payload)
                if is_mp4(b):
                    try:
                        rows.extend(mp4_rows(int(mid), b))
                    except (Mp4Error, UnsupportedMediaError, ValueError,
                            struct.error):
                        pass  # bad blob is data, not a crash
                    continue
                if not b.startswith(b"P6"):
                    continue  # unknown container: skip
                # the generator's own header parse can raise on a
                # truncated trailing frame — bad blobs are data, not
                # crashes, so the whole iteration is guarded
                try:
                    for idx, frame in iter_ppm_frames(b):
                        if idx % every_n:
                            continue
                        img = decode_ppm(frame)
                        rows.append((int(mid), idx, img.shape[1],
                                     img.shape[0],
                                     hashlib.sha1(frame).hexdigest(),
                                     float(_luma(img).mean())))
                except (UnsupportedMediaError, ValueError, struct.error):
                    pass  # keep the frames decoded so far
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "width", "height", "frame_sha1",
                "mean_luma"])

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


VIDEO_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("container", StringType()),   # mp4 | ppm-stream
    StructField("codec", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("n_keyframes", IntegerType()),
    StructField("duration_sec", FloatType()),
    StructField("fps", FloatType()),
    StructField("error", StringType()),
])


def video_metadata(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Container-level video metadata (no pixel decode): codec fourcc,
    dimensions, frame/keyframe counts, duration, fps.  MP4 via the
    ISO-BMFF sample table (:mod:`searcharray_spark.mp4`); concatenated
    PPM streams by walking frame headers.  Unknown/broken blobs land in
    the ``error`` column."""

    def one(mid: int, b: bytes):
        from .mp4 import Mp4Error, is_mp4, probe_mp4
        if is_mp4(b):
            info = probe_mp4(b)
            t = info.video_track()
            if t is None:
                raise Mp4Error("no video track")
            dur = t.duration_sec or info.duration_sec
            fps = (t.n_samples / dur) if dur else None
            return (mid, "mp4", t.codec, t.width or None, t.height or None,
                    t.n_samples, int(t.sync_flags.sum()),
                    float(dur) if dur else None,
                    float(fps) if fps else None, None)
        if b.startswith(b"P6"):
            n = 0
            w = h = 0
            pos = 0
            while pos < len(b) and b[pos:pos + 2] == b"P6":
                w, h, _, off = _ppm_header(b, pos)
                pos = off + w * h * 3
                n += 1
            return (mid, "ppm-stream", "rawrgb", w, h, n, n, None, None,
                    None)
        raise UnsupportedMediaError("unknown video container")

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import Mp4Error
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                try:
                    rows.append(one(int(mid), bytes(payload)))
                except (Mp4Error, UnsupportedMediaError, ValueError,
                        struct.error) as e:
                    rows.append((int(mid), None, None, None, None, None,
                                 None, None, None, str(e)[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "container", "codec", "width", "height",
                "n_frames", "n_keyframes", "duration_sec", "fps", "error"])

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(kernel, VIDEO_META_SCHEMA)
