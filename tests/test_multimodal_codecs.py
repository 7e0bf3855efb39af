"""Golden/round-trip tests for the stdlib+numpy image codecs.

The PNG fixtures are encoded HERE with an independent forward
implementation of the spec's filter functions (RFC 2083 §6) — the
decoder must invert every filter type (0 None, 1 Sub, 2 Up, 3 Average,
4 Paeth) for gray/RGB/RGBA. BMP fixtures cover 4-byte row padding and
both bottom-up and top-down row orders.
"""
import struct
import zlib

import numpy as np
import pytest

from searcharray_spark import multimodal as M


# --- independent PNG encoder (forward filters per the spec) ---------------

def _paeth(a, b, c):
    p = int(a) + int(b) - int(c)
    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
    if pa <= pb and pa <= pc:
        return int(a)
    return int(b) if pb <= pc else int(c)


def _filter_row(ftype, row, prev, c):
    out = np.empty(len(row), dtype=np.uint8)
    for x in range(len(row)):
        a = int(row[x - c]) if x >= c else 0
        b = int(prev[x])
        cc = int(prev[x - c]) if x >= c else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, cc)
        out[x] = (int(row[x]) - pred) & 0xFF
    return out


def _chunk(ctype, payload):
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def encode_png(img, row_filters):
    """(h, w, c) uint8 + per-row filter types -> PNG bytes."""
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    color_type = {1: 0, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        f = row_filters[y % len(row_filters)]
        raw.append(f)
        raw.extend(_filter_row(f, flat[y], prev, c).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type(channels, ftype):
    rng = np.random.default_rng(ftype * 10 + channels)
    img = rng.integers(0, 256, (11, 7, channels), dtype=np.uint8)
    data = encode_png(img, [ftype])
    out = M.decode_png(data)
    assert out.shape == (11, 7, channels)
    assert np.array_equal(out, img)


def test_png_mixed_filters_per_row():
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (10, 13, 3), dtype=np.uint8)
    data = encode_png(img, [0, 1, 2, 3, 4])  # cycles through all five
    assert np.array_equal(M.decode_png(data), img)


def test_png_gradient_exercises_paeth_branches():
    # smooth gradients hit all three Paeth predictor branches
    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([(y * 16) % 256, (x * 16) % 256, ((x + y) * 8) % 256],
                   axis=2).astype(np.uint8)
    data = encode_png(img, [4])
    assert np.array_equal(M.decode_png(data), img)


def test_png_unsupported_flavors_raise():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_png(img, [0]))
    data[24] = 16  # bit depth 16
    with pytest.raises(M.UnsupportedMediaError):
        M.decode_png(bytes(data))


# --- BMP ------------------------------------------------------------------

def encode_bmp(img, top_down=False):
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP with row padding."""
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    bgr = img[:, :, ::-1]
    rows = bgr if top_down else bgr[::-1]
    body = bytearray()
    for r in rows:
        body.extend(r.tobytes())
        body.extend(b"\x00" * (row_bytes - w * 3))
    px_offset = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", px_offset + len(body), 0, 0, px_offset)
              + struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                            1, 24, 0, len(body), 2835, 2835, 0, 0))
    return bytes(header) + bytes(body)


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("width", [3, 4, 5])  # padding 3, 0, 1 bytes
def test_bmp_padding_and_row_order(top_down, width):
    rng = np.random.default_rng(width + int(top_down))
    img = rng.integers(0, 256, (6, width, 3), dtype=np.uint8)
    out = M.decode_bmp(encode_bmp(img, top_down=top_down))
    assert np.array_equal(out, img)


def test_bmp_unsupported_bpp():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    data[28] = 8  # 8 bpp
    with pytest.raises(M.UnsupportedMediaError):
        M.decode_bmp(bytes(data))


# --- sample_frames error containment (truncated trailing frame) -----------

def test_sample_frames_truncated_stream_keeps_good_frames(spark):
    img = np.full((4, 4, 3), 100, dtype=np.uint8)
    good = M.encode_ppm(img) * 3
    truncated = good + b"P6\n4"  # trailing garbage header
    df = spark.createDataFrame([(1, bytearray(truncated)), (2, bytearray(good))],
                               "media_id long, payload binary")
    rows = M.sample_frames(df, every_n=1).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(by_id[1]) == [0, 1, 2]  # decoded frames survive
    assert sorted(by_id[2]) == [0, 1, 2]
