"""MP4 / ISO-BMFF container tests.

The writer (`encode_mp4_mjpeg`) and parser (`probe_mp4` /
`iter_video_samples`) are independent implementations of the public
ISO/IEC 14496-12 layout; round-tripping proves the sample-table math
(stsc chunk expansion, intra-chunk offset accumulation, stss sync
flags), and hand-built boxes cover the variants the writer doesn't emit
(largesize, co64, version-1 headers, stz2).  MJPEG samples decode to
pixels through the from-scratch T.81 codec (jpeg.py).
"""
import struct

import numpy as np
import pytest

from searcharray_spark import multimodal as M
from searcharray_spark import mp4 as B
from searcharray_spark.jpeg import decode_jpeg, encode_jpeg


def _frames(n=10, w=32, h=24):
    """n JPEG frames with distinct, predictable mean luma."""
    frames, lumas = [], []
    for i in range(n):
        val = 20 + 20 * i
        img = np.full((h, w, 3), val, dtype=np.uint8)
        frames.append(encode_jpeg(img, quality=90))
        lumas.append(float(val))
    return frames, lumas


# --- round trip ------------------------------------------------------------

def test_probe_roundtrip():
    frames, _ = _frames(10)
    blob = B.encode_mp4_mjpeg(frames, 32, 24, fps=25, sync_every=3)
    assert B.is_mp4(blob)
    info = B.probe_mp4(blob)
    assert info.brand == "isom"
    t = info.video_track()
    assert t is not None
    assert t.handler == "vide"
    assert t.codec == "jpeg"
    assert (t.width, t.height) == (32, 24)
    assert t.n_samples == 10
    assert t.timescale == 25
    assert t.duration_sec == pytest.approx(10 / 25)
    # sync_every=3 -> samples 0,3,6,9 are key
    assert list(np.flatnonzero(t.sync_flags)) == [0, 3, 6, 9]


def test_sample_bytes_exact():
    """Extracted sample bytes are bit-identical to the muxed frames —
    proves chunk-offset + intra-chunk cumsum arithmetic across the
    writer's 4-sample chunking (10 frames -> chunks of 4,4,2)."""
    frames, _ = _frames(10)
    blob = B.encode_mp4_mjpeg(frames, 32, 24)
    got = list(B.iter_video_samples(blob))
    assert [i for i, _, _ in got] == list(range(10))
    for i, pts, sample in got:
        assert sample == frames[i]
        assert pts == pytest.approx(i / 25)


def test_every_n_and_sync_only():
    frames, _ = _frames(9)
    blob = B.encode_mp4_mjpeg(frames, 32, 24, sync_every=2)
    idx = [i for i, _, _ in B.iter_video_samples(blob, every_n=3)]
    assert idx == [0, 3, 6]
    idx = [i for i, _, _ in B.iter_video_samples(blob, sync_only=True)]
    assert idx == [0, 2, 4, 6, 8]
    idx = [i for i, _, _ in
           B.iter_video_samples(blob, every_n=2, sync_only=True)]
    assert idx == [0, 4, 8]


def test_mjpeg_samples_decode():
    frames, lumas = _frames(5)
    blob = B.encode_mp4_mjpeg(frames, 32, 24)
    for i, _, sample in B.iter_video_samples(blob):
        img = decode_jpeg(sample)
        assert img.shape == (24, 32, 3)
        assert abs(float(M._luma(img).mean()) - lumas[i]) < 3.0


# --- box-format variants the writer doesn't emit ---------------------------

def test_largesize_and_size_zero_boxes():
    payload = b"x" * 10
    large = struct.pack(">I", 1) + b"abcd" + struct.pack(">Q", 16 + 10) + payload
    tail = struct.pack(">I", 0) + b"wxyz" + b"rest-of-scope"
    boxes = list(B.iter_boxes(large + tail))
    assert boxes[0][0] == b"abcd"
    assert large[boxes[0][1]:boxes[0][2]] == payload
    assert boxes[1][0] == b"wxyz"
    assert boxes[1][2] == len(large + tail)


def test_box_overrun_raises():
    bad = struct.pack(">I", 100) + b"abcd" + b"short"
    with pytest.raises(B.Mp4Error):
        list(B.iter_boxes(bad))


def _full(fourcc, version, flags, payload):
    return (struct.pack(">I", 12 + len(payload)) + fourcc
            + struct.pack(">I", (version << 24) | flags) + payload)


def test_co64_and_version1_headers():
    frames, _ = _frames(3)
    blob = bytearray(B.encode_mp4_mjpeg(frames, 32, 24))
    # surgically upgrade stco -> co64 (offsets unchanged, widened)
    info = B.probe_mp4(bytes(blob))
    offs = info.video_track().sample_offsets
    stco_at = bytes(blob).find(b"stco") - 4
    stco_size = struct.unpack_from(">I", blob, stco_at)[0]
    n_chunks = struct.unpack_from(">I", blob, stco_at + 12)[0]
    chunk_offs = [struct.unpack_from(">I", blob, stco_at + 16 + 4 * i)[0]
                  for i in range(n_chunks)]
    co64 = (struct.pack(">I", 16 + 8 * n_chunks) + b"co64"
            + struct.pack(">I", 0) + struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">Q", o) for o in chunk_offs))
    assert len(co64) == stco_size + 4 * n_chunks
    patched = (bytes(blob[:stco_at]) + co64
               + bytes(blob[stco_at + stco_size:]))
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov each grew)
    grow = 4 * n_chunks
    pos = len(patched)
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = patched.find(name) - 4
        old = struct.unpack_from(">I", patched, at)[0]
        patched = (patched[:at] + struct.pack(">I", old + grow)
                   + patched[at + 4:])
    t2 = B.probe_mp4(patched).video_track()
    assert np.array_equal(t2.sample_offsets, offs)
    samples = [s for _, _, s in B.iter_video_samples(patched)]
    assert samples == frames


def test_version1_mvhd_mdhd():
    mvhd = _full(b"mvhd", 1, 0,
                 struct.pack(">QQIQ", 0, 0, 1000, 7000) + b"\x00" * 80)
    mdhd = _full(b"mdhd", 1, 0,
                 struct.pack(">QQIQHH", 0, 0, 90, 450, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"h\x00")
    tkhd = _full(b"tkhd", 1, 7,
                 struct.pack(">QQIIQ", 0, 0, 7, 0, 450) + b"\x00" * 16
                 + b"\x00" * 36 + struct.pack(">II", 64 << 16, 48 << 16))
    mdia = B._box(b"mdia", mdhd + hdlr)
    trak = B._box(b"trak", tkhd + mdia)
    moov = B._box(b"moov", mvhd + trak)
    ftyp = B._box(b"ftyp", b"isom" + struct.pack(">I", 0))
    info = B.probe_mp4(ftyp + moov)
    assert info.timescale == 1000 and info.duration == 7000
    t = info.tracks[0]
    assert t.track_id == 7
    assert (t.timescale, t.duration) == (90, 450)
    assert (t.width, t.height) == (64, 48)  # tkhd 16.16 (no stsd)
    assert t.duration_sec == pytest.approx(5.0)


def test_stz2_field_sizes():
    for field_size, sizes in ((4, [3, 5, 2, 7, 1]), (8, [10, 200, 33]),
                              (16, [1000, 42, 65535])):
        n = len(sizes)
        if field_size == 4:
            packed = bytearray()
            for i in range(0, n, 2):
                hi = sizes[i] << 4
                lo = sizes[i + 1] if i + 1 < n else 0
                packed.append(hi | lo)
            body = bytes(packed)
        elif field_size == 8:
            body = bytes(sizes)
        else:
            body = b"".join(struct.pack(">H", s) for s in sizes)
        box = _full(b"stz2", 0, 0,
                    struct.pack(">I", field_size)[0:3]
                    + bytes([field_size]) + struct.pack(">I", n) + body)
        out = B._parse_stsz(box, 8, len(box), b"stz2")
        assert list(out) == sizes


def test_lying_stco_fails_loudly():
    frames, _ = _frames(2)
    blob = bytearray(B.encode_mp4_mjpeg(frames, 32, 24))
    stco_at = bytes(blob).find(b"stco") - 4
    struct.pack_into(">I", blob, stco_at + 16, 2 ** 30)  # bogus offset
    with pytest.raises(B.Mp4Error):
        list(B.iter_video_samples(bytes(blob)))


def test_multi_run_stsc_expansion():
    # 3 runs: chunks 1-2 @3 samples, chunk 3 @1, chunks 4-5 @2  -> 11
    box = _full(b"stsc", 0, 0, struct.pack(">I", 3)
                + struct.pack(">III", 1, 3, 1)
                + struct.pack(">III", 3, 1, 1)
                + struct.pack(">III", 4, 2, 1))
    out = B._expand_stsc(box, 8, len(box), n_chunks=5, n_samples=11)
    assert list(out) == [0, 0, 0, 1, 1, 1, 2, 3, 3, 4, 4]


# --- Spark kernels ----------------------------------------------------------

def test_sample_frames_mp4(spark):
    frames, lumas = _frames(8)
    blob = B.encode_mp4_mjpeg(frames, 32, 24)
    ppm = M.encode_ppm(np.full((4, 4, 3), 77, dtype=np.uint8)) * 2
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(ppm)), (3, bytearray(b"junk"))],
        "media_id long, payload binary")
    rows = M.sample_frames(df, every_n=2).collect()
    mp4_rows = sorted([r for r in rows if r["media_id"] == 1],
                      key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in mp4_rows] == [0, 2, 4, 6]
    for r in mp4_rows:
        assert (r["width"], r["height"]) == (32, 24)
        assert abs(r["mean_luma"] - lumas[r["frame_idx"]]) < 3.0
    assert len([r for r in rows if r["media_id"] == 2]) == 1  # every_n=2
    assert not [r for r in rows if r["media_id"] == 3]


def test_sample_frames_opaque_codec(spark):
    samples = [b"\x00\x01\x02" * 10, b"\x07\x08" * 20]
    blob = B.encode_mp4_mjpeg(samples, 640, 480, codec=b"avc1")
    df = spark.createDataFrame([(5, bytearray(blob))],
                               "media_id long, payload binary")
    rows = sorted(M.sample_frames(df, every_n=1).collect(),
                  key=lambda r: r["frame_idx"])
    assert len(rows) == 2
    import hashlib
    for r, s in zip(rows, samples):
        assert r["mean_luma"] is None
        assert (r["width"], r["height"]) == (640, 480)
        assert r["frame_sha1"] == hashlib.sha1(s).hexdigest()


def test_video_metadata(spark):
    frames, _ = _frames(6)
    blob = B.encode_mp4_mjpeg(frames, 32, 24, fps=30, sync_every=3)
    ppm = M.encode_ppm(np.full((4, 4, 3), 9, dtype=np.uint8)) * 4
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(ppm)), (3, bytearray(b"nope"))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in M.video_metadata(df).collect()}
    m = rows[1]
    assert (m["container"], m["codec"]) == ("mp4", "jpeg")
    assert (m["width"], m["height"], m["n_frames"]) == (32, 24, 6)
    assert m["n_keyframes"] == 2
    assert m["fps"] == pytest.approx(30.0)
    assert m["duration_sec"] == pytest.approx(0.2)
    assert m["error"] is None
    p = rows[2]
    assert (p["container"], p["n_frames"]) == ("ppm-stream", 4)
    assert rows[3]["error"] is not None
