"""ISO Base Media File Format (MP4/MOV) container parsing — from scratch.

Implements the subset of ISO/IEC 14496-12 a training-data pipeline needs
to treat video columns as first-class data WITHOUT external codec libs:

  - box walk (32-bit, 64-bit ``largesize`` and size==0 "to EOF" boxes),
  - movie/track/media headers (mvhd/tkhd/mdhd, versions 0 and 1),
  - the full sample-table plane (stsd/stts/stsc/stsz+stz2/stco+co64/
    stss) expanded into flat numpy arrays: per-sample byte offset, size,
    decode timestamp and sync flag,
  - sample extraction: every-n-th (or keyframe-only) sample's bytes,
  - full pixel decode for Motion-JPEG tracks (sample entries ``jpeg``/
    ``mjpa``/``mjpb``/``MJPG``) via the from-scratch T.81 codec in
    :mod:`searcharray_spark.jpeg`; other codecs (avc1/hev1/...) yield
    bytes + metadata only (entropy decode needs a real codec lib),
  - a minimal MJPEG-in-MP4 *writer* used by tests so the whole
    parse→extract→decode path is exercised end-to-end with zero
    external dependencies.

Reference parity note: the searcharray reference has no video support at
all — this module exists for the LLM-data-pipeline surface (multimodal
columns over 100 TB corpora), where MP4 is the dominant video container.
Spark-side plumbing lives in :mod:`searcharray_spark.multimodal`
(``sample_frames`` / ``video_metadata`` mapInPandas kernels); this module
is deliberately plain bytes+numpy so kernels stay Arrow-batched.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


class Mp4Error(ValueError):
    """Malformed or truncated ISO-BMFF structure (bad blobs are data)."""


CONTAINER_BOXES = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex",
}

#: sample-entry fourccs whose samples are standalone JPEG images
MJPEG_CODECS = {"jpeg", "mjpa", "mjpb", "MJPG", "AVDJ"}


def iter_boxes(data: bytes, start: int = 0,
               end: Optional[int] = None) -> Iterator[Tuple[bytes, int, int]]:
    """Yield ``(fourcc, payload_start, payload_end)`` for each box in
    ``data[start:end]``. Handles ``largesize`` (size==1) and size==0
    (box extends to the end of the enclosing scope)."""
    if end is None:
        end = len(data)
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4:pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box header")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise Mp4Error(f"box {fourcc!r} overruns enclosing scope")
        yield fourcc, pos + header, pos + size
        pos += size


def find_box(data: bytes, path: List[bytes], start: int = 0,
             end: Optional[int] = None) -> Optional[Tuple[int, int]]:
    """Payload extent of the first box at ``path`` (e.g. [b'moov',
    b'mvhd']), or None."""
    if not path:
        return (start, len(data) if end is None else end)
    for fourcc, ps, pe in iter_boxes(data, start, end):
        if fourcc == path[0]:
            return find_box(data, path[1:], ps, pe)
    return None


def _fullbox(data: bytes, pos: int) -> Tuple[int, int, int]:
    """-> (version, flags, pos_after_header)."""
    vf = struct.unpack_from(">I", data, pos)[0]
    return vf >> 24, vf & 0xFFFFFF, pos + 4


@dataclass
class TrackInfo:
    track_id: int = 0
    handler: str = ""                 # 'vide' | 'soun' | ...
    codec: str = ""                   # stsd first entry fourcc
    width: int = 0
    height: int = 0
    timescale: int = 0
    duration: int = 0                 # in media timescale units
    sample_offsets: np.ndarray = field(
        default_factory=lambda: np.empty(0, np.int64))
    sample_sizes: np.ndarray = field(
        default_factory=lambda: np.empty(0, np.int64))
    sample_dts: np.ndarray = field(
        default_factory=lambda: np.empty(0, np.int64))
    sync_flags: np.ndarray = field(
        default_factory=lambda: np.empty(0, bool))

    @property
    def n_samples(self) -> int:
        return int(self.sample_sizes.size)

    @property
    def duration_sec(self) -> float:
        return self.duration / self.timescale if self.timescale else 0.0


@dataclass
class Mp4Info:
    brand: str = ""
    timescale: int = 0
    duration: int = 0
    tracks: List[TrackInfo] = field(default_factory=list)

    @property
    def duration_sec(self) -> float:
        return self.duration / self.timescale if self.timescale else 0.0

    def video_track(self) -> Optional[TrackInfo]:
        for t in self.tracks:
            if t.handler == "vide":
                return t
        return None


# ---------------------------------------------------------------------------
# sample-table parsing (stbl children -> flat per-sample arrays)
# ---------------------------------------------------------------------------

def _parse_stsd(data: bytes, ps: int, pe: int, t: TrackInfo) -> None:
    _, _, pos = _fullbox(data, ps)
    count = struct.unpack_from(">I", data, pos)[0]
    pos += 4
    if count < 1 or pos + 8 > pe:
        return
    # first sample entry: 4-byte size, 4-byte format fourcc
    t.codec = data[pos + 4:pos + 8].decode("latin1")
    # VisualSampleEntry: 8 hdr + 6 reserved + 2 dri + 16 pre_defined
    # + width(2) + height(2) — only trust it for video handlers
    if pe - pos >= 36:
        w, h = struct.unpack_from(">HH", data, pos + 32)
        if 0 < w < 32768 and 0 < h < 32768:
            t.width, t.height = w, h


def _parse_stts(data: bytes, ps: int, pe: int) -> np.ndarray:
    """Decode time-to-sample into per-sample DTS (media timescale)."""
    _, _, pos = _fullbox(data, ps)
    n = struct.unpack_from(">I", data, pos)[0]
    pos += 4
    if pos + 8 * n > pe:
        raise Mp4Error("truncated stts")
    raw = np.frombuffer(data, ">u4", count=2 * n, offset=pos).reshape(n, 2)
    counts = raw[:, 0].astype(np.int64)
    deltas = raw[:, 1].astype(np.int64)
    total = int(counts.sum())
    per_sample = np.repeat(deltas, counts)
    dts = np.zeros(total, np.int64)
    if total > 1:
        np.cumsum(per_sample[:-1], out=dts[1:])
    return dts


def _parse_stsz(data: bytes, ps: int, pe: int, fourcc: bytes) -> np.ndarray:
    _, _, pos = _fullbox(data, ps)
    if fourcc == b"stz2":
        field_size = data[pos + 3]
        n = struct.unpack_from(">I", data, pos + 4)[0]
        pos += 8
        if field_size == 16:
            return np.frombuffer(data, ">u2", count=n,
                                 offset=pos).astype(np.int64)
        if field_size == 8:
            return np.frombuffer(data, np.uint8, count=n,
                                 offset=pos).astype(np.int64)
        if field_size == 4:
            packed = np.frombuffer(data, np.uint8, count=(n + 1) // 2,
                                   offset=pos)
            out = np.empty(n, np.int64)
            out[0::2] = packed[: (n + 1) // 2] >> 4
            out[1::2] = (packed[: n // 2] & 0xF)
            return out
        raise Mp4Error(f"stz2 field size {field_size}")
    fixed, n = struct.unpack_from(">II", data, pos)
    pos += 8
    if fixed:
        return np.full(n, fixed, np.int64)
    if pos + 4 * n > pe:
        raise Mp4Error("truncated stsz")
    return np.frombuffer(data, ">u4", count=n, offset=pos).astype(np.int64)


def _parse_chunk_offsets(data: bytes, ps: int, pe: int,
                         fourcc: bytes) -> np.ndarray:
    _, _, pos = _fullbox(data, ps)
    n = struct.unpack_from(">I", data, pos)[0]
    pos += 4
    width = 8 if fourcc == b"co64" else 4
    if pos + width * n > pe:
        raise Mp4Error("truncated chunk offset box")
    dt = ">u8" if fourcc == b"co64" else ">u4"
    return np.frombuffer(data, dt, count=n, offset=pos).astype(np.int64)


def _expand_stsc(data: bytes, ps: int, pe: int, n_chunks: int,
                 n_samples: int) -> np.ndarray:
    """Expand sample-to-chunk runs into a per-sample chunk index
    (0-based) array of length n_samples."""
    _, _, pos = _fullbox(data, ps)
    n = struct.unpack_from(">I", data, pos)[0]
    pos += 4
    if pos + 12 * n > pe:
        raise Mp4Error("truncated stsc")
    raw = np.frombuffer(data, ">u4", count=3 * n, offset=pos).reshape(n, 3)
    first_chunk = raw[:, 0].astype(np.int64)  # 1-based
    per_chunk = raw[:, 1].astype(np.int64)
    # runs: entry i covers chunks [first_chunk[i], first_chunk[i+1])
    run_ends = np.empty(n, np.int64)
    run_ends[:-1] = first_chunk[1:]
    run_ends[-1] = n_chunks + 1
    chunk_counts = np.repeat(per_chunk, np.maximum(run_ends - first_chunk, 0))
    if chunk_counts.size != n_chunks:
        raise Mp4Error("stsc does not cover all chunks")
    chunk_idx = np.repeat(np.arange(n_chunks, dtype=np.int64), chunk_counts)
    if chunk_idx.size < n_samples:
        raise Mp4Error("stsc covers fewer samples than stsz")
    return chunk_idx[:n_samples]


def _parse_stbl(data: bytes, ps: int, pe: int, t: TrackInfo) -> None:
    stts = stsz = stco = stsc = stss = None
    stsz_fourcc = stco_fourcc = b""
    for fourcc, cs, ce in iter_boxes(data, ps, pe):
        if fourcc == b"stsd":
            _parse_stsd(data, cs, ce, t)
        elif fourcc == b"stts":
            stts = (cs, ce)
        elif fourcc in (b"stsz", b"stz2"):
            stsz, stsz_fourcc = (cs, ce), fourcc
        elif fourcc in (b"stco", b"co64"):
            stco, stco_fourcc = (cs, ce), fourcc
        elif fourcc == b"stsc":
            stsc = (cs, ce)
        elif fourcc == b"stss":
            stss = (cs, ce)
    if not (stsz and stco and stsc):
        return  # header-only or fragmented track: no static sample table
    sizes = _parse_stsz(data, *stsz, stsz_fourcc)
    chunk_offs = _parse_chunk_offsets(data, *stco, stco_fourcc)
    chunk_idx = _expand_stsc(data, *stsc, chunk_offs.size, sizes.size)
    # offset of sample i = chunk_offset[chunk] + sum of sizes of earlier
    # samples in the same chunk — vectorized via cumsum minus the cumsum
    # at each chunk's first sample
    csum = np.zeros(sizes.size + 1, np.int64)
    np.cumsum(sizes, out=csum[1:])
    is_first = np.empty(sizes.size, bool)
    if sizes.size:
        is_first[0] = True
        is_first[1:] = chunk_idx[1:] != chunk_idx[:-1]
    chunk_base = np.maximum.accumulate(
        np.where(is_first, csum[:-1], np.int64(-1)))
    t.sample_offsets = chunk_offs[chunk_idx] + (csum[:-1] - chunk_base)
    t.sample_sizes = sizes
    t.sample_dts = (_parse_stts(data, *stts) if stts
                    else np.zeros(sizes.size, np.int64))
    if t.sample_dts.size != sizes.size:
        # tolerate stts drift (some muxers under-fill the last run)
        t.sample_dts = np.resize(t.sample_dts, sizes.size)
    sync = np.ones(sizes.size, bool)
    if stss is not None:
        _, _, pos = _fullbox(data, stss[0])
        n = struct.unpack_from(">I", data, pos)[0]
        nums = np.frombuffer(data, ">u4", count=n, offset=pos + 4)
        sync[:] = False
        idx = nums.astype(np.int64) - 1  # stss is 1-based
        sync[idx[(idx >= 0) & (idx < sizes.size)]] = True
    t.sync_flags = sync


def _parse_trak(data: bytes, ps: int, pe: int) -> TrackInfo:
    t = TrackInfo()
    for fourcc, cs, ce in iter_boxes(data, ps, pe):
        if fourcc == b"tkhd":
            ver, _, pos = _fullbox(data, cs)
            pos += 8 if ver == 0 else 16  # creation+modification times
            t.track_id = struct.unpack_from(">I", data, pos)[0]
            # width/height: last 8 bytes of tkhd, 16.16 fixed point
            w, h = struct.unpack_from(">II", data, ce - 8)
            if not t.width:
                t.width, t.height = w >> 16, h >> 16
        elif fourcc == b"mdia":
            for f2, ms, me in iter_boxes(data, cs, ce):
                if f2 == b"mdhd":
                    ver, _, pos = _fullbox(data, ms)
                    if ver == 1:
                        t.timescale, t.duration = struct.unpack_from(
                            ">IQ", data, pos + 16)
                    else:
                        t.timescale, t.duration = struct.unpack_from(
                            ">II", data, pos + 8)
                elif f2 == b"hdlr":
                    t.handler = data[ms + 8:ms + 12].decode("latin1")
                elif f2 == b"minf":
                    stbl = find_box(data, [b"stbl"], ms, me)
                    if stbl:
                        _parse_stbl(data, stbl[0], stbl[1], t)
    return t


def probe_mp4(data: bytes) -> Mp4Info:
    """Parse the container (no codec work): brands, movie header, every
    track's header + flat sample table."""
    info = Mp4Info()
    saw_moov = False
    for fourcc, ps, pe in iter_boxes(data):
        if fourcc == b"ftyp":
            info.brand = data[ps:ps + 4].decode("latin1")
        elif fourcc == b"moov":
            saw_moov = True
            for f2, ms, me in iter_boxes(data, ps, pe):
                if f2 == b"mvhd":
                    ver, _, pos = _fullbox(data, ms)
                    if ver == 1:
                        info.timescale, info.duration = struct.unpack_from(
                            ">IQ", data, pos + 16)
                    else:
                        info.timescale, info.duration = struct.unpack_from(
                            ">II", data, pos + 8)
                elif f2 == b"trak":
                    info.tracks.append(_parse_trak(data, ms, me))
    if not saw_moov:
        raise Mp4Error("no moov box (fragmented-only or not an MP4)")
    return info


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] in (b"ftyp", b"moov", b"styp")


def iter_video_samples(data: bytes, every_n: int = 1,
                       sync_only: bool = False,
                       info: Optional[Mp4Info] = None,
                       ) -> Iterator[Tuple[int, float, bytes]]:
    """Yield ``(sample_idx, pts_sec, sample_bytes)`` for every
    ``every_n``-th video sample (optionally keyframes only).  Bounds are
    validated against the blob so a lying stco/stsz fails loudly."""
    if info is None:
        info = probe_mp4(data)
    t = info.video_track()
    if t is None or not t.n_samples:
        return
    idx = np.arange(t.n_samples)
    if sync_only:
        idx = idx[t.sync_flags]
    idx = idx[::max(1, every_n)]
    scale = float(t.timescale) if t.timescale else 1.0
    for i in idx:
        off = int(t.sample_offsets[i])
        size = int(t.sample_sizes[i])
        if off < 0 or off + size > len(data):
            raise Mp4Error(f"sample {i} extent [{off},{off + size}) "
                           f"outside blob of {len(data)} bytes")
        yield int(i), float(t.sample_dts[i]) / scale, data[off:off + size]


# ---------------------------------------------------------------------------
# minimal MJPEG-in-MP4 writer (tests + synthetic corpora)
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + payload)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                            0x40000000)


def encode_mp4_mjpeg(frames: List[bytes], width: int, height: int,
                     fps: int = 25, sync_every: int = 1,
                     codec: bytes = b"jpeg") -> bytes:
    """Mux pre-encoded JPEG frames into a minimal but spec-shaped MP4
    (ftyp + mdat + moov with a single 'jpeg' video track).  Every
    ``sync_every``-th frame is marked sync in stss.  Chunks of up to 4
    samples exercise the stsc/stco expansion on the read side.
    ``codec`` overrides the sample-entry fourcc (tests use e.g. b'avc1'
    to exercise the opaque-codec path with the same mux)."""
    if not frames:
        raise ValueError("need at least one frame")
    timescale = fps
    n = len(frames)
    mdat_payload = b"".join(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_header_off = len(ftyp)
    data_off = mdat_header_off + 8  # first sample byte

    sizes = [len(f) for f in frames]
    # chunks of up to 4 samples
    chunk_first = list(range(0, n, 4))
    chunk_offs = []
    pos = data_off
    for ci, s0 in enumerate(chunk_first):
        chunk_offs.append(pos)
        pos += sum(sizes[s0:s0 + 4])

    stsd_entry = (
        struct.pack(">I", 86) + codec
        + b"\x00" * 6 + struct.pack(">H", 1)      # reserved + dri
        + b"\x00" * 16                              # pre_defined
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)   # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32                              # compressor name
        + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc_runs = [(1, min(4, n), 1)]
    if n > 4 and n % 4:
        stsc_runs.append((len(chunk_first), n % 4, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_runs))
                 + b"".join(struct.pack(">III", *r) for r in stsc_runs))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", s) for s in sizes))
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(chunk_offs))
                 + b"".join(struct.pack(">I", o) for o in chunk_offs))
    sync_idx = list(range(1, n + 1, max(1, sync_every)))
    stss = _full(b"stss", 0, 0, struct.pack(">I", len(sync_idx))
                 + b"".join(struct.pack(">I", s) for s in sync_idx))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)

    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    minf = _box(b"minf", _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0,
                                                          0, 0))
                + _box(b"dinf", dref) + stbl)
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, n,
                                            0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, n)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + _UNITY_MATRIX
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, n)
                 + struct.pack(">IH", 0x10000, 0x100) + b"\x00" * 10
                 + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov
