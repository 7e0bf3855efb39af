"""JPEG (JFIF) codec — pure numpy + stdlib, no codec libraries.

Implements the baseline sequential AND progressive DCT processes of the
public JPEG standard (ITU-T T.81 / ISO 10918-1): 8x8 block DCT, zigzag
+ run-length entropy coding with canonical Huffman tables, YCbCr
(BT.601 full-range, JFIF) color, 4:4:4 and 4:2:0 chroma sampling,
restart markers, and for progressive (SOF2) both spectral selection and
successive approximation (DC/AC first + refinement scans, EOB runs).

Why it exists: real web corpora are mostly JPEG, and this container has
no usable codec library (libjpeg is present only as a runtime .so whose
struct-based C API cannot be driven safely without headers/setjmp), so
the multimodal pipeline previously routed JPEG blobs to the ``error``
column. This module closes that gap with a from-scratch implementation
of the published standard.

Scope and honesty notes:
  - Huffman sequential + progressive, 8-bit. Arithmetic coding, 12-bit,
    hierarchical, and lossless modes raise ``UnsupportedMediaError`` —
    they land in the pipeline's ``error`` column like any bad blob.
  - The entropy decode loop is per-coefficient Python (the format is
    inherently bit-serial); DCT/IDCT, dequantization, upsampling and
    color conversion are vectorized numpy over all blocks at once.
    Throughput is adequate for feature extraction over thumbnails and
    test corpora; a cluster deployment with real codec libs installed
    would swap ``decode_jpeg`` for a library call behind the same
    signature (the Spark-side plumbing in multimodal.py is unchanged).
  - The encoders exist so the pipeline can be tested end-to-end in this
    container (nothing else here can produce a JPEG). The baseline
    encoder uses the standard's Annex K example quantization/Huffman
    tables, scaled by the common quality formula; the progressive
    encoder builds optimized Huffman tables per scan (two passes, as
    real progressive encoders must — Annex K has no EOBn symbols).
    Encoders and decoder are independent implementations of the
    published spec wired together only through the byte format; the
    test suite checks DC-only images exactly, random images within
    quantization-error bounds, and that progressive and baseline
    encodings of the same image decode bit-identically (the entropy
    layers are lossless over the same quantized coefficients).
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


class UnsupportedMediaError(ValueError):
    """Mirror of multimodal.UnsupportedMediaError (no import cycle)."""


# ---------------------------------------------------------------------------
# constants: zigzag, Annex K tables, DCT basis
# ---------------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """Natural index (row*8+col) of each zigzag position, derived from
    the diagonal traversal rule rather than hardcoded."""
    out = []
    for d in range(15):
        rng = range(d, -1, -1) if d % 2 == 0 else range(0, d + 1)
        for r in rng:
            c = d - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()          # zigzag pos -> natural index
UNZIGZAG = np.argsort(ZIGZAG)     # natural index -> zigzag pos

# Annex K example quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K example Huffman specs: (bits[1..16], values)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: F = C @ f @ C.T, f = C.T @ F @ C."""
    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    C[0, :] *= 1.0 / np.sqrt(2.0)
    return C


_DCT = _dct_matrix()


def _blocks_dct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) frequency, vectorized."""
    return _DCT @ blocks @ _DCT.T


def _blocks_idct(blocks: np.ndarray) -> np.ndarray:
    return _DCT.T @ blocks @ _DCT


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------

def _build_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    if sum(bits) != len(values):
        raise ValueError("invalid Huffman spec: counts != values")
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical Huffman decode tables (mincode/maxcode/valptr)."""

    def __init__(self, bits: List[int], values: List[int]):
        if sum(bits) != len(values):
            raise UnsupportedMediaError("invalid DHT: counts != values")
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise UnsupportedMediaError("corrupt entropy stream")
            code = (code << 1) | br.read_bit()
        return self.values[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0       # byte position
        self.bit = 0       # bits consumed within current byte

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise UnsupportedMediaError("truncated entropy stream")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude per the spec's EXTEND procedure."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    """Bit category of a coefficient value (0 for 0)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks",
                 "blocks_w", "blocks_h", "nx", "ny", "pred")

    def __init__(self, cid, h, v, tq):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.blocks = None
        self.blocks_w = self.blocks_h = 0
        self.nx = self.ny = 0  # true (unpadded) block-grid dims
        self.pred = 0


def _alloc_blocks(comps: List["_Component"], width: int,
                  height: int) -> Tuple[int, int]:
    """Allocate each component's coefficient grid ONCE (zigzag order,
    one row per 8x8 block, padded to whole MCUs) — scans, sequential or
    progressive, accumulate into it. Returns (mcus_x, mcus_y)."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    for c in comps:
        c.blocks_w = mcus_x * c.h
        c.blocks_h = mcus_y * c.v
        # non-interleaved scans cover only the true block grid
        comp_w = -(-(width * c.h) // hmax)
        comp_h = -(-(height * c.v) // vmax)
        c.nx = -(-comp_w // 8)
        c.ny = -(-comp_h // 8)
        c.blocks = np.zeros((c.blocks_h * c.blocks_w, 64), dtype=np.int64)
        c.pred = 0
    return mcus_x, mcus_y


def decode_jpeg(data: bytes) -> np.ndarray:
    """Sequential or progressive JFIF bytes -> (h, w, c) uint8,
    c in {1, 3}."""
    if data[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG (no SOI)")
    pos = 2
    quant: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _HuffDecoder] = {}
    huff_ac: Dict[int, _HuffDecoder] = {}
    comps: List[_Component] = []
    width = height = None
    restart_interval = 0
    progressive = False
    mcus = (0, 0)

    while pos < len(data):
        if data[pos] != 0xFF:
            raise UnsupportedMediaError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(data):
            raise UnsupportedMediaError("truncated segment header")
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2:pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq:  # 16-bit table
                    tbl = np.frombuffer(seg, dtype=">u2", count=64,
                                        offset=sp).astype(np.int64)
                    sp += 128
                else:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64,
                                        offset=sp).astype(np.int64)
                    sp += 64
                q = np.empty(64, dtype=np.int64)
                q[ZIGZAG] = tbl  # DQT payload is in zigzag order
                quant[tq] = q
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1:sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + nv])
                sp += 17 + nv
                dec = _HuffDecoder(bits, vals)
                (huff_ac if tc else huff_dc)[th] = dec
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            prec = seg[0]
            if prec != 8:
                raise UnsupportedMediaError(f"{prec}-bit JPEG unsupported")
            progressive = marker == 0xC2
            height, width = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                f"JPEG SOF{marker - 0xC0} process unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if width is None or not comps:
                raise UnsupportedMediaError("SOS before SOF")
            ns = seg[0]
            order = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c.cid == cs)
                comp.td, comp.ta = tdta >> 4, tdta & 0x0F
                order.append(comp)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if comps[0].blocks is None:
                mcus = _alloc_blocks(comps, width, height)
            pos = _decode_scan(data, pos, order, mcus[0], mcus[1],
                               huff_dc, huff_ac, restart_interval,
                               progressive, ss, se, ahal >> 4, ahal & 0x0F)
        # APPn/COM and anything else: skipped

    if width is None or not comps or comps[0].blocks is None:
        raise UnsupportedMediaError("no image data decoded")
    return _assemble(comps, width, height, quant)


def _unstuff(data: bytes, pos: int) -> Tuple[bytes, List[int], int]:
    """Unstuff entropy bytes up to the next real marker. Returns
    (raw bytes, unstuffed offsets of RST markers, position after)."""
    raw = bytearray()
    rst_byte_pos: List[int] = []
    p = pos
    n = len(data)
    while p < n:
        b = data[p]
        if b != 0xFF:
            raw.append(b)
            p += 1
            continue
        m = data[p + 1] if p + 1 < n else 0xD9
        if m == 0x00:
            raw.append(0xFF)
            p += 2
        elif 0xD0 <= m <= 0xD7:
            rst_byte_pos.append(len(raw))
            p += 2
        else:
            break  # real marker ends the scan
    return bytes(raw), rst_byte_pos, p


def _decode_scan(data, pos, order, mcus_x, mcus_y, huff_dc, huff_ac,
                 restart_interval, progressive, ss, se, ah, al) -> int:
    """Entropy-decode one scan (sequential or progressive, interleaved
    iff it has >1 component); returns position after it.

    Progressive scan structure (T.81 G.1/G.2): a DC scan has Ss=Se=0
    and may be interleaved; an AC scan covers one spectral band
    [Ss, Se] of ONE component. Ah=0 scans deliver coefficient values at
    point-transform Al; Ah>0 scans refine one magnitude bit (Al) per
    coefficient. EOB runs (EOBn symbols) span all-zero bands across
    blocks and reset at restart markers.
    """
    if progressive:
        if ss == 0 and se != 0:
            raise UnsupportedMediaError("progressive DC scan with Se != 0")
        if ss > 0 and len(order) != 1:
            raise UnsupportedMediaError("progressive AC scan must cover "
                                        "exactly one component")
    if ss > se or se > 63:
        raise UnsupportedMediaError("bad spectral selection")
    raw, rst_byte_pos, end = _unstuff(data, pos)
    br = _BitReader(raw)
    rst_iter = iter(rst_byte_pos)
    for c in order:
        c.pred = 0
    state = {"eobrun": 0}

    interleaved = len(order) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        c0 = order[0]
        n_units = c0.nx * c0.ny
    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            br.align()
            nxt = next(rst_iter, None)
            if nxt is not None and br.pos != nxt:
                # tolerate padding 1-bits before the marker
                br.pos = nxt
            for c in order:
                c.pred = 0
            state["eobrun"] = 0
        if interleaved:
            my, mx = divmod(u, mcus_x)
            targets = [(c, (my * c.v + by) * c.blocks_w + (mx * c.h + bx))
                       for c in order
                       for by in range(c.v) for bx in range(c.h)]
        else:
            c0 = order[0]
            uy, ux = divmod(u, c0.nx)
            targets = [(c0, uy * c0.blocks_w + ux)]
        for c, bi in targets:
            coeffs = c.blocks[bi]
            if not progressive:
                _block_sequential(br, c, coeffs, huff_dc, huff_ac)
            elif ss == 0 and ah == 0:
                _block_dc_first(br, c, coeffs, huff_dc, al)
            elif ss == 0:
                coeffs[0] = int(coeffs[0]) | (br.read_bit() << al)
            elif ah == 0:
                _block_ac_first(br, c, coeffs, huff_ac, ss, se, al, state)
            else:
                _block_ac_refine(br, c, coeffs, huff_ac, ss, se, al, state)
    return end


def _block_sequential(br, c, coeffs, huff_dc, huff_ac) -> None:
    dc_dec = huff_dc.get(c.td)
    ac_dec = huff_ac.get(c.ta)
    if dc_dec is None or ac_dec is None:
        raise UnsupportedMediaError("missing Huffman table")
    s = dc_dec.decode(br)
    diff = _extend(br.read_bits(s), s) if s else 0
    c.pred += diff
    coeffs[0] = c.pred
    k = 1
    while k < 64:
        rs = ac_dec.decode(br)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise UnsupportedMediaError("AC index overflow")
        coeffs[k] = _extend(br.read_bits(size), size)
        k += 1


def _block_dc_first(br, c, coeffs, huff_dc, al) -> None:
    dec = huff_dc.get(c.td)
    if dec is None:
        raise UnsupportedMediaError("missing Huffman table")
    s = dec.decode(br)
    diff = _extend(br.read_bits(s), s) if s else 0
    c.pred += diff
    coeffs[0] = c.pred << al  # python shift of a negative is arithmetic


def _block_ac_first(br, c, coeffs, huff_ac, ss, se, al, state) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    dec = huff_ac.get(c.ta)
    if dec is None:
        raise UnsupportedMediaError("missing Huffman table")
    k = ss
    while k <= se:
        rs = dec.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:  # EOBn: run of (1 << r) + extra all-zero bands,
                eb = (1 << r) - 1  # current band included
                if r:
                    eb += br.read_bits(r)
                state["eobrun"] = eb
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise UnsupportedMediaError("AC index past band end")
        coeffs[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _block_ac_refine(br, c, coeffs, huff_ac, ss, se, al, state) -> None:
    p1 = 1 << al

    def correct(k):
        # append one magnitude bit to an already-nonzero coefficient
        if br.read_bit():
            v = int(coeffs[k])
            if v > 0:
                if not v & p1:
                    coeffs[k] = v + p1
            elif not (-v) & p1:
                coeffs[k] = v - p1

    k = ss
    if state["eobrun"] == 0:
        dec = huff_ac.get(c.ta)
        if dec is None:
            raise UnsupportedMediaError("missing Huffman table")
        while k <= se:
            rs = dec.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) + (br.read_bits(r) if r else 0)
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    raise UnsupportedMediaError("bad AC refinement symbol")
                newval = p1 if br.read_bit() else -p1
            # advance over r zero-history positions, emitting correction
            # bits at every nonzero-history position passed
            while k <= se:
                if coeffs[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coeffs[k] = newval
            k += 1
    if state["eobrun"] > 0:
        # EOB band: only correction bits for nonzero-history positions
        while k <= se:
            if coeffs[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _assemble(comps: List[_Component], width: int, height: int,
              quant: Dict[int, np.ndarray]) -> np.ndarray:
    """Dequantize + IDCT + upsample + color-convert all components."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        if c.tq not in quant:
            raise UnsupportedMediaError(f"missing DQT table {c.tq}")
        # coefficients were stored in zigzag order; the quant table was
        # de-zigzagged at parse, so de-zigzag the coeffs then multiply
        nat = np.zeros_like(c.blocks)
        nat[:, ZIGZAG] = c.blocks  # zigzag pos k -> natural index ZIGZAG[k]
        nat = nat * quant[c.tq][None, :]
        blocks = _blocks_idct(nat.reshape(-1, 8, 8).astype(np.float64))
        blocks = np.clip(np.round(blocks + 128.0), 0, 255).astype(np.uint8)
        # tile blocks back into the component plane
        bh, bw = c.blocks_h, c.blocks_w
        plane = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full resolution by pixel repetition
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return planes[0][:, :, None]
    if len(planes) != 3:
        raise UnsupportedMediaError(f"{len(planes)}-component JPEG unsupported")
    y = planes[0].astype(np.float32)
    cb = planes[1].astype(np.float32) - 128.0
    cr = planes[2].astype(np.float32) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255) \
        .astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """The common libjpeg-compatible quality scaling of a base table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad a float plane to 8x8 multiples, forward-DCT + quantize all
    blocks -> (n_blocks, 64) int zigzag-order coefficients."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if ph != h or pw != w:  # edge-replicate padding (standard practice)
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8) - 128.0
    freq = _blocks_dct(blocks)
    qd = np.round(freq / q.reshape(8, 8)[None, :, :]).astype(np.int64)
    return qd.reshape(-1, 64)[:, ZIGZAG]  # natural -> zigzag order


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzag-order block; returns the new DC pred."""
    dc = int(coeffs[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.flatnonzero(coeffs[1:]) + 1
    last = nz[-1] if len(nz) else 0
    k = 1
    while k <= last:
        v = int(coeffs[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        k += 1
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _quantized_components(img: np.ndarray, quality: int, subsample: bool):
    """Color-convert, subsample, DCT and quantize an image.

    Returns ``(gray, h, w, ql, qc, mcus_x, mcus_y, comps)`` where each
    comp dict holds ``blocks`` ((n, 64) zigzag-order quantized ints over
    an MCU-padded grid), ``bw`` (grid blocks per row), ``nx``/``ny``
    (true unpadded block-grid dims, the traversal of non-interleaved
    scans), and sampling factors ``h``/``v`` + quant id ``tq``.
    """
    img = np.asarray(img)
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad image shape {img.shape}")
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    if gray:
        y = img.reshape(h, w).astype(np.float64)
        mcus_x, mcus_y = -(-w // 8), -(-h // 8)
        comps = [{"blocks": _plane_blocks(y, ql), "bw": mcus_x,
                  "nx": mcus_x, "ny": mcus_y, "h": 1, "v": 1, "tq": 0}]
        return gray, h, w, ql, qc, mcus_x, mcus_y, comps
    hs, vs = (2, 2) if subsample else (1, 1)
    y, cb, cr = _rgb_to_ycbcr(img)
    mcus_x = -(-w // (8 * hs))
    mcus_y = -(-h // (8 * vs))
    if hs == 2:
        # pad to even dims, then 2x2 box-average the chroma planes
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        if ph != h or pw != w:
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        # pad luma so its block grid is an exact MCU multiple
        if mcus_y * 16 != h or mcus_x * 16 != w:
            y = np.pad(y, ((0, mcus_y * 16 - h), (0, mcus_x * 16 - w)),
                       mode="edge")
        yw = mcus_x * 2
    else:
        yw = mcus_x
    comps = [
        {"blocks": _plane_blocks(y, ql), "bw": yw,
         "nx": -(-w // 8), "ny": -(-h // 8), "h": hs, "v": vs, "tq": 0},
        {"blocks": _plane_blocks(cb, qc), "bw": mcus_x,
         "nx": mcus_x, "ny": mcus_y, "h": 1, "v": 1, "tq": 1},
        {"blocks": _plane_blocks(cr, qc), "bw": mcus_x,
         "nx": mcus_x, "ny": mcus_y, "h": 1, "v": 1, "tq": 1},
    ]
    return gray, h, w, ql, qc, mcus_x, mcus_y, comps


def _preamble(gray, h, w, ql, qc, comps, sof_marker) -> bytearray:
    """SOI + JFIF APP0 + DQT (zigzag on the wire) + SOF."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, cd in enumerate(comps):
        sof += bytes([i + 1, (cd["h"] << 4) | cd["v"], cd["tq"]])
    out += _seg(sof_marker, sof)
    return out


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """(h, w, 3) or (h, w) / (h, w, 1) uint8 -> baseline JFIF bytes.

    ``subsample=True`` uses 4:2:0 chroma (2x2 luma sampling); grayscale
    input emits a single-component scan.
    """
    gray, h, w, ql, qc, mcus_x, mcus_y, comps = \
        _quantized_components(img, quality, subsample)
    out = _preamble(gray, h, w, ql, qc, comps, 0xC0)

    # DHT segments (Annex K tables)
    specs = [(0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC)]
    if not gray:
        specs += [(0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC)]
    for tcth, (bits, vals) in specs:
        out += _seg(0xC4, bytes([tcth]) + bytes(bits) + bytes(vals))

    dc_tabs = [_build_codes(*DC_LUMA_SPEC), _build_codes(*DC_CHROMA_SPEC)]
    ac_tabs = [_build_codes(*AC_LUMA_SPEC), _build_codes(*AC_CHROMA_SPEC)]

    # SOS (single interleaved sequential scan)
    sos = bytearray([len(comps)])
    for i in range(len(comps)):
        tid = 0 if i == 0 else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))

    bw = _BitWriter()
    preds = [0] * len(comps)
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for i, cd in enumerate(comps):
            tid = 0 if i == 0 else 1
            for by in range(cd["v"]):
                for bx in range(cd["h"]):
                    idx = (my * cd["v"] + by) * cd["bw"] + (mx * cd["h"] + bx)
                    preds[i] = _encode_block(bw, cd["blocks"][idx], preds[i],
                                             dc_tabs[tid], ac_tabs[tid])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (two-pass: optimized Huffman tables per scan)
# ---------------------------------------------------------------------------

# libjpeg-style default scan scripts: DC first at Al=1, luma AC split
# into a coarse low-frequency band then the rest, successive refinement
# passes down to Al=0. Each entry: (component indices, Ss, Se, Ah, Al).
_PROGRESSIVE_SCANS_COLOR = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROGRESSIVE_SCANS_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def _huffman_spec(counts: Dict[int, int]) -> Tuple[List[int], List[int]]:
    """Optimal length-limited canonical Huffman spec from symbol counts.

    Classic Huffman over the real symbols plus a freq-1 dummy (T.81
    Annex K.2 uses the same trick to keep the all-1-bits code unused),
    then the Annex K.3 BITS adjustment caps code lengths at 16, the
    dummy's slot is dropped from the longest length, and the most
    frequent symbol gets the shortest code. Returns (bits[16], values).
    """
    import heapq
    from itertools import count as _count
    tick = _count()
    heap = [(int(c), next(tick), (s,)) for s, c in sorted(counts.items())
            if c > 0]
    heap.append((1, next(tick), (256,)))  # dummy
    heapq.heapify(heap)
    depth = {lv[0]: 0 for _, _, lv in heap}
    while len(heap) > 1:
        f1, _, l1 = heapq.heappop(heap)
        f2, _, l2 = heapq.heappop(heap)
        merged = l1 + l2
        for s in merged:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, next(tick), merged))
    bits = [0] * 33
    for d in depth.values():
        bits[max(d, 1)] += 1
    i = 32
    while i > 16:  # Annex K.3 Adjust_BITS: push overlong pairs up
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the dummy's longest slot: all-ones stays unused
    order = sorted(((s, c) for s, c in counts.items() if c > 0),
                   key=lambda kv: (-kv[1], kv[0]))
    lengths = [ln for ln in range(1, 17) for _ in range(bits[ln])]
    if len(lengths) != len(order):
        raise AssertionError("huffman spec accounting error")
    out_bits = [0] * 16
    for ln in lengths:
        out_bits[ln - 1] += 1
    return out_bits, [s for s, _ in order]


def _dc_scan_events(comps, cidx, ah, al, mcus_x, mcus_y, evs) -> None:
    order = [(i, comps[i]) for i in cidx]
    interleaved = len(order) > 1
    preds = {i: 0 for i in cidx}
    if interleaved:
        n_units = mcus_x * mcus_y
    else:
        n_units = order[0][1]["nx"] * order[0][1]["ny"]
    for u in range(n_units):
        if interleaved:
            my, mx = divmod(u, mcus_x)
            targets = [(i, cd, (my * cd["v"] + by) * cd["bw"]
                        + (mx * cd["h"] + bx))
                       for i, cd in order
                       for by in range(cd["v"]) for bx in range(cd["h"])]
        else:
            i0, c0 = order[0]
            uy, ux = divmod(u, c0["nx"])
            targets = [(i0, c0, uy * c0["bw"] + ux)]
        for i, cd, bi in targets:
            v = int(cd["blocks"][bi][0])
            if ah == 0:
                vt = v >> al  # arithmetic shift, matching the decoder
                diff = vt - preds[i]
                preds[i] = vt
                s = _category(diff)
                evs.append(("h", 0 if i == 0 else 1, s))
                if s:
                    evs.append(("b", diff if diff >= 0 else
                                diff + (1 << s) - 1, s))
            else:
                evs.append(("b", (v >> al) & 1, 1))


def _ac_scan_events(comps, ci, ss, se, ah, al, evs) -> None:
    cd = comps[ci]
    tid = 0 if ci == 0 else 1
    eobrun = 0
    eob_bits: List[int] = []

    def flush_eob():
        nonlocal eobrun, eob_bits
        if eobrun:
            r = eobrun.bit_length() - 1
            evs.append(("h", tid, r << 4))
            if r:
                evs.append(("b", eobrun - (1 << r), r))
            for b in eob_bits:
                evs.append(("b", b, 1))
            eobrun = 0
            eob_bits = []

    for uy in range(cd["ny"]):
        for ux in range(cd["nx"]):
            coeffs = cd["blocks"][uy * cd["bw"] + ux]
            vals = [int(coeffs[k]) for k in range(ss, se + 1)]
            if ah == 0:
                # first pass: magnitudes at point transform Al
                sh = [(v >> al) if v >= 0 else -((-v) >> al) for v in vals]
                nz = [j for j, v in enumerate(sh) if v != 0]
                if not nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for j in range(nz[-1] + 1):
                    v = sh[j]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        evs.append(("h", tid, 0xF0))  # ZRL
                        run -= 16
                    s = _category(v)
                    evs.append(("h", tid, (run << 4) | s))
                    evs.append(("b", v if v >= 0 else v + (1 << s) - 1, s))
                    run = 0
                if nz[-1] < se - ss:
                    eobrun = 1  # zero tail starts an EOB run
                continue
            # refinement pass: one magnitude bit per coefficient
            t = [abs(v) >> al for v in vals]
            if not any(x == 1 for x in t):
                # no newly-significant coeff: whole band joins the EOB
                # run, carrying its correction bits
                eobrun += 1
                eob_bits.extend(x & 1 for x in t if x > 1)
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            # pend: position-ordered zero-history markers + correction
            # bits since the last emitted symbol (the decoder consumes
            # them interleaved while advancing over the run)
            pend: List[Tuple] = []
            for j, x in enumerate(t):
                if x > 1:
                    pend.append(("c", x & 1))
                elif x == 0:
                    pend.append(("z",))
                else:  # newly significant: emit run/ZRLs + sign + bits
                    zcount = sum(1 for e in pend if e[0] == "z")
                    while zcount > 15:
                        evs.append(("h", tid, 0xF0))
                        consumed = 0
                        it = iter(pend)
                        for e in it:
                            if e[0] == "z":
                                consumed += 1
                                if consumed == 16:
                                    break
                            else:
                                evs.append(("b", e[1], 1))
                        pend = list(it)
                        zcount -= 16
                    evs.append(("h", tid, (zcount << 4) | 1))
                    evs.append(("b", 1 if vals[j] > 0 else 0, 1))
                    for e in pend:
                        if e[0] == "c":
                            evs.append(("b", e[1], 1))
                    pend = []
            if pend:
                eobrun = 1
                eob_bits = [e[1] for e in pend if e[0] == "c"]
    flush_eob()


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsample: bool = False,
                            scans=None) -> bytes:
    """(h, w, 3) or (h, w) / (h, w, 1) uint8 -> progressive (SOF2) JFIF
    bytes, spectral selection + successive approximation.

    ``scans`` overrides the default scan script with a list of
    (component-indices, Ss, Se, Ah, Al) tuples; the default mirrors
    libjpeg's. Huffman tables are optimized per scan (two passes) —
    progressive needs EOBn symbols that the Annex K example tables
    don't contain.
    """
    gray, h, w, ql, qc, mcus_x, mcus_y, comps = \
        _quantized_components(img, quality, subsample)
    if scans is None:
        scans = _PROGRESSIVE_SCANS_GRAY if gray else _PROGRESSIVE_SCANS_COLOR
    out = _preamble(gray, h, w, ql, qc, comps, 0xC2)
    for cidx, ss, se, ah, al in scans:
        evs: List[Tuple] = []
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se == 0")
            _dc_scan_events(comps, cidx, ah, al, mcus_x, mcus_y, evs)
        else:
            if len(cidx) != 1:
                raise ValueError("progressive AC scan covers one component")
            _ac_scan_events(comps, cidx[0], ss, se, ah, al, evs)
        # pass 1: per-table symbol counts -> optimized DHT
        counts: Dict[int, Dict[int, int]] = {}
        for ev in evs:
            if ev[0] == "h":
                tbl = counts.setdefault(ev[1], {})
                tbl[ev[2]] = tbl.get(ev[2], 0) + 1
        tclass = 0 if ss == 0 else 1
        codes: Dict[int, Dict[int, Tuple[int, int]]] = {}
        for tid in sorted(counts):
            bits, values = _huffman_spec(counts[tid])
            out += _seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits)
                        + bytes(values))
            codes[tid] = _build_codes(bits, values)
        # SOS header
        sos = bytearray([len(cidx)])
        for i in cidx:
            tid = 0 if i == 0 else 1
            td, ta = (tid, 0) if ss == 0 else (0, tid)
            sos += bytes([i + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, bytes(sos))
        # pass 2: emit the bitstream
        wtr = _BitWriter()
        for ev in evs:
            if ev[0] == "h":
                code, ln = codes[ev[1]][ev[2]]
                wtr.write(code, ln)
            else:
                wtr.write(ev[1], ev[2])
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
