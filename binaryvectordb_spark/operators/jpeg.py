"""Baseline JPEG (ITU T.81) codec — pure numpy + stdlib, no codec library.

Closes the engine's last external-codec gap (reference stores opaque
payloads only, BinaryVectorDB/BinaryVectorDB.py:73 — image decode is an
extension surface; see SURVEY §2.12 multimodal row):

- ``decode_jpeg``: a REAL baseline sequential decoder — marker walk
  (SOI/APPn/COM/DQT/SOF0/DHT/SOS/EOI), canonical Huffman tables built from
  the DHT segments in the stream, entropy decode with 0xFF00 byte
  unstuffing, dequantization, float64 2-D IDCT, level shift; grayscale
  (1 component) and YCbCr 4:4:4 (3 components, JFIF color transform).
  Progressive/subsampled/arithmetic/12-bit streams raise ValueError.
- ``encode_jpeg_gray`` / ``encode_jpeg_rgb``: the inverse pipeline with
  spec-legal CUSTOM Huffman tables (uniform-length canonical codes: DC
  sizes 0..11 at 4 bits, all 162 AC (run,size) symbols at 8 bits).  Any
  baseline decoder can decode the output because the tables ride in DHT —
  using simple uniform tables instead of the Annex K defaults trades a
  little compression for zero table-transcription risk, and makes the
  decoder's generic DHT path the one actually exercised.

Exactness contract (what makes a LOSSY codec oracle-checkable): an 8x8
block of one constant value v has all-zero AC (the cosine sums vanish far
below quantization rounding) and DC exactly 8*(v-128); with DC quant step
8 the quantized DC is the exact integer v-128, so decode returns v in
every pixel — bit-exact.  The striped fixture generator therefore uses
8-pixel-row bands on 8-multiple dims, and the SQL oracle recomputes the
closed-form band means (queries/multimodal.py).  For non-constant content
the codec is honestly lossy; tests bound the round-trip error instead.
"""

from __future__ import annotations

import struct

import numpy as np

# -- 8x8 DCT ------------------------------------------------------------------

_DCT_M: np.ndarray | None = None


def _dct_matrix() -> np.ndarray:
    global _DCT_M
    if _DCT_M is None:
        u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        m[0] *= 1 / np.sqrt(2)
        _DCT_M = m
    return _DCT_M


def _fdct(block: np.ndarray) -> np.ndarray:
    m = _dct_matrix()
    return m @ block @ m.T


def _idct(coefs: np.ndarray) -> np.ndarray:
    m = _dct_matrix()
    return m.T @ coefs @ m


def _zigzag_order() -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for s in range(15):
        if s % 2 == 0:  # even anti-diagonals walk row-descending
            rows = range(min(s, 7), max(0, s - 7) - 1, -1)
        else:
            rows = range(max(0, s - 7), min(s, 7) + 1)
        out.extend((u, s - u) for u in rows)
    return out


ZIGZAG = _zigzag_order()          # index -> (row, col)
FLAT_QT8 = np.full((8, 8), 8, dtype=np.int32)  # the exactness table


# -- Huffman ------------------------------------------------------------------

# encoder tables: (BITS count-per-length 1..16, ordered symbol list)
_DC_SYMBOLS = list(range(12))                     # DC size categories
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 11)]
_DC_BITS = [0, 0, 0, 12] + [0] * 12               # all DC codes 4 bits
_AC_BITS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8  # all AC codes 8 bits


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:        # marker emulation -> stuff a zero
                self.buf.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops (raises) at any real marker or end of data."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy data")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2          # stuffed 0xFF
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data "
                    "(restart intervals are not supported)")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _mag_decode(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


class _HuffDecoder:
    """Canonical decode table from a DHT (BITS, symbols) pair: per-length
    (first_code, first_index) bounds — the T.81 DECODE procedure."""

    def __init__(self, bits: list[int], symbols: list[int]) -> None:
        self.symbols = symbols
        self.mincode: list[int] = []
        self.maxcode: list[int] = []
        self.valptr: list[int] = []
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr.append(k)
            self.mincode.append(code)
            self.maxcode.append(code + n - 1 if n else -1)
            code = (code + n) << 1
            k += n

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            mx = self.maxcode[length - 1]
            if mx >= 0 and code <= mx:
                return self.symbols[self.valptr[length - 1]
                                    + code - self.mincode[length - 1]]
        raise ValueError("invalid Huffman code in JPEG entropy data")


# -- encoder ------------------------------------------------------------------

def _encode_component_block(zz: list[int], prev_dc: int,
                            bw: _BitWriter) -> int:
    diff = zz[0] - prev_dc
    size = abs(diff).bit_length()
    bw.write(*_DC_CODES[size])
    if size:
        bw.write(_mag_bits(diff, size), size)
    last = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last = i
            break
    run = 0
    for i in range(1, last + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*_AC_CODES[0xF0])       # ZRL
            run -= 16
        size = abs(v).bit_length()
        bw.write(*_AC_CODES[(run << 4) | size])
        bw.write(_mag_bits(v, size), size)
        run = 0
    if last < 63:
        bw.write(*_AC_CODES[0x00])           # EOB
    return zz[0]


def _quantize_plane(plane: np.ndarray, qt: np.ndarray) -> list[list[int]]:
    """(8k, 8m) int plane -> per-block zigzag coefficient lists."""
    h, w = plane.shape
    out = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            coefs = _fdct(plane[by:by + 8, bx:bx + 8].astype(np.float64))
            q = np.rint(coefs / qt).astype(np.int64)
            out.append([int(q[u, v]) for u, v in ZIGZAG])
    return out


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def _dqt_segment(qt: np.ndarray) -> bytes:
    zz = bytes(int(qt[u, v]) for u, v in ZIGZAG)
    return _marker(0xFFDB, b"\x00" + zz)


def _dht_segment() -> bytes:
    def table(cls: int, bits: list[int], symbols: list[int]) -> bytes:
        return bytes([cls << 4]) + bytes(bits) + bytes(symbols)
    return _marker(0xFFC4, table(0, _DC_BITS, _DC_SYMBOLS)
                   + table(1, _AC_BITS, _AC_SYMBOLS))


def _encode(planes: list[np.ndarray], h: int, w: int,
            qt: np.ndarray) -> bytes:
    """Shared encoder body: planes are level-shifted int16 arrays padded to
    8-multiples, one per component, all full resolution (4:4:4)."""
    ncomp = len(planes)
    blocks = [_quantize_plane(p, qt) for p in planes]
    bw = _BitWriter()
    prev = [0] * ncomp
    mcus_y = planes[0].shape[0] // 8
    mcus_x = planes[0].shape[1] // 8
    for m in range(mcus_y * mcus_x):
        for c in range(ncomp):
            prev[c] = _encode_component_block(blocks[c][m], prev[c], bw)
    bw.flush()

    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sos = bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])      # id, 1x1 sampling, qtable 0
        sos += bytes([c + 1, 0x00])         # dc table 0, ac table 0
    sos += bytes([0, 63, 0])                # full spectral, no approx
    return (b"\xff\xd8"
            + _dqt_segment(qt)
            + _marker(0xFFC0, sof)
            + _dht_segment()
            + _marker(0xFFDA, sos)
            + bytes(bw.buf)
            + b"\xff\xd9")


def encode_jpeg_gray(px: np.ndarray, qt: np.ndarray = FLAT_QT8) -> bytes:
    """(h, w) uint8 -> baseline grayscale JFIF bytes."""
    if px.ndim != 2 or px.dtype != np.uint8:
        raise ValueError("expected (h, w) uint8 pixels")
    h, w = px.shape
    plane = _pad_to_8(px.astype(np.int16) - 128)
    return _encode([plane], h, w, np.asarray(qt, dtype=np.int32))


def encode_jpeg_rgb(px: np.ndarray, qt: np.ndarray = FLAT_QT8) -> bytes:
    """(h, w, 3) uint8 -> baseline YCbCr 4:4:4 JFIF bytes."""
    if px.ndim != 3 or px.shape[2] != 3 or px.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 pixels")
    h, w, _ = px.shape
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = np.rint(0.299 * r + 0.587 * g + 0.114 * b)
    cb = np.rint(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = np.rint(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    planes = [_pad_to_8(np.clip(p, 0, 255).astype(np.int16) - 128)
              for p in (y, cb, cr)]
    return _encode(planes, h, w, np.asarray(qt, dtype=np.int32))


# -- decoder ------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w) or (h, w, 3) uint8 pixels."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (missing SOI)")
    pos, n = 2, len(data)
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None            # (h, w, [(comp_id, qt_id)])
    scan = None             # ([(comp_idx, dc_id, ac_id)], data_pos)

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        tag = data[pos + 1]
        if tag == 0xD9:      # EOI without a scan
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if pos + 2 + seglen > n:
            raise ValueError("truncated JPEG segment")
        seg = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if tag == 0xDB:      # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                if p + 65 > len(seg):
                    raise ValueError("truncated DQT")
                qt = np.zeros((8, 8), dtype=np.int32)
                for i, (u, v) in enumerate(ZIGZAG):
                    qt[u, v] = seg[p + 1 + i]
                qts[tq] = qt
                p += 65
        elif tag in (0xC0, 0xC1):   # SOF0/1 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "only 1x1 sampling (4:4:4 / grayscale) supported")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/1) is supported")
        elif tag == 0xC4:    # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                symbols = list(seg[p + 17:p + 17 + cnt])
                if len(symbols) != cnt:
                    raise ValueError("truncated DHT")
                huff[(cls, tid)] = _HuffDecoder(bits, symbols)
                p += 17 + cnt
        elif tag == 0xDD:
            raise ValueError("restart intervals (DRI) not supported")
        elif tag == 0xDA:    # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            comp_ids = [cid for cid, _ in frame[2]]
            sel = []
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                if cid not in comp_ids:
                    raise ValueError(f"scan references unknown component {cid}")
                sel.append((comp_ids.index(cid), tables >> 4, tables & 0xF))
            scan = (sel, pos)
            break
        # APPn / COM / others: skipped

    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS — truncated or non-JPEG stream")
    h, w, comps = frame
    sel, dpos = scan
    if len(sel) != len(comps):
        raise ValueError("partial (multi-scan) images not supported")

    for _, qid in comps:
        if qid not in qts:
            raise ValueError(f"missing quant table {qid}")
    for _, dc_id, ac_id in sel:
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("missing Huffman table referenced by scan")

    mcus_x, mcus_y = -(-w // 8), -(-h // 8)
    planes = [np.zeros((mcus_y * 8, mcus_x * 8), dtype=np.float64)
              for _ in comps]
    br = _BitReader(data, dpos)
    prev = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for (ci, dc_id, ac_id) in sel:
                dc_dec = huff[(0, dc_id)]
                ac_dec = huff[(1, ac_id)]
                zz = [0] * 64
                size = dc_dec.decode(br)
                prev[ci] += _mag_decode(br.read_bits(size), size)
                zz[0] = prev[ci]
                k = 1
                while k < 64:
                    sym = ac_dec.decode(br)
                    if sym == 0x00:          # EOB
                        break
                    if sym == 0xF0:          # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    zz[k] = _mag_decode(br.read_bits(size), size)
                    k += 1
                coefs = np.zeros((8, 8), dtype=np.float64)
                qt = qts[comps[ci][1]]
                for i, (u, v) in enumerate(ZIGZAG):
                    coefs[u, v] = zz[i] * qt[u, v]
                planes[ci][my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                    _idct(coefs)

    planes = [p[:h, :w] + 128 for p in planes]
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)
