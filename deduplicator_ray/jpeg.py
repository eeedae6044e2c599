"""Baseline JPEG (JFIF) codec in pure numpy + stdlib — the dominant web
image format flipped stub→native (codecs.CODEC_CAPABILITIES).

Decoder: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
spectral selection + successive approximation, DC/AC first+refinement
scans, EOB runs, T.81 Annex G semantics matching libjpeg's jdphuff
interop behavior), 8-bit, 1 or 3 components,
sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, byte
stuffing; Huffman and quantization tables are read from the stream
(spec F.2.2 canonical decode), dequantize + IDCT run vectorized over all
blocks per component (one einsum), chroma upsamples by sample
replication, BT.601 full-range YCbCr→RGB.  Arithmetic, 12-bit and
lossless streams are refused with CodecError — the decode stage's
dead-letter taxonomy, never a wrong image.

Encoder (fixture/golden side): 4:2:0 or 4:4:4, Annex-K quantization
tables with the libjpeg quality scaling, Annex-K Huffman tables, restart
markers off.  The encoder exists so fixtures can emit REAL byte-distinct
re-encodes (same pixels, different quality) that only perceptual hashing
catches — the reference decodes jpg with PIL (/root/reference/
dupedb.py:85-86); this module is that path's in-sandbox stand-in.

The DCT pair uses the orthonormal 8-point DCT-II matrix, so
encode(decode) round-trips within quantization error; PSNR invariance is
pinned by tests (golden vectors + the dHash-stability gate).
"""

from __future__ import annotations

import struct

import numpy as np

from deduplicator_ray.codecs import CodecError

# ---------------------------------------------------------------------------
# constants

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)
_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)

# Annex-K Huffman specs: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: coef = T @ block @ T.T."""
    n = np.arange(8)
    k = n[:, None]
    t = np.cos((2 * n[None, :] + 1) * k * np.pi / 16) * 0.5
    t[0, :] = 0.5 / np.sqrt(2.0)
    return t


_T = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((_Q_LUM * scale + 50) // 100, 1, 255)
    chrom = np.clip((_Q_CHROM * scale + 50) // 100, 1, 255)
    return lum.astype(np.int64), chrom.astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman: canonical code assignment (spec C.2) shared by both sides


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, size)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            out[vals[k]] = (code, size)
            code += 1
            k += 1
        code <<= 1
    return out


from functools import lru_cache


@lru_cache(maxsize=32)
def _peek_tables(bits: tuple, vals: tuple) -> tuple[list[int], list[int]]:
    """16-bit peek lookup for one Huffman table: index by the next 16 bits
    of the stream → (value, code length); length 0 marks an invalid code.
    Cached across images — real corpora overwhelmingly ship the Annex-K
    tables, so the 64 KB build cost is paid once per process."""
    val = [0] * 65536
    ln = [0] * 65536
    code = 0
    k = 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            lo = code << (16 - size)
            hi = (code + 1) << (16 - size)
            for i in range(lo, hi):
                val[i] = vals[k]
                ln[i] = size
            code += 1
            k += 1
        code <<= 1
    return val, ln


class _HuffDecoder:
    """Peek-table decode: one 16-bit buffered peek resolves any code in
    O(1) Python ops (replaces the per-bit F.2.2.3 walk — ~8× on the
    entropy-decode hot loop)."""

    __slots__ = ("val", "ln")

    def __init__(self, bits: list[int], vals: list[int]):
        self.val, self.ln = _peek_tables(tuple(bits), tuple(vals))

    def decode(self, br: "_BitReader") -> int:
        if br.nbits < 16:
            br.fill()
        idx = (br.acc >> (br.nbits - 16)) & 0xFFFF
        L = self.ln[idx]
        if L == 0:
            raise CodecError("bad jpeg huffman code")
        br.nbits -= L
        return self.val[idx]


class _BitReader:
    """Entropy-coded segment reader: byte unstuffing (FF00), buffered
    whole-byte fills.  A marker (or EOF) inside the scan feeds zero
    padding instead of bits; more than 4 padding bytes consumed as code
    input means the stream is truncated (legitimate 1-padding is < 2
    bytes around the final EOB / a restart boundary)."""

    __slots__ = ("data", "pos", "acc", "nbits", "pad")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.pad = 0

    def fill(self) -> None:
        d = self.data
        n = len(d)
        while self.nbits < 16:
            p = self.pos
            if p < n:
                b = d[p]
                if b == 0xFF:
                    if p + 1 < n and d[p + 1] == 0x00:
                        self.pos = p + 2
                        self.acc = ((self.acc << 8) | 0xFF)
                        self.nbits += 8
                        continue
                    # marker (restart/EOI): do not consume — pad instead
                    self.pad += 1
                    if self.pad > 4:
                        raise CodecError("truncated jpeg scan")
                    self.acc <<= 8
                    self.nbits += 8
                    continue
                self.pos = p + 1
                self.acc = (self.acc << 8) | b
                self.nbits += 8
            else:
                self.pad += 1
                if self.pad > 4:
                    raise CodecError("truncated jpeg scan")
                self.acc <<= 8
                self.nbits += 8
        self.acc &= (1 << self.nbits) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self.fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_and_expect_rst(self, which: int) -> None:
        # fill() never consumes a marker, so scanning FORWARD from pos for
        # the first non-stuffed FF lands exactly on the restart marker —
        # robust to whatever mix of real/stuffed/padding bytes is buffered
        # (entropy data contains FF only as FF00)
        d = self.data
        p = self.pos
        n = len(d)
        while p + 1 < n and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        # B.1.1.2: a marker may be preceded by any number of 0xFF fill
        # bytes — "FF FF D0" is spec-legal, so skip the fill run before
        # comparing against the expected RSTn code
        while p + 2 < n and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= n or d[p + 1] != 0xD0 + which:
            raise CodecError("missing jpeg restart marker")
        self.pos = p + 2
        self.nbits = 0
        self.acc = 0
        self.pad = 0


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


# ---------------------------------------------------------------------------
# progressive scans (T.81 Annex G; EOB-run and refinement semantics match
# libjpeg's jdphuff.c, the de-facto interop standard)


def _skip_to_marker(data: bytes, p: int) -> int:
    """Forward from an entropy-coded position to the next real marker's
    0xFF (skipping stuffed FF00, fill-byte runs, and stray RSTn)."""
    n = len(data)
    while p + 1 < n:
        if data[p] != 0xFF:
            p += 1
            continue
        nxt = data[p + 1]
        if nxt == 0x00:
            p += 2
        elif nxt == 0xFF:
            p += 1
        elif 0xD0 <= nxt <= 0xD7:
            p += 2
        else:
            return p
    raise CodecError("jpeg truncated after scan")


def _decode_prog_scan(data: bytes, pos: int, scomps: list[dict],
                      comps: list[dict], dc_tabs: dict, ac_tabs: dict,
                      dri: int, w: int, h: int,
                      ss: int, se: int, ah: int, al: int) -> int:
    """Decode ONE progressive scan into the components' coefficient
    grids; returns the stream position of the next marker.  Scan-header
    legality per G.1.1.1.1: DC scans have ss=se=0; AC scans name exactly
    one component; each refinement steps the point transform by one."""
    ns = len(scomps)
    if ss == 0:
        if se != 0:
            raise CodecError("jpeg progressive DC scan with se != 0")
    else:
        if ns != 1 or se < ss or se > 63:
            raise CodecError("bad jpeg progressive AC scan header")
    if ah not in (0, al + 1) or al > 13:
        raise CodecError("bad jpeg successive approximation")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    rst = 0

    def restart(i: int) -> bool:
        return bool(dri) and i and i % dri == 0

    if ss == 0 and ns > 1:
        # interleaved DC scan: MCU walk across the scan's components
        for c in scomps:
            if ah == 0 and c.get("td") not in dc_tabs:
                raise CodecError("jpeg references missing DHT")
        preds = [0] * ns
        for m in range(mcux * mcuy):
            if restart(m):
                br.align_and_expect_rst(rst)
                rst = (rst + 1) & 7
                preds = [0] * ns
            my, mx = divmod(m, mcux)
            for ci, c in enumerate(scomps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = ((my * c["v"] + by) * c["bw"]
                               + (mx * c["h"] + bx))
                        blk = c["coef"][row]
                        if ah == 0:
                            t = dc_tabs[c["td"]].decode(br)
                            if t > 11:
                                raise CodecError("bad jpeg DC category")
                            diff = _extend(br.receive(t), t) if t else 0
                            preds[ci] = max(-(1 << 30),
                                            min((1 << 30),
                                                preds[ci] + diff))
                            blk[0] = preds[ci] << al
                        elif br.receive(1):
                            blk[0] = int(blk[0]) | (1 << al)
        return _skip_to_marker(data, br.pos)

    # non-interleaved: one component, its own block raster (A.2.2 dims)
    c = scomps[0]
    cw = -(-(w * c["h"]) // hmax)
    chh = -(-(h * c["v"]) // vmax)
    nbx = -(-cw // 8)
    nby = -(-chh // 8)
    if ss == 0:
        if ah == 0 and c.get("td") not in dc_tabs:
            raise CodecError("jpeg references missing DHT")
        pred = 0
        eobrun = 0
        i = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart(i):
                    br.align_and_expect_rst(rst)
                    rst = (rst + 1) & 7
                    pred = 0
                i += 1
                blk = c["coef"][by * c["bw"] + bx]
                if ah == 0:
                    t = dc_tabs[c["td"]].decode(br)
                    if t > 11:
                        raise CodecError("bad jpeg DC category")
                    diff = _extend(br.receive(t), t) if t else 0
                    pred = max(-(1 << 30), min((1 << 30), pred + diff))
                    blk[0] = pred << al
                elif br.receive(1):
                    blk[0] = int(blk[0]) | (1 << al)
        return _skip_to_marker(data, br.pos)
    if c.get("ta") not in ac_tabs:
        raise CodecError("jpeg references missing DHT")
    return _decode_prog_ac_fast(data, pos, c, ac_tabs[c["ta"]],
                                dri, nbx, nby, ss, se, ah, al)


def _decode_prog_ac_fast(data: bytes, pos: int, c: dict,
                         act: _HuffDecoder, dri: int, nbx: int, nby: int,
                         ss: int, se: int, ah: int, al: int) -> int:
    """Progressive AC scan (first or refinement) over one component's
    block raster with the fast bit path: the scan is RST-split and
    FF00-unstuffed once (``_split_scan_segments``), bit state lives in
    local ints, and the accumulator refills four bytes at a time — the
    same rework that took the baseline scan 127→95 ms; progressive
    streams pay it per AC scan, so the constant matters ~4×.  EOB-run /
    refinement semantics unchanged (equality matrix + fuzz pin them)."""
    n_units = nbx * nby
    n_ivl = (n_units - 1) // dri if dri else 0
    segs, end_pos = _split_scan_segments(data, pos, n_ivl)
    if len(segs) < n_ivl + 1:
        raise CodecError("missing jpeg restart marker")
    acv, acl = act.val, act.ln
    coef = c["coef"]
    cbw = c["bw"]
    p1v = 1 << al
    seg_i = 0
    seg = segs[0] + b"\x00" * 8
    limit = len(segs[0]) + 4
    acc = 0
    nbits = 0
    p = 0
    eobrun = 0
    i = 0
    for by in range(nby):
        for bx in range(nbx):
            if dri and i and i % dri == 0:
                seg_i += 1
                raw = segs[seg_i]
                seg = raw + b"\x00" * 8
                limit = len(raw) + 4
                acc = 0
                nbits = 0
                p = 0
                eobrun = 0
            i += 1
            blk = coef[by * cbw + bx]
            if ah == 0:
                # ----- AC spectral first (G.2.2) -----
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    if nbits < 16:
                        if p >= limit:
                            raise CodecError("truncated jpeg scan")
                        acc = ((acc & ((1 << nbits) - 1)) << 32) \
                            | int.from_bytes(seg[p:p + 4], "big")
                        p += 4
                        nbits += 32
                    peek = (acc >> (nbits - 16)) & 0xFFFF
                    L = acl[peek]
                    if L == 0:
                        raise CodecError("bad jpeg huffman code")
                    nbits -= L
                    rs = acv[peek]
                    sz = rs & 0xF
                    if sz == 0:
                        r = rs >> 4
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            if nbits < r:
                                if p >= limit:
                                    raise CodecError("truncated jpeg scan")
                                acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                    | int.from_bytes(seg[p:p + 4], "big")
                                p += 4
                                nbits += 32
                            nbits -= r
                            eobrun += (acc >> nbits) & ((1 << r) - 1)
                        break
                    k += rs >> 4
                    if k > se:
                        raise CodecError("jpeg AC run past spectral band")
                    if nbits < sz:
                        if p >= limit:
                            raise CodecError("truncated jpeg scan")
                        acc = ((acc & ((1 << nbits) - 1)) << 32) \
                            | int.from_bytes(seg[p:p + 4], "big")
                        p += 4
                        nbits += 32
                    nbits -= sz
                    v = (acc >> nbits) & ((1 << sz) - 1)
                    blk[k] = (v - (1 << sz) + 1
                              if v < (1 << (sz - 1)) else v) << al
                    k += 1
                continue
            # ----- AC refinement (G.2.2 / jdphuff) -----
            k = ss
            if eobrun == 0:
                while k <= se:
                    if nbits < 16:
                        if p >= limit:
                            raise CodecError("truncated jpeg scan")
                        acc = ((acc & ((1 << nbits) - 1)) << 32) \
                            | int.from_bytes(seg[p:p + 4], "big")
                        p += 4
                        nbits += 32
                    peek = (acc >> (nbits - 16)) & 0xFFFF
                    L = acl[peek]
                    if L == 0:
                        raise CodecError("bad jpeg huffman code")
                    nbits -= L
                    rs = acv[peek]
                    sz = rs & 0xF
                    if sz == 0:
                        r = rs >> 4
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                if nbits < r:
                                    if p >= limit:
                                        raise CodecError(
                                            "truncated jpeg scan")
                                    acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                        | int.from_bytes(seg[p:p + 4], "big")
                                    p += 4
                                    nbits += 32
                                nbits -= r
                                eobrun += (acc >> nbits) & ((1 << r) - 1)
                            break
                        nzero = 15
                        newval = 0
                    else:
                        if sz != 1:
                            raise CodecError(
                                "bad jpeg AC refinement magnitude")
                        nzero = rs >> 4
                        if nbits < 1:
                            if p >= limit:
                                raise CodecError("truncated jpeg scan")
                            acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                | int.from_bytes(seg[p:p + 4], "big")
                            p += 4
                            nbits += 32
                        nbits -= 1
                        newval = p1v if (acc >> nbits) & 1 else -p1v
                    while True:
                        if k > se:
                            if sz:
                                raise CodecError(
                                    "jpeg AC refine run past band")
                            break
                        v = int(blk[k])
                        if v != 0:
                            if nbits < 1:
                                if p >= limit:
                                    raise CodecError("truncated jpeg scan")
                                acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                    | int.from_bytes(seg[p:p + 4], "big")
                                p += 4
                                nbits += 32
                            nbits -= 1
                            if (acc >> nbits) & 1 and (v & p1v) == 0:
                                blk[k] = v + (p1v if v >= 0 else -p1v)
                            k += 1
                            continue
                        nzero -= 1
                        if nzero < 0:
                            if sz:
                                blk[k] = newval
                            k += 1
                            break
                        k += 1
            if eobrun > 0:
                while k <= se:
                    v = int(blk[k])
                    if v != 0:
                        if nbits < 1:
                            if p >= limit:
                                raise CodecError("truncated jpeg scan")
                            acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                | int.from_bytes(seg[p:p + 4], "big")
                            p += 4
                            nbits += 32
                        nbits -= 1
                        if (acc >> nbits) & 1 and (v & p1v) == 0:
                            blk[k] = v + (p1v if v >= 0 else -p1v)
                    k += 1
                eobrun -= 1
    return end_pos


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, 3) RGB uint8 (grayscale replicates).

    Every malformation surfaces as CodecError (the dead-letter contract
    the fingerprint stage and oracle rely on): the parser's own checks
    raise it directly, and the outer wrapper in this function converts
    any residual struct/index/value error a bit-rotted or adversarial
    payload can provoke — a web-corpus jpg must never escape the error
    taxonomy and kill the whole map_batches task."""
    try:
        return _decode_jpeg_inner(data)
    except CodecError:
        raise
    except (struct.error, IndexError, ValueError, OverflowError) as e:
        raise CodecError(f"malformed jpeg: {type(e).__name__}: {e}") from e


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if data is None:
        raise CodecError("null payload")
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise CodecError("not a jpeg (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    comps: list[dict] = []
    h = w = 0
    dri = 0
    progressive = False
    any_scan = False
    n = len(data)
    while True:
        # standalone markers (incl. the final EOI) are 2 bytes; segment
        # markers need 2 more for the length field, checked below
        if pos + 2 > n:
            raise CodecError("truncated jpeg segments")
        if data[pos] != 0xFF:
            raise CodecError("jpeg marker desync")
        # spec B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip the run so 'FF FF DB' parses as DQT instead
        # of desyncing (review-found; real optimizer output does this)
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (stray SOI, TEM, RSTn): no length field
            continue
        if marker == 0xD9:
            if progressive and any_scan:
                break  # progressive stream complete → reconstruction
            raise CodecError("jpeg EOI before scan")
        if pos + 2 > n:
            raise CodecError("truncated jpeg segments")
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2: pos + seglen]
        if len(seg) != seglen - 2:
            raise CodecError("truncated jpeg segment")
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq == 0:
                    tab = np.frombuffer(seg[sp:sp + 64], np.uint8)
                    sp += 64
                elif pq == 1:
                    tab = np.frombuffer(seg[sp:sp + 128], ">u2")
                    sp += 128
                else:
                    raise CodecError("bad DQT precision")
                if len(tab) != 64:
                    raise CodecError("truncated DQT")
                qtabs[tq] = tab.astype(np.int64)[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1: sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17: sp + 17 + nv])
                if len(bits) != 16 or len(vals) != nv:
                    raise CodecError("truncated DHT")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(bits, vals)
                sp += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            if comps:
                # a second SOF would append coefficient-less component
                # entries that a later SOS resolves to — the KeyError
                # escaped the taxonomy (review-found); one frame per
                # stream is also what the spec allows (B.2.1)
                raise CodecError("duplicate jpeg SOF")
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise CodecError(f"unsupported jpeg precision {prec}")
            if h <= 0 or w <= 0:
                raise CodecError("bad jpeg dims")
            from deduplicator_ray.codecs import MAX_DECODE_PIXELS

            if w * h > MAX_DECODE_PIXELS:
                raise CodecError(f"decompression bomb: jpeg header {w}x{h}")
            if nc not in (1, 3):
                raise CodecError(f"unsupported jpeg component count {nc}")
            if len(seg) < 6 + 3 * nc:
                raise CodecError("truncated SOF component specs")
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci: 9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise CodecError(f"unsupported sampling {ch}x{cv}")
                comps.append(dict(cid=cid, h=ch, v=cv, tq=tq))
            if nc == 1:
                # a one-component scan is NON-interleaved (spec A.2.2):
                # sampling factors are ignored, data is plain block
                # raster — honoring declared 2x2 factors here would
                # scramble legal grayscale streams
                comps[0]["h"] = comps[0]["v"] = 1
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise CodecError("unsupported jpeg mode (lossless/arith)")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS → entropy decode
            ns = seg[0]
            if not comps:
                raise CodecError("jpeg SOS before SOF")
            if not progressive and ns != len(comps):
                raise CodecError("jpeg SOS/SOF component mismatch")
            if len(seg) < 4 + 2 * ns:
                raise CodecError("truncated jpeg SOS")
            scomps = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                hit = None
                for c in comps:
                    if c["cid"] == cs:
                        c["td"], c["ta"] = tt >> 4, tt & 0xF
                        hit = c
                if hit is None:
                    raise CodecError("jpeg SOS names unknown component")
                scomps.append(hit)
            if not progressive:
                pos = pos + seglen
                break
            ss_, se_, aa = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah_, al_ = aa >> 4, aa & 0xF
            if not any_scan:
                _alloc_coefs(comps, w, h)
            any_scan = True
            pos = _decode_prog_scan(
                data, pos + seglen, scomps, comps, dc_tabs, ac_tabs,
                dri, w, h, ss_, se_, ah_, al_)
            continue
        # APPn / COM / others: skip
        pos += seglen

    for c in comps:
        if c["tq"] not in qtabs:
            raise CodecError("jpeg references missing DQT")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if progressive:
        return _reconstruct(comps, qtabs, w, h, hmax, vmax)
    _alloc_coefs(comps, w, h)
    for c in comps:
        if c.get("td") not in dc_tabs or c.get("ta") not in ac_tabs:
            raise CodecError("jpeg references missing DHT")

    _decode_baseline_scan_fast(data, pos, comps, dc_tabs, ac_tabs,
                               dri, mcux, mcuy)
    return _reconstruct(comps, qtabs, w, h, hmax, vmax)


def _split_scan_segments(data: bytes, pos: int,
                         n_intervals: int) -> tuple[list[bytes], int]:
    """(unstuffed per-restart-interval segments, next-marker position).

    The scan's entropy region up to the next real marker is located
    once, split on RSTn boundaries (B.1.1.2 fill bytes tolerated), and
    each segment drops its FF00 stuffing via bytes.replace — after this
    the bit feeder never needs a stuffing branch."""
    n = len(data)
    segs: list[bytes] = []
    seg_start = pos
    p = pos
    end_pos = n
    while True:
        # find next candidate marker byte
        q = data.find(b"\xff", p)
        if q < 0 or q + 1 >= n:
            segs.append(data[seg_start: n if q < 0 else q])
            end_pos = n if q < 0 else q
            break
        nxt = data[q + 1]
        if nxt == 0x00:
            p = q + 2
            continue
        if nxt == 0xFF:
            p = q + 1
            continue
        if 0xD0 <= nxt <= 0xD7:
            # RSTn sequence numbers must cycle D0..D7 in order — a wrong
            # code means dropped/reordered intervals (the same check
            # align_and_expect_rst makes)
            if nxt != 0xD0 + (len(segs) & 7):
                raise CodecError("missing jpeg restart marker")
            segs.append(data[seg_start:q])
            # tolerate fill bytes already skipped by the FF-run branch
            seg_start = q + 2
            p = q + 2
            if len(segs) >= n_intervals + 1:
                end_pos = q
                break
            continue
        segs.append(data[seg_start:q])
        end_pos = q
        break
    return [sg.replace(b"\xff\x00", b"\xff") for sg in segs], end_pos


def _decode_baseline_scan_fast(data: bytes, pos: int, comps: list[dict],
                               dc_tabs: dict, ac_tabs: dict, dri: int,
                               mcux: int, mcuy: int) -> None:
    """Baseline entropy decode, hot-loop optimized three ways over the
    _BitReader version (cProfile, 580×540 noisy image):

    - the scan region is pre-split on restart boundaries and UNSTUFFED
      once (``_split_scan_segments``), so the inner loop refills the bit
      accumulator four bytes at a time with ``int.from_bytes`` and has
      no stuffing/marker branch at all;
    - bit state and the 16-bit Huffman peek are local ints (no method
      calls, no attribute churn);
    - coefficients collect into flat Python lists and scatter into each
      component's int32 grid with ONE numpy indexed assign per
      component.

    Semantics identical to the _BitReader path: ≤4 zero-pad bytes past
    a segment end, RSTn sequence checking, DC predictor clamp."""
    n_mcu = mcux * mcuy
    n_ivl = (n_mcu - 1) // dri if dri else 0
    segs, _ = _split_scan_segments(data, pos, n_ivl)
    if len(segs) < n_ivl + 1:
        raise CodecError("missing jpeg restart marker")
    ncomp = len(comps)
    ctx = []
    for c in comps:
        dct = dc_tabs[c["td"]]
        act = ac_tabs[c["ta"]]
        ctx.append((dct.val, dct.ln, act.val, act.ln,
                    c["v"], c["h"], c["bw"]))
    idx_out: list[list[int]] = [[] for _ in comps]
    val_out: list[list[int]] = [[] for _ in comps]

    seg_i = 0
    # 8 zero pad bytes: a fill may start up to 4 bytes past the real
    # data (the _BitReader pad-cap semantics) and still slice 4 whole
    # bytes; a fill starting beyond that is the truncation signal
    seg = segs[0] + b"\x00" * 8
    limit = len(segs[0]) + 4
    acc = 0
    nbits = 0
    p = 0
    preds = [0] * ncomp
    for m in range(n_mcu):
        if dri and m and m % dri == 0:
            seg_i += 1
            raw = segs[seg_i]
            seg = raw + b"\x00" * 8
            limit = len(raw) + 4
            acc = 0
            nbits = 0
            p = 0
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            dcv, dcl, acv, acl, cv, chh, cbw = ctx[ci]
            iout = idx_out[ci]
            vout = val_out[ci]
            for by in range(cv):
                row_base = (my * cv + by) * cbw
                for bx in range(chh):
                    base64 = (row_base + mx * chh + bx) << 6
                    # --- DC ---
                    if nbits < 16:
                        if p >= limit:
                            raise CodecError("truncated jpeg scan")
                        acc = ((acc & ((1 << nbits) - 1)) << 32) \
                            | int.from_bytes(seg[p:p + 4], "big")
                        p += 4
                        nbits += 32
                    peek = (acc >> (nbits - 16)) & 0xFFFF
                    L = dcl[peek]
                    if L == 0:
                        raise CodecError("bad jpeg huffman code")
                    nbits -= L
                    t = dcv[peek]
                    if t > 11:
                        raise CodecError("bad jpeg DC category")
                    if t:
                        if nbits < t:
                            if p >= limit:
                                raise CodecError("truncated jpeg scan")
                            acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                | int.from_bytes(seg[p:p + 4], "big")
                            p += 4
                            nbits += 32
                        nbits -= t
                        v = (acc >> nbits) & ((1 << t) - 1)
                        diff = v - (1 << t) + 1 if v < (1 << (t - 1)) else v
                    else:
                        diff = 0
                    # clamp: a corrupt stream can walk the predictor
                    # arbitrarily far; legal values fit 12 bits
                    pv = preds[ci] + diff
                    if pv > (1 << 30):
                        pv = 1 << 30
                    elif pv < -(1 << 30):
                        pv = -(1 << 30)
                    preds[ci] = pv
                    iout.append(base64)
                    vout.append(pv)
                    # --- AC ---
                    k = 1
                    while k < 64:
                        if nbits < 16:
                            if p >= limit:
                                raise CodecError("truncated jpeg scan")
                            acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                | int.from_bytes(seg[p:p + 4], "big")
                            p += 4
                            nbits += 32
                        peek = (acc >> (nbits - 16)) & 0xFFFF
                        L = acl[peek]
                        if L == 0:
                            raise CodecError("bad jpeg huffman code")
                        nbits -= L
                        rs = acv[peek]
                        sz = rs & 0xF
                        if sz == 0:
                            if rs == 0xF0:
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise CodecError("jpeg AC run past block")
                        if nbits < sz:
                            if p >= limit:
                                raise CodecError("truncated jpeg scan")
                            acc = ((acc & ((1 << nbits) - 1)) << 32) \
                                | int.from_bytes(seg[p:p + 4], "big")
                            p += 4
                            nbits += 32
                        nbits -= sz
                        v = (acc >> nbits) & ((1 << sz) - 1)
                        iout.append(base64 + k)
                        vout.append(v - (1 << sz) + 1
                                    if v < (1 << (sz - 1)) else v)
                        k += 1
    for ci, c in enumerate(comps):
        if idx_out[ci]:
            flat = c["coef"].reshape(-1)
            flat[np.asarray(idx_out[ci], np.int64)] = \
                np.asarray(val_out[ci], np.int64)


def _alloc_coefs(comps: list[dict], w: int, h: int) -> None:
    """MCU-padded per-component coefficient grids (int32: the standing
    decode state is the largest allocation header dims can force — legal
    dequantized values fit 27 bits; IDCT float temporaries are chunked,
    so the bomb guard's pixel cap bounds JPEG memory like the other
    formats)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        c["coef"] = np.zeros((bh * bw, 64), np.int32)
        c["bw"] = bw


def _reconstruct(comps: list[dict], qtabs: dict, w: int, h: int,
                 hmax: int, vmax: int) -> np.ndarray:
    # dequantize + IDCT per component: coef rows are in zigzag order as
    # decoded → dequant in zigzag, then unzigzag.  IDCT runs as two
    # broadcast BLAS matmuls (einsum's 3-operand path was the profile's
    # top cost at 0.14 s per 580×540 image) over CHUNKS of block rows,
    # so float64 temporaries stay bounded (~tens of MB) no matter what
    # the header declares
    for c in comps:
        if "coef" not in c:
            raise CodecError("jpeg stream held no scan data")
    planes = []
    for c in comps:
        qz = qtabs[c["tq"]].reshape(-1)[ZIGZAG].astype(np.int64)
        bw = c["bw"]
        bh = c["coef"].shape[0] // bw
        plane = np.empty((bh * 8, bw * 8), np.uint8)
        step = max(1, (1 << 16) // max(bw, 1))  # block rows per chunk
        for r0 in range(0, bh, step):
            r1 = min(r0 + step, bh)
            part = c["coef"][r0 * bw: r1 * bw].astype(np.int64) * qz[None, :]
            deq = part[:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
            blocks = (_T.T @ deq) @ _T
            blocks = np.clip(np.round(blocks + 128.0), 0, 255) \
                .astype(np.uint8)
            plane[r0 * 8: r1 * 8] = (
                blocks.reshape(r1 - r0, bw, 8, 8)
                .transpose(0, 2, 1, 3).reshape((r1 - r0) * 8, bw * 8))
        # upsample to full resolution by replication
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(w, h) from the SOF header WITHOUT entropy decode — the header-only
    probe (the png/gif decoders' bomb guards play the same role).  The
    full decoder re-derives dims itself; this exists for callers that
    must size or reject a payload before paying for a decode."""
    if data is None or len(data) < 4 or data[:2] != b"\xff\xd8":
        raise CodecError("not a jpeg")
    pos = 2
    n = len(data)
    try:
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                raise CodecError("jpeg marker desync")
            while pos + 1 < n and data[pos + 1] == 0xFF:
                pos += 1  # B.1.1.2 fill bytes
            marker = data[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return w, h
            if marker == 0xD9 or marker == 0xDA:
                break
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone: no length field
                continue
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            pos += 2 + seglen
    except struct.error as e:
        raise CodecError(f"malformed jpeg header: {e}") from e
    raise CodecError("jpeg SOF not found")


# ---------------------------------------------------------------------------
# encoder


def _encode_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """float plane (multiple of 8) → (nblocks, 64) zigzag quantized ints."""
    ph, pw = plane.shape
    blocks = (plane.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0)
    coef = (_T @ blocks) @ _T.T
    quant = np.round(coef / qtbl[None, :, :]).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _mag(v: int) -> tuple[int, int]:
    """(category, appended bits) for a coefficient (spec F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_component(bw_: _BitWriter, blocks: np.ndarray, pred: int,
                      dc_codes, ac_codes) -> int:
    for blk in blocks:
        t, bits = _mag(int(blk[0]) - pred)
        pred = int(blk[0])
        c, s = dc_codes[t]
        bw_.write(c, s)
        if t:
            bw_.write(bits, t)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, s = ac_codes[0xF0]
                bw_.write(c, s)
                run -= 16
            t, bits = _mag(v)
            c, s = ac_codes[(run << 4) | t]
            bw_.write(c, s)
            bw_.write(bits, t)
            run = 0
        if last < 63:
            c, s = ac_codes[0x00]
            bw_.write(c, s)
    return pred


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = True, restart_mcus: int = 0) -> bytes:
    """(h, w, 3) RGB uint8 → baseline JFIF bytes (4:2:0 when ``subsample``,
    else 4:4:4).  ``restart_mcus`` > 0 emits a DRI segment and RSTn
    markers every that-many MCUs (fixture-side coverage for the
    decoder's restart-interval path)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise CodecError("encode_jpeg wants (h, w, 3) RGB")
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0
    qlum, qchrom = _quality_tables(quality)
    qlum8 = qlum.reshape(8, 8).astype(np.float64)
    qchrom8 = qchrom.reshape(8, 8).astype(np.float64)

    sh = 2 if subsample else 1

    def pad_to(a: np.ndarray, mult: int) -> np.ndarray:
        ph = (-a.shape[0]) % mult
        pw = (-a.shape[1]) % mult
        return np.pad(a, ((0, ph), (0, pw)), mode="edge")

    ypad = pad_to(y, 8 * sh)
    if subsample:
        cbp = pad_to(cb, 16)
        crp = pad_to(cr, 16)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
    else:
        cbs = pad_to(cb, 8)
        crs = pad_to(cr, 8)

    yb = _encode_blocks(ypad, qlum8)
    cbb = _encode_blocks(cbs, qchrom8)
    crb = _encode_blocks(crs, qchrom8)

    dc_l = _huff_codes(*_DC_LUM)
    dc_c = _huff_codes(*_DC_CHROM)
    ac_l = _huff_codes(*_AC_LUM)
    ac_c = _huff_codes(*_AC_CHROM)

    bw_ = _BitWriter()
    ybw = ypad.shape[1] // 8
    cbw = cbs.shape[1] // 8
    if subsample:
        mcux, mcuy = ybw // 2, ypad.shape[0] // 16
    else:
        mcux, mcuy = ybw, ypad.shape[0] // 8
    py = pc_ = pr = 0
    rst = 0
    for m in range(mcux * mcuy):
        if restart_mcus and m and m % restart_mcus == 0:
            # byte-align with 1-bits, emit RSTn, reset DC predictors
            bw_.flush()
            bw_.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            py = pc_ = pr = 0
        my, mx = divmod(m, mcux)
        if subsample:
            rows = [(2 * my + by) * ybw + (2 * mx + bx)
                    for by in range(2) for bx in range(2)]
            py = _encode_component(bw_, yb[rows], py, dc_l, ac_l)
            pc_ = _encode_component(bw_, cbb[[my * cbw + mx]], pc_, dc_c, ac_c)
            pr = _encode_component(bw_, crb[[my * cbw + mx]], pr, dc_c, ac_c)
        else:
            r = [my * ybw + mx]
            py = _encode_component(bw_, yb[r], py, dc_l, ac_l)
            pc_ = _encode_component(bw_, cbb[r], pc_, dc_c, ac_c)
            pr = _encode_component(bw_, crb[r], pr, dc_c, ac_c)
    bw_.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qlum.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += _seg(0xDB, bytes([1]) + bytes(qchrom.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, (sh << 4) | sh, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += _seg(0xC0, sof)
    for tc, th, (bits, vals) in ((0, 0, _DC_LUM), (1, 0, _AC_LUM),
                                 (0, 1, _DC_CHROM), (1, 1, _AC_CHROM)):
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_mcus:
        out += _seg(0xDD, struct.pack(">H", restart_mcus))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw_.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture/golden side): the common libjpeg-style
# scan script shape — DC first at Al=1 + DC refinement, then per
# component an AC spectral scan at Al=1 and its refinement to Al=0 —
# exercising every progressive decode path (DC/AC x first/refine, EOB
# runs, point transforms) with real byte streams.


# progressive AC scans code EOBn symbols (n<<4, n=0..14) that the
# baseline Annex-K AC tables do not contain — ship a custom flat table
# covering the full progressive AC symbol space (160 run/size + ZRL +
# 15 EOBn = 176 symbols, all at code length 8: 176/256 < 1 satisfies
# Kraft, and a flat table keeps the fixture encoder trivial)
_AC_PROG_SYMS = sorted({(r << 4) | sz for r in range(16)
                        for sz in range(1, 11)}
                       | {0xF0} | {n << 4 for n in range(15)})
_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_SYMS),
             0, 0, 0, 0, 0, 0, 0, 0], _AC_PROG_SYMS)


class _EobBuffer:
    """Accumulates EOB runs across blocks of one AC scan and flushes the
    EOBn code (G.1.2.2: run = 2^n + n appended bits)."""

    def __init__(self, bw_: _BitWriter, ac_codes):
        self.bw = bw_
        self.ac = ac_codes
        self.run = 0

    def add(self) -> None:
        self.run += 1
        if self.run == 0x7FFF:
            self.flush()

    def flush(self) -> None:
        if not self.run:
            return
        n = self.run.bit_length() - 1
        c, sz = self.ac[n << 4]
        self.bw.write(c, sz)
        if n:
            self.bw.write(self.run - (1 << n), n)
        self.run = 0


def _enc_ac_first(bw_: _BitWriter, blk: np.ndarray, ac_codes,
                  eob: _EobBuffer, al: int) -> None:
    vals = [int(v) for v in blk[1:]]
    pt = [(-((-v) >> al) if v < 0 else v >> al) for v in vals]
    nz = [i for i, v in enumerate(pt) if v]
    if not nz:
        eob.add()
        return
    eob.flush()
    run = 0
    for i in range(nz[-1] + 1):
        v = pt[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, sz = ac_codes[0xF0]
            bw_.write(c, sz)
            run -= 16
        t, bits = _mag(v)
        c, sz = ac_codes[(run << 4) | t]
        bw_.write(c, sz)
        bw_.write(bits, t)
        run = 0
    if nz[-1] + 1 < 63:
        eob.add()


def _enc_ac_refine(bw_: _BitWriter, blk: np.ndarray, ac_codes,
                   al: int) -> None:
    """Refinement from precision al+1 down to al, emitted in DECODER
    consumption order (code, sign, then the correction bits of the
    positions passed in that segment) with eobrun=1 per block."""
    p1 = 1 << al
    absv = [abs(int(v)) >> al for v in blk[1:]]
    newpos = [i for i, a in enumerate(absv) if a == 1]
    k = 0
    for j in newpos:
        # zero-history run length between k and j
        r = sum(1 for i in range(k, j) if absv[i] == 0)
        while r > 15:
            c, sz = ac_codes[0xF0]
            bw_.write(c, sz)
            nzero = 16
            while nzero:
                if absv[k] > 1:
                    bw_.write((abs(int(blk[1 + k])) >> al) & 1, 1)
                else:
                    nzero -= 1
                k += 1
            r -= 16
        c, sz = ac_codes[(r << 4) | 1]
        bw_.write(c, sz)
        bw_.write(1 if int(blk[1 + j]) > 0 else 0, 1)
        while k < j:
            if absv[k] > 1:
                bw_.write((abs(int(blk[1 + k])) >> al) & 1, 1)
            k += 1
        k = j + 1
    tail = [i for i in range(k, 63) if absv[i] > 1]
    if k < 63 and (tail or True):
        # EOB (eobrun = 1): decoder then reads one correction bit per
        # remaining nonzero-history coefficient
        c, sz = ac_codes[0x00]
        bw_.write(c, sz)
        for i in tail:
            bw_.write((abs(int(blk[1 + i])) >> al) & 1, 1)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85,
                            subsample: bool = True,
                            restart_units: int = 0) -> bytes:
    """(h, w, 3) RGB uint8 → progressive (SOF2) JFIF bytes whose
    dequantized coefficients equal ``encode_jpeg``'s at the same
    settings — decode(progressive) == decode(baseline) pixel-exact.
    ``restart_units`` > 0 emits DRI + RSTn markers every that-many data
    units in EVERY scan (MCUs in the DC scans, blocks in the AC scans)
    — coverage for the decoder's per-scan restart paths."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise CodecError("encode_jpeg_progressive wants (h, w, 3) RGB")
    h, w = img.shape[:2]
    f = img.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = (-0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1]
          + 0.5 * f[:, :, 2] + 128.0)
    cr = (0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1]
          - 0.081312 * f[:, :, 2] + 128.0)
    qlum, qchrom = _quality_tables(quality)
    sh = 2 if subsample else 1

    def pad_to(a: np.ndarray, mult: int) -> np.ndarray:
        ph = (-a.shape[0]) % mult
        pw = (-a.shape[1]) % mult
        return np.pad(a, ((0, ph), (0, pw)), mode="edge")

    ypad = pad_to(y, 8 * sh)
    if subsample:
        cbp, crp = pad_to(cb, 16), pad_to(cr, 16)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
    else:
        cbs, crs = pad_to(cb, 8), pad_to(cr, 8)
    planes = [(_encode_blocks(ypad, qlum.reshape(8, 8).astype(np.float64)),
               ypad.shape[1] // 8, sh, sh),
              (_encode_blocks(cbs, qchrom.reshape(8, 8).astype(np.float64)),
               cbs.shape[1] // 8, 1, 1),
              (_encode_blocks(crs, qchrom.reshape(8, 8).astype(np.float64)),
               crs.shape[1] // 8, 1, 1)]
    mcux = planes[0][1] // sh
    mcuy = planes[0][0].shape[0] // planes[0][1] // sh

    dc_codes = [_huff_codes(*_DC_LUM), _huff_codes(*_DC_CHROM),
                _huff_codes(*_DC_CHROM)]
    acp = _huff_codes(*_AC_PROG)
    ac_codes = [acp, acp, acp]

    def sos(comp_specs: list[tuple[int, int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qlum.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += _seg(0xDB, bytes([1]) + bytes(qchrom.reshape(-1)[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, (sh << 4) | sh, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += _seg(0xC2, sof)
    for tc, th, (bits, vals) in ((0, 0, _DC_LUM), (1, 0, _AC_PROG),
                                 (0, 1, _DC_CHROM), (1, 1, _AC_PROG)):
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_units:
        out += _seg(0xDD, struct.pack(">H", restart_units))

    def mcu_blocks(ci: int):
        blocks, bwidth, chh, cvv = planes[ci]
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for by in range(cvv):
                for bx in range(chh):
                    yield blocks[(my * cvv + by) * bwidth + (mx * chh + bx)]

    def rst_break(bw_, m, rst):
        """Byte-align, emit RSTn, reset — shared by all scans."""
        bw_.flush()
        bw_.out += bytes([0xFF, 0xD0 + rst])
        return (rst + 1) & 7

    # scan 1: DC first, all components interleaved, Al=1
    bw_ = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    for m in range(mcux * mcuy):
        if restart_units and m and m % restart_units == 0:
            rst = rst_break(bw_, m, rst)
            preds = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for ci in range(3):
            blocks, bwidth, chh, cvv = planes[ci]
            for by in range(cvv):
                for bx in range(chh):
                    dc = int(blocks[(my * cvv + by) * bwidth
                                    + (mx * chh + bx)][0]) >> 1
                    t, bits = _mag(dc - preds[ci])
                    preds[ci] = dc
                    c, sz = dc_codes[ci][t]
                    bw_.write(c, sz)
                    if t:
                        bw_.write(bits, t)
    bw_.flush()
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1) + bw_.out

    # scan 2: DC refinement (one bit per block, same interleave)
    bw_ = _BitWriter()
    rst = 0
    for m in range(mcux * mcuy):
        if restart_units and m and m % restart_units == 0:
            rst = rst_break(bw_, m, rst)
        my, mx = divmod(m, mcux)
        for ci in range(3):
            blocks, bwidth, chh, cvv = planes[ci]
            for by in range(cvv):
                for bx in range(chh):
                    bw_.write(int(blocks[(my * cvv + by) * bwidth
                                         + (mx * chh + bx)][0]) & 1, 1)
    bw_.flush()
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0) + bw_.out

    # per component: AC first (Al=1) then AC refinement (Ah=1 → Al=0),
    # NON-interleaved over the component's own A.2.2 block raster
    for ci in range(3):
        blocks, bwidth, chh, cvv = planes[ci]
        cw = -(-(w * chh) // sh) if ci == 0 else -(-w // sh)
        chh_px = -(-(h * cvv) // sh) if ci == 0 else -(-h // sh)
        if ci == 0:
            cw, chh_px = w, h
        nbx = -(-cw // 8)
        nby = -(-chh_px // 8)
        tsel = 0 if ci == 0 else 1
        bw_ = _BitWriter()
        eob = _EobBuffer(bw_, ac_codes[ci])
        rst = 0
        i = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_units and i and i % restart_units == 0:
                    eob.flush()
                    rst = rst_break(bw_, i, rst)
                i += 1
                _enc_ac_first(bw_, blocks[by * bwidth + bx],
                              ac_codes[ci], eob, 1)
        eob.flush()
        bw_.flush()
        out += sos([(ci + 1, 0, tsel)], 1, 63, 0, 1) + bw_.out

        bw_ = _BitWriter()
        rst = 0
        i = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_units and i and i % restart_units == 0:
                    rst = rst_break(bw_, i, rst)
                i += 1
                _enc_ac_refine(bw_, blocks[by * bwidth + bx],
                               ac_codes[ci], 0)
        bw_.flush()
        out += sos([(ci + 1, 0, tsel)], 1, 63, 1, 0) + bw_.out

    out += b"\xff\xd9"
    return bytes(out)
