"""Baseline JPEG codec in pure stdlib — closes the largest documented
multimodal codec stub (multimodal.py conceded JPEG to external libs; the
majority of real-corpus images are baseline JPEGs).

Scope (decoder): baseline sequential DCT (SOF0), 8-bit samples, 1- or
3-component (grayscale / YCbCr), arbitrary chroma sampling factors
(4:4:4, 4:2:2, 4:2:0 — replicate upsampling), restart markers (DRI/RSTn),
Huffman tables read from the stream. Progressive (SOF2), arithmetic
coding, 12-bit, and CMYK stay NotImplementedError — explicit scope
bounds, same policy as the PNG decoder's Adam7/palette bounds.

Scope (encoder, the ``make_jpeg`` fixture builder): 4:4:4 or grayscale,
Annex-K quantization tables with IJG quality scaling, Annex-K Huffman
tables. Deterministic — same pixels in, same bytes out — so tests can
exercise the full bytes → pixels → features path without any external
codec, exactly like ``make_bmp`` / ``make_png`` / ``make_wav``.

Pure-Python 8×8 float DCT/IDCT is plenty for the fixture-scale images
tests use; at corpus scale the decode runs inside ``mapInPandas`` where a
cluster image would swap in a vectorized codec — the Spark-side batch
shape is identical either way.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# shared tables


def _zigzag_order() -> list[tuple[int, int]]:
    """(row, col) for each of the 64 zigzag positions."""
    out: list[tuple[int, int]] = []
    for s in range(15):
        rs = range(max(0, s - 7), min(s, 7) + 1)
        ordered = rs if s % 2 == 1 else reversed(list(rs))
        out.extend((r, s - r) for r in ordered)
    return out


ZIGZAG = _zigzag_order()
#: flat block index (r*8+c) for each zigzag position
ZZ_FLAT = [r * 8 + c for r, c in ZIGZAG]

#: Annex K.1 / K.2 quantization tables (natural row-major order)
QUANT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 Huffman table specs: (bits[1..16], huffval)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
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
    0xF9, 0xFA,
]

#: C[u][x] = cos((2x+1)·u·π/16) — the separable DCT basis
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_SCALE = [math.sqrt(0.5)] + [1.0] * 7  # Cu normalization


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical JPEG Huffman assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-at-a-time reader."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scaled(table: list[int], quality: int) -> list[int]:
    """IJG quality scaling: 1 (worst) … 100 (best)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((t * scale + 50) // 100, 1), 255) for t in table]


# ---------------------------------------------------------------------------
# encoder (fixture builder)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1s (spec convention)


def _fdct_quant(block: list[float], quant: list[int]) -> list[int]:
    """Forward 8×8 DCT then quantize; input level-shifted samples, output
    coefficients in natural order."""
    tmp = [0.0] * 64
    for u in range(8):
        cu = _COS[u]
        for y in range(8):
            tmp[u * 8 + y] = sum(block[x * 8 + y] * cu[x] for x in range(8))
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            cv = _COS[v]
            s = sum(tmp[u * 8 + y] * cv[y] for y in range(8))
            val = 0.25 * _SCALE[u] * _SCALE[v] * s
            q = quant[u * 8 + v]
            out[u * 8 + v] = int(round(val / q))
    return out


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(
    coeffs: list[int],
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    w: _BitWriter,
) -> int:
    zz = [coeffs[i] for i in ZZ_FLAT]
    diff = zz[0] - prev_dc
    cat = _category(diff)
    code, length = dc_codes[cat]
    w.write(code, length)
    if cat:
        w.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = ac_codes[0xF0]  # ZRL
            w.write(zcode, zlen)
            run -= 16
        cat = _category(v)
        acode, alen = ac_codes[(run << 4) | cat]
        w.write(acode, alen)
        w.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz != 63:
        ecode, elen = ac_codes[0x00]  # EOB
        w.write(ecode, elen)
    return zz[0]


def make_jpeg(
    width: int,
    height: int,
    pixel_fn,
    quality: int = 90,
    grayscale: bool = False,
) -> bytes:
    """Serialize a baseline JPEG (SOF0, 4:4:4 or grayscale, Annex-K
    tables, IJG quality scaling). ``pixel_fn(x, y) -> (r, g, b)`` with
    y=0 at the top. Deterministic fixture builder, same contract as
    ``make_bmp``/``make_png``."""
    qlum = _quality_scaled(QUANT_LUM, quality)
    qchr = _quality_scaled(QUANT_CHROMA, quality)
    ncomp = 1 if grayscale else 3

    # sample planes, level-shifted, edge-replicated to 8-multiples
    bw, bh = (width + 7) // 8 * 8, (height + 7) // 8 * 8
    planes = [[0.0] * (bw * bh) for _ in range(ncomp)]
    for y in range(bh):
        sy = min(y, height - 1)
        for x in range(bw):
            sx = min(x, width - 1)
            r, g, b = pixel_fn(sx, sy)
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            planes[0][y * bw + x] = yy - 128.0
            if ncomp == 3:
                planes[1][y * bw + x] = -0.168736 * r - 0.331264 * g + 0.5 * b
                planes[2][y * bw + x] = 0.5 * r - 0.418688 * g - 0.081312 * b

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, qlum),) + (((1, qchr),) if ncomp == 3 else ()):
        zz = bytes(q[i] for i in ZZ_FLAT)
        out += b"\xff\xdb" + struct.pack(">HB", 3 + 64, tid) + zz
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        sof += bytes((c + 1, 0x11, 0 if c == 0 else 1))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tables = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if ncomp == 3:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        body = bytes((tc,)) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes((ncomp,))
    for c in range(ncomp):
        sos += bytes((c + 1, 0x00 if c == 0 else 0x11))
    sos += bytes((0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_chr = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    w = _BitWriter()
    prev = [0] * ncomp
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            for c in range(ncomp):
                plane = planes[c]
                block = [plane[(by + r) * bw + bx + col] for r in range(8) for col in range(8)]
                coeffs = _fdct_quant(block, qlum if c == 0 else qchr)
                prev[c] = _encode_block(
                    coeffs,
                    prev[c],
                    dc_lum if c == 0 else dc_chr,
                    ac_lum if c == 0 else ac_chr,
                    w,
                )
    w.flush()
    out += w.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # marker (EOI etc.): spec says pad with 1s at segment end
                self._acc = (self._acc << 8) | 0xFF
                self._n += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_to_restart(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        d = self.data
        i = self.pos
        while i + 1 < len(d):
            if d[i] == 0xFF and 0xD0 <= d[i + 1] <= 0xD7:
                self.pos = i + 2
                self._acc = 0
                self._n = 0
                return
            i += 1
        raise ValueError("expected JPEG restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    """DC/AC magnitude-category sign extension (spec F.2.2.1)."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _idct(coeffs: list[float]) -> list[float]:
    """Inverse 8×8 DCT, separable float; input natural order."""
    tmp = [0.0] * 64
    for x in range(8):
        for v in range(8):
            s = 0.0
            for u in range(8):
                s += _SCALE[u] * coeffs[u * 8 + v] * _COS[u][x]
            tmp[x * 8 + v] = s
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _SCALE[v] * tmp[x * 8 + v] * _COS[v][y]
            out[x * 8 + y] = 0.25 * s
    return out


def decode_jpeg_pixels(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a baseline JPEG to (width, height, flat RGB list of length
    w·h·3, y=0 at the top). Raises NotImplementedError for out-of-scope
    variants (progressive, arithmetic, 12-bit) and ValueError on corrupt
    streams — the same clean-failure contract as the PNG path."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (width, height, comps) comps: list of (cid, h, v, tq)
    restart_interval = 0
    scan_comps = None
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = list(body[i : i + 64])
                    i += 64
                else:
                    vals = [
                        struct.unpack_from(">H", body, i + 2 * j)[0] for j in range(64)
                    ]
                    i += 128
                nat = [0] * 64
                for z, flat in enumerate(ZZ_FLAT):
                    nat[flat] = vals[z]
                quant[tq] = nat
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                i += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1 (both sequential DCT)
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision} unsupported")
            h, w_, nc = struct.unpack_from(">HHB", body, 1)
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (w_, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            pos += seglen
            break
        pos += seglen
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")

    width, height, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # per-component planes at the component's own resolution
    planes = {}
    dims = {}
    for cid, ch, cv, _tq in comps:
        pw, ph = mcux * ch * 8, mcuy * cv * 8
        planes[cid] = bytearray(pw * ph)
        dims[cid] = (pw, ph, ch, cv)
    by_id = {c[0]: c for c in comps}

    reader = _BitReader(payload, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_to_restart()
                pred = {cid: 0 for cid in pred}
            try:
                for cs, td, ta in scan_comps:
                    _cid, ch, cv, tq = by_id[cs]
                    q = quant[tq]
                    dct = huff_dc[td]
                    act = huff_ac[ta]
                    pw, _ph, _, _ = dims[cs]
                    plane = planes[cs]
                    for bv in range(cv):
                        for bhz in range(ch):
                            coeffs = [0.0] * 64
                            cat = _huff_decode(reader, dct)
                            diff = _extend(reader.bits(cat), cat) if cat else 0
                            pred[cs] += diff
                            coeffs[0] = pred[cs] * q[0]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(reader, act)
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                if k > 63:
                                    raise ValueError("JPEG AC index overflow")
                                cat = rs & 0xF
                                coeffs[ZZ_FLAT[k]] = _extend(reader.bits(cat), cat) * q[ZZ_FLAT[k]]
                                k += 1
                            px = _idct(coeffs)
                            ox = (mx * ch + bhz) * 8
                            oy = (my * cv + bv) * 8
                            for r in range(8):
                                row = (oy + r) * pw + ox
                                for col in range(8):
                                    v = int(px[r * 8 + col] + 128.5)
                                    plane[row + col] = 0 if v < 0 else (255 if v > 255 else v)
            except _RestartMarker:
                raise ValueError("unexpected JPEG restart marker") from None
            mcu_count += 1

    # upsample (replicate) + color convert
    out = [0] * (width * height * 3)
    if len(comps) == 1:
        cid = comps[0][0]
        pw, _ph, _, _ = dims[cid]
        plane = planes[cid]
        for y in range(height):
            base = y * pw
            for x in range(width):
                g = plane[base + x]
                o = (y * width + x) * 3
                out[o] = out[o + 1] = out[o + 2] = g
        return width, height, out
    if len(comps) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG supported")
    (yid, ych, ycv, _), (bid, bch, bcv, _), (rid, rch, rcv, _) = comps
    ypw = dims[yid][0]
    bpw = dims[bid][0]
    rpw = dims[rid][0]
    yp, bp, rp = planes[yid], planes[bid], planes[rid]
    for y in range(height):
        yb = (y * ycv // vmax) * ypw
        bb = (y * bcv // vmax) * bpw
        rb = (y * rcv // vmax) * rpw
        for x in range(width):
            lum = yp[yb + x * ych // hmax]
            cb = bp[bb + x * bch // hmax] - 128
            cr = rp[rb + x * rch // hmax] - 128
            r = lum + 1.402 * cr
            g = lum - 0.344136 * cb - 0.714136 * cr
            b = lum + 1.772 * cb
            o = (y * width + x) * 3
            out[o] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
            out[o + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
            out[o + 2] = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))
    return width, height, out
