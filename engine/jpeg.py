"""Pure-numpy baseline JPEG codec (ITU-T T.81, public spec).

Scope (documented, not silent):
- Encoder: baseline sequential DCT, 8-bit, grayscale or YCbCr with 4:4:4
  or 4:2:0 chroma subsampling, the Annex K quantization + Huffman tables
  scaled by the public IJG quality formula, optional restart intervals.
- Decoder: baseline sequential (SOF0/SOF1), 8- and 16-bit DQT precision,
  arbitrary sampling factors up to 4x4, restart markers, one interleaved
  scan.  Progressive (SOF2+) and arithmetic-coded frames raise
  ``ImageDecodeError`` — honestly unsupported, the strict-pipeline policy
  of ImageDecodeStage applies.

Everything here derives from the published T.81 spec and the public IJG
quality-scaling convention.  The json_repair reference has no media layer
(its file surface is json_repair.py:265-335); this codec backs the
SURVEY §2 D-family multimodal stages so real-world .jpg corpora flow
through the same decode/metadata/resize pipeline as PNG/GIF/BMP.

Hot-path shape: DCT/IDCT, quantization, color transforms and chroma
resampling are vectorized across every 8x8 block of an image (einsum);
only the entropy coder walks symbols in Python (JPEG Huffman decode is a
serial bit-stream dependency), each step O(1) via a 16-bit lookahead LUT.
"""

from __future__ import annotations

import struct

import numpy as np

from engine.image import ImageDecodeError

# ---------------------------------------------------------------- constants

# Annex K.1 / K.2 quantization tables (natural, row-major order).
Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# ZIGZAG[k] = natural (row-major) index of the k-th zigzag coefficient.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL).
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# Orthonormal 8-point DCT-II matrix: M[u, x] = 1/2 C(u) cos((2x+1)u pi/16),
# so forward = M @ f @ M.T and inverse = M.T @ F @ M (exactly T.81's FDCT).
_x = np.arange(8)
_DCT_M = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16.0)
_DCT_M[0] /= np.sqrt(2.0)
del _x


def scaled_quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """Annex K table scaled by the public IJG quality convention (1-100)."""
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits, values):
    """(BITS, HUFFVAL) -> list of (symbol, code, length) per T.81 C.2."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((values[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------- encoder


class _BitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)   # pad with 1-bits (spec F.1.2.3)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> (h, w, 3) float64 JFIF full-range YCbCr."""
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (H//8, W//8, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _quantize_blocks(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(by, bx, 8, 8) samples -> (by, bx, 64) zigzag-ordered quantized ints."""
    f = np.einsum("ux,rcxy,vy->rcuv", _DCT_M, blocks - 128.0, _DCT_M)
    q = np.rint(f / qtab.reshape(8, 8)).astype(np.int64)
    zzq = q.reshape(*q.shape[:2], 64)[:, :, ZIGZAG]
    # Baseline Huffman categories stop at 10 bits for AC (amplitude 1023);
    # a q=1 table on a full-swing checkerboard can hit exactly 1024, so
    # clamp the way real baseline encoders do (DC keeps its 11-bit range).
    zzq[:, :, 1:] = np.clip(zzq[:, :, 1:], -1023, 1023)
    return zzq


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff else 0
    code, length = dc_codes[size]
    w.put(code, length)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        w.put(amp, size)
    nz = np.nonzero(zz[1:])[0]
    k = 0
    for pos in nz:
        run = int(pos) - k
        while run > 15:
            zc, zl = ac_codes[0xF0]           # ZRL
            w.put(zc, zl)
            run -= 16
        v = int(zz[1 + pos])
        s = abs(v).bit_length()
        ac, al = ac_codes[(run << 4) | s]
        w.put(ac, al)
        amp = v if v > 0 else v + (1 << s) - 1
        w.put(amp, s)
        k = int(pos) + 1
    if k < 63:
        ec, el = ac_codes[0x00]               # EOB
        w.put(ec, el)
    return int(zz[0])


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def encode_jpeg(img: np.ndarray, *, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """uint8 image (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB ->
    baseline JFIF bytes.  ``subsampling`` is '444' or '420' (ignored for
    grayscale); ``restart_interval`` > 0 emits DRI + RSTn every that many
    MCUs (the resync feature real encoders use for error resilience)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("JPEG encoder expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError("JPEG encoder expects 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = img.shape[2] == 1

    qlum = scaled_quant_table(Q_LUM, quality)
    qchrom = scaled_quant_table(Q_CHROM, quality)

    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(img)
        if subsampling == "420":
            ph, pw = h + (h & 1), w + (w & 1)
            ycc_p = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)),
                           mode="edge")
            cb = ycc_p[:, :, 1].reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            cr = ycc_p[:, :, 2].reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            planes = [ycc[:, :, 0], cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # Quantize every block of every component up front (vectorized); the
    # Python below only walks the entropy-coded symbol stream.
    comp_zz = []
    for ci, (plane, (hi, vi)) in enumerate(zip(planes, samp)):
        padded = _pad_to(plane, mcuy * vi * 8, mcux * hi * 8)
        comp_zz.append(_quantize_blocks(
            _blockify(padded), qchrom if qsel[ci] else qlum))

    dc_tabs = [_canonical_codes(*_DC_LUM), _canonical_codes(*_DC_CHROM)]
    ac_tabs = [_canonical_codes(*_AC_LUM), _canonical_codes(*_AC_CHROM)]
    dc_maps = [{s: (c, l) for s, c, l in t} for t in dc_tabs]
    ac_maps = [{s: (c, l) for s, c, l in t} for t in ac_tabs]

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, b"\x00" + bytes(qlum[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _marker(0xDB, b"\x01" + bytes(qchrom[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += _marker(0xC0, sof)
    for cls, (bits, vals) in ((0, _DC_LUM), (1, _AC_LUM)):
        out += _marker(0xC4, bytes([cls << 4 | 0]) + bytes(bits) + bytes(vals))
    if not gray:
        for cls, (bits, vals) in ((0, _DC_CHROM), (1, _AC_CHROM)):
            out += _marker(0xC4,
                           bytes([cls << 4 | 1]) + bytes(bits) + bytes(vals))
    if restart_interval > 0:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    out += _marker(0xDA, sos + b"\x00\x3F\x00")

    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_no = my * mcux + mx
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                writer.pad_to_byte()
                out += writer.buf
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = samp[ci]
                tsel = 0 if ci == 0 else 1
                for by in range(vi):
                    for bx in range(hi):
                        zz = comp_zz[ci][my * vi + by, mx * hi + bx]
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci],
                            dc_maps[tsel], ac_maps[tsel])
    writer.pad_to_byte()
    out += writer.buf
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _HuffLUT:
    """16-bit lookahead table: peek 16 bits -> (symbol, code length)."""

    def __init__(self, bits, values) -> None:
        sym = np.zeros(1 << 16, dtype=np.uint8)
        ln = np.zeros(1 << 16, dtype=np.uint8)
        for s, code, length in _canonical_codes(bits, values):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            sym[lo:hi] = s
            ln[lo:hi] = length
        # bytes indexing returns a plain int ~3x faster than a numpy
        # scalar — this loop is the decoder's only per-symbol Python.
        self.sym = sym.tobytes()
        self.len = ln.tobytes()


_LUT_CACHE: dict[bytes, _HuffLUT] = {}


def _huff_lut(bits, values) -> _HuffLUT:
    """Memoized LUT build: real corpora overwhelmingly reuse the Annex K
    tables, so a decode actor builds each 64 KiB table once per process
    instead of once per image (the LUT fill dominated per-small-image
    decode cost before this)."""
    key = bytes(bits) + bytes(values)
    lut = _LUT_CACHE.get(key)
    if lut is None:
        if len(_LUT_CACHE) >= 64:          # bound: adversarial table churn
            _LUT_CACHE.clear()
        lut = _HuffLUT(bits, values)
        _LUT_CACHE[key] = lut
    return lut


class _BitReader:
    """MSB-first reader over de-stuffed entropy bytes (tail-padded)."""

    def __init__(self, data: bytes) -> None:
        self.data = data + b"\xFF\xFF\xFF\xFF"   # lookahead pad (1-bits)
        self.limit = len(data) * 8
        self.pos = 0

    def peek16(self) -> int:
        i, off = self.pos >> 3, self.pos & 7
        w = int.from_bytes(self.data[i:i + 4], "big")
        return (w >> (16 - off)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.pos += n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.limit:
            raise ImageDecodeError("JPEG entropy stream truncated")
        i, off = self.pos >> 3, self.pos & 7
        w = int.from_bytes(self.data[i:i + 4], "big")
        self.pos += n
        return (w >> (32 - off - n)) & ((1 << n) - 1)


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _destuff_scan(buf: bytes, pos: int):
    """Entropy-coded data from ``pos`` -> (segments, end_pos).  Segments
    are the restart-delimited de-stuffed byte runs (RSTn resets both the
    bit phase and the DC predictors); end_pos sits on the 0xFF of the
    terminating marker."""
    arr = np.frombuffer(buf, np.uint8)
    segments = []
    start = pos
    parts = []
    i = pos
    n = len(buf)
    ff = np.nonzero(arr[pos:] == 0xFF)[0]
    for rel in ff:
        j = pos + int(rel)
        if j < i:                      # already consumed (stuffed pair)
            continue
        nxt = buf[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:                # stuffed 0xFF literal
            parts.append(buf[i:j + 1])
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:      # restart marker
            parts.append(buf[i:j])
            segments.append(b"".join(parts))
            parts = []
            i = j + 2
            start = i
        else:                          # real marker: scan ends
            parts.append(buf[i:j])
            segments.append(b"".join(parts))
            return segments, j
    parts.append(buf[i:n])
    segments.append(b"".join(parts))
    return segments, n


def _decode_block(r: _BitReader, dc: _HuffLUT, ac: _HuffLUT,
                  zz: np.ndarray, pred: int) -> int:
    p = r.peek16()
    length = dc.len[p]
    if length == 0:
        raise ImageDecodeError("JPEG: invalid DC Huffman code")
    r.skip(int(length))
    t = int(dc.sym[p])
    diff = _extend(r.receive(t), t) if t else 0
    val = pred + diff
    zz[0] = val
    k = 1
    while k < 64:
        p = r.peek16()
        length = ac.len[p]
        if length == 0:
            raise ImageDecodeError("JPEG: invalid AC Huffman code")
        r.skip(int(length))
        rs = int(ac.sym[p])
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16
                continue
            break                      # EOB
        k += run
        if k > 63:
            raise ImageDecodeError("JPEG: coefficient index overrun")
        zz[k] = _extend(r.receive(size), size)
        k += 1
    return val


_SOF_UNSUPPORTED = {
    0xC2: "progressive JPEG unsupported (baseline only)",
    0xC3: "lossless JPEG unsupported",
    0xC5: "differential sequential JPEG unsupported",
    0xC6: "progressive JPEG unsupported (baseline only)",
    0xC7: "lossless JPEG unsupported",
    0xC9: "arithmetic-coded JPEG unsupported",
    0xCA: "arithmetic-coded JPEG unsupported",
    0xCB: "arithmetic-coded JPEG unsupported",
    0xCD: "arithmetic-coded JPEG unsupported",
    0xCE: "arithmetic-coded JPEG unsupported",
    0xCF: "arithmetic-coded JPEG unsupported",
}


def jpeg_info(data: bytes) -> dict:
    """Header-only parse: width/height/components/subsampling/restart
    without touching the entropy-coded scan (the cheap metadata path)."""
    if data[:2] != b"\xFF\xD8":
        raise ImageDecodeError("not a JPEG")
    pos = 2
    n = len(data)
    info = {"restart_interval": 0}
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ImageDecodeError("JPEG marker desync")
        tag = data[pos + 1]
        if tag == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if tag in _SOF_UNSUPPORTED:
            raise ImageDecodeError(_SOF_UNSUPPORTED[tag])
        if tag in (0xC0, 0xC1):
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            samp = []
            for ci in range(nc):
                b = body[6 + 3 * ci:9 + 3 * ci]
                samp.append((b[1] >> 4, b[1] & 0x0F))
            info.update(width=w, height=h, n_components=nc,
                        precision=prec, sampling=samp)
        elif tag == 0xDD:
            (info["restart_interval"],) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:
            break
        pos += 2 + seglen
    if "width" not in info:
        raise ImageDecodeError("JPEG missing SOF")
    return info


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, c) uint8, c in {1, 3}."""
    if data[:2] != b"\xFF\xD8":
        raise ImageDecodeError("not a JPEG")
    pos = 2
    n = len(data)
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffLUT] = {}
    frame = None
    restart = 0
    scan = None
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ImageDecodeError("JPEG marker desync")
        tag = data[pos + 1]
        if tag == 0xD9:
            break
        if tag == 0x01 or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            raise ImageDecodeError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if seglen < 2 or pos + 2 + seglen > n:
            raise ImageDecodeError("truncated JPEG segment")
        body = data[pos + 4:pos + 2 + seglen]
        if tag in _SOF_UNSUPPORTED:
            raise ImageDecodeError(_SOF_UNSUPPORTED[tag])
        if tag == 0xDB:                               # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                bpos += 1
                if pq == 0:
                    zzq = np.frombuffer(body[bpos:bpos + 64], np.uint8)
                    bpos += 64
                else:
                    zzq = np.frombuffer(body[bpos:bpos + 128],
                                        ">u2").astype(np.int64)
                    bpos += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zzq
                qtabs[tq] = nat
        elif tag == 0xC4:                             # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1:bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + nv])
                htabs[(tc, th)] = _huff_lut(bits, vals)
                bpos += 17 + nv
        elif tag in (0xC0, 0xC1):                     # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ImageDecodeError(f"JPEG precision {prec} unsupported")
            if fh == 0 or fw == 0 or nc not in (1, 3):
                raise ImageDecodeError("unsupported JPEG geometry")
            comps = []
            for ci in range(nc):
                b = body[6 + 3 * ci:9 + 3 * ci]
                hi, vi = b[1] >> 4, b[1] & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ImageDecodeError("bad JPEG sampling factors")
                comps.append({"id": b[0], "h": hi, "v": vi, "tq": b[2]})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif tag == 0xDD:                             # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif tag == 0xDA:                             # SOS
            if frame is None:
                raise ImageDecodeError("JPEG SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                raise ImageDecodeError(
                    "multi-scan JPEG unsupported (one interleaved scan)")
            sel = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                sel.append((cs, tt >> 4, tt & 0x0F))
            scan = (sel, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ImageDecodeError("JPEG missing SOF/SOS")

    sel, spos = scan
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    order = []
    for cs, td, ta in sel:
        match = [c for c in comps if c["id"] == cs]
        if not match:
            raise ImageDecodeError("JPEG scan selects unknown component")
        c = match[0]
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ImageDecodeError("JPEG scan references missing DHT")
        if c["tq"] not in qtabs:
            raise ImageDecodeError("JPEG component references missing DQT")
        order.append((c, htabs[(0, td)], htabs[(1, ta)]))

    coeffs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
              for c in comps]
    segments, _end = _destuff_scan(data, spos)

    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(comps)
    total_mcus = mcux * mcuy
    for mcu_no in range(total_mcus):
        if restart and mcu_no and mcu_no % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ImageDecodeError("JPEG missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu_no, mcux)
        for ci, (c, dct, act) in enumerate(order):
            hi, vi = c["h"], c["v"]
            for by in range(vi):
                for bx in range(hi):
                    zz = coeffs[ci][my * vi + by, mx * hi + bx]
                    preds[ci] = _decode_block(reader, dct, act, zz, preds[ci])

    planes = []
    for ci, c in enumerate(comps):
        q = qtabs[c["tq"]][ZIGZAG]            # zigzag-ordered dequant vector
        zz = coeffs[ci] * q
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        by, bx = nat.shape[:2]
        blocks = nat.reshape(by, bx, 8, 8).astype(np.float64)
        pix = np.einsum("ux,rcuv,vy->rcxy", _DCT_M, blocks, _DCT_M) + 128.0
        plane = pix.swapaxes(1, 2).reshape(by * 8, bx * 8)
        # crop to this component's true extent, then upsample to frame size
        cw = -(-fw * c["h"] // hmax)
        ch = -(-fh * c["v"] // vmax)
        plane = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            if hmax % c["h"] or vmax % c["v"]:
                raise ImageDecodeError(
                    "non-integer chroma upsampling unsupported")
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                              hmax // c["h"], axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
