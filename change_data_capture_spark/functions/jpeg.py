"""Pure-numpy baseline JPEG codec (encoder + decoder), no codec libraries.

De-stubs the last compressed-image gap (`multimodal.decode_image_real`
documented JPEG as env-blocked): this is a REAL ITU-T.81 baseline
sequential codec — JFIF segment grammar, DQT (zigzag), canonical DHT,
SOF0, SOS, MSB-first entropy coding with 0xFF byte stuffing, DC
difference + EXTEND coding, AC run/size RLE with EOB/ZRL, orthonormal
8×8 DCT/IDCT, and JFIF YCbCr↔RGB. The decoder is table-driven (builds
Huffman decoders from whatever DHT declares) and handles any baseline
4:4:4 stream; the encoder emits valid baseline JPEG with parameterizable
quantization tables.

Oracle trick (same spirit as the PPM/PNG queries): with all-8s
quantization tables, an 8×8-aligned constant-color block survives the
"lossy" pipeline EXACTLY — DC = 8·(v−128) is an integer, quantize/
dequantize by 8 round-trips it, the AC float residue (~1e-14) rounds to
zero, and the IDCT of a DC-only block is a constant the final rounding
restores bit-for-bit. So test images built from 8-aligned constant bands
have closed-form decoded RGB that a SQL oracle recomputes exactly, while
the decoder exercises every stage a photographic JPEG would.

Rounding contract: every float→int rounding on the decode path is
``floor(x + 0.5)`` (not banker's rounding) so the SQL oracle can mirror
it with ``floor(x + 0.5)`` — IEEE doubles make the expressions
bit-identical across engines.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------------------
# constants
# --------------------------------------------------------------------------


def _zigzag_order() -> list[int]:
    """Generate the standard JPEG zigzag index order programmatically
    (diagonal traversal with alternating direction) — no typo-prone
    64-entry literal."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and (s - i) < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left → top-right
        order.extend(r * 8 + c for r, c in diag)
    return order


ZIGZAG = _zigzag_order()
UNZIGZAG = [0] * 64
for _pos, _idx in enumerate(ZIGZAG):
    UNZIGZAG[_idx] = _pos


def _dct_matrix() -> np.ndarray:
    m = np.empty((8, 8))
    for u in range(8):
        s = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            m[u, x] = s * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_DCT_M = _dct_matrix()

#: canonical Huffman spec: DC = 12 categories @ 4 bits, AC = the standard
#: 162-symbol set (EOB, ZRL, run 0-15 × size 1-10) @ 8 bits each.
#: Fixed-length canonical codes are valid JPEG Huffman tables (count <
#: 2^len, so the all-ones code stays unused) and keep the decoder fully
#: table-driven.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0] * 16
_DC_BITS[3] = len(_DC_SYMBOLS)  # 4-bit codes (BITS[i] = codes of length i+1)
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMBOLS)  # 8-bit codes


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical code construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for i, n in enumerate(bits):
        length = i + 1
        for _ in range(n):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# bit I/O
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per the standard
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            # else: a marker — entropy data ended; callers sized reads
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg(
    img: np.ndarray, luma_q: int = 8, chroma_q: int = 8
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline 4:4:4 JFIF with
    flat quantization tables (all entries = ``luma_q`` / ``chroma_q``).
    Dimensions are padded to multiples of 8 by edge replication; SOF0
    records the true dimensions."""
    h, w = img.shape[:2]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw, 3), dtype=np.uint8)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    ycc = _rgb_to_ycbcr(padded)

    qtab = [np.full(64, luma_q, dtype=np.int64), np.full(64, chroma_q, dtype=np.int64)]
    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMBOLS)

    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for comp in range(3):
                q = qtab[0 if comp == 0 else 1]
                block = ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, comp]
                f = block.astype(np.float64) - 128.0
                coef = _DCT_M @ f @ _DCT_M.T
                zz = np.rint(coef.flatten()[ZIGZAG] / q).astype(np.int64)
                # DC
                diff = int(zz[0]) - pred[comp]
                pred[comp] = int(zz[0])
                cat = _size_cat(diff)
                code, ln = dc_codes[cat]
                bw.write(code, ln)
                if cat:
                    bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
                # AC
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    cat = _size_cat(v)
                    code, ln = ac_codes[(run << 4) | cat]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
                    run = 0
                if run:
                    code, ln = ac_codes[0x00]  # EOB
                    bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid in (0, 1):
        out += seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in qtab[tid]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, qid in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, qid])
    out += seg(0xFFC0, sof)
    for cls, tid, bits, syms in (
        (0, 0, _DC_BITS, _DC_SYMBOLS),
        (0, 1, _DC_BITS, _DC_SYMBOLS),
        (1, 0, _AC_BITS, _AC_SYMBOLS),
        (1, 1, _AC_BITS, _AC_SYMBOLS),
    ):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


class _HuffDecoder:
    def __init__(self, bits: list[int], symbols: list[int]) -> None:
        # (length, code) -> symbol via first-code/offset canonical arithmetic
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for i, n in enumerate(bits):
            ln = i + 1
            self.val_ptr[ln] = k
            self.min_code[ln] = code
            code += n
            k += n
            self.max_code[ln] = code - 1 if n else -1
            code <<= 1
        self.symbols = symbols

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read(1)
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                return self.symbols[self.val_ptr[ln] + code - self.min_code[ln]]
        raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Full baseline 4:4:4 JFIF decode to an (h, w, 3) uint8 RGB array.
    Table-driven: quantization and Huffman tables come from the stream."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qid)
    h = w = 0
    scan: bytes | None = None
    scan_comps: list[tuple[int, int, int]] = []  # (id, dc_tid, ac_tid)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", payload[pos : pos + 2])[0]
        body = payload[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.empty(64, dtype=np.int64)
                for i in range(64):
                    tab[i] = b[1 + i]
                qtabs[tq] = tab
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                cls, tid = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                n = sum(bits)
                syms = list(b[17 : 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, syms)
                b = b[17 + n :]
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 (no subsampling) supported")
                comps.append((cid, samp, qid))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append((cid, tids >> 4, tids & 0xF))
            scan = payload[pos + ln :]
            break
        pos += ln
    if scan is None or not comps:
        raise ValueError("truncated JPEG")

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    planes = np.empty((ph, pw, len(comps)), dtype=np.float64)
    br = _BitReader(scan)
    pred = [0] * len(comps)
    qid_of = {cid: qid for cid, _, qid in comps}
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, (cid, dc_tid, ac_tid) in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.int64)
                cat = huff[(0, dc_tid)].decode(br)
                diff = _extend(br.read(cat), cat) if cat else 0
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    sym = huff[(1, ac_tid)].decode(br)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, cat = sym >> 4, sym & 0xF
                    k += run
                    zz[k] = _extend(br.read(cat), cat)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = zz * qtabs[qid_of[cid]]
                block = _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M
                planes[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, ci] = block + 128.0
    ycc = np.clip(np.floor(planes + 0.5), 0, 255).astype(np.uint8)[:h, :w]
    return _ycbcr_to_rgb(ycc)


def decode_jpeg(payload: bytes) -> tuple[int, int, float, float, float]:
    """Decode and summarize: (width, height, mean_r, mean_g, mean_b) —
    the same shape the PPM/PNG decoders return."""
    img = decode_jpeg_pixels(payload)
    h, w = img.shape[:2]
    means = img.reshape(-1, 3).astype(np.float64).mean(axis=0)
    return w, h, float(means[0]), float(means[1]), float(means[2])
