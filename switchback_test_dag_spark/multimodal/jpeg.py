"""Real pure-Python baseline JPEG codec — ``struct`` + numpy only, following
the WAV/BMP/PNG/AVI codec precedent (no native image libraries in this
environment, and none needed: baseline JPEG is DCT + scalar quantization +
canonical Huffman coding, all implementable exactly).

Encoder: spec-conformant baseline sequential JFIF (ITU T.81) — SOI, APP0,
two DQT tables (Annex-K-style matrices scaled by the libjpeg quality curve),
SOF0 (8-bit, 3 components, 4:4:4 — no chroma subsampling), four DHT tables
built OPTIMALLY per image from the actual symbol frequencies (the
``jpegtran -optimize`` strategy: real Huffman construction with the 16-bit
length cap via the Annex K BITS-adjustment and the reserved all-ones
codeword), SOS, byte-stuffed entropy-coded data, EOI.

Decoder: a real marker walker and canonical-Huffman entropy decoder, not a
fixed-layout reader — parses DQT/DHT/SOF0/SOS wherever they appear, rebuilds
code tables from BITS/HUFFVAL, runs RECEIVE/EXTEND sign extension, DC
prediction, run-length AC with ZRL/EOB, inverse zigzag, dequantization,
IDCT, level shift, and YCbCr→RGB. Raises ``ValueError`` on progressive
(SOF2), arithmetic-coded, subsampled, or corrupt streams rather than
mis-decoding.

Exactness contract (what the tests pin): JPEG is lossy, so decoded pixels
cannot equal the source — but everything AFTER quantization is exact integer
math. The decoder must recover the encoder's quantized coefficient blocks
BIT-EXACTLY (``decode_jpeg_blocks`` vs the encoder's returned blocks), and
its pixel output must equal ``reference_reconstruction`` — the encoder-side
dequantize+IDCT replay through the very same numpy code path — byte-for-byte.
A tolerance check against the source pattern bounds the quantization error
itself.

Only H.26x motion-compensated video now remains out of scope among the
reference's media formats.

Scale shape: used inside Arrow-batched ``mapInPandas`` iterators
(``media.py``) — payloads never leave the executor.
"""

from __future__ import annotations

import struct
from heapq import heapify, heappop, heappush

import numpy as np

# --------------------------------------------------------------------------- #
# constants
# --------------------------------------------------------------------------- #

# Annex-K-style base quantization matrices (public, ITU T.81 Table K.1/K.2).
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_order() -> np.ndarray:
    """Generate the 8×8 zigzag index order algorithmically (no typo risk)."""
    idx = []
    for s in range(15):
        rng = range(s + 1)
        diag = [(s - j, j) for j in rng if s - j < 8 and j < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        idx.extend(diag)
    return np.array([r * 8 + c for r, c in idx], dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)

# Orthonormal 8-point DCT-II matrix (float64): Y = C @ (B - 128) @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def scaled_quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality curve: scale = 5000/q (q<50) else 200−2q, clamped ≥1."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_Q_LUMA, _Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# --------------------------------------------------------------------------- #
# color transform (both directions share these exact code paths)
# --------------------------------------------------------------------------- #


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _forward_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Edge-padded plane → (n_by, n_bx, 8, 8) int32 quantized coefficients."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("kn,ijnm,lm->ijkl", _C, blocks - 128.0, _C)
    return np.round(coef / qtab).astype(np.int32)


def _inverse_blocks(qblocks: np.ndarray, qtab: np.ndarray, h: int, w: int) -> np.ndarray:
    """Quantized blocks → uint8 plane cropped to (h, w). EXACT inverse replay
    path: decode_jpeg and reference_reconstruction both call this."""
    deq = (qblocks * qtab).astype(np.float64)
    spat = np.einsum("kn,ijkl,lm->ijnm", _C, deq, _C) + 128.0
    nby, nbx = qblocks.shape[:2]
    plane = spat.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return np.clip(np.round(plane), 0, 255).astype(np.uint8)[:h, :w]


# --------------------------------------------------------------------------- #
# Huffman table construction (optimal, 16-bit cap, all-ones reserved)
# --------------------------------------------------------------------------- #


def _build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol → frequency map → (BITS[1..16], HUFFVAL) per T.81 Annex K:
    real Huffman merge producing code lengths, dummy symbol 256 reserving the
    all-ones code, then the BITS-adjustment folding lengths > 16."""
    lengths = {256: 0}  # dummy: guarantees the all-ones codeword stays unused
    for s in freqs:
        lengths[s] = 0
    # heap of (freq, tiebreak, [symbols]); merging two groups adds 1 to every
    # member's code length — textbook Huffman by group merge
    heap = [(f, s, [s]) for s, f in freqs.items() if f > 0]
    heap.append((0, 256, [256]))
    heapify(heap)
    if len(heap) == 1:
        lengths[heap[0][2][0]] = 1
    while len(heap) > 1:
        f1, t1, g1 = heappop(heap)
        f2, t2, g2 = heappop(heap)
        for s in g1 + g2:
            lengths[s] += 1
        heappush(heap, (f1 + f2, min(t1, t2), g1 + g2))
    max_len = max(lengths.values())
    bits = [0] * (max_len + 1)
    for s, ln in lengths.items():
        if ln > 0:
            bits[ln] += 1
    # Annex K.3 BITS adjustment: fold counts at lengths > 16 downward
    i = len(bits) - 1
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    bits = bits[: 17] + [0] * max(0, 17 - len(bits))
    # drop the dummy symbol from the longest used length
    for ln in range(16, 0, -1):
        if bits[ln] > 0:
            bits[ln] -= 1
            break
    # canonical symbol order: ascending code length, then ascending symbol
    ordered = sorted(
        (s for s, ln in lengths.items() if ln > 0 and s != 256),
        key=lambda s: (lengths[s], s),
    )
    return bits[1:17], ordered


def _assign_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): symbol → (length, code)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[huffval[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


# --------------------------------------------------------------------------- #
# bit I/O with 0xFF byte stuffing
# --------------------------------------------------------------------------- #


class _BitWriter:
    def __init__(self, stuff: bool = True) -> None:
        # stuff=True: JFIF byte stuffing (0x00 after every 0xFF so entropy
        # bytes never alias a marker). stuff=False: raw bits — the MJPEG-B
        # layout, whose headerless offset-table frames carry UNSTUFFED scans
        # (offsets locate sections, so no marker aliasing exists to avoid).
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self.stuff = stuff

    def write(self, length: int, value: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF and self.stuff:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write(pad, (1 << pad) - 1)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, stuffed: bool = True) -> None:
        # stuffed mirrors _BitWriter.stuff: JFIF scans unstuff 0xFF00 pairs;
        # MJPEG-B scans are raw bits (see _BitWriter)
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.stuffed = stuffed

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("jpeg: entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF and self.stuffed:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: dangling 0xFF in entropy stream")
            marker = self.data[self.pos]
            if marker != 0x00:
                raise ValueError(f"jpeg: unexpected marker 0xFF{marker:02X} mid-scan")
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, length: int) -> int:
        while self.nbits < length:
            self._fill()
        v = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1  # drop consumed history bits
        return v


def _extend(value: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit raw field back to the signed value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------------------- #
# encoder
# --------------------------------------------------------------------------- #


def _block_symbols(blocks: np.ndarray) -> list[tuple[list, list]]:
    """Per block (zigzag-scanned): ([(dc_cat, dc_bits_value)], [AC symbols])
    where each AC entry is (symbol, size, bits_value)."""
    out = []
    flat = blocks.reshape(-1, 64)[:, _ZIGZAG]
    prev_dc = 0
    for zz in flat:
        dc = int(zz[0])
        diff = dc - prev_dc
        prev_dc = dc
        cat = _category(diff)
        dc_bits = diff if diff >= 0 else diff + (1 << cat) - 1
        acs = []
        run = 0
        last_nz = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))  # ZRL
                run -= 16
            size = _category(v)
            bits_val = v if v >= 0 else v + (1 << size) - 1
            acs.append(((run << 4) | size, size, bits_val))
            run = 0
        if last_nz < 63:
            acs.append((0x00, 0, 0))  # EOB
        out.append(([(cat, dc_bits)], acs))
    return out


def _entropy_tables(comp_syms):
    """Optimal Huffman tables from component symbol frequencies (luma =
    class 0, chroma = 1). Returns (dc_tabs, ac_tabs, dc_codes, ac_codes) —
    tabs as (bits, huffval) for serialization, codes as symbol→(len, code)
    for the scan writer. Shared by the JFIF and MJPEG-B encoders."""
    dc_freq: list[dict[int, int]] = [{}, {}]
    ac_freq: list[dict[int, int]] = [{}, {}]
    for ci, syms in enumerate(comp_syms):
        t = 0 if ci == 0 else 1
        for dcs, acs in syms:
            for cat, _ in dcs:
                dc_freq[t][cat] = dc_freq[t].get(cat, 0) + 1
            for sym, _, _ in acs:
                ac_freq[t][sym] = ac_freq[t].get(sym, 0) + 1
    dc_tabs = [_build_huffman(f) for f in dc_freq]
    ac_tabs = [_build_huffman(f) for f in ac_freq]
    dc_codes = [_assign_codes(*t) for t in dc_tabs]
    ac_codes = [_assign_codes(*t) for t in ac_tabs]
    return dc_tabs, ac_tabs, dc_codes, ac_codes


def _write_scan(writer: _BitWriter, comp_blocks, dc_codes, ac_codes) -> bytes:
    """Entropy-coded baseline 4:4:4 interleaved scan (one block per component
    per MCU), per-component DC predictors — the MCU walk shared by the JFIF
    and MJPEG-B encoders; the writer's ``stuff`` flag decides the byte
    layout. Returns the flushed scan bytes."""
    nby, nbx = comp_blocks[0].shape[:2]
    flats = [b.reshape(nby, nbx, 64)[..., _ZIGZAG] for b in comp_blocks]
    prev_dc = [0, 0, 0]
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(3):
                t = 0 if ci == 0 else 1
                zz = flats[ci][by, bx]
                dc = int(zz[0])
                diff = dc - prev_dc[ci]
                prev_dc[ci] = dc
                cat = _category(diff)
                ln, code = dc_codes[t][cat]
                writer.write(ln, code)
                if cat:
                    writer.write(cat, diff if diff >= 0 else diff + (1 << cat) - 1)
                nz = np.nonzero(zz[1:])[0]
                last_nz = (nz[-1] + 1) if len(nz) else 0
                run = 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[t][0xF0]
                        writer.write(ln, code)
                        run -= 16
                    size = _category(v)
                    ln, code = ac_codes[t][(run << 4) | size]
                    writer.write(ln, code)
                    writer.write(size, v if v >= 0 else v + (1 << size) - 1)
                    run = 0
                if last_nz < 63:
                    ln, code = ac_codes[t][0x00]
                    writer.write(ln, code)
    return writer.flush()


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> tuple[bytes, dict]:
    """(h, w, 3) uint8 RGB → (jpeg_bytes, exact_state). ``exact_state`` holds
    the quantized coefficient blocks and quant tables, letting tests pin the
    decoder coefficient-bit-exactly and replay the reference reconstruction."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg expects (h, w, 3) RGB")
    h, w = px.shape[:2]
    qy, qc = scaled_quant_tables(quality)
    ycc = _rgb_to_ycbcr(px)
    comp_blocks = [
        _forward_blocks(ycc[..., 0], qy),
        _forward_blocks(ycc[..., 1], qc),
        _forward_blocks(ycc[..., 2], qc),
    ]
    comp_syms = [_block_symbols(b) for b in comp_blocks]
    dc_tabs, ac_tabs, dc_codes, ac_codes = _entropy_tables(comp_syms)
    # stuffed scan (the _block_symbols pass above was only for frequencies;
    # _write_scan re-walks blocks in MCU order with real DC predictors)
    scan = _write_scan(_BitWriter(stuff=True), comp_blocks, dc_codes, ac_codes)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, tab in ((0, qy), (1, qc)):
        out += seg(0xFFDB, bytes([tid]) + bytes(tab.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 1×1 sampling: 4:4:4
    out += seg(0xFFC0, sof)
    for cls, tid, (bits, huffval) in (
        (0, 0, dc_tabs[0]),
        (0, 1, dc_tabs[1]),
        (1, 0, ac_tabs[0]),
        (1, 1, ac_tabs[1]),
    ):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval))
    sos = struct.pack(">B", 3)
    for cid, (td, ta) in ((1, (0, 0)), (2, (1, 1)), (3, (1, 1))):
        sos += struct.pack(">BB", cid, (td << 4) | ta)
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    state = {
        "blocks": comp_blocks,
        "qtabs": (qy, qc, qc),
        "shape": (h, w),
    }
    return bytes(out), state


def reference_reconstruction(state: dict) -> np.ndarray:
    """Encoder-side replay of dequantize+IDCT+color through the same numpy
    code paths the decoder uses — decode_jpeg(bytes) must equal this exactly."""
    h, w = state["shape"]
    planes = [
        _inverse_blocks(b, q, h, w)
        for b, q in zip(state["blocks"], state["qtabs"])
    ]
    ycc = np.stack([p.astype(np.float64) for p in planes], axis=-1)
    return _ycbcr_to_rgb(ycc)


# --------------------------------------------------------------------------- #
# decoder
# --------------------------------------------------------------------------- #


def _parse_segments(data: bytes):
    """Yield (marker, body, scan_bytes_or_None); walks markers up to EOI."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = (0xFF << 8) | data[pos + 1]
        pos += 2
        if marker == 0xFFD9:  # EOI
            return
        if 0xFFD0 <= marker <= 0xFFD7:  # RSTn: no body
            continue
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xFFDA:
            # entropy data runs to the next real marker (stuffed FF00 skipped)
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            yield marker, body, data[pos:end]
            pos = end
        else:
            yield marker, body, None


def decode_jpeg_blocks(data: bytes):
    """bytes → (per-component quantized coefficient blocks, quant tables,
    (h, w)). The exact-integer half of the codec: everything here must match
    the encoder bit-for-bit. Corrupt streams raise ``ValueError`` — never a
    bare ``IndexError``/``struct.error`` leaking out of the executor."""
    try:
        return _decode_jpeg_blocks(data)
    except (IndexError, KeyError, struct.error) as exc:
        # corrupt streams can reference missing table/component ids (KeyError)
        # or truncate mid-field (IndexError/struct.error) — all are data
        # errors, not parser bugs
        raise ValueError(f"jpeg: corrupt stream ({exc})") from exc


def _parse_dqt_body(body: bytes, qtabs: dict[int, np.ndarray]) -> None:
    """DQT segment BODY (sans marker/length) → 8×8 tables into ``qtabs``.
    Shared by the JFIF marker walk and the MJPEG-B offset-table parser."""
    p = 0
    while p < len(body):
        pq, tq = body[p] >> 4, body[p] & 0x0F
        if pq != 0:
            raise ValueError("jpeg: 16-bit quant tables unsupported")
        vals = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
        tab = np.zeros(64, dtype=np.int64)
        tab[_ZIGZAG] = vals
        qtabs[tq] = tab.reshape(8, 8)
        p += 65


def _parse_dht_body(body: bytes, huff: dict) -> None:
    """DHT segment BODY → code tables into ``huff[(cls, tid)]`` (shared)."""
    p = 0
    while p < len(body):
        cls, tid = body[p] >> 4, body[p] & 0x0F
        bits = list(body[p + 1 : p + 17])
        n = sum(bits)
        huffval = list(body[p + 17 : p + 17 + n])
        huff[(cls, tid)] = _assign_codes(bits, huffval)
        p += 17 + n


def _parse_sof_body(body: bytes):
    """SOF0 segment BODY → ([(component id, quant table id)], (h, w))."""
    prec, h, w, nc = struct.unpack(">BHHB", body[:6])
    if prec != 8 or nc != 3:
        raise ValueError("jpeg: only 8-bit 3-component baseline supported")
    comps = []
    for i in range(nc):
        cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
        if samp != 0x11:
            raise ValueError("jpeg: subsampling unsupported (4:4:4 only)")
        comps.append((cid, tq))
    return comps, (h, w)


def _parse_sos_body(body: bytes):
    """SOS segment BODY → [(component id, DC table id, AC table id)]."""
    ns = body[0]
    return [
        (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
        for i in range(ns)
    ]


def _decode_scan(reader: _BitReader, huff, comps, scan_comps, h: int, w: int):
    """Entropy-decode a baseline 4:4:4 interleaved scan — the MCU walk shared
    by the JFIF and MJPEG-B decoders (the reader's ``stuffed`` flag decides
    the byte layout). Returns per-component NATURAL-order coefficient blocks
    and the component quant-table ids: ([(nby, nbx, 8, 8) int32], [tq])."""
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    # invert code tables into (length, code) → symbol maps
    dec_tabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {
        k: {v: s for s, v in tab.items()} for k, tab in huff.items()
    }

    def read_symbol(tab: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.read(1)
            sym = tab.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    qblocks = [np.zeros((nby, nbx, 64), dtype=np.int32) for _ in range(3)]
    prev_dc = [0, 0, 0]
    cid_to_idx = {cid: i for i, (cid, _) in enumerate(comps)}
    for by in range(nby):
        for bx in range(nbx):
            for cid, td, ta in scan_comps:
                ci = cid_to_idx[cid]
                dct = dec_tabs[(0, td)]
                act = dec_tabs[(1, ta)]
                zz = np.zeros(64, dtype=np.int32)
                cat = read_symbol(dct)
                if cat > 11:
                    raise ValueError(f"jpeg: invalid DC category {cat}")
                diff = _extend(reader.read(cat), cat) if cat else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = read_symbol(act)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("jpeg: AC run overflows block")
                    zz[k] = _extend(reader.read(size), size)
                    k += 1
                qblocks[ci][by, bx] = zz
    out_blocks = []
    for ci in range(3):
        blk = np.zeros((nby, nbx, 8, 8), dtype=np.int32)
        blk.reshape(nby, nbx, 64)[:] = qblocks[ci][..., _UNZIGZAG]
        out_blocks.append(blk)
    return out_blocks, [tq for _, tq in comps]


def _decode_jpeg_blocks(data: bytes):
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    sof = None
    comps = None
    scan_comps = None
    scan_data = None
    for marker, body, scan in _parse_segments(data):
        if marker == 0xFFDB:
            _parse_dqt_body(body, qtabs)
        elif marker == 0xFFC4:
            _parse_dht_body(body, huff)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError(f"jpeg: only baseline SOF0 supported, got {marker:04X}")
        elif marker == 0xFFC0:
            comps, sof = _parse_sof_body(body)
        elif marker == 0xFFDA:
            scan_comps = _parse_sos_body(body)
            scan_data = scan
        elif marker == 0xFFDD:
            raise ValueError("jpeg: restart intervals unsupported")
    if sof is None or scan_data is None or comps is None or scan_comps is None:
        raise ValueError("jpeg: missing SOF/SOS")
    h, w = sof
    out_blocks, tqs = _decode_scan(
        _BitReader(scan_data, stuffed=True), huff, comps, scan_comps, h, w
    )
    return out_blocks, [qtabs[tq] for tq in tqs], (h, w)


def decode_jpeg(data: bytes) -> np.ndarray:
    """bytes → (h, w, 3) uint8 RGB. Exactly equals
    ``reference_reconstruction`` of the encoder state for our own payloads."""
    blocks, qtabs, (h, w) = decode_jpeg_blocks(data)
    planes = [_inverse_blocks(b, q, h, w) for b, q in zip(blocks, qtabs)]
    ycc = np.stack([p.astype(np.float64) for p in planes], axis=-1)
    return _ycbcr_to_rgb(ycc)
