"""MJPEG-B ("Motion-JPEG format B") frame codec — the second real compressed
video path, shrinking the motion-video stub by its intra-only half.

MJPEG-B is QuickTime's marker-less Motion-JPEG layout (public: Apple's
QuickTime File Format specification, "Motion-JPEG B" — also implemented by
ffmpeg's ``mjpegb`` codec): instead of a self-describing JFIF marker stream,
each frame carries a fixed header with a ``mjpg`` tag and OFFSETS to the
quantization tables, Huffman tables, frame header, scan header, and scan
data; and — the defining property — the entropy-coded scan is stored as RAW
bits with NO 0xFF00 byte stuffing (offsets locate every section, so there is
no in-band marker search that stuffing exists to protect). Everything below
the container layout is baseline JPEG, so this module is pure composition
over ``jpeg.py``'s machinery: the same DCT/quant/Huffman encoder pieces
(``_entropy_tables``/``_write_scan``), the same segment-BODY parsers
(``_parse_dqt_body``/``_parse_dht_body``/``_parse_sof_body``/
``_parse_sos_body``) and scan decoder (``_decode_scan``) — only with the bit
IO's stuffing flag off.

Frame layout written/read here (u32 big-endian fields):

====== ======================================================
offset field
====== ======================================================
0      field size (total frame bytes)
4      tag ``mjpg``
8      padded field size (== field size; frames are pre-padded)
12     offset to next field (0: progressive, single field)
16     DQT section offset
20     DHT section offset
24     SOF section offset
28     SOS section offset
32     scan (image data) offset
====== ======================================================

Each section is a u16-BE length followed by the corresponding JPEG segment
BODY verbatim (the bytes a JFIF file carries after the marker+length), so
the body parsers are shared with the JFIF decoder unchanged. Reference
scope parity: the reference repo has no media pipeline at all; this module
belongs to the driver-mandated multimodal extension
(``multimodal/media.py``).
"""

from __future__ import annotations

import struct

import numpy as np

from switchback_test_dag_spark.multimodal.jpeg import (
    _BitReader,
    _BitWriter,
    _ZIGZAG,
    _block_symbols,
    _decode_scan,
    _entropy_tables,
    _forward_blocks,
    _inverse_blocks,
    _parse_dht_body,
    _parse_dqt_body,
    _parse_sof_body,
    _parse_sos_body,
    _rgb_to_ycbcr,
    _write_scan,
    _ycbcr_to_rgb,
    scaled_quant_tables,
)

_TAG = b"mjpg"
_HEADER_LEN = 36


def _section(body: bytes) -> bytes:
    return struct.pack(">H", len(body)) + body


def encode_mjpegb(pixels: np.ndarray, quality: int = 90) -> tuple[bytes, dict]:
    """(h, w, 3) uint8 RGB → (mjpegb_frame_bytes, exact_state). Same
    ``exact_state`` contract as ``jpeg.encode_jpeg`` (quantized blocks +
    quant tables), so ``jpeg.reference_reconstruction`` replays this frame's
    pixels too — the coefficients are identical to what the JFIF encoder
    would emit; only the byte layout differs."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_mjpegb expects (h, w, 3) RGB")
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
    # RAW scan — the MJPEG-B property: no byte stuffing
    scan = _write_scan(_BitWriter(stuff=False), comp_blocks, dc_codes, ac_codes)

    dqt = b"".join(
        bytes([tid]) + bytes(tab.reshape(-1)[_ZIGZAG].astype(np.uint8))
        for tid, tab in ((0, qy), (1, qc))
    )
    dht = b"".join(
        bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval)
        for cls, tid, (bits, huffval) in (
            (0, 0, dc_tabs[0]),
            (0, 1, dc_tabs[1]),
            (1, 0, ac_tabs[0]),
            (1, 1, ac_tabs[1]),
        )
    )
    sof = struct.pack(">BHHB", 8, h, w, 3) + b"".join(
        struct.pack(">BBB", cid, 0x11, tq) for cid, tq in ((1, 0), (2, 1), (3, 1))
    )
    sos = struct.pack(">B", 3) + b"".join(
        struct.pack(">BB", cid, (td << 4) | ta)
        for cid, (td, ta) in ((1, (0, 0)), (2, (1, 1)), (3, (1, 1)))
    ) + b"\x00\x3f\x00"

    sections = [_section(dqt), _section(dht), _section(sof), _section(sos)]
    offs = []
    pos = _HEADER_LEN
    for sec in sections:
        offs.append(pos)
        pos += len(sec)
    scan_off = pos
    total = scan_off + len(scan)
    head = struct.pack(
        ">I4sIIIIIII", total, _TAG, total, 0, offs[0], offs[1], offs[2], offs[3],
        scan_off,
    )
    out = head + b"".join(sections) + scan
    state = {"blocks": comp_blocks, "qtabs": (qy, qc, qc), "shape": (h, w)}
    return out, state


def decode_mjpegb_blocks(data: bytes):
    """frame bytes → (per-component NATURAL-order coefficient blocks, quant
    tables, (h, w)) — the exact-integer half, mirror of
    ``jpeg.decode_jpeg_blocks``. Corrupt frames raise ``ValueError``."""
    try:
        return _decode_mjpegb_blocks(data)
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"mjpegb: corrupt frame ({exc})") from exc


def _decode_mjpegb_blocks(data: bytes):
    if len(data) < _HEADER_LEN:
        raise ValueError("mjpegb: frame shorter than header")
    (size, tag, _padded, _next_field, dqt_off, dht_off, sof_off, sos_off,
     scan_off) = struct.unpack(">I4sIIIIIII", data[:_HEADER_LEN])
    if tag != _TAG:
        raise ValueError("mjpegb: missing mjpg tag")
    if size > len(data):
        raise ValueError("mjpegb: declared field size exceeds payload")

    def sec(off: int) -> bytes:
        (n,) = struct.unpack(">H", data[off : off + 2])
        return data[off + 2 : off + 2 + n]

    qtabs: dict[int, np.ndarray] = {}
    huff: dict = {}
    _parse_dqt_body(sec(dqt_off), qtabs)
    _parse_dht_body(sec(dht_off), huff)
    comps, (h, w) = _parse_sof_body(sec(sof_off))
    scan_comps = _parse_sos_body(sec(sos_off))
    reader = _BitReader(data[scan_off:size], stuffed=False)
    out_blocks, tqs = _decode_scan(reader, huff, comps, scan_comps, h, w)
    return out_blocks, [qtabs[tq] for tq in tqs], (h, w)


def decode_mjpegb(data: bytes) -> np.ndarray:
    """frame bytes → (h, w, 3) uint8 RGB; exactly equals
    ``jpeg.reference_reconstruction`` of the encoder state."""
    blocks, qtabs, (h, w) = decode_mjpegb_blocks(data)
    planes = [_inverse_blocks(b, q, h, w) for b, q in zip(blocks, qtabs)]
    ycc = np.stack([p.astype(np.float64) for p in planes], axis=-1)
    return _ycbcr_to_rgb(ycc)
