"""Real pure-Python AVI (RIFF uncompressed-DIB video) codec — the multimodal
component's working VIDEO path, completing the WAV (audio) and BMP (image)
precedents: no native libraries, ``struct`` + numpy only.

The encoder writes a minimal spec-conformant RIFF 'AVI ' container:
``LIST hdrl`` (an ``avih`` main header + one ``LIST strl`` video stream with
``strh``/``strf``, the strf being a standard BITMAPINFOHEADER for bottom-up
24-bit BI_RGB frames) followed by ``LIST movi`` holding one ``00db``
(uncompressed DIB) chunk per frame. The decoder is a real chunk walker — the
same discipline as ``wav.py`` (unknown chunks skipped, word-alignment padding
honored, headers located wherever they appear) — and each frame's pixel rows
decode exactly like ``bmp.py``'s pixel array (stride padding, bottom-up flip,
BGR order).

MJPEG-in-AVI (fourcc ``MJPG``) composes this container walker with the
baseline-JPEG codec (``jpeg.py``): each ``00dc`` chunk is one complete JPEG
image, so COMPRESSED video decode runs end to end on real bytes with parts
already on the shelf — only the fourcc dispatch and per-frame JPEG slicing
are new. Motion-JPEG-B (fourcc ``mjpb``, QuickTime's marker-less MJPEG
layout — ``mjpegb.py``) rides the same shared compressed-stream writer and
reader with a different per-frame byte format. Motion-compensated video
(H.26x/VP9/AV1) still requires real codec libraries and remains the one
documented stub.
"""

from __future__ import annotations

import struct

import numpy as np

_FOURCC_RIFF = b"RIFF"
_FOURCC_AVI = b"AVI "
_FOURCC_LIST = b"LIST"
_INFO_HEADER = "<IiiHHIIiiII"
# BITMAPINFOHEADER biCompression value for MJPEG ('MJPG' little-endian)
_MJPG_INT = int.from_bytes(b"MJPG", "little")
# QuickTime Motion-JPEG-B codec id
_MJPB_INT = int.from_bytes(b"mjpb", "little")


def _iter_chunks(buf: bytes, pos: int, end: int):
    """Depth-first (name, body_offset, size) walk over RIFF chunks, LISTs
    flattened, unknown chunks surfaced for the caller to skip — the shared
    walking discipline of both AVI decoders (word-alignment padding honored,
    headers located wherever they appear)."""
    while pos + 8 <= end:
        name, size = struct.unpack_from("<4sI", buf, pos)
        pos += 8
        body_end = min(pos + size, end)
        if name == _FOURCC_LIST:
            yield from _iter_chunks(buf, pos + 4, body_end)
        else:
            yield name, pos, size
        pos += size + (size & 1)  # RIFF word alignment


def _require_avi(payload: bytes) -> None:
    if (
        len(payload) < 12
        or payload[:4] != _FOURCC_RIFF
        or payload[8:12] != _FOURCC_AVI
    ):
        raise ValueError("not a RIFF/AVI container")


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def _frame_bytes(frame: np.ndarray) -> bytes:
    h, w, _ = frame.shape
    stride = _row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return rows.tobytes()


def encode_avi_dib(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frame stack → uncompressed-DIB AVI bytes."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) RGB stack, got {fr.shape}")
    n, h, w, _ = fr.shape
    frame_size = _row_stride(w) * h

    strf = struct.pack(_INFO_HEADER, 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    # strh: video stream header — fccType 'vids', no codec ('DIB '),
    # rate/scale giving fps, length in frames
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0, 0, 0, w, h,
    )
    strl = (
        _FOURCC_LIST
        + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
        + b"strl"
        + b"strh" + struct.pack("<I", len(strh)) + strh
        + b"strf" + struct.pack("<I", len(strf)) + strf
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1, frame_size, w, h,
        0, 0, 0, 0,
    )
    hdrl = (
        _FOURCC_LIST
        + struct.pack("<I", 4 + 8 + len(avih) + len(strl))
        + b"hdrl"
        + b"avih" + struct.pack("<I", len(avih)) + avih
        + strl
    )
    movi_body = b"".join(
        b"00db" + struct.pack("<I", frame_size) + _frame_bytes(f) for f in fr
    )
    movi = _FOURCC_LIST + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = _FOURCC_AVI + hdrl + movi
    return _FOURCC_RIFF + struct.pack("<I", len(body)) + body


def decode_avi_dib(payload: bytes) -> tuple[int, np.ndarray]:
    """AVI bytes → (fps, (n, h, w, 3) uint8 RGB frame stack).

    Chunk-walks the container: finds the video ``strf`` BITMAPINFOHEADER in
    ``hdrl`` (frame geometry), the ``strh`` rate/scale (fps), and every
    ``00db``/``00dc``-BI_RGB frame inside ``LIST movi`` wherever they sit;
    skips unknown chunks with RIFF word alignment. Raises ``ValueError`` on
    malformed containers or compressed streams."""
    _require_avi(payload)

    geom: dict = {}
    frames: list[np.ndarray] = []
    for name, pos, size in _iter_chunks(payload, 12, len(payload)):
        if name == b"strh":
            fcc_type, _hdl, _fl, _pri, _lang, _init, scale, rate = (
                struct.unpack_from("<4s4sIHHIII", payload, pos)
            )
            if fcc_type == b"vids" and scale:
                geom["fps"] = rate // scale
        elif name == b"strf" and "w" not in geom:
            hsize, w, h, _planes, bpp, compression = struct.unpack_from(
                "<IiiHHI", payload, pos
            )
            if hsize >= 40 and bpp == 24 and compression == 0:
                geom["w"], geom["h"] = w, abs(h)
                geom["top_down"] = h < 0
            else:
                raise ValueError(
                    f"unsupported stream: bpp={bpp} compression={compression}"
                )
        elif name in (b"00db", b"00dc"):
            if "w" not in geom:
                raise ValueError("frame chunk before stream format header")
            w, h = geom["w"], geom["h"]
            stride = _row_stride(w)
            if size < stride * h:
                raise ValueError("truncated frame chunk")
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=pos
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            rgb = rows[:, :, ::-1]
            if not geom.get("top_down"):
                rgb = rgb[::-1]
            frames.append(np.ascontiguousarray(rgb))
    if "w" not in geom or not frames:
        raise ValueError("missing stream header or frames")
    return geom.get("fps", 0), np.stack(frames)


def encode_avi_mjpg(jpeg_frames: list, width: int, height: int, fps: int = 10) -> bytes:
    """List of complete baseline-JPEG byte payloads (same geometry each) →
    MJPEG AVI bytes: the identical RIFF layout as :func:`encode_avi_dib`
    with fccHandler/biCompression 'MJPG' and one ``00dc`` chunk per JPEG.
    Container size is NOT closed-form (entropy-coded frame sizes vary) —
    byte-accounting contracts stay with the DIB path."""
    return _encode_avi_compressed(jpeg_frames, width, height, fps, b"MJPG")


def encode_avi_mjpb(mjpegb_frames: list, width: int, height: int, fps: int = 10) -> bytes:
    """List of MJPEG-B frame payloads (``mjpegb.encode_mjpegb``; same
    geometry each) → AVI bytes with fccHandler/biCompression 'mjpb' — the
    QuickTime Motion-JPEG-B codec id — and one ``00dc`` chunk per frame.
    Same container layout as the MJPG path; only the codec id and per-frame
    byte format differ."""
    return _encode_avi_compressed(mjpegb_frames, width, height, fps, b"mjpb")


def _encode_avi_compressed(
    enc_frames: list, width: int, height: int, fps: int, fourcc: bytes
) -> bytes:
    """Shared compressed-video AVI writer: one ``00dc`` chunk per
    pre-encoded frame payload, stream headers declaring ``fourcc``."""
    if not enc_frames:
        raise ValueError("compressed AVI needs at least one frame")
    frames = [bytes(f) for f in enc_frames]
    n = len(frames)
    max_size = max(len(f) for f in frames)
    fourcc_int = int.from_bytes(fourcc, "little")

    strf = struct.pack(
        _INFO_HEADER, 40, width, height, 1, 24, fourcc_int, max_size, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", fourcc, 0, 0, 0, 0, 1, fps, 0, n, max_size, 0, 0, 0, 0,
        width, height,
    )
    strl = (
        _FOURCC_LIST
        + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
        + b"strl"
        + b"strh" + struct.pack("<I", len(strh)) + strh
        + b"strf" + struct.pack("<I", len(strf)) + strf
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, max_size * fps, 0, 0x10, n, 0, 1, max_size,
        width, height, 0, 0, 0, 0,
    )
    hdrl = (
        _FOURCC_LIST
        + struct.pack("<I", 4 + 8 + len(avih) + len(strl))
        + b"hdrl"
        + b"avih" + struct.pack("<I", len(avih)) + avih
        + strl
    )
    movi_body = b"".join(
        b"00dc" + struct.pack("<I", len(f)) + f + (b"\x00" if len(f) & 1 else b"")
        for f in frames
    )
    movi = _FOURCC_LIST + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = _FOURCC_AVI + hdrl + movi
    return _FOURCC_RIFF + struct.pack("<I", len(body)) + body


def decode_avi_mjpg(payload: bytes) -> tuple[int, np.ndarray]:
    """MJPEG AVI bytes → (fps, (n, h, w, 3) uint8 RGB frame stack): the same
    chunk walk as :func:`decode_avi_dib`, but the stream format must declare
    biCompression 'MJPG' and every ``00dc``/``00db`` chunk body is one
    complete baseline JPEG decoded by the full entropy-decode + dequantize +
    IDCT parser (``jpeg.decode_jpeg``). Raises ``ValueError`` on
    uncompressed or otherwise non-MJPG streams (use :func:`decode_avi_dib`),
    malformed containers, or a frame whose decoded geometry disagrees with
    the stream header."""
    from switchback_test_dag_spark.multimodal.jpeg import decode_jpeg

    return _decode_avi_compressed(payload, _MJPG_INT, "an MJPG", decode_jpeg)


def decode_avi_mjpb(payload: bytes) -> tuple[int, np.ndarray]:
    """Motion-JPEG-B AVI bytes → (fps, (n, h, w, 3) uint8 RGB frame stack):
    the same chunk walk with biCompression 'mjpb', each ``00dc`` chunk one
    marker-less MJPEG-B frame (offset-table header, UNSTUFFED scan) decoded
    by ``mjpegb.decode_mjpegb`` — the same Huffman+IDCT machinery as the
    MJPG path under the QuickTime byte layout."""
    from switchback_test_dag_spark.multimodal.mjpegb import decode_mjpegb

    return _decode_avi_compressed(payload, _MJPB_INT, "a mjpb", decode_mjpegb)


def _decode_avi_compressed(
    payload: bytes, fourcc_int: int, codec_name: str, frame_decoder
) -> tuple[int, np.ndarray]:
    """Shared compressed-video AVI reader: walk chunks, require the declared
    codec id, decode every ``00dc``/``00db`` body with ``frame_decoder``."""
    _require_avi(payload)

    geom: dict = {}
    frames: list[np.ndarray] = []
    for name, pos, size in _iter_chunks(payload, 12, len(payload)):
        if name == b"strh":
            fcc_type, _hdl, _fl, _pri, _lang, _init, scale, rate = (
                struct.unpack_from("<4s4sIHHIII", payload, pos)
            )
            if fcc_type == b"vids" and scale:
                geom["fps"] = rate // scale
        elif name == b"strf" and "w" not in geom:
            hsize, w, h, _planes, _bpp, compression = struct.unpack_from(
                "<IiiHHI", payload, pos
            )
            if hsize >= 40 and compression == fourcc_int:
                geom["w"], geom["h"] = w, abs(h)
            else:
                raise ValueError(
                    f"not {codec_name} stream: compression={compression}"
                )
        elif name in (b"00db", b"00dc"):
            if "w" not in geom:
                raise ValueError("frame chunk before stream format header")
            frame = frame_decoder(payload[pos : pos + size])
            if frame.shape[:2] != (geom["h"], geom["w"]):
                raise ValueError(
                    f"frame geometry {frame.shape[:2]} disagrees with stream "
                    f"header {(geom['h'], geom['w'])}"
                )
            frames.append(frame)
    if "w" not in geom or not frames:
        raise ValueError("missing stream header or frames")
    return geom.get("fps", 0), np.stack(frames)


def decode_avi_any(payload: bytes) -> tuple[str, int, np.ndarray]:
    """AVI bytes of ANY supported codec → (codec, fps, frame stack): peeks
    the stream-format BITMAPINFOHEADER's biCompression and routes to the
    matching decoder — ``dib`` (BI_RGB uncompressed), ``mjpg`` (baseline
    JPEG per frame) or ``mjpb`` (marker-less Motion-JPEG-B per frame). The
    container-level twin of ``media.detect_media_format``: magic bytes pick
    the CONTAINER, this picks the codec inside it. Unknown compression
    values raise ``ValueError`` (a per-payload data-quality signal)."""
    _require_avi(payload)
    for name, pos, _size in _iter_chunks(payload, 12, len(payload)):
        if name == b"strf":
            hsize, _w, _h, _planes, bpp, compression = struct.unpack_from(
                "<IiiHHI", payload, pos
            )
            if hsize < 40:
                continue
            if compression == 0 and bpp == 24:
                return ("dib", *decode_avi_dib(payload))
            if compression == _MJPG_INT:
                return ("mjpg", *decode_avi_mjpg(payload))
            if compression == _MJPB_INT:
                return ("mjpb", *decode_avi_mjpb(payload))
            raise ValueError(
                f"unsupported AVI codec: compression={compression:#x} bpp={bpp}"
            )
    raise ValueError("no stream format header found in AVI")
