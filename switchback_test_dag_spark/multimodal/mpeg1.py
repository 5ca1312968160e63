"""MPEG-1 video — the third real compressed-video path: intra (I) pictures
in full within the stated VLC subset, plus ZERO-MOTION P-pictures
(conditional replenishment: skipped and MC-not-coded macroblocks copy the
reference frame; changed regions are intra-refreshed). Residual-coded
inter blocks (CBP + non-intra dequant), nonzero motion vectors, and B/D
pictures stay the documented loud ``NotImplementedError``.

Scope (public spec: ISO/IEC 11172-2):

- **Elementary stream** (``00 00 01 B3`` sequence header): sequence → GOP →
  picture(type=I/P) → one slice per macroblock row → 4:2:0 macroblocks.
  Block coefficients ride the same orthonormal 8×8 DCT core as every other
  codec here (``jpeg._C``), with MPEG's OWN quantization: the default intra
  quantizer matrix, per-slice ``quantizer_scale``, the ``(2·QF·qs·W)/16``
  reconstruction with oddification (mismatch control) and ±2048 saturation,
  and 8·QFS DC with the per-slice-reset size-coded DC predictor.
- **Program stream** (``00 00 01 BA`` pack header): a minimal MPEG-1 system
  mux/demux — pack headers, optional system header, video PES packets
  (stream 0xE0, stuffing/STD/PTS fields skipped per the MPEG-1 PES grammar)
  — so a ``.mpg`` file whose video track is intra-only decodes end to end.

Entropy-coding honesty (this container has no reference MPEG decoder to
verify long-tail VLC parity against): the DECODER implements the
macroblock/DC tables in full (B.1 increments 1–3 + stuffing, B.2a, B.12,
B.13) plus Table B.5's short AC codes — EOB ``10``, (0,±1) ``11s`` (intra
ACs always use dct_coeff_next; the 1-bit dct_coeff_first form is a
non-intra-only construct), (1,1) ``011s``, (0,2) ``0100s``, (2,1)
``0101s``, (0,3) ``00101s``, (3,1) ``00111s``, (4,1) ``00110s`` — and the always-legal
6-bit ESCAPE (``000001`` + 6-bit run + 8/16-bit level). Any other B.5
prefix raises ``ValueError`` naming the bits, so a conformant stream using
the long tail is DETECTED, never mis-decoded. The ENCODER emits only the
implemented subset (short codes when they apply, escape otherwise — escape
is unconditionally legal for any (run, level)), so encode→decode is a full
fidelity roundtrip through real variable-length coding.

Reference scope parity: the reference repo has no media pipeline; this
module belongs to the driver-mandated multimodal extension
(``multimodal/media.py``), sharing its per-frame feature contract.
"""

from __future__ import annotations

import numpy as np

from switchback_test_dag_spark.multimodal.jpeg import (
    _C,
    _ZIGZAG,
    _BitReader,
    _BitWriter,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
)

# ISO 11172-2 default intra quantizer matrix (natural raster order)
_INTRA_Q = np.array(
    [
        [8, 16, 19, 22, 26, 27, 29, 34],
        [16, 16, 22, 24, 27, 29, 34, 37],
        [19, 22, 26, 27, 29, 34, 34, 38],
        [22, 22, 26, 27, 29, 34, 37, 40],
        [22, 26, 27, 29, 32, 35, 40, 48],
        [26, 27, 29, 32, 35, 40, 48, 58],
        [26, 27, 29, 34, 38, 46, 56, 69],
        [27, 29, 35, 38, 46, 56, 69, 83],
    ],
    dtype=np.int64,
)

# picture_rate code → frames/sec (code 3 = 25 fps; the fixture default)
_PICTURE_RATES = {
    1: 23.976, 2: 24.0, 3: 25.0, 4: 29.97, 5: 30.0, 6: 50.0, 7: 59.94, 8: 60.0,
}

# dct_dc_size VLCs (Tables B.12 / B.13): size → (nbits, code)
_DC_LUMA = {
    0: (3, 0b100), 1: (2, 0b00), 2: (2, 0b01), 3: (3, 0b101), 4: (3, 0b110),
    5: (4, 0b1110), 6: (5, 0b11110), 7: (6, 0b111110), 8: (7, 0b1111110),
}
_DC_CHROMA = {
    0: (2, 0b00), 1: (2, 0b01), 2: (2, 0b10), 3: (3, 0b110), 4: (4, 0b1110),
    5: (5, 0b11110), 6: (6, 0b111110), 7: (7, 0b1111110), 8: (8, 0b11111110),
}
# Table B.5 short AC codes implemented on BOTH sides: (run, |level|) →
# (nbits, code) — the sign bit follows each. ESCAPE covers everything else.
_AC_SHORT = {
    (0, 1): (2, 0b11),  # NOT at block start; at block start the code is '1'
    (1, 1): (3, 0b011),
    (0, 2): (4, 0b0100),
    (2, 1): (4, 0b0101),
    (0, 3): (5, 0b00101),
    (3, 1): (5, 0b00111),
    (4, 1): (5, 0b00110),
}


def _dct_block(spatial: np.ndarray) -> np.ndarray:
    return _C @ spatial.astype(np.float64) @ _C.T


def _idct_block(coefs: np.ndarray) -> np.ndarray:
    return _C.T @ coefs.astype(np.float64) @ _C


def _write_start(w: _BitWriter, code: int) -> None:
    if w.nbits % 8:
        w.write(8 - w.nbits % 8, 0)  # start codes are byte-aligned, 0-padded
    w.write(32, 0x000001_00 | code)


def _encode_block(
    w: _BitWriter, coefs: np.ndarray, qscale: int, dc_pred: int, luma: bool
) -> int:
    """Quantize + entropy-code one intra block; returns the new DC predictor
    (in 8-unit DC steps). ``coefs`` is the unquantized 8×8 DCT."""
    zz = coefs.flatten()[_ZIGZAG]
    qdc = int(np.clip(np.round(zz[0] / 8.0), 0, 255))
    diff = qdc - dc_pred
    size = 0 if diff == 0 else int(abs(diff)).bit_length()
    nb, code = (_DC_LUMA if luma else _DC_CHROMA)[size]
    w.write(nb, code)
    if size:
        w.write(size, diff if diff >= 0 else diff + (1 << size) - 1)
    wq = _INTRA_Q.flatten()[_ZIGZAG]
    run = 0
    for i in range(1, 64):
        q = int(np.round(8.0 * zz[i] / (qscale * wq[i])))
        q = max(-255, min(255, q))  # 8-bit escape range; ample at fixture qs
        if q == 0:
            run += 1
            continue
        key = (run, abs(q))
        if key in _AC_SHORT:
            nb, code = _AC_SHORT[key]
            w.write(nb, code)
            w.write(1, 1 if q < 0 else 0)
        else:
            w.write(6, 0b000001)  # ESCAPE: always-legal coding
            w.write(6, run)
            if -127 <= q <= 127:
                w.write(8, q & 0xFF)
            elif q > 0:  # 16-bit escape: 0x00 marker + level
                w.write(8, 0x00)
                w.write(8, q)
            else:  # 0x80 marker + level & 0xFF
                w.write(8, 0x80)
                w.write(8, q & 0xFF)
        run = 0
    w.write(2, 0b10)  # EOB
    return qdc


def encode_m1v(
    frames: np.ndarray,
    qscale: int = 4,
    picture_rate_code: int = 3,
    p_frames: bool = False,
) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → MPEG-1 video elementary stream, one
    slice per macroblock row, 4:2:0.

    ``p_frames=False`` (default): every picture an I-frame.
    ``p_frames=True``: first picture I, the rest P-pictures under the
    ZERO-MOTION subset (conditional replenishment — the classic
    frame-difference coding mode): a macroblock whose source pixels are
    UNCHANGED from the previous frame is coded ``001`` (MC, not coded —
    prediction only, zero motion vectors, no residual), a changed
    macroblock is coded intra (``00011``, an intra refresh). Decoded
    static regions are bit-identical copies of the previous decoded
    frame, so prediction error never accumulates; no reconstruction loop
    is needed encoder-side because the keep/refresh decision compares
    SOURCE frames. Residual-coded inter blocks (CBP + non-intra
    dequant) and nonzero motion vectors are NOT emitted — and the decoder
    raises loudly on them (module docstring)."""
    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError("encode_m1v expects (n, h, w, 3) uint8 RGB frames")
    if not 1 <= qscale <= 31:
        raise ValueError("quantizer_scale must be in 1..31")
    n, h, w0 = frames.shape[:3]
    mbw, mbh = (w0 + 15) // 16, (h + 15) // 16
    out = _BitWriter(stuff=False)
    _write_start(out, 0xB3)  # sequence header
    out.write(12, w0)
    out.write(12, h)
    out.write(4, 1)  # pel aspect 1:1
    out.write(4, picture_rate_code)
    out.write(18, 0x3FFFF)  # variable bit rate
    out.write(1, 1)  # marker
    out.write(10, 0)  # vbv buffer size
    out.write(1, 0)  # constrained flag
    out.write(1, 0)  # no custom intra matrix (default _INTRA_Q)
    out.write(1, 0)  # no custom non-intra matrix
    _write_start(out, 0xB8)  # GOP header
    out.write(25, 0)  # time code
    out.write(1, 1)  # closed gop
    out.write(1, 0)  # broken link
    prev_pad = None
    for t, frame in enumerate(frames):
        pad = np.pad(
            frame, ((0, mbh * 16 - h), (0, mbw * 16 - w0), (0, 0)), mode="edge"
        )
        ycc = _rgb_to_ycbcr(pad)
        y = ycc[..., 0]
        cb = ycc[::2, ::2, 1:3].copy()
        cb += ycc[1::2, ::2, 1:3] + ycc[::2, 1::2, 1:3] + ycc[1::2, 1::2, 1:3]
        cb /= 4.0  # 4:2:0 chroma: 2x2 mean
        is_p = p_frames and t > 0
        _write_start(out, 0x00)  # picture header
        out.write(10, t % 1024)  # temporal reference
        out.write(3, 2 if is_p else 1)  # picture_coding_type
        out.write(16, 0xFFFF)  # vbv_delay: variable
        if is_p:
            out.write(1, 0)  # full_pel_forward_vector
            out.write(3, 1)  # forward_f_code = 1
        for row in range(mbh):
            _write_start(out, 0x01 + row)  # slice (one per MB row)
            out.write(5, qscale)
            out.write(1, 0)  # no extra slice info
            preds = [128, 128, 128]  # DC predictors reset per slice
            for col in range(mbw):
                by, bx = row * 16, col * 16
                out.write(1, 1)  # address increment: +1
                if is_p and np.array_equal(
                    pad[by:by + 16, bx:bx + 16], prev_pad[by:by + 16, bx:bx + 16]
                ):
                    # unchanged macroblock: MC-not-coded, zero motion
                    out.write(3, 0b001)  # macroblock_type: MC, not coded
                    out.write(1, 1)  # motion_horizontal_code = 0
                    out.write(1, 1)  # motion_vertical_code = 0
                    preds = [128, 128, 128]  # non-intra MB resets DC preds
                    continue
                if is_p:
                    out.write(5, 0b00011)  # macroblock_type: intra (refresh)
                else:
                    out.write(1, 1)  # macroblock_type: intra
                for sub in range(4):  # 4 luma blocks
                    sy, sx = by + (sub // 2) * 8, bx + (sub % 2) * 8
                    preds[0] = _encode_block(
                        out, _dct_block(y[sy:sy + 8, sx:sx + 8]),
                        qscale, preds[0], luma=True,
                    )
                for c in range(2):  # Cb, Cr 8×8
                    blk = cb[row * 8:row * 8 + 8, col * 8:col * 8 + 8, c]
                    preds[1 + c] = _encode_block(
                        out, _dct_block(blk), qscale, preds[1 + c], luma=False
                    )
        prev_pad = pad
    _write_start(out, 0xB7)  # sequence end
    return out.flush()


def _read_dc(r: _BitReader, luma: bool) -> int:
    table = _DC_LUMA if luma else _DC_CHROMA
    by_code = {(nb, code): size for size, (nb, code) in table.items()}
    acc, nb = 0, 0
    while nb < 9:
        acc = (acc << 1) | r.read(1)
        nb += 1
        if (nb, acc) in by_code:
            size = by_code[(nb, acc)]
            if size == 0:
                return 0
            v = r.read(size)
            return v if v >= (1 << (size - 1)) else v - (1 << size) + 1
    raise ValueError(f"mpeg1: invalid dct_dc_size prefix {acc:b}")


_AC_BY_CODE = {(nb, code): rl for rl, (nb, code) in _AC_SHORT.items()}


def _decode_block(
    r: _BitReader, qscale: int, dc_pred: int, luma: bool
) -> tuple[np.ndarray, int]:
    """One intra block → (8×8 float coefficient matrix, new DC predictor)."""
    diff = _read_dc(r, luma)
    qdc = dc_pred + diff
    zz = np.zeros(64)
    zz[0] = 8.0 * qdc
    wq = _INTRA_Q.flatten()[_ZIGZAG]
    idx = 1
    while True:
        acc, nb = 0, 0
        while True:
            acc = (acc << 1) | r.read(1)
            nb += 1
            if nb == 2 and acc == 0b10:
                # EOB — valid immediately: intra ACs always use
                # dct_coeff_next ((0,1) = '11s'); the 1-bit '1s' form of
                # dct_coeff_first exists only for NON-intra blocks
                run, level = -1, 0
                break
            if nb == 6 and acc == 0b000001:  # ESCAPE
                run = r.read(6)
                lv = r.read(8)
                if lv == 0 or lv == 0x80:  # 16-bit escape levels
                    ext = r.read(8)
                    lv = ext if lv == 0 else ext - 256
                elif lv >= 128:
                    lv -= 256
                level = lv
                break
            if (nb, acc) in _AC_BY_CODE:
                run, lv = _AC_BY_CODE[(nb, acc)]
                level = -lv if r.read(1) else lv
                break
            if nb > 11:
                raise ValueError(
                    f"mpeg1: unimplemented Table B.5 AC prefix "
                    f"{acc:0{nb}b} (long-tail VLC; see module docstring)"
                )
        if run < 0:
            break
        idx += run
        if idx > 63:
            raise ValueError("mpeg1: AC run past block end")
        rec = (2 * level * qscale * int(wq[idx])) // 16
        if rec % 2 == 0 and rec != 0:  # oddification (mismatch control)
            rec = rec - 1 if rec > 0 else rec + 1
        zz[idx] = float(max(-2048, min(2047, rec)))
        idx += 1
    coefs = np.zeros(64)
    coefs[_ZIGZAG] = zz
    return coefs.reshape(8, 8), qdc


def decode_m1v(data: bytes) -> tuple[np.ndarray, dict]:
    """MPEG-1 video ES → ((n, h, w, 3) uint8 RGB frames, meta). I-pictures
    decode in full (within the stated VLC subset); P-pictures decode under
    the ZERO-MOTION subset — skipped and MC-not-coded macroblocks copy the
    reference planes (real temporal prediction), intra-refresh macroblocks
    decode in place, DC predictors reset after every non-intra macroblock
    per the spec. Residual-coded inter blocks, nonzero motion vectors and
    B/D pictures raise ``NotImplementedError`` (the documented remaining
    stub)."""
    r = _BitReader(data, stuffed=False)
    if r.read(32) != 0x000001B3:
        raise ValueError("mpeg1: missing sequence header start code")
    w0 = r.read(12)
    h = r.read(12)
    r.read(4)  # pel aspect
    rate_code = r.read(4)
    r.read(18)
    if r.read(1) != 1:
        raise ValueError("mpeg1: sequence header marker bit missing")
    r.read(10)
    r.read(1)
    if r.read(1):  # custom intra matrix: 64 bytes, zigzag order
        vals = np.array([r.read(8) for _ in range(64)], dtype=np.int64)
        intra_q = np.zeros(64, dtype=np.int64)
        intra_q[_ZIGZAG] = vals
        intra_q = intra_q.reshape(8, 8)
    else:
        intra_q = _INTRA_Q
    if intra_q is not _INTRA_Q:
        raise NotImplementedError(
            "mpeg1: custom intra quantizer matrices not wired through the "
            "block decoder yet (fixtures use the default matrix)"
        )
    if r.read(1):
        for _ in range(64):
            r.read(8)  # non-intra matrix: irrelevant to I-frames
    mbw, mbh = (w0 + 15) // 16, (h + 15) // 16
    frames: list[np.ndarray] = []
    ref_y = ref_cbcr = None  # previous picture's planes (P prediction)

    def next_code() -> int:
        if r.nbits % 8:
            r.read(r.nbits % 8)
        while True:
            code = r.read(32)
            while code >> 8 != 0x000001:
                code = ((code << 8) & 0xFFFFFFFF) | r.read(8)
            return code & 0xFF

    code = next_code()
    while code != 0xB7:  # sequence end
        if code == 0xB8:  # GOP header
            r.read(27)
            code = next_code()
            continue
        if code != 0x00:
            raise ValueError(f"mpeg1: unexpected start code 0x{code:02X}")
        r.read(10)  # temporal reference
        ptype = r.read(3)
        if ptype not in (1, 2):
            raise NotImplementedError(
                f"mpeg1: picture_coding_type={ptype} (B/D pictures) needs "
                "bidirectional prediction — the documented stub"
            )
        is_p = ptype == 2
        r.read(16)  # vbv_delay
        if is_p:
            if ref_y is None:
                raise ValueError("mpeg1: P-picture with no reference frame")
            r.read(1)  # full_pel_forward_vector
            r.read(3)  # forward_f_code
            y = ref_y.copy()  # skipped/pred MBs keep the reference pixels
            cbcr = ref_cbcr.copy()
        else:
            y = np.zeros((mbh * 16, mbw * 16))
            cbcr = np.zeros((mbh * 8, mbw * 8, 2))
        code = next_code()
        while 0x01 <= code <= 0xAF:  # slices
            row = code - 0x01
            qscale = r.read(5)
            while r.read(1):  # extra_information_slice
                r.read(8)
            preds = [128, 128, 128]
            col = 0
            while col < mbw:
                # address increment (Table B.1): '1'=+1, '011'=+2, '010'=+3,
                # '00000001111'=stuffing (repeatable); longer prefixes are
                # the unimplemented tail — loud, per the module contract
                while True:
                    if r.read(1):  # '1' = +1
                        inc = 1
                        break
                    if r.read(1):  # '01x'
                        inc = 2 if r.read(1) else 3
                        break
                    got = 0
                    for _ in range(9):  # '00' consumed; stuffing rest
                        got = (got << 1) | r.read(1)
                    if got == 0b000001111:
                        continue  # macroblock_stuffing: discard, re-read
                    raise ValueError(
                        f"mpeg1: unimplemented address-increment prefix "
                        f"00{got:09b}"
                    )
                if inc != 1:
                    if not is_p:
                        raise ValueError(
                            "mpeg1: skipped macroblocks are illegal in I-pictures"
                        )
                    # skipped MBs in P: reference pixels stay (already copied
                    # in); DC predictors reset; advance past them
                    col += inc - 1
                    if col >= mbw:
                        raise ValueError("mpeg1: skipped past slice end")
                    preds = [128, 128, 128]
                by, bx = row * 16, col * 16
                if is_p:
                    # macroblock_type, Table B.2b prefix walk
                    if r.read(1):
                        raise NotImplementedError(
                            "mpeg1: residual-coded inter macroblock (type "
                            "'1', MC+coded) — CBP/non-intra dequant is the "
                            "documented stub; this stream is outside the "
                            "zero-motion P subset"
                        )
                    if r.read(1):
                        raise NotImplementedError(
                            "mpeg1: coded no-MC inter macroblock (type '01') "
                            "— residual decoding is the documented stub"
                        )
                    if r.read(1):  # '001' = MC, not coded: pure prediction
                        for _axis in range(2):  # motion codes, zero only
                            if r.read(1) != 1:
                                raise NotImplementedError(
                                    "mpeg1: nonzero motion vector — only the "
                                    "zero-motion P subset is implemented"
                                )
                        preds = [128, 128, 128]  # non-intra MB resets preds
                        col += 1
                        continue  # reference pixels already in place
                    if r.read(1) != 1 or r.read(1) != 1:
                        raise NotImplementedError(
                            "mpeg1: unimplemented P macroblock_type prefix "
                            "(quant variants of the inter types)"
                        )
                    # '00011' = intra refresh: falls through to block decode
                elif r.read(1) != 1:
                    if r.read(1) != 1:
                        raise ValueError(
                            "mpeg1: non-intra macroblock_type in I-picture"
                        )
                    qscale = r.read(5)  # '01' = intra + new quantizer_scale
                for sub in range(4):
                    coefs, preds[0] = _decode_block(r, qscale, preds[0], True)
                    sy, sx = by + (sub // 2) * 8, bx + (sub % 2) * 8
                    y[sy:sy + 8, sx:sx + 8] = _idct_block(coefs)
                for c in range(2):
                    coefs, preds[1 + c] = _decode_block(
                        r, qscale, preds[1 + c], False
                    )
                    cbcr[
                        row * 8:row * 8 + 8, col * 8:col * 8 + 8, c
                    ] = _idct_block(coefs)
                col += 1
            code = next_code()
        ref_y, ref_cbcr = y, cbcr  # reference for a following P-picture
        up = cbcr.repeat(2, axis=0).repeat(2, axis=1)  # 4:2:0 → 4:4:4
        ycc = np.concatenate([y[..., None], up], axis=-1)
        frames.append(_ycbcr_to_rgb(ycc)[:h, :w0])
    meta = {
        "width": w0,
        "height": h,
        "n_frames": len(frames),
        "fps": _PICTURE_RATES.get(rate_code, 0.0),
    }
    return np.stack(frames) if frames else np.zeros((0, h, w0, 3), np.uint8), meta


# --------------------------------------------------------------------------- #
# MPEG-1 program stream (minimal system mux/demux, video-only)
# --------------------------------------------------------------------------- #


def mux_mpeg_ps(video_es: bytes, packet_size: int = 2048) -> bytes:
    """Wrap a video elementary stream in a minimal MPEG-1 program stream:
    one pack header + one video (0xE0) PES packet per ``packet_size`` chunk,
    no-timestamp PES headers, ISO 11172-1 end code."""
    out = bytearray()
    for off in range(0, len(video_es), packet_size):
        chunk = video_es[off:off + packet_size]
        out += b"\x00\x00\x01\xba"
        # MPEG-1 pack: '0010' + SCR(33, zeros) with marker bits + mux_rate
        scr = bytearray(8)
        scr[0] = 0b0010_0001  # '0010' + scr[32:30]=0 + marker
        scr[2] = 0x01  # marker between scr fields
        scr[4] = 0x01  # marker after scr
        scr[5] = 0x80  # marker + mux_rate high bits
        scr[7] = 0x01  # mux_rate low + marker
        out += scr
        out += b"\x00\x00\x01\xe0"
        payload = b"\x0f" + chunk  # '00001111' = no PTS/DTS
        out += len(payload).to_bytes(2, "big") + payload
    out += b"\x00\x00\x01\xb9"
    return bytes(out)


def demux_mpeg_ps(data: bytes) -> bytes:
    """Extract the concatenated video (0xE0–0xEF) elementary stream from an
    MPEG-1 program stream: walks packs, skips system headers and non-video
    packets, and strips each video PES packet's stuffing/STD/PTS fields per
    the MPEG-1 PES grammar."""
    pos, out = 0, bytearray()
    n = len(data)
    while pos + 4 <= n:
        if data[pos:pos + 3] != b"\x00\x00\x01":
            raise ValueError(f"mpeg1-ps: lost sync at byte {pos}")
        sid = data[pos + 3]
        pos += 4
        if sid == 0xB9:  # end code
            break
        if sid == 0xBA:  # MPEG-1 pack header: fixed 8 bytes after the code
            pos += 8
            continue
        length = int.from_bytes(data[pos:pos + 2], "big")
        pos += 2
        body = data[pos:pos + length]
        pos += length
        if sid == 0xBB or not 0xE0 <= sid <= 0xEF:
            continue  # system header / audio / padding: skip
        i = 0
        while i < len(body) and body[i] == 0xFF:
            i += 1  # stuffing bytes
        if i < len(body) and body[i] >> 6 == 0b01:
            i += 2  # STD buffer size field
        if i < len(body):
            tag = body[i] >> 4
            if tag == 0b0010:
                i += 5  # PTS only
            elif tag == 0b0011:
                i += 10  # PTS + DTS
            elif body[i] == 0x0F:
                i += 1  # no timestamps
            else:
                raise ValueError("mpeg1-ps: malformed PES header flags")
        out += body[i:]
    return bytes(out)


def decode_mpeg1(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode an intra-only MPEG-1 payload: a raw video elementary stream
    (``00 00 01 B3``) or a program stream (``00 00 01 BA``) whose video
    track is intra-only."""
    if data[:4] == b"\x00\x00\x01\xba":
        return decode_m1v(demux_mpeg_ps(data))
    if data[:4] == b"\x00\x00\x01\xb3":
        return decode_m1v(data)
    raise ValueError("mpeg1: neither a video ES nor a program stream")
