"""IMA ADPCM in WAV (format tag 0x0011) — the compressed-AUDIO codec path,
the audio analog of the MJPEG/MPEG video arc: real 4-bit adaptive
differential PCM inside the same RIFF container the PCM path walks.

IMA (DVI) ADPCM is the public-spec 4:1 audio compressor (IMA Digital Audio
Focus and Technical Working Groups, "Recommended Practices for Enhancing
Digital Audio Compatibility", 1992; also MS WAVE format tag 0x0011): each
4-bit nibble encodes a quantized difference against a running predictor,
with the quantizer step adapting through the 89-entry step-size table. A
WAV block starts with a 4-byte state header (int16 predictor, uint8 step
index, reserved byte) so every block decodes independently — the property
that makes the format seekable and, here, lets a decoder start mid-stream.

Encode/decode are exact mirrors of the same state machine, so the roundtrip
is self-validating: decode(encode(x)) tracks x within the quantizer's error
envelope (pytest pins an SNR bound on speech-shaped signals, exact state
equality per block header, and stdlib-independence — the stdlib has no
ADPCM codec, which is rather the point). Mono only: the multimodal fixtures
are mono, and stereo interleave-by-nibble-groups adds bookkeeping without
exercising any new math.

Scale shape: both directions are numpy state loops over one block at a time
inside Arrow-batched ``mapInPandas`` (media.py's discipline) — payload
bytes never leave the executor.

Reference scope parity: the reference repo has no media pipeline; this
module belongs to the driver-mandated multimodal extension
(``multimodal/media.py``), routed by ``wav.decode_wav_any``.
"""

from __future__ import annotations

import struct

import numpy as np

# the 89-entry IMA step-size table (public spec)
_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
# index adjustment per nibble magnitude 0..7 (sign bit has no index effect)
_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)

_TAG_IMA_ADPCM = 0x0011


def _encode_nibble(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One 4-bit IMA step: quantize (sample - pred) against step[index];
    returns (nibble, new_pred, new_index). The reconstruction inside is the
    DECODER's exact arithmetic, so predictor state never diverges."""
    step = int(_STEPS[index])
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    pred = _reconstruct(nibble, pred, step)
    index = int(min(88, max(0, index + _INDEX_ADJ[nibble & 7])))
    return nibble, pred, index


def _reconstruct(nibble: int, pred: int, step: int) -> int:
    """Shared inverse-quantizer: diff = step·(mantissa/4 + 1/8), computed in
    the spec's shift form so encoder and decoder agree bit-for-bit."""
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    if nibble & 8:
        diff = -diff
    return int(min(32767, max(-32768, pred + diff)))


def encode_wav_ima_adpcm(
    samples: np.ndarray, sample_rate: int, samples_per_block: int = 505
) -> bytes:
    """int16 mono samples → IMA-ADPCM WAV bytes (format tag 0x0011).

    Block layout per the WAVE spec: a 4-byte header carrying the block's
    initial predictor (= the first sample, stored verbatim) and step index,
    then ``(samples_per_block - 1) / 2`` data bytes of 4-bit nibbles,
    low nibble first. The default 505 samples/block gives the canonical
    256-byte block. The fmt chunk is the 20-byte extended form
    (cbSize=2 + wSamplesPerBlock) plus the ``fact`` chunk compressed
    formats require."""
    x = np.asarray(samples, dtype=np.int64)
    if samples_per_block % 2 != 1:
        raise ValueError("samples_per_block must be odd (header sample + pairs)")
    block_align = 4 + (samples_per_block - 1) // 2
    blocks = bytearray()
    index = 0
    for start in range(0, len(x), samples_per_block):
        chunk = x[start:start + samples_per_block]
        pred = int(chunk[0])
        # seed the index with the best step for the block's first delta so
        # adaptation doesn't restart cold each block (encoder's choice —
        # any index is spec-legal because it is stored in the header)
        if len(chunk) > 1:
            d0 = abs(int(chunk[1]) - pred)
            index = int(np.searchsorted(_STEPS, max(d0, 7)))
            index = min(88, index)
        blocks += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in chunk[1:]:
            nib, pred, index = _encode_nibble(int(s), pred, index)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)  # short tail block: pad nibble
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            blocks += bytes([lo | (hi << 4)])
    data = bytes(blocks)
    byte_rate = (sample_rate * block_align + samples_per_block - 1) // samples_per_block
    header = struct.pack(
        "<4sI4s",
        b"RIFF",
        4 + (8 + 20) + (8 + 4) + (8 + len(data)),
        b"WAVE",
    )
    fmt = struct.pack(
        "<4sIHHIIHHHH",
        b"fmt ",
        20,
        _TAG_IMA_ADPCM,
        1,  # mono
        sample_rate,
        byte_rate,
        block_align,
        4,  # bits per (compressed) sample
        2,  # cbSize
        samples_per_block,
    )
    fact = struct.pack("<4sII", b"fact", 4, len(x))
    return header + fmt + fact + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav_ima_adpcm(payload: bytes) -> tuple[int, np.ndarray]:
    """IMA-ADPCM WAV bytes → (sample_rate, int16 mono samples). Walks the
    RIFF chunks like the PCM decoder (unknown chunks skipped, word
    alignment honored), validates the 0x0011 format tag, then decodes each
    independent block from its own state header; the ``fact`` chunk's
    sample count trims the final block's pad nibble."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    sample_rate = spb = None
    n_samples = None
    data = None
    while pos + 8 <= len(payload):
        name, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        body = payload[pos:pos + size]
        if name == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, ch, sample_rate, _br, block_align, _bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag != _TAG_IMA_ADPCM:
                raise ValueError(f"not IMA ADPCM: format tag 0x{tag:04X}")
            if ch != 1:
                raise ValueError("only mono IMA ADPCM is implemented")
            spb = (
                struct.unpack_from("<H", body, 18)[0]
                if size >= 20
                else (block_align - 4) * 2 + 1
            )
        elif name == b"fact":
            n_samples = struct.unpack_from("<I", body, 0)[0]
        elif name == b"data":
            data = body
        pos += size + (size & 1)
    if sample_rate is None or data is None or spb is None:
        raise ValueError("missing fmt or data chunk")
    block_align = 4 + (spb - 1) // 2
    out: list[int] = []
    for start in range(0, len(data), block_align):
        block = data[start:start + block_align]
        if len(block) < 4:
            raise ValueError("truncated ADPCM block header")
        pred, index, _rsv = struct.unpack_from("<hBB", block, 0)
        if index > 88:
            raise ValueError(f"ADPCM step index {index} out of range")
        out.append(pred)
        pred, index = int(pred), int(index)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = int(_STEPS[index])
                pred = _reconstruct(nib, pred, step)
                index = int(min(88, max(0, index + _INDEX_ADJ[nib & 7])))
                out.append(pred)
    arr = np.asarray(out, dtype=np.int16)
    if n_samples is not None:
        arr = arr[:n_samples]  # drop block-tail pad nibbles
    return sample_rate, arr
