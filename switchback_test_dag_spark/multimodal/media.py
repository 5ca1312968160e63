"""Multimodal column plumbing: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas iterators via
``mapInPandas``.

The Spark-side architecture here is the real deliverable — schema contract,
partition-size control, Arrow batch shape, UDF iterator signature. Five
codec paths are REAL, pure-Python, and parse actual bytes with no fake flag:
AUDIO via ``wav.py`` (RIFF PCM16 chunk-walking codec), IMAGE via ``bmp.py``
(24/32-bit BI_RGB DIB codec — see ``decode_bmp_features``), ``png.py``
(chunk-walking stdlib-zlib PNG codec with all five scanline filters — see
``decode_png_features``), and ``jpeg.py`` (baseline sequential JFIF:
optimal-Huffman entropy codec, DCT, quantization — see
``decode_jpeg_features``; being lossy, its contract is coefficient-bit-exact
roundtrip plus byte-exact reference reconstruction, pytest-gated), and VIDEO
via ``avi.py`` (RIFF uncompressed-DIB AVI: real container walking, real
per-frame decode, real frame sampling — ``decode_avi_features`` /
``sample_avi_frames``). The GENERIC feature path (``decode_features`` /
``sample_frames``) dispatches on magic bytes to those real parsers — plus
``mpeg1.py`` (intra-only MPEG-1: elementary streams AND program streams
via a minimal PES demux) — no fake flags anywhere. Only motion-compensated
INTER prediction remains STUBBED (MPEG P/B pictures raise inside the
decoder; H.26x genuinely needs codec libraries this container lacks), so
ISO-BMFF/``ftyp`` containers and Annex-B elementary streams raise a loud
``NotImplementedError`` from the format detector; payloads with no known
magic raise ``ValueError`` (a data-quality signal, not a crash).

Scale notes:
- payloads ride in parquet binary columns; never ``collect()`` them;
- ``mapInPandas`` streams Arrow record batches — peak executor memory is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean payload
  size, so callers repartition by byte budget (``repartition_by_bytes``) before
  heavy decode stages;
- per-item outputs (frames, patches) are exploded AFTER the decode so the
  expensive pass stays one-row-in / few-rows-out inside a single task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Contract schema for a media table: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped table from any text source (fixture stand-in
    for real scraped payloads): payload = utf-8 bytes, metadata derived. These
    payloads carry NO media magic bytes, so the decode path rejects them with
    ``ValueError`` — the fixture for the unknown-format quality signal."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.pmod(F.xxhash64(text_col), F.lit(1920)).cast("int").alias("width"),
        F.pmod(F.xxhash64(text_col, F.lit(1)), F.lit(1080)).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def detect_media_format(raw: bytes) -> str:
    """Magic-bytes dispatch for the generic decode path: returns one of
    ``bmp | png | jpeg | wav | avi``. ISO-BMFF (``ftyp`` — MP4/MOV holding
    H.26x) and bare Annex-B elementary streams raise ``NotImplementedError``
    (the documented motion-compensated-video stub: decoding them genuinely
    needs codec libraries this container lacks); anything else raises
    ``ValueError`` — a per-payload data-quality signal callers may catch,
    never a crash from inside a parser."""
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if raw[:2] == b"BM":
        return "bmp"
    if raw[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "wav"
    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
        return "avi"
    if len(raw) >= 12 and raw[4:8] == b"ftyp":
        raise NotImplementedError(
            "ISO-BMFF (MP4/MOV) containers hold H.26x-class motion-compensated "
            "video; decoding requires codec libraries unavailable here"
        )
    if raw[:4] in (b"\x00\x00\x01\xb3", b"\x00\x00\x01\xba"):
        # MPEG-1 video ES / program stream: REAL decode path for I-pictures
        # and zero-motion P-pictures (multimodal/mpeg1.py); residual-coded
        # inter blocks, nonzero motion vectors and B pictures raise inside
        # the decoder — the remaining stub
        return "mpeg1"
    if raw[:4] == b"\x00\x00\x00\x01" or raw[:3] == b"\x00\x00\x01":
        raise NotImplementedError(
            "Annex-B elementary stream (H.26x-class); decoding requires codec "
            "libraries unavailable here"
        )
    raise ValueError("unrecognized media payload: no known magic bytes")


def _decode_image(raw: bytes, fmt: str):
    """fmt ∈ {bmp, png, jpeg} → (h, w, 3) uint8 RGB via the real parsers."""
    if fmt == "bmp":
        from switchback_test_dag_spark.multimodal.bmp import decode_bmp

        return decode_bmp(raw)
    if fmt == "png":
        from switchback_test_dag_spark.multimodal.png import decode_png

        return decode_png(raw)
    from switchback_test_dag_spark.multimodal.jpeg import decode_jpeg

    return decode_jpeg(raw)


def _pooled(values, dim: int) -> list[float]:
    """Fixed-dim descriptor from a variable-length [0, 1] sample array:
    contiguous-bucket mean pooling (the classic resize-to-thumbnail step),
    empty buckets → 0. Deterministic and order-preserving."""
    n = len(values)
    out = []
    for i in range(dim):
        a, b = (i * n) // dim, ((i + 1) * n) // dim
        out.append(float(values[a:b].mean()) if b > a else 0.0)
    return out


def _fuse_synth_decode(
    df: DataFrame, id_col: str, synth_run, decode_run, schema: StructType
) -> DataFrame:
    """ONE Python eval node for a synthesize→decode pair (guide §4): chaining
    the two public ``mapInPandas`` stages makes every payload byte cross the
    JVM↔Python boundary twice back-to-back — Arrow-serialized out of the
    synthesizer's worker, deserialized by the JVM, re-serialized into the
    decoder's worker — when the only columns the query ever reads JVM-side
    are the small decoded features. Composing the SAME batch closures inside
    a single worker keeps the bytes where they are born: input is the 8-byte
    id sliver, output is the feature rows, and the payload never exists
    JVM-side at all (measured on the suite: executor 'run' time per branch
    was 2–3× the raw single-core codec cost before fusion). The per-stage
    public functions share these closures, so the fused path cannot drift
    from them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from decode_run(
            m[["media_id", "payload"]] for m in synth_run(batches)
        )

    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, schema=schema
    )


def _dispatch_decode_run(dim: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from switchback_test_dag_spark.multimodal.avi import decode_avi_dib
        from switchback_test_dag_spark.multimodal.wav import decode_wav_any

        for pdf in batches:
            ids, nbs, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                fmt = detect_media_format(raw)
                if fmt in ("bmp", "png", "jpeg"):
                    vals = _decode_image(raw, fmt).astype(np.float64).ravel() / 255.0
                elif fmt == "wav":
                    # fmt-tag dispatch: PCM16 or IMA ADPCM (adpcm.py)
                    _rate, _ch, s = decode_wav_any(raw)
                    vals = (s.astype(np.float64) + 32768.0) / 65535.0
                elif fmt == "mpeg1":
                    from switchback_test_dag_spark.multimodal.mpeg1 import (
                        decode_mpeg1,
                    )

                    frames, _meta = decode_mpeg1(raw)
                    vals = frames.astype(np.float64).ravel() / 255.0
                else:  # avi
                    _fps, frames = decode_avi_dib(raw)
                    vals = frames.astype(np.float64).ravel() / 255.0
                ids.append(mid)
                nbs.append(len(raw))
                feats.append(_pooled(vals, dim))
            yield pd.DataFrame({"media_id": ids, "n_bytes": nbs, "feature": feats})

    return run


def decode_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Generic decode: payload → fixed-dim feature vector via ``mapInPandas``,
    dispatching on magic bytes to the REAL pure-Python codecs
    (:func:`detect_media_format`). Images (BMP/PNG/JPEG) pool normalized
    pixels, audio (WAV) pools normalized PCM16 samples, video (AVI and
    intra-only MPEG-1) pools normalized pixels across all frames — each via
    :func:`_pooled`, so one schema serves every modality. Unknown payloads
    raise ``ValueError`` per row (callers pre-filter or let the task fail
    loudly); H.26x-class video raises the documented
    ``NotImplementedError``."""
    return media.select("media_id", "payload").mapInPandas(
        _dispatch_decode_run(dim), schema=FEATURE_SCHEMA
    )


def synth_decode_mixed_features(
    df: DataFrame, id_col: str, dim: int = 16
) -> DataFrame:
    """Fused :func:`synthesize_mixed_media` → :func:`decode_features`
    (same closures, one Python eval node — see :func:`_fuse_synth_decode`)."""
    return _fuse_synth_decode(
        df, id_col, _mixed_synth_run(), _dispatch_decode_run(dim), FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 2, max_frames: int = 8) -> DataFrame:
    """Generic frame sampling via the same magic-bytes dispatch: video (AVI)
    emits every ``every_n``-th decoded frame's raw RGB (capped at
    ``max_frames``); still images emit their single decoded frame as index 0;
    audio raises ``ValueError`` (no frames to sample). Few-rows-out per input
    keeps the explode inside the decode task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from switchback_test_dag_spark.multimodal.avi import decode_avi_dib

        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                fmt = detect_media_format(raw)
                if fmt in ("avi", "mpeg1"):
                    if fmt == "avi":
                        _fps, frames = decode_avi_dib(raw)
                    else:
                        from switchback_test_dag_spark.multimodal.mpeg1 import (
                            decode_mpeg1,
                        )

                        frames, _meta = decode_mpeg1(raw)
                    taken = 0
                    for j in range(0, len(frames), every_n):
                        if taken >= max_frames:
                            break
                        ids.append(mid)
                        idxs.append(j)
                        blobs.append(frames[j].tobytes())
                        taken += 1
                elif fmt in ("bmp", "png", "jpeg"):
                    ids.append(mid)
                    idxs.append(0)
                    blobs.append(_decode_image(raw, fmt).tobytes())
                else:
                    raise ValueError(f"cannot sample frames from {fmt} audio")
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def repartition_by_bytes(
    media: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Right-size partitions for a decode stage by payload byte volume (row
    counts are meaningless when payloads span 1 KB–100 MB). One cheap agg
    estimates total bytes; the repartition keys on media_id for uniformity."""
    total = media.agg(
        F.sum(F.octet_length("payload")).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, int(total / target_partition_bytes))
    return media.repartition(n, "media_id")


def _mixed_synth_run():
    from switchback_test_dag_spark.multimodal.avi import encode_avi_dib
    from switchback_test_dag_spark.multimodal.bmp import encode_bmp24
    from switchback_test_dag_spark.multimodal.jpeg import encode_jpeg
    from switchback_test_dag_spark.multimodal.png import encode_png
    from switchback_test_dag_spark.multimodal.wav import encode_wav_pcm16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            kinds, payloads, mimes, ws, hs, durs = [], [], [], [], [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                fmt = mid % 5
                if fmt == 0:
                    w, h = 8 + mid % 9, 6 + mid % 5
                    payloads.append(encode_bmp24(_bmp_pixels(mid, w, h)))
                    kinds.append("image"), mimes.append("image/bmp")
                    ws.append(w), hs.append(h), durs.append(None)
                elif fmt == 1:
                    w, h = 5 + mid % 11, 5 + mid % 7
                    payloads.append(encode_png(_bmp_pixels(mid, w, h)))
                    kinds.append("image"), mimes.append("image/png")
                    ws.append(w), hs.append(h), durs.append(None)
                elif fmt == 2:
                    w, h = 8 + mid % 9, 8 + mid % 5
                    payloads.append(encode_jpeg(_bmp_pixels(mid, w, h), quality=90)[0])
                    kinds.append("image"), mimes.append("image/jpeg")
                    ws.append(w), hs.append(h), durs.append(None)
                elif fmt == 3:
                    i = np.arange(256, dtype=np.int64)
                    samples = ((mid * 31 + i * 17) % 65536 - 32768).astype("<i2")
                    payloads.append(encode_wav_pcm16(samples, 8000))
                    kinds.append("audio"), mimes.append("audio/wav")
                    ws.append(None), hs.append(None), durs.append(256 * 1000 // 8000)
                else:
                    frames = np.stack(
                        [_bmp_pixels(mid * 1009 + j, 8, 6) for j in range(6)]
                    )
                    payloads.append(encode_avi_dib(frames, fps=10))
                    kinds.append("video"), mimes.append("video/x-msvideo")
                    ws.append(8), hs.append(6), durs.append(600)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "payload": payloads,
                    "mime": mimes,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    return run


def synthesize_mixed_media(df: DataFrame, id_col: str) -> DataFrame:
    """One MEDIA_SCHEMA table spanning ALL FIVE real codecs — the dispatch
    fixture: format is ``id % 5`` (bmp, png, jpeg, wav, avi), every payload
    built by the corresponding real encoder over the closed-form test
    patterns used by the per-format synthesizers, with matching kind/mime
    metadata. Exercises :func:`detect_media_format` on every branch."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _mixed_synth_run(), schema=MEDIA_SCHEMA
    )


# --------------------------------------------------------------------------- #
# real video path (pure-Python uncompressed-DIB AVI codec — see avi.py)
# --------------------------------------------------------------------------- #

VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("fps", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sum_px", LongType(), False),
        StructField("frame0_wsum", LongType(), False),
    ]
)


def _avi_synth_run(n_frames: int, width: int, height: int):
    from switchback_test_dag_spark.multimodal.avi import encode_avi_dib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                frames = np.stack(
                    [
                        _bmp_pixels(int(mid) * 1009 + j, width, height)
                        for j in range(n_frames)
                    ]
                )
                payloads.append(encode_avi_dib(frames, fps=10))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "payload": payloads,
                    "mime": "video/x-msvideo",
                    "width": pd.array([width] * len(pdf), dtype="Int32"),
                    "height": pd.array([height] * len(pdf), dtype="Int32"),
                    "duration_ms": n_frames * 1000 // 10,
                }
            )

    return run


def synthesize_avi_videos(
    df: DataFrame, id_col: str, n_frames: int = 6, width: int = 8, height: int = 6
) -> DataFrame:
    """MEDIA_SCHEMA video rows with REAL AVI payloads: per id, ``n_frames``
    deterministic RGB frames (frame ``j`` uses the BMP test pattern seeded by
    ``id·1009 + j`` — closed-form for tests) through the uncompressed-DIB
    writer (``avi.py``)."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _avi_synth_run(n_frames, width, height), schema=MEDIA_SCHEMA
    )


def _avi_decode_run():
    from switchback_test_dag_spark.multimodal.avi import decode_avi_dib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            fpss, nfs, ws, hs, nbs, sums, w0 = [], [], [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                fps, frames = decode_avi_dib(raw)
                n, h, w, _ = frames.shape
                f0 = frames[0].astype(np.int64)
                weights = np.arange(1, h * w * 3 + 1, dtype=np.int64).reshape(
                    h, w, 3
                )
                fpss.append(fps)
                nfs.append(n)
                ws.append(w)
                hs.append(h)
                nbs.append(len(raw))
                sums.append(int(frames.astype(np.int64).sum()))
                w0.append(int((f0 * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fps": fpss,
                    "n_frames": nfs,
                    "width": ws,
                    "height": hs,
                    "n_bytes": nbs,
                    "sum_px": sums,
                    "frame0_wsum": w0,
                }
            )

    return run


def decode_avi_features(media: DataFrame) -> DataFrame:
    """Parse REAL AVI bytes → integer-exact video features: frame count, fps,
    geometry, container byte size (closed-form for uncompressed DIB:
    ``224 + n·(8 + stride·h)`` — oracle-replayable byte accounting), total
    pixel sum across all frames, and the first frame's position-weighted
    checksum (row/channel/stride bug detector, as in
    :func:`decode_bmp_features`). The working video codec path."""
    return media.select("media_id", "payload").mapInPandas(
        _avi_decode_run(), schema=VIDEO_FEATURE_SCHEMA
    )


def synth_decode_avi_features(
    df: DataFrame, id_col: str, n_frames: int = 6, width: int = 8, height: int = 6
) -> DataFrame:
    """Fused :func:`synthesize_avi_videos` → :func:`decode_avi_features`
    (same closures, one Python eval node — see :func:`_fuse_synth_decode`)."""
    return _fuse_synth_decode(
        df,
        id_col,
        _avi_synth_run(n_frames, width, height),
        _avi_decode_run(),
        VIDEO_FEATURE_SCHEMA,
    )


def synthesize_mjpeg_avi_videos(df: DataFrame, id_col: str, quality: int = 90) -> DataFrame:
    """MEDIA_SCHEMA video rows with REAL MJPEG-in-AVI payloads — compressed
    video through parts already on the shelf (baseline-JPEG encoder +
    RIFF/AVI writer, ``jpeg.py`` + ``avi.py``). Per id: ``2 + id % 3``
    frames of geometry ``(6 + id % 7) × (6 + id % 5)`` (closed-form for the
    oracle), frame ``j`` the BMP test pattern seeded by ``id·1009 + j``,
    each frame JPEG-encoded then boxed as a ``00dc`` chunk, fps 12."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _mjpg_synth_run(quality), schema=MEDIA_SCHEMA
    )


def _mjpg_synth_run(quality: int):
    from switchback_test_dag_spark.multimodal.avi import encode_avi_mjpg
    from switchback_test_dag_spark.multimodal.jpeg import encode_jpeg

    return _compressed_avi_synth_run(
        frame_encoder=lambda px: encode_jpeg(px, quality)[0],
        avi_encoder=encode_avi_mjpg,
        geom=lambda mid: (6 + mid % 7, 6 + mid % 5, 2 + mid % 3),
        seed_mult=1009,
        fps=12,
    )


def synthesize_mjpegb_avi_videos(df: DataFrame, id_col: str, quality: int = 90) -> DataFrame:
    """MEDIA_SCHEMA video rows with REAL Motion-JPEG-B payloads in AVI
    (fourcc ``mjpb``): QuickTime's marker-less MJPEG layout — offset-table
    frame headers, UNSTUFFED entropy scans (``mjpegb.py``, composing
    ``jpeg.py``'s DCT/Huffman machinery under the different byte layout).
    Per id: ``1 + id % 4`` frames of geometry ``(7 + id % 6) × (5 + id % 4)``
    (closed-form for the oracle, deliberately different formulas from the
    MJPG path so a branch swap breaks the hash), frame ``j`` seeded by
    ``id·2027 + j``, fps 10."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _mjpb_synth_run(quality), schema=MEDIA_SCHEMA
    )


def _mjpb_synth_run(quality: int):
    from switchback_test_dag_spark.multimodal.avi import encode_avi_mjpb
    from switchback_test_dag_spark.multimodal.mjpegb import encode_mjpegb

    return _compressed_avi_synth_run(
        frame_encoder=lambda px: encode_mjpegb(px, quality)[0],
        avi_encoder=encode_avi_mjpb,
        geom=lambda mid: (7 + mid % 6, 5 + mid % 4, 1 + mid % 4),
        seed_mult=2027,
        fps=10,
    )


def _compressed_avi_synth_run(
    frame_encoder, avi_encoder, geom, seed_mult: int, fps: int
):
    """Shared compressed-video synthesizer closure: per id,
    ``geom(mid) -> (w, h, n)`` frames of the BMP test pattern, each encoded
    by ``frame_encoder`` and boxed into an AVI by ``avi_encoder``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, ws, hs, durs = [], [], [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h, n = geom(mid)
                blobs = [
                    frame_encoder(_bmp_pixels(mid * seed_mult + j, w, h))
                    for j in range(n)
                ]
                payloads.append(avi_encoder(blobs, width=w, height=h, fps=fps))
                ws.append(w)
                hs.append(h)
                durs.append(n * 1000 // fps)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "payload": payloads,
                    "mime": "video/x-msvideo",
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "duration_ms": durs,
                }
            )

    return run


def synthesize_mpeg1_videos(df: DataFrame, id_col: str, qscale: int = 2) -> DataFrame:
    """MEDIA_SCHEMA video rows with REAL intra-only MPEG-1 payloads
    (``multimodal/mpeg1.py``: sequence/GOP/picture/slice headers, 4:2:0
    intra macroblocks, MPEG quantization + VLC/escape entropy coding over
    the shared DCT core). Per id: ``1 + id % 3`` frames of geometry
    ``2·(5 + id % 5) × 2·(4 + id % 3)`` (even dims — clean 4:2:0; formulas
    deliberately differ from the MJPG/MJPB paths so a dispatch swap breaks
    the hash), frame ``j`` the BMP test pattern seeded by ``id·3011 + j``,
    25 fps (picture_rate_code 3). EVEN ids additionally wrap the elementary
    stream in a minimal MPEG-1 PROGRAM STREAM (``mux_mpeg_ps``) so both the
    ES and the PS demux branches ride the suite hash."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _mpeg1_synth_run(qscale), schema=MEDIA_SCHEMA
    )


def _mpeg1_synth_run(qscale: int):
    from switchback_test_dag_spark.multimodal.mpeg1 import encode_m1v, mux_mpeg_ps

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, ws, hs, durs = [], [], [], []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w = 2 * (5 + mid % 5)
                h = 2 * (4 + mid % 3)
                n = 1 + mid % 3
                frames = np.stack(
                    [_bmp_pixels(mid * 3011 + j, w, h) for j in range(n)]
                )
                es = encode_m1v(frames, qscale=qscale)
                payloads.append(mux_mpeg_ps(es) if mid % 2 == 0 else es)
                ws.append(w)
                hs.append(h)
                durs.append(n * 1000 // 25)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "payload": payloads,
                    "mime": "video/mpeg",
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "duration_ms": durs,
                }
            )

    return run


def _mpeg1_decode_run():
    from switchback_test_dag_spark.multimodal.mpeg1 import decode_mpeg1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            fpss, nfs, ws, hs, nbs, sums, w0 = [], [], [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                frames, meta = decode_mpeg1(raw)
                n, h, w, _ = frames.shape
                f0 = frames[0].astype(np.int64)
                weights = np.arange(1, h * w * 3 + 1, dtype=np.int64).reshape(
                    h, w, 3
                )
                fpss.append(int(meta["fps"]))
                nfs.append(n)
                ws.append(w)
                hs.append(h)
                nbs.append(len(raw))
                sums.append(int(frames.astype(np.int64).sum()))
                w0.append(int((f0 * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fps": fpss,
                    "n_frames": nfs,
                    "width": ws,
                    "height": hs,
                    "n_bytes": nbs,
                    "sum_px": sums,
                    "frame0_wsum": w0,
                }
            )

    return run


def decode_mpeg1_features(media: DataFrame) -> DataFrame:
    """Parse REAL MPEG-1 bytes (video ES or program stream — the decoder
    dispatches on the start code, demuxing PES packets for PS) → the same
    video features as the AVI paths. Frame count, fps, and decoder-reported
    geometry are closed-form per id (oracle-replayable); byte size and
    reconstructed pixels are quantization-dependent and pytest-gated — the
    MJPG/MJPB policy."""
    return media.select("media_id", "payload").mapInPandas(
        _mpeg1_decode_run(), schema=VIDEO_FEATURE_SCHEMA
    )


def synth_decode_mpeg1_features(
    df: DataFrame, id_col: str, qscale: int = 2
) -> DataFrame:
    """Fused :func:`synthesize_mpeg1_videos` → :func:`decode_mpeg1_features`
    (same closures, one Python eval node — see :func:`_fuse_synth_decode`)."""
    return _fuse_synth_decode(
        df, id_col, _mpeg1_synth_run(qscale), _mpeg1_decode_run(),
        VIDEO_FEATURE_SCHEMA,
    )


def decode_mjpeg_avi_features(media: DataFrame) -> DataFrame:
    """Parse REAL MJPEG AVI bytes → video features through the full
    container walk + per-frame baseline-JPEG decode
    (``avi.decode_avi_mjpg``). Frame count, fps, and decoder-reported
    geometry are closed-form per id (oracle-replayable); ``n_bytes`` and the
    reconstructed pixel sums are entropy-/quantization-dependent and NOT
    SQL-replayable — their exactness contracts are pytest-gated, same policy
    as the still-JPEG path (``_media_jpeg_agg``)."""
    from switchback_test_dag_spark.multimodal.avi import decode_avi_mjpg

    return _decode_compressed_avi_features(media, decode_avi_mjpg)


def decode_mjpegb_avi_features(media: DataFrame) -> DataFrame:
    """Parse REAL Motion-JPEG-B AVI bytes → the same video features through
    the container walk + per-frame marker-less decode
    (``avi.decode_avi_mjpb`` → ``mjpegb.decode_mjpegb``: offset-table
    headers, unstuffed scans). Same oracle/pytest split as the MJPG path."""
    from switchback_test_dag_spark.multimodal.avi import decode_avi_mjpb

    return _decode_compressed_avi_features(media, decode_avi_mjpb)


def _decode_compressed_avi_features(media: DataFrame, avi_decoder) -> DataFrame:
    return media.select("media_id", "payload").mapInPandas(
        _compressed_video_decode_run(avi_decoder), schema=VIDEO_FEATURE_SCHEMA
    )


def synth_decode_mjpeg_avi_features(
    df: DataFrame, id_col: str, quality: int = 90
) -> DataFrame:
    """Fused :func:`synthesize_mjpeg_avi_videos` →
    :func:`decode_mjpeg_avi_features` (same closures, one Python eval node —
    see :func:`_fuse_synth_decode`)."""
    from switchback_test_dag_spark.multimodal.avi import decode_avi_mjpg

    return _fuse_synth_decode(
        df, id_col, _mjpg_synth_run(quality),
        _compressed_video_decode_run(decode_avi_mjpg), VIDEO_FEATURE_SCHEMA,
    )


def synth_decode_mjpegb_avi_features(
    df: DataFrame, id_col: str, quality: int = 90
) -> DataFrame:
    """Fused :func:`synthesize_mjpegb_avi_videos` →
    :func:`decode_mjpegb_avi_features` (same closures, one Python eval node —
    see :func:`_fuse_synth_decode`)."""
    from switchback_test_dag_spark.multimodal.avi import decode_avi_mjpb

    return _fuse_synth_decode(
        df, id_col, _mjpb_synth_run(quality),
        _compressed_video_decode_run(decode_avi_mjpb), VIDEO_FEATURE_SCHEMA,
    )


def _compressed_video_decode_run(avi_decoder):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            fpss, nfs, ws, hs, nbs, sums, w0 = [], [], [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                fps, frames = avi_decoder(raw)
                n, h, w, _ = frames.shape
                f0 = frames[0].astype(np.int64)
                weights = np.arange(1, h * w * 3 + 1, dtype=np.int64).reshape(
                    h, w, 3
                )
                fpss.append(fps)
                nfs.append(n)
                ws.append(w)
                hs.append(h)
                nbs.append(len(raw))
                sums.append(int(frames.astype(np.int64).sum()))
                w0.append(int((f0 * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fps": fpss,
                    "n_frames": nfs,
                    "width": ws,
                    "height": hs,
                    "n_bytes": nbs,
                    "sum_px": sums,
                    "frame0_wsum": w0,
                }
            )

    return run


def sample_avi_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling over AVI payloads (superseding the fake slicer in
    :func:`sample_frames` for this container): decode, keep every ``every_n``-th
    frame, emit FRAME_SCHEMA rows whose ``frame_bytes`` are the raw RGB of the
    sampled frame. One-row-in / few-rows-out inside the decode task — the
    explode happens after the expensive pass, per the module contract."""
    from switchback_test_dag_spark.multimodal.avi import decode_avi_dib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _fps, frames = decode_avi_dib(bytes(payload))
                for j in range(0, len(frames), every_n):
                    ids.append(mid)
                    idxs.append(j)
                    blobs.append(frames[j].tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": blobs}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


# --------------------------------------------------------------------------- #
# real audio path (pure-Python WAV codec — see wav.py)
# --------------------------------------------------------------------------- #

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sum_sq", LongType(), False),
        StructField("peak", IntegerType(), False),
    ]
)


def synthesize_wav_audio(
    df: DataFrame, id_col: str, n_samples: int = 256, sample_rate: int = 8000
) -> DataFrame:
    """MEDIA_SCHEMA audio rows with REAL WAV payloads: a deterministic int16
    waveform per id (``((id*31 + i*17) % 65536) - 32768``) encoded through the
    RIFF PCM16 writer. Deterministic by construction, so downstream decodes
    are oracle-checkable against the closed-form generator."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _wav_synth_run(n_samples, sample_rate), schema=MEDIA_SCHEMA
    )


def _wav_synth_run(n_samples: int, sample_rate: int):
    from switchback_test_dag_spark.multimodal.wav import encode_wav_pcm16

    duration_ms = n_samples * 1000 // sample_rate

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            payloads = [
                encode_wav_pcm16(
                    ((mid * 31 + i * 17) % 65536 - 32768).astype("<i2"),
                    sample_rate,
                )
                for mid in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "payload": payloads,
                    "mime": "audio/wav",
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                    "duration_ms": duration_ms,
                }
            )

    return run


# --------------------------------------------------------------------------- #
# real image path (pure-Python BMP codec — see bmp.py)
# --------------------------------------------------------------------------- #

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
        StructField("wsum", LongType(), False),
    ]
)


def _bmp_pixels(media_id: int, width: int, height: int):
    """Closed-form deterministic test pattern: channel k of pixel (r, c) is
    ``(id*7 + r*5 + c*3 + k*11) % 256`` — cheap for an oracle to replay and
    sensitive to any row-flip / channel-swap / stride decode bug."""
    import numpy as np

    r = np.arange(height, dtype=np.int64)[:, None, None]
    c = np.arange(width, dtype=np.int64)[None, :, None]
    k = np.arange(3, dtype=np.int64)[None, None, :]
    return ((media_id * 7 + r * 5 + c * 3 + k * 11) % 256).astype(np.uint8)


def synthesize_bmp_images(df: DataFrame, id_col: str) -> DataFrame:
    """MEDIA_SCHEMA image rows with REAL BMP payloads: per id, a
    ``(8 + id % 9) × (6 + id % 5)`` RGB test pattern encoded through the
    canonical 24-bit bottom-up writer (``bmp.py``). Varying dimensions make
    the row-stride padding and container-size arithmetic part of the
    contract, not a constant."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _bmp_synth_run(), schema=MEDIA_SCHEMA
    )


def _bmp_synth_run():
    from switchback_test_dag_spark.multimodal.bmp import encode_bmp24

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            widths = [int(8 + mid % 9) for mid in ids]
            heights = [int(6 + mid % 5) for mid in ids]
            payloads = [
                encode_bmp24(_bmp_pixels(int(mid), w, h))
                for mid, w, h in zip(ids, widths, heights)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/bmp",
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return run


def synthesize_png_images(df: DataFrame, id_col: str) -> DataFrame:
    """MEDIA_SCHEMA image rows with REAL PNG payloads: per id, a
    ``(5 + id % 11) × (5 + id % 7)`` RGB test pattern through the stdlib-zlib
    PNG writer (``png.py``). Heights are always ≥5, so every payload contains
    all five scanline filter types (the encoder cycles ``row % 5``) and the
    decoder's filter inversion is exercised by every single row of the
    fixture, not just a lucky subset."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _png_synth_run(), schema=MEDIA_SCHEMA
    )


def _png_synth_run():
    from switchback_test_dag_spark.multimodal.png import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            widths = [int(5 + mid % 11) for mid in ids]
            heights = [int(5 + mid % 7) for mid in ids]
            payloads = [
                encode_png(_bmp_pixels(int(mid), w, h))
                for mid, w, h in zip(ids, widths, heights)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/png",
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return run


def _image_decode_run(decoder):
    """Shared image-feature closure for the BMP/PNG/JPEG decoders — the
    three bodies were line-identical except for the parser entry point."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ws, hs, nb, srs, sgs, sbs, wsums = [], [], [], [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                arr = decoder(raw).astype(np.int64)
                h, w, _ = arr.shape
                weights = np.arange(1, h * w * 3 + 1, dtype=np.int64).reshape(
                    h, w, 3
                )
                ws.append(w)
                hs.append(h)
                nb.append(len(raw))
                srs.append(int(arr[:, :, 0].sum()))
                sgs.append(int(arr[:, :, 1].sum()))
                sbs.append(int(arr[:, :, 2].sum()))
                wsums.append(int((arr * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "n_bytes": nb,
                    "sum_r": srs,
                    "sum_g": sgs,
                    "sum_b": sbs,
                    "wsum": wsums,
                }
            )

    return run


def decode_png_features(media: DataFrame) -> DataFrame:
    """Parse REAL PNG bytes → the same integer-exact image features as
    :func:`decode_bmp_features` (dimensions, payload size, channel sums,
    position-weighted checksum), via the chunk-walking zlib codec
    (``png.py``). The working entropy-coded image path."""
    from switchback_test_dag_spark.multimodal.png import decode_png

    return media.select("media_id", "payload").mapInPandas(
        _image_decode_run(decode_png), schema=IMAGE_FEATURE_SCHEMA
    )


def synth_decode_png_features(df: DataFrame, id_col: str) -> DataFrame:
    """Fused :func:`synthesize_png_images` → :func:`decode_png_features`
    (same closures, one Python eval node — see :func:`_fuse_synth_decode`)."""
    from switchback_test_dag_spark.multimodal.png import decode_png

    return _fuse_synth_decode(
        df, id_col, _png_synth_run(), _image_decode_run(decode_png),
        IMAGE_FEATURE_SCHEMA,
    )


def synthesize_jpeg_images(df: DataFrame, id_col: str, quality: int = 90) -> DataFrame:
    """MEDIA_SCHEMA image rows with REAL baseline JPEG payloads: per id, a
    ``(8 + id % 9) × (8 + id % 5)`` RGB test pattern through the optimal-
    Huffman baseline encoder (``jpeg.py``). Dimensions are chosen so most
    images need edge padding to the 8×8 MCU grid (width 8–16, height 8–12),
    making pad-and-crop part of the exercised path."""
    return df.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        _jpeg_synth_run(quality), schema=MEDIA_SCHEMA
    )


def _jpeg_synth_run(quality: int):
    from switchback_test_dag_spark.multimodal.jpeg import encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            widths = [int(8 + mid % 9) for mid in ids]
            heights = [int(8 + mid % 5) for mid in ids]
            payloads = [
                encode_jpeg(_bmp_pixels(int(mid), w, h), quality=quality)[0]
                for mid, w, h in zip(ids, widths, heights)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/jpeg",
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
                }
            )

    return run


def decode_jpeg_features(media: DataFrame) -> DataFrame:
    """Parse REAL baseline JPEG bytes → the same image-feature columns as
    :func:`decode_bmp_features`, via the full entropy-decode + dequantize +
    IDCT path (``jpeg.py``). JPEG being lossy, the features describe the
    RECONSTRUCTED pixels — deterministic given the payload, but not the
    closed-form source pattern, so the value contract lives in pytest
    (coefficient-bit-exact roundtrip; byte-exact equality with the encoder's
    reference reconstruction; quality-bounded error vs the source)."""
    from switchback_test_dag_spark.multimodal.jpeg import decode_jpeg

    return media.select("media_id", "payload").mapInPandas(
        _image_decode_run(decode_jpeg), schema=IMAGE_FEATURE_SCHEMA
    )


def synth_decode_jpeg_features(
    df: DataFrame, id_col: str, quality: int = 90
) -> DataFrame:
    """Fused :func:`synthesize_jpeg_images` → :func:`decode_jpeg_features`
    (same closures, one Python eval node — see :func:`_fuse_synth_decode`)."""
    from switchback_test_dag_spark.multimodal.jpeg import decode_jpeg

    return _fuse_synth_decode(
        df, id_col, _jpeg_synth_run(quality), _image_decode_run(decode_jpeg),
        IMAGE_FEATURE_SCHEMA,
    )


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """Parse REAL BMP bytes → integer-exact image features per payload:
    decoded dimensions, payload size, per-channel pixel sums, and a
    position-weighted checksum ``wsum = Σ v·((r·w + c)·3 + k + 1)`` that
    changes under any row-order, channel-order, or stride mistake. All
    outputs are exact integers, so downstream aggregates are
    order-independent. The working uncompressed image codec path."""
    from switchback_test_dag_spark.multimodal.bmp import decode_bmp

    return media.select("media_id", "payload").mapInPandas(
        _image_decode_run(decode_bmp), schema=IMAGE_FEATURE_SCHEMA
    )


def synth_decode_bmp_features(df: DataFrame, id_col: str) -> DataFrame:
    """Fused :func:`synthesize_bmp_images` → :func:`decode_bmp_features`
    (same closures, one Python eval node — see :func:`_fuse_synth_decode`)."""
    from switchback_test_dag_spark.multimodal.bmp import decode_bmp

    return _fuse_synth_decode(
        df, id_col, _bmp_synth_run(), _image_decode_run(decode_bmp),
        IMAGE_FEATURE_SCHEMA,
    )


def _wav_decode_run():
    from switchback_test_dag_spark.multimodal.wav import decode_wav_pcm16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rates, counts, sums, peaks = [], [], [], []
            for payload in pdf["payload"]:
                rate, _ch, samples = decode_wav_pcm16(bytes(payload))
                s = samples.astype(np.int64)
                rates.append(rate)
                counts.append(len(s))
                sums.append(int(np.dot(s, s)))
                peaks.append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "sum_sq": sums,
                    "peak": peaks,
                }
            )

    return run


def decode_wav_features(media: DataFrame) -> DataFrame:
    """Parse REAL WAV bytes → integer-exact audio features per payload:
    sample count (from the data chunk), rate (from fmt), energy ``sum_sq``
    and ``peak`` as exact integers so any downstream aggregate is
    order-independent (no float-sum parity hazards). The working audio
    codec path of the multimodal component."""
    return media.select("media_id", "payload").mapInPandas(
        _wav_decode_run(), schema=AUDIO_FEATURE_SCHEMA
    )


def synth_decode_wav_features(
    df: DataFrame, id_col: str, n_samples: int = 256, sample_rate: int = 8000
) -> DataFrame:
    """Fused :func:`synthesize_wav_audio` → :func:`decode_wav_features`
    (same closures, one Python eval node — see :func:`_fuse_synth_decode`)."""
    return _fuse_synth_decode(
        df, id_col, _wav_synth_run(n_samples, sample_rate), _wav_decode_run(),
        AUDIO_FEATURE_SCHEMA,
    )
