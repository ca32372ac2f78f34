"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The DECODE step is REAL for the common formats: pure-python decoders
for PPM (P6), BMP (24-bit uncompressed), PNG (8-bit gray/RGB/RGBA,
all five scanline filters, via stdlib zlib), baseline JPEG (full
T.81 sequential decode — see operators/jpeg.py) and WAV (PCM via
stdlib wave), with PIL preferred for any image type when it is
importable.  Video: concatenated-P6 streams AND true MJPEG
(concatenated baseline JPEGs, marker-exact walk) are walked and
decoded per-frame (frame_sample).  Payloads no decoder can handle
fall back to a deterministic hash stand-in (or raise, if ``strict``)
— the seam is still explicit, but it only covers
genuinely-unsupported codecs (progressive JPEG, MP3, real MP4
containers), not the whole decode path.

Schema convention for a media table:
    id          long        -- join key back to the source row
    media       binary      -- opaque payload
    media_type  string      -- 'image/png', 'audio/wav', ...
    meta        struct<n_bytes long, source string>

At 100 TB scale: payloads stay in executor memory one Arrow batch at a
time (mapInPandas is a streaming iterator — nothing accumulates), and
feature extraction emits small fixed-width vectors, so the shuffle
after extraction carries features, never payloads.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "id long, media binary, media_type string, "
    "meta struct<n_bytes: long, source: string>"
)

FEATURE_SCHEMA = f"id long, media_type string, feature array<float>, n_bytes long"


def spread_decode_input(df: DataFrame, floor: int = 16) -> DataFrame:
    """Spread a NARROW input for Python-side decode without throttling a
    wide one.  At gate scale the documents parquet is a single split, so
    a mapInPandas decode serializes on one task; repartitioning up to
    ``min(floor, defaultParallelism)`` fixes that.  But the cap must
    never apply DOWNWARD: a 100x input already carrying hundreds of
    splits keeps its partitioning untouched (no shuffle at all), so the
    decode parallelism scales with the data instead of being pinned at
    ``floor`` tasks.  The floor defaults to 16 because the chained
    mapInPandas pair spawns TWO Python workers per task and cold worker
    spawn (~0.2 s each, measured after idle reaping between bench
    passes) dominates small inputs long before 32 partitions pay off.
    """
    current = df.rdd.getNumPartitions()
    target = min(floor, df.sparkSession.sparkContext.defaultParallelism)
    if current >= target:
        return df
    return df.repartition(target)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Deterministic demo media table: each document's text bytes stand
    in for an opaque payload (the plumbing doesn't care what the bytes
    mean — that's the point)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
        F.struct(
            F.length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.lit("documents").alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for payloads NO available decoder can
    handle (e.g. progressive JPEG or MP3 without the libraries):
    FEATURE_DIM floats derived from the payload digest."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


# ---------------------------------------------------------------------------
# Real decoders.  Pure-python implementations of the simple container
# formats; PIL is preferred for images when importable (it covers
# JPEG/GIF/WebP too).  Each returns None if the payload is not its
# format — dispatch sniffs magic bytes, never trusts media_type alone.
# ---------------------------------------------------------------------------


def _parse_ppm_header(
    payload: bytes, base: int = 0
) -> tuple[int, int, int, int] | None:
    """Parse a P6 header at offset ``base``: (w, h, maxval,
    data_start) or None.  '#' comments allowed between tokens."""
    if payload[base : base + 2] != b"P6":
        return None
    pos, fields = base + 2, []
    try:
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            if pos == start:
                return None
            fields.append(int(payload[start:pos]))
    except ValueError:
        return None
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 255:
        return None
    return w, h, maxval, pos


def _decode_ppm(payload: bytes) -> np.ndarray | None:
    """Binary PPM (P6, maxval 255) -> HxWx3 uint8 array."""
    hdr = _parse_ppm_header(payload)
    if hdr is None:
        return None
    w, h, maxval, pos = hdr
    if maxval != 255:
        return None
    data = payload[pos : pos + w * h * 3]
    if len(data) != w * h * 3:
        return None
    return np.frombuffer(data, np.uint8).reshape(h, w, 3)


def walk_ppm_stream(payload: bytes) -> list[tuple[int, int]] | None:
    """Walk a concatenated-P6 video container: back-to-back binary PPM
    frames, each self-describing (header gives w*h*3, so the next
    frame's offset is exact).  Returns [(offset, length), ...] or None
    if the payload is not a well-formed P6 stream."""
    frames, pos = [], 0
    while pos < len(payload):
        hdr = _parse_ppm_header(payload, pos)
        if hdr is None:
            return None
        w, h, maxval, data_start = hdr
        end = data_start + w * h * 3
        if maxval != 255 or end > len(payload):
            return None
        frames.append((pos, end - pos))
        pos = end
    return frames or None


def _jpeg_frame_end(payload: bytes, pos: int) -> int | None:
    """End offset (exclusive) of the baseline JPEG starting at ``pos``
    (which must point at SOI).  Marker-aware: length-prefixed segments
    are skipped structurally, and inside entropy-coded scan data 0xFF
    is only ever followed by 0x00 (byte stuffing), RSTn, or a real
    marker — so the EOI found this way is the frame's, never a pixel
    byte that happens to spell FFD9 inside a length-prefixed segment."""
    n = len(payload)
    p = pos + 2  # past SOI
    while p + 2 <= n:
        if payload[p] != 0xFF:
            return None
        marker = payload[p + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2): any number of
            p += 1  # 0xFF may pad before a marker
            continue
        if marker == 0xD9:  # EOI with no scan — degenerate but well-formed
            return p + 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: bare
            p += 2
            continue
        if p + 4 > n:
            return None
        seg_len = int.from_bytes(payload[p + 2 : p + 4], "big")
        if seg_len < 2:
            return None
        if marker == 0xDA:  # SOS: entropy-coded data follows the header
            p = p + 2 + seg_len
            while p < n:
                if payload[p] != 0xFF:
                    p += 1
                    continue
                if p + 1 >= n:
                    return None
                m2 = payload[p + 1]
                if m2 == 0x00 or 0xD0 <= m2 <= 0xD7:  # stuffing / restart
                    p += 2
                    continue
                if m2 == 0xFF:  # fill byte before a marker
                    p += 1
                    continue
                if m2 == 0xD9:
                    return p + 2
                return None  # multi-scan or garbage: not baseline MJPEG
            return None
        p = p + 2 + seg_len
    return None


def walk_mjpeg_stream(payload: bytes) -> list[tuple[int, int]] | None:
    """Walk a concatenated baseline-JPEG (MJPEG) container: back-to-back
    SOI..EOI frames, each self-delimiting via marker structure.
    Returns [(offset, length), ...] or None if the payload is not a
    well-formed baseline MJPEG stream."""
    frames, pos, n = [], 0, len(payload)
    while pos < n:
        if payload[pos : pos + 2] != b"\xff\xd8":
            return None
        end = _jpeg_frame_end(payload, pos)
        if end is None:
            return None
        frames.append((pos, end - pos))
        pos = end
    return frames or None


def _decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> HxWx3 uint8."""
    if len(payload) < 54 or not payload.startswith(b"BM"):
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flipped = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    if len(payload) < data_off + stride * h:
        return None
    rows = np.frombuffer(
        payload[data_off : data_off + stride * h], np.uint8
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flipped else img


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4) -> (h, stride) uint8."""
    out = np.zeros((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw[pos + 1 : pos + 1 + stride], np.uint8).astype(
            np.uint16
        )
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            row = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((int(a) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        out[y] = row
        prev = row
    return out.astype(np.uint8)


def _decode_png(payload: bytes) -> np.ndarray | None:
    """8-bit non-interlaced PNG (gray / gray+alpha / RGB / RGBA) ->
    HxWx3 uint8.  Pure python + stdlib zlib; per-scanline filter undo
    is O(pixels) python for filters 1/3/4 — fine for the Arrow-batch
    sizes this runs on, and PIL takes over when present."""
    sig = b"\x89PNG\r\n\x1a\n"
    if not payload.startswith(sig):
        return None
    pos = len(sig)
    meta, idat = None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                return None
            if color not in (0, 2, 4, 6):
                return None
            meta = (w, h, color)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if meta is None or not idat:
        return None
    w, h, color = meta
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        return None
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if color == 6:
        return px[:, :, :3].copy()
    return px


def _decode_wav(payload: bytes) -> np.ndarray | None:
    """PCM WAV -> mono float samples in [-1, 1] (stdlib wave)."""
    import wave

    if not payload.startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except Exception:
        return None
    if width == 1:
        x = np.frombuffer(frames, np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, "<i4").astype(np.float64) / 2147483648.0
    else:
        return None
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return x


def _pil_decode(payload: bytes) -> np.ndarray | None:
    """PIL path: any format PIL recognizes -> HxWx3 uint8."""
    try:
        import PIL.Image
    except Exception:
        return None
    try:  # pragma: no cover - PIL absent in this container
        with PIL.Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:  # pragma: no cover
        return None


def decode_image(payload: bytes) -> np.ndarray | None:
    """Decode an image payload to HxWx3 uint8, or None if no available
    decoder handles it.  PIL first (fastest when installed), then the
    pure-python PNG/BMP/PPM/baseline-JPEG decoders by magic bytes."""
    from .jpeg import decode_jpeg

    arr = _pil_decode(payload)
    if arr is not None:
        return arr
    for dec in (_decode_png, _decode_bmp, _decode_ppm, decode_jpeg):
        arr = dec(payload)
        if arr is not None:
            return arr
    return None


def _grid_bounds(n: int, parts: int) -> list[tuple[int, int]]:
    """Split ``n`` samples into ``parts`` contiguous ranges with the
    (i*n)//parts boundary rule; degenerate ranges clamp to one sample
    so every cell sees data when n < parts."""
    bounds = []
    for i in range(parts):
        lo, hi = (i * n) // parts, ((i + 1) * n) // parts
        if hi <= lo:
            lo, hi = min(lo, n - 1), min(lo, n - 1) + 1
        bounds.append((lo, hi))
    return bounds


def image_block_sums(payload: bytes) -> list[int] | None:
    """EXACT integer decode check: 4x4 grid of per-block sums of the
    pixel gray-sum (r+g+b).  Pure integer math end-to-end, so any
    engine that can reproduce the pixel bytes reproduces these 16
    numbers bit-for-bit — the oracle surface for the decode path."""
    arr = decode_image(payload)
    if arr is None:
        return None
    s = arr.astype(np.int64).sum(axis=2)  # HxW gray-sum in 0..765
    h, w = s.shape
    return [
        int(s[y0:y1, x0:x1].sum())
        for (y0, y1) in _grid_bounds(h, 4)
        for (x0, x1) in _grid_bounds(w, 4)
    ]


def _image_features(arr: np.ndarray) -> list[float]:
    """4x4 block-mean brightness grid in [0, 1] — the decode-real
    feature vector (FEATURE_DIM = 16)."""
    gray = arr.astype(np.float64).mean(axis=2) / 255.0
    h, w = gray.shape
    return [
        float(gray[y0:y1, x0:x1].mean())
        for (y0, y1) in _grid_bounds(h, 4)
        for (x0, x1) in _grid_bounds(w, 4)
    ]


def _audio_features(samples: np.ndarray) -> list[float]:
    """RMS energy over FEATURE_DIM contiguous windows, in [0, 1]."""
    if len(samples) == 0:
        return [0.0] * FEATURE_DIM
    return [
        float(np.sqrt(np.mean(samples[lo:hi] ** 2)))
        for (lo, hi) in _grid_bounds(len(samples), FEATURE_DIM)
    ]


def decode_media(payload: bytes, media_type: str, strict: bool = False) -> list[float]:
    """Decode a payload to a FEATURE_DIM feature vector.

    Images (any format an available decoder handles — PIL when
    installed, pure-python PPM/BMP/PNG always): 4x4 block-mean
    brightness.  PCM WAV audio: windowed RMS energy.  Anything else —
    or a payload that fails to decode — falls back to the
    deterministic hash stand-in, or raises when ``strict``."""
    mt = media_type.lower()
    if mt.startswith("image/"):
        arr = decode_image(payload)
        if arr is not None:
            return _image_features(arr)
    elif mt.startswith("audio/"):
        samples = _decode_wav(payload)
        if samples is not None:
            return _audio_features(samples)
    if strict:
        raise NotImplementedError(
            f"no codec available for {media_type} payload "
            "(or the payload failed to decode) in this runtime"
        )
    return _fake_decode(payload)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over a media table.

    Streams Arrow batches through the (stubbed) decoder; output is
    (id, media_type, feature array<float>, n_bytes) — fixed-width rows
    that are cheap to shuffle/join downstream.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(bytes(m), t)
                for m, t in zip(pdf["media"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "n_bytes": [len(bytes(m)) for m in pdf["media"]],
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "id long, frame_idx long, offset long, gray_sum long, chunk_hash string"
)


def frame_sample(
    media: DataFrame, every_n_bytes: int = 1024, frame_step: int = 1
) -> DataFrame:
    """Video frame sampling over containers the engine can REALLY
    walk: a payload of back-to-back P6 PPM frames OR back-to-back
    baseline JPEGs (true MJPEG, via the shipped T.81 decoder —
    operators/jpeg.py) is split at exact frame boundaries, every
    ``frame_step``-th frame is DECODED, and each sampled frame emits
    (id, frame_idx, offset, gray_sum, chunk_hash) — gray_sum is the
    exact integer sum of the frame's decoded pixel bytes (the
    image_block_sums oracle discipline), chunk_hash the frame-bytes
    md5.  Payloads that are neither (unknown codecs in this container)
    keep the byte-stride fallback: one row per ``every_n_bytes`` chunk
    with gray_sum NULL — same plumbing, honest about not decoding.
    Progressive JPEG lands HERE, not on the NULL-gray_sum path: the
    walk itself refuses multi-scan streams (_jpeg_frame_end returns
    None past the first SOS), so a progressive payload takes the
    byte-stride fallback.  A frame that IS walkable but whose flavor
    the decoder doesn't support (e.g. arithmetic-coded or an
    unsupported component count) emits its row with gray_sum NULL:
    the WALK is structural (marker-exact), the decode is best-effort.

    One-to-many mapInPandas: frames never leave the executor; only
    fixed-width sample rows shuffle."""
    from .jpeg import decode_jpeg

    if frame_step <= 0:
        raise ValueError(f"frame_step must be positive, got {frame_step}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidxs, offs, sums, hashes = [], [], [], [], []
            for i, m in zip(pdf["id"], pdf["media"]):
                payload = bytes(m)
                decode = _decode_ppm
                frames = walk_ppm_stream(payload)
                if frames is None:
                    frames = walk_mjpeg_stream(payload)
                    decode = decode_jpeg
                if frames is not None:
                    for fi in range(0, len(frames), frame_step):
                        off, length = frames[fi]
                        fb = payload[off : off + length]
                        arr = decode(fb)
                        ids.append(i)
                        fidxs.append(fi)
                        offs.append(off)
                        sums.append(
                            None
                            if arr is None
                            else int(arr.astype(np.int64).sum())
                        )
                        hashes.append(hashlib.md5(fb).hexdigest())
                else:
                    for ci, off in enumerate(
                        range(0, max(len(payload), 1), every_n_bytes)
                    ):
                        chunk = payload[off : off + every_n_bytes]
                        ids.append(i)
                        fidxs.append(ci)
                        offs.append(off)
                        sums.append(None)
                        hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": fidxs,
                    "offset": offs,
                    "gray_sum": pd.array(sums, dtype="Int64"),
                    "chunk_hash": hashes,
                }
            )

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)


def ppm_video_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    height: int = 6,
    frames: int = 4,
) -> DataFrame:
    """Deterministic REAL video table: each document becomes a
    concatenated-P6 stream of ``frames`` frames; frame f's pixel bytes
    are the first w*h*3 bytes of md5(text || '-f' || f || '-' || i)
    digests, i = 0,1,2,...  Every byte is engine-reproducible, so a
    SQL oracle re-derives the exact per-frame pixel sums AND frame
    offsets (header is fixed-width by construction) — the frame
    WALKER and per-frame decode become oracle-checkable end-to-end
    (see q125)."""
    n_bytes = width * height * 3
    n_digests = (n_bytes + 15) // 16

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                parts = []
                for f in range(frames):
                    data = b"".join(
                        hashlib.md5(f"{text}-f{f}-{i}".encode()).digest()
                        for i in range(n_digests)
                    )[:n_bytes]
                    arr = np.frombuffer(data, np.uint8).reshape(
                        height, width, 3
                    )
                    parts.append(encode_ppm(arr))
                payloads.append(b"".join(parts))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "media": payloads,
                    "media_type": ["video/x-ppm-stream"] * len(pdf),
                    "meta": [
                        {"n_bytes": len(p), "source": "documents"}
                        for p in payloads
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def mjpeg_video_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 16,
    height: int = 16,
    frames: int = 4,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    flat: bool = False,
) -> DataFrame:
    """Deterministic REAL MJPEG table: each document becomes a
    concatenated baseline-JPEG stream of ``frames`` frames, pixel
    bytes derived from md5(text || '-f' || f || '-' || i) digests
    exactly like ppm_video_from_documents, then encoded with the
    shipped T.81 encoder (operators/jpeg.py — Annex K tables, optional
    chroma subsampling and restart markers).  The encode is lossy, so
    a SQL oracle cannot re-derive decoded sums for noise frames —
    parity is pinned by the unit tests instead (frame walk offsets ARE
    byte-exact and decode(frame) == decode_jpeg(frame) integer sums).

    ``flat=True`` makes every frame a CONSTANT gray image at the EVEN
    value ``v_f = 2 * (first md5(text || '-f' || f) byte % 128)``.
    A constant block's DCT has only a DC term (AC rounds to exact 0),
    and with the Annex K luma DC quant of 16 an even level shift
    ``v - 128`` quantizes and reconstructs without loss, so
    decode(encode(frame)) == frame bit-for-bit (property-verified for
    all even v x subsample x restart combinations in
    tests/test_multimodal.py).  Decoded gray_sum is then the closed
    form ``width * height * 3 * v_f`` — SQL-derivable, which makes the
    MJPEG walk + T.81 decode DRIVER-GATEABLE end-to-end (q125b).  Odd
    values sit on the round-half quantization boundary where the
    float DCT's ulps decide the outcome — not engine-reproducible,
    hence the even restriction."""
    from .jpeg import encode_jpeg

    n_bytes = width * height * 3
    n_digests = (n_bytes + 15) // 16

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # flat frames take only 128 distinct byte strings (the frame
        # depends on nothing but its even gray value), so encode each
        # value once per task instead of once per frame — generation
        # cost stays O(documents), not O(frames x encode)
        flat_cache: dict[int, bytes] = {}

        def flat_frame(v: int) -> bytes:
            fb = flat_cache.get(v)
            if fb is None:
                arr = np.full((height, width, 3), v, np.uint8)
                fb = encode_jpeg(
                    arr,
                    subsample=subsample,
                    restart_interval=restart_interval,
                )
                flat_cache[v] = fb
            return fb

        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                parts = []
                for f in range(frames):
                    if flat:
                        v = 2 * (
                            hashlib.md5(f"{text}-f{f}".encode()).digest()[0]
                            % 128
                        )
                        parts.append(flat_frame(v))
                        continue
                    data = b"".join(
                        hashlib.md5(f"{text}-f{f}-{i}".encode()).digest()
                        for i in range(n_digests)
                    )[:n_bytes]
                    arr = np.frombuffer(data, np.uint8).reshape(
                        height, width, 3
                    )
                    parts.append(
                        encode_jpeg(
                            arr,
                            subsample=subsample,
                            restart_interval=restart_interval,
                        )
                    )
                payloads.append(b"".join(parts))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "media": payloads,
                    "media_type": ["video/x-motion-jpeg"] * len(pdf),
                    "meta": [
                        {"n_bytes": len(p), "source": "documents"}
                        for p in payloads
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> binary PPM (P6) bytes."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_image(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample to (target_h, target_w, 3)."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return arr[ys][:, xs]


def resize_media(
    media: DataFrame,
    target_bytes: int = 256,
    target_w: int = 8,
    target_h: int = 8,
) -> DataFrame:
    """Thumbnail pipeline: decode each image payload, nearest-neighbor
    resample to a fixed (target_w, target_h) resolution, re-encode as
    PPM — the output payloads are uniform real images.  Payloads no
    decoder handles keep the byte-normalize stand-in (truncate/pad to
    ``target_bytes``) so mixed-media tables still come out
    fixed-width.  meta.n_bytes always reflects the NEW payload.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_media, out_type, out_meta = [], [], []
            for m, t, meta in zip(pdf["media"], pdf["media_type"], pdf["meta"]):
                payload = bytes(m)
                arr = (
                    decode_image(payload)
                    if str(t).lower().startswith("image/")
                    else None
                )
                if arr is not None:
                    resized = encode_ppm(resize_image(arr, target_w, target_h))
                    out_media.append(resized)
                    out_type.append("image/x-portable-pixmap")
                else:
                    out_media.append(
                        payload[:target_bytes].ljust(target_bytes, b"\0")
                    )
                    out_type.append(t)
                out_meta.append(
                    {"n_bytes": len(out_media[-1]), "source": meta["source"]}
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media": out_media,
                    "media_type": out_type,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)


def ppm_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    height: int = 6,
) -> DataFrame:
    """Deterministic REAL image table: each document becomes a
    width x height PPM whose pixel bytes are the first w*h*3 bytes of
    md5(text || '-' || i) digests, i = 0,1,2,...  Every byte is
    engine-reproducible (md5 of a utf-8 string), so a SQL oracle can
    re-derive the exact pixels — which makes the DECODER itself
    oracle-checkable end-to-end (see q78)."""
    n_bytes = width * height * 3
    n_digests = (n_bytes + 15) // 16

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                data = b"".join(
                    hashlib.md5(f"{text}-{i}".encode()).digest()
                    for i in range(n_digests)
                )[:n_bytes]
                arr = np.frombuffer(data, np.uint8).reshape(height, width, 3)
                payloads.append(encode_ppm(arr))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "media": payloads,
                    "media_type": ["image/x-portable-pixmap"] * len(pdf),
                    "meta": [
                        {"n_bytes": len(p), "source": "documents"}
                        for p in payloads
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def wav_from_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_samples: int = 256,
    sample_rate: int = 8000,
) -> DataFrame:
    """Deterministic REAL audio table: each document becomes a mono
    16-bit PCM WAV of ``n_samples`` samples; sample i is the
    little-endian int16 built from bytes (2i, 2i+1) of the
    md5(text || '-a' || k) digest stream, k = 0,1,2,...  The container
    is written through stdlib ``wave`` (real RIFF/fmt/data chunks), so
    the decoder's container walk is exercised, and every sample byte
    is engine-reproducible — a SQL oracle re-derives the exact int16
    stream, which makes the AUDIO decode driver-gateable end-to-end
    (see q78b; PCM is lossless, so unlike JPEG no constant-input trick
    is needed)."""
    import wave

    n_bytes = 2 * n_samples
    n_digests = (n_bytes + 15) // 16

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[text_col]:
                data = b"".join(
                    hashlib.md5(f"{text}-a{i}".encode()).digest()
                    for i in range(n_digests)
                )[:n_bytes]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(sample_rate)
                    wf.writeframes(data)
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "media": payloads,
                    "media_type": ["audio/wav"] * len(pdf),
                    "meta": [
                        {"n_bytes": len(p), "source": "documents"}
                        for p in payloads
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def audio_sample_stats(media: DataFrame) -> DataFrame:
    """Decode every 16-bit PCM WAV payload (stdlib ``wave`` container
    parse) and emit exact-integer sample statistics per clip:
    (id, n_samples, abs_sum, sq_sum).  Samples stay the RAW int16
    stream — no float normalization anywhere, so the sums are
    engine-exact int64 (256 samples x 32768^2 is ~2.7e11, far inside
    int64).  Multi-channel or non-16-bit payloads and non-WAV bytes
    are dropped (count upstream if needed); the float feature path for
    analytics lives in media_features."""
    import wave

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, asums, sqsums = [], [], [], []
            for i, m in zip(pdf["id"], pdf["media"]):
                payload = bytes(m)
                if not payload.startswith(b"RIFF"):
                    continue
                try:
                    with wave.open(io.BytesIO(payload), "rb") as wf:
                        if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
                            continue
                        frames = wf.readframes(wf.getnframes())
                except Exception:  # noqa: BLE001 — malformed container
                    continue
                x = np.frombuffer(frames, "<i2").astype(np.int64)
                ids.append(i)
                ns.append(len(x))
                asums.append(int(np.abs(x).sum()))
                sqsums.append(int((x * x).sum()))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_samples": ns,
                    "abs_sum": asums,
                    "sq_sum": sqsums,
                }
            )

    return media.mapInPandas(
        fn, schema="id long, n_samples long, abs_sum long, sq_sum long"
    )


def media_block_sums(media: DataFrame) -> DataFrame:
    """Decode every image payload and emit the exact-integer 4x4
    block-sum grid as rows: (id, block_idx, gray_sum).  The decode
    runs on executors one Arrow batch at a time; undecodable payloads
    are dropped (count them upstream if needed)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for i, m in zip(pdf["id"], pdf["media"]):
                blocks = image_block_sums(bytes(m))
                if blocks is None:
                    continue
                for j, v in enumerate(blocks):
                    ids.append(i)
                    idxs.append(j)
                    sums.append(v)
            yield pd.DataFrame(
                {"id": ids, "block_idx": idxs, "gray_sum": sums}
            )

    return media.mapInPandas(
        fn, schema="id long, block_idx long, gray_sum long"
    )
