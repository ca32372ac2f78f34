"""Multimodal plumbing tests: schema, batching, determinism, seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_tritonsort_spark.data import table
from themis_tritonsort_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    frame_sample,
    media_from_documents,
)


def test_media_table_schema(spark, sf_dir):
    media = media_from_documents(table(spark, sf_dir, "documents"))
    assert [f.name for f in media.schema.fields] == ["id", "media", "media_type", "meta"]
    row = media.first()
    assert row["meta"]["n_bytes"] == len(bytes(row["media"]))


def test_extract_features_shape_and_determinism(spark, sf_dir):
    media = media_from_documents(table(spark, sf_dir, "documents")).limit(50)
    a = {r["id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v)


@pytest.mark.parametrize(
    "media_type",
    [
        "image/png",
        "image/jpeg",
        "audio/wav",
        "audio/mpeg",
        "video/mp4",
        "application/octet-stream",
    ],
)
def test_decode_strict_raises_for_every_media_type(media_type):
    # The codec seam must stay LOUD: b"abc" is decodable as NO format,
    # so strict mode refuses it for every media type, and the message
    # names the type so a silent fake can never masquerade as a real
    # decode.  (Real payloads go strict-green — see the real-decoder
    # tests below.)
    with pytest.raises(NotImplementedError, match=media_type.replace("/", "/")):
        decode_media(b"abc", media_type, strict=True)
    # ... while the documented fallback (the deterministic fake) keeps
    # the pipeline green for the same payload and type.
    feats = decode_media(b"abc", media_type, strict=False)
    assert len(feats) == FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in feats)


def test_frame_sample_offsets(spark, sf_dir):
    media = media_from_documents(table(spark, sf_dir, "documents")).limit(10)
    out = frame_sample(media, every_n_bytes=100).collect()
    by_id: dict = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["offset"])
    sizes = {
        r["id"]: r["meta"]["n_bytes"] for r in media.select("id", "meta").collect()
    }
    for i, offs in by_id.items():
        assert sorted(offs) == list(range(0, max(sizes[i], 1), 100))


def test_jpeg_roundtrip_and_strict_mode():
    """Baseline JPEG decode is REAL without PIL: our encoder's output
    round-trips through decode_image within quantization error, and
    strict-mode decode_media succeeds on a JPEG payload."""
    import numpy as np

    from themis_tritonsort_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from themis_tritonsort_spark.operators.multimodal import decode_image

    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            (xx + yy) * 255 // (w + h - 2),
        ],
        axis=2,
    ).astype(np.uint8)
    payload = encode_jpeg(img)
    assert payload.startswith(b"\xff\xd8") and payload.endswith(b"\xff\xd9")

    arr = decode_image(payload)  # dispatches to decode_jpeg (no PIL)
    assert arr is not None and arr.shape == (h, w, 3)
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 12

    # grayscale single-component scan
    g = (yy * 255 // (h - 1)).astype(np.uint8)
    ag = decode_jpeg(encode_jpeg(g))
    assert ag.shape == (h, w, 3)
    assert np.abs(ag[:, :, 0].astype(int) - g.astype(int)).max() <= 12

    # strict mode accepts a real JPEG payload (the last strict-mode
    # hole in PIL-less containers), still refuses junk
    feats = decode_media(payload, "image/jpeg", strict=True)
    assert len(feats) == FEATURE_DIM
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8junk", "image/jpeg", strict=True)

    # decoder is format-sniffing: rejects non-JPEG bytes
    assert decode_jpeg(b"\x89PNGxxxx") is None


@pytest.mark.parametrize("subsample", [(2, 1), (1, 2), (2, 2)])
@pytest.mark.parametrize("restart_interval", [0, 3])
def test_jpeg_subsampling_and_restart_paths(subsample, restart_interval):
    """The decoder's chroma-subsampled MCU assembly and RSTn restart
    resync paths, exercised via the encoder's 4:2:2/4:2:0 + DRI
    options on odd (non-multiple-of-16) dimensions."""
    import numpy as np

    from themis_tritonsort_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    h, w = 29, 45
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            xx * 255 // (w - 1),
            yy * 255 // (h - 1),
            (xx + yy) * 255 // (w + h - 2),
        ],
        axis=2,
    ).astype(np.uint8)
    payload = encode_jpeg(
        img, subsample=subsample, restart_interval=restart_interval
    )
    arr = decode_jpeg(payload)
    assert arr is not None and arr.shape == (h, w, 3)
    # smooth gradient: subsampled chroma stays within quantization +
    # downsample error
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 20


def test_frame_sample_decodes_ppm_stream(spark, sf_dir):
    """A concatenated-P6 video payload is walked at REAL frame
    boundaries and each sampled frame is decoded: gray_sum equals the
    exact integer pixel sum recomputed from the fixture's md5-derived
    bytes, and offsets follow the fixed frame length."""
    import hashlib

    from themis_tritonsort_spark.operators.multimodal import (
        ppm_video_from_documents,
    )

    docs = table(spark, sf_dir, "documents").limit(5)
    media = ppm_video_from_documents(docs, width=8, height=6, frames=4)
    out = frame_sample(media, frame_step=2).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    # header "P6\n8 6\n255\n" = 11 bytes + 144 data bytes per frame
    frame_len = 11 + 8 * 6 * 3
    assert len(out) == 5 * 2  # frames 0 and 2 of 4, per doc
    for r in out:
        assert r["offset"] == r["frame_idx"] * frame_len
        data = b"".join(
            hashlib.md5(
                f"{texts[r['id']]}-f{r['frame_idx']}-{i}".encode()
            ).digest()
            for i in range(9)
        )[:144]
        assert r["gray_sum"] == sum(data)
        assert r["chunk_hash"] is not None


def test_frame_sample_fallback_keeps_null_gray(spark, sf_dir):
    media = media_from_documents(table(spark, sf_dir, "documents")).limit(3)
    rows = frame_sample(media, every_n_bytes=100).collect()
    assert rows and all(r["gray_sum"] is None for r in rows)


def test_walk_mjpeg_stream_marker_exact():
    """The MJPEG walk must find exact SOI..EOI boundaries — including
    with restart markers in the scan — and reject non-JPEG bytes."""
    import numpy as np

    from themis_tritonsort_spark.operators.jpeg import encode_jpeg
    from themis_tritonsort_spark.operators.multimodal import (
        walk_mjpeg_stream,
    )

    rng = np.random.RandomState(7)
    frames = [
        encode_jpeg(rng.randint(0, 256, (16, 16, 3), dtype=np.uint8).astype(np.uint8),
                    restart_interval=ri)
        for ri in (0, 1, 2)
    ]
    payload = b"".join(frames)
    walked = walk_mjpeg_stream(payload)
    assert walked is not None and len(walked) == 3
    pos = 0
    for (off, length), fb in zip(walked, frames):
        assert off == pos and length == len(fb)
        assert payload[off : off + length] == fb
        pos += length
    assert walk_mjpeg_stream(b"not a jpeg") is None
    assert walk_mjpeg_stream(payload + b"\x00garbage") is None


def test_walk_mjpeg_stream_rejects_malformed():
    """Truncation anywhere (mid-segment, mid-scan, missing EOI) must
    fail the WHOLE walk — a partial frame list would silently drop
    tail frames instead of falling back to the honest byte-stride."""
    import numpy as np

    from themis_tritonsort_spark.operators.jpeg import encode_jpeg
    from themis_tritonsort_spark.operators.multimodal import (
        walk_mjpeg_stream,
    )

    rng = np.random.RandomState(11)
    frame = encode_jpeg(rng.randint(0, 256, (8, 8, 3), dtype=np.uint8).astype(np.uint8))
    assert walk_mjpeg_stream(frame) == [(0, len(frame))]
    # missing EOI (chop the last two bytes)
    assert walk_mjpeg_stream(frame[:-2]) is None
    # truncated mid-header-segment
    assert walk_mjpeg_stream(frame[:6]) is None
    # two good frames then a truncated third
    assert walk_mjpeg_stream(frame + frame + frame[: len(frame) // 2]) is None
    # grayscale frames walk too
    gray = encode_jpeg(
        rng.randint(0, 256, (8, 8), dtype=np.uint8).astype(np.uint8)
    )
    assert walk_mjpeg_stream(gray + gray) == [
        (0, len(gray)),
        (len(gray), len(gray)),
    ]
    # T.81 B.1.1.2 fill bytes: extra 0xFF padding before a header
    # marker and before EOI is legal (libjpeg emits it) and must not
    # derail the walk or the frame lengths
    filled = (
        frame[:2] + b"\xff" + frame[2:-2] + b"\xff\xff" + frame[-2:]
    )
    assert walk_mjpeg_stream(filled + frame) == [
        (0, len(filled)),
        (len(filled), len(frame)),
    ]


def test_flat_jpeg_roundtrip_exact_for_all_even_grays():
    """The q125b oracle contract: a CONSTANT gray frame at any EVEN
    value decodes back bit-for-bit under every encoder mode (the DCT
    is DC-only and the even level shift divides the Annex K DC quant
    exactly), so gray_sum == w*h*3*v is a closed form.  Exhaustive
    over all 128 even values x {4:4:4, 4:2:0+restart, 4:2:2}."""
    import numpy as np

    from themis_tritonsort_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for v in range(0, 256, 2):
        img = np.full((16, 16, 3), v, np.uint8)
        for sub, ri in [((1, 1), 0), ((2, 2), 2), ((2, 1), 1)]:
            arr = decode_jpeg(
                encode_jpeg(img, subsample=sub, restart_interval=ri)
            )
            assert arr is not None and (arr == v).all(), (v, sub, ri)


def test_audio_sample_stats_exact_int16_recovery(spark, sf_dir):
    """The q78b contract: wav_from_documents writes a real RIFF
    container (stdlib wave) whose int16 PCM stream is the md5 digest
    bytes verbatim, and audio_sample_stats recovers the RAW samples —
    abs_sum/sq_sum must equal the digest-derived integers exactly.
    Non-WAV and multi-channel payloads are dropped, not guessed."""
    import hashlib
    import io as _io
    import wave as _wave

    import numpy as np

    from themis_tritonsort_spark.operators.multimodal import (
        audio_sample_stats,
        wav_from_documents,
    )

    # materialize ONE deterministic 5-doc set: limit() without an
    # order can pick different rows per evaluation, and this fixture
    # is evaluated twice (the wav pipeline and the expected-texts map)
    picked = (
        table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(5)
        .select("doc_id", "text")
        .collect()
    )
    docs = spark.createDataFrame(picked, "doc_id long, text string")
    media = wav_from_documents(docs, n_samples=256)
    rows = {r["doc_id"]: r for r in audio_sample_stats(media).select(
        F.col("id").alias("doc_id"), "n_samples", "abs_sum", "sq_sum"
    ).collect()}
    texts = {r["doc_id"]: r["text"] for r in picked}
    assert len(rows) == 5
    for doc_id, text in texts.items():
        data = b"".join(
            hashlib.md5(f"{text}-a{i}".encode()).digest() for i in range(32)
        )[: 2 * 256]
        x = np.frombuffer(data, "<i2").astype(np.int64)
        r = rows[doc_id]
        assert r["n_samples"] == 256
        assert r["abs_sum"] == int(np.abs(x).sum())
        assert r["sq_sum"] == int((x * x).sum())

    # stereo and non-WAV payloads are dropped
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x01\x02" * 8)
    bad = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "audio/wav", (0, "x")),
         (2, bytearray(b"not a riff"), "audio/wav", (0, "x"))],
        "id long, media binary, media_type string, "
        "meta struct<n_bytes: long, source: string>",
    )
    assert audio_sample_stats(bad).count() == 0


def test_frame_sample_decodes_mjpeg_stream(spark, sf_dir):
    """A concatenated baseline-JPEG payload is walked at REAL frame
    boundaries and each sampled frame's gray_sum equals decode_jpeg's
    integer pixel sum on the same bytes (the decode is lossy, so the
    pin is the decoder itself, not the pre-encode fixture bytes)."""
    import hashlib

    import numpy as np

    from themis_tritonsort_spark.operators.jpeg import decode_jpeg
    from themis_tritonsort_spark.operators.multimodal import (
        mjpeg_video_from_documents,
        walk_mjpeg_stream,
    )

    docs = table(spark, sf_dir, "documents").limit(4)
    media = mjpeg_video_from_documents(
        docs, width=16, height=16, frames=4, subsample=(2, 2),
        restart_interval=2,
    )
    out = frame_sample(media, frame_step=2).collect()
    assert len(out) == 4 * 2  # frames 0 and 2 of 4, per doc
    payloads = {r["id"]: bytes(r["media"]) for r in media.collect()}
    for r in out:
        frames = walk_mjpeg_stream(payloads[r["id"]])
        off, length = frames[r["frame_idx"]]
        assert r["offset"] == off
        fb = payloads[r["id"]][off : off + length]
        assert r["chunk_hash"] == hashlib.md5(fb).hexdigest()
        arr = decode_jpeg(fb)
        assert arr is not None and arr.shape == (16, 16, 3)
        assert r["gray_sum"] == int(arr.astype(np.int64).sum())


def test_resize_media_uniform_payloads(spark, sf_dir):
    from themis_tritonsort_spark.operators.multimodal import resize_media

    media = media_from_documents(table(spark, sf_dir, "documents")).limit(20)
    out = resize_media(media, target_bytes=128).collect()
    assert len(out) == 20
    for r in out:
        assert len(bytes(r["media"])) == 128
        assert r["meta"]["n_bytes"] == 128
        assert r["meta"]["source"] == "documents"


# ---------------------------------------------------------------------------
# Real-decoder tests: the decode path is no longer a stand-in for
# PPM/BMP/PNG/WAV — these pin pixel-exact decoding for each format.
# ---------------------------------------------------------------------------

import io
import struct
import wave
import zlib

import numpy as np

from themis_tritonsort_spark.operators.multimodal import (
    _decode_bmp,
    _decode_png,
    _decode_ppm,
    _decode_wav,
    decode_image,
    encode_ppm,
    image_block_sums,
    media_block_sums,
    ppm_from_documents,
    resize_image,
    resize_media,
)


def _rand_img(h=6, w=8, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _encode_bmp(arr):
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][:, ::-1].tobytes()  # BGR
        rows += row + b"\0" * (stride - len(row))
    return (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
        + rows
    )


def _encode_png(arr, filters=(0,)):
    """Reference PNG encoder exercising any scanline filter type."""
    h, w = arr.shape[:2]
    bpp = 3
    raw = b""
    prev = bytes(w * bpp)
    for y in range(h):
        row = arr[y].tobytes()
        f = filters[y % len(filters)]
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            enc = bytes(
                (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(len(row))
            )
        elif f == 2:  # Up
            enc = bytes((row[x] - prev[x]) & 0xFF for x in range(len(row)))
        elif f == 3:  # Average
            enc = bytes(
                (row[x] - (((row[x - bpp] if x >= bpp else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(len(row))
            )
        else:  # 4: Paeth
            def paeth(a, b, c):
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

            enc = bytes(
                (
                    row[x]
                    - paeth(
                        row[x - bpp] if x >= bpp else 0,
                        prev[x],
                        prev[x - bpp] if x >= bpp else 0,
                    )
                )
                & 0xFF
                for x in range(len(row))
            )
        raw += bytes([f]) + enc
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _encode_wav(samples_i16, nch=1, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples_i16, dtype="<i2").tobytes())
    return buf.getvalue()


def test_ppm_roundtrip_pixel_exact():
    arr = _rand_img()
    assert np.array_equal(_decode_ppm(encode_ppm(arr)), arr)
    # comments and flexible whitespace in the header
    with_comment = b"P6\n# thumb\n8 6\n255\n" + arr.tobytes()
    assert np.array_equal(_decode_ppm(with_comment), arr)


def test_bmp_decode_pixel_exact():
    arr = _rand_img(5, 7, seed=3)  # odd width exercises row padding
    assert np.array_equal(_decode_bmp(_encode_bmp(arr)), arr)


@pytest.mark.parametrize("filters", [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
def test_png_decode_all_filters_pixel_exact(filters):
    arr = _rand_img(6, 5, seed=11)
    assert np.array_equal(_decode_png(_encode_png(arr, filters)), arr)


def test_png_gray_and_rgba():
    arr = _rand_img(4, 4, seed=5)
    # gray (color type 0): one channel replicated to RGB on decode
    gray = arr[:, :, :1]
    raw = b"".join(b"\0" + gray[y].tobytes() for y in range(4))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = _decode_png(png)
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))


def test_wav_decode_mono_and_stereo():
    mono = _encode_wav([0, 16384, -16384, 32767])
    x = _decode_wav(mono)
    assert np.allclose(x, [0, 0.5, -0.5, 32767 / 32768])
    stereo = _encode_wav([100, 200, 300, 400], nch=2)
    y = _decode_wav(stereo)
    assert np.allclose(y, [150 / 32768, 350 / 32768])


def test_decode_media_strict_green_on_real_payloads():
    arr = _rand_img()
    for payload, mt in [
        (encode_ppm(arr), "image/x-portable-pixmap"),
        (_encode_png(arr, (4,)), "image/png"),
        (_encode_bmp(arr), "image/bmp"),
        (_encode_wav([0, 1000, -1000]), "audio/wav"),
    ]:
        feats = decode_media(payload, mt, strict=True)  # must NOT raise
        assert len(feats) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in feats)
    # identical pixels through different containers -> identical features
    assert decode_media(encode_ppm(arr), "image/x-portable-pixmap", strict=True) == \
        decode_media(_encode_png(arr), "image/png", strict=True)


def test_image_block_sums_exact_total():
    arr = _rand_img(6, 8)
    blocks = image_block_sums(encode_ppm(arr))
    assert len(blocks) == 16
    assert sum(blocks) == int(arr.astype(int).sum())


def test_decode_image_sniffs_format_not_media_type():
    arr = _rand_img()
    assert np.array_equal(decode_image(_encode_png(arr)), arr)
    assert decode_image(b"not an image") is None


def test_resize_media_real_image_path(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(10)
    media = ppm_from_documents(docs)
    out = resize_media(media, target_w=4, target_h=4).collect()
    assert len(out) == 10
    for r in out:
        assert r["media_type"] == "image/x-portable-pixmap"
        arr = _decode_ppm(bytes(r["media"]))
        assert arr is not None and arr.shape == (4, 4, 3)
        assert r["meta"]["n_bytes"] == len(bytes(r["media"]))


def test_resize_image_nearest_neighbor_semantics():
    arr = _rand_img(8, 8)
    out = resize_image(arr, 4, 4)
    # nearest-neighbor with (i*n)//target mapping picks rows/cols 0,2,4,6
    assert np.array_equal(out, arr[::2, ::2])


def test_media_block_sums_matches_local_decoder(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(8)
    media = ppm_from_documents(docs)
    rows = media_block_sums(media).collect()
    local = {
        r["id"]: image_block_sums(bytes(r["media"]))
        for r in media.collect()
    }
    got: dict = {}
    for r in rows:
        got.setdefault(r["id"], [0] * 16)[r["block_idx"]] = r["gray_sum"]
    assert got == local


def _encode_png_ct(arr2d_channels, color_type):
    """Minimal PNG encoder for arbitrary color type (filter 0 rows)."""
    h, w, ch = arr2d_channels.shape
    raw = b"".join(b"\0" + arr2d_channels[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_rgba_drops_alpha():
    rgba = _rand_img(4, 5, seed=9)
    alpha = np.full((4, 5, 1), 128, np.uint8)
    png = _encode_png_ct(np.concatenate([rgba, alpha], axis=2), color_type=6)
    assert np.array_equal(_decode_png(png), rgba)


def test_png_gray_alpha_keeps_gray():
    gray = _rand_img(3, 4, seed=13)[:, :, :1]
    alpha = np.full((3, 4, 1), 200, np.uint8)
    png = _encode_png_ct(np.concatenate([gray, alpha], axis=2), color_type=4)
    assert np.array_equal(_decode_png(png), np.repeat(gray, 3, axis=2))


def test_spread_decode_input_only_repartitions_up(spark):
    from themis_tritonsort_spark.operators.multimodal import spread_decode_input

    dp = spark.sparkContext.defaultParallelism
    floor = min(16, dp)
    narrow = spark.range(100).coalesce(1)
    assert spread_decode_input(narrow).rdd.getNumPartitions() == floor
    # a wide input (the 100x-scale shape) must pass through untouched —
    # no shuffle, no downward throttle to the floor
    wide = spark.range(100).repartition(floor + 8)
    spread = spread_decode_input(wide)
    assert spread is wide
    # exactly at the floor: also untouched
    at_floor = spark.range(100).repartition(floor)
    assert spread_decode_input(at_floor) is at_floor
