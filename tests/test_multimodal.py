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
    # The codec seam must stay LOUD: strict mode refuses every media
    # type while no real codec exists, and the message names the type
    # so a silent fake can never masquerade as a real decode.
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


def test_resize_media_uniform_payloads(spark, sf_dir):
    from themis_tritonsort_spark.operators.multimodal import resize_media

    media = media_from_documents(table(spark, sf_dir, "documents")).limit(20)
    out = resize_media(media, target_bytes=128).collect()
    assert len(out) == 20
    for r in out:
        assert len(bytes(r["media"])) == 128
        assert r["meta"]["n_bytes"] == 128
        assert r["meta"]["source"] == "documents"
