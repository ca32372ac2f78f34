"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

This container has no image/audio codecs, so the DECODE step is a
deliberate seam: ``decode_media`` dispatches to a real decoder when one
is importable and otherwise to a deterministic fake (or raises, if
``strict``).  Everything around that seam — the schema convention, the
partition-friendly batching, the UDF signatures and output shapes — is
real, tested Spark plumbing that a real decoder drops into.

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
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "id long, media binary, media_type string, "
    "meta struct<n_bytes: long, source: string>"
)

FEATURE_SCHEMA = f"id long, media_type string, feature array<float>, n_bytes long"


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
    """Deterministic stand-in for a codec: FEATURE_DIM floats derived
    from the payload digest.  Replace with a real decoder + model when
    the codec libraries exist in the runtime."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def _real_decode_available() -> bool:
    try:  # pragma: no cover - codec libs absent in this container
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_media(payload: bytes, media_type: str, strict: bool = False) -> list[float]:
    """The decode seam.  strict=True surfaces the missing-codec case
    explicitly instead of silently faking."""
    if _real_decode_available():  # pragma: no cover
        raise NotImplementedError(
            "real codec path: plug PIL/librosa decode + model here"
        )
    if strict:
        raise NotImplementedError(
            f"no codec available for {media_type} in this runtime"
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


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Video-frame-sampling stand-in: emits one row per sampled offset
    per payload (a real implementation samples frames; the plumbing —
    one-to-many mapInPandas with offset metadata — is identical).
    Output: (id, offset long, chunk_hash string)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, hashes = [], [], []
            for i, m in zip(pdf["id"], pdf["media"]):
                payload = bytes(m)
                for off in range(0, max(len(payload), 1), every_n_bytes):
                    chunk = payload[off : off + every_n_bytes]
                    ids.append(i)
                    offs.append(off)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({"id": ids, "offset": offs, "chunk_hash": hashes})

    return media.mapInPandas(fn, schema="id long, offset long, chunk_hash string")


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Image-resize stand-in: one-to-one payload transform to a fixed
    target size (a real implementation decodes, resamples, re-encodes;
    the plumbing — payload-in/payload-out mapInPandas preserving the
    media schema, meta updated to the new size — is identical).

    Truncates or zero-pads each payload to ``target_bytes`` so output
    sizes are uniform, like a thumbnail pipeline's fixed resolution.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes(m)[:target_bytes].ljust(target_bytes, b"\0")
                for m in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media": resized,
                    "media_type": pdf["media_type"],
                    "meta": [
                        {"n_bytes": target_bytes, "source": m["source"]}
                        for m in pdf["meta"]
                    ],
                }
            )

    return media.mapInPandas(fn, schema=MEDIA_SCHEMA)
