"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernels are
STUBS — a deterministic fake decoder (md5-derived pseudo-features) with
the real Spark-side plumbing: schema, Arrow batch shape, ``mapInPandas``
signatures and partitioning are exactly what a real libvips/ffmpeg
kernel would plug into.  Swap ``_fake_decode`` for the real codec and
nothing else changes.

Scale notes: payloads stay in Arrow record batches end-to-end (no
per-row Python); decode is a map-only pass — no shuffle; feature rows
are narrow so the downstream exchange is cheap.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id bigint, kind string, payload binary, width int, height int, duration_ms int"

FEATURES_SCHEMA = "media_id bigint, kind string, n_bytes int, feat array<float>"

FRAMES_SCHEMA = "media_id bigint, frame_idx int, ts_ms int, frame_digest string"


def synth_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (payload = utf-8 text bytes)
    — deterministic stand-in for crawled image/audio bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic pseudo-feature vector (REAL decoders go here).

    Raises NotImplementedError pathways are intentionally absent: the
    fake keeps the pipeline runnable end-to-end in this container."""
    h = hashlib.md5(payload or b"").digest()
    return [int.from_bytes(h[i * 2 : i * 2 + 2], "big") / 65535.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched)."""

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feat": pdf["payload"].map(lambda b: _fake_decode(b, dim)),
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, n_frames: int = 3) -> DataFrame:
    """Frame-sampling stub for video payloads: emits n deterministic
    frame rows per video (1→N row expansion inside mapInPandas)."""

    def op(batches):
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            rows = []
            for _, r in vids.iterrows():
                for i in range(n_frames):
                    digest = hashlib.md5((r["payload"] or b"") + bytes([i])).hexdigest()
                    rows.append((int(r["media_id"]), i, i * every_ms, digest))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame_digest"])

    return media.mapInPandas(op, schema=FRAMES_SCHEMA)
