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

import numpy as np
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
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    CONTRACT for a real decoder: the whole batch arrives as one Arrow
    record batch; the decode kernel must be batch-vectorized (libvips /
    torchvision batched transforms), NOT a per-row Python loop — the
    ``.map`` below is acceptable only because the fake md5 decode is
    itself the per-element cost."""

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
    frame rows per video (1→N row expansion inside mapInPandas).

    The fake frame digest is md5(payload || ascii(frame_idx)) — chosen
    to be reproducible by the DuckDB oracle (md5(text || i::VARCHAR))
    so even the stub has a hard correctness check.  Row expansion is
    vectorized (np.repeat/tile); only the digest itself is per-element
    (same contract note as extract_features)."""

    def op(batches):
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            n = len(vids)
            idx = np.tile(np.arange(n_frames), n)
            payloads = vids["payload"].to_numpy().repeat(n_frames)
            yield pd.DataFrame(
                {
                    "media_id": vids["media_id"].to_numpy().repeat(n_frames),
                    "frame_idx": idx,
                    "ts_ms": idx * every_ms,
                    "frame_digest": [
                        hashlib.md5((p or b"") + str(i).encode()).hexdigest()
                        for p, i in zip(payloads, idx)
                    ],
                }
            )

    return media.mapInPandas(op, schema=FRAMES_SCHEMA)
