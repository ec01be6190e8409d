"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with the Spark-side plumbing (schema, partitioning, Arrow batch
shape) real and the byte-level decoding stubbed.

The reference stores media as chunked binary files (LiteStorage —
LiteDB/Client/Storage/LiteStorage.cs; RTSP frames — Video/
VideoCollection.cs:12-56). Here media is a first-class DataFrame:

    media(media_id bigint, kind string, content binary,
          meta map<string,string>)

Decode / feature-extract / resize / frame-sample run as mapInPandas
stages — Arrow-batched, partition-parallel, constant memory per batch.
The actual pixel/sample decoding requires image/audio libraries that are
NOT in this container, so the decode step is pluggable:

  * pass decoder=... (bytes -> dict) to run a real decoder (PIL, ffmpeg)
  * default DETERMINISTIC_FAKE derives plausible metadata from the bytes
    themselves (deterministic — testable end to end)
  * decoder=None raises NotImplementedError at plan build, loudly
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, meta map<string,string>"
)

DECODED_SCHEMA = (
    "media_id bigint, kind string, width int, height int, n_frames int, "
    "duration_ms int, content_sha string"
)

FEATURES_SCHEMA = "media_id bigint, feature array<float>"


def deterministic_fake_decoder(content: bytes) -> dict:
    """Stand-in decoder: derives stable pseudo-metadata from the bytes.
    Replace with PIL/ffmpeg/torchaudio via the decoder parameter."""
    h = hashlib.sha256(content).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "n_frames": 1 + h[2] % 30,
        "duration_ms": int.from_bytes(h[3:5], "big"),
        "content_sha": hashlib.sha256(content).hexdigest(),
    }


def decode_media(
    media: DataFrame,
    decoder: Callable[[bytes], dict] | None = deterministic_fake_decoder,
) -> DataFrame:
    """Decode binary media to typed metadata via mapInPandas (one Arrow
    batch in, one out — constant memory however large the table)."""
    if decoder is None:
        raise NotImplementedError(
            "no media decoder available in this environment — pass "
            "decoder=<bytes -> dict> (e.g. PIL-based) to decode_media"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(bytes(b)) for b in pdf["content"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "content_sha": [m["content_sha"] for m in metas],
                }
            )
            yield out

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    featurizer: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Per-item feature vector via mapInPandas. The default featurizer is
    a deterministic byte-histogram embedding (real pipelines plug a model
    runner here; the Spark plumbing — batching, schema, partition
    parallelism — is identical)."""

    def default_featurizer(content: bytes) -> list[float]:
        counts = [0] * dim
        for b in content:
            counts[b % dim] += 1
        total = max(len(content), 1)
        return [c / total for c in counts]

    fz = featurizer or default_featurizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "feature": [fz(bytes(b)) for b in pdf["content"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_n: int = 10,
    decoder: Callable[[bytes], dict] | None = deterministic_fake_decoder,
) -> DataFrame:
    """Sample every-nth frame index per video (metadata-level: emits
    (media_id, frame_idx) rows; the pixel extraction plugs into the same
    mapInPandas once a video lib is present)."""
    decoded = decode_media(media.filter("kind = 'video'"), decoder)
    from pyspark.sql import functions as F

    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
