"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no image/audio libraries in this container — clearly marked
``NotImplementedError`` + a deterministic fake) but the Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real
and tested, so swapping in PIL/ffmpeg later is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURES_DDL = "media_id long, kind string, n_bytes int, sha256 string, features array<float>"


def real_decode(payload: bytes, kind: str):
    """The real decode kernel — requires PIL / soundfile / ffmpeg.

    Not available in this environment; the pipeline uses
    fake_features() instead. Kept as the single swap point.
    """
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; wire PIL/soundfile here and featurize() picks it up"
    )


def fake_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in features: byte-histogram projections.

    Fully reproducible from the payload alone, so the distributed
    plumbing (batching, schema, joins downstream) is testable without
    codecs.
    """
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    hist /= max(1.0, hist.sum())
    # fold 256 bins into `dim` buckets
    folded = hist.reshape(dim, 256 // dim).sum(axis=1)
    return folded.astype(np.float32)


def featurize(media: DataFrame, dim: int = 16, use_real_decode: bool = False) -> DataFrame:
    """mapInPandas featurize stage: (media rows) -> FEATURES_DDL rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                if use_real_decode:
                    real_decode(raw, kind)  # raises NotImplementedError
                feats.append(fake_features(raw, dim).tolist())
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha256": shas,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_DDL)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per frame to decode.

    Pure column math over metadata (no decode): the explode pattern a
    real frame extractor would parallelize over.
    """
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        rows.append(
            (
                i,
                kind,
                payload,
                (
                    rng.randint(16, 64) if kind == "image" else 0,
                    rng.randint(16, 64) if kind == "image" else 0,
                    rng.randint(1000, 10000) if kind != "image" else 0,
                    "fake",
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)
