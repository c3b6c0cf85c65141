"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Decode support is honest about the environment:

* **REAL stdlib kernels** for container formats that need no external
  libraries: PPM (P6) images are parsed with a header scan + numpy
  reshape, WAV PCM audio with the stdlib ``wave`` module. Resize is
  nearest-neighbour numpy index slicing. These run end-to-end in tests.
* **Stub** for codecs that genuinely require PIL/soundfile/ffmpeg
  (JPEG/PNG/MP3/MP4): ``real_decode`` raises ``NotImplementedError``
  for them; ``featurize(mode="auto")`` falls back to the deterministic
  byte-histogram fake so the distributed plumbing always runs.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURES_DDL = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "decoded boolean, features array<float>"
)

FEATURE_DIM = 16


# ---------------------------------------------------------------------------
# real stdlib decode kernels
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6, maxval <= 255) into a (H, W, 3) uint8
    array. Pure stdlib + numpy."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    i += 1  # single whitespace after maxval
    width, height, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = width * height * 3
    # hostile headers declare absurd dimensions: validate against the
    # actual payload BEFORE frombuffer (a count of ~1e21 raises
    # OverflowError, which must surface as a normal corrupt-payload
    # ValueError, not escape the featurize fallback)
    if width <= 0 or height <= 0 or n > len(payload) - i:
        raise ValueError(
            f"PPM header declares {width}x{height} but payload holds "
            f"{len(payload) - i} pixel bytes"
        )
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    return pixels.reshape(height, width, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6) bytes (test-fixture writer)."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes -> (float64 mono samples in [-1, 1], rate).
    Stdlib ``wave``; 8/16/32-bit PCM."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{width * 8}-bit WAV not supported")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float samples in [-1, 1] -> 16-bit PCM WAV bytes (fixture writer)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize of a (H, W, C) array via index slicing."""
    h, w = arr.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[rows][:, cols]


def real_decode(payload: bytes, kind: str):
    """Decode a payload by container sniffing.

    Returns ("image", (H, W, 3) array) for PPM, ("audio", (samples,
    rate)) for WAV. Raises NotImplementedError for codecs that need
    external libraries (JPEG/PNG/MP3/MP4/...) — this is the single swap
    point where PIL/soundfile/ffmpeg would be wired in.
    """
    if payload.startswith(b"P6"):
        return "image", decode_ppm(payload)
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "audio", decode_wav(payload)
    raise NotImplementedError(
        f"no stdlib decoder for this {kind} payload; JPEG/PNG/MP3/MP4 "
        "require image/audio libraries not present in this container"
    )


def real_features(payload: bytes, kind: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """Fixed-width features from a REAL decode: per-channel mean/std +
    shape for images; duration/RMS/zero-crossing-rate/peak for audio."""
    tag, decoded = real_decode(payload, kind)
    out = np.zeros(dim, dtype=np.float32)
    if tag == "image":
        arr = decoded.astype(np.float64)
        h, w, _ = arr.shape
        out[0] = 1.0  # modality tag
        out[1], out[2] = float(w), float(h)
        out[3:6] = arr.mean(axis=(0, 1)) / 255.0
        out[6:9] = arr.std(axis=(0, 1)) / 255.0
        thumb = resize_nearest(decoded, 2, 2).astype(np.float64).mean(axis=2)
        out[9:13] = thumb.reshape(-1) / 255.0
    else:
        samples, rate = decoded
        n = max(1, len(samples))
        out[0] = 2.0
        out[1] = float(rate)
        out[2] = n / float(max(rate, 1))  # duration sec (rate=0 headers exist)
        out[3] = float(np.sqrt((samples**2).mean())) if len(samples) else 0.0
        out[4] = float(np.abs(samples).max()) if len(samples) else 0.0
        out[5] = float((np.diff(np.signbit(samples)) != 0).sum()) / n  # ZCR
    return out


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in features: byte-histogram projections.

    Fully reproducible from the payload alone — the fallback for
    payloads no stdlib decoder understands.
    """
    if not payload:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    hist /= max(1.0, hist.sum())
    # fold 256 bins into `dim` buckets
    folded = hist.reshape(dim, 256 // dim).sum(axis=1)
    return folded.astype(np.float32)


def featurize(media: DataFrame, dim: int = FEATURE_DIM, mode: str = "auto") -> DataFrame:
    """mapInPandas featurize stage: (media rows) -> FEATURES_DDL rows.

    mode: "auto" (real decode where a stdlib kernel matches, fake
    fallback otherwise — `decoded` column records which), "real"
    (raise on undecodable payloads), "fake" (histogram features only).
    """
    if mode not in ("auto", "real", "fake"):
        raise ValueError(f"featurize mode must be auto|real|fake, got {mode!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes, dec = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload) if payload is not None else b""
                decoded = False
                if mode in ("auto", "real"):
                    try:
                        f = real_features(raw, kind, dim)
                        decoded = True
                    except (ValueError, NotImplementedError, wave.Error,
                            EOFError, struct.error, IndexError, OverflowError):
                        # the expected corrupt/unsupported-payload errors:
                        # truncated RIFF chunks raise wave.Error/EOFError,
                        # bad headers ValueError/struct.error/IndexError,
                        # library-needing codecs NotImplementedError. Auto
                        # mode falls back to the deterministic histogram
                        # features for these; anything else is a genuine
                        # kernel bug and must propagate, not silently
                        # downgrade the corpus to decoded=False
                        if mode == "real":
                            raise
                        f = fake_features(raw, dim)
                else:
                    f = fake_features(raw, dim)
                feats.append(f.tolist())
                shas.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
                dec.append(decoded)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha256": shas,
                    "decoded": dec,
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


AUDIO_RATE = 8000


def synthetic_media_rows(n: int = 64, seed: int = 7) -> list[tuple]:
    """Deterministic media rows: REAL PPM payloads for images, REAL WAV
    payloads for audio (both stdlib-decodable), opaque bytes for video
    (exercises the fake-fallback path). Pure Python/numpy — usable with
    or without a SparkSession (the oracle parquet writer needs it
    Spark-free)."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = rng.randint(4, 24), rng.randint(4, 24)
            arr = np.array(
                [rng.randrange(256) for _ in range(w * h * 3)], dtype=np.uint8
            ).reshape(h, w, 3)
            payload = encode_ppm(arr)
            meta = (w, h, 0, "ppm")
        elif kind == "audio":
            rate = AUDIO_RATE
            dur = rng.randint(100, 400)  # ms
            t = np.arange(int(rate * dur / 1000.0))
            freq = rng.uniform(100.0, 1000.0)
            payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t / rate), rate)
            meta = (0, 0, dur, "pcm16")
        else:
            payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
            meta = (0, 0, rng.randint(1000, 10000), "fake")
        rows.append((i, kind, payload, meta))
    return rows


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic media table as a DataFrame (see synthetic_media_rows)."""
    return spark.createDataFrame(synthetic_media_rows(n, seed), MEDIA_SCHEMA_DDL)


def write_synthetic_media_parquet(path: str, n: int = 64, seed: int = 7) -> str:
    """Write the deterministic media table to a single parquet file
    (pyarrow, no Spark) so a DuckDB oracle and the Spark query can read
    the IDENTICAL bytes. Atomic replace; safe to call from both sides
    regardless of execution order (same seed -> same values)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = synthetic_media_rows(n, seed)
    meta_type = pa.struct(
        [("width", pa.int32()), ("height", pa.int32()),
         ("duration_ms", pa.int32()), ("codec", pa.string())]
    )
    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
            "meta": pa.array(
                [dict(zip(("width", "height", "duration_ms", "codec"), r[3])) for r in rows],
                meta_type,
            ),
        }
    )
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
