"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads ride as ``binary`` columns next to typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The actual codecs are NOT in
this container, so the decode kernels are stubbed two ways:

* ``backend='fake'`` (default) — a deterministic md5-derived stand-in
  so the Spark-side plumbing (schema, batching, partitioning, UDF
  signatures) is real and testable end-to-end;
* ``backend='pillow'`` etc. — raises ``NotImplementedError`` with the
  exact integration point, so a real deployment swaps one function.

The big-data discipline is identical to the html pipeline: the binary
column is only read inside the mapInPandas stage, metadata-only plans
never touch it (column pruning).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("phash", StringType()),
        StructField("mean_luma", DoubleType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def _fake_decode(payload: bytes, out_dim: int = 16) -> dict:
    """Deterministic stand-in for a real image decode: derives a
    pseudo-pixel statistic vector from the payload digest. The chain
    runs over the payload's HEX form (md5(hex) → sha256(hexdigest))
    rather than raw bytes so an engine without binary hashing — the
    q35 DuckDB oracle — can recompute it; a real backend replaces this
    kernel wholesale, the Arrow plumbing around it is the product."""
    dig_hex = hashlib.md5(bytes(payload).hex().encode()).hexdigest()
    arr = np.frombuffer(
        hashlib.sha256(dig_hex.encode()).digest(), dtype=np.uint8
    ).astype(np.float64)
    emb = (arr[:out_dim] / 255.0).round(6)
    return {
        "phash": dig_hex[:16],
        "mean_luma": round(float(arr.mean() / 255.0), 6),
        "embedding": emb.tolist(),
    }


def image_features(media: DataFrame, backend: str = "fake") -> DataFrame:
    """Decode + feature-extract images (Arrow-batched)."""
    if backend != "fake":
        raise NotImplementedError(
            f"backend {backend!r}: install the codec (e.g. Pillow) and replace "
            "_fake_decode with a real decode at this call site — the Spark "
            "plumbing (schema/batching) is unchanged."
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "phash": [f["phash"] for f in feats],
                    "mean_luma": [f["mean_luma"] for f in feats],
                    "embedding": [f["embedding"] for f in feats],
                }
            )

    return media.select("media_id", "mime", "payload").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000, backend: str = "fake") -> DataFrame:
    """Sample 'frames' from video payloads at a fixed cadence. The fake
    backend emits deterministic sub-digests per frame index; a real
    backend would decode with pyav/ffmpeg at the marked point."""
    if backend != "fake":
        raise NotImplementedError("swap _fake frame cut for pyav/ffmpeg decode here")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n = max(1, int(dur // every_ms)) if dur else 1
                for i in range(n):
                    frame = hashlib.md5(bytes(payload) + i.to_bytes(4, "big")).digest()
                    rows.append((mid, i, i * every_ms, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"])

    return media.select("media_id", "payload", "duration_ms").mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("n_bytes", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms_level", DoubleType()),
        StructField("mfcc", ArrayType(DoubleType())),
    ]
)


def image_resize(media: DataFrame, width: int = 224, height: int = 224,
                 backend: str = "fake") -> DataFrame:
    """Resize image payloads (the training-pipeline normalize step).
    Fake backend: output payload is a deterministic digest chain sized
    proportionally to the target area, so downstream size accounting is
    exercised; a real deployment decodes+resizes at the marked point."""
    if backend != "fake":
        raise NotImplementedError(
            "swap the digest stand-in for Pillow Image.open(...).resize() here"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_len = max(32, (width * height) // 2048)
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                block = hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
                payloads.append((block * (out_len // len(block) + 1))[:out_len])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "mime", "payload").mapInPandas(run, RESIZED_SCHEMA)


def audio_features(media: DataFrame, n_mfcc: int = 13, backend: str = "fake") -> DataFrame:
    """Audio decode + feature extraction (loudness + MFCC-shaped
    embedding). Fake backend derives deterministic statistics from the
    payload digest; a real deployment swaps in librosa/torchaudio at
    the marked point — schema, batching, and partitioning unchanged."""
    if backend != "fake":
        raise NotImplementedError(
            "swap _fake audio stats for librosa.load + librosa.feature.mfcc here"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms, mfccs = [], []
            for p in pdf["payload"]:
                # hex-form chain for the same reason as _fake_decode
                dig = hashlib.sha256(bytes(p).hex().encode() + b"/audio").digest()
                arr = np.frombuffer(dig, dtype=np.uint8).astype(np.float64) / 255.0
                rms.append(round(float(np.sqrt((arr**2).mean())), 6))
                mfccs.append((arr[:n_mfcc] * 2 - 1).round(6).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "duration_ms": pdf["duration_ms"].astype("int64"),
                    "rms_level": rms,
                    "mfcc": mfccs,
                }
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media/{i}".encode()).digest() * (1 + i % 7)
        mime = ["image/jpeg", "image/png", "video/mp4", "audio/ogg"][i % 4]
        dur = 5000 + (i * 997) % 20000 if mime.split("/")[0] in ("video", "audio") else 0
        rows.append((f"m{i:05d}", mime, payload, 640, 480, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
