"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata. The Spark-side plumbing (schemas, partitioning, Arrow batch
shape, UDF signatures) is real and tested; the codec step is STUBBED — the
image/audio libraries are not in this container — behind a deterministic
fake so batch shapes and downstream schema contracts can be exercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, ok boolean, feature array<float>, n_frames int"


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rows = []
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=128, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                64 if kind != "audio" else None,
                1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: real deployments decode with PIL/torchaudio/ffmpeg here.
    Deterministic fake: a fixed-length float32 'feature' derived from the
    payload bytes, so the plumbing is testable end-to-end."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    out = np.zeros(16, dtype=np.float32)
    for i in range(16):
        out[i] = arr[i::16].mean() / 255.0
    return out


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary
    payloads). Partitioning contract: repartition upstream by media_id so
    payload bytes are spread evenly (binary columns dominate batch size)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            oks = []
            frames = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    feats.append(_decode_stub(bytes(payload), kind))
                    oks.append(True)
                    frames.append(1 if kind == "image" else 25)
                except Exception:
                    feats.append(np.zeros(16, dtype=np.float32))
                    oks.append(False)
                    frames.append(0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "ok": oks,
                    "feature": [f.tolist() for f in feats],
                    "n_frames": frames,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, kind string, ok boolean, payload binary, width int, height int"
)


def _resize_stub(payload: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """STUB: real deployments decode + PIL.Image.resize + re-encode here.
    Deterministic fake preserving the real op's shape contract: output
    byte length scales with the target pixel count (tw*th / (w*h) of the
    input length, min 1), content is a strided downsample of the input —
    so batch-size accounting and schema plumbing behave like the real op."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    n_out = max(1, int(len(arr) * (tw * th) / max(w * h, 1)))
    idx = np.linspace(0, len(arr) - 1, n_out).astype(np.int64)
    return bytes(arr[idx])


def resize_images(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Image resize via mapInPandas over binary Arrow batches: filters to
    kind='image' (pushed to the scan), decodes/resizes per batch (stubbed
    codec), emits the resized binary + new dims. The real-deployment note:
    payload bytes dominate Arrow batch size, so cap
    spark.sql.execution.arrow.maxRecordsPerBatch to keep batches
    ~tens of MB when payloads are full-size images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, oks = [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                try:
                    outs.append(
                        _resize_stub(bytes(payload), int(w), int(h), target_w, target_h)
                    )
                    oks.append(True)
                except Exception:
                    outs.append(b"")
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "ok": oks,
                    "payload": outs,
                    "width": target_w,
                    "height": target_h,
                }
            )

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload", "width", "height"
    )
    return imgs.mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp —
    pure Catalyst (sequence + explode); the actual frame decode would be a
    mapInPandas over (media_id, frame_ts) with the payload joined in."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
