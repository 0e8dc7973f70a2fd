"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as ``binary`` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no imaging/audio libs in this container — marked below); the
Spark-side contract that matters at 100 TB is real and tested:

- schema: (asset_id, modality, media: binary, meta: struct)
- partitioning: assets repartitioned by size-aware buckets so one huge
  video cannot skew a task (``repartitionByRange`` on (modality, size));
- batch shape: mapInPandas receives bounded Arrow batches
  (spark.sql.execution.arrow.maxRecordsPerBatch) so peak memory is
  batch_rows × max_asset_size;
- deterministic fake kernels keep the dataflow testable end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

ASSET_SCHEMA = (
    "asset_id bigint, modality string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = "asset_id bigint, modality string, feature array<float>, n_bytes int"
FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame_hash string"


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB — real impl: PIL/cv2 decode. Deterministic fake: hash-seeded
    8x8 luma grid so downstream shapes/values are reproducible."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8).astype(np.float32)


def extract_features(assets: DataFrame, feature_dim: int = 16) -> DataFrame:
    """binary media → fixed-dim feature vector, Arrow-batched.

    The hot path keeps one Python roundtrip; everything inside the batch
    is vectorized numpy over the decoded arrays.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, sizes = [], []
            for payload in b["media"]:
                img = _decode_image(bytes(payload))
                v = img.mean(axis=0)  # fake pooled feature
                v = np.resize(v, feature_dim) / 255.0
                feats.append(v.astype(np.float32).tolist())
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "asset_id": b["asset_id"],
                    "modality": b["modality"],
                    "feature": feats,
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                }
            )

    return size_balanced(assets).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    STUB kernel — frame extraction is a deterministic hash per frame
    index; the real implementation swaps in an ffmpeg/pyav call with the
    identical batch contract.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for aid, payload, meta in zip(b["asset_id"], b["media"], b["meta"]):
                dur = (meta or {}).get("duration_ms") or 0
                n = max(1, dur // every_ms)
                base = hashlib.sha256(bytes(payload)).hexdigest()[:16]
                for i in range(int(n)):
                    rows.append((int(aid), i, f"{base}-{i}"))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_hash"])

    videos = assets.filter(F.col("modality") == "video")
    return size_balanced(videos).mapInPandas(run, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id bigint, modality string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)


def resize_images(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plumbing: payload → payload with clamped dimensions.

    STUB kernel — the deterministic fake re-hashes the payload with the
    new dimensions (a real impl swaps in PIL's ``thumbnail``/cv2
    ``resize`` with the identical batch contract). Metadata dims are
    updated for real, preserving aspect ratio, so downstream
    partitioning/pruning logic over meta is fully exercised.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for aid, mod, payload, meta in zip(
                b["asset_id"], b["modality"], b["media"], b["meta"]
            ):
                m = dict(meta or {})
                w, h = m.get("width") or 0, m.get("height") or 0
                if mod == "image" and max(w, h) > max_side:
                    scale = max_side / max(w, h)
                    m["width"] = max(1, int(w * scale))
                    m["height"] = max(1, int(h * scale))
                    # STUB: stand-in for the resampled pixel buffer
                    payload = hashlib.sha256(
                        bytes(payload) + f"{m['width']}x{m['height']}".encode()
                    ).digest()
                rows.append(
                    (
                        int(aid), mod, bytearray(payload),
                        (
                            m.get("width"), m.get("height"),
                            m.get("sample_rate"), m.get("duration_ms"),
                        ),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "modality", "media", "meta"]
            )

    return size_balanced(assets).mapInPandas(run, schema=RESIZE_SCHEMA)


def size_balanced(assets: DataFrame, partitions: int | None = None) -> DataFrame:
    """Range-partition by (modality, payload size): large assets spread
    across tasks instead of hash-clumping — the skew guard for binary
    columns."""
    n = partitions or int(
        assets.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return assets.withColumn("_sz", F.length("media")).repartitionByRange(
        n, "modality", "_sz"
    ).drop("_sz")


def synthetic_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests (no external data)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 13)
        modality = ["image", "audio", "video"][i % 3]
        meta = (
            64 + i % 32, 48 + i % 16,
            16000 if modality == "audio" else 0,
            3000 + 500 * (i % 7) if modality == "video" else 0,
        )
        rows.append((i, modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
