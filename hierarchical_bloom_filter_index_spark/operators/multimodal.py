"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schemas, Arrow batch shapes,
partition-preserving mapInPandas stages, deterministic fake features. The
actual codecs are STUBBED (``decode_backend='fake'`` is the only backend in
this container; ``'real'`` raises NotImplementedError) because no
image/audio libraries ship here. Swapping in PIL/torchaudio later only
replaces the ``_decode_*`` internals; every signature, schema, and batch
contract stays fixed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sketches.hashing import splitmix64

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int, source string"
)
FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, feat_dim int"


def synthesize_media(spark, n: int = 64, seed: int = 42, n_partitions: int = 4) -> DataFrame:
    """Deterministic fake media table: payload bytes are a seeded stream,
    metadata is consistent with the payload size (the fixture generator)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.default_rng(seed * 1_000_003 + mid)
                kind = ["image", "audio", "video"][mid % 3]
                if kind == "image":
                    w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                    payload = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
                    rows.append((mid, kind, payload, w, h, 0, 1, f"cam{mid % 4}"))
                elif kind == "audio":
                    sr = 16_000
                    nsamp = int(rng.integers(100, 2000))
                    payload = rng.integers(0, 256, nsamp * 2, dtype=np.uint8).tobytes()
                    rows.append((mid, kind, payload, 0, 0, sr, nsamp, f"mic{mid % 4}"))
                else:
                    w, h, nf = 16, 16, int(rng.integers(2, 10))
                    payload = rng.integers(0, 256, w * h * 3 * nf, dtype=np.uint8).tobytes()
                    rows.append((mid, kind, payload, w, h, 0, nf, f"cam{mid % 4}"))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height",
                         "sample_rate", "n_frames", "source"],
            )

    return spark.range(0, n, 1, n_partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: interpret payload as raw HxWx3 uint8 (deterministic fake).
    A real backend would decode JPEG/PNG here."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: width * height * 3].reshape(height, width, 3)


def _feature_fake(arr: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic fake feature: seeded projection of the byte histogram —
    stable across partitionings, so tests can assert exact equality."""
    hist = np.bincount(arr.reshape(-1) % 64, minlength=64).astype(np.float64)
    basis = (
        splitmix64(np.arange(dim * 64, dtype=np.uint64)).astype(np.float64) / 2.0**63 - 1.0
    ).reshape(dim, 64)
    v = basis @ hist
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 32, decode_backend: str = "fake"
) -> DataFrame:
    """Decode + feature-extract per media row, Arrow-batched.

    Partition-preserving mapInPandas: no shuffle, payload bytes never leave
    their executor — at 100 TB the features (dim * 4 bytes) are the only
    thing downstream stages move.
    """
    if decode_backend != "fake":
        raise NotImplementedError(
            "real media codecs are not available in this container; "
            "plug PIL/av/torchaudio into _decode_* and pass decode_backend='fake' until then"
        )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, vecs = [], [], []
            for r in pdf.itertuples(index=False):
                raw = np.frombuffer(r.payload, dtype=np.uint8)
                if r.kind == "image":
                    arr = _decode_image_fake(r.payload, r.width, r.height)
                elif r.kind == "video":
                    # frame-sample: first/middle/last frame bytes
                    fsz = r.width * r.height * 3
                    idx = [0, (r.n_frames // 2) * fsz, (r.n_frames - 1) * fsz]
                    arr = np.concatenate([raw[i : i + fsz] for i in idx])
                else:
                    arr = raw
                ids.append(r.media_id)
                kinds.append(r.kind)
                vecs.append(_feature_fake(arr, dim))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "feature": vecs,
                 "feat_dim": [dim] * len(ids)}
            )

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)
