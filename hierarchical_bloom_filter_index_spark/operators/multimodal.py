"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schemas, Arrow batch shapes,
partition-preserving mapInPandas stages, deterministic fake features.

Decode backends:
* ``'fake'``  — payload interpreted as raw bytes (the original stub).
* ``'numpy'`` — REAL encoded formats decoded end-to-end with pure numpy:
  P6 PPM images (the netpbm binary format), PCM16 RIFF/WAVE audio, and
  uncompressed 24-bit RIFF/AVI video (BI_RGB DIB frames, bottom-up BGR
  rows, word-aligned chunk walking) — header parsing and round-trip
  encoders for fixtures included.
* ``'real'``  — reserved for PIL/av/torchaudio when available:
  NotImplementedError in this container.
Every signature, schema, and batch contract is identical across backends.
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


# ---------------------------------------------------------------------------
# real pure-numpy codecs (PPM P6 images, PCM16 WAV audio)
# ---------------------------------------------------------------------------
def encode_ppm(arr: np.ndarray) -> bytes:
    """P6 (binary) PPM encoder: HxWx3 uint8 -> netpbm payload."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm expects HxWx3 uint8")
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM decoder (pure numpy): parses the 3-field header (whitespace +
    '#' comments per the netpbm spec) and returns HxWx3 uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal PCM16 mono RIFF/WAVE encoder: int16 samples -> payload."""
    import struct

    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 RIFF/WAVE decoder (pure numpy): walks the chunk list, returns
    (int16 samples, sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, int(sample_rate)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Minimal uncompressed RIFF/AVI encoder: NFxHxWx3 uint8 RGB frames ->
    'AVI ' payload with BI_RGB 24-bit DIB '00db' frames (bottom-up BGR rows,
    4-byte-aligned stride), an 'avih' main header and one 'vids' stream."""
    import struct

    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_avi expects NFxHxWx3 uint8")
    nf, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h
    bgr = frames[:, ::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
    padded = np.zeros((nf, h, stride), dtype=np.uint8)
    padded[:, :, : w * 3] = bgr.reshape(nf, h, w * 3)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10, nf, 0, 1,
        frame_size, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"DIB " + struct.pack(
        "<IHH8I", 0, 0, 0, 0, 1, fps, 0, nf, frame_size, 0, 0
    ) + struct.pack("<4H", 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00db", padded[i].tobytes()) for i in range(nf)))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi(payload: bytes) -> np.ndarray:
    """Uncompressed RIFF/AVI decoder (pure numpy): recursive chunk walk for
    'avih' (dimensions), 'strf' (BITMAPINFOHEADER: bit depth + compression)
    and the movi '##db'/'##dc' frame chunks. Returns NFxHxWx3 uint8 RGB."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    dims: list[int] = []
    fmt: list[int] = []
    frames_raw: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)
            elif cid == b"avih":
                vals = struct.unpack_from("<14I", payload, body)
                dims[:] = [vals[8], vals[9]]
            elif cid == b"strf" and not fmt:
                _, _, _, _, bitcount, compression = struct.unpack_from("<IiiHHI", payload, body)
                fmt[:] = [bitcount, compression]
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                frames_raw.append(payload[body : body + size])
            pos = body + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    if not dims or not fmt:
        raise ValueError("missing avih/strf header")
    if fmt != [24, 0]:
        raise ValueError("only uncompressed 24-bit DIB (BI_RGB) supported")
    w, h = dims
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h).reshape(h, stride)
        out[i] = rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return out


def synthesize_encoded_media(spark, n: int = 48, seed: int = 42, n_partitions: int = 4) -> DataFrame:
    """Fixture table whose payloads are REAL encoded formats (P6 PPM images,
    PCM16 WAV audio, uncompressed AVI video) — drives the 'numpy' backend
    end-to-end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.default_rng(seed * 7_777_777 + mid)
                if mid % 3 == 0:
                    w, h = int(rng.integers(4, 32)), int(rng.integers(4, 32))
                    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    rows.append((mid, "image", encode_ppm(img), w, h, 0, 1, f"cam{mid % 4}"))
                elif mid % 3 == 1:
                    sr = 16_000
                    nsamp = int(rng.integers(64, 1024))
                    samples = rng.integers(-32768, 32768, nsamp).astype(np.int16)
                    rows.append((mid, "audio", encode_wav(samples, sr), 0, 0, sr, nsamp, f"mic{mid % 4}"))
                else:
                    w, h, nf = int(rng.integers(4, 24)), int(rng.integers(4, 24)), int(rng.integers(2, 8))
                    vid = rng.integers(0, 256, (nf, h, w, 3), dtype=np.uint8)
                    rows.append((mid, "video", encode_avi(vid), w, h, 0, nf, f"cam{mid % 4}"))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height",
                         "sample_rate", "n_frames", "source"],
            )

    return spark.range(0, n, 1, n_partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def audio_frame_features(samples: np.ndarray, frame: int = 256) -> np.ndarray:
    """Real DSP features per non-overlapping frame, pure numpy: (n_frames, 2)
    of [RMS energy, zero-crossing rate]. The audio analog of the visual
    resize+featurize step — deterministic, vectorized (one reshape + two
    reductions), no libs."""
    x = np.asarray(samples, dtype=np.float64)
    if frame <= 0:
        raise ValueError("frame must be positive")
    n = (len(x) // frame) * frame
    if n == 0:  # shorter than one frame: single padded frame
        pad = np.zeros(frame)
        pad[: len(x)] = x
        x, n = pad, frame
    fr = x[:n].reshape(-1, frame)
    rms = np.sqrt((fr * fr).mean(axis=1))
    zcr = (np.signbit(fr[:, 1:]) != np.signbit(fr[:, :-1])).mean(axis=1)
    return np.stack([rms, zcr], axis=1)


def resize_image(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (HxWxC -> out_h x out_w x C):
    index-gather on precomputed row/col maps — vectorized, no loops, exact
    and deterministic (the resize step of a media feature pipeline; a 'real'
    backend would swap in PIL/cv2 interpolation behind the same signature)."""
    h, w = arr.shape[:2]
    if h == 0 or w == 0 or out_h <= 0 or out_w <= 0:
        raise ValueError("resize_image needs non-empty input and positive output dims")
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows[:, None], cols[None, :]]


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
    media: DataFrame, dim: int = 32, decode_backend: str = "fake",
    resize_to: tuple[int, int] | None = None,
) -> DataFrame:
    """Decode (+ optional resize to ``resize_to=(h, w)``) + feature-extract
    per media row, Arrow-batched. Resizing normalizes visual inputs before
    featurization (images directly; video per sampled frame; audio is
    untouched — resampling is a different op).

    Partition-preserving mapInPandas: no shuffle, payload bytes never leave
    their executor — at 100 TB the features (dim * 4 bytes) are the only
    thing downstream stages move.

    decode_backend='numpy' decodes REAL formats (P6 PPM / PCM16 WAV /
    uncompressed AVI) with the pure-numpy codecs above; 'fake' treats
    payloads as raw bytes; 'real' stays NotImplementedError until
    PIL/av/torchaudio exist here.
    """
    if decode_backend not in ("fake", "numpy"):
        raise NotImplementedError(
            "media codec libraries are not available in this container; "
            "use decode_backend='numpy' (PPM/WAV/AVI) or 'fake' (raw bytes)"
        )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, vecs = [], [], []
            for r in pdf.itertuples(index=False):
                raw = np.frombuffer(r.payload, dtype=np.uint8)
                if decode_backend == "numpy":
                    if r.kind == "image":
                        arr = decode_ppm(bytes(r.payload))
                        if resize_to is not None:
                            arr = resize_image(arr, *resize_to)
                    elif r.kind == "audio":
                        samples, _sr = decode_wav(bytes(r.payload))
                        # real DSP per-frame features (RMS + ZCR), quantized
                        # for the seeded projection — the audio analog of
                        # decode->resize->featurize
                        arr = (audio_frame_features(samples) * 1000).astype(np.int64)
                    else:
                        # frame-sample first/middle/last decoded frames
                        fr = decode_avi(bytes(r.payload))
                        fr = fr[sorted({0, len(fr) // 2, len(fr) - 1}), ...]
                        if resize_to is not None:
                            fr = np.stack([resize_image(f, *resize_to) for f in fr])
                        arr = fr
                elif r.kind == "image":
                    arr = _decode_image_fake(r.payload, r.width, r.height)
                    if resize_to is not None:
                        arr = resize_image(arr, *resize_to)
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
