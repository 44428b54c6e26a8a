"""Sketch protocol + compact binary serialization shared by all kernels.

Every sketch is a **mergeable state**: ``update`` folds a batch of values in,
``merge`` combines two states built with identical parameters/seeds, and
``to_bytes``/``from_bytes`` round-trip the state through a Spark ``binary``
column. Merge compatibility is enforced exactly like the reference's shape
checks (reference: estimators/CountSketch.java:232-241,
estimators/HOPS.java:172-194).

Wire format (little-endian):
  magic:uint8 | version:uint8 | n_params:uint16 | params:int64[n_params]
  | n_arrays:uint8 | per array: dtype_code:uint8, length:uint64, raw bytes
"""

from __future__ import annotations

import struct
from typing import ClassVar, Protocol, runtime_checkable

import numpy as np

_DTYPE_CODES = {
    np.dtype(np.uint64): 0,
    np.dtype(np.int64): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.float64): 3,
    np.dtype(np.int32): 4,
    np.dtype(np.uint32): 5,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}

_VERSION = 1


@runtime_checkable
class Sketch(Protocol):
    """The extension surface, analog of the reference's supplier-configured
    Estimator/Membership interfaces (PMIndex/HbiConfiguration.java:15-56)."""

    MAGIC: ClassVar[int]

    def update(self, values: np.ndarray) -> None: ...
    def merge(self, other: "Sketch") -> "Sketch": ...
    def to_bytes(self) -> bytes: ...


def pack(magic: int, params: list[int], arrays: list[np.ndarray]) -> bytes:
    parts = [struct.pack("<BBH", magic, _VERSION, len(params))]
    if params:
        parts.append(struct.pack(f"<{len(params)}q", *[int(p) for p in params]))
    parts.append(struct.pack("<B", len(arrays)))
    for a in arrays:
        a = np.ascontiguousarray(a)
        parts.append(struct.pack("<BQ", _DTYPE_CODES[a.dtype], a.size))
        parts.append(a.tobytes())
    return b"".join(parts)


def unpack(buf: bytes) -> tuple[int, list[int], list[np.ndarray]]:
    magic, version, n_params = struct.unpack_from("<BBH", buf, 0)
    if version != _VERSION:
        raise ValueError(f"unsupported sketch version {version}")
    off = 4
    params = list(struct.unpack_from(f"<{n_params}q", buf, off)) if n_params else []
    off += 8 * n_params
    (n_arrays,) = struct.unpack_from("<B", buf, off)
    off += 1
    arrays = []
    for _ in range(n_arrays):
        code, size = struct.unpack_from("<BQ", buf, off)
        off += 9
        dt = _CODE_DTYPES[code]
        nbytes = size * dt.itemsize
        arrays.append(np.frombuffer(buf, dtype=dt, count=size, offset=off).copy())
        off += nbytes
    return magic, params, arrays


def expect_magic(magic: int, expected: int, cls_name: str) -> None:
    if magic != expected:
        raise ValueError(f"{cls_name}: wrong magic {magic} (expected {expected})")


class MergeError(ValueError):
    """Raised when two sketch states are not merge-compatible."""


def check_compatible(name: str, a: dict, b: dict) -> None:
    """Parameter-equality guard before merge, mirroring the reference's
    mergeInPlace shape/seed checks (estimators/CountSketch.java:94-103)."""
    if a != b:
        raise MergeError(f"{name}: incompatible states {a} vs {b}")


def check_same_type(a, b) -> None:
    if type(a) is not type(b):
        raise MergeError(f"cannot merge {type(a).__name__} with {type(b).__name__}")


def grouped_reduce(op: np.ufunc, mats: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Reduce consecutive row groups of a 2-D matrix with a ufunc.

    Exactly ``op.reduceat(mats, starts, axis=0)`` (group i = the next
    ``counts[i]`` rows) but ~50x faster on wide rows: reduceat's axis-0
    path falls back to a per-element generic inner loop, while this runs
    ``max(counts)`` full-width vectorized ``op`` calls, each gathering the
    k-th member of every group that still has one. Work is
    O(sum(counts) * row_width) either way — this version is SIMD /
    memory-bandwidth bound (profiled on the HLL range-merge: 3.2s -> 60ms
    for 60k x 4096 uint8). Values are bit-identical: the same op is applied
    to the same operands in the same left-fold order. One deliberate
    difference: the OUTPUT KEEPS ``mats.dtype`` (reduceat promotes uint8
    sums to uint64) — callers here add int64 / max-or uint8, where the
    dtypes agree.
    """
    counts = np.asarray(counts, dtype=np.int64)
    if counts.size == 0:
        return mats[:0].copy()
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    maxc = int(counts.max())
    if maxc * len(counts) == len(mats):
        # uniform group size: one strided reduce, no gather scatter
        return op.reduce(
            mats.reshape(len(counts), maxc, mats.shape[1]), axis=1
        )
    merged = mats[starts].copy()
    for k in range(1, maxc):
        sel = np.nonzero(counts > k)[0]
        if sel.size == 0:
            break
        merged[sel] = op(merged[sel], mats[starts[sel] + k])
    return merged
