"""Vectorized multi-filter Bloom probing.

All filters at one level share (m, k, seed), so a pattern's bit positions are
computed ONCE and gathered across every window's bitset in a single numpy
operation — the rebuild of the per-node probe loop
(search/BlockSearch.java:95-128, tree/LevelDirectory.java:47-49) without
per-row Python.
"""

from __future__ import annotations

import numpy as np

from ..sketches import base as sbase
from ..sketches.bloom import BloomFilter


def words_matrix(blobs) -> tuple[np.ndarray, BloomFilter]:
    """Stack serialized same-family Bloom blobs into an (n_blobs, n_words)
    uint64 matrix. Blobs must share (m,k,seed) — guaranteed per level."""
    proto = BloomFilter.from_bytes(blobs[0])
    n_words = len(proto.words)
    buf = b"".join(blobs)
    blob_len = len(blobs[0])
    if len(buf) != blob_len * len(blobs):
        raise ValueError("mixed blob sizes within one level")
    header = blob_len - n_words * 8
    raw = np.frombuffer(buf, dtype=np.uint8).reshape(len(blobs), blob_len)
    return raw[:, header:].copy().view(np.uint64), proto


def probe_matrix(words: np.ndarray, proto: BloomFilter, keys: np.ndarray) -> np.ndarray:
    """(n_blobs, n_keys) bool: might filter i contain key j?"""
    if len(keys) == 0:
        return np.ones((words.shape[0], 0), dtype=bool)
    pos = proto._positions(np.asarray(keys, dtype=np.uint64))  # (n_keys, k)
    word_idx = (pos >> np.uint64(6)).astype(np.int64).ravel()
    bit = (np.uint64(1) << (pos & np.uint64(63))).ravel()
    gathered = words[:, word_idx] & bit[None, :]  # (n_blobs, n_keys*k)
    return (gathered != 0).reshape(words.shape[0], pos.shape[0], pos.shape[1]).all(axis=2)


def probe_blobs(blobs, keys: np.ndarray) -> np.ndarray:
    """Convenience: (n_blobs, n_keys) membership matrix from raw blobs."""
    if len(blobs) == 0:
        return np.zeros((0, len(keys)), dtype=bool)
    words, proto = words_matrix(list(blobs))
    return probe_matrix(words, proto, keys)
