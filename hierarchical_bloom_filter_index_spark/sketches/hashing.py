"""Deterministic, seedable, vectorized 64-bit hashing (numpy).

All sketch kernels share these hash families so that sketch states built on
different executors / partitions are merge-compatible (same seeds => same
hash functions), mirroring the seed/shape compatibility checks of the
reference's mergeable sketches (reference: estimators/CountSketch.java:211-216
SplitMix64 stream, estimators/CountSketch.java:232-241 merge shape check).

Everything operates on ``np.uint64`` arrays with wrap-around modular
arithmetic (numpy uint64 ops wrap mod 2^64, matching Java long semantics).
"""

from __future__ import annotations

import numpy as np

# SplitMix64 constants (public domain, Steele et al.; same constants used by
# the reference's SplitMix64 stream in estimators/CountSketch.java:211-216).
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
_SEED_TWEAK = np.uint64(0xD6E8FEB86659FD93)

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over a uint64 array (vectorized, wrap mod 2^64)."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (x + _GOLDEN).astype(np.uint64)
        x = (x ^ (x >> _U64(30))) * _MIX1
        x = (x ^ (x >> _U64(27))) * _MIX2
        return x ^ (x >> _U64(31))


def hash64(keys: np.ndarray, seed: int) -> np.ndarray:
    """Seeded 64-bit hash of a uint64 key array.

    Different seeds give (empirically) independent hash functions; the same
    seed always gives the same function — the requirement for mergeable
    sketch states across partitions.
    """
    keys = np.asarray(keys)
    if keys.dtype != np.uint64:
        keys = keys.astype(np.int64).astype(np.uint64)
    mixed = ((seed & 0xFFFFFFFFFFFFFFFF) * 0xD6E8FEB86659FD93 + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    s = splitmix64(np.asarray([mixed], dtype=np.uint64))[0]
    return splitmix64(keys ^ s)


def hash64_pair(keys_a: np.ndarray, keys_b: np.ndarray, seed: int) -> np.ndarray:
    """Hash of a composite (a, b) key pair, order-sensitive.

    The reference packs ``(intervalId, token)`` into one or two words
    (membership/KeyPackingService.java:77-94); we combine by mixing instead.
    """
    ha = hash64(keys_a, seed)
    return splitmix64(ha ^ np.asarray(keys_b, dtype=np.uint64) ^ _GOLDEN)


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (0 -> 0), branchless binary search."""
    x = np.asarray(x, dtype=np.uint64)
    out = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        s = _U64(shift)
        big = cur >= (_U64(1) << s)
        out[big] += shift
        cur = np.where(big, cur >> s, cur)
    out[x > 0] += 1
    return out


def popcount_u64(words: np.ndarray) -> int:
    """Total number of set bits across a uint64 array (numpy<2 has no bitwise_count)."""
    return int(np.unpackbits(words.view(np.uint8)).sum())


def pack_ngrams_u64(values: np.ndarray, n: int, base_bits: int = 21) -> np.ndarray:
    """Sliding n-grams of an int array packed into uint64 ids.

    Each symbol is masked to ``base_bits`` bits and n of them concatenated;
    n * base_bits must be <= 64. This is the vectorized analog of the
    reference's RingBuffer n-gram snapshots hashed to longs
    (utilities/RingBuffer.java:48-77, utilities/StringKeyMapper.java:116-129).
    Returns an array of length ``len(values) - n + 1`` (empty if shorter).
    """
    if n * base_bits > 64:
        raise ValueError(f"n*base_bits={n * base_bits} exceeds 64")
    v = np.asarray(values).astype(np.int64).astype(np.uint64)
    v &= (_U64(1) << _U64(base_bits)) - _U64(1)
    if len(v) < n:
        return np.empty(0, dtype=np.uint64)
    out = np.zeros(len(v) - n + 1, dtype=np.uint64)
    for i in range(n):
        out |= v[i : len(v) - n + 1 + i] << _U64((n - 1 - i) * base_bits)
    return out


def hash_str_array(strings, seed: int) -> np.ndarray:
    """Deterministic 64-bit hashes of an iterable of python strings.

    Polynomial rolling hash over UTF-8 bytes, finished with SplitMix64.
    Used for string-keyed sketches (dedup shingles, exact-dup keys) where the
    key is not already an integer. Not performance critical per-row because
    callers batch via Arrow; for hot paths prefer integer token ids.
    """
    mult = 0x100000001B3  # FNV-ish multiplier
    mask = (1 << 64) - 1
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * mult) & mask
        out[i] = h
    return splitmix64(out ^ np.uint64(np.uint64(seed) * _SEED_TWEAK))
