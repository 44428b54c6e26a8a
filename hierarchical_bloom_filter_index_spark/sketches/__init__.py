"""Pure-numpy mergeable sketch kernels (no Spark dependency).

Registry maps magic byte -> class so generic merge UDFs can deserialize any
sketch family from a binary column.
"""

from .bloom import BloomFilter
from .cms import CountMinSketch, CountSketch, IntCountSketch
from .hll import HyperLogLog
from .kll import KLL
from .samplers import BottomKSampler, HopsSampler
from .spacesaving import MisraGries
from .tdigest import TDigest
from . import base, hashing

SKETCH_REGISTRY = {
    cls.MAGIC: cls
    for cls in (BloomFilter, CountMinSketch, CountSketch, IntCountSketch, HyperLogLog, KLL, HopsSampler, BottomKSampler, TDigest, MisraGries)
}
# sparse-exact window-node encodings deserialize into their dense classes
# (lossless: cms/hll from_bytes densify — see cms._MAGIC_CMS_SP / hll._MAGIC_HLL_SP)
from .cms import _MAGIC_CMS_SP as _SP_CMS
from .cms import _MAGIC_CS_SP as _SP_CS
from .hll import _MAGIC_HLL_SP as _SP_HLL

SKETCH_REGISTRY[_SP_CMS] = CountMinSketch
SKETCH_REGISTRY[_SP_CS] = CountSketch
SKETCH_REGISTRY[_SP_HLL] = HyperLogLog


def from_bytes(buf: bytes):
    """Deserialize any registered sketch from its binary blob."""
    magic = buf[0]
    try:
        cls = SKETCH_REGISTRY[magic]
    except KeyError:
        raise ValueError(f"unknown sketch magic {magic}") from None
    return cls.from_bytes(buf)


def merge_blobs(blobs) -> bytes:
    """Merge an iterable of serialized sketch states of one family."""
    it = iter(blobs)
    acc = from_bytes(next(it))
    for b in it:
        acc = acc.merge(from_bytes(b))
    return acc.to_bytes()


__all__ = [
    "BloomFilter",
    "CountMinSketch",
    "CountSketch",
    "IntCountSketch",
    "HyperLogLog",
    "KLL",
    "HopsSampler",
    "BottomKSampler",
    "TDigest",
    "MisraGries",
    "SKETCH_REGISTRY",
    "from_bytes",
    "merge_blobs",
    "base",
    "hashing",
]
