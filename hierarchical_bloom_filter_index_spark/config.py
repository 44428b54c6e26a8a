"""Engine configuration — the analog of the reference's validated
HbiConfiguration (PMIndex/HbiConfiguration.java:60-76).

Geometry: a "tree" covers ``tree_span`` consecutive tokens (power of two);
level L (0 = coarsest) splits it into intervals of ``tree_span >> L`` down to
``leaf_span`` (tree/TreeLayout.java:21-35). A window id at level L is just
``global_pos // span(L)`` — pure integer arithmetic, no stateful tree object,
so windows parallelize trivially across executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


@dataclass(frozen=True)
class HbiConfig:
    tree_span: int = 1024       # T: tokens per top-level window
    leaf_span: int = 64         # finest window span
    fpr: float = 0.01           # design false-positive rate per Bloom filter
    vocab: int = 200_000        # expected alphabet size (tokens are int32)
    seed: int = 42
    ngram: int = 1              # n-gram unit indexed (1 = raw tokens)
    ngram_base_bits: int = 21   # bits per symbol when packing n-grams
    stride: int = 1             # index every stride-th n-gram (PMIndex/HBI.java:45 strides)
    axis: str = "doc"           # 'doc': per-document positions; 'global': one stream
    # uniform_bloom: ONE shared (m,k) for every level, designed for the
    # capacity of level ``uniform_level``. Parents can then be OR-rolled-up
    # from children (operators.build.build_index_rollup): ONE data pass +
    # log-depth sketch-table passes. The design-level choice is the tradeoff:
    #   uniform_level=0 (coarsest): every level keeps its design FPR, leaves
    #     overspend memory, blobs are big — rollup shuffles cost more;
    #   uniform_level=deepest (leaf-sized, the reference's layout): blobs are
    #     tiny and the rollup is nearly free, but coarse filters saturate —
    #     they stop pruning (the cost model sees fill_fpr -> 1 and seeds
    #     deeper), never return wrong answers (verification is exact).
    uniform_bloom: bool = False
    uniform_level: int = 0      # level whose capacity sizes the shared (m,k)
    # Declared corpus contract: every NONEMPTY document has at least this
    # many tokens. Optional; when set, the global-axis stream stitcher sizes
    # its successor-join rounds from it instead of running a per-query
    # min(n_tok) scan. Declaring a value LARGER than the true minimum can
    # under-stitch and miss matches/n-grams spanning 3+ documents — only
    # declare what the pipeline guarantees.
    min_doc_tokens: int | None = None

    def __post_init__(self):
        if not _is_pow2(self.tree_span) or not _is_pow2(self.leaf_span):
            raise ValueError("tree_span and leaf_span must be powers of two")
        if self.leaf_span > self.tree_span:
            raise ValueError("leaf_span must be <= tree_span")
        if not (0.0 < self.fpr < 1.0):
            raise ValueError("fpr must be in (0,1)")
        if self.ngram < 1 or self.ngram * self.ngram_base_bits > 64:
            raise ValueError("invalid ngram / base bits")
        if self.stride < 1 or (self.stride > 1 and self.stride > self.ngram):
            raise ValueError("stride must be 1 or in [2, ngram]")
        if self.axis not in ("doc", "global"):
            raise ValueError("axis must be 'doc' or 'global'")
        if self.min_doc_tokens is not None and self.min_doc_tokens < 1:
            raise ValueError("min_doc_tokens must be >= 1 when set")

    @property
    def n_levels(self) -> int:
        return (self.tree_span // self.leaf_span).bit_length()  # log2 + 1

    def span(self, level: int) -> int:
        """Interval span at level L (0 = coarsest = tree_span)."""
        return self.tree_span >> level

    @property
    def levels(self) -> list[int]:
        return list(range(self.n_levels))

    @property
    def deepest(self) -> int:
        return self.n_levels - 1

    def bloom_capacity(self, level: int) -> int:
        """Expected distinct keys per (level, window) filter: at most the
        window span and at most the alphabet (PMIndex/HBI.java:693-702)."""
        return max(16, min(self.vocab, self.span(level)))

    def with_(self, **kw) -> "HbiConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = HbiConfig()
