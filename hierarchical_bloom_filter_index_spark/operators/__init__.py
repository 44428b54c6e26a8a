from .build import (
    build_index,
    build_index_rollup,
    compact_index,
    index_stats,
    level_params,
    level_seed,
    merge_global_rows,
)
from .batch import (
    global_pattern_search_batch,
    global_window_membership_batch,
    pattern_search_batch,
    window_membership_batch,
)
from .approx import global_kmismatch_pattern_search, kmismatch_pattern_search
from .probe import probe_blobs
from .rollup import build_hll_window_index, window_distinct_estimates
from .route import (
    brute_force_search,
    deepest_usable_level,
    frequency_summary,
    global_pattern_search,
    global_window_membership,
    pattern_keys,
    pattern_probe_plan,
    pattern_search,
    window_membership,
)

__all__ = [
    "build_index",
    "build_index_rollup",
    "merge_global_rows",
    "compact_index",
    "index_stats",
    "level_params",
    "level_seed",
    "probe_blobs",
    "kmismatch_pattern_search",
    "global_kmismatch_pattern_search",
    "build_hll_window_index",
    "window_distinct_estimates",
    "brute_force_search",
    "deepest_usable_level",
    "global_pattern_search_batch",
    "global_window_membership",
    "global_window_membership_batch",
    "pattern_search_batch",
    "global_pattern_search",
    "pattern_probe_plan",
    "frequency_summary",
    "pattern_keys",
    "pattern_search",
    "window_membership",
    "window_membership_batch",
]
