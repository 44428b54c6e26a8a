"""Statistical design helpers + numeric solvers — the rebuild of the
reference's DKW/Chebyshev designers (utilities/Utils.java:
requiredSampleSizeForDKW, designBucketsForRankTargetChebyshev) and the
block-length root solvers (solvers/PatternPruner*.java:20-60). Pure Python,
dependency-light (no scipy), used at config/planning time only.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence


def required_sample_size_dkw(eps: float, delta: float) -> int:
    """DKW inequality: n >= ln(2/delta) / (2 eps^2) guarantees the empirical
    CDF is within eps of the true CDF everywhere w.p. >= 1-delta."""
    if not (0 < eps < 1 and 0 < delta < 1):
        raise ValueError("eps, delta must be in (0,1)")
    return math.ceil(math.log(2.0 / delta) / (2.0 * eps * eps))


def design_buckets_chebyshev(n_distinct: int, eps: float, delta: float) -> int:
    """Bucket count B for a one-permutation sampler so that the occupied
    bucket count concentrates: occupancy mean m(1-(1-1/m)^n), variance
    bounded; choose the smallest B (power of two) whose Chebyshev bound on
    the rank-estimate sample meets (eps, delta) via DKW sample size."""
    need = required_sample_size_dkw(eps, delta)
    b = 1
    while True:
        m = 1 << b
        expected_occupied = m * (1.0 - (1.0 - 1.0 / m) ** max(1, n_distinct))
        if expected_occupied >= min(need, 0.63 * n_distinct) or m >= (1 << 24):
            return b
        b += 1


def bisection(f: Callable[[float], float], lo: float, hi: float, tol: float = 1e-9, max_iter: int = 200) -> float:
    """Plain bisection (solvers/PatternPruner.java bisection path)."""
    flo, fhi = f(lo), f(hi)
    if flo == 0:
        return lo
    if fhi == 0:
        return hi
    if flo * fhi > 0:
        raise ValueError(f"no sign change on [{lo}, {hi}]")
    for _ in range(max_iter):
        mid = 0.5 * (lo + hi)
        fm = f(mid)
        if fm == 0 or (hi - lo) < tol:
            return mid
        if flo * fm < 0:
            hi = mid
        else:
            lo, flo = mid, fm
    return 0.5 * (lo + hi)


def newton_with_fallback(
    f: Callable[[float], float],
    fprime: Callable[[float], float],
    x0: float,
    lo: float,
    hi: float,
    tol: float = 1e-9,
    max_iter: int = 100,
) -> float:
    """Newton iteration guarded by the bracket; falls back to bisection when
    a step leaves [lo, hi] (the Hybrid solver, solvers/PatternPrunerHybrid.java)."""
    x = x0
    for _ in range(max_iter):
        fx = f(x)
        if abs(fx) < tol:
            return x
        d = fprime(x)
        nxt = x - fx / d if d != 0 else None
        if nxt is None or not (lo <= nxt <= hi):
            return bisection(f, lo, hi, tol)
        x = nxt
    return x


def block_length_for_target(probs: Sequence[float], target: float, max_b: float = 2**30) -> float:
    """Solve prod_i (1 - (1 - p_i)^b) = target for b — the block-length
    design equation of solvers/PatternPruner.java:20-60. Monotone increasing
    in b, so a bisection bracket always exists for target in (0, 1)."""
    probs = [min(max(p, 1e-15), 1 - 1e-15) for p in probs]
    if not (0.0 < target < 1.0):
        raise ValueError("target must be in (0,1)")

    def f(b: float) -> float:
        return math.fsum(math.log1p(-((1.0 - p) ** b)) for p in probs) - math.log(target)

    if f(max_b) < 0:
        return max_b
    return bisection(f, 1e-9, max_b, tol=1e-6)
