"""Pure-Python finishing formulas for the moment-based aggregates.

These mirror, term for term, the reference accumulators' ``evaluate()``
(reference ``src/skewness.rs:140-160``, ``src/kurtosis.rs:163-186``,
``src/kurtosis_pop.rs:166-183``, themselves copied from DuckDB), so
correctness tests can check the math without a SparkSession, and the
pandas-UDAF SQL-parity path (registry.py) can share one implementation.

All functions take raw power sums (the reference's accumulator state,
``src/skewness.rs:89-101``, ``src/kurtosis.rs:87-101``) and return a float
or ``None`` (NULL) exactly where the reference returns
``ScalarValue::Float64(None)``.
"""

from __future__ import annotations

import math
from collections.abc import Iterable


def power_sums(values: Iterable[float | None], order: int = 4):
    """(n, s1..s_order) over non-null values — reference ``update_batch``."""
    n = 0
    sums = [0.0] * order
    for v in values:
        if v is None:
            continue
        v = float(v)
        n += 1
        acc = 1.0
        for k in range(order):
            acc *= v
            sums[k] += acc
    return (n, *sums)


def _powi(x: float, k: int) -> float:
    """x^k by repeated squaring — matches Rust's ``powi`` expansion
    ((x^2)^2 for k=4, x^2*x for k=3), which differs from libm ``pow`` in
    the last ulp; required for bit-exact golden parity."""
    result = 1.0
    base = x
    while k:
        if k & 1:
            result = base if result == 1.0 else result * base
        k >>= 1
        if k:
            base = base * base
    return result


def skewness_from_sums(n: int, s1: float, s2: float, s3: float) -> float | None:
    """Sample skewness with bias correction (reference src/skewness.rs:140-160).

    n <= 2 -> None; zero variance -> None; variance^3 clamped at 0 before sqrt.
    """
    if n <= 2:
        return None
    count = float(n)
    t1 = 1.0 / count
    p = max(_powi(t1 * (s2 - s1 * s1 * t1), 3), 0.0)
    div = math.sqrt(p)
    if div == 0.0:
        return None
    t2 = math.sqrt(count * (count - 1.0)) / (count - 2.0)
    return t2 * t1 * (s3 - 3.0 * s2 * s1 * t1 + 2.0 * _powi(s1, 3) * t1 * t1) / div


def _m4_m2(n: int, s1: float, s2: float, s3: float, s4: float):
    count_64 = 1.0 / float(n)
    m4 = count_64 * (
        s4
        - 4.0 * s3 * s1 * count_64
        + 6.0 * s2 * _powi(s1, 2) * _powi(count_64, 2)
        - 3.0 * _powi(s1, 4) * _powi(count_64, 3)
    )
    m2 = (s2 - _powi(s1, 2) * count_64) * count_64
    return m4, m2


def kurtosis_from_sums(
    n: int, s1: float, s2: float, s3: float, s4: float
) -> float | None:
    """Sample excess kurtosis, bias-corrected (reference src/kurtosis.rs:163-186).

    n <= 3 -> None; m2 <= 0 -> None.
    """
    if n <= 3:
        return None
    m4, m2 = _m4_m2(n, s1, s2, s3, s4)
    # m2 * m2 (not just m2) must be positive: a subnormal variance
    # (~1e-170 or below) squares to exactly 0.0 and the division would
    # blow up — Spark ANSI mode errors on x/0.0, so the builders guard
    # the squared term and we mirror them here (hypothesis-found)
    if m2 <= 0.0 or m2 * m2 <= 0.0:
        return None
    count = float(n)
    numerator = (count - 1.0) * ((count + 1.0) * m4 / (m2 * m2) - 3.0 * (count - 1.0))
    denominator = (count - 2.0) * (count - 3.0)
    return numerator / denominator


def kurtosis_pop_from_sums(
    n: int, s1: float, s2: float, s3: float, s4: float
) -> float | None:
    """Population excess kurtosis (reference src/kurtosis_pop.rs:166-183).

    n < 1 -> None; m2 <= 0 -> None (so a single value yields NULL).
    """
    if n < 1:
        return None
    m4, m2 = _m4_m2(n, s1, s2, s3, s4)
    if m2 <= 0.0 or m2 * m2 <= 0.0:  # subnormal-variance guard, see above
        return None
    return m4 / (m2 * m2) - 3.0


def skewness_py(values: Iterable[float | None]) -> float | None:
    n, s1, s2, s3, _ = power_sums(values)
    return skewness_from_sums(n, s1, s2, s3)


def kurtosis_py(values: Iterable[float | None]) -> float | None:
    return kurtosis_from_sums(*power_sums(values))


def kurtosis_pop_py(values: Iterable[float | None]) -> float | None:
    return kurtosis_pop_from_sums(*power_sums(values))


def mode_py(values: Iterable[object]) -> object | None:
    """Most frequent non-null value; tie -> max value (reference src/mode.rs:33-34)."""
    counts: dict[object, int] = {}
    for v in values:
        if v is None:
            continue
        counts[v] = counts.get(v, 0) + 1
    if not counts:
        return None
    return max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
