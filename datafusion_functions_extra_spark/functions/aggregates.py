"""The extra aggregate functions as JVM-side Column builders.

Each builder returns a single :class:`pyspark.sql.Column` built purely from
built-in Spark aggregate expressions plus a scalar finishing expression, so
it can be dropped into ``df.agg(...)`` or ``df.groupBy(...).agg(...)`` like
any native aggregate.  Because the moment statistics decompose into
``count``/``sum(x^k)`` (the reference's own accumulator state,
``/root/reference/src/kurtosis.rs:87-101``), Spark plans them as ordinary
two-phase hash aggregates: partial map-side combine, one shuffle of ~5
doubles per group, final merge, whole-stage-codegen finisher.  No Python
runs on executors — this is the 100 TB path.

Semantics are pinned to the reference (which copies DuckDB):

* ``skewness``  — sample skewness with bias correction
  (``src/skewness.rs:140-160``); NOT Spark's population ``F.skewness``.
* ``kurtosis``  — sample excess kurtosis with bias correction
  (``src/kurtosis.rs:163-186``); NOT Spark's population ``F.kurtosis``.
* ``kurtosis_pop`` — population excess kurtosis m4/m2^2 - 3
  (``src/kurtosis_pop.rs:166-183``); equivalent to Spark's ``F.kurtosis``
  but re-derived from raw power sums with the reference's NULL guards.
* ``max_by``/``min_by`` — value of x at extremal y.  Deviation note: the
  reference treats a NULL ordering value as *greatest* (rewrite to
  ``last_value .. NULLS LAST``, ``src/max_min_by.rs:90-113``); we pin the
  Spark/DuckDB semantics instead (NULL y ignored) — see SURVEY.md §2 row 2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _dbl(c: ColumnOrName) -> Column:
    # Mirrors the exact([Float64]) signature coercion (src/skewness.rs:55-59):
    # ints are implicitly cast to double before accumulation.
    return _col(c).cast("double")


def _power_sums(x: Column, order: int):
    """count + raw power sums Σx^k, k=1..order — the shuffled partial state."""
    n = F.count(x)
    sums = []
    acc = x
    for k in range(1, order + 1):
        sums.append(F.sum(acc))
        if k < order:
            acc = acc * x
    return n, sums


def skewness(col: ColumnOrName) -> Column:
    """Bias-corrected sample skewness (reference ``src/skewness.rs:23-193``).

    NULLs skipped; n <= 2 -> NULL; zero variance -> NULL; the variance^3
    term is clamped at 0 before sqrt (``src/skewness.rs:146-149``).
    """
    x = _dbl(col)
    n, (s1, s2, s3) = _power_sums(x, 3)
    cnt = n.cast("double")
    t1 = F.lit(1.0) / cnt
    # _sq chains mirror Rust powi's repeated-squaring ((x^2)^2, x^2*x) for
    # bit-exact parity with the reference's golden outputs.
    var = t1 * (s2 - s1 * s1 * t1)
    p = F.greatest(F.lit(0.0), (var * var) * var)
    div = F.sqrt(p)
    t2 = F.sqrt(cnt * (cnt - F.lit(1.0))) / (cnt - F.lit(2.0))
    s1_cub = (s1 * s1) * s1
    res = t2 * t1 * (s3 - F.lit(3.0) * s2 * s1 * t1 + F.lit(2.0) * s1_cub * t1 * t1) / div
    return F.when((n > F.lit(2)) & (div != F.lit(0.0)), res)


def _m4_m2(n: Column, s1: Column, s2: Column, s3: Column, s4: Column):
    c64 = F.lit(1.0) / n.cast("double")
    s1_sq = s1 * s1
    c64_sq = c64 * c64
    m4 = c64 * (
        s4
        - F.lit(4.0) * s3 * s1 * c64
        + F.lit(6.0) * s2 * s1_sq * c64_sq
        - F.lit(3.0) * (s1_sq * s1_sq) * (c64_sq * c64)
    )
    m2 = (s2 - s1_sq * c64) * c64
    return m4, m2


def kurtosis(col: ColumnOrName) -> Column:
    """Bias-corrected sample excess kurtosis (reference ``src/kurtosis.rs:22-201``).

    NULLs skipped; n <= 3 -> NULL; m2 <= 0 -> NULL.
    """
    x = _dbl(col)
    n, (s1, s2, s3, s4) = _power_sums(x, 4)
    m4, m2 = _m4_m2(n, s1, s2, s3, s4)
    cnt = n.cast("double")
    numerator = (cnt - F.lit(1.0)) * (
        (cnt + F.lit(1.0)) * m4 / (m2 * m2) - F.lit(3.0) * (cnt - F.lit(1.0))
    )
    denominator = (cnt - F.lit(2.0)) * (cnt - F.lit(3.0))
    # guard m2*m2, not just m2: a subnormal variance squares to exactly
    # 0.0 and ANSI mode turns the IEEE x/0.0 into a runtime error
    return F.when(
        (n > F.lit(3)) & (m2 > F.lit(0.0)) & (m2 * m2 > F.lit(0.0)),
        numerator / denominator,
    )


def kurtosis_pop(col: ColumnOrName) -> Column:
    """Population excess kurtosis m4/m2^2 - 3 (reference ``src/kurtosis_pop.rs:21-199``).

    NULLs skipped; n < 1 -> NULL; m2 <= 0 -> NULL (single value -> NULL).
    """
    x = _dbl(col)
    n, (s1, s2, s3, s4) = _power_sums(x, 4)
    m4, m2 = _m4_m2(n, s1, s2, s3, s4)
    return F.when(
        (n >= F.lit(1)) & (m2 > F.lit(0.0)) & (m2 * m2 > F.lit(0.0)),
        m4 / (m2 * m2) - F.lit(3.0),
    )


def max_by(
    col: ColumnOrName,
    ord: ColumnOrName,
    *,
    deterministic: bool = False,
    null_wins: bool = False,
) -> Column:
    """Value of ``col`` at maximum ``ord`` (reference ``src/max_min_by.rs:6-114``).

    NULL ordering values are ignored by default (Spark/DuckDB semantics;
    documented deviation from the reference, SURVEY.md §2 row 2).  Pass
    ``null_wins=True`` for the reference's exact semantics: its simplify
    rewrites ``max_by(x, y)`` to ``last_value(x ORDER BY y ASC NULLS
    LAST)`` (``src/max_min_by.rs:90-113``), so a row with NULL ``y``
    *wins* — pinned by ``tests/main.rs:177-190`` where ``max_by`` over
    ``(1,10),(2,NULL),(3,15),(NULL,8)`` returns ``2``.  Realized here as
    max on the sort key ``struct(y IS NULL, y)``: (true, NULL) orders
    above every (false, y).

    With ``deterministic=True``, ties on the ordering are broken by the
    larger ``col`` so results are reproducible across shuffles/engines
    (composes with ``null_wins``; the reference's last_value pick among
    tied rows is storage-order-dependent, so any tie-break is an
    implementation choice).
    """
    x, y = _col(col), _col(ord)
    if null_wins:
        key = [y.isNull().alias("nw"), y.alias("o")]
        if deterministic:
            key.append(x.alias("v"))
        return F.max_by(x, F.struct(*key))
    if deterministic:
        return F.max_by(x, F.when(y.isNotNull(), F.struct(y.alias("o"), x.alias("v"))))
    return F.max_by(x, y)


def min_by(
    col: ColumnOrName,
    ord: ColumnOrName,
    *,
    deterministic: bool = False,
    null_wins: bool = False,
) -> Column:
    """Value of ``col`` at minimum ``ord`` (reference ``src/max_min_by.rs:116-212``).

    NULL ordering values are ignored by default.  ``null_wins=True``
    mirrors the reference's ``last_value(x ORDER BY y DESC NULLS LAST)``
    rewrite (``src/max_min_by.rs:188-211``) where a NULL-``y`` row wins
    (``tests/main.rs:192-205``: ``min_by`` over the same grid also
    returns ``2``); sort key ``struct(y IS NOT NULL, y)`` puts
    (false, NULL) below every (true, y).  ``deterministic=True`` breaks
    ties on the ordering by the smaller ``col``.
    """
    x, y = _col(col), _col(ord)
    if null_wins:
        key = [y.isNotNull().alias("nw"), y.alias("o")]
        if deterministic:
            key.append(x.alias("v"))
        return F.min_by(x, F.struct(*key))
    if deterministic:
        return F.min_by(x, F.when(y.isNotNull(), F.struct(y.alias("o"), x.alias("v"))))
    return F.min_by(x, y)
