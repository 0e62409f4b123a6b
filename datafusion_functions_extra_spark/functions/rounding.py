"""Cross-engine-stable rounding for oracle-checked ratio columns.

Spark rounds doubles via decimal HALF_UP on the shortest representation;
DuckDB rounds the binary value (half away from zero).  For *ratios of
aggregates* (avg, slope, z-score, share/rate, interpolated percentile) the
true value can terminate exactly on a ``.5e-6`` decimal boundary, where the
two schemes disagree — and cross-engine partial-sum order drift (~1e-13)
additionally makes the boundary side nondeterministic run-to-run.

``r6n`` nudges the value away from zero by 1e-9 before rounding
(sign-symmetric, so negatives behave like DuckDB's half-away-from-zero);
``r6n_sql`` is its DuckDB twin, spliced into oracle SQL via f-string so the
two sides can never desynchronize.  Sums of fixed-point decimals don't need
the nudge — their true value sits ≥ (1e-6 − drift) away from any boundary —
and should use a plain ``round``.

This failure class is SURVEY §8.3; the r02 driver hash caught it live on
``events_user_trend``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r6n(c) -> Column:
    """Round ``c`` to 6 dp with the sign-symmetric 1e-9 boundary nudge.

    The trailing ``+ 0.0`` normalizes IEEE 754 signed zero: a value whose
    sign differs between engines only through ~1e-13 partial-sum drift can
    round to ``0.0`` on one side and ``-0.0`` on the other — numerically
    equal, but distinct to any value-serializing hash (the r03 driver
    caught this live on ``events_user_trend``).  ``-0.0 + 0.0 == +0.0``.
    """
    col = c if isinstance(c, Column) else F.col(c)
    return F.round(col + F.signum(col) * F.lit(1e-9), 6) + F.lit(0.0)


def r6n_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`r6n` for splicing into oracle SQL."""
    return f"(round(({expr}) + sign({expr}) * 1e-9, 6) + 0.0)"
