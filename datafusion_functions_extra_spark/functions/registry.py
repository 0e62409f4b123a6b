"""Function registry — analog of ``register_all_extra_functions``
(reference ``/root/reference/src/lib.rs:54-68``).

Two surfaces:

* :data:`FUNCTIONS` / :func:`all_extra_aggregate_functions` — the Python
  builder API (analog of ``expr_extra_fn``, ``src/lib.rs:33-40``).  This is
  the fast path: builders compose built-in JVM aggregates, nothing Python
  executes on workers.
* :func:`register_all` — opt-in SQL-text parity: registers Arrow-batched
  pandas GROUPED_AGG UDAFs under ``extra_*`` names so
  ``spark.sql("SELECT extra_skewness(x) ...")`` works.  These are correct
  but cross the JVM<->Python boundary per group-partition and do no partial
  aggregation — fine for interactive SQL, not the 100 TB path; use the
  builders for production plans.  (Reference-named registration such as
  ``mode``/``max_by`` would shadow Spark built-ins of the same name with
  different semantics, so the SQL names carry an explicit ``extra_``
  prefix; case-insensitive lookup matches the reference,
  ``tests/main.rs:48,60``.)
"""

from __future__ import annotations

import logging

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import _numerics as num
from .aggregates import kurtosis, kurtosis_pop, max_by, min_by, skewness

log = logging.getLogger(__name__)

#: name -> Column-builder, analog of ``all_extra_aggregate_functions()``
#: (``src/lib.rs:42-51``).  ``mode`` is a DataFrame-level operator
#: (operators.mode.mode_agg) because it needs two aggregation stages; its
#: SQL form is still registered by :func:`register_all`.
FUNCTIONS = {
    "max_by": max_by,
    "min_by": min_by,
    "skewness": skewness,
    "kurtosis": kurtosis,
    "kurtosis_pop": kurtosis_pop,
}


def all_extra_aggregate_functions():
    """List of (name, builder) pairs, mirroring ``src/lib.rs:42-51``."""
    return list(FUNCTIONS.items())


#: SQL type per variant suffix for the typed mode/max_by/min_by forms —
#: the SQL-registration analog of the reference's per-physical-type
#: accumulator dispatch (``src/mode.rs:101-213``).  A pandas UDAF needs a
#: fixed return type per registered name, so each type family gets its own
#: suffixed variant; the unsuffixed name is the string variant.
SQL_TYPE_VARIANTS: dict[str, str] = {
    "str": "string",
    "int": "bigint",
    "float": "double",
    "date": "date",
    "ts": "timestamp",
}


def _is_missing(y) -> bool:
    return y is None or (isinstance(y, float) and y != y)


def _extreme_by(values, orders, *, is_max: bool):
    """Deterministic arg-extreme: NULL/NaN ordering values ignored; ties on
    the ordering broken by preferring non-null x, then the larger (max) or
    smaller (min) x — matching the builders' deterministic=True mode."""
    pairs = []
    for x, y in zip(values, orders):
        if _is_missing(y):
            continue
        xk = float("-inf") if isinstance(x, float) and x != x else x
        pairs.append((y, x is not None, xk, x) if is_max else (y, x is None, xk, x))
    if not pairs:
        return None
    best = max(pairs) if is_max else min(pairs)
    return best[3]


def register_all(
    spark: SparkSession, prefix: str = "extra_", *, warn: bool = True
) -> list[str]:
    """Register SQL-callable pandas-UDAF forms of all six aggregates.

    .. warning:: The SQL forms are pandas GROUPED_AGG UDAFs: every group's
       full value list crosses the JVM↔Python boundary and there is **no
       partial (map-side) aggregation** — a skewed group concentrates on
       one task.  They exist for SQL-text parity with the reference
       (``tests/main.rs:48,60``); production plans should use the builder
       API (:data:`FUNCTIONS`) or :func:`~..operators.mode.mode_agg`,
       which compile to whole-stage-codegen JVM aggregates with partial
       aggregation.  ``register_all`` emits a ``logging`` warning to this
       effect once per call; pass ``warn=False`` to silence it.

    Numeric statistics drop NULLs before accumulating (matching the
    builders and the reference's ``.flatten()`` null-skip); mode, max_by
    and min_by are registered once per type family in
    :data:`SQL_TYPE_VARIANTS` (``extra_mode_int``, ``extra_max_by_float``,
    ...), with the unsuffixed name aliasing the string variant.  Returns
    the registered SQL names; overwrites are logged at debug level like
    the reference (``src/lib.rs:59-64``).

    ``prefix=""`` is the reference-verbatim opt-in: the reference's own
    SQL (``SELECT mode(x) …``, case-insensitive — its ``tests/main.rs:48``)
    then runs unchanged.  The ``extra_`` default exists because Spark ≥3.4
    ships built-in ``mode``/``max_by``/``min_by`` whose semantics differ
    (nondeterministic mode tie-break) — an unprefixed registration shadows
    them in the target session's function registry (temp functions win
    name resolution, and Spark refuses to DROP an override whose name
    matches a built-in), rerouting even ``F.max_by`` Column calls.  So
    register verbatim names into a dedicated ``spark.newSession()``
    (shared SparkContext, isolated registry) and run reference SQL there:

    >>> ref = spark.newSession()
    >>> register_all(ref, prefix="")
    >>> ref.sql("SELECT mode(x) FROM t")  # doctest: +SKIP
    """
    from pyspark.sql.functions import pandas_udf

    if warn:
        log.warning(
            "register_all: the %s* SQL aggregate forms are pandas "
            "GROUPED_AGG UDAFs without partial aggregation (whole groups "
            "cross the JVM<->Python boundary) — interactive-SQL "
            "convenience only. For production/large-scale plans use the "
            "builder API (datafusion_functions_extra_spark.FUNCTIONS) or "
            "mode_agg, which stay JVM-side with map-side combine. Pass "
            "warn=False to silence.",
            prefix,
        )

    @pandas_udf("double")
    def _skewness(v: pd.Series) -> float:
        return num.skewness_py(v.dropna().astype("float64").tolist())

    @pandas_udf("double")
    def _kurtosis(v: pd.Series) -> float:
        return num.kurtosis_py(v.dropna().astype("float64").tolist())

    @pandas_udf("double")
    def _kurtosis_pop(v: pd.Series) -> float:
        return num.kurtosis_pop_py(v.dropna().astype("float64").tolist())

    def _mode_udf(sql_type: str):
        @pandas_udf(sql_type)
        def _m(v: pd.Series) -> object:
            return num.mode_py(v.dropna().tolist())

        return _m

    def _max_by_udf(sql_type: str):
        @pandas_udf(sql_type)
        def _f(v: pd.Series, o: pd.Series) -> object:
            return _extreme_by(v.tolist(), o.tolist(), is_max=True)

        return _f

    def _min_by_udf(sql_type: str):
        @pandas_udf(sql_type)
        def _f(v: pd.Series, o: pd.Series) -> object:
            return _extreme_by(v.tolist(), o.tolist(), is_max=False)

        return _f

    udfs = {
        f"{prefix}skewness": _skewness,
        f"{prefix}kurtosis": _kurtosis,
        f"{prefix}kurtosis_pop": _kurtosis_pop,
        f"{prefix}mode": _mode_udf("string"),
        f"{prefix}max_by": _max_by_udf("string"),
        f"{prefix}min_by": _min_by_udf("string"),
    }
    for suffix, sql_type in SQL_TYPE_VARIANTS.items():
        udfs[f"{prefix}mode_{suffix}"] = _mode_udf(sql_type)
        udfs[f"{prefix}max_by_{suffix}"] = _max_by_udf(sql_type)
        udfs[f"{prefix}min_by_{suffix}"] = _min_by_udf(sql_type)

    registered = []
    for name, udf in udfs.items():
        log.debug("registering SQL aggregate %s (pandas GROUPED_AGG)", name)
        spark.udf.register(name, udf)
        registered.append(name)
    return registered
