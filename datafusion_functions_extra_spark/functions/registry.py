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


def register_all(spark: SparkSession, prefix: str = "extra_") -> list[str]:
    """Register SQL-callable pandas-UDAF forms of all six aggregates.

    Returns the registered SQL names.  Overwrites are logged at debug level
    like the reference (``src/lib.rs:59-64``).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _skewness(v: pd.Series) -> float:
        return num.skewness_py(v.astype("float64").tolist())

    @pandas_udf("double")
    def _kurtosis(v: pd.Series) -> float:
        return num.kurtosis_py(v.astype("float64").tolist())

    @pandas_udf("double")
    def _kurtosis_pop(v: pd.Series) -> float:
        return num.kurtosis_pop_py(v.astype("float64").tolist())

    @pandas_udf("string")
    def _mode_str(v: pd.Series) -> str:
        return num.mode_py(v.tolist())

    @pandas_udf("string")
    def _max_by_str(v: pd.Series, o: pd.Series) -> str:
        pairs = [(x, y) for x, y in zip(v.tolist(), o.tolist()) if y is not None]
        if not pairs:
            return None
        return max(pairs, key=lambda p: (p[1], p[0] is not None, p[0]))[0]

    @pandas_udf("string")
    def _min_by_str(v: pd.Series, o: pd.Series) -> str:
        pairs = [(x, y) for x, y in zip(v.tolist(), o.tolist()) if y is not None]
        if not pairs:
            return None
        return min(pairs, key=lambda p: (p[1], p[0] is None, p[0]))[0]

    udfs = {
        f"{prefix}skewness": _skewness,
        f"{prefix}kurtosis": _kurtosis,
        f"{prefix}kurtosis_pop": _kurtosis_pop,
        f"{prefix}mode": _mode_str,
        f"{prefix}max_by": _max_by_str,
        f"{prefix}min_by": _min_by_str,
    }
    registered = []
    for name, udf in udfs.items():
        log.debug("registering SQL aggregate %s (pandas GROUPED_AGG)", name)
        spark.udf.register(name, udf)
        registered.append(name)
    return registered
