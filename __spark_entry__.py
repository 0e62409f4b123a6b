"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`datafusion_functions_extra_spark.suite`, which holds
one (PySpark callable, DuckDB oracle SQL) pair per implemented operator
from SURVEY.md §2 plus the training-data-pipeline extras.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_functions_extra_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    mode + max_by + skewness + kurtosis_pop grouped by l_linestatus over
    lineitem — exercises both the two-stage mode plan and the one-shuffle
    moment pipeline (SURVEY.md §7 phase 0).
    """
    return suite.QUERIES["flagship_lineitem_profile"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(suite.ORACLES)
