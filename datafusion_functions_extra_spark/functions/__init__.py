"""Column-builder functions (aggregates, text analysis, vector math)."""

from .aggregates import kurtosis, kurtosis_pop, max_by, min_by, skewness  # noqa: F401
from .distribution import (  # noqa: F401
    discrete_percentile_cutoffs,
    global_cumsum,
    global_rank,
)
from .registry import FUNCTIONS, all_extra_aggregate_functions, register_all  # noqa: F401
