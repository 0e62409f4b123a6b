"""Data sources: parquet catalog over the driver's synthetic tables."""

from .catalog import (  # noqa: F401
    BROADCAST_TABLES,
    TABLES,
    get_spark,
    load_table,
    load_tables,
    register_views,
    widen_for_compute,
)
