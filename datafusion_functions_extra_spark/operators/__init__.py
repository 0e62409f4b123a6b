"""DataFrame-level operators (multi-stage aggregations, dedup, similarity)."""

from .mode import mode_agg  # noqa: F401
