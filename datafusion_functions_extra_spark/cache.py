"""Tracked persist: a registry for intermediate DataFrames that a lazy
query plan must cache (self-joined candidate graphs, iterated labels)
but that the QUERY FUNCTION cannot unpersist itself — the caller only
consumes the returned DataFrame, so an untracked ``persist()`` block
would sit in executor storage memory for the life of the session.  A
full suite/bench sweep calls :func:`release_all` after consuming each
result, bounding cached storage to one query's working set.

SINGLE-FLIGHT CONTRACT: the registry is one module-global list shared
by every query in the process.  The bench harness and the driver both
run queries strictly sequentially (build -> consume -> release_all), so
at any instant the list holds exactly one query's handles.  Running two
suite queries CONCURRENTLY in one session would let either caller's
``release_all`` unpersist the other's still-needed blocks — results
stay correct (unpersist only forces recomputation) but the cache's
purpose is defeated.  Callers that need concurrency must scope their
own registry (build the query, hold the returned handles, unpersist
those) instead of the module-global convenience path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + enrol the handle for a later :func:`release_all`."""
    out = df.persist()
    _PERSISTED.append(out)
    return out


def release_all() -> int:
    """Unpersist every tracked block; returns how many were released.
    Safe to call at any time — releasing a cache never changes results,
    only forces recomputation if the plan is re-executed."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def loop_conf(spark, *leaves):
    """Context manager scoping an iterative driver loop (components,
    pagerank, greedy selection, GD): AQE off + a static shuffle-partition
    count derived from the materialized input LEAVES' own partitioning
    (itself AQE-coalesced from bytes when the leaf was checkpointed) —
    scale-adaptive, not a constant: a 100 TB edge leaf keeps its
    thousands of partitions, a bench-scale graph gets 1.

    Why: with AQE on, EVERY eager localCheckpoint inside a loop
    materializes each of its 2-4 exchanges as a separate job and re-plans
    between them (spatial_dbscan measured 107 jobs/query, r11); the loop
    relations are leaves whose sizes are already known, so per-round
    re-optimization buys nothing.  With AQE off, a round's lazy
    checkpoints chain and the round's one action (or the consumer's final
    collect) executes them as ONE job.  Session confs are saved/restored
    (the streaming drain's pattern); results are partitioning-invariant
    (keyed joins/aggregates).
    """
    from contextlib import contextmanager

    @contextmanager
    def _scope():
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        parts = max(df.rdd.getNumPartitions() for df in leaves)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            yield
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    return _scope()
