"""cache.py contract: the tracked-persist registry is one module-global
list with a documented SINGLE-FLIGHT contract — sequential callers only;
release_all drains every tracked handle (the documented global behavior,
not per-caller scoping)."""

from __future__ import annotations

from pyspark import StorageLevel

from datafusion_functions_extra_spark import cache


def test_release_all_drains_registry(spark):
    cache.release_all()  # start clean
    a = cache.persist_tracked(spark.range(10))
    b = cache.persist_tracked(spark.range(20))
    a.count(), b.count()
    assert a.storageLevel != StorageLevel.NONE
    assert b.storageLevel != StorageLevel.NONE
    # the GLOBAL contract: one release_all call drains BOTH handles —
    # this is exactly why two concurrent queries must not interleave
    # (either one's release would unpersist the other's blocks)
    assert cache.release_all() == 2
    assert a.storageLevel == StorageLevel.NONE
    assert b.storageLevel == StorageLevel.NONE
    # idempotent on an empty registry
    assert cache.release_all() == 0


def test_persist_tracked_returns_same_plan(spark):
    df = spark.range(5)
    out = cache.persist_tracked(df)
    assert out.collect() == df.collect()
    cache.release_all()
