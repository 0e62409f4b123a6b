"""Round-6k: DBSCAN over spatial points — Python replica on sf0.001."""

from collections import defaultdict

import pytest

from tests.test_r5u_spatial import _points


def _dbscan_py(pts, eps, minpts):
    ids = sorted(pts)
    nb = {
        a: {
            b
            for b in ids
            if b != a
            and (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
            <= eps * eps
        }
        for a in ids
    }
    core = {a for a in ids if len(nb[a]) + 1 >= minpts}
    # components over core-core edges (min-label to fixpoint)
    lbl = {c: c for c in core}
    changed = True
    while changed:
        changed = False
        for a in core:
            m = min(
                [lbl[a]] + [lbl[b] for b in nb[a] if b in core]
            )
            if m < lbl[a]:
                lbl[a] = m
                changed = True
    out = {}
    for a in ids:
        if a in core:
            out[a] = ("core", lbl[a])
        else:
            cs = [lbl[b] for b in nb[a] if b in core]
            out[a] = ("border", min(cs)) if cs else ("noise", None)
    return out


def test_dbscan_matches_python(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import (
        _DBSCAN_MINPTS,
        _dbscan_eps,
        QUERIES,
    )

    got = {
        r.pid: (r.role, r.cluster)
        for r in QUERIES["spatial_dbscan"](spark, sf).collect()
    }
    pts = _points(spark, sf)
    want = _dbscan_py(pts, _dbscan_eps(len(pts)), _DBSCAN_MINPTS)
    assert got == want


def test_dbscan_finds_clusters_with_wide_eps(spark):
    # at eps=8 degrees on the 15-point fixture the composition must
    # yield at least one multi-point cluster AND some noise, exercising
    # all three roles through the production operators
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.operators.spatial import (
        geo_points,
        radius_candidates,
    )
    from pyspark.sql import functions as F

    eps, minpts = 8_000_000, 3
    pts = geo_points(
        spark.read.parquet(f"{sf}/events.parquet"), "user_id"
    ).localCheckpoint(eager=True)
    nb = (
        radius_candidates(pts, eps)
        .where((F.col("pa") != F.col("pb")) & (F.col("d2") <= eps * eps))
        .select("pa", "pb")
        .localCheckpoint(eager=True)
    )
    core = (
        nb.groupBy("pa")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") + 1 >= minpts)
        .select(F.col("pa").alias("pid"))
    )
    ce = (
        nb.join(core.select(F.col("pid").alias("pa")), "pa")
        .join(core.select(F.col("pid").alias("pb")), "pb")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("id_a"), F.col("pb").alias("id_b"))
    )
    comp = SIM.components_from_pairs(
        core.select(F.col("pid").alias("id")), ce
    )
    got = {r.id: r.component for r in comp.collect()}

    want_full = _dbscan_py(_points(spark, sf), eps, minpts)
    want = {a: c for a, (role, c) in want_full.items() if role == "core"}
    assert got == want
    sizes = defaultdict(int)
    for c in got.values():
        sizes[c] += 1
    assert max(sizes.values(), default=0) >= 2
    assert any(role == "noise" for role, _ in want_full.values())
