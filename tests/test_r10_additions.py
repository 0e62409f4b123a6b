"""Round-10 additions: the ANN-candidate-set KNN-Shapley production
path (the runnable counterpart the exact harness's docstring promises).

The replica below re-derives the WHOLE pipeline independently in NumPy —
hyperplane buckets, multi-probe candidate sets, truncated rank
recursion, exact recursion on the bounded test set, midrank Spearman,
top-D overlap — so the Spark/DuckDB pair is checked against a third
implementation, not just against each other.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from datafusion_functions_extra_spark import suite
from datafusion_functions_extra_spark.operators import similarity as SIM
from datafusion_functions_extra_spark.sources import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("test-r10", cpus=4)
    yield s


def _round_half_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _np_shapley_ann(sf_dir: str, k: int = 5):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.asarray(t["vec_id"])
    labels = np.asarray(t["label"])
    emb = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    n = len(ids)
    u = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    planes = np.asarray(SIM.HYPERPLANES, dtype=np.float64)
    # bucket bits from the RAW embedding (sign is normalization-invariant
    # only up to the exact dot; replicate the raw-embedding convention)
    dots = emb @ planes.T
    buckets = ((dots > 0) * (1 << np.arange(SIM.N_HYPERPLANES))).sum(axis=1)
    by_id = {int(ids[i]): i for i in range(n)}
    T = len(suite._SHAP_TEST_IDS)

    def suffix_values(ti, cand_idx, last_exact):
        """cand_idx sorted by (cos desc, id asc); returns {train_idx: snano}."""
        ind = (labels[cand_idx] == labels[ti]).astype(np.int64)
        m = len(cand_idx)
        terms = np.empty(m, dtype=np.int64)
        for pos in range(m):
            r = pos + 1
            if pos < m - 1:
                terms[pos] = _round_half_away(
                    float(ind[pos] - ind[pos + 1]) * min(k, r) * 1e9 / (k * r)
                )
            elif last_exact:
                terms[pos] = _round_half_away(float(ind[pos]) * 1e9 / m)
            else:
                terms[pos] = _round_half_away(
                    float(ind[pos]) * min(k, r) * 1e9 / (k * r)
                )
        suffix = np.cumsum(terms[::-1])[::-1]
        return {int(cand_idx[pos]): int(suffix[pos]) for pos in range(m)}

    a_tot = np.zeros(n, dtype=np.int64)
    e_tot = np.zeros(n, dtype=np.int64)
    n_retrieved = 0
    valued = set()
    for tid in suite._SHAP_TEST_IDS:
        ti = by_id[tid]
        probe_buckets = {int(buckets[ti])} | {
            int(buckets[ti]) ^ m for m in suite._SHAP_PROBE_MASKS
        }
        cand = [
            j
            for j in range(n)
            if j != ti and int(buckets[j]) in probe_buckets
        ]
        n_retrieved += len(cand)
        valued.update(cand)
        cos = np.round(u[ti] @ u.T, 6)
        if cand:
            cand_sorted = sorted(cand, key=lambda j: (-cos[j], ids[j]))
            for j, s in suffix_values(ti, np.array(cand_sorted), False).items():
                a_tot[j] += s
        full = sorted(
            (j for j in range(n) if j != ti), key=lambda j: (-cos[j], ids[j])
        )
        for j, s in suffix_values(ti, np.array(full), True).items():
            e_tot[j] += s

    def midranks2(v):
        # 2x-scaled midranks: 2*(#smaller) + (#tied) + 1
        order = np.sort(v)
        out = np.empty(len(v), dtype=np.int64)
        for i, x in enumerate(v):
            lo = np.searchsorted(order, x, "left")
            hi = np.searchsorted(order, x, "right")
            out[i] = 2 * lo + (hi - lo) + 1
        return out

    x, y = midranks2(a_tot).astype(float), midranks2(e_tot).astype(float)
    vx, vy = x - x.mean(), y - y.mean()
    den = math.sqrt((vx**2).sum() * (vy**2).sum())
    rho = float((vx * vy).sum() / den) if den > 0 else 0.0
    D = min(suite._SHAP_TOPD, n)
    top_e = set(sorted(range(n), key=lambda j: (-e_tot[j], ids[j]))[:D])
    top_a = set(sorted(range(n), key=lambda j: (-a_tot[j], ids[j]))[:D])
    return {
        "n_train": n,
        "n_test": T,
        "n_retrieved": n_retrieved,
        "coverage": n_retrieved / (T * (n - 1)),
        "frac_valued": len(valued) / n,
        "mean_shapley_exact": e_tot.sum() / 1e9 / T / n,
        "mean_shapley_ann": a_tot.sum() / 1e9 / T / n,
        "spearman_rho": rho,
        "top_decile_recall": len(top_e & top_a) / D,
    }


def test_knn_shapley_ann_matches_numpy_replica(spark):
    row = suite.QUERIES["embedding_knn_shapley_ann"](spark, SF).collect()[0]
    want = _np_shapley_ann(SF)
    assert row["n_train"] == want["n_train"]
    assert row["n_test"] == want["n_test"]
    assert row["n_retrieved"] == want["n_retrieved"]
    for col in (
        "coverage",
        "frac_valued",
        "mean_shapley_exact",
        "mean_shapley_ann",
        "spearman_rho",
        "top_decile_recall",
    ):
        assert math.isclose(row[col], want[col], abs_tol=2e-6), (
            col, row[col], want[col]
        )


def test_semantic_decontam_sweep_monotone(spark):
    rows = sorted(
        suite.QUERIES["embedding_semantic_decontam"](spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    assert [r["threshold"] for r in rows] == [
        t / 1e6 for t in suite._SDECON_THRESH_MICRO
    ]
    # flagged counts must be non-increasing in the threshold, and the
    # mean best-match cosine of the flagged set non-decreasing
    flags = [r["n_flagged"] for r in rows]
    assert flags == sorted(flags, reverse=True)
    means = [r["mean_max_cos_flagged"] for r in rows if r["n_flagged"] > 0]
    assert means == sorted(means)
    r0 = rows[0]
    assert r0["n_bench"] > 0 and r0["n_train"] > 0
    assert r0["n_candidate_points"] <= r0["n_train"]
    assert r0["n_flagged"] <= r0["n_candidate_points"]
    # every flagged point's best match is at least the threshold
    for r in rows:
        if r["n_flagged"]:
            assert r["mean_max_cos_flagged"] >= r["threshold"]


def test_facility_location_greedy_diminishing_returns(spark):
    rows = sorted(
        suite.QUERIES["embedding_facility_location_greedy"](
            spark, SF
        ).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == list(range(1, suite._FL_ROUNDS + 1))
    # greedy on a submodular objective has non-increasing marginal gains
    gains = [r["marginal_gain"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(gains, gains[1:])), gains
    # objective and coverage are monotone non-decreasing
    objs = [r["objective_mean"] for r in rows]
    covs = [r["coverage_frac"] for r in rows]
    assert objs == sorted(objs)
    assert covs == sorted(covs)
    assert 0.0 < covs[-1] <= 1.0
    # picks are distinct while gains are positive
    picked = [r["vec_id"] for r in rows if r["marginal_gain"] > 0]
    assert len(picked) == len(set(picked))


def test_partition_planning_arithmetic(spark):
    rows = {
        r["table_name"]: r
        for r in suite.QUERIES["tables_partition_planning"](
            spark, SF
        ).collect()
    }
    assert set(rows) == set(suite._PP_TABLES)
    for t, (fixed, scols) in suite._PP_TABLES.items():
        r = rows[t]
        assert r["n_rows"] > 0
        # avg row at least the fixed width + one prefix byte per string
        assert r["avg_row_bytes"] >= fixed + 4 * len(scols)
        assert r["partitions_128mib"] >= 1
        # partitions * rows_per_partition covers the table
        assert (
            r["partitions_128mib"] * r["rows_per_partition"] >= r["n_rows"]
        )
        # est_total_mib consistent with avg_row_bytes * n_rows
        est = r["avg_row_bytes"] * r["n_rows"] / 1048576.0
        assert abs(est - r["est_total_mib"]) / max(r["est_total_mib"], 1e-9) < 1e-3


def test_knn_shapley_ann_agreement_is_meaningful(spark):
    """The production path must actually agree with exact better than
    chance: positive rank correlation and nonzero top-D recall at the
    Hamming<=2 probe depth (measured 0.40/0.30 on sf0.1)."""
    row = suite.QUERIES["embedding_knn_shapley_ann"](spark, SF).collect()[0]
    assert 0.0 < row["coverage"] < 1.0
    assert row["spearman_rho"] > 0.1
    assert row["top_decile_recall"] > 0.0
    # truncated-recursion values only exist for retrieved points
    assert row["frac_valued"] <= 1.0
    # exact mean over the bounded test set is the harness's scale
    assert abs(row["mean_shapley_exact"]) < 1.0
