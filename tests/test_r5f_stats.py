"""Brute-force Python cross-checks for the round-5f batch: lagged
cross-correlation, growth accounting, Simpson slopes, DiD, and the
Holt-Winters trajectory — each replicated row-by-row from collected
sf0.001 data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_functions_extra_spark import suite
from datafusion_functions_extra_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
DAY_US = 86400000000


def _daily(spark, etype=None):
    e = load_table(spark, SF_DIR, "events")
    if etype:
        e = e.where(F.col("event_type") == etype)
    us = F.unix_micros("ts")
    day = ((us - F.pmod(us, F.lit(DAY_US))) / F.lit(DAY_US)).cast("long")
    return (
        e.select("event_type", day.alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )


def test_ccf_matches_bruteforce(spark):
    got = {
        r.lag: r
        for r in suite.QUERIES["events_lagged_cross_correlation"](
            spark, SF_DIR
        ).collect()
    }
    p = {r.d: r.c for r in _daily(spark, "purchase")}
    c = {r.d: r.c for r in _daily(spark, "click")}
    for lag in range(-7, 8):
        pairs = [(p[d], c[d + lag]) for d in p if d + lag in c]
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        corr = (n * sxy - sx * sy) / math.sqrt(
            float((n * sxx - sx * sx) * (n * syy - sy * sy))
        )
        assert got[lag].n_days == n
        assert abs(got[lag].corr - corr) < 1e-5


def test_growth_accounting_matches_bruteforce(spark):
    rows = {
        r.week: r
        for r in suite.QUERIES["users_growth_accounting"](spark, SF_DIR).collect()
    }
    e = load_table(spark, SF_DIR, "events")
    us = F.unix_micros("ts")
    day = ((us - F.pmod(us, F.lit(DAY_US))) / F.lit(DAY_US)).cast("long")
    uw = {
        (r.user_id, r.w)
        for r in e.select(
            "user_id",
            ((day - F.pmod(day, F.lit(7))) / 7).cast("long").alias("w"),
        )
        .distinct()
        .collect()
    }
    weeks = sorted({w for _, w in uw})
    first = {}
    for u, w in sorted(uw, key=lambda t: t[1]):
        first.setdefault(u, w)
    for w in weeks:
        act = {u for u, ww in uw if ww == w}
        prev = {u for u, ww in uw if ww == w - 1}
        new = {u for u in act if first[u] == w}
        ret = act & prev
        res = act - new - ret
        ch = {u for u in prev if u not in act} if w <= max(weeks) else set()
        r = rows[w]
        assert r.n_active == len(act)
        assert r.n_new == len(new)
        assert r.n_retained == len(ret)
        assert r.n_resurrected == len(res)
        assert r.n_churned == len(ch)
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
        if len(ch):
            assert abs(r.quick_ratio - (len(new) + len(res)) / len(ch)) < 1e-5
        else:
            assert r.quick_ratio is None


def test_simpson_slopes_match_numpy(spark):
    rows = {
        r.scope: r
        for r in suite.QUERIES["lineitem_simpson_slopes"](spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_discount", "l_quantity"
    ).collect()

    def ols(pts):
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        sxy = sum((x - mx) * (y - my) for x, y in pts)
        sxx = sum((x - mx) ** 2 for x, y in pts)
        syy = sum((y - my) ** 2 for x, y in pts)
        slope = sxy / sxx
        return slope, my - slope * mx, sxy * sxy / (sxx * syy)

    groups = {"ALL": [(r.l_discount, r.l_quantity) for r in li]}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append((r.l_discount, r.l_quantity))
    assert set(rows) == set(groups)
    for scope, pts in groups.items():
        slope, intercept, r2 = ols(pts)
        got = rows[scope]
        assert got.n_rows == len(pts)
        assert abs(got.slope - slope) < 1e-3
        assert abs(got.intercept - intercept) < 1e-3
        assert abs(got.r2 - r2) < 1e-4
        assert got.sign_flips_vs_overall == (
            (got.slope > 0) != (rows["ALL"].slope > 0)
        )


def test_did_matches_bruteforce(spark):
    r = suite.QUERIES["events_did_estimate"](spark, SF_DIR).collect()[0]
    e = load_table(spark, SF_DIR, "events")
    us = F.unix_micros("ts")
    day = ((us - F.pmod(us, F.lit(DAY_US))) / F.lit(DAY_US)).cast("long")
    rows = (
        e.where(F.col("event_type").isin("purchase", "view"))
        .select(
            (F.col("event_type") == "purchase").alias("t"),
            (day >= 19738).alias("p"),
            "value",
        )
        .collect()
    )
    cells = {}
    for x in rows:
        cells.setdefault((x.t, x.p), []).append(x.value)

    def mv(vals):
        n = len(vals)
        m = sum(vals) / n
        v = sum((x - m) ** 2 for x in vals) / (n - 1)
        return n, m, v / n

    n_tp, m_tp, v_tp = mv(cells[(True, True)])
    n_tr, m_tr, v_tr = mv(cells[(True, False)])
    n_cp, m_cp, v_cp = mv(cells[(False, True)])
    n_cr, m_cr, v_cr = mv(cells[(False, False)])
    did = (m_tp - m_tr) - (m_cp - m_cr)
    se = math.sqrt(v_tp + v_tr + v_cp + v_cr)
    assert (r.n_treated_post, r.n_treated_pre) == (n_tp, n_tr)
    assert (r.n_control_post, r.n_control_pre) == (n_cp, n_cr)
    assert abs(r.did - did) < 1e-4
    assert abs(r.se - se) < 1e-4
    assert abs(r.t_stat - did / se) < 1e-4


def test_holt_winters_matches_recurrence(spark):
    got = {}
    for r in suite.QUERIES["events_holt_winters"](spark, SF_DIR).collect():
        got[(r.event_type, r.day)] = r
    by_type = {}
    for r in _daily(spark):
        by_type.setdefault(r.event_type, []).append((r.d, r.c))
    a, g = 0.3, 0.1
    for t, pts in by_type.items():
        pts.sort()
        level, trend = float(pts[0][1]), 0.0
        seen = [(pts[0][0], pts[0][1], level, trend)]
        for d, c in pts[1:]:
            nl = a * c + (1 - a) * (level + trend)
            trend = g * (nl - level) + (1 - g) * trend
            level = nl
            seen.append((d, c, level, trend))
        for d, c, lvl, tr in seen:
            r = got[(t, d)]
            assert r.n_events == c
            assert abs(r.level - lvl) < 1e-5
            assert abs(r.trend - tr) < 1e-5
            assert abs(r.forecast_next - (lvl + tr)) < 1e-5


def test_spearman_matches_pandas(spark):
    """lineitem_spearman_rho must equal pandas' corr(method='spearman')
    on the same integer-cent data (midrank tie convention)."""
    import pandas as pd

    from datafusion_functions_extra_spark.suite import QUERIES

    r = QUERIES["lineitem_spearman_rho"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    pdf = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .selectExpr(
            "cast(round(l_quantity * 100) as long) a",
            "cast(round(l_extendedprice * 100) as long) b",
        )
        .toPandas()
    )
    # pandas' method="spearman" delegates to scipy (absent here);
    # midrank + Pearson is the definition itself
    ra = pdf["a"].rank(method="average")
    rb = pdf["b"].rank(method="average")
    want = ra.corr(rb, method="pearson")
    assert abs(r.spearman_rho - want) < 1e-6, (r.spearman_rho, want)
    assert r.n == len(pdf)


def test_pettitt_matches_bruteforce(spark):
    """events_pettitt_changepoint's K and change day must match a pure-
    python rank computation on the same daily series."""
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.event_type: r
        for r in QUERIES["events_pettitt_changepoint"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    daily = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .selectExpr(
            "event_type",
            "cast(unix_micros(cast(ts as timestamp)) / 86400000000 as long) d",
        )
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, r["count"]))
    for et, pts in series.items():
        pts.sort()
        xs = [c for _, c in pts]
        n = len(xs)
        order = sorted(range(n), key=lambda i: xs[i])
        # 2x midranks with ties
        r2 = [0] * n
        i = 0
        while i < n:
            j = i
            while j < n and xs[order[j]] == xs[order[i]]:
                j += 1
            # ranks i+1..j occupied by the tie group -> 2*midrank
            m2 = (i + 1) + j  # 2 * (i+1+j)/2
            for k2 in range(i, j):
                r2[order[k2]] = m2
            i = j
        cum = 0
        best_k, best_d = -1, None
        for t in range(n - 1):
            cum += r2[t]
            ut = cum - (t + 1) * (n + 1)
            if abs(ut) > best_k:
                best_k, best_d = abs(ut), pts[t][0]
        g = got[et]
        assert g.k_stat == best_k, (et, g.k_stat, best_k)
        assert g.cp_day == best_d, (et, g.cp_day, best_d)


def test_stat_query_bounds(spark):
    """Bound invariants for the round's statistics: Gini in [0,1),
    KS D in [0,1], HHI in (0,1], t-closeness in [0,1], ANOVA eta^2 in
    [0,1]."""
    from datafusion_functions_extra_spark.suite import QUERIES

    sf = "/root/testdata/sf0.001"
    g = QUERIES["customer_revenue_concentration"](spark, sf).collect()[0]
    assert 0.0 <= g.gini < 1.0
    ks = QUERIES["lineitem_ks_returned_price"](spark, sf).collect()[0]
    assert 0.0 <= ks.ks_d <= 1.0 and 0.0 <= ks.p_approx <= 2.0
    for r in QUERIES["brand_hhi_by_type"](spark, sf).collect():
        assert 0.0 < r.hhi <= 1.0 and r.top_brand_share <= 1.0
    a = QUERIES["event_value_anova"](spark, sf).collect()[0]
    assert 0.0 <= a.eta_squared <= 1.0 and a.f_stat >= 0.0
