"""Structural invariants of the driver-window rotation in suite.py.

The driver's hard correctness gate covers roughly the first 50 entries
of ``suite.QUERIES`` in dict order, so ``_rotate_for_driver_window``
must keep two properties true EVERY round or verification debt stops
draining:

1. every oracle-able never-driver-verified query sorts BEFORE every
   driver-verified one (the window always drains the debt first);
2. the declared rows-only sketch queries never displace a hash-able
   never-verified query from the window — they are either explicitly
   head-parked (a one-round documentation move, r09) or dead-last.

These are order properties of the module's import-time state, so the
test needs no SparkSession.
"""

from __future__ import annotations

from datafusion_functions_extra_spark import suite

ROWS_ONLY = {"price_quantiles_approx", "approx_distinct_users"}


def test_never_verified_sort_before_verified():
    names = list(suite.QUERIES)
    ranks = {n: i for i, n in enumerate(names)}
    never = [
        n for n in names
        if n in suite.ORACLES and n not in suite._DRIVER_VERIFIED
        and n not in ROWS_ONLY
    ]
    verified = [n for n in names if n in suite._DRIVER_VERIFIED]
    if never and verified:
        assert max(ranks[n] for n in never) < min(ranks[n] for n in verified), (
            "a driver-verified query outranks a never-verified one — the "
            "window would re-check old greens while debt sits outside it"
        )


def test_rows_only_head_parked_or_dead_last():
    names = list(suite.QUERIES)
    ranks = {n: i for i, n in enumerate(names)}
    n_total = len(names)
    for n in ROWS_ONLY:
        assert n in suite.QUERIES and n not in suite.ORACLES
        r = ranks[n]
        assert r < len(ROWS_ONLY) or r >= n_total - len(ROWS_ONLY), (
            f"{n} sits mid-order (rank {r}) — it can neither earn a hash "
            "nor document itself there, it only burns a window slot"
        )


def test_oracle_dict_order_matches_queries():
    # the driver zips queries() and oracle_sql() by name; keeping ORACLES
    # in the same relative order makes eyeballing diffs sane
    q = [n for n in suite.QUERIES if n in suite.ORACLES]
    assert q == list(suite.ORACLES)
