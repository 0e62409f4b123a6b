"""Module-namespace hygiene for suite.py.

Round-8 regression: a later query batch redefined the module-level
``_BLOOM_M``/``_BLOOM_K`` constants that an EARLIER query's function body
reads at call time (oracle strings bake constants at import, function
bodies resolve them at call) — silently flipping
``orders_bloom_semi_probe``'s Spark side to the new values while its
oracle kept the old ones.  The ``@query`` decorator already fails loudly
on duplicate query names; this test extends that guarantee to
module-level CONSTANT and helper-function names."""

from __future__ import annotations

import collections
import inspect
import re


def test_no_duplicate_module_level_assignments():
    from datafusion_functions_extra_spark import suite

    src = inspect.getsource(suite)
    names: collections.Counter = collections.Counter()
    # simple and tuple assignments at column 0
    for m in re.finditer(
        r"^([A-Za-z_][A-Za-z0-9_]*)\s*(?::[^=\n]+)?=[^=]", src, re.M
    ):
        names[m.group(1)] += 1
    for m in re.finditer(
        r"^[A-Za-z_][A-Za-z0-9_]*\s*,\s*([A-Za-z_][A-Za-z0-9_]*)\s*=[^=]",
        src,
        re.M,
    ):
        names[m.group(1)] += 1
    # def/class at column 0 (query functions are name-guarded by the
    # decorator, but oracle-builder helpers are not)
    for m in re.finditer(r"^(?:def|class)\s+([A-Za-z_][A-Za-z0-9_]*)", src, re.M):
        names[m.group(1)] += 1
    dups = {
        k: v
        for k, v in names.items()
        if v > 1 and k not in {"QUERIES", "ORACLES"}
    }
    assert not dups, (
        f"module-level names defined more than once in suite.py — a later "
        f"definition silently shadows the earlier one for every function "
        f"body that resolves it at call time: {sorted(dups)}"
    )
