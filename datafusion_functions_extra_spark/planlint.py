"""Physical-plan lint: the scale anti-pattern detector as a LIBRARY API.

``tools/audit_plans.py`` audits the suite's own queries; this module
exposes the same detections to USERS so a pipeline can gate its plans in
CI the way the suite does: CartesianProduct (all-pairs blowup),
BroadcastNestedLoopJoin (non-equi / unkeyed join — bounded only if the
build side is scalar-sized), unpartitioned WindowExec (Spark moves the
WHOLE relation to one task: the classic 100-TB driver-killer), Python
operators in what should be a JVM pipeline, and column-pruning evidence
(parquet ReadSchema).

Usage::

    from datafusion_functions_extra_spark import plan_lint
    report = plan_lint(df)
    assert not report["flags"], report["flags"]

The detections read the AQE executed-plan string, so they see the plan
Spark will actually run (post broadcast-threshold / skew decisions), not
the pre-optimization sketch.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan_str(df: DataFrame) -> str:
    """The executed (AQE, pre-execution) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def _top_level_groups(s: str) -> int:
    """Count top-level [...] groups in a plan line (nested brackets fold
    into their parent) — a WindowExec line prints as
    ``Window [funcs], [partSpec], [orderSpec]`` when partitioned and
    ``Window [funcs], [orderSpec]`` when the partition spec is empty."""
    depth = 0
    groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
    return groups


def count_unpartitioned_windows(plan: str) -> int:
    """WindowExec prints ``Window [funcs], [partSpec], [orderSpec]`` —
    2 top-level groups means the partition spec is absent.  The
    WindowGroupLimit rewrite prints ``WindowGroupLimit [partSpec],
    [orderSpec], fn, k, Mode`` — unpartitioned iff its FIRST group is
    empty ``[]``.  Partial/Final WindowGroupLimit pairs and the Window
    above them all derive from the same user window, but each line is
    counted — the measure is operator instances, not source windows."""
    n = 0
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*(0123456789)")
        if stripped.startswith("Window "):
            groups = _top_level_groups(stripped)
            if groups <= 1:
                n += 1
            elif groups == 2:
                # ``Window [funcs], [X]`` — X is either a partition spec
                # (partitioned window with no ordering: whole-partition
                # frame, fine) or an order spec (GLOBAL ordered window:
                # the single-partition case).  Order specs carry sort
                # directions; partition specs never do.
                second = stripped.split("], [", 1)
                if len(second) == 2 and (
                    " ASC" in second[1] or " DESC" in second[1]
                ):
                    n += 1
        elif stripped.startswith("WindowGroupLimit "):
            first = stripped.split("]", 1)[0]
            if first.rstrip().endswith("["):  # "WindowGroupLimit [" + "]"
                n += 1
    return n


def audit(plan: str) -> dict:
    """Operator counts + pruning evidence from an executed-plan string."""
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "unpart_window": count_unpartitioned_windows(plan),
        # codegen'd operators print as "*(n) OpName" in the plan string
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "cached_scans": plan.count("InMemoryTableScan"),
        "python_ops": plan.count("MapInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython"),
        "read_schemas": sorted(
            set(re.findall(r"ReadSchema: struct<([^>]*)>", plan))
        ),
    }


def plan_lint(
    df: DataFrame,
    *,
    allow_bnlj: bool = False,
    allow_unpartitioned_window: bool = False,
    allow_python: bool = False,
) -> dict:
    """Audit ``df``'s executed plan and return the counts plus a
    ``flags`` list of human-readable scale findings (empty = clean).

    The ``allow_*`` switches are the per-call analog of the suite's
    annotation tables: a caller that KNOWS its BNLJ build side is a
    1-row scalar join-back (or its global window ranks a sort+limit
    head) opts in explicitly, the same contract `tools/audit_plans.py`
    enforces with BNLJ_BOUNDED / UNPART_WINDOW_BOUNDED."""
    a = audit(executed_plan_str(df))
    flags: list[str] = []
    if a["cartesian"]:
        flags.append(
            f"CartesianProduct x{a['cartesian']}: all-pairs blowup — "
            "add an equi-key, broadcast a bounded side, or bucket/band the join"
        )
    if a["bnlj"] and not allow_bnlj:
        flags.append(
            f"BroadcastNestedLoopJoin x{a['bnlj']}: non-equi/unkeyed join — "
            "safe only for scalar-sized build sides (allow_bnlj=True to accept)"
        )
    if a["unpart_window"] and not allow_unpartitioned_window:
        flags.append(
            f"unpartitioned WindowExec x{a['unpart_window']}: whole relation "
            "moves to ONE task — use sort+limit top-k or two-phase ranking "
            "(allow_unpartitioned_window=True to accept a bounded input)"
        )
    if a["python_ops"] and not allow_python:
        flags.append(
            f"Python operators x{a['python_ops']}: rows leave the JVM — "
            "prefer built-in expressions; Arrow-batched pandas only when "
            "semantics demand it (allow_python=True to accept)"
        )
    a["flags"] = flags
    return a
