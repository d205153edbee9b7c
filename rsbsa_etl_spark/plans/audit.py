"""Shared physical-plan counters.

ONE regex set consumed by both CLI surfaces (``explain`` — the
interactive per-key audit — and ``audit`` — the registry-wide
PLANAUDIT.json generator), so the two cannot drift: a counter added
or a pattern fixed here shows up in both, and in the committed
PLANAUDIT.json the next time it is regenerated.

The counters are the repo's plan-hygiene vocabulary (PLANAUDIT.md):
``exchanges`` counts shuffles, ``bhj``/``smj``/``nlj`` the join
strategies, ``arrow`` the vectorized Python stages, ``rowpy`` the
row-at-a-time Python UDFs (must stay 0 everywhere).
"""

from __future__ import annotations

import re

#: key -> (display label, regex) — dict order is the display order
COUNTER_PATTERNS: dict[str, tuple[str, str]] = {
    "exchanges": ("shuffles (Exchange)", "Exchange (hash|range)partitioning"),
    "bhj": ("broadcast joins", "BroadcastHashJoin"),
    "smj": ("sort-merge joins", "SortMergeJoin"),
    "nlj": (
        "nested-loop/cartesian",
        "BroadcastNestedLoopJoin|CartesianProduct",
    ),
    "scans": ("file scans", "FileScan"),
    "windows": ("windows", "Window "),
    "arrow": (
        "python (Arrow) stages",
        "MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython",
    ),
    "rowpy": ("row-at-a-time python UDFs", "BatchEvalPython"),
}


def plan_counters(plan: str) -> dict[str, int]:
    """count each plan-hygiene pattern in an executedPlan string."""
    return {
        key: len(re.findall(pat, plan))
        for key, (_label, pat) in COUNTER_PATTERNS.items()
    }
