"""Helpers for reasoning about ``executedPlan().toString()`` text.

The plan-shape pins (tests/test_plans.py) and the scale-stress harness
(scripts/scale_stress.py) both assert properties like "no top-level
source scan outside a cache" on the printed physical plan; they must
parse it identically, so the parser lives here once.
"""

from __future__ import annotations


def strip_cached_subtrees(plan: str) -> str:
    """Drop every InMemoryRelation node and its nested cached-plan
    printout (deeper-indented lines), leaving only operators THIS
    query's execution actually runs.  ``executedPlan().toString()``
    prints each cache's MATERIALIZATION plan inline under its
    InMemoryRelation node; counting source scans without stripping
    those subtrees double-counts work the cache already paid for."""
    out, skip_indent = [], None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-*()0123456789"))
        if skip_indent is not None:
            if indent > skip_indent or not line.strip():
                continue
            skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
            continue
        out.append(line)
    return "\n".join(out)
