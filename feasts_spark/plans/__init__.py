"""Plan inspection helpers — the engine's "is Catalyst doing its job" checks.

Used by tests and by tools/explain_plans.py to assert structural plan
properties (scan pruning, pushed filters, broadcast joins, whole-stage
codegen coverage) rather than eyeballing explain output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def count_nodes(plan: str, name: str) -> int:
    """Occurrences of a physical operator in a `formatted` plan.

    `formatted` prints every node twice (tree line `Op (N)` and detail
    header `(N) Op`); counting only detail headers gives the true count.
    Matching is EXACT-prefix-anchored immediately after the header number:
    `count_nodes(plan, "Exchange")` does NOT count `BroadcastExchange`
    lines — count those separately by name.
    """
    return len(re.findall(rf"^\(\d+\) {re.escape(name)}\b", plan, re.MULTILINE))


def plan_summary(df: DataFrame) -> dict:
    """Structural facts about the physical plan.

    NOTE on WholeStageCodegen: with AQE on, the pre-execution formatted
    plan hides codegen stages — inspect with adaptive.enabled=false (the
    plan-structure tests do) or accept n_wscg == 0 under AQE.
    """
    plan = formatted_plan(df)
    return {
        "n_exchanges": count_nodes(plan, "Exchange"),
        # formatted mode marks codegen with `* Op` tree lines + `[codegen id : N]`
        "n_wscg": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "has_broadcast": "BroadcastExchange" in plan or "BroadcastHashJoin" in plan,
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "n_scans": count_nodes(plan, "Scan parquet"),
        # same detail-header anchoring as count_nodes, so each Python
        # boundary is counted once (tree + detail lines would double it)
        "n_python": len(
            re.findall(
                r"^\(\d+\) (?:\w*InPandas|ArrowEvalPython|BatchEvalPython)",
                plan,
                re.MULTILINE,
            )
        ),
        "read_schema_cols": _read_schema_width(plan),
        "plan": plan,
    }


def _read_schema_width(plan: str) -> list[int]:
    """Number of columns each parquet scan actually reads (column pruning)."""
    widths = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            widths.append(line.count(":") - 1 + line.count(","))
    return widths
