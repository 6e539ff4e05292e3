"""Plan inspection helpers — the engine's "is Catalyst doing its job" checks.

Used by tests and by tools/explain_plans.py to assert structural plan
properties (scan pruning, pushed filters, broadcast joins, whole-stage
codegen coverage) rather than eyeballing explain output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_summary(df: DataFrame) -> dict:
    """Structural facts about the physical plan."""
    plan = formatted_plan(df)
    return {
        "n_exchanges": plan.count("Exchange"),
        "n_wscg": plan.count("WholeStageCodegen"),
        "has_broadcast": "BroadcastExchange" in plan or "BroadcastHashJoin" in plan,
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
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
