"""Plan-string capture + assertions over physical plans.

Every operator's docstring claims a physical shape (pushdown,
broadcast, rank-limit, partial agg); tests/test_plans.py pins those
claims with these helpers so a regression that silently de-optimizes
a plan (e.g. a lost broadcast after a refactor) fails CI, not a
100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The executed-plan explain string (what df.explain(mode) prints)."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    jmode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jqe.explainString(jmode)


def assert_plan_contains(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    for needle in needles:
        if needle not in plan:
            raise AssertionError(
                f"expected {needle!r} in physical plan, not found.\n{plan}"
            )
    return plan


def assert_plan_lacks(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    plan = plan_string(df, mode)
    for needle in needles:
        if needle in plan:
            raise AssertionError(f"unexpected {needle!r} in physical plan.\n{plan}")
    return plan
