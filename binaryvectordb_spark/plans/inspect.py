"""Physical-plan inspection helpers.

The engine has no custom Catalyst rules (SURVEY §4: nothing here needs one);
these helpers let tests ASSERT the physical properties we rely on at scale:
TakeOrderedAndProject for top-k, BroadcastHashJoin for small sides,
PushedFilters reaching the Parquet scan, WholeStageCodegen coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}
