"""Plan-inspection helpers: make physical-plan properties testable.

The scale contract (SURVEY.md §4) is enforced in tests with these:
small dims must broadcast, filters/projections must reach the parquet
scan, narrow pipelines must contain no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"expected a broadcast join in plan:\n{plan}")


def assert_no_exchange(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "Exchange" not in plan, f"expected a narrow (no-exchange) plan:\n{plan}"


def assert_pushed_filters(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, (
        f"expected non-empty PushedFilters in scan:\n{plan}")
