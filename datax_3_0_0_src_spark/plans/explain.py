"""Physical-plan inspection helpers.

DataX delegates pushdown to the source database as SQL text
(SingleTableSplitUtil.buildQuerySql, plugin-rdbms-util/.../reader/util/
SingleTableSplitUtil.java:126-139); Catalyst does it natively — these helpers
let tests PROVE the plan is the one we want (PushedFilters reach the scan,
small dims broadcast, stages stay in WholeStageCodegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    plan = plan_string(df)
    assert "PushedFilters" in plan, f"no PushedFilters in plan:\n{plan[:2000]}"
    for frag in fragments:
        assert frag in plan, f"expected {frag!r} pushed; plan:\n{plan[:2000]}"


def assert_broadcast_join(df: DataFrame, n: int = 1) -> None:
    plan = plan_string(df)
    got = plan.count("BroadcastHashJoin")
    assert got >= n, f"expected >= {n} BroadcastHashJoin, got {got}:\n{plan[:2000]}"


def codegen_spans(df: DataFrame) -> int:
    return plan_string(df, "simple").count("WholeStageCodegen")
