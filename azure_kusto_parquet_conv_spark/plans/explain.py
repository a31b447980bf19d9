"""Physical-plan inspection: the feedback loop that keeps every operator
honest at scale. Tests assert on these (tests/test_plans.py) so a
regression that un-pushes a filter or turns a broadcast join into a
cartesian product fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mentions ``fragment``."""
    plan = executed_plan(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def read_schema(df: DataFrame) -> list[str]:
    """The column sets actually read from parquet (one per scan)."""
    plan = executed_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in the plan, in order of appearance."""
    plan = executed_plan(df)
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", plan)


def assert_no_cartesian(df: DataFrame, allow_broadcast_nlj: bool = False):
    """Raise if the plan contains an unbounded cross product. Broadcast
    NLJ is allowed only when explicitly expected (intentional small-side
    cross joins like query x corpus kNN)."""
    bad = {"CartesianProduct"}
    if not allow_broadcast_nlj:
        bad.add("BroadcastNestedLoopJoin")
    found = [s for s in join_strategies(df) if s in bad]
    if found:
        raise AssertionError(
            f"plan contains {found}; refuse to ship an O(n^2) join:\n"
            + executed_plan(df)[:2000])


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the plan (AQE may collapse some at runtime)."""
    return executed_plan(df).count("Exchange")


def codegen_spans(df: DataFrame) -> int:
    """How many whole-stage-codegen regions the plan compiled to."""
    return len(re.findall(r"WholeStageCodegen", executed_plan(df)))
