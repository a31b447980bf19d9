"""Plan-inspection utilities."""

from azure_kusto_parquet_conv_spark.plans.explain import (
    executed_plan,
    has_pushed_filters,
    read_schema,
    join_strategies,
    assert_no_cartesian,
)

__all__ = [
    "executed_plan",
    "has_pushed_filters",
    "read_schema",
    "join_strategies",
    "assert_no_cartesian",
]
