"""Physical-plan inspection utilities — the engine's scale guardrails."""

from parquet_editor_spark.plans.observe import (
    with_metrics,
    with_row_accounting,
)
from parquet_editor_spark.plans.explain import (
    executed_plan,
    has_broadcast_join,
    partition_histogram,
    skew_ratio,
    has_single_partition_exchange,
    plan_report,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "has_single_partition_exchange",
    "partition_histogram",
    "skew_ratio",
    "plan_report",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_spans",
    "with_metrics",
    "with_row_accounting",
]
