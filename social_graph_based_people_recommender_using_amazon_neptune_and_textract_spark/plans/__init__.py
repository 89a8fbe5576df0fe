from .audit import (
    partition_filters,
    broadcast_join_count,
    exchange_count,
    has_take_ordered,
    physical_plan,
    pushed_filters,
    read_schema_columns,
    sort_merge_join_count,
)

__all__ = [
    "partition_filters",
    "physical_plan",
    "exchange_count",
    "broadcast_join_count",
    "sort_merge_join_count",
    "has_take_ordered",
    "pushed_filters",
    "read_schema_columns",
]
