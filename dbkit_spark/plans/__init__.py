from .explain_utils import (
    assert_broadcast_join,
    assert_no_nested_loop_join,
    formatted_plan,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "assert_broadcast_join",
    "assert_no_nested_loop_join",
]
