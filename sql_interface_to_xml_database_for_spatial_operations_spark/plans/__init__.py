"""Physical-plan introspection helpers (the engine's optimizer contract)."""

from .explain import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    assert_whole_stage_codegen,
    formatted_plan,
)

__all__ = [
    "formatted_plan",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_whole_stage_codegen",
]
