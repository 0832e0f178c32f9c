"""Plan assertions: the optimizer behaviors the reference hand-rolled
(SURVEY.md §4) must be VISIBLE in our physical plans — predicate pushdown
reaching the parquet scan, column pruning in ReadSchema, broadcast joins
for dims, whole-stage codegen spans. These helpers make plan quality a
tested invariant instead of a hope; at 100 TB a regression here is the
difference between minutes and hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment (column name) must appear in a PushedFilters list."""
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter on {frag!r} not pushed:\n{joined}"


def assert_read_schema_pruned(df: DataFrame, table_hint: str, max_cols: int) -> None:
    """The parquet ReadSchema for the scan containing ``table_hint`` must
    carry at most ``max_cols`` columns (column pruning reached the scan)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_hint in plan:
            schema_part = line.split("struct<", 1)
            if len(schema_part) == 2:
                ncols = schema_part[1].count(":")
                assert ncols <= max_cols, f"scan reads {ncols} cols (> {max_cols}):\n{line}"
                return
    raise AssertionError(f"no ReadSchema found:\n{plan}")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected ≥{at_least} broadcast joins, found {n}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"unexpected cartesian product:\n{plan}"


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Formatted plans star-prefix nodes inside WholeStageCodegen spans."""
    plan = formatted_plan(df)
    import re

    assert re.search(r"^\s*[+-]*\s*\* ", plan, re.M) or "WholeStageCodegen" in plan, (
        f"no codegen spans:\n{plan}"
    )
