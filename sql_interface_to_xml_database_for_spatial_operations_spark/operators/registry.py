"""Query registry: name → (spark_callable, duckdb_oracle_sql | None).

The driver contract (``__spark_entry__.py``) needs a ``queries()`` dict and
an ``oracle_sql()`` dict whose column names line up exactly; keeping both
halves of each query in one ``@query`` registration makes drift impossible.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


QUERIES: dict[str, RegisteredQuery] = {}

# Round-1 driver-verified queries (green rows in CORRECTNESS_r01.json).
# The driver's per-round correctness check covers the first 50 entries in
# exposure order, so already-proven queries yield their slots to the
# families that have never had a driver row (spatial joins, dedup, ANN,
# text, temporal, streaming-batch, pipeline, multimodal). Exposure order
# only — registration order and query semantics are unchanged.
_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "q01_filter_pushdown", "q02_projection_pruning", "q03_select_star",
        "q04_alias_expressions", "q05_where_and_or", "q06_in_list",
        "q07_not_in_list", "q08_null_predicates", "q09_where_bool_literal",
        "q10_between_range", "q11_join_inner_equi", "q12_join_theta",
        "q13_join_left_outer", "q14_join_right_outer", "q15_join_full_outer",
        "q16_join_multiway", "q17_natural_join", "q18_semi_join_in_subquery",
        "q19_anti_join_not_exists", "q20_lateral_explode", "q21_count_groupby",
        "q22_agg_global", "q23_agg_pricing_summary", "q24_having",
        "q25_distinct", "q26_rollup", "q27_orderby_limit_topk",
        "q28_union_all", "q29_intersect", "q30_except", "q31_window_rank",
        "q32_window_running_sum", "q33_subquery_from", "q34_scalar_subquery",
        "q35_correlated_exists", "q36_date_functions", "q37_mod_function",
        "q38_string_functions", "q39_case_expression", "q40_math_functions",
        "q41_st_point_accessors", "q42_st_astext", "q43_st_distance_radius",
        "q54_cube", "q55_grouping_sets", "q56_pivot",
        "q57_count_distinct_multi", "q58_approx_count_distinct",
        "q86_skew_salted_join", "q87_percentiles",
    }
)


def _exposure_order() -> list[str]:
    names = list(QUERIES)
    return [n for n in names if n not in _DRIVER_VERIFIED] + [
        n for n in names if n in _DRIVER_VERIFIED
    ]


def query(name: str, oracle: str | None = None):
    """Register a query implementation with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def spark_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in _exposure_order()}


def oracle_queries() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _exposure_order()
        if QUERIES[name].oracle is not None
    }
