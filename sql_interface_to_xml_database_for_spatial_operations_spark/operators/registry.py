"""Query registry: name → (spark_callable, duckdb_oracle_sql | None).

The driver contract (``__spark_entry__.py``) needs a ``queries()`` dict and
an ``oracle_sql()`` dict whose column names line up exactly; keeping both
halves of each query in one ``@query`` registration makes drift impossible.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..caching import release_tracked

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


QUERIES: dict[str, RegisteredQuery] = {}

# Queries with a green driver CORRECTNESS row in a PRIOR round whose
# implementation (including transitive helpers) is UNCHANGED since that
# row was recorded. The driver's per-round correctness check covers the
# first 50 entries in exposure order; entries NOT in this set — never
# checked, red last round, or touched by this round's diff — are exposed
# first so they are (re-)checked, and the remaining slots fall to the
# stalest greens in registration order. Exposure order only —
# registration order and query semantics are unchanged.
#
# Maintenance rule (ADVICE r2): whenever a round's diff changes code a
# verified query depends on, REMOVE that query here so the next driver
# run re-verifies it. Round 3 removed q44/q45/q53 (geometry within/
# intersects/contains rewrite: bbox prescreen), q65/q90/q91 (shingle df
# cap + connected-components convergence rework) and q97 (round-order
# fix); the events family and q58 are non-green, so they are not listed.
# The cap itself belongs to the harness — see README.md "Driver
# correctness window" for the note to the harness owner.
_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        # r01 greens, untouched since
        "q01_filter_pushdown", "q02_projection_pruning", "q03_select_star",
        "q04_alias_expressions", "q05_where_and_or", "q06_in_list",
        "q07_not_in_list", "q08_null_predicates", "q09_where_bool_literal",
        "q10_between_range", "q11_join_inner_equi", "q12_join_theta",
        "q13_join_left_outer", "q14_join_right_outer", "q15_join_full_outer",
        "q16_join_multiway", "q17_natural_join", "q18_semi_join_in_subquery",
        "q19_anti_join_not_exists", "q20_lateral_explode", "q21_count_groupby",
        "q22_agg_global", "q23_agg_pricing_summary", "q24_having",
        "q25_distinct", "q26_rollup", "q27_orderby_limit_topk",
        "q28_union_all", "q29_intersect", "q31_window_rank",
        # q30 removed: rewritten this round (was trivially empty at
        # sf0.01 — nation EXCEPT supplier — now orders-without-lineitems)
        "q32_window_running_sum", "q33_subquery_from", "q34_scalar_subquery",
        "q35_correlated_exists", "q36_date_functions", "q37_mod_function",
        "q38_string_functions", "q39_case_expression", "q40_math_functions",
        "q41_st_point_accessors", "q42_st_astext", "q43_st_distance_radius",
        "q54_cube", "q55_grouping_sets", "q56_pivot",
        "q57_count_distinct_multi",
        "q86_skew_salted_join", "q87_percentiles",
        # r02 greens, untouched since
        "q46_st_area_props", "q47_dwithin_pairs", "q48_distance_sphere_count",
        "q49_st_asgeojson", "q50_st_geomfromtext", "q51_st_geomfromgeojson",
        "q52_centroid_perimeter", "q59_st_geomfromgml_kml",
        "q60_token_count", "q61_quality_score",
        "q64_dedup_exact",
        # q62/q63/q66/q67/q68 removed: shuffle-elimination rewrites this
        # round (in-row language-ID argmax, in-row fingerprint,
        # candidate-driven verify, map-side word dedup)
        "q69_embedding_neardup",
        "q70_ann_bruteforce_topk", "q71_ann_lsh_buckets", "q72_ann_lsh_topk",
        # q73 removed: centroid model rebuilt as a constant-folded literal
        # this round — re-exposed for driver re-check
        "q80_multimodal_metadata",
        "q81_multimodal_features", "q82_frame_sample", "q85_st_extent_agg",
        "q88_levenshtein_neardup", "q92_hash_sample",
        "q93_train_val_test_split", "q94_multipart_gml_ingest",
        "q95_st_collect_agg", "q98_hull_envelope",
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

        # Entry hook: drop the previous query's tracked persists (see
        # caching.py) so sequential multi-query runs (the driver's
        # correctness sweep) hold at most one query's intermediates.
        # The ORIGINAL fn is returned/used for in-package helper calls,
        # so a query composing another query's body never releases its
        # own caches mid-plan.
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_tracked()
            return fn(spark, sf_dir)

        wrapped.__doc__ = fn.__doc__
        wrapped.__name__ = fn.__name__
        QUERIES[name] = RegisteredQuery(name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
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
