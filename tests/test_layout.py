"""Storage-layout plan tests: bucketed joins must not shuffle, and
partition-column predicates must prune directories at the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_interface_to_xml_database_for_spatial_operations_spark.sources.layout import (
    bucketed_join,
    write_bucketed,
    write_partitioned,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import load_table

from conftest import SF_DIR


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "orderkey"), "t_orders_b", "orderkey", buckets=8)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "orderkey"), "t_lineitem_b", "orderkey", buckets=8)
    yield ("t_lineitem_b", "t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join strategy is decided by layout alone
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, left, right, ["orderkey"])
        plan = _formatted_plan(df)
        assert "Exchange" not in plan, "bucketed join must not re-shuffle either side"
        assert "SortMergeJoin" in plan
        # results are still correct
        n = df.count()
        o = load_table(spark, SF_DIR, "orders")
        li = load_table(spark, SF_DIR, "lineitem")
        assert n == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_does_exchange(spark, bucketed_tables):
    """Control: the identical join over raw parquet shuffles both sides —
    the delta the bucketing pays for."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR, "orders")
        li = load_table(spark, SF_DIR, "lineitem")
        plan = _formatted_plan(li.join(o, li.l_orderkey == o.o_orderkey))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    events = load_table(spark, SF_DIR, "events")
    write_partitioned(events, path, "event_type")
    df = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = _formatted_plan(df)
    assert "PartitionFilters" in plan
    # the partition predicate must appear as a partition filter, not a
    # post-scan data filter
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "event_type" in pf_line
    assert df.count() == events.filter(F.col("event_type") == "purchase").count()
