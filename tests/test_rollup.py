"""Hypertable rollup: partial re-aggregation must equal direct-from-raw
aggregation at every level, and the plan must aggregate partials, not
rescan events for the coarse levels."""

from __future__ import annotations

import pyspark.sql.functions as F

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.temporal import (
    hypertable_rollup,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import load_table

from conftest import SF_DIR


def _direct(events, unit):
    return {
        (r["bucket"], r["event_type"]): (r["n"], r["value_sum"], r["value_min"], r["value_max"])
        for r in events.groupBy(
            F.date_trunc(unit, F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
        .collect()
    }


def test_rollup_levels_match_direct_aggregation(spark):
    events = load_table(spark, SF_DIR, "events")
    rolled = hypertable_rollup(events).collect()
    assert rolled
    by_level = {}
    for r in rolled:
        by_level.setdefault(r["level"], {})[(r["bucket"], r["event_type"])] = (
            r["n"], r["value_sum"], r["value_min"], r["value_max"],
        )
    assert set(by_level) == {"minute", "hour", "day"}
    for unit in ("minute", "hour", "day"):
        direct = _direct(events, unit)
        got = by_level[unit]
        assert got.keys() == direct.keys()
        for k, (n1, s1, mn1, mx1) in direct.items():
            n2, s2, mn2, mx2 = got[k]
            assert n1 == n2 and mn1 == mn2 and mx1 == mx2
            assert abs(s1 - s2) <= 1e-6 * max(1.0, abs(s1))  # float sum order

    # sizes shrink monotonically (the reason the pattern scales)
    assert len(by_level["minute"]) >= len(by_level["hour"]) >= len(by_level["day"])


def test_rollup_reuses_partials_in_plan(spark):
    events = load_table(spark, SF_DIR, "events")
    df = hypertable_rollup(events)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        # The minute partial is persisted: coarse levels read the
        # InMemoryTableScan, not three separate parquet scans of events.
        assert plan.count("InMemoryTableScan") >= 2
    finally:
        from sql_interface_to_xml_database_for_spatial_operations_spark.caching import (
            release_tracked,
        )

        release_tracked()
