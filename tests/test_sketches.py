"""Count-Min Sketch: exactness at low cardinality, the one-sided error
guarantee under forced collisions, merge = build-on-union, and the
map-side-combinable plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import load_table

from conftest import SF_DIR


def _exact(df, col):
    return {
        r["item"]: r["n"]
        for r in df.groupBy(F.col(col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_exact_for_low_cardinality_keys(spark):
    """event_type cardinality ≪ width → no collisions → estimates are
    exactly the true counts (the property a driver-row oracle can
    hash-compare)."""
    events = load_table(spark, SF_DIR, "events")
    sketch = cms_build(events, "event_type")
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(sketch, events.select("event_type"), "event_type").collect()
    }
    assert est == _exact(events, "event_type")


def test_one_sided_error_under_collisions(spark):
    """width=4 forces collisions on a wider key set: estimates must
    NEVER undercount, and must respect the eps*N overcount bound."""
    events = load_table(spark, SF_DIR, "events")
    n_total = events.count()
    sketch = cms_build(events, "user_id", width=4)
    exact = _exact(events, "user_id")
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(sketch, events.select("user_id"), "user_id", width=4).collect()
    }
    assert est.keys() == exact.keys()
    assert all(est[k] >= exact[k] for k in exact)
    # eps = e/width; with depth 4 the bound holds overwhelmingly — check
    # the max observed overcount stays under eps*N.
    eps = 2.718281828 / 4
    assert max(est[k] - exact[k] for k in exact) <= eps * n_total


def test_merge_equals_build_on_union(spark):
    events = load_table(spark, SF_DIR, "events")
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    merged = {
        (r["seed"], r["bucket"]): r["n"]
        for r in cms_merge(cms_build(a, "event_type"), cms_build(b, "event_type")).collect()
    }
    whole = {
        (r["seed"], r["bucket"]): r["n"]
        for r in cms_build(events, "event_type").collect()
    }
    assert merged == whole


def test_build_plan_partially_aggregates(spark):
    """The groupBy(seed, bucket) must plan as a two-phase hash aggregate
    (partial below the exchange): shuffle volume is depth*width per
    partition, not one row per input element."""
    sketch = cms_build(load_table(spark, SF_DIR, "events"), "event_type")
    plan = sketch._sc._jvm.PythonSQLUtils.explainString(
        sketch._jdf.queryExecution(), "formatted"
    )
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan
    assert "EvalPython" not in plan  # hashing stays JVM-side
