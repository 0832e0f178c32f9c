"""Distributed DBSCAN (operators/cluster_dbscan.py). Driver row q160
pins the SQL level at sf0.01; these pin a hand-checked fixture and the
partition-invariance property the house style requires for any
collect_list/graph cascade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_interface_to_xml_database_for_spatial_operations_spark.operators.cluster_dbscan import (
    dbscan,
)


def _fixture(spark, repartition=None):
    # one dense cluster (ids 1-4), one pair (ids 10-11, not core at
    # minpts=3), one border point (id 5 near the cluster), one far
    # noise point (id 20), split across two partitions p/q
    rows = [
        (1, "p", 0.0, 0.0),
        (2, "p", 1.0, 0.0),
        (3, "p", 0.0, 1.0),
        (4, "p", 1.0, 1.0),
        (5, "p", 3.4, 0.0),   # within eps=2.5 of id 2 only -> border
        (10, "p", 50.0, 50.0),
        (11, "p", 51.0, 50.0),  # 10-11: degree 1 each, not core
        (20, "p", -80.0, -80.0),
        # same coordinates in another partition must NOT join cluster p
        (31, "q", 0.0, 0.0),
        (32, "q", 1.0, 0.0),
        (33, "q", 0.5, 0.5),
    ]
    df = spark.createDataFrame(rows, "id long, part string, x double, y double")
    if repartition:
        df = df.repartition(repartition)
    return df


EXPECTED = {
    1: (True, 1),
    2: (True, 1),
    3: (True, 1),
    4: (True, 1),
    5: (False, 1),    # border -> cluster of its core neighbor
    10: (False, None),
    11: (False, None),
    20: (False, None),
    31: (True, 31),
    32: (True, 31),
    33: (True, 31),
}


def test_fixture_clusters(spark):
    out = {
        r["id"]: (r["is_core"], r["cluster_id"])
        for r in dbscan(_fixture(spark), "id", "part", "x", "y", 2.5, 3).collect()
    }
    assert out == EXPECTED


@pytest.mark.parametrize("k", [1, 3, 7])
def test_partition_invariance(spark, k):
    out = {
        r["id"]: (r["is_core"], r["cluster_id"])
        for r in dbscan(
            _fixture(spark, repartition=k), "id", "part", "x", "y", 2.5, 3
        ).collect()
    }
    assert out == EXPECTED


def test_cell_boundary_pairs_found_once(spark):
    # two points in different grid cells but within eps: exactly one
    # candidate pair per direction (the 3x3 explode matches the single
    # build cell once), so degree counts stay exact
    rows = [(1, "p", 0.9, 0.0), (2, "p", 1.1, 0.0), (3, "p", 1.0, 0.5)]
    df = spark.createDataFrame(rows, "id long, part string, x double, y double")
    out = {r["id"]: (r["is_core"], r["cluster_id"]) for r in dbscan(df, "id", "part", "x", "y", 1.0, 3).collect()}
    assert out == {1: (True, 1), 2: (True, 1), 3: (True, 1)}


def test_minpts_one_isolated_points_are_singleton_cores(spark):
    rows = [(1, "p", 0.0, 0.0), (2, "p", 100.0, 100.0)]
    df = spark.createDataFrame(rows, "id long, part string, x double, y double")
    out = {
        r["id"]: (r["is_core"], r["cluster_id"])
        for r in dbscan(df, "id", "part", "x", "y", 1.0, 1).collect()
    }
    assert out == {1: (True, 1), 2: (True, 2)}
