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
