"""Registry / driver-contract invariants (no SparkSession needed).

The driver's correctness gate checks the first 50 entries of
``__spark_entry__.queries()``; the registry's exposure order must
therefore put every not-yet-verified or changed-this-round query inside
that window, and the verified set must never drift from real names.
"""

from __future__ import annotations

from sql_interface_to_xml_database_for_spatial_operations_spark import operators
from sql_interface_to_xml_database_for_spatial_operations_spark.operators.registry import (
    QUERIES,
    _DRIVER_VERIFIED,
    oracle_queries,
    spark_queries,
)

operators.load_all()

DRIVER_WINDOW = 50


def test_verified_set_only_contains_registered_names():
    unknown = _DRIVER_VERIFIED - set(QUERIES)
    assert not unknown, f"_DRIVER_VERIFIED has stale names: {sorted(unknown)}"


def test_unverified_queries_fit_in_driver_window():
    unverified = [n for n in QUERIES if n not in _DRIVER_VERIFIED]
    assert len(unverified) <= DRIVER_WINDOW, (
        f"{len(unverified)} unverified queries exceed the {DRIVER_WINDOW}-slot "
        "driver window — some would merge without any driver correctness row; "
        "grow _DRIVER_VERIFIED from the latest green CORRECTNESS artifact"
    )
    window = list(spark_queries())[:DRIVER_WINDOW]
    missing = set(unverified) - set(window)
    assert not missing, f"unverified queries outside the window: {sorted(missing)}"


def test_exposure_is_a_permutation_of_registrations():
    assert sorted(spark_queries()) == sorted(QUERIES)
    # every oracle belongs to a registered query and aligns by name
    assert set(oracle_queries()) <= set(QUERIES)


def test_oracle_coverage_is_total_except_documented_rows_only():
    rows_only = {n for n in QUERIES if QUERIES[n].oracle is None}
    assert rows_only == {
        "q58_approx_count_distinct",
        "q117_approx_percentiles",
    }, (
        "every query needs a DuckDB oracle unless documented rows-only: "
        f"{sorted(rows_only)}"
    )
