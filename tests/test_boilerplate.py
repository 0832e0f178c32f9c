"""q141 boilerplate removal: oracle parity, detection semantics, plan
shape (one hash-df shuffle + broadcast flag join + one regroup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_interface_to_xml_database_for_spatial_operations_spark.operators import load_all
from sql_interface_to_xml_database_for_spatial_operations_spark.operators.boilerplate import (
    BP_W,
    MIN_DF,
    _raw_with_boilerplate,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.operators.registry import QUERIES
from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import load_table

from conftest import SF_DIR, assert_parity


class TestQ141:
    def test_oracle_parity(self, spark, oracle):
        load_all()
        q = QUERIES["q141_boilerplate_removal"]
        assert_parity(q.fn(spark, SF_DIR), oracle, q.oracle, "q141")

    def test_exactly_the_injected_headers_flagged(self, spark):
        """Every doc carries exactly the two injected 12-token header
        blocks as boilerplate — natural duplicate documents stay below
        MIN_DF and must NOT be flagged."""
        load_all()
        df = QUERIES["q141_boilerplate_removal"].fn(spark, SF_DIR)
        counts = df.groupBy("n_boilerplate").count().collect()
        assert {r.n_boilerplate for r in counts} == {2}

    def test_header_alignment(self, spark):
        """The two headers occupy blocks 0 and 1 exactly (each template
        is BP_W tokens), so the fixture is well-formed by construction."""
        d = load_table(spark, SF_DIR, "documents")
        raw = _raw_with_boilerplate(d)
        row = raw.select(F.split("raw", " ").alias("t")).first()
        from sql_interface_to_xml_database_for_spatial_operations_spark.operators.boilerplate import (
            _HDR1,
            _HDR2,
        )
        assert len(_HDR1.split(" ")) == BP_W == len(_HDR2.split(" "))
        assert row.t[1] in {f"src{i}" for i in range(25)}  # {s} substituted
        assert MIN_DF <= 25  # fixture floor: >=25 docs per source

    def test_plan_broadcasts_flag_join(self, spark):
        load_all()
        plan = (
            QUERIES["q141_boilerplate_removal"]
            .fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        # block text must not survive into the exploded/flagged side:
        # only hashes flow (the projection after explode drops `toks`)
        assert plan.count("Exchange") <= 4
