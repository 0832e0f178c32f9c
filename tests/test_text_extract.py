"""Chunking / PII / URL stages: oracle parity + plan shape.

Plan assertions pin the scale-relevant properties (text_extract.py module
docstring): q125/q126 are map-only JVM plans — no shuffle, no Python —
and q127's only shuffle is the bounded domain-key aggregate with map-side
partial aggregation.
"""

from __future__ import annotations

import pytest

from sql_interface_to_xml_database_for_spatial_operations_spark.operators import load_all
from sql_interface_to_xml_database_for_spatial_operations_spark.operators.registry import QUERIES

from conftest import SF_DIR, assert_parity


@pytest.fixture(autouse=True)
def _load():
    load_all()


NAMES = ["q125_document_chunking", "q126_pii_redaction", "q127_url_domains"]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, oracle, name):
    q = QUERIES[name]
    assert_parity(q.fn(spark, SF_DIR), oracle, q.oracle, q.name)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.mark.parametrize("name", ["q125_document_chunking", "q126_pii_redaction"])
def test_map_only_no_python(spark, name):
    plan = _plan(QUERIES[name].fn(spark, SF_DIR))
    assert "Exchange" not in plan, f"{name} must be shuffle-free"
    assert "EvalPython" not in plan, f"{name} must stay JVM-side"


def test_url_domains_partial_agg(spark):
    plan = _plan(QUERIES["q127_url_domains"].fn(spark, SF_DIR))
    assert "EvalPython" not in plan
    # Two-phase aggregate: a partial HashAggregate below the exchange.
    assert plan.count("HashAggregate") >= 2 and "Exchange" in plan


def test_chunks_cover_all_tokens(spark):
    """Window/stride invariant: chunk 0 starts at token 1, consecutive
    chunks overlap by W−S tokens, and the union covers every token."""
    import pyspark.sql.functions as F

    from sql_interface_to_xml_database_for_spatial_operations_spark.operators.text_extract import (
        CHUNK_S,
        CHUNK_W,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import load_table

    chunks = QUERIES["q125_document_chunking"].fn(spark, SF_DIR)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nc"),
        F.sum("n_chunk_tokens").alias("tok_sum"),
        F.max("chunk_idx").alias("last_idx"),
    )
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    rows = per_doc.join(docs, "doc_id").collect()
    assert rows
    for r in rows:
        assert r["last_idx"] == r["nc"] - 1
        # Coverage: last chunk must reach the final token.
        assert r["last_idx"] * CHUNK_S + CHUNK_W >= r["n"]
        # Each non-final chunk has exactly W tokens; total = W·(nc−1) + tail.
        tail = r["n"] - r["last_idx"] * CHUNK_S
        assert r["tok_sum"] == (r["nc"] - 1) * CHUNK_W + tail
