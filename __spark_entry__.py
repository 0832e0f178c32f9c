"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in the package
``sql_interface_to_xml_database_for_spatial_operations_spark`` — this file
only adapts its registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_interface_to_xml_database_for_spatial_operations_spark import operators
from sql_interface_to_xml_database_for_spatial_operations_spark.functions.spatial import (
    register_spatial_functions,
)
from sql_interface_to_xml_database_for_spatial_operations_spark.operators import registry

operators.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: filter + 3-way broadcast
    join + group-by + order + limit (TPC-H Q3 shape — the multi-operator
    pipeline the reference could never push down, SURVEY.md §2.3 J3/J4)."""
    register_spatial_functions(spark)
    sf_dir = "/root/testdata/sf0.001"
    read = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731
    cust = read("customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = read("orders").filter(F.col("o_orderstatus") != "F")
    li = read("lineitem")
    revenue = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)") * (1 - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the
    LLM-pipeline extensions). Each callable takes (spark, sf_dir)."""
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return registry.oracle_queries()
