"""Storage-layout operators: bucketing and partitioned writes.

The reference has no storage layer of its own (documents live in the
backing stores), so this is pure beyond-reference scale surface — the
two layout tools that decide whether a 100 TB workload shuffles:

- **Bucketing** pre-shuffles a table ONCE at write time: two tables
  bucketed (and sort-ordered) on the same key with the same bucket count
  join with NO exchange on either side — the join that dominates a fact-
  to-fact workload becomes a streaming zip of pre-sorted buckets. At
  100 TB, re-shuffling lineitem for every query is the single biggest
  avoidable cost; bucketing amortizes it to one write.
- **Partitioned layout** turns predicates on the partition column into
  directory pruning: a filter on one value reads one directory, not the
  table. Catalyst shows this as PartitionFilters on the scan.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) managed table.

    Bucket count is a cluster-lifetime choice: pick ≈ (largest expected
    table size / 128 MiB) rounded to a power of two, identically for
    every table sharing the join key."""
    keys = [key] if isinstance(key, str) else key
    # a managed-table location can survive a previous session whose
    # metastore is gone; overwrite mode then fails with
    # LOCATION_ALREADY_EXISTS, so drop both the catalog entry and any
    # stale directory before writing
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    scheme = urlparse(warehouse).scheme
    if scheme in ("", "file"):
        loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    # non-local warehouse (hdfs://, s3a://, ...): os-level cleanup cannot
    # reach it (ADVICE r3) — rely on DROP TABLE having removed the managed
    # location; if an orphaned directory from a lost metastore remains,
    # saveAsTable will surface LOCATION_ALREADY_EXISTS rather than this
    # helper silently deleting remote data it cannot inspect
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def write_partitioned(df: DataFrame, path: str, cols: str | list[str]) -> None:
    """Persist ``df`` hive-partitioned by ``cols`` (directory-per-value).

    Choose low-cardinality columns that queries filter on (date, type,
    tenant); high-cardinality partitioning creates a small-files problem
    instead of pruning."""
    cols = [cols] if isinstance(cols, str) else cols
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def bucketed_join(spark: SparkSession, left: str, right: str, on: list[str]) -> DataFrame:
    """Join two same-bucketed tables — plans with zero Exchange nodes
    when bucket layouts line up (verified in tests/test_layout.py)."""
    return spark.table(left).join(spark.table(right), on)
