"""Fixture-table loading and view registration.

Replaces the reference's four per-DBMS collection scans (SURVEY.md §2.1
S1-S4: BaseX/eXist XQuery scans, Mongo ``find``, CouchDB ``_find`` with
hand-rolled pagination) with a single partitioned columnar read: Catalyst
gets predicate pushdown + column pruning on every table for free, and the
parquet row-group layout replaces client-side pagination.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Filters/projections applied downstream reach
    the parquet reader via Catalyst (check ``PushedFilters`` in explain).

    ``events.ts`` has shipped in two physical forms across testdata
    generations, both normalized here to a plain TIMESTAMP (LTZ) column so
    every downstream operator sees one type:

    - TIMESTAMP(NANOS): with ``spark.sql.legacy.parquet.nanosAsLong`` it
      arrives as a long that we truncate to microseconds (integer ``div``
      — same ns→µs truncation DuckDB applies);
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ, which functions like ``unix_micros`` reject. Cast to
      TIMESTAMP.

    Event time in this engine is DEFINED as naive wall time = UTC, and
    the session timezone is pinned to UTC here to make that hold on any
    host: the NTZ→TIMESTAMP cast and every downstream date_trunc/
    date_format/unix_micros are session-zone-relative, and under a
    DST zone (e.g. a host in America/New_York) wall times inside a
    spring-forward gap would shift by an hour and interval arithmetic
    would warp across transitions — diverging from the DuckDB oracle's
    naive reads (r6 self-review finding). Under UTC the mapping
    wall↔instant is linear and the oracle comparison is exact.

    Both confs are set here at runtime (they are runtime-settable)
    rather than only in ``session.get_spark``: callers such as the
    round driver supply their own vanilla SparkSession, which would
    otherwise die with ``PARQUET_TYPE_ILLEGAL`` on a TIMESTAMP(NANOS)
    events file (and inherit the host zone)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a Python-heavy map stage's input across the session's
    cores (r17 optimization round, guide §2.5 "input skew: one huge
    unsplittable file ... repartition immediately after the read").

    The fixture tables are single parquet files that Spark scans as ONE
    partition, so a mapInPandas/pandas-UDF stage downstream ran its
    whole per-row Python compute on one core (measured: q163's JPEG
    encode+decode 2.4 s single-task → 0.7 s fanned out on local[32]).

    Scale-adaptive, not a local constant: when the input already reads
    at least ``defaultParallelism`` files (any real at-scale table),
    this is a NO-OP — no shuffle is added; only an under-partitioned
    input pays one round-robin exchange of the (narrow, pre-projected)
    rows. ``defaultParallelism`` is the session's own core count on
    local[N] and the cluster total on a real deployment.

    The probe is ``inputFiles()`` (leaf-scan metadata, driver-cheap),
    not ``df.rdd.getNumPartitions()`` — the ``.rdd`` conversion forced
    a full physical-plan translation per call (ADVICE r17). File count
    under-estimates the scan partitions of one huge SPLITTABLE file, in
    which case the repartition is redundant but harmless (one narrow
    exchange); every current call site feeds small single-file
    fixtures, and at 100 TB real tables carry >= cores files."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # exotic sources without file metadata
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view so ``spark.sql`` queries
    (the reference's user surface, SURVEY.md §3.1) see the same catalog the
    DuckDB oracle does."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
