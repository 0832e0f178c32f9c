"""Driver row for the hypertable rollup (VERDICT r6 item 1).

``temporal.hypertable_rollup`` holds the implementation (minute partials
persisted once, hour/day re-aggregating the partials — the
continuous-aggregate refresh shape); this module adds the oracle-gated
query in a separate module so the verified temporal-family fingerprints
stay untouched (same rationale as relations_ops.py).

Exactness: ``value`` is a double, and double sums are
summation-order-dependent — Spark's partial aggregation and DuckDB's
would disagree in last ulps. The query therefore rolls up
``floor(value·1e6 + 0.5)`` micro-unit BIGINTs (the r6 tie-stable
idiom): integer sums are order-independent and exact on both engines,
and min/max/count are unaffected. The rollup itself stays generic over
its value column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_LEVEL_SQL = """
      SELECT '{name}' AS level, date_trunc('{unit}', {src}) AS bucket,
             event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS value_sum,
             CAST(min(v) AS BIGINT) AS value_min,
             CAST(max(v) AS BIGINT) AS value_max
      FROM base GROUP BY 2, 3
"""

_Q134_ORACLE = f"""
    WITH base AS (
      SELECT ts, event_type, CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    lv AS (
      {_LEVEL_SQL.format(name="minute", unit="minute", src="ts")}
      UNION ALL
      {_LEVEL_SQL.format(name="hour", unit="hour", src="ts")}
      UNION ALL
      {_LEVEL_SQL.format(name="day", unit="day", src="ts")}
    )
    SELECT level, strftime(bucket, '%Y-%m-%d %H:%M') AS bucket, event_type,
           n, value_sum, value_min, value_max
    FROM lv
"""


@query("q134_hypertable_rollup", oracle=_Q134_ORACLE)
def q134_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup driver row: minute/hour/day levels
    over events, where the engine computes hour and day FROM the minute
    partials (one raw scan, plan-asserted in tests/test_rollup.py) while
    the oracle recomputes every level from the raw table — so a lossy
    partial re-aggregation (avg-of-avgs, double-counted partials,
    dropped buckets) diverges."""
    from .temporal import hypertable_rollup

    e = load_table(spark, sf_dir, "events").select(
        "ts",
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    out = hypertable_rollup(e, value_col="v")
    return out.select(
        "level",
        F.date_format("bucket", "yyyy-MM-dd HH:mm").alias("bucket"),
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("value_sum").cast("bigint").alias("value_sum"),
        F.col("value_min").cast("bigint").alias("value_min"),
        F.col("value_max").cast("bigint").alias("value_max"),
    )
