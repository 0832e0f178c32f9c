"""Temporal join operators over the ``events`` table.

Beyond-reference surface (the reference is pure request/response SELECT
federation — SURVEY.md §2.3 notes as-of and range joins are absent):
these are the two joins every event/time-series workload needs, written
so the *plan* survives 100 TB:

- **As-of join** via union + partitioned window, NOT a per-row lookup
  join: both sides shuffle ONCE on the key, then a single ordered pass
  per key carries the latest left-side row forward (``last(...,
  ignorenulls)``). No broadcast of a big side, no O(n·m) nested loop,
  and skew is bounded by events-per-key.
- **Range (interval) join** via band bucketing: an inequality-only join
  would plan as BroadcastNestedLoopJoin (O(n·m) at scale); bucketing ts
  into band-width buckets and equi-joining on (key, bucket, bucket+1)
  turns it into a shuffled hash join whose candidate set is only
  adjacent buckets, with the exact predicate re-checked after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query

TS_FMT = "yyyy-MM-dd HH:mm:ss"

BAND_SECONDS = 300  # range-join width: 5 minutes


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
) -> DataFrame:
    """Generic as-of join: for every ``left`` row, attach the most recent
    ``right`` row with ``right.ts <= left.ts`` and the same key.

    Implemented as union + window (one shuffle total): right rows sort
    before left rows at equal ts (tag 0 < 1), so an exact-ts right row IS
    visible to the left row, matching ASOF semantics. Right columns other
    than (on, ts) are carried as a struct and split back out by caller.
    """
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_tag"),
        F.struct(*[c for c in right.columns if c not in (on,)]).alias("_r"),
    )
    l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_tag"),
        F.struct(*[c for c in left.columns if c not in (on,)]).alias("_l"),
    )
    unioned = l.unionByName(r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType)), allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
        .drop("_tag", "_r")
    )


@query(
    "q83_asof_join",
    oracle=f"""
    WITH purchases AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ),
    views AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CAST(p.value AS DOUBLE) AS purchase_value,
           v.event_id AS view_id,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q83_asof_join(spark, sf_dir):
    """As-of join: each purchase paired with the user's most recent prior
    (or same-instant) view. One shuffle on user_id via union+window — the
    scale path for trades-vs-quotes style joins."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    joined = asof_join(purchases, views, on="user_id")
    return joined.select(
        F.col("_l.event_id").alias("purchase_id"),
        F.col("user_id"),
        F.date_format("ts", TS_FMT).alias("purchase_ts"),
        F.col("_l.value").cast("double").alias("purchase_value"),
        F.col("_match.event_id").alias("view_id"),
        F.date_format("_match.ts", TS_FMT).alias("view_ts"),
    )


@query(
    "q84_range_join_banded",
    oracle=f"""
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
           a.event_type AS type_a, b.event_type AS type_b,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS ts_a,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS ts_b
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL {BAND_SECONDS} SECOND
     AND a.event_id <> b.event_id
    """,
)
def q84_range_join_banded(spark, sf_dir):
    """Interval self-join: pairs of same-user events within 5 minutes.
    The inequality predicate alone would plan as a nested-loop join;
    bucketing ts into 5-minute bands and equi-joining each left row to
    its own and the next band makes it a shuffled hash join — candidate
    pairs are only same/adjacent buckets, the exact range predicate is
    re-applied after the join."""
    e = load_table(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts"))
    bucket = F.floor(micros / (BAND_SECONDS * 1_000_000))
    a = e.select(
        F.col("event_id").alias("id_a"),
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("ts").alias("tsa"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    b = e.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id").alias("user_b"),
        F.col("event_type").alias("type_b"),
        F.col("ts").alias("tsb"),
        bucket.alias("bucket"),
    )
    pairs = a.join(b, (a.user_id == b.user_b) & (a.bucket == b.bucket)).filter(
        (F.col("tsb") >= F.col("tsa"))
        & (F.col("tsb") <= F.col("tsa") + F.expr(f"INTERVAL {BAND_SECONDS} SECONDS"))
        & (F.col("id_a") != F.col("id_b"))
    )
    return pairs.select(
        "id_a",
        "id_b",
        "user_id",
        "type_a",
        "type_b",
        F.date_format("tsa", TS_FMT).alias("ts_a"),
        F.date_format("tsb", TS_FMT).alias("ts_b"),
    )


@query(
    "q89_gap_fill_spine",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events WHERE user_id < 20 GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ),
    actual AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n
      FROM events WHERE user_id < 20 GROUP BY user_id, hour
    )
    SELECT s.user_id,
           strftime(s.hour, '%Y-%m-%d %H:00') AS hour,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN actual a ON s.user_id = a.user_id AND s.hour = a.hour
    """,
)
def q89_gap_fill_spine(spark, sf_dir):
    """Time-spine gap filling: a dense hourly series per user (sequence()
    between each user's min/max hour, exploded) left-joined to actual
    hourly counts — zero-filled gaps, the shape every time-series rollup
    needs. The spine generates from per-user bounds (one aggregate), so
    spine size is hours-in-range per user, never a global cross join."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, INTERVAL 1 HOUR)")).alias("hour"),
    )
    actual = e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        spine.join(actual, ["user_id", "hour"], "left")
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Hypertable rollup (continuous-aggregate pattern; driver row next round)
# ---------------------------------------------------------------------------


def hypertable_rollup(events: DataFrame, value_col: str = "value") -> DataFrame:
    """TimescaleDB-style continuous-aggregate rollup: minute-level
    partials are computed from the raw events ONCE, then the hour and
    day levels re-aggregate the PARTIALS — never the event stream. At
    100 TB this is the difference between one scan and three: the
    minute aggregate is ~10⁴-10⁵× smaller than the raw table, so the
    coarser levels are near-free, exactly how a materialized
    continuous aggregate refreshes incrementally. Sums and counts
    re-aggregate losslessly (avg is derived, never averaged-of-avgs);
    the minute partial is ``tracked_persist``-ed so the two coarser
    levels share one physical computation.

    Output: one row per (level, bucket_start, event_type) with
    level ∈ {minute, hour, day}, n events and value stats.
    """
    from ..caching import tracked_persist

    minute = tracked_persist(
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("bucket"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("value_sum"),
            F.min(value_col).alias("value_min"),
            F.max(value_col).alias("value_max"),
        )
    )

    def coarsen(src: DataFrame, unit: str) -> DataFrame:
        return src.groupBy(
            F.date_trunc(unit, F.col("bucket")).alias("bucket"),
            "event_type",
        ).agg(
            F.sum("n").alias("n"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )

    hour = coarsen(minute, "hour")
    day = coarsen(hour, "day")

    def leveled(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            "bucket",
            "event_type",
            "n",
            "value_sum",
            "value_min",
            "value_max",
        )

    return (
        leveled(minute, "minute")
        .unionByName(leveled(hour, "hour"))
        .unionByName(leveled(day, "day"))
    )
