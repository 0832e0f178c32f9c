"""Event-stream operators in their batch form over the ``events`` table.

The reference has no streaming at all (SURVEY.md §2.9); these queries
define the *semantics* (tumbling/sliding windows, sessionization, keyed
dedup, JSON property extraction) in deterministic batch form so the
DuckDB oracle can check them; the ``streaming`` package runs the same
logic as Structured Streaming with watermarks (tested separately —
streaming output is not oracle-hashable).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import query


@query(
    "q75_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY window_start, event_type
    """,
)
def q75_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour windows (batch semantics of
    ``groupBy(window(ts, '1 hour'))``): count/sum/distinct per window ×
    event type — map-side-combinable, one shuffle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "q76_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             value
      FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:00') AS window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM assigned GROUP BY ws
    """,
)
def q76_sliding_window(spark, sf_dir):
    """Sliding windows (2h length, 1h slide): every event lands in two
    windows — ``F.window(ts, '2 hours', '1 hour')``. The oracle assigns
    the same two window starts by explicit truncation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q77_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM marked GROUP BY user_id
    """,
)
def q77_sessionize(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via gaps-and-islands — the
    deterministic batch semantics of ``session_window``/
    ``applyInPandasWithState``. Single shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # full-precision gap: cast('long') truncates to whole seconds, so a
    # 1800.05 s gap would floor to 1800 and miss the oracle's
    # > INTERVAL 30 MINUTE boundary — compare microseconds instead
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q78_keyed_dedup_first",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q78_keyed_dedup_first(spark, sf_dir):
    """Keyed dedup keeping the first event per (user, type) — the batch
    semantics of streaming ``dropDuplicates(['user_id','event_type'])``,
    made deterministic by (ts, event_id) ordering."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )


@query(
    "q79_json_props",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q79_json_props(spark, sf_dir):
    """Semi-structured property access: JSON path extraction from the
    ``props`` column (the document-model remnant — reference rows are
    JSON/XML documents, SURVEY.md §1.1), JVM-side via get_json_object."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q96_event_attribution",
    oracle="""
    SELECT a.user_id, a.event_id AS view_event, b.event_id AS click_event
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'click'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
)
def q96_event_attribution(spark, sf_dir):
    """Event attribution: each click joined to the same user's preceding
    views within 30 minutes — the batch semantics of the watermarked
    stream-stream interval join (streaming/windows.py
    stream_stream_join; incremental parity in tests/test_streaming.py).
    Type filters apply before the join (state/scan pruning), the equi key
    is user_id, and the interval predicate is a residual on the hash
    join — never a BNLJ over the full stream."""
    e = load_table(spark, sf_dir, "events")
    lv = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("view_event"),
        F.col("ts").alias("l_ts"),
    )
    rc = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("click_event"),
        F.col("ts").alias("r_ts"),
    )
    return (
        lv.join(
            rc,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(F.col("l_user").alias("user_id"), "view_event", "click_event")
    )


@query(
    "q116_trailing_range_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS value_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q116_trailing_range_window(spark, sf_dir):
    """Per-user trailing 1-hour RANGE window (value-based frame, unlike
    q76's fixed slide buckets): for every event, how many events / how
    much value the same user produced in the preceding hour — the
    velocity/rate-limit feature shape. Frames order on epoch MICROS (a
    long) so the 3 600 000 000-µs bound is exact in both engines —
    ordering on seconds would truncate sub-second timestamps and shift
    frame edges. One shuffle on user_id; the frame scan is a single
    ordered pass per partition, and decimal summation keeps the running
    aggregate order-independent."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("value_trailing_1h"),
    )


@query(
    "q119_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', cohort_week, act_week) / 7 AS BIGINT) AS week_n,
           CAST(count(*) AS BIGINT) AS n_users
    FROM firsts JOIN activity USING (user_id)
    GROUP BY cohort_week, act_week
    """,
)
def q119_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix: users grouped by first-activity
    week, counted in every later week they return — the standard
    engagement rollup. Both inputs partial-aggregate to |users|-sized
    tables before the equi-join on user_id (the raw event stream never
    joins anything), and week_n derives from the two week-start dates
    in-row, so the whole query is two map-combined aggregations + one
    user-keyed join at any scale."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = e.select("user_id", F.date_trunc("week", "ts").alias("act_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy("cohort_week", "act_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort"),
            F.floor(F.datediff("act_week", "cohort_week") / 7).cast("bigint").alias("week_n"),
            F.col("n_users"),
        )
    )


@query(
    "q120_event_funnel",
    oracle="""
    WITH m AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      CAST(count(*) AS BIGINT) AS n_users,
      CAST(count(t_view) AS BIGINT) AS n_viewed,
      CAST(count(*) FILTER (WHERE t_view < t_click) AS BIGINT) AS n_view_then_click,
      CAST(count(*) FILTER (WHERE t_view < t_click AND t_click < t_purchase) AS BIGINT)
        AS n_full_funnel
    FROM m
    """,
)
def q120_event_funnel(spark, sf_dir):
    """Ordered view→click→purchase funnel via conditional MIN pivots:
    one user-keyed aggregation collapses each user's history to three
    first-occurrence timestamps (map-side combinable — the classic
    funnel shape that needs no self-join and no window), then the
    ordering predicates count in a single global reduce. NULL semantics
    do the stage gating: a user missing a stage yields NULL and fails
    the < comparison in both engines."""
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(f"t_{t}")
            for t in ("view", "click", "purchase")
        ]
    )
    return m.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count_if(F.col("t_view") < F.col("t_click")).alias("n_view_then_click"),
        F.count_if(
            (F.col("t_view") < F.col("t_click")) & (F.col("t_click") < F.col("t_purchase"))
        ).alias("n_full_funnel"),
    )
