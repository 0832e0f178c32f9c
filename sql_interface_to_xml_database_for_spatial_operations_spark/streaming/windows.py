"""Watermarked window operators over the events stream.

Design-for-scale notes:
- State size is bounded by the watermark: 1-hour lateness bound means
  state for at most (lateness + window) per key group.
- ``availableNow`` triggers let the same pipelines run as incremental
  backfills over historical files — the pattern for replaying 100 TB of
  history through the identical streaming graph.
- Aggregations are keyed by (window, event_type)-style compound keys so
  state shards across executors; no global state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Reference physical schema of events.parquet in its TIMESTAMP(NANOS)
# generation (ts read as long under nanosAsLong). Newer testdata ships ts
# as TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ;
# ``read_events_stream`` probes the actual footer schema and normalizes
# either form, mirroring ``sources.tables.load_table``.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over events parquet. ``max_files_per_trigger``
    bounds each micro-batch's file count — it is a SOURCE option
    (readStream), not a sink option; setting it on the writer is
    silently ignored, which is exactly the kind of quiet misconfig that
    turns a per-file replay into one giant batch.

    File streams require an explicit schema; it is probed from the
    existing files' parquet footers (a driver-side metadata read, not a
    data scan) so both testdata generations of ``ts`` work — long nanos
    under ``nanosAsLong`` and TIMESTAMP_NTZ micros — normalized to a
    plain TIMESTAMP exactly like the batch loader."""
    from pyspark.sql.types import TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Event time = naive wall time = UTC (see sources/tables.py): pinned
    # here too so the streaming path is host-timezone-deterministic.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch_schema = spark.read.parquet(str(path)).schema
    reader = spark.readStream.schema(batch_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(str(path))
    ts_type = batch_schema["ts"].dataType
    if isinstance(ts_type, LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event type; late rows beyond
    the watermark are dropped (the honest late-data policy the reference
    never had to consider)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows (30-min inactivity gap) per user — Spark's native
    session_window state machine; batch-mode equivalent is
    operators.events_ops.q77_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Keyed streaming dedup within the watermark horizon — state expires
    with the watermark, so memory is bounded at any scale."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


STATEFUL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)

STATEFUL_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), True),
        StructField("total", DoubleType(), True),
    ]
)


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    lifetime running totals, one emission per micro-batch that touches
    the user (the pattern for per-entity counters / fraud scores /
    feature freshness that windowed aggregation can't express).

    Scale: state is one (long, double) pair per user, hash-sharded by
    the group key across executors; each micro-batch only loads state
    for the keys it contains. Arrow moves the batch rows — no per-row
    Python overhead."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        stateStructType=STATEFUL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch hash-joins against
    the static dimension — the standard pattern for attaching user/device/
    geo attributes to an event stream. The dimension re-resolves per batch
    (so slowly-changing dims refresh without restarting the query); small
    dims broadcast, so the stream side never shuffles."""
    return events.join(F.broadcast(dim), on)


def stream_stream_join(
    events: DataFrame,
    other: DataFrame,
    left_type: str = "view",
    right_type: str = "click",
    watermark: str = "1 hour",
    within_minutes: int = 30,
) -> DataFrame:
    """Watermarked stream-stream interval join: attribute each
    ``right_type`` event to the same user's preceding ``left_type`` event
    within ``within_minutes`` (the view→click attribution shape).

    Scale design: BOTH sides carry a watermark and the join condition
    bounds the event-time distance, so Spark can size and expire join
    state — per side it holds at most (watermark + interval) of rows per
    user shard; an unbounded-condition stream-stream join would grow
    state forever. Type filters apply BEFORE the join so non-matching
    events never enter state."""
    l = (
        events.filter(F.col("event_type") == left_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("l_event"),
            F.col("ts").alias("l_ts"),
        )
    )
    r = (
        other.filter(F.col("event_type") == right_type)
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("r_event"),
            F.col("ts").alias("r_ts"),
        )
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return l.join(r, cond, "inner").select(
        F.col("l_user").alias("user_id"), "l_event", "r_event", "l_ts", "r_ts"
    )
