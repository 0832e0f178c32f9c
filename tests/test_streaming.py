"""Structured Streaming tests: run each streaming operator with an
availableNow trigger into a memory sink and check the result against the
equivalent batch computation on the same files (deterministic — no
wall-clock dependence)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from sql_interface_to_xml_database_for_spatial_operations_spark.sources.tables import load_table
from sql_interface_to_xml_database_for_spatial_operations_spark.streaming import (
    read_events_stream,
    sessionized,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)

import shutil

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """File-stream sources need a directory; stage the events parquet into
    one (two copies = two discoverable input files)."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def _run_stream(df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "dedup" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_tumbling_counts_matches_batch(spark, events_dir):
    stream = tumbling_counts(read_events_stream(spark, events_dir))
    _run_stream(stream, "tumbling")
    got = spark.sql("SELECT * FROM tumbling").toPandas()

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "total_value")
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(batch))


def test_sliding_counts_matches_batch(spark, events_dir):
    stream = sliding_counts(read_events_stream(spark, events_dir))
    _run_stream(stream, "sliding")
    got = spark.sql("SELECT * FROM sliding").toPandas()
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(batch))


def test_sessionized_matches_batch(spark, events_dir):
    stream = sessionized(read_events_stream(spark, events_dir))
    _run_stream(stream, "sessions")
    got = spark.sql("SELECT * FROM sessions").toPandas()
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
        .toPandas()
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(_sorted(got), _sorted(batch))
    # session semantics also agree with the oracle-checked batch query
    # (q77): total events per user must match
    per_user = got.groupby("user_id")["n_events"].sum()
    batch_per_user = batch.groupby("user_id")["n_events"].sum()
    pd.testing.assert_series_equal(per_user, batch_per_user)


def test_stream_dedup_bounded(spark, events_dir):
    stream = stream_dedup(read_events_stream(spark, events_dir))
    _run_stream(stream, "dedup")
    got = spark.sql("SELECT user_id, event_type FROM dedup").toPandas()
    batch_keys = (
        load_table(spark, SF_DIR, "events").select("user_id", "event_type").distinct().toPandas()
    )
    # one output row per key (single availableNow run over one file)
    assert len(got) == len(got.drop_duplicates())
    assert len(got) == len(batch_keys)


def test_stateful_user_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must persist across micro-batches —
    with the events split into two files and maxFilesPerTrigger=1, each
    user's final (cumulative) emission equals the whole-table totals."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.streaming import (
        stateful_user_totals,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.streaming.windows import (
        EVENTS_RAW_SCHEMA,
    )

    # split events into two files (two micro-batches)
    full = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(f"{SF_DIR}/events.parquet")
    d = str(tmp_path / "two_batches")
    full.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(d)
    full.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(d)

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    q = (
        stateful_user_totals(events)
        .writeStream.format("memory")
        .queryName("stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM stateful").toPandas()

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .toPandas()
    )
    # cumulative semantics: the max emission per user is the lifetime total
    final = got.groupby("user_id")["n_events"].max()
    expected = batch.set_index("user_id")["n_events"].sort_index()
    pd.testing.assert_series_equal(final.sort_index(), expected, check_names=False)
    # at least one user was updated in both micro-batches (2 emissions)
    assert (got.groupby("user_id").size() > 1).any()
    # the emission with the highest n_events is the final state (n is
    # cumulative, so monotonic — unlike total_value, which could dip if
    # values were negative)
    final_rows = got.loc[got.groupby("user_id")["n_events"].idxmax()]
    final_val = final_rows.set_index("user_id")["total_value"].sort_index()
    expected_val = batch.set_index("user_id")["total_value"].sort_index()
    pd.testing.assert_series_equal(final_val, expected_val, check_names=False, rtol=1e-9)


def test_enrich_stream_static_join(spark, events_dir):
    """Stream-static broadcast join: streamed events pick up dimension
    attributes; row count and attachment match the batch join."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.streaming import (
        enrich_stream,
        read_events_stream,
    )

    dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).cast("string").alias("cohort"),
    )
    q = (
        enrich_stream(read_events_stream(spark, events_dir), dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, cohort, event_id FROM enriched").toPandas()
    batch = load_table(spark, SF_DIR, "events").join(dim, "user_id").toPandas()
    assert len(got) == len(batch)
    assert (got["cohort"].astype(int) == got["user_id"] % 5).all()


def test_watermark_finalization_append_mode(spark, tmp_path):
    """Watermark semantics that Spark GUARANTEES (late-row dropping is
    best-effort per the docs; state cleanup + append-mode finalization
    are the contract): in append mode a window emits exactly once, and
    only once its end falls at or below the watermark.

    Batch 1 (earlier mtime): events 10:00-11:59 → watermark 10:59.
    Batch 2: 08:30 (late — may aggregate, but its window finalizes
    immediately) and 12:30 (on time; final watermark 11:30, so neither
    the 11:00 nor the 12:00 window may ever emit)."""
    import os

    from sql_interface_to_xml_database_for_spatial_operations_spark.streaming import (
        tumbling_counts,
    )
    from sql_interface_to_xml_database_for_spatial_operations_spark.streaming.windows import (
        EVENTS_RAW_SCHEMA,
    )

    def ns(hour, minute):
        # 2024-06-01 HH:MM UTC in TIMESTAMP(NANOS) longs
        return (1717200000 + hour * 3600 + minute * 60) * 1_000_000_000

    def rows(batch):
        return [
            (i, t, 1, "click", 1.0, None) for i, t in enumerate(batch)
        ]

    d = str(tmp_path / "late")
    os.makedirs(d)
    b1 = spark.createDataFrame(
        rows([ns(10, 0), ns(10, 30), ns(11, 0), ns(11, 59)]), EVENTS_RAW_SCHEMA
    )
    b2 = spark.createDataFrame(rows([ns(8, 30), ns(12, 30)]), EVENTS_RAW_SCHEMA)
    b1.coalesce(1).write.parquet(d + "/b1")
    b2.coalesce(1).write.parquet(d + "/b2")
    files1 = [f for f in os.listdir(d + "/b1") if f.endswith(".parquet")]
    files2 = [f for f in os.listdir(d + "/b2") if f.endswith(".parquet")]
    os.rename(f"{d}/b1/{files1[0]}", f"{d}/f1.parquet")
    os.rename(f"{d}/b2/{files2[0]}", f"{d}/f2.parquet")
    os.utime(f"{d}/f1.parquet", (1_000_000, 1_000_000))
    os.utime(f"{d}/f2.parquet", (2_000_000, 2_000_000))

    raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    q = (
        tumbling_counts(events, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM late_drop").toPandas()
    hours = {str(w)[11:13] for w in got["window_start"]}
    # final watermark = 12:30 - 1h = 11:30 → only windows ending <= 11:30
    # may emit: the 10:00 window (end 11:00) must; the 11:00 window (end
    # 12:00) and 12:00 window must NOT — they are still open when the
    # stream ends, which is exactly the state the next incremental run
    # would resume
    assert "10" in hours
    assert "11" not in hours
    assert "12" not in hours
    # exactly-once per finalized window
    assert got["window_start"].is_unique
    ten = got[[str(w)[11:13] == "10" for w in got["window_start"]]]
    assert ten["n_events"].tolist() == [2]


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Watermarked stream-stream interval join (view→click attribution
    within 30 min) must produce exactly the batch join's pairs once all
    input is processed (availableNow replay)."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.streaming import (
        stream_stream_join,
    )

    s = read_events_stream(spark, events_dir)
    joined = stream_stream_join(s, read_events_stream(spark, events_dir))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, l_event, r_event FROM ssjoin").toPandas()

    e = load_table(spark, SF_DIR, "events")
    lv = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("l_user"), F.col("event_id").alias("l_event"), F.col("ts").alias("l_ts")
    )
    rc = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user"), F.col("event_id").alias("r_event"), F.col("ts").alias("r_ts")
    )
    batch = (
        lv.join(
            rc,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(F.col("l_user").alias("user_id"), "l_event", "r_event")
        .toPandas()
    )
    assert len(batch) > 0  # non-trivial fixture overlap
    pd.testing.assert_frame_equal(_sorted(got), _sorted(batch))


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Checkpointed incremental restart — the property that makes
    availableNow backfills safe to re-run: a second run with the same
    checkpoint must process ONLY files that arrived since the first run
    (no reprocessing, no duplicates in the file sink)."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.streaming.windows import (
        EVENTS_RAW_SCHEMA,
    )

    full = spark.read.schema(EVENTS_RAW_SCHEMA).parquet(f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    full.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src)

    def run_once():
        raw = spark.readStream.schema(EVENTS_RAW_SCHEMA).parquet(src)
        q = (
            raw.select("event_id", "user_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first == full.filter(F.col("event_id") % 2 == 0).count()

    # second wave of input, then restart from the same checkpoint
    full.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    run_once()
    result = spark.read.parquet(out)
    assert result.count() == full.count()  # everything exactly once
    assert result.select("event_id").distinct().count() == full.count()


def test_q123_empty_events_and_no_view_leak(spark, tmp_path):
    """ADVICE r6 fixes: an empty events table returns an empty result
    instead of TypeError on (None - None)/3, and a completed run drops
    its memory-sink temp view instead of leaking one per invocation."""
    from sql_interface_to_xml_database_for_spatial_operations_spark.operators import load_all
    from sql_interface_to_xml_database_for_spatial_operations_spark.operators.registry import QUERIES

    load_all()
    q123 = QUERIES["q123_stream_tumbling_e2e"].fn

    empty_dir = tmp_path / "sf_empty"
    empty_dir.mkdir()
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame([], schema).write.parquet(str(empty_dir / "events.parquet"))
    out = q123(spark, str(empty_dir))
    assert out.count() == 0
    assert out.columns == ["window_start", "event_type", "n_events", "total_value"]

    views_before = {t.name for t in spark.catalog.listTables()}
    res = q123(spark, SF_DIR)
    assert res.count() > 0
    views_after = {t.name for t in spark.catalog.listTables()}
    assert not {v for v in views_after - views_before if v.startswith("q123_")}
