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
