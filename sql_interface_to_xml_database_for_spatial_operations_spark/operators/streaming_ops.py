"""Driver-checkable end-to-end run of the incremental streaming path.

q75-q79 verify the *batch analogs* of the streaming operators; this module
registers a query that runs the actual ``streaming/windows.py`` watermarked
tumbling aggregation as a Structured Streaming job — file-source
micro-batches, append output mode, watermark-driven finalization — into a
memory sink, and exposes the result to the driver's DuckDB comparison
(VERDICT r4 item 7: prove the watermark path in the driver gate, not just
pytest).

How the stream result becomes batch-equal (and therefore oracle-checkable):

1. Events are staged into three time-banded files plus one far-future
   sentinel event file, with ascending modification times so the file
   source (``maxFilesPerTrigger=1``) replays them in time order — a
   faithful miniature of a historical backfill.
2. In append mode a window emits only once the watermark passes its end.
   The watermark is derived from *seen* event time, so without the
   sentinel the last window(s) would still be open (unemitted) when
   available data runs out. The sentinel pushes the final watermark past
   every real window's end; the engine's closing no-data micro-batch
   (``spark.sql.streaming.noDataMicroBatches.enabled``, on by default;
   behavior pinned by tests/test_streaming.py
   ``test_watermark_finalization_append_mode``) then emits them all.
3. The sentinel's own window never closes, so it never reaches the sink:
   the appended rows are exactly the batch tumbling aggregation over the
   real events — which is the DuckDB oracle.

Scale: this is the identical graph a 100 TB replay would run —
``availableNow`` over a file listing, per-file micro-batches, state
bounded by (watermark + window) per key — just pointed at three staged
files. Staging writes through Spark (no driver-side materialization of
the table); only the 1-row sentinel is created driver-side.

Reference parity: the reference has no streaming surface at all
(SURVEY.md §2.9 — beyond-reference); semantics follow the public
Structured Streaming contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from itertools import count

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming.windows import (
    read_events_stream,
    sessionized,
    stateful_user_totals,
    stream_stream_join,
    tumbling_counts,
)
from .registry import query

_RUN_IDS = count()

# Per-row micro-batch progress of the LAST _run_staged_stream call
# (r17, VERDICT r16 task 5): bench.py's streaming lane reads this to
# attribute e2e wall-clock to batch count vs per-batch cost — bench
# instrumentation only, never part of a query's result.
LAST_RUN_PROGRESS: dict[str, list[dict]] = {}

_Q123_ORACLE = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
"""


def _run_staged_stream(
    spark: SparkSession, sf_dir: str, name: str, build, out_select, band_transform=None
):
    """Shared harness for the streaming e2e driver rows: stage the events
    table as three time-banded files plus a far-future sentinel (module
    docstring), replay them as per-file micro-batches through ``build``'s
    watermarked streaming aggregation into a memory sink, and return the
    materialized finalized rows (``out_select`` shapes the sink table).
    ``band_transform`` (r8) rewrites each band DataFrame before staging —
    q142 duplicates every row WITHIN its band so the stateful dedup has
    real duplicates to drop without racing watermark eviction across
    band boundaries. Returns None when the events table is empty
    (ADVICE r6 guard)."""
    events = load_table(spark, sf_dir, "events")
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    if lo is None:
        return None

    run = f"{name}_{os.getpid()}_{next(_RUN_IDS)}"
    stage = tempfile.mkdtemp(prefix=f"{run}_src_")
    ckpt = tempfile.mkdtemp(prefix=f"{run}_ckpt_")
    try:
        # Three contiguous time bands -> three micro-batches in time order.
        span = (hi - lo) / 3
        bounds = [lo, lo + span, lo + 2 * span]
        for i, start in enumerate(bounds):
            band = events.filter(F.col("ts") >= F.lit(start))
            if i < 2:
                band = band.filter(F.col("ts") < F.lit(bounds[i + 1]))
            if band_transform is not None:
                band = band_transform(band)
            band.coalesce(1).write.parquet(f"{stage}/b{i}")
            _promote(stage, f"b{i}", f"f{i}.parquet", mtime=1_000_000 + i)
        # Sentinel: one event far past max(ts) + watermark + window/gap, so
        # the closing watermark exceeds every real window's (or session's)
        # end. Its own window never finalizes, so it never reaches the sink.
        sentinel = spark.createDataFrame(
            [(-1, "sentinel", -1)], "event_id long, event_type string, user_id long"
        ).select(
            "event_id",
            (F.lit(hi) + F.expr("INTERVAL 6 HOURS")).alias("ts"),
            "user_id",
            "event_type",
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        sentinel.coalesce(1).write.parquet(f"{stage}/bs")
        _promote(stage, "bs", "f3.parquet", mtime=1_000_000 + 3)

        def make_src():
            # maxFilesPerTrigger is a SOURCE option: on the writer it is
            # silently ignored and all files collapse into one batch
            # (caught in the r6 self-review — the per-file replay here
            # is the point of these driver rows). A factory rather than
            # one DataFrame: stream-stream joins (q138) need their own
            # reader per side.
            return read_events_stream(spark, stage, max_files_per_trigger=1)

        stream = build(make_src)
        handle = (
            stream.writeStream.format("memory")
            .queryName(run)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        handle.awaitTermination(300)
        if handle.isActive:  # pragma: no cover - hung stream safety valve
            handle.stop()
            raise RuntimeError(f"{name} stream did not finish within 300s")
        try:
            LAST_RUN_PROGRESS[name] = [
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows", 0),
                    "triggerMs": (p.get("durationMs") or {}).get(
                        "triggerExecution"
                    ),
                    "stateOps": len(p.get("stateOperators") or []),
                }
                for p in (handle.recentProgress or [])
            ]
        except Exception:  # progress introspection must never fail a row
            LAST_RUN_PROGRESS[name] = []
        # Memory-sink rows live on the driver already; materialize them
        # and DROP the per-run temp view before returning (ADVICE r6:
        # the unique queryName per run would otherwise accumulate a view
        # per invocation for the life of the session).
        out = out_select(spark.table(run))
        rows = out.collect()
        spark.catalog.dropTempView(run)
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@query("q123_stream_tumbling_e2e", oracle=_Q123_ORACLE)
def q123_stream_tumbling_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts computed BY THE STREAMING ENGINE
    (file-source micro-batches → append mode → memory sink) over the
    events table, equal to the batch/DuckDB aggregation once the sentinel
    advances the final watermark past every real window."""
    out = _run_staged_stream(
        spark,
        sf_dir,
        "q123",
        lambda src: tumbling_counts(src(), window="1 hour", watermark="1 hour"),
        lambda t: t.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        ),
    )
    if out is None:
        return spark.createDataFrame(
            [],
            "window_start string, event_type string, n_events long, total_value double",
        )
    return out


# Session-window merge semantics (public Structured Streaming contract):
# an event EXTENDS the current session iff its time is strictly inside
# [start, last + gap), so a gap of EXACTLY the session timeout starts a
# NEW session — the oracle's island condition is therefore >= 30 min,
# one ulp-class different from q77's batch gaps-and-islands (> 30 min),
# and this oracle encodes the streaming engine's semantics, not q77's.
_Q137_ORACLE = """
    WITH m AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
"""


@query("q137_stream_session_e2e", oracle=_Q137_ORACLE)
def q137_stream_session_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) computed BY THE STREAMING ENGINE —
    ``session_window`` state merging across micro-batch boundaries is
    exactly what the time-banded replay exercises: sessions spanning a
    band boundary must merge across batches, and append mode only emits
    a session once the watermark passes its end (last event + gap),
    which the sentinel guarantees for every real session. The DuckDB
    oracle recomputes sessions batch-side with the engine's >=-gap
    island rule."""
    out = _run_staged_stream(
        spark,
        sf_dir,
        "q137",
        lambda src: sessionized(src(), gap="30 minutes", watermark="1 hour"),
        lambda t: t.select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        ),
    )
    if out is None:
        return spark.createDataFrame(
            [], "user_id long, session_start string, session_end string, n_events long"
        )
    return out


def _promote(stage: str, subdir: str, name: str, mtime: int) -> None:
    """Move the single part-file of a 1-partition write up into the stream
    source dir under a stable name with a controlled modification time
    (the file source orders discovery by mtime)."""
    part = next(
        f for f in os.listdir(f"{stage}/{subdir}") if f.endswith(".parquet")
    )
    os.rename(f"{stage}/{subdir}/{part}", f"{stage}/{name}")
    shutil.rmtree(f"{stage}/{subdir}", ignore_errors=True)
    os.utime(f"{stage}/{name}", (mtime, mtime))


_Q138_ORACLE = """
    SELECT a.user_id, a.event_id AS view_event, b.event_id AS click_event,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'click'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
"""


@query("q138_stream_interval_join_e2e", oracle=_Q138_ORACLE)
def q138_stream_interval_join_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join run BY THE STREAMING
    ENGINE (q96's batch attribution as the oracle): each side reads the
    staged band files independently, both carry watermarks, and the
    bounded event-time condition lets Spark expire join state — the
    per-file replay forces matches whose view and click arrive in
    DIFFERENT micro-batches through the state store. Inner-join rows
    emit as they match; the sentinel (type 'sentinel') is filtered
    before entering state on either side."""
    out = _run_staged_stream(
        spark,
        sf_dir,
        "q138",
        lambda src: stream_stream_join(src(), src(), within_minutes=30),
        lambda t: t.select(
            "user_id",
            F.col("l_event").alias("view_event"),
            F.col("r_event").alias("click_event"),
            F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
            F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        ),
    )
    if out is None:
        return spark.createDataFrame(
            [],
            "user_id long, view_event long, click_event long, "
            "view_ts string, click_ts string",
        )
    return out


# The dedup result is the events table itself: every row is staged
# twice (band_transform), the keyed state drops the second copy, and
# event_ids never repeat across bands so watermark eviction can never
# resurface a key. Unlike the windowed rows, dropDuplicatesWithinWatermark
# emits rows IMMEDIATELY in append mode — so the far-future sentinel
# WOULD reach the sink; it is filtered by key (event_id < 0) at the
# sink read, not by waiting on a window close.
_Q142_ORACLE = """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           value
    FROM events
"""


@query("q142_stream_dedup_e2e", oracle=_Q142_ORACLE)
def q142_stream_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (``dropDuplicatesWithinWatermark``) run
    BY THE STREAMING ENGINE: each band file carries every event twice,
    keyed state on event_id drops the duplicates across the per-file
    micro-batch replay, and the appended rows equal the original events
    table (the DuckDB oracle). This is the streaming analog of q78's
    batch keyed dedup — state is bounded by the 1-hour watermark delay,
    which is the 100 TB story: dedup state never grows past one delay
    window per key, regardless of replay length."""
    out = _run_staged_stream(
        spark,
        sf_dir,
        "q142",
        lambda src: src()
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"]),
        lambda t: t.filter(F.col("event_id") >= 0).select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
        ),
        band_transform=lambda df: df.unionAll(df),
    )
    if out is None:
        return spark.createDataFrame(
            [],
            "event_id long, user_id long, event_type string, "
            "ts_s string, value double",
        )
    return out


# The sink holds one emission per (user, micro-batch touching the
# user) with monotonically increasing n_events; the LAST emission per
# user is the lifetime total, which is the batch oracle. The custom
# stateful operator (streaming/windows.py stateful_user_totals) keeps
# one (count, sum) pair per user in the state store across batches —
# the per-entity-counter pattern windowed aggregation can't express.
_Q147_ORACLE = """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(floor(sum(COALESCE(value, 0)) * 1000000 + 0.5) AS BIGINT)
             AS total_micro
    FROM events
    GROUP BY user_id
"""


@query("q147_stream_stateful_totals_e2e", oracle=_Q147_ORACLE)
def q147_stream_stateful_totals_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``) run BY THE
    STREAMING ENGINE: per-user lifetime running totals whose state must
    survive micro-batch boundaries — the banded replay guarantees most
    users appear in several batches, so a state loss would shrink the
    final counts. The last emission per user (max n_events — strictly
    increasing per user) must equal the batch aggregation over the
    whole events table. The sentinel (user_id = −1) emits like any key
    and is filtered at the sink read; totals compare as micro-int."""
    out = _run_staged_stream(
        spark,
        sf_dir,
        "q147",
        lambda src: stateful_user_totals(src()),
        lambda t: t.filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr(
                "CAST(floor(max_by(total_value, n_events) * 1000000 + 0.5)"
                " AS BIGINT)"
            ).alias("total_micro"),
        ),
    )
    if out is None:
        return spark.createDataFrame(
            [], "user_id long, n_events long, total_micro long"
        )
    return out
