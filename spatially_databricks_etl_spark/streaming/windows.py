"""Structured Streaming layer (SURVEY.md §2b: absent from the
reference, which is pure batch — `Spatially ETL test.py` has no
readStream).

Event-time semantics over the `events` fixture shape: watermark for
late-data bounds, tumbling/sliding/session windows, streaming dedup.
All builders take EITHER a streaming or a batch DataFrame — the same
code path works for tests (batch parity) and production (readStream),
which is exactly Structured Streaming's contract: a streaming query
is the incremental execution of the equivalent batch plan.

State-store scale note: every windowed agg shuffles on (window, key)
and keeps state per open window; the watermark bounds state size —
without it state grows forever at 100 TB/day. Session windows merge
state per key; `dropDuplicatesWithinWatermark` keeps only
in-watermark keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def ensure_event_time(df: DataFrame, time_col: str) -> DataFrame:
    """Watermarks require TimestampType (LTZ); a TIMESTAMP_NTZ event
    column (e.g. parquet ``timestamp[us]`` without UTC adjustment under
    Spark's NTZ inference) hard-fails ``withWatermark`` with
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Under the UTC session timezone
    the cast is a pure re-labeling (bit-identical micros), so apply it
    defensively before every watermark."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[time_col].dataType, TimestampNTZType):
        return df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return df


def read_events_stream(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over parquet event files (deterministic test
    source; swap for kafka/`rate` in production — the downstream plan
    is identical)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_window_agg(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Non-overlapping event-time windows: count + sum(value) per
    (window, key). Watermark bounds both late-data admission and
    state retention."""
    df = (
        ensure_event_time(events, time_col).withWatermark(time_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        df.groupBy(F.window(time_col, window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    time_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide
    windows); same state-bounding watermark contract."""
    df = (
        ensure_event_time(events, time_col).withWatermark(time_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        df.groupBy(
            F.window(time_col, window_duration, slide).alias("w"), F.col(key_col)
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    time_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: per-key sessions closed after ``gap`` of
    inactivity (dynamic, state-merging windows)."""
    df = (
        ensure_event_time(events, time_col).withWatermark(time_col, watermark)
        if events.isStreaming
        else events
    )
    return (
        df.groupBy(F.session_window(time_col, gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    subset: list[str],
    *,
    watermark: str = "2 hours",
    time_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state: only keys newer than
    the watermark are retained."""
    if events.isStreaming:
        return (
            ensure_event_time(events, time_col)
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(subset)
        )
    return events.dropDuplicates(subset)


def run_to_memory_sink(stream_df: DataFrame, query_name: str, *, timeout_s: int = 60):
    """Test harness: run a streaming query to completion (availableNow)
    into an in-memory table; returns the StreamingQuery."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
