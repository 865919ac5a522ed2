"""Structured Streaming analytics over event streams.

The reference has no event-time operators (SURVEY.md §2 — ordering, not
time, is its correctness axis), but the engine's event workloads need them;
these are the streaming twins of the batch queries q20/q21: same
aggregation logic, expressed over an unbounded stream with watermarks for
late data.  Used with any EVENT-shaped stream (the ``events`` table schema:
event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows with a late-data watermark: the
    streaming twin of q20_tumbling_window_hourly.  State is bounded by the
    watermark; output columns match the batch query so sinks are
    interchangeable."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("hour"), "event_type", "n_events", "total_value")
    )


def session_window_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows (inactivity gap) per user: the streaming twin of
    q21_sessionization, using Spark's native session_window state machine
    instead of the batch gaps-and-islands formulation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )
