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

from . import finite_spark


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
            # finite_spark: the same guard every batch value-sum carries
            # (q20/q44 et al.) — Spark's non-finite -> decimal cast
            # silently NULLs where DuckDB's ERRORS, so an unguarded
            # streaming sum silently drops on one engine and aborts the
            # oracle on the other (events-edge, measured r13)
            F.sum(finite_spark(F.col("value"))
                  .cast("decimal(28,6)")).cast("double").alias("total_value"),
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


# ---------------------------------------------------------------- stateful
def streaming_first_seen(
    stream: DataFrame,
    key_col: str = "fingerprint",
    order_col: str = "ts",
) -> DataFrame:
    """Cross-batch streaming dedup: emit only the FIRST row seen for each
    ``key_col`` value, across micro-batches — the streaming twin of
    d01_exact_dedup, implemented as a custom stateful operator with
    ``applyInPandasWithState`` (SURVEY.md-adjacent: the reference has no
    stateful streaming ops; this is the training-data-pipeline primitive a
    streaming ingest needs so duplicate documents never reach the corpus).

    State design for 100 TB: the stream is grouped BY THE KEY ITSELF, so
    state is one boolean per distinct key, hash-partitioned across
    executors by the state store — no global set, no driver bottleneck.
    Within a batch the winner is the min-``order_col`` row (deterministic).
    In production add a state TTL (GroupStateTimeout / watermark eviction)
    to bound the store for unbounded key domains.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T
    import pandas as pd
    from collections.abc import Iterator

    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(order_col).iloc[[0]]
            if best is None or cand.iloc[0][order_col] < best.iloc[0][order_col]:
                best = cand
        if best is not None:
            state.update((True,))
            yield best

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
