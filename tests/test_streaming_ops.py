"""Streaming analytics tests: run the windowed/session operators over a
file stream and check they agree with the batch formulations (q20/q21 are
the oracle-verified batch twins)."""

import pytest

from pyspark.sql import functions as F, types as T

from jena_fuseki_kafka_spark.queries.streaming_ops import (
    session_window_counts,
    windowed_event_counts,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture()
def events_path(spark, tmp_path):
    import datetime

    base = datetime.datetime(2026, 1, 1)
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                base + datetime.timedelta(minutes=i * 7),  # spans ~23h
                i % 5,
                ["view", "click"][i % 2],
                float(i),
            )
        )
    path = str(tmp_path / "events")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(2).write.parquet(path)
    return path


def run_stream_to_memory(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


class TestWindowedStreaming:
    def test_tumbling_window_matches_batch(self, spark, events_path):
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
        out = run_stream_to_memory(
            spark, windowed_event_counts(stream, "1 hour"), "win_counts"
        ).collect()
        batch = (
            spark.read.parquet(events_path)
            .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .collect()
        )
        got = {(r.hour, r.event_type): r.n_events for r in out}
        want = {(r.hour, r.event_type): r.n_events for r in batch}
        assert got == want

    def test_session_windows(self, spark, events_path):
        # events are 7 min apart per stream but 35 min apart per user
        # (5 users round-robin) => with a 30-min gap each user event is its
        # own session; with a 40-min gap each user has one session
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
        tight = run_stream_to_memory(
            spark, session_window_counts(stream, gap="30 minutes"), "sess_tight"
        )
        assert tight.count() == 200  # every event its own session
        stream2 = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_path)
        loose = run_stream_to_memory(
            spark, session_window_counts(stream2, gap="40 minutes"), "sess_loose"
        )
        rows = loose.collect()
        assert len(rows) == 5  # one session per user
        assert all(r.n_events == 40 for r in rows)


class TestStatefulStreaming:
    def test_first_seen_dedup_across_batches(self, spark, tmp_path):
        """Two separate parquet files => two (or more) micro-batch splits
        with maxFilesPerTrigger=1; duplicates of the same fingerprint in a
        later batch must be suppressed by the cross-batch state."""
        import datetime

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("fingerprint", T.StringType()),
                T.StructField("ts", T.TimestampType()),
            ]
        )
        base = datetime.datetime(2026, 1, 1)
        path = str(tmp_path / "docs")
        # batch 1: fp a (doc 0), fp b (doc 1); batch 2: fp a again (doc 2), fp c (doc 3)
        spark.createDataFrame(
            [(0, "a", base), (1, "b", base + datetime.timedelta(seconds=1))], schema
        ).coalesce(1).write.mode("append").parquet(path)
        spark.createDataFrame(
            [
                (2, "a", base + datetime.timedelta(seconds=2)),
                (3, "c", base + datetime.timedelta(seconds=3)),
            ],
            schema,
        ).coalesce(1).write.mode("append").parquet(path)

        from jena_fuseki_kafka_spark.queries.streaming_ops import streaming_first_seen

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(path)
        )
        q = (
            streaming_first_seen(stream)
            .writeStream.format("memory")
            .queryName("first_seen")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = {r.fingerprint: r.doc_id for r in spark.sql("SELECT * FROM first_seen").collect()}
        assert set(rows) == {"a", "b", "c"}
        assert rows["b"] == 1 and rows["c"] == 3
        # fp 'a': the first-seen doc must win (doc 0 if both files land in
        # one batch order; with maxFilesPerTrigger=1 file order decides —
        # either way doc 2 must NOT appear if doc 0's batch ran first)
        assert rows["a"] in (0, 2)
        assert len(rows) == 3


class TestLateDataDrop:
    """st06's watermark-drop gate must be NON-vacuous: the staged late
    rows exist and are genuinely excluded, so the stream answer DIFFERS
    from the naive batch aggregate by exactly those rows."""

    def test_st06_drops_exactly_the_staged_late_rows(self, spark, sf_dir):
        import duckdb

        from jena_fuseki_kafka_spark.queries import QUERIES

        rows = QUERIES["st06_streaming_late_data_drop"](spark, sf_dir).collect()
        assert rows, "gate produced no windows"

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
        )
        n_late = con.execute(
            """
            SELECT COUNT(*) FROM events
            WHERE date_trunc('hour', ts) = TIMESTAMP '2024-01-01 00:00:00'
              AND event_id % 2 = 1
            """
        ).fetchone()[0]
        assert n_late > 0, "no late rows staged — the drop facet proves nothing"

        batch_total = con.execute(
            "SELECT COUNT(*) FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'"
        ).fetchone()[0]
        stream_total = sum(r["n_events"] for r in rows)
        assert stream_total == batch_total - n_late, (
            stream_total,
            batch_total,
            n_late,
        )


class TestStageCache:
    def test_distinct_configs_get_distinct_staged_dirs(self, spark):
        # st07 (plain), st08 (sentinel) and st09 (duplicate) must never
        # share a staged dir: a sentinel file leaking into st07's stream
        # would advance its watermark early, and st09's doubled rows would
        # corrupt both joins.  Repeat calls with the SAME config must
        # reuse (the ADVICE r8 leak fix).
        import os

        from jena_fuseki_kafka_spark.queries import streaming_gate as sg

        sf = "/root/testdata/sf0.001"
        sg._cleanup_stage_cache()
        plain, _ = sg._stage_weekly(spark, sf)
        plain2, _ = sg._stage_weekly(spark, sf)
        sentinel, _ = sg._stage_weekly(spark, sf, with_sentinel=True)
        doubled, _ = sg._stage_weekly(spark, sf, duplicate=True)
        assert plain == plain2
        assert len({plain, sentinel, doubled}) == 3
        # sentinel config stages the extra 5th closing file
        assert len(os.listdir(plain)) == 4
        assert len(os.listdir(sentinel)) == 5
        tds = [td for td, _ in sg._STAGE_CACHE.values()]
        sg._cleanup_stage_cache()
        assert all(not os.path.exists(td) for td in tds)


class TestSt11ForeachBatchMerge:
    def test_gate_pins_exactly_once_and_matches_batch(self, spark, sf_dir):
        import duckdb

        from jena_fuseki_kafka_spark.queries import ORACLES, QUERIES

        rows = QUERIES["st11_foreachbatch_merge_exactly_once"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.rerun_added == 0, "checkpoint restart re-applied batches"
            assert r.replay_delta == 0, "ledger failed to skip a replayed batch id"
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
        )
        oracle = con.execute(ORACLES["st11_foreachbatch_merge_exactly_once"]).fetchall()
        assert sorted(tuple(r) for r in rows) == sorted(tuple(r) for r in oracle)

    def test_ledger_skips_same_id_and_merges_new_id(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from jena_fuseki_kafka_spark.queries.streaming_gate import (
            _st11_apply_batch,
            _st11_read_state,
        )

        root = str(tmp_path / "merge-root")
        batch = spark.createDataFrame(
            [(1, "click", 2.5, "2024-01-01 10:00:00"),
             (1, "click", 1.5, "2024-01-01 11:00:00"),
             (2, "purchase", 4.0, "2024-01-01 12:00:00")],
            ["user_id", "event_type", "value", "ts"],
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        _st11_apply_batch(spark, root, batch, 0)
        state, applied = _st11_read_state(spark, root)
        assert applied == [0]
        totals = {(r.user_id, r.event_type): r.n_events for r in state.collect()}
        assert totals == {(1, "click"): 2, (2, "purchase"): 1}

        # same batch id again: no-op (no new version, counts unchanged)
        _st11_apply_batch(spark, root, batch, 0)
        state, applied = _st11_read_state(spark, root)
        assert applied == [0]
        assert {(r.user_id, r.event_type): r.n_events for r in state.collect()} == totals

        # new batch id: MERGE updates matched keys and inserts new ones
        _st11_apply_batch(spark, root, batch.filter(F.col("user_id") == 1), 1)
        state, applied = _st11_read_state(spark, root)
        assert applied == [0, 1]
        got = {(r.user_id, r.event_type): (r.n_events, float(r.sum_value)) for r in state.collect()}
        assert got[(1, "click")] == (4, 8.0)
        assert got[(2, "purchase")] == (1, 4.0)
