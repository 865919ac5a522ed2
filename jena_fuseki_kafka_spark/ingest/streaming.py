"""Structured Streaming ingestion: the ProjectorDriver/poll-loop replacement.

The reference runs a hand-built poll loop per connector with adaptive
batching, offset files, and pause flags (SURVEY.md §2A A1-A16).  Structured
Streaming gives every one of those structurally:

- poll loop            -> micro-batch trigger
- batch-size knobs     -> maxOffsetsPerTrigger / minOffsetsPerTrigger +
                          maxTriggerDelay (high-lag catch-up, A8)
- offset state file    -> checkpoint dir (commit-then-record ordering, A12)
- stall handler        -> empty micro-batches end transactions naturally (A9)
- pause/resume         -> query.stop() between batches + restart from
                          checkpoint (A14)
- abort-and-replay     -> idempotent per-batch txn_id: a crashed batch
                          re-applies as a no-op (A11 + §7.4 at-least-once)

Sources: Kafka (``format("kafka")``, requires the spark-sql-kafka package
on the cluster) or a file directory of EVENT_SCHEMA parquet (used by tests
and by file-drop ingestion).  Sinks for DLQ rows: Kafka topic or parquet
dead-letter table.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import ConnectorConfig
from ..store import QuadStore
from .payloads import EVENT_SCHEMA
from .projector import apply_event_batch


def kafka_stream(
    spark: SparkSession, conn: ConnectorConfig, starting_offsets: str | None = None
) -> DataFrame:
    """Build the Kafka source stream for a connector (A1/A2).

    Consumer tuning mirrors SysJenaKafka.java:114-144: auto-commit off
    (Spark manages offsets via checkpoint), 50 MiB fetch, bounded records
    per trigger.

    ``starting_offsets`` overrides the read policy with an explicit
    per-partition offsets JSON — used when migrating a reference
    deployment's state file (see ``state_migration.migrate_state_file``);
    it only applies on first start, after which the checkpoint owns
    progress.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", conn.bootstrap_servers)
        .option("subscribe", ",".join(conn.topics))
        .option("startingOffsets", starting_offsets or conn.starting_offsets())
        .option("failOnDataLoss", "false")
        .option("includeHeaders", "true")
        .option("maxOffsetsPerTrigger", str(conn.batch_size))
        .option("kafka.fetch.max.bytes", str(conn.batch_bytes))
        .option("kafka.group.id", conn.group_id)
    )
    for k, v in conn.kafka_properties.items():
        reader = reader.option(f"kafka.{k}", v)
    return reader.load().select(
        "key", "value", "headers", "topic", "partition", "offset", "timestamp"
    )


def file_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-based event source in EVENT_SCHEMA (tests; file-drop ingest)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)


class IngestStream:
    """One connector's streaming query: source -> foreachBatch projector."""

    def __init__(
        self,
        spark: SparkSession,
        conn: ConnectorConfig,
        store: QuadStore | None = None,
        source: DataFrame | None = None,
        dlq_path: str | None = None,
        compact_every_batches: int | None = 50,
    ):
        self.spark = spark
        self.conn = conn
        self.store = store or QuadStore(conn.dataset)
        self.dlq_path = dlq_path
        # periodic small-file compaction cadence (None disables).  Runs
        # inside foreachBatch — i.e. between micro-batches from the
        # store's point of view, the single-writer safe point.
        self.compact_every_batches = compact_every_batches
        self._source = source
        self.query = None
        self._paused = False
        # commit-then-park machinery (A14, FusekiProjector.java:619-671):
        # _process_batch holds _batch_lock for its whole body; stop() sets
        # _stop_requested then acquires the lock, so it returns only after
        # the in-flight batch has committed AND been accounted in metrics.
        # A batch that starts after stop() was requested bails out under the
        # lock before doing any work, so no commit can be interrupted.
        self._batch_lock = threading.Lock()
        self._stop_requested = False
        self.metrics = {"batches": 0, "adds": 0, "deletes": 0, "dlq": 0}

    def _resolve_source(self) -> DataFrame:
        if self._source is not None:
            return self._source
        if self.conn.bootstrap_servers:
            return kafka_stream(self.spark, self.conn)
        raise ValueError(
            f"connector {self.conn.name!r}: no bootstrap_servers and no explicit source"
        )

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        with self._batch_lock:
            if self._paused or self._stop_requested:
                # safe-point: bail BEFORE any store work; the checkpoint
                # does not advance past unprocessed data because
                # foreachBatch must succeed first, so the batch replays
                # intact on the next start
                raise RuntimeError("paused" if self._paused else "stopping")
            res = apply_event_batch(
                self.spark,
                self.store,
                batch_df,
                # idempotent replay key: same query + same batch -> same txn
                txn_id=f"{self.conn.name}-{batch_id}",
            )
            # account immediately post-commit (apply_event_batch runs every
            # other Spark action pre-commit); a replayed batch reports a
            # zero applied-delta so metrics never double-count
            self.metrics["batches"] += 1
            self.metrics["adds"] += res["n_adds"]
            self.metrics["deletes"] += res["n_deletes"]
            self.metrics["dlq"] += res["n_dlq"]
            if res["n_dlq"]:
                self._write_dlq(res["dlq"])
            res["dlq"].unpersist()
            if (
                self.compact_every_batches
                and self.metrics["batches"] % self.compact_every_batches == 0
            ):
                self.store.compact(self.spark)

    def _write_dlq(self, dlq: DataFrame) -> None:
        if self.conn.dlq_topic and self.conn.bootstrap_servers:
            (
                dlq.select(
                    F.col("key").cast("binary"),
                    F.col("value").cast("binary"),
                    F.col("headers"),
                )
                .write.format("kafka")
                .option("kafka.bootstrap.servers", self.conn.bootstrap_servers)
                .option("topic", self.conn.dlq_topic)
                .option("includeHeaders", "true")
                .save()
            )
        elif self.dlq_path:
            dlq.write.mode("append").parquet(self.dlq_path)
        # no DLQ configured: the reference aborts the pipeline
        # (FusekiProjector.java:258-277); we surface via metrics + raise
        elif self.conn.dlq_topic is None and self.dlq_path is None:
            raise RuntimeError(
                f"connector {self.conn.name!r}: malformed events and no DLQ configured"
            )

    def start(self, trigger_available_now: bool = False, processing_time: str = "10 seconds"):
        source = self._resolve_source()
        checkpoint = self.conn.state_dir or os.path.join(self.store.path, "_checkpoint")
        writer = (
            source.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint)
            .queryName(f"jfk-{self.conn.name}")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        else:
            # default cadence mirrors the reference's poll loop (FKConst);
            # tests shrink it to exercise stall/resume quickly
            writer = writer.trigger(processingTime=processing_time)
        self.query = writer.start()
        return self.query

    # -- lifecycle (A13/A14) ---------------------------------------------
    def stop(self) -> None:
        """Drain-then-stop: waits for the in-flight micro-batch to commit
        AND be accounted (commit-then-park, FusekiProjector.java:619-671)
        before tearing the query down.  A batch that starts while we wait
        bails out under the lock pre-commit and replays on the next start."""
        if self.query is None:
            return
        self._stop_requested = True
        try:
            # barrier: returns only once no batch is mid-flight
            with self._batch_lock:
                pass
            self.query.stop()
        finally:
            self.query = None
            self._stop_requested = False

    def pause(self) -> None:
        """Safe-point pause: stop between micro-batches (the Spark analog of
        the reference's commit-then-park, FusekiProjector.java:619-671)."""
        self.stop()
        self._paused = True

    def resume(self, trigger_available_now: bool = False):
        self._paused = False
        return self.start(trigger_available_now=trigger_available_now)

    def run_available(self) -> None:
        """Process everything currently available, then stop (test/batch
        mode; used for exact-count soak verification)."""
        q = self.start(trigger_available_now=True)
        q.awaitTermination()
        self.query = None
