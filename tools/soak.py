#!/usr/bin/env python
"""Volume/soak test: the reference's CI-verified scale, locally.

The reference's Docker soak produces 10,000 Kafka events of 1-999 random
quads each (~5M quads) at batch sizes {500, 5000} and asserts the exact
total quad count in the store (AbstractDockerTests.java:38-142, in-memory +
TDB2).  Same shape here: events are GENERATED DISTRIBUTED (mapInPandas over
a range — no driver-side payload building), applied through the real
projector path (parse UDF -> net-effect -> QuadStore txn) in micro-batches,
and the final store count must equal the generated total exactly.

Usage: python tools/soak.py [n_events] [batch_size]
Prints one JSON line: {"events": N, "quads": N, "seconds": s, "quads_per_sec": r}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from jena_fuseki_kafka_spark.ingest import EVENT_SCHEMA, apply_event_batch
from jena_fuseki_kafka_spark.session import build_session
from jena_fuseki_kafka_spark.store import QuadStore


def quads_for_event(eid: int) -> int:
    # deterministic "random" 1..999 (the reference uses Random 1..999)
    return 1 + (eid * 9973) % 999


def event_payload(eid: int) -> bytes:
    n = quads_for_event(eid)
    lines = []
    for i in range(n):
        lines.append(
            f"<http://example.org/e{eid}/s{i}> <http://example.org/p> "
            f'"v{eid}-{i}" <http://example.org/g{eid % 10}> .'
        )
    return ("\n".join(lines) + "\n").encode()


def gen_events(spark, start: int, count: int):
    """EVENT_SCHEMA rows generated executor-side via mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for eid in pdf["id"]:
                eid = int(eid)
                rows.append(
                    (
                        None,
                        event_payload(eid),
                        [("Content-Type", b"application/n-quads")],
                        "soak",
                        0,
                        eid,
                        None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["key", "value", "headers", "topic", "partition", "offset", "timestamp"],
            )

    return spark.range(start, start + count).mapInPandas(gen, schema=EVENT_SCHEMA)


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000

    spark = build_session(app_name="jfk-soak", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/jfk_soak_store"
    shutil.rmtree(path, ignore_errors=True)
    store = QuadStore(path)

    expected = sum(quads_for_event(e) for e in range(n_events))

    # materialize the synthetic events first (untimed): the metric is the
    # ENGINE's ingest throughput — parse -> net-effect -> store txn — not
    # the test harness's payload generation
    events_dir = "/tmp/jfk_soak_events"
    shutil.rmtree(events_dir, ignore_errors=True)
    gen_events(spark, 0, n_events).write.parquet(events_dir)
    all_events = spark.read.schema(EVENT_SCHEMA).parquet(events_dir)

    t0 = time.time()
    applied = 0
    for start in range(0, n_events, batch_size):
        count = min(batch_size, n_events - start)
        events = all_events.filter(
            (F.col("offset") >= start) & (F.col("offset") < start + count)
        )
        res = apply_event_batch(spark, store, events, txn_id=f"soak-{start}")
        applied += res["n_adds"]
        assert res["n_dlq"] == 0, f"unexpected DLQ rows in batch at {start}"
        print(f"# batch {start}..{start + count}: +{res['n_adds']} quads", file=sys.stderr)
    dt = time.time() - t0
    shutil.rmtree(events_dir, ignore_errors=True)

    got = store.count(spark)
    assert got == expected == applied, f"count mismatch: store={got} expected={expected}"
    print(
        json.dumps(
            {
                "events": n_events,
                "quads": got,
                "seconds": round(dt, 1),
                "quads_per_sec": int(got / dt),
                "batch_size": batch_size,
            }
        )
    )
    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
