#!/usr/bin/env python
"""Deletes-heavy soak: the patch-workload twin of soak.py.

soak.py is adds-only; the reference's soak suite also drives mixed
add/delete patch traffic through the projector (AbstractDockerTests.java:
38-142 applies RDF-Patch events, and the patch path folds A/D net
effects — README.md:148-153).  This soak generates 10k RDF-Patch events
where:

- every EVEN event adds its own quads PLUS a transient quad that the same
  event deletes again (within-event A->D folding must net to zero);
- every ODD event deletes the first half of the previous event's quads
  (cross-event deletes, usually within the same micro-batch — exercising
  in-batch A-then-D ordering — and across batch boundaries at batch
  starts, exercising deletes against committed state).

Deletes are ~1/3 of all ops (>= the 30%% bar).  The expected final count
is exact and asserted against the store.

Usage: python tools/soak_patch.py [n_events] [batch_size]
Prints one JSON line with counts, op mix, and throughput.
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
    # deterministic "random" 1..999, same generator as soak.py
    return 1 + (eid * 9973) % 999


def _quad(eid: int, i: int) -> str:
    return (
        f"<http://example.org/e{eid}/s{i}> <http://example.org/p> "
        f'"v{eid}-{i}" <http://example.org/g{eid % 10}> .'
    )


def event_payload(eid: int) -> bytes:
    lines = ["TX ."]
    if eid % 2 == 0:
        n = quads_for_event(eid)
        lines.extend(f"A {_quad(eid, i)}" for i in range(n))
        # transient quad: added and deleted in the same transaction —
        # net-effect folding must keep it out of the store entirely
        lines.append(f"A {_quad(eid, n)}")
        lines.append(f"D {_quad(eid, n)}")
    else:
        prev = eid - 1
        n_prev = quads_for_event(prev)
        lines.extend(f"D {_quad(prev, i)}" for i in range(n_prev // 2))
    lines.append("TC .")
    return ("\n".join(lines) + "\n").encode()


def expected_final(n_events: int) -> int:
    total = 0
    for eid in range(0, n_events, 2):
        n = quads_for_event(eid)
        deleter_exists = eid + 1 < n_events
        total += n - (n // 2 if deleter_exists else 0)
    return total


def op_mix(n_events: int) -> tuple[int, int]:
    adds = deletes = 0
    for eid in range(n_events):
        if eid % 2 == 0:
            adds += quads_for_event(eid) + 1
            deletes += 1
        else:
            deletes += quads_for_event(eid - 1) // 2
    return adds, deletes


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
                        [("Content-Type", b"application/rdf-patch")],
                        "soak-patch",
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

    spark = build_session(app_name="jfk-soak-patch", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/jfk_soak_patch_store"
    shutil.rmtree(path, ignore_errors=True)
    store = QuadStore(path)

    adds_ops, delete_ops = op_mix(n_events)
    expected = expected_final(n_events)

    events_dir = "/tmp/jfk_soak_patch_events"
    shutil.rmtree(events_dir, ignore_errors=True)
    gen_events(spark, 0, n_events).write.parquet(events_dir)
    all_events = spark.read.schema(EVENT_SCHEMA).parquet(events_dir)

    t0 = time.time()
    for start in range(0, n_events, batch_size):
        count = min(batch_size, n_events - start)
        events = all_events.filter(
            (F.col("offset") >= start) & (F.col("offset") < start + count)
        )
        res = apply_event_batch(spark, store, events, txn_id=f"soak-patch-{start}")
        assert res["n_dlq"] == 0, f"unexpected DLQ rows in batch at {start}"
        print(
            f"# batch {start}..{start + count}: +{res['n_adds']} -{res['n_deletes']}",
            file=sys.stderr,
        )
    dt = time.time() - t0
    shutil.rmtree(events_dir, ignore_errors=True)

    got = store.count(spark)
    assert got == expected, f"count mismatch: store={got} expected={expected}"
    total_ops = adds_ops + delete_ops
    assert delete_ops / total_ops >= 0.30, "workload not deletes-heavy enough"
    print(
        json.dumps(
            {
                "events": n_events,
                "final_quads": got,
                "add_ops": adds_ops,
                "delete_ops": delete_ops,
                "delete_op_pct": round(100 * delete_ops / total_ops, 1),
                "seconds": round(dt, 1),
                "ops_per_sec": int(total_ops / dt),
                "batch_size": batch_size,
            }
        )
    )
    shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
