#!/usr/bin/env python
"""Real-broker Kafka end-to-end verification (run where a broker exists).

The reference proves its contract against live Kafka with Testcontainers
(DockerTestConfigFK.java:117-310) and secured variants
(DockerTestSecureKafka.java:22, DockerTestMutualTlsKafka.java:22).  This
sandbox has no broker, so the test suite substitutes file-source twins +
config-time security validation; THIS script is the missing wire-level
half, to be run on any host with a reachable broker:

    KAFKA_BOOTSTRAP=localhost:9092 python tools/broker_e2e.py

It drives the same scenario as the reference's DockerTestConfigFK:

1. produce N dataset events (Turtle/N-Quads, Content-Type headers), one
   malformed event, and one RDF-Patch event onto a fresh topic;
2. start the engine's Kafka connector (``ingest.streaming.kafka_stream``
   -> ``IngestStream``) with read_policy=replay;
3. run to idle, then assert: exact quad count, DLQ count 1 with all four
   ``Dead-Letter-*`` headers, and the acceptance SPARQL count matches;
4. stop, restart from checkpoint, produce one more event, assert exactly-
   once resume (the reference's restart test, DockerTestConfigFK.java:360).

Optional secured runs: set KAFKA_PROPERTIES to a JSON object of client
properties (e.g. SASL_SSL + sasl.jaas.config) — the same validated/
redacted bundle the config layer enforces (config/security.py).

Requirements on the RUNNING host (not this sandbox):
- a reachable broker (vanilla, SASL, or mTLS);
- the Spark Kafka connector on the session classpath
  (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``);
- ``confluent-kafka`` or ``kafka-python`` for the producer side.

Exit code 0 = full contract verified against the live broker.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")
if not BOOTSTRAP:
    print(
        "KAFKA_BOOTSTRAP not set — this script verifies the wire-level Kafka\n"
        "contract and needs a reachable broker.  In broker-less environments\n"
        "the equivalent logic-level coverage is tests/test_streaming.py\n"
        "(file-source twins) and tests/test_config.py (security bundles).",
        file=sys.stderr,
    )
    sys.exit(2)


def make_producer():
    try:
        from confluent_kafka import Producer

        p = Producer({"bootstrap.servers": BOOTSTRAP})

        def send(topic, value: bytes, headers: list[tuple[str, bytes]]):
            p.produce(topic, value=value, headers=headers)

        return send, p.flush
    except ImportError:
        from kafka import KafkaProducer  # kafka-python

        p = KafkaProducer(bootstrap_servers=BOOTSTRAP)

        def send(topic, value: bytes, headers: list[tuple[str, bytes]]):
            p.send(topic, value=value, headers=headers)

        return send, p.flush


def main() -> int:
    import tempfile

    from jena_fuseki_kafka_spark.config import ConnectorConfig
    from jena_fuseki_kafka_spark.ingest.streaming import IngestStream, kafka_stream
    from jena_fuseki_kafka_spark.session import build_session
    from jena_fuseki_kafka_spark.sparql import SparqlEngine
    from jena_fuseki_kafka_spark.store import QuadStore

    topic = f"jfk-e2e-{uuid.uuid4().hex[:8]}"
    kafka_props = json.loads(os.environ.get("KAFKA_PROPERTIES", "{}"))
    send, flush = make_producer()

    n_docs, quads_per_doc = 50, 4
    for i in range(n_docs):
        body = "\n".join(
            f'<http://e/s{i}> <http://e/p{j}> "v{i}-{j}" .'
            for j in range(quads_per_doc)
        ).encode()
        send(topic, body, [("Content-Type", b"application/n-quads")])
    send(topic, b"NOT RDF @@@", [("Content-Type", b"text/turtle")])  # -> DLQ
    send(
        topic,
        b'TX .\nD <http://e/s0> <http://e/p0> "v0-0" .\nTC .',
        [("Content-Type", b"application/rdf-patch")],
    )
    flush()
    expected = n_docs * quads_per_doc - 1  # one quad patch-deleted

    tmp = tempfile.mkdtemp(prefix="jfk-broker-e2e-")
    conn = ConnectorConfig.from_dict(
        dict(
            name="broker-e2e",
            topics=[topic],
            dataset=f"{tmp}/ds",
            state_dir=f"{tmp}/checkpoint",
            read_policy="replay",
            bootstrap_servers=BOOTSTRAP,
            kafka_properties=kafka_props,  # validated + redacted by config
        )
    )
    spark = build_session(app_name="jfk-broker-e2e")
    store = QuadStore(conn.dataset)
    dlq = f"{tmp}/dlq"
    stream = IngestStream(
        spark, conn, store=store, source=kafka_stream(spark, conn), dlq_path=dlq
    )
    stream.run_available()

    got = store.count(spark)
    assert got == expected, f"quad count {got} != {expected}"
    dlq_rows = spark.read.parquet(dlq).collect()
    assert len(dlq_rows) == 1, f"DLQ rows {len(dlq_rows)} != 1"
    hk = sorted(
        h["key"] for h in dlq_rows[0]["headers"] if h["key"].startswith("Dead-Letter")
    )
    assert len(hk) == 4, f"Dead-Letter headers {hk}"
    count_df = SparqlEngine(store.read(spark)).query(
        "SELECT (COUNT(*) AS ?n) WHERE { { ?s ?p ?o } UNION { GRAPH ?g { ?s ?p ?o } } }"
    )
    n = int(count_df.collect()[0][0]["value"])
    assert n == expected, f"SPARQL count {n} != {expected}"

    # restart-resume: one more event, run again from checkpoint
    send(topic, b'<http://e/extra> <http://e/p> "late" .', [("Content-Type", b"application/n-quads")])
    flush()
    time.sleep(1)
    stream2 = IngestStream(
        spark, conn, store=store, source=kafka_stream(spark, conn), dlq_path=dlq
    )
    stream2.run_available()
    got2 = store.count(spark)
    assert got2 == expected + 1, f"post-restart count {got2} != {expected + 1}"

    print(
        json.dumps(
            {
                "broker": BOOTSTRAP,
                "topic": topic,
                "quads": got2,
                "dlq": 1,
                "secured": bool(kafka_props),
                "result": "PASS",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
