"""PySpark-native analytics engine with the capabilities of
telicent-oss/jena-fuseki-kafka (reference read-only at /root/reference).

The reference is a Kafka -> RDF-dataset streaming ingestion module for a
SPARQL server (see SURVEY.md).  This package re-expresses the same
capability contract Spark-first:

- ``model``    : the quad data model (graph, subject, predicate, object)
- ``rdf``      : RDF syntax parsers (NQuads/NTriples, Turtle subset, RDF Patch)
- ``store``    : parquet-backed, snapshot-versioned quad store (Delta-style
                 manifest commits; MVCC reads)
- ``ingest``   : micro-batch projector (Kafka-event batches -> transactional
                 quad-store commits, DLQ side-output, good-prefix guarantee)
- ``sparql``   : SPARQL 1.1 subset facade -> DataFrame plans (Catalyst
                 optimizes; no interpreter loop)
- ``queries``  : relational + training-data-pipeline query surface used by
                 the correctness/bench harness
- ``config``   : connector configuration, env interpolation, registry
                 invariants
- ``lifecycle``: engine start/stop/pause built on Structured Streaming
"""

__version__ = "0.1.0"
