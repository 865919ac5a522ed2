"""SPARQL Update end-to-end correctness gate.

The reference exposes ``fuseki:update`` on every connector service
(config-connector.ttl:14-17); until r6 the Update engine was pytest-only.
u01 pins the full mutation pipeline under the driver's DuckDB-hash gate:
seed a temp store from the ``customer`` table, run an INSERT DATA /
DELETE-INSERT WHERE / INSERT WHERE / LOAD sequence through the real
``UpdateEngine`` (parser -> algebra -> store commits), and report the net
per-graph effect as counts the oracle derives independently from the
relational source.

Scale shape: every update compiles to the same bucket-pruned commit path
the ingest stream uses (QuadStore.commit: broadcast anti-join dedup,
rewrite only affected buckets) — request-sized mutations stay O(request),
not O(store).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..model import DEFAULT_GRAPH
from . import query
from .rdf_surface import EX, _customer_quads


@query(
    "u01_update_sequence",
    oracle="""
    SELECT (SELECT COUNT(*) FROM customer WHERE c_mktsegment <> 'BUILDING') AS seg_default,
           (SELECT COUNT(*) FROM customer WHERE c_mktsegment = 'BUILDING') AS seg_moved,
           (SELECT COUNT(*) FROM customer WHERE c_mktsegment = 'MACHINERY') AS isbig,
           CAST(1 AS BIGINT) AS meta,
           CAST(3 AS BIGINT) AS loaded
    """,
)
def u01(spark, sf_dir):
    """INSERT DATA -> DELETE/INSERT WHERE (graph move) -> INSERT WHERE ->
    LOAD, executed through the UpdateEngine against a store seeded from
    ``customer``; returns the net per-graph counts."""
    from ..sparql.update import UpdateEngine
    from ..store import QuadStore

    td = tempfile.mkdtemp(prefix="u01-")  # outlives the returned (lazy) DF
    store = QuadStore(os.path.join(td, "store"), n_buckets=2)
    store.commit(spark, adds=_customer_quads(spark, sf_dir))
    nt_path = os.path.join(td, "seed.nt")
    with open(nt_path, "w") as f:
        for i in range(3):
            f.write(f'<{EX}l{i}> <{EX}p> "x{i}" .\n')

    upd = UpdateEngine(spark, store)
    upd.update(
        "PREFIX ex: <http://example.org/> "
        'INSERT DATA { GRAPH ex:meta { ex:ds ex:label "seeded" } }'
    )
    # move every BUILDING segment quad into the ex:seg named graph
    upd.update(
        "PREFIX ex: <http://example.org/> "
        "DELETE { ?c ex:segment ?s } "
        "INSERT { GRAPH ex:seg { ?c ex:segment ?s } } "
        'WHERE { ?c ex:segment ?s FILTER(?s = "BUILDING") }'
    )
    upd.update(
        "PREFIX ex: <http://example.org/> "
        'INSERT { ?c ex:isbig "yes" } '
        'WHERE { ?c ex:segment ?s FILTER(?s = "MACHINERY") }'
    )
    upd.update(
        "PREFIX ex: <http://example.org/> "
        f"LOAD <file://{nt_path}> INTO GRAPH ex:loaded"
    )

    quads = store.read(spark)
    return quads.agg(
        F.sum(
            (
                (F.col("graph") == DEFAULT_GRAPH)
                & (F.col("predicate") == EX + "segment")
            ).cast("long")
        ).alias("seg_default"),
        F.sum((F.col("graph") == EX + "seg").cast("long")).alias("seg_moved"),
        F.sum((F.col("predicate") == EX + "isbig").cast("long")).alias("isbig"),
        F.sum((F.col("graph") == EX + "meta").cast("long")).alias("meta"),
        F.sum((F.col("graph") == EX + "loaded").cast("long")).alias("loaded"),
    )
