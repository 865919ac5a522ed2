"""Lineage-truncation checkpoint helper with a reliability switch.

Iterative fixpoints (property paths, HashMin connected components,
SPARQL update chains) and reused sub-relations (LSH signatures, census
legs) truncate lineage so plans do not grow per iteration and shared
work is not recomputed.  ``localCheckpoint`` is the default: it writes
to executor-local block storage — no distributed filesystem round-trip,
which is the right trade on a static cluster and the only option in a
checkpoint-dir-less test session.  Its documented weakness (PLANS.md,
VERDICT r13/r14 "keep on the radar"): blocks are NON-replicated, so an
executor lost mid-query fails the query instead of recomputing — under
dynamic allocation or spot/preemptible executors that is a real
availability gap at 100 TB.

``spark.graft.reliableCheckpoint=true`` flips every call site in the
repo to reliable ``checkpoint()`` — blocks go to the fault-tolerant
checkpoint directory (HDFS/S3; set ``SparkContext.setCheckpointDir``
first, Spark raises a clear error otherwise) and survive executor loss.
The switch is a session conf, not a per-call flag, because mixing the
two modes inside one query buys nothing: the failure domain is the
session's executor fleet.

Neutrality when off is structural: the default branch calls
``localCheckpoint(eager=...)`` with identical arguments to the code it
replaced (tests/test_checkpointing.py pins both paths to identical
results on the iterative-fixpoint and lazy-reuse gates).
"""

from __future__ import annotations

RELIABLE_CONF = "spark.graft.reliableCheckpoint"


def stable_checkpoint(df, eager: bool = True):
    """Truncate ``df``'s lineage: ``localCheckpoint`` by default,
    reliable ``checkpoint`` when ``spark.graft.reliableCheckpoint`` is
    true in the session conf (see module docstring for the trade)."""
    reliable = (
        df.sparkSession.conf.get(RELIABLE_CONF, "false") or "false"
    ).lower() == "true"
    if reliable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
