"""The reliableCheckpoint switch (VERDICT r14 item 8): every lineage
truncation in the repo routes through checkpointing.stable_checkpoint,
whose default branch is the exact localCheckpoint(eager=...) call it
replaced.  These tests pin (a) both branches produce identical results
on the heaviest truncation users — the HashMin fixpoint (d06, eager)
and the LSH signature reuse (d02, lazy) — and (b) the reliable branch
really does write to the fault-tolerant checkpoint dir."""

from __future__ import annotations

import os

import pytest

from jena_fuseki_kafka_spark.checkpointing import RELIABLE_CONF
from jena_fuseki_kafka_spark.queries import QUERIES


@pytest.fixture
def reliable(spark, tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        yield ckpt_dir
    finally:
        spark.conf.unset(RELIABLE_CONF)


def _rows(spark, name, sf_dir):
    return sorted(tuple(r) for r in QUERIES[name](spark, sf_dir).collect())


@pytest.mark.parametrize(
    "gate", ["d06_dedup_clusters", "d02_minhash_lsh"]
)
def test_reliable_branch_matches_default(spark, sf_dir, reliable, gate):
    want = None
    # default first: unset the flag for the baseline read, then flip on
    spark.conf.unset(RELIABLE_CONF)
    want = _rows(spark, gate, sf_dir)
    spark.conf.set(RELIABLE_CONF, "true")
    got = _rows(spark, gate, sf_dir)
    assert got == want


def test_reliable_branch_uses_checkpoint_dir(spark, sf_dir, reliable):
    _rows(spark, "d06_dedup_clusters", sf_dir)
    # reliable checkpoint() materializes RDD blocks under the dir
    found = []
    for root, _dirs, files in os.walk(reliable):
        found.extend(files)
    assert found, "reliable mode ran but wrote nothing to the checkpoint dir"
