"""Driver-side small-commit fast path (r16): correctness pins.

The path writes bucket leaves without a Spark job, so two things must
hold or the store silently corrupts at the BUCKET level:

1. the pure-Python xxh64 twin must be BIT-identical to Spark's
   ``xxhash64`` expression (bucket pruning recomputes buckets at
   delete/dedup time — a near-miss hash loses rows), and
2. a commit sequence applied through the driver path must produce the
   same snapshot as the same sequence through the distributed writer,
   including set-semantics dedup, delete rewrites, NULL columns, and
   cross-writer interop (Spark-written rows deleted by the driver path
   and vice versa).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jena_fuseki_kafka_spark.model import QUAD_SCHEMA
from jena_fuseki_kafka_spark.store import QuadStore
from jena_fuseki_kafka_spark.store.xxh64 import spark_bucket, xxh64

ADVERSARIAL = [
    "",
    "a",
    "http://example.org/subject/1",
    "_:b1",
    "x" * 7, "y" * 8, "z" * 31, "w" * 32, "v" * 33, "u" * 100,
    "üñíçødé-é",
    "中文主语",
    "emoji-\U0001F600-tail",
    "tab\tand\nnewline",
    "nul-adjacent-\x01\x7f",
]


def test_xxh64_matches_spark_expression(spark):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "s string").select(
        "s",
        F.xxhash64(F.col("s")).alias("h"),
        F.pmod(F.xxhash64(F.col("s")), F.lit(16)).alias("b16"),
        F.pmod(F.xxhash64(F.col("s")), F.lit(2)).alias("b2"),
    )
    for r in df.collect():
        h = xxh64(r["s"].encode("utf-8"))
        signed = h - (1 << 64) if h >= 1 << 63 else h
        assert signed == r["h"], f"xxh64 mismatch on {r['s']!r}"
        assert spark_bucket(r["s"], 16) == r["b16"]
        assert spark_bucket(r["s"], 2) == r["b2"]


def _quads(prefix: str, n: int, graph: str = "", dt=None, lang=None):
    return [
        (graph, f"http://e/{prefix}{i}", "http://e/p", "literal", f"v{i}", dt, lang)
        for i in range(n)
    ]


def _snapshot(spark, store):
    return sorted(tuple(r) for r in store.read(spark).collect())


@pytest.mark.parametrize("force_spark", [False, True])
def test_commit_sequence_snapshot_parity(spark, tmp_path, force_spark):
    """The same commit sequence through the driver path (default) and
    through the distributed writer (DRIVER_COMMIT_ROWS forced to -1)
    must produce identical snapshots at every step."""
    store = QuadStore(str(tmp_path / f"s{force_spark}"), n_buckets=4)
    if force_spark:
        store.DRIVER_COMMIT_ROWS = -1  # instance override: never driver-commit

    def df(rows):
        return spark.createDataFrame(rows, QUAD_SCHEMA)

    base = _quads("a", 50) + _quads("n", 3, dt="http://www.w3.org/2001/XMLSchema#string")
    v1 = store.commit(spark, adds=df(base), txn_id="t1", assume_unique=True,
                      n_adds_hint=len(base))
    assert v1 == 1
    # set-semantics: re-adding overlapping rows inserts only the new ones
    overlap = base[:10] + _quads("b", 5)
    store.commit(spark, adds=df(overlap), txn_id="t2", assume_unique=True,
                 n_adds_hint=len(overlap))
    # delete a slice (some rows present, some not)
    dels = base[5:15] + _quads("ghost", 3)
    store.commit(spark, deletes=df(dels), txn_id="t3", n_deletes_hint=len(dels))
    # mixed add+delete in one commit
    store.commit(
        spark,
        adds=df(_quads("c", 4)),
        deletes=df(base[20:25]),
        txn_id="t4",
        assume_unique=True,
        n_adds_hint=4,
        n_deletes_hint=5,
    )
    # idempotent replay of an applied txn is a no-op
    v = store.version
    assert store.commit(spark, adds=df(_quads("dup", 9)), txn_id="t4",
                        n_adds_hint=9) == v

    snap = _snapshot(spark, store)
    expect = sorted(
        set(map(tuple, base)) - set(map(tuple, base[5:15])) - set(map(tuple, base[20:25]))
        | set(map(tuple, _quads("b", 5)))
        | set(map(tuple, _quads("c", 4)))
    )
    assert snap == expect


def test_cross_writer_interop(spark, tmp_path):
    """Rows written by the distributed writer must be deletable through
    the driver path and vice versa — i.e. both writers agree on bucket
    placement (the thing xxh64 parity buys end-to-end)."""
    store = QuadStore(str(tmp_path / "x"), n_buckets=4)

    def df(rows):
        return spark.createDataFrame(rows, QUAD_SCHEMA)

    spark_rows = _quads("sw", 30)
    store.DRIVER_COMMIT_ROWS = -1
    store.commit(spark, adds=df(spark_rows), txn_id="w1", assume_unique=True,
                 n_adds_hint=len(spark_rows))
    store.DRIVER_COMMIT_ROWS = QuadStore.DRIVER_COMMIT_ROWS
    driver_rows = _quads("dw", 30)
    store.commit(spark, adds=df(driver_rows), txn_id="w2", assume_unique=True,
                 n_adds_hint=len(driver_rows))

    # driver path deletes Spark-written rows
    store.commit(spark, deletes=df(spark_rows[:10]), txn_id="w3",
                 n_deletes_hint=10)
    # Spark path deletes driver-written rows
    store.DRIVER_COMMIT_ROWS = -1
    store.commit(spark, deletes=df(driver_rows[:10]), txn_id="w4",
                 n_deletes_hint=10)

    snap = _snapshot(spark, store)
    expect = sorted(set(map(tuple, spark_rows[10:])) | set(map(tuple, driver_rows[10:])))
    assert snap == expect


def test_driver_path_actually_engages(spark, tmp_path, monkeypatch):
    """A hinted request-sized commit must take the driver path (no write
    job): pin it so a future regression doesn't silently re-route every
    HTTP mutation through three Spark jobs."""
    store = QuadStore(str(tmp_path / "e"), n_buckets=2)
    calls = []
    orig = QuadStore._driver_commit

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        calls.append(out)
        return out

    monkeypatch.setattr(QuadStore, "_driver_commit", spy)
    rows = _quads("p", 20)
    store.commit(spark, adds=spark.createDataFrame(rows, QUAD_SCHEMA),
                 txn_id="e1", assume_unique=True, n_adds_hint=len(rows))
    assert calls and calls[-1] == 1, "driver commit did not engage (or fell back)"
