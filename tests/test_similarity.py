"""Near-dup gate must be NON-vacuous (VERDICT r3 item 1).

The registered s03 threshold (0.95) yields 0 rows on the near-orthogonal
testdata embeddings, so its driver row proves nothing about the pair
pipeline.  s03b runs the identical pipeline at threshold 0.30 and must
produce a non-empty result that matches the DuckDB oracle exactly —
standing evidence that the quantizer blocking, multi-probe, pair dedup,
and exact-cosine stages all work.
"""

import duckdb
import pytest

from jena_fuseki_kafka_spark.queries import ORACLES, QUERIES, _CHECK_PRIORITY


def _oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    return con.execute(sql).fetchall()


def test_s03b_non_empty_and_matches_oracle(spark, sf_dir):
    rows = QUERIES["s03b_embedding_near_dup_lowt"](spark, sf_dir).collect()
    assert len(rows) > 0, "lowered-threshold near-dup gate must be non-vacuous"
    oracle = _oracle_rows(ORACLES["s03b_embedding_near_dup_lowt"], sf_dir)
    assert sorted(tuple(r) for r in rows) == sorted(tuple(r) for r in oracle)


def test_s03b_stays_oracle_gated():
    # the driver checks the first 50 registered queries and the window
    # ROTATES round to round (new/changed queries first, freshest-verdict
    # queries to the tail), so s03b's position varies; the durable
    # contract is that it stays registered with its DuckDB oracle and is
    # listed in the rotation (never silently dropped)
    assert "s03b_embedding_near_dup_lowt" in QUERIES
    assert "s03b_embedding_near_dup_lowt" in ORACLES
    assert "s03b_embedding_near_dup_lowt" in _CHECK_PRIORITY


def test_s03_production_threshold_still_registered():
    # the 0.95 production threshold stays registered (it is the real
    # operator contract); s03b supplements rather than replaces it
    assert "s03_embedding_near_dup" in QUERIES
    assert "s03_embedding_near_dup" in ORACLES
