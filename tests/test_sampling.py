"""p07 packing-efficiency census invariants and consistency with p05.

The census is a derived readout over the SAME deterministic packing p05
performs, so the shared quantities must agree row-for-row, and every
derived metric must satisfy its arithmetic identity — a drift here means
the two operators no longer describe the same packing.
"""

from jena_fuseki_kafka_spark.queries import ORACLES, QUERIES
from jena_fuseki_kafka_spark.queries.sampling import P05_SEQ_LEN


def test_p07_identities_and_p05_consistency(spark, sf_dir):
    census = {r.shard: r for r in QUERIES["p07_packing_efficiency_census"](spark, sf_dir).collect()}
    packing = {r.shard: r for r in QUERIES["p05_sequence_packing"](spark, sf_dir).collect()}
    assert set(census) == set(packing)
    for shard, c in census.items():
        p = packing[shard]
        # shared quantities agree with p05
        assert c.n_docs == p.n_docs
        assert c.n_tokens == p.n_tokens
        assert c.n_sequences == p.n_sequences
        assert c.n_straddling_docs == p.n_straddling_docs
        # arithmetic identities
        assert c.capacity_tokens == c.n_sequences * P05_SEQ_LEN
        assert c.pad_tokens == c.capacity_tokens - c.n_tokens
        assert 0 <= c.pad_tokens < P05_SEQ_LEN  # only the last sequence pads
        assert c.util_bp == (c.n_tokens * 10000) // c.capacity_tokens
        assert 0 < c.util_bp <= 10000
        assert c.n_fragments == c.n_docs + c.n_boundary_crossings
        assert c.n_straddling_docs <= c.n_docs
        assert c.n_boundary_crossings >= c.n_straddling_docs


def test_p07_oracle_registered():
    assert "p07_packing_efficiency_census" in QUERIES
    assert "p07_packing_efficiency_census" in ORACLES
