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


def test_p08_budget_met_exactly_and_extras_are_hash_prefix(spark, sf_dir):
    """The property that separates p08 from p03: the emitted count MEETS
    the integer target EXACTLY (rank-prefix fractional epoch), not just
    in expectation — and the extra-epoch docs are precisely the first
    n_extra docs of the per-source md5 order, pinned via checksum."""
    import hashlib

    from jena_fuseki_kafka_spark.queries import QUERIES, load

    rows = QUERIES["p08_epoch_mixture_plan"](spark, sf_dir).collect()
    assert rows
    docs = load(spark, sf_dir, "documents").select("doc_id", "source").collect()
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d.doc_id)
    assert {r.source for r in rows} == set(by_src)
    saw_upsample = saw_fraction = False
    for r in rows:
        assert r.n_emitted == r.target_n, r  # exact, not expected-value
        assert r.n_emitted == r.n_docs * r.epochs_int + r.n_extra, r
        saw_upsample |= r.epochs_int >= 1
        saw_fraction |= 0 < r.n_extra < r.n_docs
        order = sorted(
            by_src[r.source],
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )
        want = sum(order[: r.n_extra]) if r.n_extra else None
        assert r.extra_checksum == want, r
    assert saw_upsample, "no source ran epochs >= 1 — upsampling untested"
    assert saw_fraction, "no fractional epoch — the rank prefix untested"


def test_p08_corrupt_source_label_degrades_not_crashes(spark, tmp_path):
    """Review r15: under Spark 4's default ANSI mode a plain CAST on a
    non-'srcN' label would abort the whole mixture plan (DuckDB's CAST
    errors the oracle identically).  The try_cast weight derivation must
    instead degrade the corrupt source to a NULL plan row — no budget
    claimed, no crash — with BOTH engines agreeing row-for-row."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": list(range(12)),
            "source": ["src1"] * 5 + ["src2"] * 5 + ["corrupt", None],
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    rows = QUERIES["p08_epoch_mixture_plan"](spark, str(tmp_path)).collect()
    by = {r.source: r for r in rows}
    assert set(by) == {"src1", "src2", "corrupt", None}
    for bad in ("corrupt", None):
        r = by[bad]
        assert r.target_n is None and r.n_extra is None and r.n_emitted is None
        assert r.extra_checksum is None  # no budget claimed
    assert by["src1"].target_n is not None and by["src2"].target_n is not None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    oracle = con.execute(ORACLES["p08_epoch_mixture_plan"]).fetchall()
    assert sorted(map(tuple, rows), key=str) == sorted(oracle, key=str)
