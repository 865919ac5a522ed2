"""t11's cross-engine contract rests on one non-IEEE-exact operation:
log10.  IEEE 754 pins +,-,*,/,sqrt to correct rounding (so the cosine /
decimal machinery is exact by construction), but log10 is only
'recommended' — a libm and DuckDB's implementation may disagree by an
ulp, and FLOOR(log10(p)*1e6) flips by one micro-unit exactly at an
integer boundary.  This test makes the assumption a VERIFIED property of
this environment: for every one of the 729 smoothed model ratios that
the real corpora produce, Python's math.log10 (what t11 bakes into the
Spark literal array) and DuckDB's LOG10 (what the oracle computes) must
floor to the same micro-unit.  A DuckDB/libm upgrade that breaks the
agreement fails HERE, with the offending ratio printed, instead of as an
opaque value-hash mismatch in the driver gate.
"""

import math

import duckdb
import pytest


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_python_and_duckdb_log10_agree_on_all_model_ratios(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    # corpus bigram counts, the same derivation t11's oracle uses
    rows = con.execute(r"""
        WITH norm AS (SELECT regexp_replace(lower(text), '[^a-z]', ' ', 'g') AS t
                      FROM documents),
        big AS (SELECT substr(t, CAST(i AS INT), 2) AS bg
                FROM norm, LATERAL (SELECT unnest(generate_series(1, length(t) - 1)) AS i)),
        cnt AS (SELECT bg, COUNT(*) AS c FROM big GROUP BY bg)
        SELECT bg, c FROM cnt
    """).fetchall()
    counts = dict(rows)
    syms = [chr(97 + i) for i in range(26)] + [" "]
    first_tot = {c1: 0 for c1 in syms}
    for bg, c in counts.items():
        first_tot[bg[0]] += c

    ratios = [
        (c1 + c2, counts.get(c1 + c2, 0) + 1.0, first_tot[c1] + 27.0)
        for c1 in syms
        for c2 in syms
    ]
    # one batch: DuckDB FLOOR(LOG10(num/den)*1e6) for every ratio
    vals = ", ".join(f"('{i}', {num!r}, {den!r})" for i, (_, num, den) in enumerate(ratios))
    duck = dict(
        con.execute(
            f"SELECT i, CAST(FLOOR(LOG10(num / den) * 1000000) AS BIGINT) "
            f"FROM (VALUES {vals}) AS t(i, num, den)"
        ).fetchall()
    )
    mismatches = [
        (bg, num, den, py, duck[str(i)])
        for i, (bg, num, den) in enumerate(ratios)
        if (py := int(math.floor(math.log10(num / den) * 1_000_000))) != duck[str(i)]
    ]
    assert not mismatches, (
        f"{len(mismatches)} model ratios floor differently between Python "
        f"math.log10 and DuckDB LOG10 — t11's micro-unit contract is broken "
        f"on this host: {mismatches[:5]}"
    )


def test_t12_weight_table_matches_duckdb_formula():
    """t12 bakes _t12_weights() (Python hashlib md5) into the Spark plan
    while its oracle computes the same weights inline with DuckDB's md5 —
    this pins every one of the 64 table entries to bit-agreement, so a
    divergence fails here by index instead of as an opaque value-hash
    mismatch at the driver gate."""
    from jena_fuseki_kafka_spark.queries.text import EMB_DIM, T12_W_MOD, _t12_weights

    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT (('0x'||substr(md5('w:' || CAST(i AS VARCHAR)),1,15))::BIGINT"
            f" % {T12_W_MOD}) - {T12_W_MOD // 2}"
            f" FROM (SELECT unnest(range(0, {EMB_DIM})) AS i) ORDER BY i"
        ).fetchall()
    ]
    assert duck == _t12_weights()


def test_t12_verdict_covers_every_document(spark, sf_dir):
    """The quality gate must emit exactly one keep/drop verdict per
    document (NULL-text docs included, scoring 0 and dropping) and must
    be non-vacuous in both directions on real testdata — a filter that
    keeps or drops everything is a broken model, not a gate."""
    from jena_fuseki_kafka_spark.queries import QUERIES, load

    n_docs = load(spark, sf_dir, "documents").count()
    rows = QUERIES["t12_classifier_quality_filter"](spark, sf_dir).collect()
    assert len(rows) == n_docs
    kept = {r.kept for r in rows}
    assert kept == {0, 1}, f"degenerate verdict distribution: {kept}"
    for r in rows:
        assert r.kept == (1 if r.logit > 0 else 0)
