"""d04's over-cap block fallback must be NON-vacuous (VERDICT r6 item 4).

Round 6 found that docs in (lang, len_bucket) blocks over the cap were
silently excluded from pair generation — "routes to MinHash at production
scale" was documented but not wired.  Now over-cap blocks go through d02's
band-bucket LSH candidate path (same-block-restricted) and rejoin the shared
exact verify stage.  These tests pin that BOTH routes produce pairs on the
test corpus and the union matches the DuckDB oracle exactly.
"""

import duckdb

from jena_fuseki_kafka_spark.queries import ORACLES, QUERIES, _CHECK_PRIORITY
from jena_fuseki_kafka_spark.queries.dedup import D04_MAX_BLOCK_DOCS


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def _over_cap_doc_ids(sf_dir):
    con = _duck(sf_dir)
    rows = con.execute(
        f"""
        WITH m AS (SELECT doc_id, lang, n_chars // 200 AS lb FROM documents),
        c AS (SELECT lang, lb, COUNT(*) AS n FROM m GROUP BY 1, 2)
        SELECT doc_id FROM m JOIN c USING (lang, lb) WHERE c.n > {D04_MAX_BLOCK_DOCS}
        """
    ).fetchall()
    return {r[0] for r in rows}


def test_d04_matches_oracle_and_both_routes_non_vacuous(spark, sf_dir):
    rows = QUERIES["d04_ngram_jaccard_blocked"](spark, sf_dir).collect()
    oracle = _duck(sf_dir).execute(ORACLES["d04_ngram_jaccard_blocked"]).fetchall()
    assert sorted(tuple(r) for r in rows) == sorted(tuple(r) for r in oracle)

    over = _over_cap_doc_ids(sf_dir)
    assert over, "test corpus must contain at least one over-cap block"
    over_pairs = [r for r in rows if r[0] in over or r[1] in over]
    small_pairs = [r for r in rows if r[0] not in over and r[1] not in over]
    assert over_pairs, (
        "over-cap blocks produced no pairs — the LSH fallback route is "
        "vacuous on this corpus and proves nothing"
    )
    assert small_pairs, "small-block exhaustive route produced no pairs"


def test_d04_over_cap_pairs_stay_within_one_block(spark, sf_dir):
    # the fallback must never pair docs across blocking keys: LSH
    # candidates are keyed on (lang, len_bucket, band) — a cross-block
    # pair would mean the blocking restriction was lost in the join
    rows = QUERIES["d04_ngram_jaccard_blocked"](spark, sf_dir).collect()
    con = _duck(sf_dir)
    meta = dict(
        con.execute(
            "SELECT doc_id, lang || '/' || (n_chars // 200) FROM documents"
        ).fetchall()
    )
    for doc_a, doc_b, _ in rows:
        assert meta[doc_a] == meta[doc_b], (doc_a, doc_b)


def test_d04_stays_oracle_gated():
    assert "d04_ngram_jaccard_blocked" in QUERIES
    assert "d04_ngram_jaccard_blocked" in ORACLES
    assert "d04_ngram_jaccard_blocked" in _CHECK_PRIORITY


class TestD08SubstringSpans:
    def test_spans_non_vacuous_and_well_formed(self, spark, sf_dir):
        from jena_fuseki_kafka_spark.queries.dedup import D08_NGRAM

        rows = QUERIES["d08_substring_span_dedup"](spark, sf_dir).collect()
        assert rows, "corpus must contain cross-doc duplicated spans"
        by_doc = {}
        for r in rows:
            assert r.span_tokens == r.span_end - r.span_start + 1
            assert r.span_tokens >= D08_NGRAM  # a span is at least one n-gram
            by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        # spans within one doc are maximal: sorted, non-overlapping, with
        # a gap > 1 between consecutive spans (else they'd have merged)
        for doc, spans in by_doc.items():
            spans.sort()
            for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
                assert s2 > e1 + 1, (doc, spans)

    def test_d08_oracle_registered(self):
        assert "d08_substring_span_dedup" in ORACLES
