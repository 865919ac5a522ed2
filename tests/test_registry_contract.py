"""Driver-contract guards: the registration window is part of the
verification contract (the driver checks the first 50 registered queries),
so regressions here silently un-verify operators."""

import __spark_entry__ as entry
from jena_fuseki_kafka_spark.queries import ORACLES, QUERIES, _CHECK_PRIORITY


def test_every_query_has_an_oracle():
    missing = [n for n in QUERIES if n not in ORACLES]
    assert not missing, f"queries without oracles: {missing}"


def test_priority_names_are_real():
    ghosts = [n for n in _CHECK_PRIORITY if n not in QUERIES]
    assert not ghosts, f"_CHECK_PRIORITY names unknown queries: {ghosts}"


def test_no_query_dropped_by_reordering():
    assert set(entry.queries()) == set(QUERIES)
    assert set(entry.oracle_sql()) == set(ORACLES)


def test_entry_exports_match():
    names = list(entry.queries())
    assert len(names) == len(set(names))
    # every registered query is callable
    assert all(callable(fn) for fn in entry.queries().values())


def test_all_oracles_plan_in_duckdb():
    # EXPLAIN (plan, don't execute) every oracle against the real tables:
    # an oracle SQL typo in a query outside the current 50-slot check
    # window would otherwise surface only when its rotation slot comes up,
    # rounds later
    import os

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, f"oracles that fail to plan: {bad}"
