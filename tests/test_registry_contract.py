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
