"""SPARQL Update + Graph Store Protocol tests (the reference's HTTP-side
mutation surface: fuseki:update + fuseki:gsp-rw endpoints,
config-connector.ttl:14-17).
"""

import pytest

from pyspark.sql import functions as F

from jena_fuseki_kafka_spark.model import DEFAULT_GRAPH, QUAD_SCHEMA, RdfParseError
from jena_fuseki_kafka_spark.sparql import SparqlEngine
from jena_fuseki_kafka_spark.sparql.update import UpdateEngine
from jena_fuseki_kafka_spark.store import QuadStore

EX = "http://e/"


@pytest.fixture()
def store(tmp_path):
    return QuadStore(str(tmp_path / "quads"))


@pytest.fixture()
def upd(spark, store):
    return UpdateEngine(spark, store)


def all_quads(spark, store):
    return {
        (r.graph, r.subject, r.predicate, r.object_value)
        for r in store.read(spark).collect()
    }


class TestUpdate:
    def test_insert_data(self, spark, store, upd):
        upd.update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:s ex:p "v" . GRAPH ex:g { ex:s2 ex:p 5 } }'
        )
        got = all_quads(spark, store)
        assert (DEFAULT_GRAPH, EX + "s", EX + "p", "v") in got
        assert (EX + "g", EX + "s2", EX + "p", "5") in got

    def test_delete_data(self, spark, store, upd):
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:s ex:p "a" . ex:s ex:p "b" }')
        upd.update('PREFIX ex: <http://e/> DELETE DATA { ex:s ex:p "a" }')
        assert all_quads(spark, store) == {(DEFAULT_GRAPH, EX + "s", EX + "p", "b")}

    def test_delete_data_rejects_variables(self, upd):
        with pytest.raises(RdfParseError, match="variable"):
            upd.update("PREFIX ex: <http://e/> DELETE DATA { ?s ex:p 1 }")

    def test_delete_where(self, spark, store, upd):
        upd.update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:a ex:old "x" . ex:b ex:old "y" . ex:c ex:new "z" }'
        )
        upd.update("PREFIX ex: <http://e/> DELETE WHERE { ?s ex:old ?o }")
        assert all_quads(spark, store) == {(DEFAULT_GRAPH, EX + "c", EX + "new", "z")}

    def test_delete_insert_where(self, spark, store, upd):
        # rename predicate p -> q for objects > 2
        upd.update("PREFIX ex: <http://e/> INSERT DATA { ex:a ex:p 1 . ex:b ex:p 5 }")
        upd.update(
            "PREFIX ex: <http://e/> "
            "DELETE { ?s ex:p ?o } INSERT { ?s ex:q ?o } WHERE { ?s ex:p ?o FILTER(?o > 2) }"
        )
        got = all_quads(spark, store)
        assert (DEFAULT_GRAPH, EX + "a", EX + "p", "1") in got
        assert (DEFAULT_GRAPH, EX + "b", EX + "q", "5") in got
        assert (DEFAULT_GRAPH, EX + "b", EX + "p", "5") not in got

    def test_clear_graph_and_all(self, spark, store, upd):
        upd.update(
            "PREFIX ex: <http://e/> INSERT DATA "
            "{ ex:s ex:p 1 . GRAPH ex:g1 { ex:s ex:p 2 } GRAPH ex:g2 { ex:s ex:p 3 } }"
        )
        upd.update("PREFIX ex: <http://e/> CLEAR GRAPH ex:g1")
        assert {g for g, *_ in all_quads(spark, store)} == {DEFAULT_GRAPH, EX + "g2"}
        upd.update("CLEAR NAMED")
        assert {g for g, *_ in all_quads(spark, store)} == {DEFAULT_GRAPH}
        upd.update("CLEAR ALL")
        assert store.count(spark) == 0

    def test_multi_op_atomic(self, spark, store, upd):
        v0 = store.version
        upd.update(
            "PREFIX ex: <http://e/> INSERT DATA { ex:a ex:p 1 } ; INSERT DATA { ex:b ex:p 2 }"
        )
        assert store.count(spark) == 2
        assert store.version == v0 + 1  # one commit for the whole request

    def test_sequential_insert_then_delete(self, spark, store, upd):
        # SPARQL 1.1 Update: ops in a request apply in sequence — the
        # DELETE DATA sees (and removes) the quad the INSERT DATA created
        upd.update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:s ex:p "q" } ; DELETE DATA { ex:s ex:p "q" }'
        )
        assert store.count(spark) == 0

    def test_sequential_delete_then_insert(self, spark, store, upd):
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:s ex:p "q" }')
        upd.update(
            'PREFIX ex: <http://e/> DELETE DATA { ex:s ex:p "q" } ; INSERT DATA { ex:s ex:p "q" }'
        )
        assert all_quads(spark, store) == {(DEFAULT_GRAPH, EX + "s", EX + "p", "q")}

    def test_sequential_delete_where_sees_prior_insert(self, spark, store, upd):
        upd.update(
            "PREFIX ex: <http://e/> "
            "INSERT DATA { ex:a ex:tmp 1 . ex:b ex:keep 2 } ; DELETE WHERE { ?s ex:tmp ?o }"
        )
        assert all_quads(spark, store) == {(DEFAULT_GRAPH, EX + "b", EX + "keep", "2")}

    def test_sequential_modify_sees_prior_op(self, spark, store, upd):
        # second op's WHERE matches the quad the first op inserted
        upd.update(
            "PREFIX ex: <http://e/> "
            "INSERT DATA { ex:a ex:p 5 } ; "
            "DELETE { ?s ex:p ?o } INSERT { ?s ex:q ?o } WHERE { ?s ex:p ?o }"
        )
        got = all_quads(spark, store)
        assert got == {(DEFAULT_GRAPH, EX + "a", EX + "q", "5")}

    def test_sequential_still_one_commit(self, spark, store, upd):
        v0 = store.version
        upd.update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:a ex:p 1 } ; DELETE DATA { ex:a ex:p 1 } ; '
            "INSERT DATA { ex:b ex:p 2 }"
        )
        assert store.version == v0 + 1
        assert all_quads(spark, store) == {(DEFAULT_GRAPH, EX + "b", EX + "p", "2")}

    def test_update_then_query(self, spark, store, upd):
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:s ex:name "Zed" }')
        eng = SparqlEngine.from_store(spark, store)
        assert eng.query('PREFIX ex: <http://e/> ASK { ?s ex:name "Zed" }') is True


class TestGraphStoreProtocol:
    def quads_df(self, spark, rows):
        return spark.createDataFrame(rows, QUAD_SCHEMA)

    def test_put_replaces(self, spark, store, upd):
        upd.update('PREFIX ex: <http://e/> INSERT DATA { GRAPH ex:g { ex:old ex:p "x" } }')
        incoming = self.quads_df(
            spark, [("ignored", EX + "new", EX + "p", "literal", "y", None, None)]
        )
        upd.gsp_put(incoming, graph=EX + "g")
        g = upd.gsp_get(EX + "g").collect()
        assert len(g) == 1 and g[0].subject == EX + "new"

    def test_post_merges(self, spark, store, upd):
        upd.update('PREFIX ex: <http://e/> INSERT DATA { GRAPH ex:g { ex:a ex:p "x" } }')
        incoming = self.quads_df(spark, [("", EX + "b", EX + "p", "literal", "y", None, None)])
        upd.gsp_post(incoming, graph=EX + "g")
        assert upd.gsp_get(EX + "g").count() == 2

    def test_delete_graph(self, spark, store, upd):
        upd.update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:d ex:p "keep" . GRAPH ex:g { ex:a ex:p "x" } }'
        )
        upd.gsp_delete(EX + "g")
        assert upd.gsp_get(EX + "g").count() == 0
        assert upd.gsp_get().count() == 1  # default graph untouched

    def test_get_default_graph(self, spark, store, upd):
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:d ex:p "v" }')
        df = upd.gsp_get()
        assert df.filter(F.col("subject") == EX + "d").count() == 1
