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

    def test_delete_where_graph_groups(self, spark, store, upd):
        # SPARQL 1.1 Update §3.1.3.3: DELETE WHERE takes a QuadPattern —
        # GRAPH groups included.  A constant graph restricts the match;
        # GRAPH ?g deletes each matched quad from its own graph.
        upd.update(
            "PREFIX ex: <http://e/> INSERT DATA { "
            'ex:keep ex:p "d" . '
            'GRAPH ex:g1 { ex:a ex:p "x" . ex:a ex:q "y" } '
            'GRAPH ex:g2 { ex:a ex:p "x" } }'
        )
        upd.update("PREFIX ex: <http://e/> DELETE WHERE { GRAPH ex:g1 { ex:a ex:p ?o } }")
        assert all_quads(spark, store) == {
            (DEFAULT_GRAPH, EX + "keep", EX + "p", "d"),
            (EX + "g1", EX + "a", EX + "q", "y"),
            (EX + "g2", EX + "a", EX + "p", "x"),
        }
        upd.update("PREFIX ex: <http://e/> DELETE WHERE { GRAPH ?g { ex:a ?p ?o } }")
        assert all_quads(spark, store) == {
            (DEFAULT_GRAPH, EX + "keep", EX + "p", "d"),
        }

    def test_delete_where_mixed_default_and_graph(self, spark, store, upd):
        upd.update(
            "PREFIX ex: <http://e/> INSERT DATA { "
            'ex:a ex:tag "t" . GRAPH ex:g1 { ex:a ex:p "x" } }'
        )
        # joint pattern: only quads whose subject ALSO has the default-
        # graph tag match; both the tag quad and the graph quad delete
        upd.update(
            "PREFIX ex: <http://e/> "
            'DELETE WHERE { ?s ex:tag "t" . GRAPH ex:g1 { ?s ex:p ?o } }'
        )
        assert all_quads(spark, store) == set()

    def test_delete_where_rejects_non_quad_pattern(self, upd):
        with pytest.raises(RdfParseError, match="quad pattern"):
            upd.update(
                "PREFIX ex: <http://e/> "
                'DELETE WHERE { ?s ex:p ?o FILTER(?o = "x") }'
            )

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


class TestGraphManagement:
    """LOAD / CREATE / ADD / COPY / MOVE / WITH / USING (SPARQL 1.1 Update
    §3.1.3, §3.2; the reference serves the full grammar via Fuseki/ARQ)."""

    def seed(self, upd):
        upd.update(
            "PREFIX ex: <http://e/> INSERT DATA {"
            ' ex:d ex:p "dv" .'
            ' GRAPH ex:g1 { ex:a ex:p "1" . ex:b ex:p "2" }'
            ' GRAPH ex:g2 { ex:c ex:p "3" } }'
        )

    def test_add_graph_to_graph(self, spark, store, upd):
        self.seed(upd)
        upd.update("PREFIX ex: <http://e/> ADD GRAPH ex:g1 TO GRAPH ex:g2")
        got = all_quads(spark, store)
        assert (EX + "g2", EX + "a", EX + "p", "1") in got
        assert (EX + "g2", EX + "c", EX + "p", "3") in got  # dst kept
        assert (EX + "g1", EX + "a", EX + "p", "1") in got  # src kept

    def test_copy_replaces_destination(self, spark, store, upd):
        self.seed(upd)
        upd.update("PREFIX ex: <http://e/> COPY ex:g1 TO ex:g2")
        g2 = {q for q in all_quads(spark, store) if q[0] == EX + "g2"}
        assert g2 == {
            (EX + "g2", EX + "a", EX + "p", "1"),
            (EX + "g2", EX + "b", EX + "p", "2"),
        }
        assert (EX + "g1", EX + "a", EX + "p", "1") in all_quads(spark, store)

    def test_move_drops_source(self, spark, store, upd):
        self.seed(upd)
        upd.update("PREFIX ex: <http://e/> MOVE ex:g1 TO ex:g2")
        got = all_quads(spark, store)
        assert not any(q[0] == EX + "g1" for q in got)
        g2 = {q for q in got if q[0] == EX + "g2"}
        assert g2 == {
            (EX + "g2", EX + "a", EX + "p", "1"),
            (EX + "g2", EX + "b", EX + "p", "2"),
        }

    def test_add_default_to_graph_and_same_graph_noop(self, spark, store, upd):
        self.seed(upd)
        v0 = store.version
        upd.update("PREFIX ex: <http://e/> ADD DEFAULT TO GRAPH ex:g2 ; COPY ex:g1 TO ex:g1")
        got = all_quads(spark, store)
        assert (EX + "g2", EX + "d", EX + "p", "dv") in got
        assert (DEFAULT_GRAPH, EX + "d", EX + "p", "dv") in got
        assert {q for q in got if q[0] == EX + "g1"} == {
            (EX + "g1", EX + "a", EX + "p", "1"),
            (EX + "g1", EX + "b", EX + "p", "2"),
        }
        assert store.version == v0 + 1  # one commit for the whole request

    def test_move_to_default(self, spark, store, upd):
        self.seed(upd)
        upd.update("PREFIX ex: <http://e/> MOVE ex:g2 TO DEFAULT")
        got = all_quads(spark, store)
        assert (DEFAULT_GRAPH, EX + "c", EX + "p", "3") in got
        assert (DEFAULT_GRAPH, EX + "d", EX + "p", "dv") not in got  # dst replaced
        assert not any(q[0] == EX + "g2" for q in got)

    def test_create_graph_noop(self, spark, store, upd):
        self.seed(upd)
        v0 = store.version
        upd.update("PREFIX ex: <http://e/> CREATE GRAPH ex:fresh")
        assert store.version == v0 + 1  # commits (empty), graph set unchanged
        assert not any(q[0] == EX + "fresh" for q in all_quads(spark, store))

    def test_with_scopes_templates_and_pattern(self, spark, store, upd):
        self.seed(upd)
        upd.update(
            "PREFIX ex: <http://e/> WITH ex:g1 "
            'DELETE { ?s ex:p "1" } INSERT { ?s ex:q "one" } WHERE { ?s ex:p "1" }'
        )
        got = all_quads(spark, store)
        assert (EX + "g1", EX + "a", EX + "q", "one") in got
        assert (EX + "g1", EX + "a", EX + "p", "1") not in got
        # default graph untouched — WITH rescoped the pattern away from it
        assert (DEFAULT_GRAPH, EX + "d", EX + "p", "dv") in got

    def test_with_insert_only(self, spark, store, upd):
        self.seed(upd)
        upd.update(
            "PREFIX ex: <http://e/> WITH ex:g2 "
            "INSERT { ?s ex:copied true } WHERE { ?s ex:p ?o }"
        )
        assert (EX + "g2", EX + "c", EX + "copied", "true") in all_quads(spark, store)

    def test_using_builds_pattern_dataset(self, spark, store, upd):
        self.seed(upd)
        # USING makes g1+g2 the pattern's default graph; INSERT goes to the
        # real default graph (no WITH on the template side)
        upd.update(
            "PREFIX ex: <http://e/> "
            "INSERT { ?s ex:merged true } USING ex:g1 USING ex:g2 WHERE { ?s ex:p ?o }"
        )
        got = all_quads(spark, store)
        for subj in ("a", "b", "c"):
            assert (DEFAULT_GRAPH, EX + subj, EX + "merged", "true") in got
        # ex:d lives in the true default graph, which USING replaced
        assert (DEFAULT_GRAPH, EX + "d", EX + "merged", "true") not in got

    def test_using_named(self, spark, store, upd):
        self.seed(upd)
        upd.update(
            "PREFIX ex: <http://e/> "
            "INSERT { ?s ex:from ?g } USING NAMED ex:g1 WHERE { GRAPH ?g { ?s ex:p ?o } }"
        )
        got = all_quads(spark, store)
        assert (DEFAULT_GRAPH, EX + "a", EX + "from", EX + "g1") in got
        assert not any(p == EX + "from" and o == EX + "g2" for _, _, p, o in got)

    def test_load_nt_into_graph(self, spark, store, upd, tmp_path):
        doc = tmp_path / "doc.nt"
        doc.write_text('<http://e/x> <http://e/p> "loaded" .\n')
        upd.update(f"LOAD <file://{doc}> INTO GRAPH <http://e/g9>")
        assert (EX + "g9", EX + "x", EX + "p", "loaded") in all_quads(spark, store)

    def test_load_turtle_default_graph(self, spark, store, upd, tmp_path):
        doc = tmp_path / "doc.ttl"
        doc.write_text('@prefix ex: <http://e/> . ex:y ex:p "t" .\n')
        upd.update(f"LOAD <file://{doc}>")
        assert (DEFAULT_GRAPH, EX + "y", EX + "p", "t") in all_quads(spark, store)

    def test_load_silent_swallows_missing(self, spark, store, upd, tmp_path):
        upd.update(f"LOAD SILENT <file://{tmp_path}/nope.nt>")
        with pytest.raises(Exception):
            upd.update(f"LOAD <file://{tmp_path}/nope.nt>")

    def test_reload_mints_fresh_bnodes(self, spark, store, upd, tmp_path):
        # SPARQL/Jena semantics: each LOAD execution mints fresh bnodes, so
        # re-LOADing a bnode-rooted document doubles its structures
        doc = tmp_path / "b.ttl"
        doc.write_text("@prefix ex: <http://e/> . ex:z ex:p [ ex:q 1 ] .\n")
        upd.update(f"LOAD <file://{doc}>")
        assert store.read(spark).count() == 2
        upd.update(f"LOAD <file://{doc}>")
        assert store.read(spark).count() == 4

    def test_load_replay_same_txn_is_noop(self, spark, store, upd, tmp_path):
        # crash-replay contract: the SAME request (same txn_id) re-derives
        # the same bnode labels and the idempotent commit drops the re-apply
        doc = tmp_path / "b2.ttl"
        doc.write_text("@prefix ex: <http://e/> . ex:z ex:p [ ex:q 1 ] .\n")
        upd.update(f"LOAD <file://{doc}>", txn_id="req-1")
        assert store.read(spark).count() == 2
        upd.update(f"LOAD <file://{doc}>", txn_id="req-1")  # replayed request
        assert store.read(spark).count() == 2

    def test_insert_data_mints_fresh_bnodes_per_execution(self, spark, store, upd):
        # §3.1.1: re-running INSERT DATA with a bnode adds a NEW bnode —
        # the label must not collapse under set semantics
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:a ex:p [ ex:q "1" ] }')
        assert store.read(spark).count() == 2
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:a ex:p [ ex:q "1" ] }')
        assert store.read(spark).count() == 4
        # crash-replay of the SAME request (same txn_id) stays a no-op
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:a ex:p [ ex:q "2" ] }', txn_id="t1")
        n = store.read(spark).count()
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:a ex:p [ ex:q "2" ] }', txn_id="t1")
        assert store.read(spark).count() == n

    def test_insert_template_bnode_fresh_per_solution(self, spark, store, upd):
        # §3.1.3: a template bnode mints one fresh node PER SOLUTION, kept
        # consistent across the template's quads within each solution
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:s1 ex:t "x" . ex:s2 ex:t "y" }')
        upd.update('PREFIX ex: <http://e/> INSERT { ?s ex:has [ ex:v ?o ] } WHERE { ?s ex:t ?o }')
        quads = [(r.subject, r.predicate, r.object_value) for r in store.read(spark).collect()]
        has = {s: v for s, p, v in quads if p == EX + "has"}
        vals = {s: v for s, p, v in quads if p == EX + "v"}
        assert has[EX + "s1"] != has[EX + "s2"]
        assert vals[has[EX + "s1"]] == "x" and vals[has[EX + "s2"]] == "y"

    def test_insert_bnode_template_with_variable_free_where(self, spark, store, upd):
        # ADVICE r5: zero-column bindings (variable-free WHERE) + bnode in
        # the INSERT template must not crash the solution-hash build
        upd.update('PREFIX ex: <http://e/> INSERT DATA { ex:s ex:p "abc" }')
        upd.update(
            'PREFIX ex: <http://e/> INSERT { ex:a ex:q [] } WHERE { ex:s ex:p "abc" }'
        )
        got = all_quads(spark, store)
        assert any(s == EX + "a" and p == EX + "q" for _, s, p, _ in got)
        # WHERE matched once -> exactly one fresh bnode quad
        assert sum(1 for _, s, p, _ in got if p == EX + "q") == 1

    def test_delete_bnodes_rejected(self, spark, store, upd):
        # §3.1.2/.3: bnodes are disallowed in DELETE DATA and DELETE templates
        with pytest.raises(RdfParseError, match="blank node"):
            upd.update("DELETE DATA { <http://e/a> <http://e/p> _:b }")
        with pytest.raises(RdfParseError, match="blank node"):
            upd.update("DELETE { ?s <http://e/p> [] } WHERE { ?s <http://e/p> ?o }")

    def test_repeated_load_in_one_request_mints_fresh_bnodes(
        self, spark, store, upd, tmp_path
    ):
        # "LOAD <d>; LOAD <d>" in ONE request (one txn_id) is two LOAD
        # executions — each mints fresh bnodes, so set semantics must not
        # collapse them (the seed mixes a per-request load index)
        doc = tmp_path / "b3.ttl"
        doc.write_text("@prefix ex: <http://e/> . ex:z ex:p [ ex:q 1 ] .\n")
        upd.update(
            f"LOAD <file://{doc}> ; LOAD <file://{doc}>", txn_id="req-2"
        )
        assert store.read(spark).count() == 4
        # and crash-replay of that same request stays a no-op
        upd.update(
            f"LOAD <file://{doc}> ; LOAD <file://{doc}>", txn_id="req-2"
        )
        assert store.read(spark).count() == 4


class TestProtocolUsingParams:
    """SPARQL 1.1 Protocol §2.2.3: using-graph-uri / using-named-graph-uri
    scope a modify operation's WHERE dataset like USING clauses would."""

    def seed(self, upd):
        upd.update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:s1 ex:p "default" .'
            ' GRAPH ex:g { ex:s2 ex:p "in-g" } }'
        )

    def test_using_graph_param_scopes_where(self, spark, store, upd):
        self.seed(upd)
        # WHERE sees ex:g as the default graph -> matches only "in-g"
        upd.update(
            "PREFIX ex: <http://e/> INSERT { ?s ex:copied ?o } WHERE { ?s ex:p ?o }",
            protocol_dataset=(["http://e/g"], []),
        )
        got = all_quads(spark, store)
        assert (DEFAULT_GRAPH, EX + "s2", EX + "copied", "in-g") in got
        assert not any(q[2] == EX + "copied" and q[1] == EX + "s1" for q in got)

    def test_param_with_using_in_text_is_an_error(self, spark, store, upd):
        self.seed(upd)
        with pytest.raises(RdfParseError, match="USING"):
            upd.update(
                "PREFIX ex: <http://e/> DELETE { ?s ex:p ?o } USING ex:g "
                "WHERE { ?s ex:p ?o }",
                protocol_dataset=(["http://e/g"], []),
            )

    def test_param_with_with_in_text_is_an_error(self, spark, store, upd):
        self.seed(upd)
        with pytest.raises(RdfParseError, match="USING"):
            upd.update(
                "PREFIX ex: <http://e/> WITH ex:g DELETE { ?s ex:p ?o } "
                "WHERE { ?s ex:p ?o }",
                protocol_dataset=(["http://e/g"], []),
            )


class TestLoadOverHttp:
    def test_load_from_gsp_endpoint(self, spark, tmp_path):
        """LOAD <http://...> pulls another dataset's GSP export (N-Quads
        by default) into this store — the cross-dataset copy a two-server
        deployment does."""
        from jena_fuseki_kafka_spark.server import SparqlHttpServer

        src_store = QuadStore(str(tmp_path / "src"))
        UpdateEngine(spark, src_store).update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:remote ex:p "via-http" }'
        )
        srv = SparqlHttpServer(spark, src_store, dataset="src")
        port = srv.start()
        try:
            dst_store = QuadStore(str(tmp_path / "dst"))
            upd = UpdateEngine(spark, dst_store)
            upd.update(f"LOAD <http://127.0.0.1:{port}/src/data?default>")
            got = all_quads(spark, dst_store)
            assert (DEFAULT_GRAPH, EX + "remote", EX + "p", "via-http") in got
        finally:
            srv.stop()


class TestBroadcastGate:
    """The pending-delete/add broadcast gate: store-sized sets (CLEAR/DROP,
    whole-graph ADD/COPY/MOVE, unconstrained DELETE WHERE, GSP PUT/DELETE)
    must ride shuffle joins — a forced broadcast of a store-sized side is
    a driver/executor OOM at 100 TB."""

    def seed(self, upd):
        upd.update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:s1 ex:p "a" . ex:s2 ex:p "b" .'
            ' GRAPH ex:g { ex:s3 ex:p "c" } }'
        )

    # ---- gate decisions -------------------------------------------------
    def test_request_sized_deletes_broadcast(self, upd):
        self.seed(upd)
        upd.update('PREFIX ex: <http://e/> DELETE DATA { ex:s1 ex:p "a" }')
        assert upd.last_commit_broadcast == {"adds": True, "deletes": True}

    def test_clear_all_never_broadcasts_deletes(self, spark, store, upd):
        self.seed(upd)
        upd.update("CLEAR ALL")
        assert upd.last_commit_broadcast["deletes"] is False
        assert store.count(spark) == 0

    def test_drop_graph_never_broadcasts_deletes(self, spark, store, upd):
        self.seed(upd)
        upd.update("PREFIX ex: <http://e/> DROP GRAPH ex:g")
        assert upd.last_commit_broadcast["deletes"] is False
        assert store.count(spark) == 2

    def test_unconstrained_delete_where_never_broadcasts(self, spark, store, upd):
        self.seed(upd)
        upd.update("DELETE WHERE { ?s ?p ?o }")
        assert upd.last_commit_broadcast["deletes"] is False
        # only the default graph is unqualified-pattern-visible
        assert all_quads(spark, store) == {("http://e/g", "http://e/s3", "http://e/p", "c")}

    def test_constrained_delete_where_broadcasts(self, spark, store, upd):
        self.seed(upd)
        upd.update("PREFIX ex: <http://e/> DELETE WHERE { ?s ex:p ?o }")
        assert upd.last_commit_broadcast["deletes"] is True

    def test_nonselective_filter_never_broadcasts(self, spark, store, upd):
        # FILTER(?o != "x") still admits a store-sized delete set — a bare
        # FILTER node must NOT grant the broadcast hint
        self.seed(upd)
        upd.update('DELETE { ?s ?p ?o } WHERE { ?s ?p ?o FILTER(?o != "a") }')
        assert upd.last_commit_broadcast["deletes"] is False
        assert (DEFAULT_GRAPH, EX + "s1", EX + "p", "a") in all_quads(spark, store)

    def test_constant_equality_filter_broadcasts(self, spark, store, upd):
        # FILTER(?o = "a") pins ?o to one request constant — request-sized
        self.seed(upd)
        upd.update('DELETE { ?s ?p ?o } WHERE { ?s ?p ?o FILTER(?o = "a") }')
        assert upd.last_commit_broadcast["deletes"] is True
        got = all_quads(spark, store)
        assert (DEFAULT_GRAPH, EX + "s1", EX + "p", "a") not in got
        assert (DEFAULT_GRAPH, EX + "s2", EX + "p", "b") in got

    def test_constant_in_filter_broadcasts(self, spark, store, upd):
        self.seed(upd)
        upd.update('DELETE { ?s ?p ?o } WHERE { ?s ?p ?o FILTER(?o IN ("a", "b")) }')
        assert upd.last_commit_broadcast["deletes"] is True
        assert not any(q[3] in ("a", "b") and q[0] == DEFAULT_GRAPH
                       for q in all_quads(spark, store))

    def test_constant_graph_unconstrained_body_never_broadcasts(self, spark, store, upd):
        # GRAPH <g> { ?s ?p ?o } is the whole named graph — store-sized,
        # same class as DROP GRAPH / GSP DELETE which already ride shuffle
        self.seed(upd)
        upd.update(
            "PREFIX ex: <http://e/> DELETE { GRAPH ex:g { ?s ?p ?o } } "
            "WHERE { GRAPH ex:g { ?s ?p ?o } }"
        )
        assert upd.last_commit_broadcast["deletes"] is False
        assert not any(q[0] == EX + "g" for q in all_quads(spark, store))

    def test_constant_graph_constrained_body_broadcasts(self, spark, store, upd):
        self.seed(upd)
        upd.update(
            "PREFIX ex: <http://e/> DELETE { GRAPH ex:g { ?s ex:p ?o } } "
            "WHERE { GRAPH ex:g { ?s ex:p ?o } }"
        )
        assert upd.last_commit_broadcast["deletes"] is True

    def test_minus_recurses_into_left(self, spark, store, upd):
        # MINUS does not narrow: { ?s ?p ?o MINUS {...} } is store-sized
        self.seed(upd)
        upd.update(
            "PREFIX ex: <http://e/> DELETE { ?s ?p ?o } "
            'WHERE { ?s ?p ?o MINUS { ?s ex:q ?o } }'
        )
        assert upd.last_commit_broadcast["deletes"] is False

    def test_copy_marks_adds_and_deletes_unbounded(self, spark, store, upd):
        self.seed(upd)
        upd.update("PREFIX ex: <http://e/> COPY DEFAULT TO ex:dst")
        assert upd.last_commit_broadcast == {"adds": False, "deletes": False}
        got = all_quads(spark, store)
        assert ("http://e/dst", "http://e/s1", "http://e/p", "a") in got

    def test_mixed_ops_any_unbounded_wins(self, spark, store, upd):
        self.seed(upd)
        upd.update(
            'PREFIX ex: <http://e/> INSERT DATA { ex:x ex:p "y" } ; CLEAR DEFAULT'
        )
        assert upd.last_commit_broadcast["deletes"] is False

    # ---- the hint actually reaches (or stays out of) the join plan ------
    def test_anti_join_without_flag_has_no_broadcast_hint(self, spark, store, upd):
        from jena_fuseki_kafka_spark.store.quadstore import _anti_join_quads

        self.seed(upd)
        base = store.read(spark)
        hinted = _anti_join_quads(base, base, broadcast_right=True)
        unhinted = _anti_join_quads(base, base, broadcast_right=False)
        assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
        # no hint: at scale Catalyst sizes the join itself (shuffle for a
        # store-sized side; tiny test inputs may still auto-broadcast)
        assert "ResolvedHint" not in unhinted._jdf.queryExecution().analyzed().toString()

    def test_gsp_put_and_delete_do_not_break(self, spark, store, upd):
        from jena_fuseki_kafka_spark.model import QUAD_SCHEMA as QS

        self.seed(upd)
        df = spark.createDataFrame(
            [("", "http://e/n1", "http://e/p", "iri", "http://e/o", None, None)], QS
        )
        upd.gsp_put(df, graph=None)
        assert (DEFAULT_GRAPH, "http://e/n1", "http://e/p", "http://e/o") in all_quads(
            spark, store
        )
        upd.gsp_delete(graph=None)
        assert store.count(spark) == 1  # only the named-graph quad survives
