"""HTTP facade tests: the reference's four service operations
(config-connector.ttl:14-17) driven through real HTTP requests, ending
with the acceptance count query its e2e tests poll
(DockerTestConfigFK.java:392-397).
"""

import json
import urllib.request
from urllib.parse import quote

import pytest

from jena_fuseki_kafka_spark.server import SparqlHttpServer
from jena_fuseki_kafka_spark.store import QuadStore

EX = "http://example.org/"


def req(url, method="GET", data=None, content_type=None, accept=None):
    r = urllib.request.Request(url, data=data, method=method)
    if content_type:
        r.add_header("Content-Type", content_type)
    if accept:
        r.add_header("Accept", accept)
    try:
        with urllib.request.urlopen(r) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read().decode()


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    store = QuadStore(str(tmp_path_factory.mktemp("http") / "quads"))
    srv = SparqlHttpServer(spark, store, dataset="ds")
    port = srv.start()
    yield f"http://127.0.0.1:{port}/ds"
    srv.stop()


class TestGraphStoreProtocol:
    def test_put_then_get_default_graph(self, server):
        ttl = b"@prefix ex: <http://example.org/> . ex:s1 ex:p ex:o1 . ex:s2 ex:p ex:o2 ."
        code, _, body = req(f"{server}/data?default", "PUT", ttl, "text/turtle")
        assert code == 200 and json.loads(body)["quads"] == 2
        code, ct, body = req(f"{server}/data?default")
        assert code == 200 and ct.startswith("application/n-quads")
        assert body.count("\n") == 2 and "<http://example.org/s1>" in body

    def test_post_merges_put_replaces(self, server):
        extra = b"<http://example.org/s3> <http://example.org/p> \"v\" ."
        code, _, _ = req(f"{server}/data?default", "POST", extra, "application/n-triples")
        assert code == 200
        _, _, body = req(f"{server}/data?default")
        assert body.count("\n") == 3
        replacement = b"@prefix ex: <http://example.org/> . ex:only ex:p ex:o ."
        code, _, _ = req(f"{server}/data?default", "PUT", replacement, "text/turtle")
        assert code == 200
        _, _, body = req(f"{server}/data?default")
        assert body.count("\n") == 1 and "only" in body

    def test_named_graph_and_delete(self, server):
        g = EX + "g1"
        ttl = b"@prefix ex: <http://example.org/> . ex:a ex:q ex:b ."
        code, _, _ = req(f"{server}/data?graph={quote(g, safe='')}", "PUT", ttl, "text/turtle")
        assert code == 200
        _, _, body = req(f"{server}/data?graph={quote(g, safe='')}")
        assert f"<{g}>" in body
        code, _, _ = req(f"{server}/data?graph={quote(g, safe='')}", "DELETE")
        assert code == 204
        _, _, body = req(f"{server}/data?graph={quote(g, safe='')}")
        assert body.strip() == ""


class TestContentNegotiation:
    # uses its own named graph so the shared fixture's default graph
    # (exercised by the other classes) is untouched
    G = quote(EX + "cngraph", safe="")

    def test_gsp_get_honors_accept(self, server):
        ttl = b"@prefix ex: <http://example.org/> . ex:cn ex:p \"neg\" ."
        code, _, _ = req(f"{server}/data?graph={self.G}", "PUT", ttl, "text/turtle")
        assert code == 200
        for accept, expect_ct, marker in [
            ("text/turtle", "text/turtle", "<http://example.org/cn>"),
            ("application/ld+json", "application/ld+json", '"@graph"'),
            ("application/rdf+xml", "application/rdf+xml", "<rdf:RDF"),
            ("application/trig", "application/trig", "<http://example.org/cn>"),
            (None, "application/n-quads", "<http://example.org/cn>"),
        ]:
            code, ct, body = req(f"{server}/data?graph={self.G}", accept=accept)
            assert code == 200 and ct.startswith(expect_ct), (accept, ct)
            assert marker in body, (accept, body)


    G2 = quote(EX + "rfgraph", safe="")

    def test_select_results_formats(self, server):
        ttl = b'@prefix ex: <http://example.org/> . ex:rf ex:p "v1" . ex:rf ex:q 5 .'
        code, _, _ = req(f"{server}/data?graph={self.G2}", "PUT", ttl, "text/turtle")
        assert code == 200
        q = (
            "SELECT ?s ?o WHERE { GRAPH <http://example.org/rfgraph>"
            ' { ?s <http://example.org/p> ?o } }'
        ).encode()

        code, ct, body = req(f"{server}/query", "POST", q,
                             "application/sparql-query",
                             accept="application/sparql-results+xml")
        assert code == 200 and ct.startswith("application/sparql-results+xml")
        assert '<sparql xmlns="http://www.w3.org/2005/sparql-results#">' in body
        assert "<uri>http://example.org/rf</uri>" in body
        assert "<literal>v1</literal>" in body

        code, ct, body = req(f"{server}/query", "POST", q,
                             "application/sparql-query", accept="text/csv")
        assert code == 200 and ct.startswith("text/csv")
        assert body.splitlines()[0] == "s,o"
        assert "http://example.org/rf,v1" in body

        code, ct, body = req(f"{server}/query", "POST", q,
                             "application/sparql-query",
                             accept="text/tab-separated-values")
        assert code == 200 and ct.startswith("text/tab-separated-values")
        assert body.splitlines()[0] == "?s\t?o"
        assert "<http://example.org/rf>\t\"v1\"" in body

        # typed literal keeps its datatype tag in TSV
        q2 = (
            "SELECT ?o WHERE { GRAPH <http://example.org/rfgraph>"
            ' { ?s <http://example.org/q> ?o } }'
        ).encode()
        code, ct, body = req(f"{server}/query", "POST", q2,
                             "application/sparql-query",
                             accept="text/tab-separated-values")
        assert "integer" in body and body.splitlines()[0] == "?o"

        # unknown accept falls back to JSON
        code, ct, body = req(f"{server}/query", "POST", q,
                             "application/sparql-query", accept="application/weird")
        assert code == 200 and ct.startswith("application/sparql-results+json")
        json.loads(body)

    def test_ask_results_formats(self, server):
        q = b"ASK { GRAPH <http://example.org/rfgraph> { ?s ?p ?o } }"
        code, ct, body = req(f"{server}/query", "POST", q,
                             "application/sparql-query",
                             accept="application/sparql-results+xml")
        assert code == 200 and "<boolean>true</boolean>" in body
        code, ct, body = req(f"{server}/query", "POST", q,
                             "application/sparql-query", accept="text/csv")
        assert code == 200 and body.strip() == "true"
        req(f"{server}/data?graph={self.G2}", "DELETE")

    def test_construct_honors_accept(self, server):
        q = (
            b"CONSTRUCT { ?s ?p ?o } WHERE { GRAPH <http://example.org/cngraph> { ?s ?p ?o } }"
        )
        code, ct, body = req(
            f"{server}/query", "POST", q, "application/sparql-query", accept="text/turtle"
        )
        assert code == 200 and ct.startswith("text/turtle")
        assert "<http://example.org/cn>" in body
        # clean up the named graph for any later class using the fixture
        req(f"{server}/data?graph={self.G}", "DELETE")


class TestQueryEndpoint:
    def test_select_get_and_post(self, server):
        q = "SELECT ?s ?o WHERE { ?s <http://example.org/p> ?o }"
        code, ct, body = req(f"{server}/query?query={quote(q, safe='')}")
        assert code == 200 and ct.startswith("application/sparql-results+json")
        doc = json.loads(body)
        assert doc["head"]["vars"] == ["s", "o"]
        assert len(doc["results"]["bindings"]) == 1
        b = doc["results"]["bindings"][0]
        assert b["s"]["type"] == "uri" and b["s"]["value"] == EX + "only"
        # POST raw body form
        code, _, body2 = req(f"{server}/query", "POST", q.encode(), "application/sparql-query")
        assert code == 200 and json.loads(body2) == doc

    def test_ask_and_construct(self, server):
        code, _, body = req(
            f"{server}/query", "POST",
            b"ASK { <http://example.org/only> ?p ?o }", "application/sparql-query",
        )
        assert json.loads(body)["boolean"] is True
        code, ct, body = req(
            f"{server}/query", "POST",
            b"CONSTRUCT { ?s <http://example.org/made> ?o } WHERE { ?s <http://example.org/p> ?o }",
            "application/sparql-query",
        )
        assert code == 200 and ct.startswith("application/n-quads")
        assert "<http://example.org/made>" in body

    def test_protocol_dataset_params(self, server):
        # SPARQL 1.1 Protocol §2.1.4: default-graph-uri scopes the query
        # dataset (and overrides any FROM clause in the query text)
        g = EX + "proto-g"
        nt = b'<http://example.org/pd> <http://example.org/p> "in-g" .'
        code, _, _ = req(
            f"{server}/data?graph={quote(g, safe='')}", "PUT", nt,
            "application/n-triples",
        )
        assert code == 200
        q = "SELECT ?o WHERE { <http://example.org/pd> <http://example.org/p> ?o }"
        # without the param the triple lives in a named graph -> no match
        code, _, body = req(f"{server}/query?query={quote(q, safe='')}")
        assert code == 200 and json.loads(body)["results"]["bindings"] == []
        # with it, that named graph IS the query's default graph
        code, _, body = req(
            f"{server}/query?query={quote(q, safe='')}"
            f"&default-graph-uri={quote(g, safe='')}"
        )
        assert code == 200
        vals = [b["o"]["value"] for b in json.loads(body)["results"]["bindings"]]
        assert vals == ["in-g"]
        # FROM clause in the query text works over HTTP too
        q_from = (
            f"SELECT ?o FROM <{g}> WHERE "
            "{ <http://example.org/pd> <http://example.org/p> ?o }"
        )
        code, _, body = req(f"{server}/query?query={quote(q_from, safe='')}")
        assert code == 200
        vals = [b["o"]["value"] for b in json.loads(body)["results"]["bindings"]]
        assert vals == ["in-g"]

    def test_update_using_graph_param(self, server):
        # §2.2.3: using-graph-uri scopes the update's WHERE dataset
        g = EX + "using-g"
        nt = b'<http://example.org/us> <http://example.org/p> "scoped" .'
        code, _, _ = req(
            f"{server}/data?graph={quote(g, safe='')}", "POST", nt,
            "application/n-triples",
        )
        assert code == 200
        u = (
            "PREFIX ex: <http://example.org/> "
            "INSERT { ?s ex:fromg ?o } WHERE { ?s ex:p ?o }"
        )
        code, _, _ = req(
            f"{server}/update?using-graph-uri={quote(g, safe='')}",
            "POST", u.encode(), "application/sparql-update",
        )
        assert code == 200
        q = "SELECT ?o WHERE { <http://example.org/us> <http://example.org/fromg> ?o }"
        code, _, body = req(f"{server}/query?query={quote(q, safe='')}")
        vals = [b["o"]["value"] for b in json.loads(body)["results"]["bindings"]]
        assert vals == ["scoped"]
        # combined with USING in the text -> 400 per the protocol
        bad = (
            "PREFIX ex: <http://example.org/> DELETE { ?s ?p ?o } "
            f"USING <{g}> WHERE {{ ?s ?p ?o }}"
        )
        code, _, _ = req(
            f"{server}/update?using-graph-uri={quote(g, safe='')}",
            "POST", bad.encode(), "application/sparql-update",
        )
        assert code == 400

    def test_bad_query_is_400(self, server):
        code, _, _ = req(f"{server}/query", "POST", b"SELECT WHERE garbage", "application/sparql-query")
        assert code == 400

    def test_select_projecting_quad_column_names_is_json(self, server):
        # serialization must branch on the parsed query form: a SELECT
        # whose variables happen to be named like the quad columns must
        # still come back as SPARQL results JSON, not N-Quads
        q = (
            "SELECT ?graph ?subject ?predicate ?object_kind ?object_value "
            "?object_datatype ?object_lang WHERE { "
            "?subject ?predicate ?object_value . "
            'BIND("g" AS ?graph) BIND("k" AS ?object_kind) '
            'BIND("d" AS ?object_datatype) BIND("l" AS ?object_lang) }'
        )
        code, ct, body = req(f"{server}/query", "POST", q.encode(), "application/sparql-query")
        assert code == 200 and ct.startswith("application/sparql-results+json"), body
        doc = json.loads(body)
        assert "subject" in doc["head"]["vars"]


class TestUpdateAndPatch:
    def test_update_insert_data(self, server):
        u = 'INSERT DATA { <http://example.org/u1> <http://example.org/p> "from-update" }'
        code, _, _ = req(f"{server}/update", "POST", u.encode(), "application/sparql-update")
        assert code == 200
        q = 'ASK { ?s ?p "from-update" }'
        _, _, body = req(f"{server}/query", "POST", q.encode(), "application/sparql-query")
        assert json.loads(body)["boolean"] is True

    def test_patch_add_and_delete(self, server):
        patch = (
            b"TX .\n"
            b'A <http://example.org/px> <http://example.org/p> "x" .\n'
            b"TC .\n"
        )
        code, _, body = req(f"{server}/patch", "PATCH", patch, "application/rdf-patch")
        assert code == 200 and json.loads(body)["adds"] == 1
        dpatch = (
            b"TX .\n"
            b'D <http://example.org/px> <http://example.org/p> "x" .\n'
            b"TC .\n"
        )
        # POST fallback for PATCH-less clients
        code, _, body = req(f"{server}/patch", "POST", dpatch, "application/rdf-patch")
        assert code == 200 and json.loads(body)["deletes"] == 1
        _, _, body = req(
            f"{server}/query", "POST",
            b'ASK { <http://example.org/px> ?p ?o }', "application/sparql-query",
        )
        assert json.loads(body)["boolean"] is False

    def test_acceptance_count_over_http(self, server):
        # the reference's own acceptance query, over HTTP, end of pipeline
        q = "SELECT (count(*) AS ?C) { { ?s ?p ?o } UNION { GRAPH ?g { ?s ?p ?o } } }"
        code, _, body = req(f"{server}/query", "POST", q.encode(), "application/sparql-query")
        assert code == 200
        n = int(json.loads(body)["results"]["bindings"][0]["C"]["value"])
        assert n >= 2


class TestServiceFederation:
    """SERVICE <endpoint> { ... }: ship a sub-pattern to a remote SPARQL
    endpoint (here: a second SparqlHttpServer) and join the bindings."""

    @pytest.fixture(scope="class")
    def remote(self, spark, tmp_path_factory):
        from jena_fuseki_kafka_spark.model import QUAD_SCHEMA

        store = QuadStore(str(tmp_path_factory.mktemp("svc") / "quads"))
        rows = [
            ("", EX + "alice", EX + "city", "literal", "Berlin", None, None),
            ("", EX + "bob", EX + "city", "literal", "Paris", None, None),
        ]
        store.commit(spark, adds=spark.createDataFrame(rows, QUAD_SCHEMA))
        srv = SparqlHttpServer(spark, store, dataset="remote")
        port = srv.start()
        yield f"http://127.0.0.1:{port}/remote/query"
        srv.stop()

    def _local_engine(self, spark):
        from jena_fuseki_kafka_spark.model import QUAD_SCHEMA
        from jena_fuseki_kafka_spark.sparql import SparqlEngine

        rows = [
            ("", EX + "alice", EX + "age", "literal", "30", None, None),
            ("", EX + "carol", EX + "age", "literal", "41", None, None),
        ]
        return SparqlEngine(spark.createDataFrame(rows, QUAD_SCHEMA))

    def test_service_join(self, spark, remote):
        eng = self._local_engine(spark)
        df = eng.select_values(
            "PREFIX ex: <http://example.org/> "
            "SELECT ?s ?age ?city WHERE { ?s ex:age ?age . "
            f"SERVICE <{remote}> {{ ?s ex:city ?city }} }}"
        )
        rows = {(r.s, r.age, r.city) for r in df.collect()}
        # only alice exists on both sides
        assert rows == {(EX + "alice", "30", "Berlin")}

    def test_service_only(self, spark, remote):
        eng = self._local_engine(spark)
        df = eng.select_values(
            "PREFIX ex: <http://example.org/> "
            f"SELECT ?s ?city WHERE {{ SERVICE <{remote}> {{ ?s ex:city ?city }} }}"
        )
        assert {r.city for r in df.collect()} == {"Berlin", "Paris"}

    def test_service_ships_lang_literal_without_space(self, spark, remote):
        # "Berlin"@de must re-serialize with the LANGTAG attached — some
        # endpoints reject '"Berlin" @de' (whitespace before LANGTAG)
        from jena_fuseki_kafka_spark.sparql.parser import SparqlParser
        from jena_fuseki_kafka_spark.sparql.ast import ServicePattern

        q = (
            "PREFIX ex: <http://example.org/> SELECT ?s WHERE { "
            f'SERVICE <{remote}> {{ ?s ex:city "x"@en . ?s ex:n "5"^^ex:int }} }}'
        )
        parsed = SparqlParser(q).parse()

        def find_service(node):
            if isinstance(node, ServicePattern):
                return node
            for attr in ("left", "right", "pattern"):
                child = getattr(node, attr, None)
                if child is not None:
                    hit = find_service(child)
                    if hit:
                        return hit
            return None

        svc = find_service(parsed.pattern)
        assert svc is not None
        assert '"x"@en' in svc.raw, svc.raw
        assert '"5"^^ex:int' in svc.raw, svc.raw

    def test_service_join_on_lang_tagged_literal(self, spark, remote, tmp_path):
        # e2e: the shipped pattern contains a lang-tagged literal and the
        # remote endpoint (a second server instance) must accept it
        from jena_fuseki_kafka_spark.model import QUAD_SCHEMA
        from jena_fuseki_kafka_spark.sparql import SparqlEngine

        rows = [("", EX + "alice", EX + "age", "literal", "30", None, None)]
        eng = SparqlEngine(spark.createDataFrame(rows, QUAD_SCHEMA))
        df = eng.select_values(
            "PREFIX ex: <http://example.org/> "
            "SELECT ?s ?age WHERE { ?s ex:age ?age . "
            f'SERVICE <{remote}> {{ ?s ex:city "Berlin" }} }}'
        )
        assert {r.s for r in df.collect()} == {EX + "alice"}

    def test_service_silent_failure_is_identity(self, spark):
        eng = self._local_engine(spark)
        df = eng.select_values(
            "PREFIX ex: <http://example.org/> "
            "SELECT ?s ?age WHERE { ?s ex:age ?age . "
            "SERVICE SILENT <http://127.0.0.1:9/does-not-exist> { ?s ex:city ?c } }"
        )
        assert df.count() == 2  # local bindings survive untouched

    def test_service_failure_raises_without_silent(self, spark):
        eng = self._local_engine(spark)
        with pytest.raises(Exception, match="SERVICE"):
            eng.select_values(
                "PREFIX ex: <http://example.org/> "
                "SELECT ?s WHERE { SERVICE <http://127.0.0.1:9/nope> { ?s ex:p ?o } }"
            ).collect()


class TestMultiDataset:
    def test_two_datasets_isolated(self, spark, tmp_path_factory):
        base_dir = tmp_path_factory.mktemp("multi")
        s1 = QuadStore(str(base_dir / "q1"))
        s2 = QuadStore(str(base_dir / "q2"))
        srv = SparqlHttpServer(spark, stores={"ds1": s1, "ds2": s2})
        port = srv.start()
        try:
            root = f"http://127.0.0.1:{port}"
            req(f"{root}/ds1/data?default", "PUT",
                b"<http://example.org/a> <http://example.org/p> \"one\" .",
                "application/n-triples")
            req(f"{root}/ds2/data?default", "PUT",
                b"<http://example.org/b> <http://example.org/p> \"two\" .",
                "application/n-triples")
            q = b"SELECT ?o WHERE { ?s <http://example.org/p> ?o }"
            b1 = json.loads(req(f"{root}/ds1/query", "POST", q, "application/sparql-query")[2])
            b2 = json.loads(req(f"{root}/ds2/query", "POST", q, "application/sparql-query")[2])
            assert [x["o"]["value"] for x in b1["results"]["bindings"]] == ["one"]
            assert [x["o"]["value"] for x in b2["results"]["bindings"]] == ["two"]
            code, _, _ = req(f"{root}/nope/query", "POST", q, "application/sparql-query")
            assert code == 404
        finally:
            srv.stop()


class TestStreamingServe:
    """Store-sized exports must stream: the serve path never collect()s a
    result onto the driver (it iterates partitions via toLocalIterator and
    writes chunked), and triple-only formats refuse whole-dataset reads
    rather than silently flattening named graphs."""

    G = quote(EX + "streamgraph", safe="")

    def test_serve_path_never_collects(self, server, monkeypatch):
        ttl = b'@prefix ex: <http://example.org/> . ex:sg1 ex:p "a" . ex:sg2 ex:p "b" .'
        code, _, _ = req(f"{server}/data?graph={self.G}", "PUT", ttl, "text/turtle")
        assert code == 200

        from pyspark.sql import DataFrame

        calls = []
        orig = DataFrame.collect

        def tracking(self_df):
            calls.append(1)
            return orig(self_df)

        monkeypatch.setattr(DataFrame, "collect", tracking)
        # GSP GET (nquads + turtle), SELECT, CONSTRUCT — all streamed
        code, _, body = req(f"{server}/data?graph={self.G}")
        assert code == 200 and body.count("\n") == 2
        code, _, body = req(f"{server}/data?graph={self.G}", accept="text/turtle")
        assert code == 200 and "<http://example.org/sg1>" in body
        q = (
            "SELECT ?s ?o WHERE { GRAPH <http://example.org/streamgraph>"
            " { ?s <http://example.org/p> ?o } }"
        ).encode()
        code, _, body = req(f"{server}/query", "POST", q, "application/sparql-query")
        assert code == 200 and len(json.loads(body)["results"]["bindings"]) == 2
        c = (
            "CONSTRUCT { ?s <http://example.org/made> ?o } WHERE {"
            " GRAPH <http://example.org/streamgraph>"
            " { ?s <http://example.org/p> ?o } }"
        ).encode()
        code, _, body = req(f"{server}/query", "POST", c, "application/sparql-query")
        assert code == 200 and body.count("made") == 2
        assert calls == [], f"serve path collect()ed {len(calls)} time(s)"

    def test_responses_are_chunked(self, server):
        r = urllib.request.Request(f"{server}/data?graph={self.G}")
        with urllib.request.urlopen(r) as resp:
            assert resp.headers.get("Transfer-Encoding") == "chunked"
            assert resp.headers.get("Content-Length") is None

    def test_whole_dataset_triple_only_is_406(self, server):
        for accept in ("text/turtle", "application/rdf+xml"):
            code, _, body = req(f"{server}/data", accept=accept)
            assert code == 406, (accept, code)
            assert "quad" in body
        # quad-capable formats serve the whole dataset fine
        for accept in (None, "application/trig", "application/ld+json"):
            code, _, _ = req(f"{server}/data", accept=accept)
            assert code == 200, (accept, code)
        # and a named graph still serializes to turtle
        code, _, _ = req(f"{server}/data?graph={self.G}", accept="text/turtle")
        assert code == 200

    def test_whole_dataset_wildcard_prefers_trig(self, server):
        # */* on a multi-graph dataset serves TriG (Fuseki's dataset
        # default), never 406 — the friendly path for browsers/curl -H
        for accept in ("*/*", "application/*", "text/html, */*;q=0.1"):
            code, ct, _ = req(f"{server}/data", accept=accept)
            assert code == 200 and ct.startswith("application/trig"), (accept, ct)
        # a lossy preference with a wildcard fallback picks TriG too:
        # the server chooses among representations it can actually provide
        code, ct, _ = req(f"{server}/data", accept="text/turtle, */*;q=0.1")
        assert code == 200 and ct.startswith("application/trig")
        # mixed lossy + explicit quad format: the quad format wins
        code, ct, _ = req(
            f"{server}/data", accept="text/turtle, application/ld+json;q=0.5"
        )
        assert code == 200 and ct.startswith("application/ld+json")
        # no Accept header keeps the N-Quads default
        code, ct, _ = req(f"{server}/data")
        assert code == 200 and ct.startswith("application/n-quads")

    def test_results_negotiation_honors_q_values(self, server):
        q = b"SELECT ?o WHERE { ?s <http://example.org/p> ?o }"
        # ADVICE example: low-q csv listed first must not beat high-q xml
        code, ct, _ = req(
            f"{server}/query", "POST", q, "application/sparql-query",
            accept="text/csv;q=0.1, application/sparql-results+xml;q=0.9",
        )
        assert code == 200 and ct.startswith("application/sparql-results+xml")


# ---------------------------------------------------- bounded-collect path
def test_bounded_result_classifier():
    """The collect-vs-stream decision is made from the QUERY SHAPE alone:
    only provably-small results (ungrouped all-aggregate projection, or an
    explicit LIMIT at or under the bound) may take the collect path."""
    from jena_fuseki_kafka_spark.server import BOUNDED_COLLECT_ROWS, _bounded_result
    from jena_fuseki_kafka_spark.sparql.parser import parse_sparql

    bounded = [
        "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }",
        "SELECT (COUNT(*) AS ?n) (MAX(?o) AS ?m) WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { ?s ?p ?o } LIMIT 10",
        f"SELECT ?s WHERE {{ ?s ?p ?o }} LIMIT {BOUNDED_COLLECT_ROWS}",
    ]
    unbounded = [
        "SELECT ?s WHERE { ?s ?p ?o }",
        "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s",
        f"SELECT ?s WHERE {{ ?s ?p ?o }} LIMIT {BOUNDED_COLLECT_ROWS + 1}",
        "ASK { ?s ?p ?o }",
    ]
    for q in bounded:
        assert _bounded_result(parse_sparql(q)), q
    for q in unbounded:
        assert not _bounded_result(parse_sparql(q)), q


def test_bounded_and_streamed_serializations_identical(server):
    """The bounded collect path must serialize byte-identically to the
    toLocalIterator streaming path for the same result."""
    # seed a couple of rows through the public surface
    req(
        f"{server}/update",
        "POST",
        f'INSERT DATA {{ <{EX}bs1> <{EX}bp> "bv1" . <{EX}bs2> <{EX}bp> "bv2" }}'.encode(),
        "application/sparql-update",
    )
    q = f"SELECT ?s ?o WHERE {{ ?s <{EX}bp> ?o }} ORDER BY ?s"
    status, ct, body = req(f"{server}/query?query=" + quote(q, safe=""))
    assert status == 200
    streamed = json.loads(body)  # LIMIT-less: streaming path
    status, ct, body = req(f"{server}/query?query=" + quote(q + " LIMIT 10", safe=""))
    assert status == 200
    collected = json.loads(body)  # LIMIT 10: bounded collect path
    assert streamed["results"]["bindings"] == collected["results"]["bindings"]
    assert len(streamed["results"]["bindings"]) == 2
