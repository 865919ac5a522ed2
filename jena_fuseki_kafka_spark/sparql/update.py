"""SPARQL 1.1 Update + Graph Store Protocol over the QuadStore.

The reference serves these via Fuseki HTTP endpoints (fuseki:update and
fuseki:gsp-rw wired in config-connector.ttl:14-17) while deliberately
rejecting updates over the Kafka stream (CHANGELOG.md:177-181 — effects
would depend on receiver state).  We keep that split: this module is the
HTTP-side mutation surface, applied directly to the store in one commit per
update request; the Kafka/streaming path accepts only data + patches.

Supported update forms:
  INSERT DATA { quads }         DELETE DATA { quads }
  DELETE WHERE { pattern }
  DELETE { tmpl } INSERT { tmpl } WHERE { pattern }   (either part optional)
  CLEAR GRAPH <g> | DEFAULT | NAMED | ALL             DROP = CLEAR
  multiple operations separated by ';' apply atomically (one commit) with
  SPARQL 1.1 sequential semantics: each operation evaluates against the
  accumulated logical state (store minus pending deletes plus pending
  adds), so 'INSERT DATA { q }; DELETE DATA { q }' leaves q absent and a
  DELETE WHERE sees quads inserted earlier in the same request

Graph Store Protocol (get/put/post/delete on a graph) maps to
filter/overwrite/append/delete on the graph column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..model import DEFAULT_GRAPH, QUAD_COLS, QUAD_SCHEMA, RdfParseError
from ..store import QuadStore
from ..store.quadstore import _anti_join_quads
from .ast import BGP
from .parser import SparqlParser
from .translate import Translator


class _UpdateParser(SparqlParser):
    """Extends the query parser with update-request grammar."""

    def parse_update(self) -> list[tuple]:
        ops: list[tuple] = []
        while self.peek_kw("prefix") or self.peek_kw("base"):
            kw = self.next().lower()
            if kw == "prefix":
                pname = self.next()
                self.prefixes[pname[:-1]] = self._iri_value(self.next())
            else:
                self.base = self._iri_value(self.next())
        while self.peek() is not None:
            t = self.peek().lower()
            if t == "insert":
                self.next()
                if self.peek_kw("data"):
                    self.next()
                    ops.append(("insert_data", self._quad_data()))
                else:
                    tmpl = self._quad_template()
                    self.expect("where")
                    ops.append(("modify", None, tmpl, self._group_graph_pattern()))
            elif t == "delete":
                self.next()
                if self.peek_kw("data"):
                    self.next()
                    data = self._quad_data()
                    for s, p, o, g in data:
                        if s[0] == "var" or p[0] == "var" or o[0] == "var":
                            raise RdfParseError("DELETE DATA cannot contain variables")
                    ops.append(("delete_data", data))
                elif self.peek_kw("where"):
                    self.next()
                    pattern = self._group_graph_pattern()
                    if not isinstance(pattern, BGP):
                        raise RdfParseError("DELETE WHERE requires a plain BGP")
                    ops.append(("modify", pattern.triples, None, pattern))
                else:
                    del_tmpl = self._quad_template()
                    ins_tmpl = None
                    if self.peek_kw("insert"):
                        self.next()
                        ins_tmpl = self._quad_template()
                    self.expect("where")
                    ops.append(("modify", del_tmpl, ins_tmpl, self._group_graph_pattern()))
            elif t in ("clear", "drop"):
                self.next()
                if self.peek_kw("silent"):
                    self.next()
                target = self.next().lower()
                if target == "graph":
                    g = self._var_or_iri()
                    if g[0] != "iri":
                        raise RdfParseError("CLEAR GRAPH requires an IRI")
                    ops.append(("clear", g[1]))
                elif target in ("default", "named", "all"):
                    ops.append(("clear", target))
                else:
                    raise RdfParseError(f"bad CLEAR target {target!r}")
            elif t == ";":
                self.next()
            else:
                raise RdfParseError(f"unsupported update operation {t!r}")
        return ops

    def _quad_data(self) -> list:
        return self._quad_template()

    def _quad_template(self) -> list:
        """{ triples... GRAPH <g> { triples... } ... }"""
        self.expect("{")
        out: list = []
        while self.peek() != "}":
            if self.peek_kw("graph"):
                self.next()
                g = self._var_or_iri()
                self.expect("{")
                while self.peek() != "}":
                    out.extend((s, p, o, g) for s, p, o, _ in self._triples_same_subject(None))
                    if self.peek() == ".":
                        self.next()
                self.expect("}")
            else:
                out.extend(self._triples_same_subject(None))
                if self.peek() == ".":
                    self.next()
        self.expect("}")
        return out


class UpdateEngine:
    def __init__(self, spark: SparkSession, store: QuadStore):
        self.spark = spark
        self.store = store

    # ------------------------------------------------------------ update
    def update(self, text: str, txn_id: str | None = None) -> dict:
        """Apply a SPARQL Update request atomically (one store commit),
        sequentially within the request: every operation evaluates against
        ``base MINUS pending_deletes UNION pending_adds``.  The pending
        sets are net-effect maintained (inserting a quad removes it from
        pending deletes and vice versa), so no quad ever lands in both and
        the final commit's delete-then-add application is order-safe."""
        ops = _UpdateParser(text).parse_update()
        base = self.store.read(self.spark)
        pending_adds: DataFrame | None = None
        pending_dels: DataFrame | None = None

        def view() -> DataFrame:
            v = base
            if pending_dels is not None:
                v = _anti_join_quads(v, pending_dels, broadcast_right=True)
            if pending_adds is not None:
                v = v.unionByName(pending_adds).dropDuplicates(QUAD_COLS)
            return v

        def do_insert(df: DataFrame) -> None:
            nonlocal pending_adds, pending_dels
            df = df.select(*QUAD_COLS)
            if pending_dels is not None:
                pending_dels = _anti_join_quads(pending_dels, df, broadcast_right=True)
            pending_adds = (
                df
                if pending_adds is None
                else pending_adds.unionByName(df).dropDuplicates(QUAD_COLS)
            )

        def do_delete(df: DataFrame) -> None:
            nonlocal pending_adds, pending_dels
            df = df.select(*QUAD_COLS)
            if pending_adds is not None:
                pending_adds = _anti_join_quads(pending_adds, df, broadcast_right=True)
            pending_dels = (
                df
                if pending_dels is None
                else pending_dels.unionByName(df).dropDuplicates(QUAD_COLS)
            )

        for op in ops:
            kind = op[0]
            if kind == "insert_data":
                do_insert(self._const_quads(op[1]))
            elif kind == "delete_data":
                do_delete(self._const_quads(op[1]))
            elif kind == "clear":
                target = op[1]
                if target == "default":
                    cond = F.col("graph") == DEFAULT_GRAPH
                elif target == "named":
                    cond = F.col("graph") != DEFAULT_GRAPH
                elif target == "all":
                    cond = F.lit(True)
                else:
                    cond = F.col("graph") == target
                do_delete(view().filter(cond))
            elif kind == "modify":
                del_tmpl, ins_tmpl, pattern = op[1], op[2], op[3]
                # translate the WHERE pattern once against the accumulated
                # state, instantiate both templates from the same bindings
                translator = Translator(view())
                df = translator._pattern(translator._rewrite_exists(pattern), graph=None)
                # materialize the (request-sized) bindings once: both
                # templates instantiate from it, and later ops' anti-joins
                # would otherwise re-evaluate the whole pattern lineage
                if del_tmpl and ins_tmpl:
                    df = df.localCheckpoint(eager=True)
                if del_tmpl:
                    do_delete(self._instantiate(df, del_tmpl))
                if ins_tmpl:
                    do_insert(self._instantiate(df, ins_tmpl))
        version = self.store.commit(
            self.spark, adds=pending_adds, deletes=pending_dels, txn_id=txn_id
        )
        return {"version": version}

    def _const_quads(self, quads: list) -> DataFrame:
        rows = []
        for s, p, o, g in quads:
            graph = g[1] if g is not None else DEFAULT_GRAPH
            if o[0] == "literal":
                rows.append((graph, s[1], p[1], "literal", o[1], o[2], o[3]))
            else:
                rows.append((graph, s[1], p[1], o[0], o[1], None, None))
        return self.spark.createDataFrame(rows, QUAD_SCHEMA)

    def _instantiate(self, bindings: DataFrame, template: list) -> DataFrame:
        """Project pattern bindings through a quad template (CONSTRUCT-style)."""
        from functools import reduce

        parts = []
        for s, p, o, g in template:
            def tcol(t, role):
                if t[0] == "var":
                    c = bindings[t[1]]
                    return c["value"] if role != "object" else c
                if role == "object" and t[0] == "literal":
                    return F.struct(
                        F.lit("literal").alias("kind"),
                        F.lit(t[1]).alias("value"),
                        F.lit(t[2] or "").alias("datatype"),
                        F.lit(t[3] or "").alias("lang"),
                    )
                if role == "object":
                    return F.struct(
                        F.lit(t[0]).alias("kind"),
                        F.lit(t[1]).alias("value"),
                        F.lit("").alias("datatype"),
                        F.lit("").alias("lang"),
                    )
                return F.lit(t[1])

            obj = tcol(o, "object")
            parts.append(
                bindings.select(
                    (tcol(g, "graph") if g is not None else F.lit(DEFAULT_GRAPH)).alias("graph"),
                    tcol(s, "subject").alias("subject"),
                    tcol(p, "predicate").alias("predicate"),
                    obj["kind"].alias("object_kind"),
                    obj["value"].alias("object_value"),
                    F.when(obj["datatype"] == "", None).otherwise(obj["datatype"]).alias("object_datatype"),
                    F.when(obj["lang"] == "", None).otherwise(obj["lang"]).alias("object_lang"),
                )
            )
        return reduce(lambda a, b: a.unionByName(b), parts).dropDuplicates()

    # ------------------------------------------------------------ GSP
    def gsp_get(self, graph: str | None = None) -> DataFrame:
        """GET a graph (None = default graph)."""
        g = DEFAULT_GRAPH if graph is None else graph
        return self.store.read(self.spark).filter(F.col("graph") == g)

    def gsp_put(self, quads: DataFrame, graph: str | None = None, txn_id=None) -> int:
        """PUT: replace the graph's contents."""
        g = DEFAULT_GRAPH if graph is None else graph
        current = self.store.read(self.spark).filter(F.col("graph") == g)
        incoming = quads.select(*QUAD_COLS).withColumn("graph", F.lit(g))
        return self.store.commit(self.spark, adds=incoming, deletes=current, txn_id=txn_id)

    def gsp_post(self, quads: DataFrame, graph: str | None = None, txn_id=None) -> int:
        """POST: merge (append with set semantics)."""
        g = DEFAULT_GRAPH if graph is None else graph
        incoming = quads.select(*QUAD_COLS).withColumn("graph", F.lit(g))
        return self.store.commit(self.spark, adds=incoming, txn_id=txn_id)

    def gsp_delete(self, graph: str | None = None, txn_id=None) -> int:
        """DELETE: drop the graph's contents."""
        g = DEFAULT_GRAPH if graph is None else graph
        current = self.store.read(self.spark).filter(F.col("graph") == g)
        return self.store.commit(self.spark, deletes=current, txn_id=txn_id)
