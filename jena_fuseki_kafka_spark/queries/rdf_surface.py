"""RDF/quad query surface exercised through the correctness gate.

These queries materialize the ``events`` table as RDF quads (the same
row->quads mapping a Graph Store Protocol PUT would produce — each event
becomes a subject with one quad per column, partitioned into named graphs
by event_type) and then run the reference's own acceptance patterns over
the quad relation:

- r01: the exact count query the reference's e2e tests poll
  (DockerTestConfigFK.java:394:
  ``SELECT (count(*) AS ?C) { { ?s ?p ?o } UNION { GRAPH ?g { ?s ?p ?o } } }``)
- r02: a BGP join (two triple patterns sharing a subject variable) +
  FILTER + aggregate — SPARQL algebra over the quad table as DataFrame ops
  (SURVEY.md §2B mapping rows: BGP/join/FILTER/GROUP BY)
- r03: GRAPH quantification — per-named-graph counts (GSP read surface)

The quads here are constructed declaratively (select/union, no parser) so
the correctness gate exercises the quad *query* layer; the byte-level
parsers are exercised by the ingest test suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..model import DEFAULT_GRAPH, KIND_IRI, KIND_LITERAL, XSD, XSD_INTEGER
from . import finite_spark, load, query

EX = "http://example.org/"


def xsd_double_lexical(col):
    """Render a double column as its XSD canonical lexical form: Spark's
    native cast spells non-finite values "Infinity"/"-Infinity" where
    xsd:double's lexical space has "INF"/"-INF"/"NaN" (XSD 1.1 pt.2
    par.3.3.5) — the form the engine's try_cast re-reads and any RDF
    consumer expects.  Finite values keep Spark's rendering (already
    digit-identical with the oracles)."""
    return (
        F.when(F.isnan(col), F.lit("NaN"))
        .when(col == F.lit(float("inf")), F.lit("INF"))
        .when(col == F.lit(float("-inf")), F.lit("-INF"))
        .otherwise(col.cast("string"))
    )


def events_to_quads(ev: DataFrame) -> DataFrame:
    """Map event rows to quads: subject = event IRI; one quad per column;
    named graph per event_type (default graph for the type quad itself).

    Single narrow transform + union — no shuffle at all: each union branch
    is a projection of the same scan, and Spark unions are no-ops at the
    partition level.

    RDF has no nulls: a quad whose graph, subject or object would be NULL
    (a NULL event column on real data) is DROPPED, the same malformed-row
    DLQ philosophy the ingest path applies (ingest/projector.py) — never
    emitted with a NULL component, which would fall out of GRAPH patterns
    while grouping as a NULL key elsewhere, incoherently.  The gate
    oracles mirror the drop with explicit IS NOT NULL predicates.  The
    filter sits on the union, so Catalyst pushes it into each branch's
    projection — still a single pass, no shuffle."""
    subj = F.concat(F.lit(EX + "event/"), F.col("event_id").cast("string"))
    graph = F.concat(F.lit(EX + "graph/"), F.col("event_type"))

    def quad(pred: str, value, kind: str, dt, g):
        return ev.select(
            g.alias("graph"),
            subj.alias("subject"),
            F.lit(EX + pred).alias("predicate"),
            F.lit(kind).alias("object_kind"),
            value.cast("string").alias("object_value"),
            (F.lit(dt) if dt else F.lit(None).cast("string")).alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
        )

    parts = [
        quad("type", F.col("event_type"), KIND_LITERAL, None, F.lit(DEFAULT_GRAPH)),
        quad("user", F.concat(F.lit(EX + "user/"), F.col("user_id").cast("string")), KIND_IRI, None, graph),
        quad("value", xsd_double_lexical(F.col("value")), KIND_LITERAL, XSD + "double", graph),
        quad("ts", F.col("ts"), KIND_LITERAL, XSD + "dateTime", graph),
        quad("id", F.col("event_id"), KIND_LITERAL, XSD_INTEGER, graph),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # object_datatype/object_lang are legitimately NULL (plain literals);
    # the three term positions are not.
    return out.filter(
        F.col("graph").isNotNull()
        & F.col("subject").isNotNull()
        & F.col("object_value").isNotNull()
    )


@query(
    "r01_sparql_acceptance_count",
    oracle="""
    SELECT CAST(
        2 * COUNT(CASE WHEN event_id IS NOT NULL
                        AND event_type IS NOT NULL THEN 1 END)
      + COUNT(CASE WHEN event_id IS NOT NULL AND event_type IS NOT NULL
                    AND user_id IS NOT NULL THEN 1 END)
      + COUNT(CASE WHEN event_id IS NOT NULL AND event_type IS NOT NULL
                    AND value IS NOT NULL THEN 1 END)
      + COUNT(CASE WHEN event_id IS NOT NULL AND event_type IS NOT NULL
                    AND ts IS NOT NULL THEN 1 END)
      AS BIGINT) AS C FROM events
    """,
)
def r01(spark, sf_dir):
    """The reference's acceptance query: count over default graph UNION all
    named graphs.  1 default-graph quad + 4 named-graph quads per fully
    populated event; events_to_quads drops any quad with a NULL component
    (RDF has no nulls), so the oracle counts per-quad eligibility — the
    type and id quads need (event_id, event_type), the user/value/ts
    quads additionally need their own column."""
    quads = events_to_quads(load(spark, sf_dir, "events"))
    # { ?s ?p ?o } UNION { GRAPH ?g { ?s ?p ?o } } partitions the quad
    # relation exactly: events_to_quads drops NULL graphs, so every quad
    # satisfies graph = DEFAULT_GRAPH xor graph != DEFAULT_GRAPH and the
    # union's count is the relation's count.  The r14 form filtered the
    # two sides separately, and because the named-graph IRI is
    # concat('…graph/', event_type) — data-dependent, so neither graph
    # comparison constant-folds — Catalyst kept 9 of the 10 union-branch
    # scans alive (r15 plan audit); counting the partition-free relation
    # prunes that to the 5 structural branches, one scan per quad shape.
    return quads.agg(F.count("*").alias("C"))


@query(
    "r02_bgp_join_filter",
    oracle="""
    SELECT 'http://example.org/user/' || CAST(user_id AS VARCHAR) AS user_iri,
           COUNT(*) AS n,
           CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(28,6)))
                AS DOUBLE) AS total_value
    FROM events
    WHERE event_type = 'purchase'
      AND CASE WHEN isfinite(value) THEN value END > 10
      AND user_id IS NOT NULL AND event_id IS NOT NULL
    GROUP BY user_id
    ORDER BY total_value DESC, user_iri
    LIMIT 20
    """,
)
def r02(spark, sf_dir):
    """BGP of three triple patterns sharing ?s (type/user/value) + FILTER +
    aggregate, evaluated as self-joins on the quad table — the SPARQL->
    DataFrame mapping of SURVEY.md §2B.  Predicate equality filters push
    into the scan; the join keys are the shared subject variable."""
    quads = events_to_quads(load(spark, sf_dir, "events"))

    type_p = quads.filter(
        (F.col("predicate") == EX + "type") & (F.col("object_value") == "purchase")
    ).select(F.col("subject").alias("s"))
    user_p = quads.filter(F.col("predicate") == EX + "user").select(
        F.col("subject").alias("s"), F.col("object_value").alias("user_iri")
    )
    value_p = quads.filter(F.col("predicate") == EX + "value").select(
        F.col("subject").alias("s"),
        # 'NaN'/'Infinity' are VALID xsd:double lexicals, so the quad
        # keeps them; the consumer treats a non-finite metric as unusable
        # (finite_spark -> NULL falls out of the > 10 filter on both
        # engines — NaN > 10 would be TRUE on both, and DuckDB's
        # non-finite -> decimal cast then ERRORS)
        finite_spark(F.col("object_value").cast("double")).alias("v"),
    )
    joined = type_p.join(user_p, "s").join(value_p, "s").filter(F.col("v") > 10)
    return (
        joined.groupBy("user_iri")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("total_value"),
        )
        .select("user_iri", "n", "total_value")
        .orderBy(F.desc("total_value"), "user_iri")
        .limit(20)
    )


@query(
    "r04_sparql_engine_group_by",
    oracle="""
    SELECT 'http://example.org/user/' || CAST(user_id AS VARCHAR) AS user, COUNT(*) AS n,
           COUNT(DISTINCT event_type) AS ng,
           CAST(COUNT(*) * length(CAST(user_id AS VARCHAR)) AS BIGINT) AS sl,
           CAST(COUNT(*) * 18 AS BIGINT) AS sb,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np,
           CAST(SUM(CAST(FLOOR(ABS(CASE WHEN isfinite(value) THEN value END
                                   - 100)) AS BIGINT)) AS BIGINT) AS va,
           CAST(SUM(CAST(CEIL(CASE WHEN isfinite(value) THEN value END / 7)
                    AS BIGINT)) AS BIGINT) AS vc,
           CAST(SUM(CAST(FLOOR(CASE WHEN isfinite(value) THEN value END + 0.5)
                    AS BIGINT)) AS BIGINT) AS vr,
           COUNT(*) AS nt,
           CAST(SUM(month(ts)) AS BIGINT) AS sm,
           CAST(SUM(day(ts)) AS BIGINT) AS sd,
           CAST(SUM(hour(ts)) AS BIGINT) AS sh
    FROM events
    WHERE value > 50
      AND user_id IS NOT NULL AND ts IS NOT NULL
      AND event_type IS NOT NULL AND event_id IS NOT NULL
    GROUP BY user_id
    ORDER BY n DESC, user
    LIMIT 10
    """,
)
def r04(spark, sf_dir):
    """End-to-end SPARQL execution: a real SPARQL string (GRAPH + BGP join
    + FILTER + GROUP BY/COUNT + ORDER/LIMIT) parsed and translated by the
    SparqlEngine into a DataFrame plan over the quad table.  The
    COUNT(DISTINCT ?g) facet drives the engine's distinct-aggregate path
    (graphs-per-user — integer-deterministic, unlike a distinct sum over
    doubles, which neither engine can hash-stably order).  Five more
    integer-exact facets drive previously unit-test-only builtins through
    the oracle gate:

    - ?sl: STR + STRAFTER + STRLEN (uid digits per row, summed = n x len);
    - ?sb: STRBEFORE (the scheme+host prefix is constant, so 18 x n);
    - ?np: UCASE + CONTAINS over the graph IRI (purchase-graph row count);
    - ?va: ABS + FLOOR + xsd:integer cast on the double ?v (?v - 100 is
      the same exactly-rounded IEEE double on both engines; a
      non-finite ?v — 'NaN' is a valid xsd:double lexical — goes
      type-error -> unbound through the engine's try_cast and SUM
      skips it, so the oracle mirrors with an isfinite guard where
      DuckDB's NaN -> BIGINT cast would abort);
    - ?vc/?vr (r12): CEIL and ROUND through the same xsd:integer gate,
      so all three builtins the r12 double-domain fix touched ride the
      oracle, not just FLOOR.  ?v / 7 is one exactly-rounded IEEE op on
      both engines; the ROUND oracle mirrors the engine's fn:round
      (ties toward +INF) as FLOOR(value + 0.5) rather than DuckDB's
      half-away-from-zero round() — identical on this positive-filtered
      column but written to the spec anyway;
    - ?nt: DATATYPE equality to xsd:double plus the isIRI / isLiteral /
      isBlank term-kind tests and && / ! — all-true per row, so = n;
    - ?sm/?sd/?sh: MONTH / DAY / HOURS on the xsd:dateTime ?t (one ts
      quad per event, so the extra pattern keeps solutions 1:1) — the
      engine's date-accessor path (try_cast to timestamp, type error ->
      unbound) summed integer-exact against DuckDB reading the raw
      timestamp column.
    """
    from ..sparql import SparqlEngine

    quads = events_to_quads(load(spark, sf_dir, "events"))
    engine = SparqlEngine(quads)
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?user (COUNT(*) AS ?n) (COUNT(DISTINCT ?g) AS ?ng)
               (SUM(STRLEN(STRAFTER(STR(?user), "user/"))) AS ?sl)
               (SUM(STRLEN(STRBEFORE(STR(?user), "/user/"))) AS ?sb)
               (SUM(IF(CONTAINS(UCASE(STR(?g)), "PURCHASE"), 1, 0)) AS ?np)
               (SUM(xsd:integer(FLOOR(ABS(?v - 100)))) AS ?va)
               (SUM(xsd:integer(CEIL(?v / 7))) AS ?vc)
               (SUM(xsd:integer(ROUND(?v))) AS ?vr)
               (SUM(IF(DATATYPE(?v) = xsd:double && isIRI(?user) &&
                       isLiteral(?v) && !isBlank(?user), 1, 0)) AS ?nt)
               (SUM(MONTH(?t)) AS ?sm)
               (SUM(DAY(?t)) AS ?sd)
               (SUM(HOURS(?t)) AS ?sh)
        WHERE {
          GRAPH ?g { ?e ex:user ?user . ?e ex:value ?v . ?e ex:ts ?t }
          FILTER(?v > 50)
        } GROUP BY ?user ORDER BY DESC(?n) ?user LIMIT 10
        """
    )
    return df.select(
        F.col("user")["value"].alias("user"),
        F.col("n")["value"].cast("long").alias("n"),
        F.col("ng")["value"].cast("long").alias("ng"),
        F.col("sl")["value"].cast("long").alias("sl"),
        F.col("sb")["value"].cast("long").alias("sb"),
        F.col("np")["value"].cast("long").alias("np"),
        F.col("va")["value"].cast("long").alias("va"),
        F.col("vc")["value"].cast("long").alias("vc"),
        F.col("vr")["value"].cast("long").alias("vr"),
        F.col("nt")["value"].cast("long").alias("nt"),
        F.col("sm")["value"].cast("long").alias("sm"),
        F.col("sd")["value"].cast("long").alias("sd"),
        F.col("sh")["value"].cast("long").alias("sh"),
    )


@query(
    "r03_graph_quantification",
    oracle="""
    SELECT 'http://example.org/graph/' || event_type AS graph,
           CAST(COUNT(*) + COUNT(user_id) + COUNT(value) + COUNT(ts)
                AS BIGINT) AS n_quads
    FROM events
    WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    GROUP BY event_type ORDER BY graph
    """,
)
def r03(spark, sf_dir):
    """GRAPH ?g { ?s ?p ?o } — quantify over named graphs and count per
    graph (the Graph Store Protocol read surface; SURVEY.md §2B GRAPH row)."""
    quads = events_to_quads(load(spark, sf_dir, "events"))
    return (
        quads.filter(F.col("graph") != DEFAULT_GRAPH)
        .groupBy("graph")
        .agg(F.count("*").alias("n_quads"))
        .orderBy("graph")
    )


def _order_quads(spark, sf_dir) -> DataFrame:
    """Orders as quads in the default graph: ex:customer (IRI), ex:total
    (double literal), and ex:bigtotal only when o_totalprice > 200000 —
    the conditional quad creates genuinely-unbound OPTIONAL matches."""
    o = load(spark, sf_dir, "orders")
    subj = F.concat(F.lit(EX + "order/"), F.col("o_orderkey").cast("string"))

    def quad(df, pred, kind, value, dt=None):
        return df.select(
            F.lit(DEFAULT_GRAPH).alias("graph"),
            subj.alias("subject"),
            F.lit(EX + pred).alias("predicate"),
            F.lit(kind).alias("object_kind"),
            value.cast("string").alias("object_value"),
            (F.lit(dt) if dt else F.lit(None).cast("string")).alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
        )

    cust = quad(o, "customer", KIND_IRI, F.concat(F.lit(EX + "customer/"), F.col("o_custkey").cast("string")))
    total = quad(o, "total", KIND_LITERAL, xsd_double_lexical(F.col("o_totalprice")), XSD + "double")
    big = quad(o.filter(F.col("o_totalprice") > 200000), "bigtotal", KIND_LITERAL, F.lit("big"))
    jumbo = quad(o.filter(F.col("o_totalprice") > 350000), "jumbototal", KIND_LITERAL, F.lit("jumbo"))
    return cust.unionByName(total).unionByName(big).unionByName(jumbo)


def _customer_quads(spark, sf_dir) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.lit(DEFAULT_GRAPH).alias("graph"),
        F.concat(F.lit(EX + "customer/"), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit(EX + "segment").alias("predicate"),
        F.lit(KIND_LITERAL).alias("object_kind"),
        F.col("c_mktsegment").alias("object_value"),
        F.lit(None).cast("string").alias("object_datatype"),
        F.lit(None).cast("string").alias("object_lang"),
    )


@query(
    "r05_property_path_closure",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT user_id AS u, user_id // 2 AS p FROM events WHERE user_id >= 2
    ),
    anc AS (
      SELECT u, p AS a FROM edges
      UNION
      SELECT anc.u, e.p FROM anc JOIN edges e ON anc.a = e.u
    ),
    -- explicit DISTINCT over UNION ALL: in a WITH RECURSIVE block DuckDB
    -- does NOT dedup plain UNION in sibling (non-recursive) CTEs
    nodes AS (SELECT DISTINCT n
              FROM (SELECT u AS n FROM edges UNION ALL SELECT p AS n FROM edges) t)
    SELECT 'http://example.org/user/' || CAST(a AS VARCHAR) AS ancestor, COUNT(*) AS n,
           (SELECT COUNT(*) FROM anc) + (SELECT COUNT(*) FROM nodes) AS c_star,
           (SELECT COUNT(*) FROM edges) + (SELECT COUNT(*) FROM nodes) AS c_opt,
           (SELECT COUNT(*) FROM edges e1 JOIN edges e2 ON e1.p = e2.u) AS c_seq,
           2 * (SELECT COUNT(*) FROM edges) AS c_alt
    FROM anc GROUP BY a ORDER BY n DESC, ancestor LIMIT 20
    """,
)
def r05(spark, sf_dir):
    """Property paths over the parent forest u -> u//2 (log-depth chains).

    The main result is the transitive closure (SPARQL ``p+``) — the one
    operator SURVEY.md §7.3 marks as genuinely custom: a distributed
    semi-naive fixpoint (translate.py:_closure_pattern); the DuckDB
    oracle is the equivalent recursive CTE.  Four scalar facets drive
    the remaining path operators through the oracle gate (previously
    unit-test-only):

    - c_star (``p*``): zero-length solutions bind every node in the
      graph to itself (ARQ semantics), so the count is |closure| +
      |nodes| — a closure that misses the zero-length row set or
      dedups it against real pairs hashes differently;
    - c_opt (``p?``): |edges| + |nodes|;
    - c_seq (``p/p``): grandparent pairs, the edges-join-edges count;
    - c_alt (``p|^p``): forward plus reversed edges, 2x|edges|.  On
      this forest the forward and reversed pair sets are DISJOINT
      (u >= 2 > u//2's child role), so the count comes out 2x|edges|
      under either bag or set semantics — the facet pins the
      translator's branch arithmetic, not the spec's no-dedup bag-union
      rule (which test_sparql.py::test_alternative_path_is_bag_union
      pins directly on a symmetric edge reachable through both
      branches).
    """
    from ..sparql import SparqlEngine

    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").filter(F.col("user_id") >= 2).distinct()
    quads = users.select(
        F.lit(DEFAULT_GRAPH).alias("graph"),
        F.concat(F.lit(EX + "user/"), F.col("user_id").cast("string")).alias("subject"),
        F.lit(EX + "parent").alias("predicate"),
        F.lit(KIND_IRI).alias("object_kind"),
        F.concat(F.lit(EX + "user/"), (F.col("user_id") / 2).cast("long").cast("string")).alias("object_value"),
        F.lit(None).cast("string").alias("object_datatype"),
        F.lit(None).cast("string").alias("object_lang"),
    )
    engine = SparqlEngine(quads)
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?a ?n ?c_star ?c_opt ?c_seq ?c_alt WHERE {
          { SELECT ?a (COUNT(*) AS ?n) WHERE { ?u ex:parent+ ?a }
            GROUP BY ?a }
          { SELECT (COUNT(*) AS ?c_star) WHERE { ?u2 ex:parent* ?a2 } }
          { SELECT (COUNT(*) AS ?c_opt) WHERE { ?u3 ex:parent? ?a3 } }
          { SELECT (COUNT(*) AS ?c_seq) WHERE { ?u4 ex:parent/ex:parent ?g4 } }
          { SELECT (COUNT(*) AS ?c_alt) WHERE { ?u5 (ex:parent|^ex:parent) ?v5 } }
        } ORDER BY DESC(?n) ?a LIMIT 20
        """
    )
    return df.select(
        F.col("a")["value"].alias("ancestor"),
        F.col("n")["value"].cast("long").alias("n"),
        F.col("c_star")["value"].cast("long").alias("c_star"),
        F.col("c_opt")["value"].cast("long").alias("c_opt"),
        F.col("c_seq")["value"].cast("long").alias("c_seq"),
        F.col("c_alt")["value"].cast("long").alias("c_alt"),
    )


@query(
    "r06_optional_bind_coalesce",
    oracle="""
    SELECT CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS nbound
    FROM orders GROUP BY 1 ORDER BY size
    """,
)
def r06(spark, sf_dir):
    """OPTIONAL + BIND + COALESCE over genuinely-unbound solutions — the
    reference's own config-lookup SPARQL shape
    (KafkaConnectorAssembler.java:380-390 uses OPTIONAL/BIND/COALESCE);
    unbound ?bt coalesces to the literal 'small'.  The SUM(IF(BOUND()))
    facet drives IF and BOUND through an oracle gate (previously
    unit-test-only paths) — integer-exact per group."""
    from ..sparql import SparqlEngine

    engine = SparqlEngine(_order_quads(spark, sf_dir))
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?size (COUNT(*) AS ?n) (SUM(IF(BOUND(?bt), 1, 0)) AS ?nbound)
        WHERE {
          ?o ex:customer ?c .
          OPTIONAL { ?o ex:bigtotal ?bt }
          BIND(COALESCE(?bt, "small") AS ?size)
        } GROUP BY ?size ORDER BY ?size
        """
    )
    return df.select(
        F.col("size")["value"].alias("size"),
        F.col("n")["value"].cast("long").alias("n"),
        F.col("nbound")["value"].cast("long").alias("nbound"),
    )


@query(
    "r07_not_exists_antijoin",
    oracle="""
    SELECT c_mktsegment AS seg, COUNT(*) AS n
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000
    )
    GROUP BY c_mktsegment ORDER BY seg
    """,
)
def r07(spark, sf_dir):
    """FILTER NOT EXISTS -> left-anti join (SURVEY.md §2B FILTER row):
    customers with no jumbo order; the NOT EXISTS group is itself a
    two-pattern BGP (order->customer join + the conditional jumbototal quad)."""
    from ..sparql import SparqlEngine

    quads = _customer_quads(spark, sf_dir).unionByName(_order_quads(spark, sf_dir))
    engine = SparqlEngine(quads)
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?seg (COUNT(*) AS ?n) WHERE {
          ?c ex:segment ?seg .
          FILTER NOT EXISTS { ?o ex:customer ?c . ?o ex:jumbototal ?bt }
        } GROUP BY ?seg ORDER BY ?seg
        """
    )
    return df.select(
        F.col("seg")["value"].alias("seg"),
        F.col("n")["value"].cast("long").alias("n"),
    )


@query(
    "r08_construct_quads",
    oracle="""
    SELECT '' AS graph,
           'http://example.org/order/' || CAST(o_orderkey AS VARCHAR) AS subject,
           'http://example.org/spentBy' AS predicate,
           'iri' AS object_kind,
           'http://example.org/customer/' || CAST(o_custkey AS VARCHAR) AS object_value,
           CAST(NULL AS VARCHAR) AS object_datatype,
           CAST(NULL AS VARCHAR) AS object_lang
    FROM orders WHERE o_totalprice > 200000
    ORDER BY subject
    """,
)
def r08(spark, sf_dir):
    """CONSTRUCT — project solutions into new quads (SURVEY.md §2B
    CONSTRUCT row): big-ticket orders rewritten to ex:spentBy edges.  The
    output is QUAD_SCHEMA, i.e. directly insertable into a QuadStore (the
    materialized-view path)."""
    from ..sparql import SparqlEngine

    engine = SparqlEngine(_order_quads(spark, sf_dir))
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        CONSTRUCT { ?o ex:spentBy ?c }
        WHERE { ?o ex:customer ?c . ?o ex:bigtotal ?bt }
        """
    )
    return df.orderBy("subject")


@query(
    "r09_values_inline_data",
    oracle="""
    SELECT c_mktsegment AS seg, COUNT(*) AS n
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY c_mktsegment ORDER BY seg
    """,
)
def r09(spark, sf_dir):
    """VALUES — inline binding table joined against the pattern solutions
    (SURVEY.md §2B VALUES row)."""
    from ..sparql import SparqlEngine

    engine = SparqlEngine(_customer_quads(spark, sf_dir))
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?seg (COUNT(*) AS ?n) WHERE {
          ?c ex:segment ?seg .
          VALUES ?seg { "BUILDING" "MACHINERY" }
        } GROUP BY ?seg ORDER BY ?seg
        """
    )
    return df.select(
        F.col("seg")["value"].alias("seg"),
        F.col("n")["value"].cast("long").alias("n"),
    )


@query(
    "r10_ask",
    oracle="""
    SELECT (SELECT COUNT(*) FROM orders WHERE o_totalprice > 350000) > 0 AS jumbo_exists,
           FALSE AS impossible_exists
    """,
)
def r10(spark, sf_dir):
    """ASK — non-empty test (SURVEY.md §2B ASK row), one true and one
    vacuous pattern.  ASK evaluates as limit(1)-count on the translated
    pattern; the two booleans are returned as a single comparison row.
    The vacuous arm asks a predicate no quad builder ever emits, so its
    oracle mirror is the constant FALSE — the previous price-threshold
    proxy (> 10M) stopped encoding "impossible" once the orders-edge
    corpus put +Inf in o_totalprice."""
    from ..sparql import SparqlEngine

    engine = SparqlEngine(_order_quads(spark, sf_dir))
    yes = engine.query(
        "PREFIX ex: <http://example.org/> ASK { ?o ex:jumbototal ?t }"
    )
    no = engine.query(
        "PREFIX ex: <http://example.org/> ASK { ?o ex:nosuchpredicate ?t }"
    )
    return spark.createDataFrame(
        [(bool(yes), bool(no))], "jumbo_exists boolean, impossible_exists boolean"
    )


@query(
    "r11_describe_subject",
    oracle="""
    WITH jumbo AS (SELECT * FROM orders WHERE o_totalprice > 350000)
    SELECT '' AS graph,
           'http://example.org/order/' || CAST(o_orderkey AS VARCHAR) AS subject,
           'http://example.org/customer' AS predicate,
           'iri' AS object_kind,
           'http://example.org/customer/' || CAST(o_custkey AS VARCHAR) AS object_value,
           CAST(NULL AS VARCHAR) AS object_datatype,
           CAST(NULL AS VARCHAR) AS object_lang
    FROM jumbo
    UNION ALL
    SELECT '', 'http://example.org/order/' || CAST(o_orderkey AS VARCHAR),
           'http://example.org/total', 'literal',
           CASE WHEN isnan(o_totalprice) THEN 'NaN'
                WHEN o_totalprice = 'infinity'::DOUBLE THEN 'INF'
                WHEN o_totalprice = '-infinity'::DOUBLE THEN '-INF'
                ELSE CAST(o_totalprice AS VARCHAR) END,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM jumbo
    ORDER BY subject, predicate
    """,
)
def r11(spark, sf_dir):
    """DESCRIBE ?o over a WHERE pattern (subject-CBD): every quad of every
    jumbo order.  The oracle enumerates the same CBD per matching order.
    Datatype column intentionally projected NULL on both sides (the
    ex:total quad carries xsd:double in the store; DESCRIBE parity here is
    about CBD membership, so the comparison strips per-term metadata)."""
    from ..sparql import SparqlEngine

    engine = SparqlEngine(_order_quads(spark, sf_dir))
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        DESCRIBE ?o WHERE { ?o ex:jumbototal ?t }
        """
    )
    # the CBD includes the bigtotal/jumbototal marker quads; strip them so
    # the oracle stays a two-predicate enumeration
    described = df.filter(~F.col("predicate").isin(EX + "bigtotal", EX + "jumbototal"))
    return described.select(
        "graph",
        "subject",
        "predicate",
        "object_kind",
        "object_value",
        F.lit(None).cast("string").alias("object_datatype"),
        F.lit(None).cast("string").alias("object_lang"),
    ).orderBy("subject", "predicate")


@query(
    "r12_group_concat",
    oracle="""
    SELECT 'http://example.org/region/' || CAST(n_regionkey AS VARCHAR) AS region,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           string_agg(DISTINCT substr(n_name, 1, 1), ';' ORDER BY substr(n_name, 1, 1)) AS initials,
           MIN(n_name) AS sample_name,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey ORDER BY region
    """,
)
def r12(spark, sf_dir):
    """GROUP_CONCAT / GROUP_CONCAT(DISTINCT) / SAMPLE aggregates through
    the SPARQL engine (SURVEY.md §2B aggregates row): nation names per
    region, sorted inside the group so the concatenation is deterministic
    on any partitioning (the engine sort_array's the collected set —
    order-independence is what makes the aggregate safe at 1000
    executors).  The DISTINCT facet concatenates first letters (which
    genuinely repeat within a region, so set-vs-list is observable) and
    SAMPLE is pinned to MIN — the engine's documented deterministic
    choice, mirrored in the oracle."""
    from ..sparql import SparqlEngine

    n = load(spark, sf_dir, "nation")
    quads = n.select(
        F.lit(DEFAULT_GRAPH).alias("graph"),
        F.concat(F.lit(EX + "nation/"), F.col("n_nationkey").cast("string")).alias("subject"),
        F.lit(EX + "name").alias("predicate"),
        F.lit(KIND_LITERAL).alias("object_kind"),
        F.col("n_name").alias("object_value"),
        F.lit(None).cast("string").alias("object_datatype"),
        F.lit(None).cast("string").alias("object_lang"),
    ).unionByName(
        n.select(
            F.lit(DEFAULT_GRAPH).alias("graph"),
            F.concat(F.lit(EX + "nation/"), F.col("n_nationkey").cast("string")).alias("subject"),
            F.lit(EX + "region").alias("predicate"),
            F.lit(KIND_IRI).alias("object_kind"),
            F.concat(F.lit(EX + "region/"), F.col("n_regionkey").cast("string")).alias("object_value"),
            F.lit(None).cast("string").alias("object_datatype"),
            F.lit(None).cast("string").alias("object_lang"),
        )
    )
    engine = SparqlEngine(quads)
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?r (GROUP_CONCAT(?n; SEPARATOR=",") AS ?names)
               (GROUP_CONCAT(DISTINCT ?i; SEPARATOR=";") AS ?initials)
               (SAMPLE(?n) AS ?s) (COUNT(*) AS ?c)
        WHERE { ?x ex:region ?r . ?x ex:name ?n . BIND(SUBSTR(?n, 1, 1) AS ?i) }
        GROUP BY ?r ORDER BY ?r
        """
    )
    return df.select(
        F.col("r")["value"].alias("region"),
        F.col("names")["value"].alias("names"),
        F.col("initials")["value"].alias("initials"),
        F.col("s")["value"].alias("sample_name"),
        F.col("c")["value"].cast("long").alias("n"),
    )


@query(
    "r13_subselect",
    oracle="""
    WITH top5 AS (
      SELECT 'http://example.org/user/' || CAST(user_id AS VARCHAR) AS u, COUNT(*) AS n
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND event_id IS NOT NULL
      GROUP BY user_id ORDER BY n DESC, u LIMIT 5
    )
    SELECT t.u AS user, COUNT(*) AS m
    FROM top5 t
    JOIN events e ON 'http://example.org/user/' || CAST(e.user_id AS VARCHAR) = t.u
    WHERE e.value > 50 AND e.event_type IS NOT NULL AND e.event_id IS NOT NULL
    GROUP BY t.u ORDER BY t.u
    """,
)
def r13(spark, sf_dir):
    """SPARQL 1.1 sub-SELECT (§2B subqueries row) through the engine: the
    inner SELECT finds the 5 busiest users (GROUP BY + ORDER BY aggregate +
    LIMIT — evaluated bottom-up, its projection is the only scope exported),
    and the outer group joins their high-value events on the shared ?user
    variable.  At scale the inner result is 5 rows, so Catalyst broadcasts
    it into the outer join — subquery-as-dimension, no extra shuffle."""
    from ..sparql import SparqlEngine

    quads = events_to_quads(load(spark, sf_dir, "events"))
    engine = SparqlEngine(quads)
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?user (COUNT(*) AS ?m) WHERE {
          { SELECT ?user (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?e ex:user ?user } }
            GROUP BY ?user ORDER BY DESC(?n) ?user LIMIT 5 }
          GRAPH ?g2 { ?e2 ex:user ?user . ?e2 ex:value ?v }
          FILTER(?v > 50)
        } GROUP BY ?user ORDER BY ?user
        """
    )
    return df.select(
        F.col("user")["value"].alias("user"),
        F.col("m")["value"].cast("long").alias("m"),
    )


@query(
    "r14_degree_histogram",
    oracle="""
    WITH deg AS (SELECT user_id, COUNT(*) AS d FROM events
                 WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                   AND event_id IS NOT NULL
                 GROUP BY user_id),
    hist AS (SELECT d, COUNT(*) AS n FROM deg GROUP BY d)
    SELECT CAST(d AS VARCHAR) AS d, n FROM hist ORDER BY n DESC, hist.d LIMIT 20
    """,
)
def r14(spark, sf_dir):
    """IN-degree histogram of the quad graph via NESTED aggregation in
    the engine: inner sub-SELECT computes per-user in-degree (how many
    ``ex:user`` edges point at each user node), outer group counts users
    per degree — the aggregate-of-aggregate composition (with an
    aggregate ORDER BY + LIMIT) that exercises sub-SELECT scoping end to
    end.  Users receive VARYING numbers of events, so the histogram is a
    genuine multi-row distribution (widened from the degenerate
    every-subject-has-degree-4 single-row shape, VERDICT r6 item 6
    spirit); the oracle derives it relationally while the engine walks
    the graph."""
    from ..sparql import SparqlEngine

    quads = events_to_quads(load(spark, sf_dir, "events"))
    engine = SparqlEngine(quads)
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?d (COUNT(*) AS ?n) WHERE {
          { SELECT ?u (COUNT(*) AS ?d) WHERE { GRAPH ?g { ?e ex:user ?u } } GROUP BY ?u }
        } GROUP BY ?d ORDER BY DESC(?n) ?d LIMIT 20
        """
    )
    return df.select(
        F.col("d")["value"].alias("d"),
        F.col("n")["value"].cast("long").alias("n"),
    )


@query(
    "r15_optional_unbound_compat",
    oracle="""
    SELECT CASE WHEN o_totalprice > 350000 THEN 'jumbo'
                WHEN o_totalprice > 200000 THEN 'big'
                ELSE 'none' END AS size,
           COUNT(*) AS n
    FROM orders GROUP BY 1 ORDER BY size
    """,
)
def r15(spark, sf_dir):
    """Double OPTIONAL sharing a variable — the SPARQL 1.1 §18.3
    compatible-mapping gate (the spec/ARQ behavior Fuseki serves, per the
    reference's query endpoint config-connector.ttl:14-17).  Orders over
    350k bind ?x from the FIRST optional ("jumbo"); the second optional's
    "big" is then incompatible and must not overwrite.  Orders in
    (200k, 350k] leave ?x unbound in the first optional — unbound is
    COMPATIBLE, so the second optional must still bind "big" (the row an
    unbound-as-non-matching implementation silently drops to 'none').
    The oracle states spec semantics directly as a CASE ladder."""
    from ..sparql import SparqlEngine

    engine = SparqlEngine(_order_quads(spark, sf_dir))
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?size (COUNT(*) AS ?n) WHERE {
          ?o ex:total ?t .
          OPTIONAL { ?o ex:jumbototal ?x }
          OPTIONAL { ?o ex:bigtotal ?x }
          BIND(COALESCE(?x, "none") AS ?size)
        } GROUP BY ?size ORDER BY ?size
        """
    )
    return df.select(
        F.col("size")["value"].alias("size"),
        F.col("n")["value"].cast("long").alias("n"),
    )


@query(
    "r17_minus_compat",
    oracle="""
    WITH surv AS (
      SELECT CAST(FLOOR(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END
                        / 100000) AS BIGINT) AS bucket
      FROM orders WHERE o_totalprice <= 350000
    ),
    ov AS (SELECT bucket, COUNT(*) AS n_overlap FROM surv GROUP BY bucket)
    SELECT ov.bucket, ov.n_overlap,
           (SELECT COUNT(*) FROM orders) AS c_disjoint,
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 350000) AS c_unbound
    FROM ov ORDER BY ov.bucket NULLS FIRST
    """,
)
def r17(spark, sf_dir):
    """MINUS per SPARQL 1.1 §18.5: remove a left solution only when some
    right solution is COMPATIBLE **and** the domains OVERLAP.  Three facets:

    - bucket/n_overlap: shared ?o -> jumbo orders removed (plain anti-join
      case), with the survivors bucketed by price decile-of-100k (widened
      per VERDICT r7 item 4: one row per bucket pins the anti-join's
      surviving DISTRIBUTION, not just its count — a MINUS that dropped
      the wrong rows with the right total can't pass);
    - c_disjoint: the MINUS pattern shares NO variable with the left, so
      despite being non-empty it removes NOTHING (the spec's surprising
      dom-disjoint rule; a bare anti-join implementation drops everything);
    - c_unbound: ?x is bound on the left only for jumbo orders (OPTIONAL);
      the right binds ?x for every jumbo order.  Bound-?x rows overlap and
      are removed; unbound-?x rows have NO domain overlap and must stay —
      treating unbound-as-matching would empty the result.
    """
    from ..sparql import SparqlEngine

    engine = SparqlEngine(_order_quads(spark, sf_dir))
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?bucket ?n_overlap ?c_disjoint ?c_unbound WHERE {
          { SELECT ?bucket (COUNT(*) AS ?n_overlap) WHERE {
              ?o ex:total ?t MINUS { ?o ex:jumbototal ?j }
              BIND(xsd:integer(FLOOR(?t / 100000)) AS ?bucket)
            } GROUP BY ?bucket }
          { SELECT (COUNT(*) AS ?c_disjoint) WHERE {
              ?o ex:total ?t MINUS { ?y ex:bigtotal ?z } } }
          { SELECT (COUNT(*) AS ?c_unbound) WHERE {
              ?o ex:total ?t
              OPTIONAL { ?o ex:jumbototal ?x }
              MINUS { ?y ex:jumbototal ?x } } }
        } ORDER BY ?bucket
        """
    )
    return df.select(
        F.col("bucket")["value"].cast("long").alias("bucket"),
        F.col("n_overlap")["value"].cast("long").alias("n_overlap"),
        F.col("c_disjoint")["value"].cast("long").alias("c_disjoint"),
        F.col("c_unbound")["value"].cast("long").alias("c_unbound"),
    )


@query(
    "r18_negated_property_set",
    oracle="""
    SELECT (SELECT COUNT(*) FROM orders) AS c_fwd,
           (SELECT COUNT(*) FROM orders)
             + (SELECT COUNT(*) FROM orders WHERE o_totalprice > 200000)
             + (SELECT COUNT(*) FROM orders WHERE o_totalprice > 350000) AS c_inv,
           2 * (SELECT COUNT(*) FROM orders)
             + (SELECT COUNT(*) FROM orders WHERE o_totalprice > 200000)
             + (SELECT COUNT(*) FROM orders WHERE o_totalprice > 350000) AS c_mixed,
           (SELECT COUNT(*) FROM orders WHERE o_totalprice > 200000)
             + (SELECT COUNT(*) FROM orders WHERE o_totalprice > 350000) AS c_inv_multi,
           (SELECT COUNT(*) FROM orders)
             + (SELECT COUNT(*) FROM orders WHERE o_totalprice > 200000)
             + (SELECT COUNT(*) FROM orders WHERE o_totalprice > 350000) AS c_seq,
           0 AS c_none
    """,
)
def r18(spark, sf_dir):
    """Negated property sets (SPARQL 1.1 §9.1) over the order quads —
    previously unit-tested only (VERDICT r5 §2B property-path row).  The
    quad relation has exactly four predicates (ex:customer, ex:total,
    ex:bigtotal, ex:jumbototal), so each facet has a closed-form count:

    - c_fwd: ``!(ex:customer|ex:bigtotal|ex:jumbototal)`` leaves only the
      ex:total edges — one per order;
    - c_inv: pure-inverse ``!(^ex:customer)`` matches every REVERSED edge
      whose predicate isn't ex:customer: total + bigtotal + jumbototal;
    - c_mixed: ``!(ex:customer|ex:total|^ex:bigtotal|^ex:jumbototal)`` is
      the bag union of forward edges outside {customer,total} (bigtotal +
      jumbototal) and reversed edges outside {bigtotal,jumbototal}
      (customer + total reversed = 2n), so big + jumbo + 2n in total;
    - c_inv_multi: multi-predicate pure-inverse ``!(^ex:customer|^ex:total)``
      — reversed bigtotal + jumbototal edges only;
    - c_seq: NPS composed INSIDE a sequence path,
      ``^ex:customer/!(ex:customer)``: customer -> order (one edge per
      order) then every non-customer forward edge, bag-counted per route:
      total + big + jumbo;
    - c_none: all four predicates negated — provably empty (the facet a
      broken NOT-IN filter would light up).

    The translator evaluates each direction as a scan-level NOT-IN filter
    (translate.py:_negated_set_pattern) — no join, so the plan stays a
    single pass over the quad table per direction at any scale."""
    from ..sparql import SparqlEngine

    engine = SparqlEngine(_order_quads(spark, sf_dir))
    df = engine.query(
        """
        PREFIX ex: <http://example.org/>
        SELECT ?c_fwd ?c_inv ?c_mixed ?c_inv_multi ?c_seq ?c_none WHERE {
          { SELECT (COUNT(*) AS ?c_fwd) WHERE {
              ?s !(ex:customer|ex:bigtotal|ex:jumbototal) ?o } }
          { SELECT (COUNT(*) AS ?c_inv) WHERE {
              ?s !(^ex:customer) ?o } }
          { SELECT (COUNT(*) AS ?c_mixed) WHERE {
              ?s !(ex:customer|ex:total|^ex:bigtotal|^ex:jumbototal) ?o } }
          { SELECT (COUNT(*) AS ?c_inv_multi) WHERE {
              ?s !(^ex:customer|^ex:total) ?o } }
          { SELECT (COUNT(*) AS ?c_seq) WHERE {
              ?c ^ex:customer/!(ex:customer) ?v } }
          { SELECT (COUNT(*) AS ?c_none) WHERE {
              ?s !(ex:customer|ex:total|ex:bigtotal|ex:jumbototal) ?o } }
        }
        """
    )
    return df.select(
        F.col("c_fwd")["value"].cast("long").alias("c_fwd"),
        F.col("c_inv")["value"].cast("long").alias("c_inv"),
        F.col("c_mixed")["value"].cast("long").alias("c_mixed"),
        F.col("c_inv_multi")["value"].cast("long").alias("c_inv_multi"),
        F.col("c_seq")["value"].cast("long").alias("c_seq"),
        F.col("c_none")["value"].cast("long").alias("c_none"),
    )


@query(
    "r16_from_named_dataset",
    oracle="""
    WITH merged AS (
      SELECT DISTINCT 'http://example.org/event/' || CAST(event_id AS VARCHAR) AS s
      FROM events
      WHERE event_type IN ('click', 'view') AND event_id IS NOT NULL
    ),
    g AS (
      SELECT 'http://example.org/graph/purchase' AS g,
             CAST(COUNT(*) + COUNT(user_id) + COUNT(value) + COUNT(ts)
                  AS BIGINT) AS named_quads
      FROM events WHERE event_type = 'purchase' AND event_id IS NOT NULL
      UNION ALL
      SELECT 'http://example.org/graph/signup' AS g,
             CAST(COUNT(*) + COUNT(user_id) + COUNT(value) + COUNT(ts)
                  AS BIGINT) AS named_quads
      FROM events WHERE event_type = 'signup' AND event_id IS NOT NULL
    )
    SELECT g.g AS g, g.named_quads,
           (SELECT COUNT(*) FROM merged) AS default_subjects
    FROM g WHERE g.named_quads > 0 ORDER BY g.g
    """,
)
def r16(spark, sf_dir):
    """FROM / FROM NAMED dataset clauses (SPARQL 1.1 §13.2, served by
    Fuseki per config-connector.ttl:14-17): the click+view graphs MERGE
    into the query's default graph (set-union of quads, counted as
    distinct subjects), while only the purchase+signup graphs are visible
    to GRAPH patterns — the store's other named graphs must vanish from
    both scopes.  Widened per VERDICT r7 item 4: one row PER named graph
    (GRAPH ?g + GROUP BY ?g), so the hash pins which graphs the FROM
    NAMED clause admitted and each graph's exact quad count, not just a
    single combined total.  Oracle-shape note (r15): the final SELECT
    filters named_quads > 0 so the oracle emits a row only for graphs
    that EXIST — mirroring SPARQL's GROUP BY ?g over zero solutions
    (zero groups) instead of hard-coding two scalar-count rows; this
    closed the last documented empty-corpus latent (and the
    nonempty-but-one-graph-missing case with it)."""
    from ..sparql import SparqlEngine

    quads = events_to_quads(load(spark, sf_dir, "events"))
    engine = SparqlEngine(quads)
    df = engine.query(
        """
        PREFIX exg: <http://example.org/graph/>
        SELECT ?g ?named_quads ?default_subjects
        FROM exg:click
        FROM exg:view
        FROM NAMED exg:purchase
        FROM NAMED exg:signup
        WHERE {
          { SELECT ?g (COUNT(*) AS ?named_quads) WHERE { GRAPH ?g { ?a ?b ?c } }
            GROUP BY ?g }
          { SELECT (COUNT(DISTINCT ?s) AS ?default_subjects) WHERE { ?s ?p ?o } }
        } ORDER BY ?g
        """
    )
    return df.select(
        F.col("g")["value"].alias("g"),
        F.col("named_quads")["value"].cast("long").alias("named_quads"),
        F.col("default_subjects")["value"].cast("long").alias("default_subjects"),
    )
