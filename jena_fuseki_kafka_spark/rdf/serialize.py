"""RDF serializers: quad rows -> N-Quads / Turtle / TriG / JSON-LD /
RDF-XML text, SELECT rows -> SPARQL results JSON.  The write-side
complement of the parsers, used by the HTTP facade's Graph Store Protocol
GET and query endpoints with Accept-header negotiation (the reference
serves any registered Jena syntax through Fuseki; the grammars are the
public W3C specs).  Every serializer round-trips through this package's
own parser for the same syntax.
"""

from __future__ import annotations

import json as _json
import re as _re

from ..model import DEFAULT_GRAPH, KIND_BNODE, KIND_IRI, KIND_LITERAL, XSD_STRING

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def escape_literal(s: str) -> str:
    return "".join(_ESCAPES.get(c, c) for c in s)


def _term_nq(kind: str, value: str, datatype: str | None, lang: str | None) -> str:
    if kind == KIND_IRI:
        return f"<{value}>"
    if kind == KIND_BNODE:
        return value if value.startswith("_:") else f"_:{value}"
    lit = f'"{escape_literal(value)}"'
    if lang:
        return f"{lit}@{lang}"
    if datatype and datatype != XSD_STRING:
        return f"{lit}^^<{datatype}>"
    return lit


def quads_to_nquads(rows) -> str:
    """Serialize quad rows (QUAD_COLS attribute order) as N-Quads; rows in
    the default graph come out as triples (N-Quads allows both)."""
    out = []
    for r in rows:
        subj = f"<{r.subject}>" if not r.subject.startswith("_:") else r.subject
        term = _term_nq(r.object_kind, r.object_value, r.object_datatype, r.object_lang)
        if r.graph and r.graph != DEFAULT_GRAPH:
            out.append(f"{subj} <{r.predicate}> {term} <{r.graph}> .")
        else:
            out.append(f"{subj} <{r.predicate}> {term} .")
    return "\n".join(out) + ("\n" if out else "")


def quads_to_turtle(rows) -> str:
    """Serialize quad rows as Turtle (subject-grouped ``;`` form).  Turtle
    cannot express named graphs, so the graph column is ignored — callers
    serialize a single graph's contents (the GSP GET case) or use TriG."""
    by_subj: dict[str, list] = {}
    order: list[str] = []
    for r in rows:
        if r.subject not in by_subj:
            order.append(r.subject)
            by_subj[r.subject] = []
        by_subj[r.subject].append(r)
    lines = []
    for s in order:
        subj = s if s.startswith("_:") else f"<{s}>"
        pairs = " ;\n    ".join(
            f"<{r.predicate}> "
            + _term_nq(r.object_kind, r.object_value, r.object_datatype, r.object_lang)
            for r in by_subj[s]
        )
        lines.append(f"{subj} {pairs} .")
    return "\n".join(lines) + ("\n" if lines else "")


def quads_to_trig(rows) -> str:
    """Serialize quad rows as TriG: default-graph triples bare, named
    graphs as ``<g> { ... }`` blocks."""
    by_graph: dict[str, list] = {}
    order: list[str] = []
    for r in rows:
        g = r.graph or DEFAULT_GRAPH
        if g not in by_graph:
            order.append(g)
            by_graph[g] = []
        by_graph[g].append(r)
    parts = []
    for g in order:
        block = quads_to_turtle(by_graph[g])
        if g == DEFAULT_GRAPH:
            parts.append(block)
        else:
            indented = "".join(f"  {line}\n" for line in block.splitlines())
            parts.append(f"<{g}> {{\n{indented}}}\n")
    return "".join(parts)


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def quads_to_jsonld(rows) -> str:
    """Serialize quad rows as expanded-form JSON-LD: a top-level ``@graph``
    of node objects, with named graphs as ``{"@id": g, "@graph": [...]}``.
    Round-trips through ``parse_jsonld``."""

    def term_json(r) -> dict:
        if r.object_kind == KIND_IRI or r.object_kind == KIND_BNODE:
            return {"@id": r.object_value}
        v: dict = {"@value": r.object_value}
        if r.object_lang:
            v["@language"] = r.object_lang
        elif r.object_datatype and r.object_datatype != XSD_STRING:
            v["@type"] = r.object_datatype
        return v

    def nodes_of(graph_rows) -> list[dict]:
        by_subj: dict[str, dict] = {}
        order: list[str] = []
        for r in graph_rows:
            node = by_subj.get(r.subject)
            if node is None:
                node = by_subj[r.subject] = {"@id": r.subject}
                order.append(r.subject)
            if r.predicate == _RDF_TYPE and r.object_kind == KIND_IRI:
                node.setdefault("@type", []).append(r.object_value)
            else:
                node.setdefault(r.predicate, []).append(term_json(r))
        return [by_subj[s] for s in order]

    by_graph: dict[str, list] = {}
    g_order: list[str] = []
    for r in rows:
        g = r.graph or DEFAULT_GRAPH
        if g not in by_graph:
            g_order.append(g)
            by_graph[g] = []
        by_graph[g].append(r)
    top: list[dict] = []
    for g in g_order:
        if g == DEFAULT_GRAPH:
            top.extend(nodes_of(by_graph[g]))
        else:
            top.append({"@id": g, "@graph": nodes_of(by_graph[g])})
    return _json.dumps({"@graph": top}, indent=1)


_NCNAME_TAIL = _re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*$")


def quads_to_rdfxml(rows) -> str:
    """Serialize quad rows as RDF/XML (graph column ignored, like Turtle).
    Predicate IRIs split into namespace + NCName local part; namespaces
    collect into generated ``xmlns:nsN`` declarations.  Round-trips
    through ``parse_rdfxml``."""
    from xml.sax.saxutils import escape, quoteattr

    def split_iri(iri: str) -> tuple[str, str]:
        m = _NCNAME_TAIL.search(iri)
        if m is None or m.start() == 0:
            raise ValueError(f"cannot derive an XML name from predicate <{iri}>")
        return iri[: m.start()], m.group(0)

    namespaces: dict[str, str] = {}

    def prefix_of(ns: str) -> str:
        if ns not in namespaces:
            namespaces[ns] = f"ns{len(namespaces) + 1}"
        return namespaces[ns]

    by_subj: dict[str, list] = {}
    order: list[str] = []
    for r in rows:
        if r.subject not in by_subj:
            order.append(r.subject)
            by_subj[r.subject] = []
        by_subj[r.subject].append(r)

    body_parts: list[str] = []
    for s in order:
        if s.startswith("_:"):
            ident = f"rdf:nodeID={quoteattr(s[2:])}"
        else:
            ident = f"rdf:about={quoteattr(s)}"
        props: list[str] = []
        for r in by_subj[s]:
            ns, local = split_iri(r.predicate)
            tag = f"{prefix_of(ns)}:{local}"
            if r.object_kind == KIND_IRI:
                props.append(f"    <{tag} rdf:resource={quoteattr(r.object_value)}/>")
            elif r.object_kind == KIND_BNODE:
                v = r.object_value
                props.append(
                    f"    <{tag} rdf:nodeID={quoteattr(v[2:] if v.startswith('_:') else v)}/>"
                )
            else:
                attrs = ""
                if r.object_lang:
                    attrs = f" xml:lang={quoteattr(r.object_lang)}"
                elif r.object_datatype and r.object_datatype != XSD_STRING:
                    attrs = f" rdf:datatype={quoteattr(r.object_datatype)}"
                props.append(f"    <{tag}{attrs}>{escape(r.object_value)}</{tag}>")
        body_parts.append(
            f"  <rdf:Description {ident}>\n" + "\n".join(props) + "\n  </rdf:Description>"
        )

    xmlns = "".join(
        f'\n         xmlns:{p}="{escape(ns)}"' for ns, p in namespaces.items()
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        + xmlns
        + ">\n"
        + "\n".join(body_parts)
        + "\n</rdf:RDF>\n"
    )


# Accept-header negotiation for graph payloads: media type -> (serializer,
# response Content-Type).  N-Quads is the default, as on the parse side.
GRAPH_SERIALIZERS = {
    "application/n-quads": (quads_to_nquads, "application/n-quads"),
    "application/n-triples": (quads_to_nquads, "application/n-quads"),
    "text/turtle": (quads_to_turtle, "text/turtle"),
    "application/turtle": (quads_to_turtle, "text/turtle"),
    "application/trig": (quads_to_trig, "application/trig"),
    "application/ld+json": (quads_to_jsonld, "application/ld+json"),
    "application/rdf+xml": (quads_to_rdfxml, "application/rdf+xml"),
}


def negotiate_graph_serializer(accept: str | None):
    """Pick (serializer, content_type) from an Accept header value; first
    recognized media type wins, anything else (or ``*/*``) -> N-Quads."""
    default = GRAPH_SERIALIZERS["application/n-quads"]
    if not accept:
        return default
    for part in accept.split(","):
        mt = part.split(";")[0].strip().lower()
        if mt in GRAPH_SERIALIZERS:
            return GRAPH_SERIALIZERS[mt]
        if mt in ("*/*", "application/*", "text/*"):
            return default
    return default


def _binding_json(term) -> dict:
    """Term struct row (kind/value/datatype/lang) -> SPARQL JSON binding."""
    kind = term["kind"]
    if kind == KIND_IRI:
        return {"type": "uri", "value": term["value"]}
    if kind == KIND_BNODE:
        v = term["value"]
        return {"type": "bnode", "value": v[2:] if v.startswith("_:") else v}
    b = {"type": "literal", "value": term["value"]}
    if term["lang"]:
        b["xml:lang"] = term["lang"]
    elif term["datatype"] and term["datatype"] != XSD_STRING:
        b["datatype"] = term["datatype"]
    return b


def select_to_json(df) -> dict:
    """SELECT result DataFrame (one term-struct column per var) ->
    SPARQL 1.1 Query Results JSON dict."""
    vars_ = list(df.columns)
    bindings = []
    for row in df.collect():
        b = {}
        for v in vars_:
            term = row[v]
            if term is not None and term["kind"] is not None:
                b[v] = _binding_json(term)
        bindings.append(b)
    return {"head": {"vars": vars_}, "results": {"bindings": bindings}}


def ask_to_json(value: bool) -> dict:
    return {"head": {}, "boolean": bool(value)}


# ------------------------------------------------------------------ SELECT
# results formats beyond JSON (SPARQL 1.1 Query Results XML / CSV / TSV —
# Fuseki serves all four through content negotiation)

def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def select_to_xml(df) -> str:
    """SELECT result -> SPARQL Query Results XML (W3C REC, Fuseki's
    application/sparql-results+xml)."""
    vars_ = list(df.columns)
    out = [
        '<?xml version="1.0"?>',
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">',
        "  <head>",
        *(f'    <variable name="{_xml_escape(v)}"/>' for v in vars_),
        "  </head>",
        "  <results>",
    ]
    for row in df.collect():
        out.append("    <result>")
        for v in vars_:
            term = row[v]
            if term is None or term["kind"] is None:
                continue
            kind, value = term["kind"], term["value"]
            if kind == KIND_IRI:
                body = f"<uri>{_xml_escape(value)}</uri>"
            elif kind == KIND_BNODE:
                label = value[2:] if value.startswith("_:") else value
                body = f"<bnode>{_xml_escape(label)}</bnode>"
            else:
                attrs = ""
                if term["lang"]:
                    attrs = f' xml:lang="{_xml_escape(term["lang"])}"'
                elif term["datatype"] and term["datatype"] != XSD_STRING:
                    attrs = f' datatype="{_xml_escape(term["datatype"])}"'
                body = f"<literal{attrs}>{_xml_escape(value)}</literal>"
            out.append(f'      <binding name="{_xml_escape(v)}">{body}</binding>')
        out.append("    </result>")
    out.extend(["  </results>", "</sparql>", ""])
    return "\n".join(out)


def ask_to_xml(value: bool) -> str:
    return (
        '<?xml version="1.0"?>\n'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n'
        "  <head/>\n"
        f"  <boolean>{'true' if value else 'false'}</boolean>\n"
        "</sparql>\n"
    )


def _csv_field(s: str) -> str:
    if any(c in s for c in ',"\n\r'):
        return '"' + s.replace('"', '""') + '"'
    return s


def select_to_csv(df) -> str:
    """SPARQL 1.1 CSV results: header without '?', plain lexical forms
    (IRIs bare, bnodes _:label), RFC4180 quoting, CRLF rows."""
    vars_ = list(df.columns)
    lines = [",".join(_csv_field(v) for v in vars_)]
    for row in df.collect():
        fields = []
        for v in vars_:
            term = row[v]
            if term is None or term["kind"] is None:
                fields.append("")
                continue
            value = term["value"]
            if term["kind"] == KIND_BNODE and not value.startswith("_:"):
                value = f"_:{value}"
            fields.append(_csv_field(value))
        lines.append(",".join(fields))
    return "\r\n".join(lines) + "\r\n"


def select_to_tsv(df) -> str:
    """SPARQL 1.1 TSV results: header keeps '?', terms in SPARQL syntax
    (IRIs <>, literals quoted with lang/datatype tags)."""
    vars_ = list(df.columns)
    lines = ["\t".join(f"?{v}" for v in vars_)]
    for row in df.collect():
        fields = []
        for v in vars_:
            term = row[v]
            if term is None or term["kind"] is None:
                fields.append("")
            else:
                fields.append(_term_nq(term["kind"], term["value"], term["datatype"], term["lang"]))
        lines.append("\t".join(fields))
    return "\n".join(lines) + "\n"


def ask_to_csv(value: bool) -> str:
    # Fuseki's CSV/TSV boolean form: one header-less line
    return ("true" if value else "false") + "\r\n"


def ask_to_tsv(value: bool) -> str:
    return ("true" if value else "false") + "\n"


RESULTS_SERIALIZERS = {
    # content-type -> (select_fn(df) -> str, ask_fn(bool) -> str)
    "application/sparql-results+json": (
        lambda df: _json.dumps(select_to_json(df)),
        lambda b: _json.dumps(ask_to_json(b)),
    ),
    "application/sparql-results+xml": (select_to_xml, ask_to_xml),
    "text/csv": (select_to_csv, ask_to_csv),
    "text/tab-separated-values": (select_to_tsv, ask_to_tsv),
}


def negotiate_results_serializer(accept: str | None):
    """Accept header -> ((select_fn, ask_fn), content-type); first
    recognized media type wins, anything else (or ``*/*``) -> JSON."""
    default_ct = "application/sparql-results+json"
    if accept:
        for part in accept.split(","):
            mt = part.split(";")[0].strip().lower()
            if mt in RESULTS_SERIALIZERS:
                return RESULTS_SERIALIZERS[mt], mt
            if mt in ("*/*", "application/*"):
                break
    return RESULTS_SERIALIZERS[default_ct], default_ct
