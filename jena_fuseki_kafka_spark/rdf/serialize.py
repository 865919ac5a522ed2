"""RDF serializers: quad rows -> N-Quads text, SELECT rows -> SPARQL
results JSON.  The write-side complement of the line-oriented parsers,
used by the HTTP facade's Graph Store Protocol GET and query endpoints
(the reference serves these formats through Fuseki; the grammar is the
public W3C N-Quads / SPARQL 1.1 Results JSON spec).
"""

from __future__ import annotations

from ..model import DEFAULT_GRAPH, KIND_BNODE, KIND_IRI, XSD_STRING

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
