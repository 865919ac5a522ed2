"""JSON-LD parser (practical subset).

The reference accepts any registered Jena syntax for event payloads
(FKLib.java:55-69, README.md:8-14); JSON-LD is the syntax real Telicent
pipelines post.  This covers the JSON-LD 1.0 core that such payloads use:

- ``@context``: term -> IRI string mappings, compact-IRI prefixes,
  ``@vocab``, ``@base``, and expanded term definitions with ``@id`` and
  ``@type`` (``"@id"`` coercion or a datatype IRI)
- node objects: ``@id`` (IRI or ``_:`` bnode), ``@type``, nested node
  objects, node references ``{"@id": ...}``, arrays
- value objects ``{"@value": ..., "@type"/"@language": ...}``; JSON
  strings/numbers/booleans type to xsd:string/integer/double/boolean
- ``@graph``: top-level (default graph) and named (node with ``@id`` +
  ``@graph``)

Unsupported (raises RdfParseError): remote contexts (string ``@context``),
``@list``/``@reverse`` — none appear in the reference's fixtures.

Returns all-'A' op tuples in document order, like the other document
parsers; bnode labels are document-scoped (skolemized per event upstream).
"""

from __future__ import annotations

import json

from ..model import (
    DEFAULT_GRAPH,
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RdfParseError,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
)

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_KEYWORDS = {"@context", "@id", "@type", "@value", "@language", "@graph", "@base", "@vocab"}


class _Context:
    def __init__(self) -> None:
        self.terms: dict[str, dict] = {}  # term -> {"id": iri, "type": coercion|None}
        self.vocab: str | None = None
        self.base: str | None = None

    def merge(self, ctx) -> "_Context":
        if ctx is None:
            return self
        if isinstance(ctx, str):
            raise RdfParseError("jsonld: remote @context not supported")
        if isinstance(ctx, list):
            out = self
            for c in ctx:
                out = out.merge(c)
            return out
        if not isinstance(ctx, dict):
            raise RdfParseError(f"jsonld: bad @context {type(ctx).__name__}")
        new = _Context()
        new.terms = dict(self.terms)
        new.vocab = self.vocab
        new.base = self.base
        for term, defn in ctx.items():
            if term == "@vocab":
                new.vocab = defn
            elif term == "@base":
                new.base = defn
            elif isinstance(defn, str):
                new.terms[term] = {"id": defn, "type": None}
            elif isinstance(defn, dict):
                if "@id" not in defn:
                    raise RdfParseError(f"jsonld: term {term!r} definition lacks @id")
                new.terms[term] = {"id": defn["@id"], "type": defn.get("@type")}
            else:
                raise RdfParseError(f"jsonld: bad term definition for {term!r}")
        # second pass: term @id values may themselves be compact IRIs
        for term, d in new.terms.items():
            d["id"] = new.expand_iri(d["id"], vocab=False)
        return new

    def expand_iri(self, value: str, vocab: bool = True) -> str | None:
        """Term / compact IRI / relative IRI -> absolute IRI (or bnode id).
        Returns None when the value cannot expand to an IRI (such keys are
        dropped, per the JSON-LD expansion algorithm)."""
        if value.startswith("_:"):
            return value
        if value in self.terms:
            return self.terms[value]["id"]
        if ":" in value:
            pfx, _, local = value.partition(":")
            if pfx in self.terms and not local.startswith("//"):
                return self.terms[pfx]["id"] + local
            return value  # absolute IRI (or urn:/mailto: style)
        if vocab and self.vocab:
            return self.vocab + value
        if self.base:
            return self.base + value
        return None

    def coercion(self, term: str) -> str | None:
        d = self.terms.get(term)
        return d["type"] if d else None


class _JsonLdParser:
    def __init__(self) -> None:
        self.ops: list[tuple] = []
        self._bnode_counter = 0

    def _fresh_bnode(self) -> str:
        self._bnode_counter += 1
        return f"_:jb{self._bnode_counter}"

    def parse(self, text: str) -> list[tuple]:
        try:
            doc = json.loads(text)
        except json.JSONDecodeError as e:
            raise RdfParseError(f"jsonld: invalid JSON: {e}") from None
        ctx = _Context()
        if isinstance(doc, dict):
            ctx = ctx.merge(doc.get("@context"))
            if "@graph" in doc and "@id" not in doc:
                self._nodes(doc["@graph"], ctx, DEFAULT_GRAPH)
            else:
                self._node(doc, ctx, DEFAULT_GRAPH)
        elif isinstance(doc, list):
            self._nodes(doc, ctx, DEFAULT_GRAPH)
        else:
            raise RdfParseError("jsonld: document must be an object or array")
        return self.ops

    def _nodes(self, nodes, ctx: _Context, graph: str) -> None:
        if not isinstance(nodes, list):
            nodes = [nodes]
        for n in nodes:
            if not isinstance(n, dict):
                raise RdfParseError("jsonld: @graph entries must be node objects")
            self._node(n, ctx, graph)

    def _subject_of(self, node: dict, ctx: _Context) -> tuple[str, str]:
        nid = node.get("@id")
        if nid is None:
            return KIND_BNODE, self._fresh_bnode()
        if not isinstance(nid, str):
            raise RdfParseError("jsonld: @id must be a string")
        if nid.startswith("_:"):
            return KIND_BNODE, nid
        iri = ctx.expand_iri(nid, vocab=False)
        if iri is None:
            raise RdfParseError(f"jsonld: cannot expand @id {nid!r}")
        return KIND_IRI, iri

    def _node(self, node: dict, ctx: _Context, graph: str) -> tuple[str, str]:
        """Emit a node object's triples; return its (kind, id)."""
        ctx = ctx.merge(node.get("@context"))
        s_kind, s_id = self._subject_of(node, ctx)
        for key, value in node.items():
            if key == "@type":
                for t in value if isinstance(value, list) else [value]:
                    t_iri = ctx.expand_iri(t)
                    if t_iri is not None:
                        self._emit(graph, s_id, RDF_TYPE, KIND_IRI, t_iri, None, None)
                continue
            if key == "@graph":
                # node with @id + @graph = named graph
                self._nodes(value, ctx, s_id)
                continue
            if key in _KEYWORDS:
                continue
            if key in ("@list", "@reverse"):
                raise RdfParseError(f"jsonld: {key} not supported")
            pred = ctx.expand_iri(key)
            if pred is None:
                continue  # non-expandable key: dropped (expansion algorithm)
            self._values(value, key, pred, ctx, graph, s_id)
        return s_kind, s_id

    def _values(self, value, term: str, pred: str, ctx: _Context, graph: str, subj: str) -> None:
        if isinstance(value, list):
            for v in value:
                self._values(v, term, pred, ctx, graph, subj)
            return
        coerce = ctx.coercion(term)
        if isinstance(value, dict):
            if "@list" in value or "@reverse" in value:
                raise RdfParseError("jsonld: @list/@reverse not supported")
            if "@value" in value:
                self._emit_literal(
                    graph, subj, pred, value["@value"],
                    dt=ctx.expand_iri(value["@type"]) if "@type" in value else None,
                    lang=(value.get("@language") or "").lower() or None,
                )
                return
            o_kind, o_id = self._node(value, ctx, graph)
            self._emit(graph, subj, pred, o_kind, o_id, None, None)
            return
        if isinstance(value, str) and coerce == "@id":
            iri = ctx.expand_iri(value, vocab=False)
            if iri is None:
                raise RdfParseError(f"jsonld: cannot expand @id-coerced {value!r}")
            kind = KIND_BNODE if iri.startswith("_:") else KIND_IRI
            self._emit(graph, subj, pred, kind, iri, None, None)
            return
        dt = ctx.expand_iri(coerce) if coerce and coerce != "@id" else None
        self._emit_literal(graph, subj, pred, value, dt=dt, lang=None)

    def _emit_literal(self, graph, subj, pred, value, dt, lang) -> None:
        if isinstance(value, bool):
            lex, inferred = ("true" if value else "false"), XSD_BOOLEAN
        elif isinstance(value, int):
            lex, inferred = str(value), XSD_INTEGER
        elif isinstance(value, float):
            lex, inferred = repr(value), XSD_DOUBLE
        elif isinstance(value, str):
            lex, inferred = value, None
        elif value is None:
            return  # null values produce no triple (JSON-LD spec)
        else:
            raise RdfParseError(f"jsonld: bad @value type {type(value).__name__}")
        self._emit(graph, subj, pred, KIND_LITERAL, lex, dt or inferred, lang)

    def _emit(self, graph, subj, pred, o_kind, o_val, o_dt, o_lang) -> None:
        self.ops.append(("A", graph, subj, pred, o_kind, o_val, o_dt, o_lang))


def parse_jsonld(text: str) -> list[tuple]:
    return _JsonLdParser().parse(text)
