"""Turtle parser (practical subset).

Covers the Turtle features the reference's fixtures and typical payloads
use (reference fixture e.g. jena-fuseki-kafka-module/src/test/files/data.ttl:
``PREFIX : <http://example/>`` + ``:s1 :p :o .``):

- ``@prefix`` / ``PREFIX`` and ``@base`` / ``BASE``
- prefixed names, IRIs, blank nodes, ``a`` for rdf:type
- predicate lists ``;`` and object lists ``,``
- literals: quoted (with ``^^dt`` / ``@lang``), long strings (triple-quoted),
  numeric shorthand (integer/decimal/double), boolean shorthand
- ``[]`` anonymous blank nodes (flat, non-nested property lists supported)
- ``( ... )`` RDF collections (rdf:first/rdf:rest chains, nestable)
- comments

Returns all-'A' op tuples in document order, default graph.
"""

from __future__ import annotations

import re

from ..model import (
    DEFAULT_GRAPH,
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RdfParseError,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
)
from .terms import unescape_string

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

_TOKEN_RE = re.compile(
    r"""
      \s+                                   # whitespace
    | \#[^\n]*                              # comment
    | (?P<longstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\") # long string
    | (?P<str>"(?:[^"\\\n]|\\.)*")          # string
    | (?P<iri><[^<>"{}|^`\\\x00-\x20]*>)    # IRIREF
    | (?P<bnode>_:[A-Za-z0-9][A-Za-z0-9\-_.]*) # blank node
    | (?P<num>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?) # number
    | (?P<punct>\^\^|@[A-Za-z][A-Za-z0-9\-]*|[;,.\[\]\(\){}])  # punctuation/lang
    | (?P<pname>[A-Za-z0-9_][\w.\-]*?:[\w.\-:%]*|:[\w.\-:%]*|[A-Za-z][\w\-]*) # pname or keyword
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    tokens: list[str] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            raise RdfParseError(f"turtle: cannot tokenize at offset {pos}: {text[pos:pos+40]!r}")
        tok = m.group(0)
        pos = m.end()
        if tok[0].isspace() or tok.startswith("#"):
            continue
        tokens.append(tok)
    return tokens


class _TurtleParser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.ops: list[tuple] = []
        self._bnode_counter = 0

    def _peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        if self.i >= len(self.toks):
            raise RdfParseError("turtle: unexpected end of input")
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def _expect(self, tok: str) -> None:
        got = self._next()
        if got != tok:
            raise RdfParseError(f"turtle: expected {tok!r}, got {got!r}")

    def _fresh_bnode(self) -> str:
        self._bnode_counter += 1
        return f"_:anon{self._bnode_counter}"

    def _resolve_pname(self, tok: str) -> str:
        pfx, _, local = tok.partition(":")
        if pfx not in self.prefixes:
            raise RdfParseError(f"turtle: unknown prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def _resolve_iri(self, raw: str) -> str:
        iri = unescape_string(raw[1:-1])
        if self.base and "://" not in iri and not iri.startswith(("urn:", "mailto:")):
            return self.base + iri
        return iri

    def parse(self) -> list[tuple]:
        while self._peek() is not None:
            tok = self._peek()
            low = tok.lower() if tok else ""
            if low in ("@prefix", "prefix"):
                self._next()
                pname = self._next()
                if not pname.endswith(":"):
                    raise RdfParseError(f"turtle: bad prefix decl {pname!r}")
                iri = self._next()
                if not (iri.startswith("<") and iri.endswith(">")):
                    raise RdfParseError("turtle: prefix IRI expected")
                self.prefixes[pname[:-1]] = self._resolve_iri(iri)
                if low == "@prefix":
                    self._expect(".")
                elif self._peek() == ".":
                    self._next()
                continue
            if low in ("@base", "base"):
                self._next()
                iri = self._next()
                self.base = self._resolve_iri(iri)
                if low == "@base":
                    self._expect(".")
                elif self._peek() == ".":
                    self._next()
                continue
            self._triples_block()
        return self.ops

    def _triples_block(self) -> None:
        subject = self._subject()
        self._predicate_object_list(subject)
        self._expect(".")

    def _subject(self):
        tok = self._next()
        if tok == "[":
            node = (KIND_BNODE, self._fresh_bnode())
            if self._peek() != "]":
                self._predicate_object_list(node)
            self._expect("]")
            return node
        if tok == "(":
            return self._collection()
        kind, value, dt, lang = self._term_from_token(tok)
        if kind == KIND_LITERAL:
            raise RdfParseError("turtle: literal subject")
        return (kind, value)

    def _collection(self):
        """RDF collection ``( item... )`` -> rdf:first/rdf:rest chain;
        returns the head node (rdf:nil for an empty collection)."""
        items: list[tuple] = []
        while True:
            nxt = self._peek()
            if nxt is None:
                raise RdfParseError("turtle: unterminated collection")
            if nxt == ")":
                self._next()
                break
            tok = self._next()
            if tok == "(":
                kind, value = self._collection()
                items.append((kind, value, None, None))
            elif tok == "[":
                node = (KIND_BNODE, self._fresh_bnode())
                if self._peek() != "]":
                    self._predicate_object_list(node)
                self._expect("]")
                items.append((node[0], node[1], None, None))
            else:
                items.append(self._term_from_token(tok))
        if not items:
            return (KIND_IRI, RDF_NIL)
        head = self._fresh_bnode()
        cur = head
        for i, (kind, value, dt, lang) in enumerate(items):
            self._emit((KIND_BNODE, cur), RDF_FIRST, kind, value, dt, lang)
            if i == len(items) - 1:
                self._emit((KIND_BNODE, cur), RDF_REST, KIND_IRI, RDF_NIL, None, None)
            else:
                nxt_node = self._fresh_bnode()
                self._emit((KIND_BNODE, cur), RDF_REST, KIND_BNODE, nxt_node, None, None)
                cur = nxt_node
        return (KIND_BNODE, head)

    def _predicate_object_list(self, subject) -> None:
        while True:
            ptok = self._next()
            if ptok == "a":
                pred = RDF_TYPE
            else:
                kind, pred, _, _ = self._term_from_token(ptok)
                if kind != KIND_IRI:
                    raise RdfParseError(f"turtle: predicate must be IRI, got {ptok!r}")
            self._object_list(subject, pred)
            if self._peek() == ";":
                self._next()
                # allow trailing ';' before '.' or ']'
                if self._peek() in (".", "]", None):
                    return
                continue
            return

    def _object_list(self, subject, pred: str) -> None:
        while True:
            tok = self._next()
            if tok == "[":
                node = (KIND_BNODE, self._fresh_bnode())
                self._emit(subject, pred, node[0], node[1], None, None)
                if self._peek() != "]":
                    self._predicate_object_list(node)
                self._expect("]")
            elif tok == "(":
                kind, value = self._collection()
                self._emit(subject, pred, kind, value, None, None)
            else:
                kind, value, dt, lang = self._term_from_token(tok)
                self._emit(subject, pred, kind, value, dt, lang)
            if self._peek() == ",":
                self._next()
                continue
            return

    def _term_from_token(self, tok: str):
        if tok.startswith("<"):
            return (KIND_IRI, self._resolve_iri(tok), None, None)
        if tok.startswith("_:"):
            return (KIND_BNODE, tok, None, None)
        if tok.startswith('"'):
            if tok.startswith('"""'):
                lex = unescape_string(tok[3:-3])
            else:
                lex = unescape_string(tok[1:-1])
            nxt = self._peek()
            if nxt == "^^":
                self._next()
                dt_tok = self._next()
                if dt_tok.startswith("<"):
                    dt = self._resolve_iri(dt_tok)
                else:
                    dt = self._resolve_pname(dt_tok)
                return (KIND_LITERAL, lex, dt, None)
            if nxt is not None and nxt.startswith("@") and len(nxt) > 1:
                self._next()
                # RDF 1.1 §3.3: language tags are case-insensitive; store lowercase
                return (KIND_LITERAL, lex, None, nxt[1:].lower())
            return (KIND_LITERAL, lex, None, None)
        if tok in ("true", "false"):
            return (KIND_LITERAL, tok, XSD_BOOLEAN, None)
        if re.fullmatch(r"[+-]?\d+", tok):
            return (KIND_LITERAL, tok, XSD_INTEGER, None)
        if re.fullmatch(r"[+-]?(?:\d+\.\d*|\.\d+)", tok):
            return (KIND_LITERAL, tok, XSD_DECIMAL, None)
        if re.fullmatch(r"[+-]?(?:\d+\.?\d*|\.\d+)[eE][+-]?\d+", tok):
            return (KIND_LITERAL, tok, XSD_DOUBLE, None)
        if ":" in tok:
            return (KIND_IRI, self._resolve_pname(tok), None, None)
        raise RdfParseError(f"turtle: unexpected token {tok!r}")

    def _emit(self, subject, pred: str, o_kind: str, o_val: str, o_dt, o_lang) -> None:
        s_kind, s_val = subject
        self.ops.append(("A", DEFAULT_GRAPH, s_val, pred, o_kind, o_val, o_dt, o_lang))


def parse_turtle(text: str) -> list[tuple]:
    return _TurtleParser(text).parse()


def parse_trig(text: str) -> list[tuple]:
    """TriG = Turtle + named-graph blocks ``GRAPH <g> { ... }`` / ``<g> { ... }``.

    Minimal support: graph blocks containing turtle triples; shares the
    prefix table across blocks.
    """
    # Split out graph blocks at the token level.
    parser = _TurtleParser(text)
    ops: list[tuple] = []
    while parser._peek() is not None:
        tok = parser._peek()
        low = tok.lower() if tok else ""
        if low in ("@prefix", "prefix", "@base", "base"):
            # delegate one directive
            save_ops = parser.ops
            parser.ops = []
            # reuse parse loop body by handling directive inline
            if low in ("@prefix", "prefix"):
                parser._next()
                pname = parser._next()
                iri = parser._next()
                parser.prefixes[pname[:-1]] = parser._resolve_iri(iri)
                if low == "@prefix":
                    parser._expect(".")
                elif parser._peek() == ".":
                    parser._next()
            else:
                parser._next()
                parser.base = parser._resolve_iri(parser._next())
                if low == "@base":
                    parser._expect(".")
                elif parser._peek() == ".":
                    parser._next()
            parser.ops = save_ops
            continue
        graph = DEFAULT_GRAPH
        if low == "graph":
            parser._next()
            tok = parser._next()
            kind, graph, _, _ = parser._term_from_token(tok)
        elif tok not in ("{",) and parser.i + 1 < len(parser.toks) and parser.toks[parser.i + 1] == "{":
            tok = parser._next()
            kind, graph, _, _ = parser._term_from_token(tok)
        if parser._peek() == "{":
            parser._next()
            start = len(parser.ops)
            while parser._peek() != "}":
                parser._triples_block_in_graph()
            parser._next()  # '}'
            for j in range(start, len(parser.ops)):
                op = parser.ops[j]
                parser.ops[j] = (op[0], graph) + op[2:]
        else:
            parser._triples_block()
    return parser.ops


def _triples_block_in_graph(self) -> None:
    subject = self._subject()
    self._predicate_object_list(subject)
    if self._peek() == ".":
        self._next()


_TurtleParser._triples_block_in_graph = _triples_block_in_graph
