"""N-Triples / N-Quads parser (the reference's default Content-Type —
README.md:8-14: "If there is no content type, the default is NQuads").

Returns ordered op tuples ``(op, graph, subject, predicate, object_kind,
object_value, object_datatype, object_lang)`` with op='A' for every
statement (a dataset document is pure insertion — FusekiSink.java:74-77).
"""

from __future__ import annotations

import re

from ..model import DEFAULT_GRAPH, KIND_BNODE, KIND_IRI, KIND_LITERAL, RdfParseError
from .terms import TermScanner, unescape_string

# fast path: one compiled regex per well-formed statement line; anything it
# doesn't match falls back to the TermScanner (which also produces the
# precise error message for genuinely bad lines).  ~10x the scanner's
# throughput — this is the ingest hot loop (5M quads in the soak).
_IRI = r"<[^<>\"{}|^`\\\x00-\x20]*>"
_BNODE = r"_:[A-Za-z0-9][-_.A-Za-z0-9]*"
_LIT = r'"(?:[^"\\]|\\.)*"'
_STMT = re.compile(
    rf"(?P<s>{_IRI}|{_BNODE})\s+"
    rf"(?P<p>{_IRI})\s+"
    rf"(?:(?P<oi>{_IRI})|(?P<ob>{_BNODE})|(?P<ol>{_LIT})"
    rf"(?:\^\^(?P<odt>{_IRI})|@(?P<olang>[A-Za-z][-A-Za-z0-9]*))?)"
    rf"(?:\s+(?P<g>{_IRI}|{_BNODE}))?\s*\.\s*(?:#.*)?$"
)


def _fast_line(line: str):
    m = _STMT.match(line)
    if m is None:
        return None
    s = m.group("s")
    s_val = unescape_string(s[1:-1]) if s[0] == "<" else s
    p_val = unescape_string(m.group("p")[1:-1])
    if m.group("oi") is not None:
        o_kind, o_val, o_dt, o_lang = KIND_IRI, unescape_string(m.group("oi")[1:-1]), None, None
    elif m.group("ob") is not None:
        o_kind, o_val, o_dt, o_lang = KIND_BNODE, m.group("ob"), None, None
    else:
        o_kind = KIND_LITERAL
        o_val = unescape_string(m.group("ol")[1:-1])
        o_dt = unescape_string(m.group("odt")[1:-1]) if m.group("odt") else None
        o_lang = m.group("olang")
    g = m.group("g")
    graph = DEFAULT_GRAPH if g is None else (unescape_string(g[1:-1]) if g[0] == "<" else g)
    return ("A", graph, s_val, p_val, o_kind, o_val, o_dt, o_lang)


def parse_nquads(text: str) -> list[tuple]:
    ops: list[tuple] = []
    for lineno, raw in enumerate(text.split("\n"), start=1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        op = _fast_line(line)
        if op is not None:
            ops.append(op)
            continue
        try:
            sc = TermScanner(line)
            s_kind, s_val, _, _ = sc.read_term()
            if s_kind not in (KIND_IRI, KIND_BNODE):
                raise RdfParseError("subject must be IRI or bnode")
            p_kind, p_val, _, _ = sc.read_term()
            if p_kind != KIND_IRI:
                raise RdfParseError("predicate must be IRI")
            o_kind, o_val, o_dt, o_lang = sc.read_term()
            sc.skip_ws()
            graph = DEFAULT_GRAPH
            if sc.pos < sc.n and sc.line[sc.pos] != ".":
                g_kind, g_val, _, _ = sc.read_term()
                if g_kind not in (KIND_IRI, KIND_BNODE):
                    raise RdfParseError("graph label must be IRI or bnode")
                graph = g_val
            sc.expect_dot()
            if not sc.at_end_or_comment():
                raise RdfParseError("trailing content after '.'")
        except RdfParseError as e:
            raise RdfParseError(f"line {lineno}: {e}") from None
        ops.append(("A", graph, s_val, p_val, o_kind, o_val, o_dt, o_lang))
    return ops
