"""N-Triples / N-Quads parser (the reference's default Content-Type —
README.md:8-14: "If there is no content type, the default is NQuads").

Returns ordered op tuples ``(op, graph, subject, predicate, object_kind,
object_value, object_datatype, object_lang)`` with op='A' for every
statement (a dataset document is pure insertion — FusekiSink.java:74-77).
"""

from __future__ import annotations

from ..model import DEFAULT_GRAPH, KIND_BNODE, KIND_IRI, RdfParseError
from .terms import TermScanner


def parse_nquads(text: str) -> list[tuple]:
    ops: list[tuple] = []
    for lineno, raw in enumerate(text.split("\n"), start=1):
        line = raw.strip()
        if not line or line.startswith("#"):
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
