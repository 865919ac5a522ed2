"""RDF Patch parser.

Format (reference fixture jena-fuseki-kafka-module/src/test/files/patch1.rdfp
and the public RDF Patch spec): line-oriented ops, each terminated by '.':

  H <key> <value> .      header (ignored for apply; id/prev tracked)
  TX . / TC . / TA .     transaction begin / commit / abort
  PA "p" <iri> .         prefix add (affects nothing here: terms are absolute)
  PD "p" .               prefix delete
  A s p o [g] .          add quad
  D s p o [g] .          delete quad

Transaction-marker semantics (reference
RDFChangesApplyExternalTransaction.java:10-42 + FusekiProjector.java:408-412):
patch-internal transactions are *folded into the outer micro-batch
transaction*; what matters for correctness is marker validation — an invalid
sequence (TC without TX, nested TX, ops outside a transaction when markers
are present, missing final TC/TA) makes the whole event malformed and DLQ-able
(TestFusekiProjector.java:235-269).  An aborted segment (TA) drops its ops.

Returns (ops, committed) where ops is the list of A/D tuples from committed
segments in order, and committed indicates the patch ended with an explicit
TC (the reference tracks this to avoid double-commit bookkeeping).
"""

from __future__ import annotations

from ..model import DEFAULT_GRAPH, KIND_BNODE, KIND_IRI, RdfParseError
from .terms import TermScanner


def parse_patch(text: str) -> tuple[list[tuple], bool]:
    ops: list[tuple] = []
    segment: list[tuple] = []
    in_txn = False
    saw_txn_marker = False
    ended_with_commit = False
    prefixes: dict[str, str] = {}

    for lineno, raw in enumerate(text.split("\n"), start=1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        try:
            tag, _, rest = line.partition(" ")
            if tag == "H":
                continue
            if tag in ("TX", "TC", "TA"):
                body = rest.strip()
                if body not in (".", ""):
                    # e.g. "TX ." — body is "."; anything else is malformed
                    raise RdfParseError(f"unexpected content after {tag}")
                if tag == "TX":
                    if in_txn:
                        raise RdfParseError("nested TX")
                    in_txn = True
                    saw_txn_marker = True
                    segment = []
                elif tag == "TC":
                    if not in_txn:
                        raise RdfParseError("TC without TX")
                    ops.extend(segment)
                    segment = []
                    in_txn = False
                    ended_with_commit = True
                else:  # TA
                    if not in_txn:
                        raise RdfParseError("TA without TX")
                    segment = []
                    in_txn = False
                    ended_with_commit = False
                continue
            if tag == "PA":
                sc = TermScanner(rest)
                kind, pfx, _, _ = sc.read_term()
                k2, iri, _, _ = sc.read_term()
                sc.expect_dot()
                prefixes[pfx] = iri
                continue
            if tag == "PD":
                continue
            if tag in ("A", "D"):
                if saw_txn_marker and not in_txn:
                    raise RdfParseError(f"{tag} op outside transaction")
                sc = TermScanner(rest)
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
                    graph = g_val
                sc.expect_dot()
                row = (tag, graph, s_val, p_val, o_kind, o_val, o_dt, o_lang)
                if in_txn:
                    segment.append(row)
                else:
                    ops.append(row)
                continue
            raise RdfParseError(f"unknown patch op {tag!r}")
        except RdfParseError as e:
            raise RdfParseError(f"patch line {lineno}: {e}") from None

    if in_txn:
        raise RdfParseError("patch ends inside an open transaction (missing TC/TA)")
    return ops, ended_with_commit
