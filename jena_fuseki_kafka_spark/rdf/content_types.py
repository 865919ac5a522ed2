"""Content-Type -> parser dispatch.

Reference contract (README.md:8-14, FKLib.java:55-69): the Kafka event's
``Content-Type`` header selects the RDF syntax; no header means NQuads.
RDF Patch uses application/rdf-patch.

Blank-node scoping: RDF document syntaxes scope blank-node labels to the
parsed document (two events both saying ``_:b1`` describe *different*
nodes — Jena parses each payload into fresh bnodes).  ``parse_payload``
therefore accepts a ``bnode_suffix`` and rewrites every bnode label to
``label.suffix`` for document syntaxes.  RDF Patch is exempt: the patch
spec makes labels durable across the patch log precisely so a later patch
can delete what an earlier one created.
"""

from __future__ import annotations

from ..model import KIND_BNODE, RdfParseError
from .jsonld import parse_jsonld
from .nquads import parse_nquads
from .patch import parse_patch
from .rdfxml import parse_rdfxml
from .turtle import parse_trig, parse_turtle


def _patch_as_ops(text: str) -> list[tuple]:
    ops, _committed = parse_patch(text)
    return ops


def skolemize_ops(ops: list[tuple], suffix: str) -> list[tuple]:
    """Rewrite document-scoped bnode labels to globally unique ones by
    appending ``.suffix`` ('.' + hex are both legal bnode-label chars).
    The suffix must be deterministic per event so idempotent replay
    re-derives identical labels and set-semantics dedup still holds."""
    out = []
    for op, g, s, p, ok, ov, dt, lang in ops:
        if g and g.startswith("_:"):
            g = f"{g}.{suffix}"
        if s and s.startswith("_:"):
            s = f"{s}.{suffix}"
        if ok == KIND_BNODE:
            ov = f"{ov}.{suffix}"
        out.append((op, g, s, p, ok, ov, dt, lang))
    return out


CONTENT_TYPE_PARSERS = {
    "application/n-quads": parse_nquads,
    "application/n-triples": parse_nquads,  # NQuads parser accepts NTriples
    "text/turtle": parse_turtle,
    "application/turtle": parse_turtle,
    "application/x-turtle": parse_turtle,
    "application/trig": parse_trig,
    "application/ld+json": parse_jsonld,
    "application/rdf+xml": parse_rdfxml,
    "application/rdf-patch": _patch_as_ops,
    "application/rdf-patch+text": _patch_as_ops,
}

DEFAULT_CONTENT_TYPE = "application/n-quads"


def parse_payload(
    value: bytes | str,
    content_type: str | None = None,
    bnode_suffix: str | None = None,
) -> list[tuple]:
    """Parse an event payload into ordered A/D op tuples.

    ``bnode_suffix`` (document syntaxes only — patch labels are durable)
    makes the payload's bnode labels globally unique; pass something
    deterministic per event, e.g. a hash of (topic, partition, offset).

    Raises RdfParseError for malformed payloads or unknown content types
    (the DLQ path — FusekiProjector.java:267-277).
    """
    if isinstance(value, bytes):
        try:
            text = value.decode("utf-8")
        except UnicodeDecodeError as e:
            raise RdfParseError(f"payload is not valid UTF-8: {e}") from None
    else:
        text = value
    ct = (content_type or DEFAULT_CONTENT_TYPE).split(";")[0].strip().lower()
    parser = CONTENT_TYPE_PARSERS.get(ct)
    if parser is None:
        raise RdfParseError(f"unsupported Content-Type: {content_type!r}")
    ops = parser(text)
    if bnode_suffix and parser is not _patch_as_ops:
        ops = skolemize_ops(ops, bnode_suffix)
    return ops
