"""Content-Type -> parser dispatch.

Reference contract (README.md:8-14, FKLib.java:55-69): the Kafka event's
``Content-Type`` header selects the RDF syntax; no header means NQuads.
RDF Patch uses application/rdf-patch.
"""

from __future__ import annotations

from ..model import RdfParseError
from .nquads import parse_nquads
from .patch import parse_patch
from .turtle import parse_trig, parse_turtle


def _patch_as_ops(text: str) -> list[tuple]:
    ops, _committed = parse_patch(text)
    return ops


CONTENT_TYPE_PARSERS = {
    "application/n-quads": parse_nquads,
    "application/n-triples": parse_nquads,  # NQuads parser accepts NTriples
    "text/turtle": parse_turtle,
    "application/turtle": parse_turtle,
    "application/x-turtle": parse_turtle,
    "application/trig": parse_trig,
    "application/rdf-patch": _patch_as_ops,
    "application/rdf-patch+text": _patch_as_ops,
}

DEFAULT_CONTENT_TYPE = "application/n-quads"


def parse_payload(value: bytes | str, content_type: str | None = None) -> list[tuple]:
    """Parse an event payload into ordered A/D op tuples.

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
    return parser(text)
