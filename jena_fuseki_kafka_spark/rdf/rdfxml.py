"""RDF/XML parser (practical subset, stdlib ElementTree).

The reference accepts any registered Jena syntax for event payloads
(FKLib.java:55-69, README.md:8-14); RDF/XML is Jena's original wire
format.  Covers the constructs real payloads use:

- ``rdf:RDF`` root (or a single bare node element)
- node elements: ``rdf:Description`` or typed elements (tag -> rdf:type),
  identified by ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` / anonymous
- property elements: ``rdf:resource`` / ``rdf:nodeID`` object attrs,
  ``rdf:datatype`` typed literals, ``xml:lang`` (inherited), plain text
  literals, nested node elements, ``rdf:parseType="Resource"`` (anonymous
  bnode) and ``rdf:parseType="Literal"`` (XML literal)
- property attributes on node elements (literal shorthand)
- ``rdf:li`` -> ``rdf:_1``, ``rdf:_2``, ... per node element

Unsupported (raises RdfParseError): ``rdf:parseType="Collection"``,
reification attributes — absent from the reference's fixtures.

Returns all-'A' op tuples in document order, default graph; bnode labels
are document-scoped (skolemized per event upstream).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..model import (
    DEFAULT_GRAPH,
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RdfParseError,
)

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
RDF_TYPE = RDF_NS + "type"
XML_LITERAL = RDF_NS + "XMLLiteral"

_RDF = lambda local: f"{{{RDF_NS}}}{local}"  # noqa: E731
_SYNTAX_ATTRS = {
    _RDF("about"), _RDF("ID"), _RDF("nodeID"), _RDF("resource"),
    _RDF("datatype"), _RDF("parseType"), f"{{{XML_NS}}}lang",
    f"{{{XML_NS}}}base",
}


def _split_tag(tag: str) -> str:
    """'{ns}local' -> ns+local IRI."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns + local
    raise RdfParseError(f"rdfxml: unnamespaced element {tag!r}")


class _RdfXmlParser:
    def __init__(self) -> None:
        self.ops: list[tuple] = []
        self._bnode_counter = 0

    def _fresh_bnode(self) -> str:
        self._bnode_counter += 1
        return f"_:xb{self._bnode_counter}"

    def parse(self, text: str) -> list[tuple]:
        try:
            root = ET.fromstring(text)
        except ET.ParseError as e:
            raise RdfParseError(f"rdfxml: invalid XML: {e}") from None
        lang = (root.get(f"{{{XML_NS}}}lang") or "").lower() or None
        if root.tag == _RDF("RDF"):
            for child in root:
                self._node_element(child, lang)
        else:
            self._node_element(root, lang)
        return self.ops

    # ------------------------------------------------------------ nodes
    def _subject_of(self, elem: ET.Element) -> str:
        about = elem.get(_RDF("about"))
        if about is not None:
            return about
        rid = elem.get(_RDF("ID"))
        if rid is not None:
            return "#" + rid
        node_id = elem.get(_RDF("nodeID"))
        if node_id is not None:
            return "_:" + node_id
        return self._fresh_bnode()

    def _node_element(self, elem: ET.Element, lang: str | None) -> str:
        _l = elem.get(f"{{{XML_NS}}}lang")
        lang = _l.lower() if _l is not None else lang
        subj = self._subject_of(elem)
        tag_iri = _split_tag(elem.tag)
        if tag_iri != RDF_NS + "Description":
            self._emit(subj, RDF_TYPE, KIND_IRI, tag_iri, None, None)
        # property attributes (literal shorthand): <ex:Thing ex:name="x"/>
        for attr, value in elem.attrib.items():
            if attr in _SYNTAX_ATTRS or not attr.startswith("{"):
                continue
            attr_iri = _split_tag(attr)
            if attr_iri == RDF_TYPE:
                self._emit(subj, RDF_TYPE, KIND_IRI, value, None, None)
            elif not attr_iri.startswith(XML_NS):
                self._emit(subj, attr_iri, KIND_LITERAL, value, None, lang)
        li_counter = 0
        for prop in elem:
            li_counter = self._property_element(subj, prop, lang, li_counter)
        return subj

    # ------------------------------------------------------------ properties
    def _property_element(
        self, subj: str, prop: ET.Element, lang: str | None, li_counter: int
    ) -> int:
        _l = prop.get(f"{{{XML_NS}}}lang")
        lang = _l.lower() if _l is not None else lang
        pred = _split_tag(prop.tag)
        if pred == RDF_NS + "li":
            li_counter += 1
            pred = f"{RDF_NS}_{li_counter}"

        parse_type = prop.get(_RDF("parseType"))
        if parse_type == "Resource":
            # anonymous bnode whose property elements are prop's children
            bn = self._fresh_bnode()
            self._emit(subj, pred, KIND_BNODE, bn, None, None)
            inner_li = 0
            for child in prop:
                inner_li = self._property_element(bn, child, lang, inner_li)
            return li_counter
        if parse_type == "Literal":
            xml_text = (prop.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in prop
            )
            self._emit(subj, pred, KIND_LITERAL, xml_text, XML_LITERAL, None)
            return li_counter
        if parse_type is not None:
            raise RdfParseError(f"rdfxml: parseType={parse_type!r} not supported")

        resource = prop.get(_RDF("resource"))
        if resource is not None:
            self._emit(subj, pred, KIND_IRI, resource, None, None)
            return li_counter
        node_id = prop.get(_RDF("nodeID"))
        if node_id is not None:
            self._emit(subj, pred, KIND_BNODE, "_:" + node_id, None, None)
            return li_counter

        children = list(prop)
        if children:
            if len(children) != 1:
                raise RdfParseError("rdfxml: property element with multiple child nodes")
            obj = self._node_element(children[0], lang)
            kind = KIND_BNODE if obj.startswith("_:") else KIND_IRI
            self._emit(subj, pred, kind, obj, None, None)
            return li_counter

        datatype = prop.get(_RDF("datatype"))
        text = prop.text or ""
        if datatype is not None:
            self._emit(subj, pred, KIND_LITERAL, text, datatype, None)
        else:
            self._emit(subj, pred, KIND_LITERAL, text, None, lang)
        return li_counter

    def _emit(self, subj, pred, o_kind, o_val, o_dt, o_lang) -> None:
        self.ops.append(("A", DEFAULT_GRAPH, subj, pred, o_kind, o_val, o_dt, o_lang))


def parse_rdfxml(text: str) -> list[tuple]:
    return _RdfXmlParser().parse(text)
