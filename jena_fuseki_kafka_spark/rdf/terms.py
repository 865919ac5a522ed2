"""Shared term-level tokenizer for the line-oriented RDF syntaxes.

Terms (W3C N-Triples/N-Quads grammar, public spec):
  IRIREF        ::= '<' ... '>'            (with \\u / \\U escapes)
  BLANK_NODE    ::= '_:' label
  LITERAL       ::= '"' ... '"' ('^^' IRIREF | '@' langtag)?
String escapes: \\t \\b \\n \\r \\f \\" \\' \\\\ \\uXXXX \\UXXXXXXXX
"""

from __future__ import annotations

from ..model import KIND_BNODE, KIND_IRI, KIND_LITERAL, RdfParseError

_SIMPLE_ESCAPES = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}


def unescape_string(s: str) -> str:
    if "\\" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise RdfParseError(f"dangling escape in {s!r}")
        e = s[i + 1]
        if e in _SIMPLE_ESCAPES:
            out.append(_SIMPLE_ESCAPES[e])
            i += 2
        elif e == "u":
            out.append(chr(int(s[i + 2 : i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(s[i + 2 : i + 10], 16)))
            i += 10
        else:
            raise RdfParseError(f"bad escape \\{e} in {s!r}")
    return "".join(out)


class TermScanner:
    """Scan RDF terms off a single line (N-Triples/N-Quads/RDF Patch bodies)."""

    def __init__(self, line: str):
        self.line = line
        self.pos = 0
        self.n = len(line)

    def skip_ws(self) -> None:
        while self.pos < self.n and self.line[self.pos] in " \t":
            self.pos += 1

    def at_end_or_comment(self) -> bool:
        self.skip_ws()
        return self.pos >= self.n or self.line[self.pos] == "#"

    def expect_dot(self) -> None:
        self.skip_ws()
        if self.pos >= self.n or self.line[self.pos] != ".":
            raise RdfParseError(f"expected '.' at col {self.pos}: {self.line!r}")
        self.pos += 1

    def read_term(self):
        """Return (kind, value, datatype, lang)."""
        self.skip_ws()
        if self.pos >= self.n:
            raise RdfParseError(f"unexpected end of line: {self.line!r}")
        c = self.line[self.pos]
        if c == "<":
            end = self.line.find(">", self.pos + 1)
            if end < 0:
                raise RdfParseError(f"unterminated IRI: {self.line!r}")
            iri = unescape_string(self.line[self.pos + 1 : end])
            self.pos = end + 1
            return (KIND_IRI, iri, None, None)
        if c == "_" and self.line.startswith("_:", self.pos):
            start = self.pos
            self.pos += 2
            while self.pos < self.n and (self.line[self.pos].isalnum() or self.line[self.pos] in "-_."):
                self.pos += 1
            # trailing '.' is the statement terminator, not part of the label
            while self.line[self.pos - 1] == ".":
                self.pos -= 1
            return (KIND_BNODE, self.line[start : self.pos], None, None)
        if c == '"':
            i = self.pos + 1
            while i < self.n:
                if self.line[i] == "\\":
                    i += 2
                    continue
                if self.line[i] == '"':
                    break
                i += 1
            if i >= self.n:
                raise RdfParseError(f"unterminated literal: {self.line!r}")
            lex = unescape_string(self.line[self.pos + 1 : i])
            self.pos = i + 1
            if self.line.startswith("^^", self.pos):
                self.pos += 2
                kind, dt, _, _ = self.read_term()
                if kind != KIND_IRI:
                    raise RdfParseError(f"datatype must be IRI: {self.line!r}")
                return (KIND_LITERAL, lex, dt, None)
            if self.pos < self.n and self.line[self.pos] == "@":
                start = self.pos + 1
                self.pos = start
                while self.pos < self.n and (self.line[self.pos].isalnum() or self.line[self.pos] == "-"):
                    self.pos += 1
                # RDF 1.1 §3.3: language tags are case-insensitive; store lowercase
                return (KIND_LITERAL, lex, None, self.line[start : self.pos].lower())
            return (KIND_LITERAL, lex, None, None)
        raise RdfParseError(f"unrecognized term at col {self.pos}: {self.line!r}")
