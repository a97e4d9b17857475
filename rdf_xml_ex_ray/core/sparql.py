"""Restricted SPARQL SELECT parser — the query front-end for the BGP engine.

The reference's wider ecosystem queries RDF.Graph values through a SPARQL
engine (rdf-elixir ships SPARQL.ex alongside rdf-xml-ex); this module gives
the distributed engine the matching entry point for the fragment the BGP
executor evaluates:

    PREFIX pfx: <ns> ...
    SELECT [DISTINCT] ?v1 ?v2 | *
    WHERE { s p o . s p o ... }
    [LIMIT n]

Terms: ``?var``, ``<iri>``, ``pfx:local``, ``a`` (rdf:type), and plain
``"literal"`` constants (matched against the object VALUE column,
kind-agnostic — the same convention as pipelines/bgp._scan and its SQL
twins). Property paths, FILTER, OPTIONAL and UNION are out of scope; the
parser rejects anything outside the fragment loudly rather than guessing.
"""

from __future__ import annotations

import re

from .terms import ParseError

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# NB: regex alternation is first-match — the full pname (with local part)
# must precede the bare namespace form so "ex:s" lexes as one token while
# "ex:" (in a PREFIX decl) still lexes as pname_ns.
_TOKEN_RE = re.compile(
    r"""
      (?P<kw>(?:PREFIX|SELECT|DISTINCT|WHERE|LIMIT)\b)
    | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
    | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
    # PN_LOCAL must not END with '.', or 'ex:o.' (statement dot, no space)
    # would lex the terminator into the IRI (SPARQL/Turtle PN_LOCAL rule).
    | (?P<pname>[A-Za-z][\w\-]*:[A-Za-z0-9_](?:[\w\-.]*[\w\-])?)
    | (?P<pname_ns>[A-Za-z][\w\-]*:)
    | (?P<a_kw>a(?![\w:]))
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<integer>\d+)
    | (?P<star>\*)
    | (?P<punct>[{}.;])
    """,
    re.X | re.I,
)
_WS_RE = re.compile(r"(?:\s+|\#[^\n]*)+")

# SPARQL ECHAR: \t \b \n \r \f \" \' \\ — decoded to the CONTROL character,
# never the letter; unknown escapes are a loud error (reject, don't guess).
_ECHAR = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
_ESC_RE = re.compile(r"\\(.)")


def _unescape_literal(body: str) -> str:
    def sub(m: re.Match) -> str:
        c = m.group(1)
        try:
            return _ECHAR[c]
        except KeyError:
            raise ParseError(f"unknown literal escape \\{c!r} in SPARQL string")

    return _ESC_RE.sub(sub, body)


def _tokenize(text: str):
    pos, n = 0, len(text)
    out = []
    while pos < n:
        m = _WS_RE.match(text, pos)
        if m:
            pos = m.end()
            if pos >= n:
                break
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"unlexable SPARQL at offset {pos}: {text[pos:pos+30]!r}")
        kind = m.lastgroup
        val = m.group(kind)
        if kind == "kw":
            kind = val.upper()
        out.append((kind, val))
        pos = m.end()
    return out


class _SelectParser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        if self.i >= len(self.toks):
            raise ParseError("unexpected end of SPARQL query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, kind):
        k, v = self._next()
        if k != kind:
            raise ParseError(f"expected {kind}, got {v!r}")
        return v

    def _term(self) -> str:
        """→ the BGP executor's term syntax: '?var' or a raw constant."""
        k, v = self._next()
        if k == "var":
            return v
        if k == "iriref":
            return v[1:-1]
        if k == "pname":
            pfx, _, local = v.partition(":")
            ns = self.prefixes.get(pfx)
            if ns is None:
                raise ParseError(f"undeclared prefix {pfx!r}")
            return ns + local
        if k == "a_kw":
            return RDF_TYPE
        if k == "literal":
            return _unescape_literal(v[1:-1])
        raise ParseError(f"bad SPARQL term: {v!r}")

    def parse(self):
        while self._peek()[0] == "PREFIX":
            self._next()
            ns_tok = self._next()
            if ns_tok[0] == "pname_ns":
                pfx = ns_tok[1][:-1]
            elif ns_tok[0] == "pname" and ns_tok[1].endswith(":"):
                pfx = ns_tok[1][:-1]
            else:
                raise ParseError(f"bad PREFIX name: {ns_tok[1]!r}")
            iri = self._expect("iriref")
            self.prefixes[pfx] = iri[1:-1]
        self._expect("SELECT")
        distinct = False
        if self._peek()[0] == "DISTINCT":
            self._next()
            distinct = True
        project: list[str] | None = []
        if self._peek()[0] == "star":
            self._next()
            project = None  # all vars, in first-appearance order
        else:
            while self._peek()[0] == "var":
                project.append(self._next()[1][1:])
            if not project:
                raise ParseError("SELECT needs at least one ?var or *")
        self._expect("WHERE")
        if self._next() != ("punct", "{"):
            raise ParseError("expected { after WHERE")
        patterns = []
        while self._peek() != ("punct", "}"):
            s = self._term()
            p = self._term()
            o = self._term()
            patterns.append((s, p, o))
            if self._peek() == ("punct", "."):
                self._next()
        self._next()  # }
        if not patterns:
            raise ParseError("empty WHERE block")
        limit = None
        if self._peek()[0] == "LIMIT":
            self._next()
            limit = int(self._expect("integer"))
        if self._peek()[0] is not None:
            raise ParseError(f"trailing content after query: {self._peek()[1]!r}")
        if project is None:
            seen: dict[str, None] = {}
            for pat in patterns:
                for t in pat:
                    if t.startswith("?"):
                        seen[t[1:]] = None
            project = list(seen)
        return {
            "project": project,
            "patterns": patterns,
            "distinct": distinct,
            "limit": limit,
        }


def parse_select(text: str) -> dict:
    """SPARQL SELECT (restricted fragment) → {project, patterns, distinct,
    limit} ready for pipelines/bgp.bgp_execute."""
    return _SelectParser(text).parse()
