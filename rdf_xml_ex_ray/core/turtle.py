"""General Turtle 1.1 parser (tokenizer + recursive descent).

Covers the grammar a real-world Turtle consumer needs — prefixed names
(incl. PN_LOCAL escapes and %-encoding), ``a``, collections, blank-node
property lists, ANON, short/long single/double-quoted literals with
ECHAR/UCHAR escapes, language tags, datatyped literals, numeric/boolean
shorthand, ``@prefix``/``@base`` and their SPARQL-style forms, comments,
and base-relative IRI resolution.

Reference parity: the reference harness loads the W3C suite's
``manifest.ttl`` through a full Turtle parser (test/support/test_suite.ex:
41-48 via RDF.Turtle.read_file!); this module gives the engine the same
capability — tests/w3c_corpus.py drives case discovery from the manifest
with it.

Deliberately out of scope (errors, not silent misparses): ``@forAll`` /
N3 extensions, RDF-star quoted triples.
"""

from __future__ import annotations

import re

from .ntriples import _unescape
from .terms import BNode, IRI, Literal, ParseError, resolve_iri

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_FIRST = IRI(RDF_NS + "first")
RDF_REST = IRI(RDF_NS + "rest")
RDF_NIL = IRI(RDF_NS + "nil")
RDF_TYPE = IRI(RDF_NS + "type")

# --------------------------------------------------------------- tokenizer

_PCB = (
    "A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D"
    "\u037F-\u1FFF\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF"
    "\u3001-\uD7FF\uF900-\uFDCF\uFDF0-\uFFFD\U00010000-\U000EFFFF"
)
_PCU = _PCB + "_"
_PC = _PCU + "0-9\\-\u00B7\u0300-\u036F\u203F-\u2040"

_PN_PREFIX = f"[{_PCB}](?:[{_PC}.]*[{_PC}])?"
_PLX = r"%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%]"
_PN_LOCAL = (
    f"(?:[{_PCU}0-9:]|{_PLX})"
    f"(?:(?:[{_PC}.:]|{_PLX})*(?:[{_PC}:]|{_PLX}))?"
)
_BNODE_LABEL = f"[{_PCU}0-9](?:[{_PC}.]*[{_PC}])?"

_ECHAR_OR_UCHAR = r"\\(?:[tbnrf\"'\\]|u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8})"

_TOKEN_RE = re.compile(
    r"""
      (?P<iriref><(?:[^\x00-\x20<>"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
    | (?P<prefix_kw>@prefix\b|PREFIX\b)
    | (?P<base_kw>@base\b|BASE\b)
    | (?P<long_dq>\"\"\"(?:(?:\"|\"\")?(?:[^"\\]|%(esc)s))*\"\"\")
    | (?P<long_sq>'''(?:(?:'|'')?(?:[^'\\]|%(esc)s))*''')
    | (?P<short_dq>"(?:[^"\\\n\r]|%(esc)s)*")
    | (?P<short_sq>'(?:[^'\\\n\r]|%(esc)s)*')
    | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<double>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<bnode>_:%(bl)s)
    | (?P<pname>(?:%(pp)s)?:(?:%(pl)s)?)
    | (?P<kw_a>a(?=[\s<("'\[]|\#|$))
    | (?P<kw_bool>(?:true|false)(?=[\s.;,)\]]|\#|$))
    | (?P<graph_kw>[Gg][Rr][Aa][Pp][Hh](?=[ \t\r\n<_\[{#]))
    | (?P<dtsep>\^\^)
    | (?P<punct>[.;,()\[\]{}])
    """
    % {"esc": _ECHAR_OR_UCHAR, "bl": _BNODE_LABEL, "pp": _PN_PREFIX, "pl": _PN_LOCAL},
    re.X,
)

_WS_RE = re.compile(r"(?:[ \t\r\n]+|\#[^\n]*)+")

_PN_LOCAL_ESC_RE = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")


def _tokenize(text: str):
    """Yield (kind, value) pairs; raises ParseError on unlexable input."""
    pos, n = 0, len(text)
    while pos < n:
        m = _WS_RE.match(text, pos)
        if m:
            pos = m.end()
            if pos >= n:
                break
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ParseError(f"unlexable Turtle at offset {pos}: {text[pos:pos+40]!r}")
        kind = m.lastgroup
        yield kind, m.group(kind)
        pos = m.end()


# ------------------------------------------------------------------ parser


class _TurtleParser:
    def __init__(self, text: str, base: str | None):
        self.tokens = list(_tokenize(text))
        self.i = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple] = []
        self._genid = 0

    # --- token stream helpers

    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def _next(self):
        if self.i >= len(self.tokens):
            raise ParseError("unexpected end of Turtle document")
        t = self.tokens[self.i]
        self.i += 1
        return t

    def _expect_punct(self, ch: str):
        kind, val = self._next()
        if kind != "punct" or val != ch:
            raise ParseError(f"expected {ch!r}, got {val!r}")

    def _fresh_bnode(self) -> BNode:
        # '!' cannot occur in a parsed BLANK_NODE_LABEL, so generated labels
        # can never collide with document labels
        self._genid += 1
        return BNode(f"!g{self._genid}")

    # --- term constructors

    def _iri(self, raw: str) -> IRI:
        value = _unescape(raw[1:-1])
        if self.base is not None:
            value = resolve_iri(value, self.base)
        return IRI(value)

    def _pname(self, raw: str) -> IRI:
        pfx, _, local = raw.partition(":")
        ns = self.prefixes.get(pfx)
        if ns is None:
            raise ParseError(f"undeclared prefix {pfx!r}")
        return IRI(ns + _PN_LOCAL_ESC_RE.sub(r"\1", local))

    # --- grammar

    def parse(self):
        while self._peek()[0] is not None:
            self._statement()
        return self.triples

    def _statement(self):
        kind, val = self._peek()
        if kind == "prefix_kw":
            self._next()
            k2, v2 = self._next()
            if k2 != "pname" or not v2.endswith(":"):
                raise ParseError(f"bad prefix name in @prefix: {v2!r}")
            k3, v3 = self._next()
            if k3 != "iriref":
                raise ParseError(f"bad namespace in @prefix: {v3!r}")
            self.prefixes[v2[:-1]] = str(self._iri(v3))
            if val == "@prefix":
                self._expect_punct(".")
        elif kind == "base_kw":
            self._next()
            k2, v2 = self._next()
            if k2 != "iriref":
                raise ParseError(f"bad IRI in @base: {v2!r}")
            self.base = str(self._iri(v2))
            if val == "@base":
                self._expect_punct(".")
        else:
            subj, had_props = self._subject()
            if self._peek() == ("punct", "."):
                if not had_props:
                    raise ParseError("subject without predicate-object list")
            else:
                self._predicate_object_list(subj)
            self._expect_punct(".")

    def _subject(self):
        """Returns (term, had_props): blankNodePropertyList subjects may
        carry their whole statement inside the brackets."""
        kind, val = self._next()
        if kind == "iriref":
            return self._iri(val), False
        if kind == "pname":
            return self._pname(val), False
        if kind == "bnode":
            return BNode(val[2:]), False
        if kind == "punct" and val == "(":
            return self._collection(), False
        if kind == "punct" and val == "[":
            node, n_props = self._bnode_property_list()
            return node, n_props > 0
        raise ParseError(f"bad Turtle subject: {val!r}")

    def _predicate_object_list(self, subj):
        while True:
            kind, val = self._next()
            if kind == "kw_a":
                pred = RDF_TYPE
            elif kind == "iriref":
                pred = self._iri(val)
            elif kind == "pname":
                pred = self._pname(val)
            else:
                raise ParseError(f"bad Turtle predicate: {val!r}")
            while True:
                obj = self._object()
                self.triples.append((subj, pred, obj))
                if self._peek() == ("punct", ","):
                    self._next()
                    continue
                break
            if self._peek() == ("punct", ";"):
                # consume runs of ';' (trailing ';' before '.' is legal)
                while self._peek() == ("punct", ";"):
                    self._next()
                nk, nv = self._peek()
                if nk in ("iriref", "pname", "kw_a"):
                    continue
            return

    def _object(self):
        kind, val = self._next()
        if kind == "iriref":
            return self._iri(val)
        if kind == "pname":
            return self._pname(val)
        if kind == "bnode":
            return BNode(val[2:])
        if kind == "punct" and val == "(":
            return self._collection()
        if kind == "punct" and val == "[":
            node, _ = self._bnode_property_list()
            return node
        if kind in ("long_dq", "long_sq", "short_dq", "short_sq"):
            return self._literal_tail(val, kind)
        if kind == "integer":
            return Literal(val, datatype=XSD_NS + "integer")
        if kind == "decimal":
            return Literal(val, datatype=XSD_NS + "decimal")
        if kind == "double":
            return Literal(val, datatype=XSD_NS + "double")
        if kind == "kw_bool":
            return Literal(val, datatype=XSD_NS + "boolean")
        raise ParseError(f"bad Turtle object: {val!r}")

    def _literal_tail(self, raw: str, kind: str) -> Literal:
        q = 3 if kind.startswith("long") else 1
        lex = _unescape(raw[q:-q])
        nk, nv = self._peek()
        if nk == "langtag":
            self._next()
            return Literal(lex, lang=nv[1:])
        if nk == "dtsep":
            self._next()
            dk, dv = self._next()
            if dk == "iriref":
                return Literal(lex, datatype=str(self._iri(dv)))
            if dk == "pname":
                return Literal(lex, datatype=str(self._pname(dv)))
            raise ParseError(f"bad datatype after ^^: {dv!r}")
        return Literal(lex)

    def _collection(self) -> IRI | BNode:
        """'(' already consumed; builds the rdf:first/rest chain."""
        items = []
        while self._peek() != ("punct", ")"):
            items.append(self._object())
        self._next()  # ')'
        head: IRI | BNode = RDF_NIL
        for item in reversed(items):
            node = self._fresh_bnode()
            self.triples.append((node, RDF_FIRST, item))
            self.triples.append((node, RDF_REST, head))
            head = node
        return head

    def _bnode_property_list(self):
        """'[' already consumed; returns (bnode, n_props)."""
        node = self._fresh_bnode()
        if self._peek() == ("punct", "]"):
            self._next()
            return node, 0
        before = len(self.triples)
        self._predicate_object_list(node)
        self._expect_punct("]")
        return node, len(self.triples) - before


def parse_turtle(text: str, base: str | None = None) -> list[tuple]:
    """Turtle document → list of (subject, predicate, object) term triples.

    ``base`` seeds relative-IRI resolution (``@base`` directives override
    it mid-document); with no base, relative IRIs pass through unresolved.
    """
    return _TurtleParser(text, base).parse()


# ------------------------------------------------------------------- TriG

class _TriGParser(_TurtleParser):
    """TriG 1.1 = Turtle + graph blocks: ``[GRAPH] label { triples }``,
    label-less ``{ triples }`` (default graph), and bare Turtle statements
    (also default graph). Inherits every Turtle production; only the
    statement dispatcher and the brace-block loop are new."""

    def __init__(self, text: str, base: str | None):
        super().__init__(text, base)
        self.quads: list[tuple] = []

    def _peek2(self):
        return self.tokens[self.i + 1] if self.i + 1 < len(self.tokens) else (None, None)

    def _flush(self, graph):
        self.quads.extend((s, p, o, graph) for s, p, o in self.triples)
        self.triples.clear()

    def parse_quads(self):
        while self._peek()[0] is not None:
            kind, val = self._peek()
            if kind in ("prefix_kw", "base_kw"):
                self._statement()  # directives mutate parser state only
            elif kind == "graph_kw":
                self._next()
                graph = self._graph_label()
                self._wrapped_graph(graph)
            elif kind == "punct" and val == "{":
                self._wrapped_graph(None)
            elif kind in ("iriref", "pname", "bnode") and self._peek2() == ("punct", "{"):
                graph = self._graph_label()
                self._wrapped_graph(graph)
            else:
                self._statement()
                self._flush(None)
        return self.quads

    def _graph_label(self):
        kind, val = self._next()
        if kind == "iriref":
            return self._iri(val)
        if kind == "pname":
            return self._pname(val)
        if kind == "bnode":
            return BNode(val[2:])
        raise ParseError(f"bad TriG graph label: {val!r}")

    def _wrapped_graph(self, graph):
        self._expect_punct("{")
        while self._peek() != ("punct", "}"):
            subj, had_props = self._subject()
            nxt = self._peek()
            if nxt in (("punct", "."), ("punct", "}")):
                if not had_props:
                    raise ParseError("subject without predicate-object list in graph block")
            else:
                self._predicate_object_list(subj)
            if self._peek() == ("punct", "."):
                self._next()  # '.' separators; the one before '}' is optional
        self._next()  # '}'
        self._flush(graph)


def parse_trig(text: str, base: str | None = None) -> list[tuple]:
    """TriG document → list of (subject, predicate, object, graph|None)."""
    return _TriGParser(text, base).parse_quads()
