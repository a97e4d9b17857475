"""Minimal N-Triples reader/writer (for W3C goldens and debugging).

Covers the full N-Triples grammar needed by the W3C RDF 1.1 XML suite's
``.nt`` expected files (reference harness: w3c_test.exs:48-60 reads them via
RDF.NTriples).
"""

from __future__ import annotations

import re

from .terms import BNode, IRI, Literal, ParseError

_ESCAPES = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f", '"': '"', "'": "'", "\\": "\\"}

_TERM_RE = re.compile(
    r"""\s*(?:
        <(?P<iri>[^>]*)>
      | _:(?P<bnode>\S+?)(?=\s|$)
      | "(?P<lit>(?:[^"\\]|\\.)*)"
          (?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9\-]+))?
    )""",
    re.X,
)


def _unescape(s: str) -> str:
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _parse_term(line: str, pos: int):
    m = _TERM_RE.match(line, pos)
    if not m:
        raise ParseError(f"bad N-Triples term at: {line[pos:]!r}")
    if m.group("iri") is not None:
        return IRI(_unescape(m.group("iri"))), m.end()
    if m.group("bnode") is not None:
        return BNode(m.group("bnode")), m.end()
    lex = _unescape(m.group("lit"))
    return Literal(lex, lang=m.group("lang"), datatype=m.group("dt")), m.end()


def parse_ntriples(text: str) -> list[tuple]:
    triples = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        s, pos = _parse_term(line, 0)
        p, pos = _parse_term(line, pos)
        o, pos = _parse_term(line, pos)
        rest = line[pos:].strip()
        if rest != ".":
            raise ParseError(f"trailing content in N-Triples line: {raw!r}")
        triples.append((s, p, o))
    return triples


def _escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def term_to_nt(term) -> str:
    if isinstance(term, Literal):
        base = f'"{_escape(term.lexical)}"'
        if term.lang:
            return f"{base}@{term.lang}"
        if term.datatype:
            return f"{base}^^<{term.datatype}>"
        return base
    if isinstance(term, BNode):
        return f"_:{term}"
    return f"<{term}>"


def to_ntriples(triples) -> str:
    return "".join(f"{term_to_nt(s)} {term_to_nt(p)} {term_to_nt(o)} .\n" for s, p, o in triples)


# ------------------------------------------------- bnode label conformance

# Internal bnode labels ({conv_id}!b{k}) contain '!', which is outside
# PN_CHARS, so raw emission would be spec-invalid BLANK_NODE_LABEL syntax
# and conformant downstream parsers (rdflib, Jena, the reference's
# RDF.NTriples reader — lib/rdf/ntriples naming per w3c_test.exs:54) would
# reject the exported file. The sinks encode labels reversibly; the Dataset
# readers decode, so write→read roundtrips preserve the internal labels the
# SQL oracle depends on.
_BNODE_PLAIN_RE = re.compile(r"[A-Za-z0-9]+\Z")
_BNODE_ESC_RE = re.compile(r"_(?:U([0-9a-f]{8})|u([0-9a-f]{4})|([0-9a-f]{2}))")


def encode_bnode_label(label: str) -> str:
    """Internal bnode label → spec-valid BLANK_NODE_LABEL.

    Every char outside [A-Za-z0-9] becomes ``_xx`` / ``_uxxxx`` /
    ``_Uxxxxxxxx`` (lowercase hex). '_' itself (0x5f) is escaped, so the
    escape introducer never appears bare — encode∘decode is the identity
    for arbitrary labels. Output chars are all PN_CHARS_U | digits, valid
    in any BLANK_NODE_LABEL position."""
    if _BNODE_PLAIN_RE.match(label):
        return label
    out = []
    for c in label:
        if c.isascii() and c.isalnum():
            out.append(c)
        else:
            cp = ord(c)
            if cp <= 0xFF:
                out.append(f"_{cp:02x}")
            elif cp <= 0xFFFF:
                out.append(f"_u{cp:04x}")
            else:
                out.append(f"_U{cp:08x}")
    return "".join(out)


def ncname_bnode_label(label: str) -> str:
    """Internal bnode label → NCName-valid ``rdf:nodeID`` value for the
    RDF/XML sinks. BLANK_NODE_LABEL allows a leading digit; NCName does
    not, so prefix EVERY encoded label with 'n' (unconditional — a
    prefix-if-needed scheme loses injectivity: encode('n2024!b0') and
    'n' + encode('2024!b0') would collide). The encoded alphabet is
    [A-Za-z0-9_], so 'n' + encoding is always a valid NCName. Identity is
    per-document on the RDF/XML read side (conformant parsers re-mint
    nodeID labels), so this is deliberately not part of the reversible
    encode/decode pair."""
    return "n" + encode_bnode_label(label)


def decode_bnode_label(label: str) -> str:
    """Inverse of encode_bnode_label (no-op on labels without '_')."""
    if "_" not in label:
        return label
    return _BNODE_ESC_RE.sub(
        lambda m: chr(int(m.group(1) or m.group(2) or m.group(3), 16)), label
    )


# ------------------------------------------------------------------ N-Quads

def parse_nquads(text: str) -> list[tuple]:
    """N-Quads lines → (s, p, o, graph|None). The graph term is an optional
    IRI or blank node (RDF 1.1 N-Quads grammar); None = default graph."""
    quads = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        s, pos = _parse_term(line, 0)
        p, pos = _parse_term(line, pos)
        o, pos = _parse_term(line, pos)
        rest = line[pos:].strip()
        g = None
        if rest != ".":
            g, pos = _parse_term(line, pos)
            if isinstance(g, Literal):
                raise ParseError(f"literal graph label in N-Quads line: {raw!r}")
            rest = line[pos:].strip()
            if rest != ".":
                raise ParseError(f"trailing content in N-Quads line: {raw!r}")
        quads.append((s, p, o, g))
    return quads


def to_nquads(quads) -> str:
    return "".join(
        f"{term_to_nt(s)} {term_to_nt(p)} {term_to_nt(o)}"
        + (f" {term_to_nt(g)} .\n" if g is not None else " .\n")
        for s, p, o, g in quads
    )
