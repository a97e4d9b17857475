"""RDF term model + IRI/QName/NCName machinery.

Semantics mirror the reference decoder's term handling
(/root/reference/lib/rdf/xml/decoder/element_node.ex:63-256) without porting
its code: absolute IRIs are kept verbatim, relative references resolve against
the in-scope base per RFC 3986, ``rdf:ID`` values append ``#name`` to the
base, and base URIs get their fragment stripped.
"""

from __future__ import annotations

import re

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
XML_NS = "http://www.w3.org/XML/1998/namespace"

RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_STATEMENT = RDF_NS + "Statement"
RDF_SUBJECT = RDF_NS + "subject"
RDF_PREDICATE = RDF_NS + "predicate"
RDF_OBJECT = RDF_NS + "object"
RDF_XML_LITERAL = RDF_NS + "XMLLiteral"
RDF_LANG_STRING = RDF_NS + "langString"
XSD_STRING = XSD_NS + "string"

# Syntax-term partitions per the RDF/XML grammar (reference:
# /root/reference/lib/rdf/xml/decoder.ex:24-25). Local names within RDF_NS.
CORE_SYNTAX_TERMS = frozenset({"RDF", "ID", "about", "parseType", "resource", "nodeID", "datatype"})
OLD_TERMS = frozenset({"aboutEach", "aboutEachPrefix", "bagID"})

DEFAULT_PREFIXES = {"rdf": RDF_NS, "rdfs": RDFS_NS, "xsd": XSD_NS}


class ParseError(Exception):
    """RDF/XML syntax or grammar violation (decode side)."""


class EncodeError(Exception):
    """RDF/XML serialization failure (encode side)."""


class IRI(str):
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<{str.__str__(self)}>"


class BNode(str):
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"_:{str.__str__(self)}"


class Literal:
    __slots__ = ("lexical", "lang", "datatype")

    def __init__(self, lexical: str, lang: str | None = None, datatype: str | None = None):
        self.lexical = lexical
        self.lang = lang or None
        # xsd:string is the implicit datatype of plain literals (RDF 1.1)
        self.datatype = None if datatype in (None, XSD_STRING) else datatype

    def key(self):
        return (self.lexical, (self.lang or "").lower(), self.datatype)

    def __eq__(self, other) -> bool:
        return isinstance(other, Literal) and self.key() == other.key()

    def __hash__(self) -> int:
        return hash(("lit", self.key()))

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        if self.lang:
            return f'"{self.lexical}"@{self.lang}'
        if self.datatype:
            return f'"{self.lexical}"^^<{self.datatype}>'
        return f'"{self.lexical}"'


Term = "IRI | BNode | Literal"

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

# Pragmatic NCName (XML 1.0 5th ed NCNameStartChar/NCNameChar). Intentionally
# start-char-strict (no leading digit/-/.) because W3C negative cases hinge on
# that; the reference is looser (element_node.ex:245-256).
_NC_START = (
    "A-Za-z_\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D\u037F-\u1FFF"
    "\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF\uF900-\uFDCF"
    "\uFDF0-\uFFFD"
)
_NC_CHAR = _NC_START + "0-9.\\-\u00B7\u0300-\u036F\u203F-\u2040"
_NCNAME_RE = re.compile(f"^[{_NC_START}][{_NC_CHAR}]*$")


def is_absolute_iri(value: str) -> bool:
    return bool(_SCHEME_RE.match(value))


# RFC 3986 §3 component split (appendix B regex, anchored groups)
_URI_SPLIT_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"
)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1) if path.startswith("/") else path.find("/")
            if i == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _recompose(scheme, authority, path, query, fragment) -> str:
    out = []
    if scheme is not None:
        out += [scheme, ":"]
    if authority is not None:
        out += ["//", authority]
    out.append(path)
    if query is not None:
        out += ["?", query]
    if fragment is not None:
        out += ["#", fragment]
    return "".join(out)


def resolve_iri(value: str, base: str | None) -> str:
    """RFC 3986 §5 reference resolution; absolute refs are kept verbatim.

    Mirrors ``uri_reference/3`` (element_node.ex:195-211): an absolute IRI is
    NOT normalized, a relative one without a base is an error. The merge is
    the generic RFC 3986 algorithm — it works for ANY base scheme (tag:,
    urn:, doi:, …), unlike ``urllib.parse.urljoin``, which only merges for
    schemes in its ``uses_relative`` whitelist and would return a relative
    reference unresolved.
    """
    if is_absolute_iri(value):
        return value
    if base is None:
        raise ParseError(f"use of a relative URI without providing a base URI: {value}")
    if value == "":
        return base
    if value.startswith("#"):
        return base.split("#", 1)[0] + value

    b_scheme, b_auth, b_path, b_query, _ = _URI_SPLIT_RE.match(base).groups()
    r_scheme, r_auth, r_path, r_query, r_frag = _URI_SPLIT_RE.match(value).groups()
    if r_scheme is not None:  # pragma: no cover - is_absolute_iri caught it
        return value
    if r_auth is not None:
        return _recompose(b_scheme, r_auth, _remove_dot_segments(r_path), r_query, r_frag)
    if r_path == "":
        path = b_path
        query = r_query if r_query is not None else b_query
    else:
        if r_path.startswith("/"):
            path = _remove_dot_segments(r_path)
        else:
            # §5.2.3 merge: an authority with an empty path merges at root
            if b_auth is not None and b_path == "":
                merged = "/" + r_path
            else:
                i = b_path.rfind("/")
                merged = (b_path[: i + 1] if i >= 0 else "") + r_path
            path = _remove_dot_segments(merged)
        query = r_query
    return _recompose(b_scheme, b_auth, path, query, r_frag)


def normalize_base_uri(base: str | None) -> str | None:
    """Strip the fragment from an http(s) base (element_node.ex:63-74)."""
    if base is None:
        return None
    if base.startswith("http"):
        parts = base.split("#")
        if len(parts) > 2:
            raise ParseError(f"invalid base URI: {base}")
        return parts[0]
    return base


def check_nc_name(name: str) -> str:
    if not _NCNAME_RE.match(name):
        raise ParseError(f"invalid NCName {name}")
    return name


def make_rdf_id(value: str, base: str | None) -> str:
    """``rdf:ID="name"`` → ``<base>#name`` (element_node.ex:213-226)."""
    if base is None:
        raise ParseError(f"use of rdf:ID without a base URI {value}")
    check_nc_name(value)
    return base + "#" + value


def split_qname(qname: str) -> tuple[str | None, str]:
    """Split ``prefix:local`` → (prefix, local); no colon → (None, name)."""
    if ":" in qname:
        prefix, local = qname.split(":", 1)
        return prefix, local
    return None, qname


def qname_to_iri(qname: str, ns: dict[str | None, str]) -> str:
    """Resolve a QName against in-scope namespace declarations.

    Unprefixed names fall back to the default namespace, matching the
    reference's lenient behavior (element_node.ex:228-243).
    """
    prefix, local = split_qname(qname)
    uri = ns.get(prefix)
    if uri is None:
        raise ParseError(f"can't resolve name {qname} to URI reference")
    return uri + local


def escape_text(text: str) -> str:
    # \r must be a character reference: an XML parser normalizes a literal
    # CR (and CRLF) in text content to LF on parse, which would silently
    # mutate "a\rb" → "a\nb" on every encode→decode roundtrip
    return (
        text.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace("\r", "&#xD;")
    )


def escape_attr(value: str) -> str:
    # \t/\n/\r in attribute values are normalized to spaces by XML
    # attribute-value normalization — escape all three as character refs
    return (
        value.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("\t", "&#x9;")
        .replace("\n", "&#xA;")
        .replace("\r", "&#xD;")
    )
