import pytest

from rdf_xml_ex_ray.core.terms import (
    Literal,
    ParseError,
    check_nc_name,
    is_absolute_iri,
    make_rdf_id,
    normalize_base_uri,
    qname_to_iri,
    resolve_iri,
)


def test_absolute_iri_detection():
    assert is_absolute_iri("http://example.org/a")
    assert is_absolute_iri("urn:uuid:abc")
    assert is_absolute_iri("mailto:a@b.c")
    assert not is_absolute_iri("relative/path")
    assert not is_absolute_iri("#frag")
    assert not is_absolute_iri("")


def test_resolve_against_base():
    base = "http://example.org/dir/doc.rdf"
    assert resolve_iri("http://other/x", base) == "http://other/x"
    assert resolve_iri("", base) == base
    assert resolve_iri("#frag", base) == base + "#frag"
    assert resolve_iri("other.rdf", base) == "http://example.org/dir/other.rdf"
    assert resolve_iri("/abs", base) == "http://example.org/abs"
    assert resolve_iri("../up", base) == "http://example.org/up"


def test_resolve_generic_schemes():
    """RFC 3986 merge must work for bases outside urljoin's uses_relative
    whitelist (tag:, urn:, doi:) — a relative ref must never leak through
    unresolved (ADVICE r1)."""
    assert resolve_iri("c", "tag:example/a/b") == "tag:example/a/c"
    assert resolve_iri("./c", "tag:example/a/b") == "tag:example/a/c"
    assert resolve_iri("../c", "tag:example/a/b") == "tag:example/c"
    assert resolve_iri("x/y", "urn:foo/bar") == "urn:foo/x/y"
    assert resolve_iri("z", "doi:10.1000/182") == "doi:10.1000/z"
    # urljoin-equivalent behavior for http must be preserved (W3C suite)
    assert resolve_iri("//other/p", "http://example.org/d/x") == "http://other/p"
    assert resolve_iri("?q=1", "http://example.org/d/x") == "http://example.org/d/x?q=1"
    assert resolve_iri("a/./b/../c", "http://e.org/d/x") == "http://e.org/d/a/c"
    assert resolve_iri("g", "http://e.org") == "http://e.org/g"


def test_escaping_control_chars():
    """\\r survives text content; \\t/\\n/\\r survive attribute values
    (XML parsers normalize raw ones — ADVICE r1)."""
    from rdf_xml_ex_ray.core.terms import escape_attr, escape_text

    assert escape_text("a\rb") == "a&#xD;b"
    assert escape_text("a\r\nb") == "a&#xD;\nb"
    assert escape_attr("a\tb\nc\rd") == "a&#x9;b&#xA;c&#xD;d"


def test_resolve_without_base_errors():
    with pytest.raises(ParseError):
        resolve_iri("relative", None)


def test_normalize_base_strips_fragment():
    assert normalize_base_uri("http://e.org/d#frag") == "http://e.org/d"
    assert normalize_base_uri("http://e.org/d") == "http://e.org/d"
    assert normalize_base_uri(None) is None
    with pytest.raises(ParseError):
        normalize_base_uri("http://e.org/d#a#b")


def test_rdf_id():
    assert make_rdf_id("name", "http://e.org/doc") == "http://e.org/doc#name"
    with pytest.raises(ParseError):
        make_rdf_id("name", None)
    with pytest.raises(ParseError):
        make_rdf_id("1bad", "http://e.org/doc")


def test_ncname():
    for ok in ["a", "_x", "a1", "a.b-c_d", "ü"]:
        check_nc_name(ok)
    for bad in ["1a", "-a", ".a", "a:b", "a/b", "a b", ""]:
        with pytest.raises(ParseError):
            check_nc_name(bad)


def test_qname_resolution():
    ns = {"eg": "http://e.org/", None: "http://d.org/"}
    assert qname_to_iri("eg:p", ns) == "http://e.org/p"
    assert qname_to_iri("p", ns) == "http://d.org/p"
    with pytest.raises(ParseError):
        qname_to_iri("nope:p", ns)


def test_literal_equality_semantics():
    assert Literal("a", lang="EN") == Literal("a", lang="en")
    assert Literal("a") == Literal("a", datatype="http://www.w3.org/2001/XMLSchema#string")
    assert Literal("a") != Literal("a", lang="en")
    assert Literal("1", datatype="http://x/int") != Literal("1")
