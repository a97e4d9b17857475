"""Encoder tests: exact-string assertions + decode round-trips, mirroring the
reference's strategy (/root/reference/test/unit/encoder_test.exs)."""

import pytest

from rdf_xml_ex_ray.core.model import Graph
from rdf_xml_ex_ray.core.terms import (
    RDF_NS,
    RDF_TYPE,
    RDF_XML_LITERAL,
    BNode,
    EncodeError,
    IRI,
    Literal,
)
from rdf_xml_ex_ray.core.isomorphism import isomorphic
from rdf_xml_ex_ray.decoder.parser import parse_rdfxml
from rdf_xml_ex_ray.encoder.encoder import XML_DECL, encode, encode_description, qname

EG = "http://example.org/"
PFX = {"rdf": RDF_NS, "eg": EG}


def test_simple_description_exact():
    g = Graph(
        [(IRI(EG + "s"), IRI(EG + "p"), IRI(EG + "o"))],
        prefixes=PFX,
    )
    assert encode(g) == (
        XML_DECL
        + f'<rdf:RDF xmlns:eg="{EG}" xmlns:rdf="{RDF_NS}">'
        + f'<rdf:Description rdf:about="{EG}s"><eg:p rdf:resource="{EG}o"/></rdf:Description>'
        + "</rdf:RDF>"
    )


def test_type_node_shortening():
    g = Graph(
        [
            (IRI(EG + "s"), IRI(RDF_TYPE), IRI(EG + "Widget")),
            (IRI(EG + "s"), IRI(EG + "p"), Literal("v")),
        ],
        prefixes=PFX,
    )
    out = encode(g, xml_declaration=False)
    assert f'<eg:Widget rdf:about="{EG}s"><eg:p>v</eg:p></eg:Widget>' in out


def test_literal_forms():
    s = IRI(EG + "s")
    desc = encode_description(
        s,
        [
            (s, IRI(EG + "a"), Literal("plain")),
            (s, IRI(EG + "b"), Literal("tagged", lang="en")),
            (s, IRI(EG + "c"), Literal("42", datatype="http://www.w3.org/2001/XMLSchema#integer")),
            (s, IRI(EG + "d"), Literal("<x>y</x>", datatype=RDF_XML_LITERAL)),
            (s, IRI(EG + "e"), BNode("n1")),
        ],
        prefixes=PFX,
    )
    assert "<eg:a>plain</eg:a>" in desc
    assert '<eg:b xml:lang="en">tagged</eg:b>' in desc
    assert '<eg:c rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</eg:c>' in desc
    assert '<eg:d rdf:parseType="Literal"><x>y</x></eg:d>' in desc
    assert '<eg:e rdf:nodeID="n1"/>' in desc


def test_base_relativization_and_rdf_id():
    base = "http://example.org/doc"
    s = IRI(base + "#frag")
    out = encode_description(s, [(s, IRI(EG + "p"), Literal("v"))], base=base, prefixes=PFX)
    assert 'rdf:about="#frag"' in out
    out_id = encode_description(
        s, [(s, IRI(EG + "p"), Literal("v"))], base=base, prefixes=PFX, use_rdf_id=True
    )
    assert 'rdf:ID="frag"' in out_id


def test_unknown_property_prefix_errors():
    s = IRI(EG + "s")
    with pytest.raises(EncodeError):
        encode_description(s, [(s, IRI("http://nowhere/unknown#p"), Literal("v"))], prefixes=PFX)


def test_escaping():
    s = IRI(EG + "s")
    out = encode_description(s, [(s, IRI(EG + "p"), Literal('a<b>&"c'))], prefixes=PFX)
    assert "<eg:p>a&lt;b&gt;&amp;\"c</eg:p>" in out


def test_implicit_base_and_xml_base_attr():
    g = Graph([(IRI(EG + "s"), IRI(EG + "p"), Literal("v"))], prefixes=PFX)
    with_base = encode(g, base="http://example.org/")
    assert 'xml:base="http://example.org/"' in with_base
    no_base = encode(g, base="http://example.org/", implicit_base=True)
    assert "xml:base" not in no_base
    assert 'rdf:about="s"' in no_base


def test_qname_default_prefix():
    assert qname(EG + "p", {None: EG}) == "p"
    assert qname(EG + "p", PFX) == "eg:p"
    assert qname("http://nowhere/x/y", PFX) is None


@pytest.mark.parametrize("lang,dt", [(None, None), ("en", None), (None, "http://www.w3.org/2001/XMLSchema#date")])
def test_roundtrip(lang, dt):
    s = IRI(EG + "s")
    triples = {
        (s, IRI(RDF_TYPE), IRI(EG + "T")),
        (s, IRI(EG + "p"), Literal("hello <&> world", lang=lang, datatype=dt)),
        (s, IRI(EG + "q"), BNode("x1")),
        (BNode("x1"), IRI(EG + "r"), Literal("nested")),
    }
    g = Graph(triples, prefixes=PFX)
    out = encode(g)
    g2 = parse_rdfxml(out, base="http://example.org/")
    assert isomorphic(g2.triples(), triples)


def test_roundtrip_xmlliteral():
    s = IRI(EG + "s")
    lex = '<x:a xmlns:x="http://x/">t<x:b></x:b></x:a>'
    g = Graph({(s, IRI(EG + "p"), Literal(lex, datatype=RDF_XML_LITERAL))}, prefixes=PFX)
    g2 = parse_rdfxml(encode(g), base="http://example.org/")
    assert isomorphic(g2.triples(), g.triples())


def test_real_world_roundtrip_org_ontology():
    """Decode the reference's bench corpus (W3C org ontology, 748 triples),
    re-encode with the document's own prefixes, decode again → isomorphic."""
    import os

    path = "/root/reference/bench/data/org.rdf"
    if not os.path.exists(path):
        pytest.skip("reference bench corpus unavailable")
    with open(path, "rb") as f:
        g1 = parse_rdfxml(f.read(), base="http://www.w3.org/ns/org")
    assert len(g1) == 748
    xml = encode(g1, base=g1.base_iri, prefixes=g1.prefixes)
    g2 = parse_rdfxml(xml, base="http://www.w3.org/ns/org")
    assert isomorphic(g2.triples(), g1.triples())
