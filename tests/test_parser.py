"""Decoder unit tests mirroring the reference's coverage
(/root/reference/test/unit/decoder_test.exs — literals, lang/datatype tags,
nesting, parseType forms, reification, containers, property attributes,
xml:base, error cases) with independently-written cases."""

import pytest

from rdf_xml_ex_ray.core.terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_NS,
    RDF_REST,
    RDF_TYPE,
    RDF_XML_LITERAL,
    BNode,
    IRI,
    Literal,
    ParseError,
)
from rdf_xml_ex_ray.decoder.parser import parse_rdfxml

EG = "http://example.org/"
HDR = f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:eg="{EG}">'


def doc(body: str, header: str = HDR) -> str:
    return f'<?xml version="1.0"?>{header}{body}</rdf:RDF>'


def triples(body: str, **kw):
    return set(parse_rdfxml(doc(body), **kw).triples())


def test_plain_literal():
    assert triples(f'<rdf:Description rdf:about="{EG}s"><eg:p>hello</eg:p></rdf:Description>') == {
        (IRI(EG + "s"), IRI(EG + "p"), Literal("hello"))
    }


def test_lang_literal_inheritance():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s" xml:lang="fr"><eg:p>bonjour</eg:p>'
        f'<eg:q xml:lang="de">hallo</eg:q></rdf:Description>'
    )
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), Literal("bonjour", lang="fr")),
        (IRI(EG + "s"), IRI(EG + "q"), Literal("hallo", lang="de")),
    }


def test_datatyped_literal():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s">'
        f'<eg:p rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</eg:p>'
        f"</rdf:Description>"
    )
    assert got == {
        (
            IRI(EG + "s"),
            IRI(EG + "p"),
            Literal("42", datatype="http://www.w3.org/2001/XMLSchema#integer"),
        )
    }


def test_typed_node_shorthand():
    got = triples(f'<eg:Widget rdf:about="{EG}s"/>')
    assert got == {(IRI(EG + "s"), IRI(RDF_TYPE), IRI(EG + "Widget"))}


def test_property_attributes():
    got = triples(f'<rdf:Description rdf:about="{EG}s" eg:a="1" eg:b="2"/>')
    assert got == {
        (IRI(EG + "s"), IRI(EG + "a"), Literal("1")),
        (IRI(EG + "s"), IRI(EG + "b"), Literal("2")),
    }


def test_rdf_type_attribute_is_resolved_iri():
    got = triples(f'<rdf:Description rdf:about="{EG}s" rdf:type="{EG}T"/>')
    assert got == {(IRI(EG + "s"), IRI(RDF_TYPE), IRI(EG + "T"))}


def test_nested_node_element():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s"><eg:p>'
        f'<rdf:Description rdf:about="{EG}o"><eg:q>x</eg:q></rdf:Description>'
        f"</eg:p></rdf:Description>"
    )
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), IRI(EG + "o")),
        (IRI(EG + "o"), IRI(EG + "q"), Literal("x")),
    }


def test_rdf_resource_and_nodeid():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s"><eg:p rdf:resource="{EG}o"/>'
        f'<eg:q rdf:nodeID="n"/></rdf:Description>'
        f'<rdf:Description rdf:nodeID="n"><eg:r>v</eg:r></rdf:Description>'
    )
    bn = BNode("b0")
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), IRI(EG + "o")),
        (IRI(EG + "s"), IRI(EG + "q"), bn),
        (bn, IRI(EG + "r"), Literal("v")),
    }


def test_fresh_bnodes_and_prefix():
    got = triples("<eg:T><eg:p>x</eg:p></eg:T><eg:T/>", bnode_prefix="conv7!b")
    subs = {s for s, _, _ in got}
    assert BNode("conv7!b0") in subs and BNode("conv7!b1") in subs


def test_empty_property_element_empty_literal():
    got = triples(f'<rdf:Description rdf:about="{EG}s"><eg:p/></rdf:Description>')
    assert got == {(IRI(EG + "s"), IRI(EG + "p"), Literal(""))}


def test_parse_type_resource():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s">'
        f'<eg:p rdf:parseType="Resource"><eg:q>v</eg:q></eg:p></rdf:Description>'
    )
    bn = BNode("b0")
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), bn),
        (bn, IRI(EG + "q"), Literal("v")),
    }


def test_parse_type_collection():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s"><eg:p rdf:parseType="Collection">'
        f'<rdf:Description rdf:about="{EG}a"/><rdf:Description rdf:about="{EG}b"/>'
        f"</eg:p></rdf:Description>"
    )
    c0, c1 = BNode("b0"), BNode("b1")
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), c0),
        (c0, IRI(RDF_FIRST), IRI(EG + "a")),
        (c0, IRI(RDF_REST), c1),
        (c1, IRI(RDF_FIRST), IRI(EG + "b")),
        (c1, IRI(RDF_REST), IRI(RDF_NIL)),
    }


def test_parse_type_empty_collection():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s"><eg:p rdf:parseType="Collection"/></rdf:Description>'
    )
    assert got == {(IRI(EG + "s"), IRI(EG + "p"), IRI(RDF_NIL))}


def test_parse_type_literal_xmlliteral():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s">'
        f'<eg:p rdf:parseType="Literal"><eg:x>a<eg:y/>b</eg:x></eg:p></rdf:Description>'
    )
    [(s, p, o)] = list(got)
    assert o.datatype == RDF_XML_LITERAL
    assert o.lexical == f'<eg:x xmlns:eg="{EG}">a<eg:y></eg:y>b</eg:x>'


def test_parse_type_other_emits_nothing():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s">'
        f'<eg:p rdf:parseType="Bogus"><eg:x>ignored</eg:x></eg:p></rdf:Description>'
    )
    assert got == set()


def test_reification_via_property_rdf_id():
    base = "http://example.org/doc"
    got = set(
        parse_rdfxml(
            doc(f'<rdf:Description rdf:about="{EG}s"><eg:p rdf:ID="st">v</eg:p></rdf:Description>'),
            base=base,
        ).triples()
    )
    r = IRI(base + "#st")
    assert (IRI(EG + "s"), IRI(EG + "p"), Literal("v")) in got
    assert (r, IRI(RDF_TYPE), IRI(RDF_NS + "Statement")) in got
    assert (r, IRI(RDF_NS + "subject"), IRI(EG + "s")) in got
    assert (r, IRI(RDF_NS + "predicate"), IRI(EG + "p")) in got
    assert (r, IRI(RDF_NS + "object"), Literal("v")) in got
    assert len(got) == 5


def test_li_renumbering():
    got = triples(
        f'<rdf:Seq rdf:about="{EG}seq"><rdf:li>a</rdf:li><rdf:li>b</rdf:li></rdf:Seq>'
    )
    assert (IRI(EG + "seq"), IRI(RDF_NS + "_1"), Literal("a")) in got
    assert (IRI(EG + "seq"), IRI(RDF_NS + "_2"), Literal("b")) in got


def test_xml_base_scoping():
    g = parse_rdfxml(
        doc(
            '<rdf:Description xml:base="http://b.org/dir/doc" rdf:about="rel">'
            "<eg:p>x</eg:p></rdf:Description>"
        )
    )
    assert (IRI("http://b.org/dir/rel"), IRI(EG + "p"), Literal("x")) in set(g.triples())


def test_relative_uri_without_base_errors():
    with pytest.raises(ParseError):
        triples('<rdf:Description rdf:about="rel"><eg:p>x</eg:p></rdf:Description>')


def test_duplicate_rdf_id_errors():
    with pytest.raises(ParseError):
        parse_rdfxml(
            doc('<rdf:Description rdf:ID="x"/><rdf:Description rdf:ID="x"/>'),
            base="http://e.org/d",
        )


def test_mixed_content_errors():
    with pytest.raises(ParseError):
        triples(f'<rdf:Description rdf:about="{EG}s"><eg:p>t<eg:T/></eg:p></rdf:Description>')


def test_li_attribute_forbidden():
    with pytest.raises(ParseError):
        triples(f'<rdf:Description rdf:about="{EG}s" rdf:li="x"/>')


def test_old_terms_rejected():
    with pytest.raises(ParseError):
        triples(f'<rdf:Description rdf:aboutEach="{EG}s"/>')


def test_malformed_xml_errors():
    with pytest.raises(ParseError):
        parse_rdfxml("<rdf:RDF><unclosed>")


def test_graph_base_and_prefixes_recorded():
    g = parse_rdfxml(doc(f'<rdf:Description rdf:about="{EG}s"><eg:p>x</eg:p></rdf:Description>'))
    assert g.prefixes["rdf"] == RDF_NS
    assert g.prefixes["eg"] == EG
    g2 = parse_rdfxml(
        f'<rdf:RDF xmlns:rdf="{RDF_NS}" xml:base="http://b.org/x#f"></rdf:RDF>'
    )
    assert g2.base_iri == "http://b.org/x"


def test_rdf_rdf_optional():
    g = parse_rdfxml(f'<eg:T xmlns:eg="{EG}" rdf:about="{EG}s" xmlns:rdf="{RDF_NS}"/>')
    assert set(g.triples()) == {(IRI(EG + "s"), IRI(RDF_TYPE), IRI(EG + "T"))}


def test_syntax_terms_by_namespace_not_prefix():
    # rdf-ns-prefix-confusion semantics: the *namespace*, not the rdf: prefix
    g = parse_rdfxml(
        f'<RDF xmlns="{RDF_NS}" xmlns:eg="{EG}">'
        f'<Description about="{EG}s"><eg:p>v</eg:p></Description></RDF>'
    )
    assert set(g.triples()) == {(IRI(EG + "s"), IRI(EG + "p"), Literal("v"))}


def test_same_subject_descriptions_merge():
    # graph set semantics: two rdf:Description blocks for one subject merge,
    # duplicate triples collapse (reference decoder_test.exs:300-333)
    got = triples(
        f'<rdf:Description rdf:about="{EG}s"><eg:p>a</eg:p></rdf:Description>'
        f'<rdf:Description rdf:about="{EG}s"><eg:q>b</eg:q><eg:p>a</eg:p></rdf:Description>'
    )
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), Literal("a")),
        (IRI(EG + "s"), IRI(EG + "q"), Literal("b")),
    }


def test_xml_lang_empty_resets():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s" xml:lang="en">'
        f'<eg:p>tagged</eg:p><eg:q xml:lang="">plain</eg:q></rdf:Description>'
    )
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), Literal("tagged", lang="en")),
        (IRI(EG + "s"), IRI(EG + "q"), Literal("plain")),
    }


def test_whitespace_only_literal_preserved():
    got = triples(f'<rdf:Description rdf:about="{EG}s"><eg:p> </eg:p></rdf:Description>')
    assert got == {(IRI(EG + "s"), IRI(EG + "p"), Literal(" "))}


def test_empty_property_with_lang_is_empty_langstring():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s" xml:lang="de"><eg:p/></rdf:Description>'
    )
    assert got == {(IRI(EG + "s"), IRI(EG + "p"), Literal("", lang="de"))}


def test_datatype_on_empty_property_is_empty_typed_literal():
    # deliberate spec-correct divergence from the reference (which yields a
    # fresh bnode and drops the datatype, rules.ex:241-315): empty content +
    # rdf:datatype is the empty typed literal — roundtrippable via the
    # encoder (found by the hypothesis roundtrip property)
    got = triples(
        f'<rdf:Description rdf:about="{EG}s">'
        f'<eg:p rdf:datatype="http://www.w3.org/2001/XMLSchema#int"/></rdf:Description>'
    )
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), Literal("", datatype="http://www.w3.org/2001/XMLSchema#int"))
    }


def test_nested_rdf_rdf_forbidden():
    with pytest.raises(ParseError):
        triples("<rdf:RDF/>")


def test_property_rdf_id_with_resource_reifies():
    base = "http://example.org/doc"
    got = set(
        parse_rdfxml(
            doc(
                f'<rdf:Description rdf:about="{EG}s">'
                f'<eg:p rdf:ID="r" rdf:resource="{EG}o"/></rdf:Description>'
            ),
            base=base,
        ).triples()
    )
    assert (IRI(EG + "s"), IRI(EG + "p"), IRI(EG + "o")) in got
    assert (IRI(base + "#r"), IRI(RDF_NS + "object"), IRI(EG + "o")) in got
    assert len(got) == 5


def test_collection_bnode_allocation_order():
    # reference allocation order: member subjects first, then the list head,
    # then each link cell (rules.ex:367-404)
    got = triples(
        f'<rdf:Description rdf:about="{EG}s"><eg:p rdf:parseType="Collection">'
        f"<eg:T/><eg:T/></eg:p></rdf:Description>"
    )
    # members b0, b1; head b2; second cell b3
    assert (IRI(EG + "s"), IRI(EG + "p"), BNode("b2")) in got
    assert (BNode("b2"), IRI(RDF_FIRST), BNode("b0")) in got
    assert (BNode("b2"), IRI(RDF_REST), BNode("b3")) in got
    assert (BNode("b3"), IRI(RDF_FIRST), BNode("b1")) in got
    assert (BNode("b3"), IRI(RDF_REST), IRI(RDF_NIL)) in got


def test_multiple_objects_per_predicate():
    got = triples(
        f'<rdf:Description rdf:about="{EG}s"><eg:p>a</eg:p><eg:p>b</eg:p></rdf:Description>'
    )
    assert got == {
        (IRI(EG + "s"), IRI(EG + "p"), Literal("a")),
        (IRI(EG + "s"), IRI(EG + "p"), Literal("b")),
    }
