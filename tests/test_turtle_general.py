"""General Turtle 1.1 parser (core/turtle.py): grammar-feature coverage the
sink-subset reader never exercised — collections, ``a``, @base, long/short
single/double-quoted literals, numeric/boolean shorthand, PN_LOCAL escapes,
blank-node property lists, comments — plus W3C-manifest parity (the load
the reference does via RDF.Turtle, test_suite.ex:41-48)."""

import pytest

from rdf_xml_ex_ray.core.terms import BNode, IRI, Literal, ParseError
from rdf_xml_ex_ray.core.turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, parse_turtle

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def t(text, **kw):
    return parse_turtle(text, **kw)


def test_basic_statement_forms():
    got = t(f'<{EX}s> <{EX}p> <{EX}o> .')
    assert got == [(IRI(EX + "s"), IRI(EX + "p"), IRI(EX + "o"))]


def test_prefixes_a_semicolon_comma():
    doc = """
    @prefix ex: <http://example.org/> .
    @prefix : <http://default.org/> .
    ex:s a ex:T ;
         ex:p ex:o1 , :o2 .
    """
    got = t(doc)
    assert (IRI(EX + "s"), RDF_TYPE, IRI(EX + "T")) in got
    assert (IRI(EX + "s"), IRI(EX + "p"), IRI(EX + "o1")) in got
    assert (IRI(EX + "s"), IRI(EX + "p"), IRI("http://default.org/o2")) in got
    assert len(got) == 3


def test_sparql_style_directives_no_dot():
    doc = """
    PREFIX ex: <http://example.org/>
    BASE <http://base.org/dir/>
    ex:s ex:p <rel> .
    """
    got = t(doc)
    assert got == [(IRI(EX + "s"), IRI(EX + "p"), IRI("http://base.org/dir/rel"))]


def test_base_and_relative_resolution():
    doc = """
    @base <http://base.org/a/b/manifest.ttl> .
    <> <#frag> <../up> .
    """
    got = t(doc)
    s, p, o = got[0]
    assert str(s) == "http://base.org/a/b/manifest.ttl"
    assert str(p) == "http://base.org/a/b/manifest.ttl#frag"
    assert str(o) == "http://base.org/a/up"


def test_external_base_argument():
    got = t("<x> <p> <#f> .", base="http://ext.org/d/doc.ttl")
    s, p, o = got[0]
    assert str(s) == "http://ext.org/d/x"
    assert str(o) == "http://ext.org/d/doc.ttl#f"


def test_numeric_and_boolean_shorthand():
    doc = f"<{EX}s> <{EX}p> 42, -7, 3.14, .5, 1e3, -2.5E-2, true, false ."
    objs = {(o.lexical, o.datatype) for _, _, o in t(doc)}
    assert ("42", XSD + "integer") in objs
    assert ("-7", XSD + "integer") in objs
    assert ("3.14", XSD + "decimal") in objs
    assert (".5", XSD + "decimal") in objs
    assert ("1e3", XSD + "double") in objs
    assert ("-2.5E-2", XSD + "double") in objs
    assert ("true", XSD + "boolean") in objs and ("false", XSD + "boolean") in objs


def test_literal_quote_forms_and_escapes():
    doc = (
        '@prefix ex: <http://example.org/> .\n'
        'ex:s ex:p "dq \\"esc\\" \\n", \'sq\', """long\n"multi" line""", '
        "'''long\n'single' line''', \"tagged\"@en-GB, \"typed\"^^ex:T, "
        '"u\\u0041\\U0001F600" .'
    )
    objs = [o for _, _, o in t(doc)]
    lex = {o.lexical for o in objs}
    assert 'dq "esc" \n' in lex and "sq" in lex
    assert 'long\n"multi" line' in lex and "long\n'single' line" in lex
    assert any(o.lang == "en-GB" for o in objs)
    assert any(o.datatype == EX + "T" for o in objs)
    assert "uA\U0001F600" in lex


def test_collections_build_first_rest_chain():
    doc = f'<{EX}s> <{EX}p> (<{EX}a> "x" 2) .'
    got = t(doc)
    # chain: s p _:1 ; _:1 first a ; _:1 rest _:2 ; ... last rest nil
    heads = [o for s, p, o in got if str(p) == EX + "p"]
    assert len(heads) == 1 and isinstance(heads[0], BNode)
    firsts = [(s, o) for s, p, o in got if p == RDF_FIRST]
    rests = [(s, o) for s, p, o in got if p == RDF_REST]
    assert len(firsts) == 3 and len(rests) == 3
    assert sum(1 for _, o in rests if o == RDF_NIL) == 1
    assert {getattr(o, "lexical", str(o)) for _, o in firsts} == {EX + "a", "x", "2"}


def test_empty_collection_is_nil():
    got = t(f'<{EX}s> <{EX}p> () .')
    assert got == [(IRI(EX + "s"), IRI(EX + "p"), RDF_NIL)]


def test_blank_node_property_lists_and_anon():
    doc = f"""
    <{EX}s> <{EX}p> [ <{EX}q> "inner" ; a <{EX}T> ] .
    [ <{EX}r> <{EX}o> ] .
    <{EX}s2> <{EX}p2> [] .
    """
    got = t(doc)
    inner_subj = [s for s, p, o in got if getattr(o, "lexical", None) == "inner"][0]
    assert isinstance(inner_subj, BNode)
    assert (inner_subj, RDF_TYPE, IRI(EX + "T")) in got
    anon = [o for s, p, o in got if str(p) == EX + "p2"][0]
    assert isinstance(anon, BNode)
    # generated labels can't collide with parsed labels ('!' not in PN_CHARS)
    assert str(anon).startswith("!g")


def test_labeled_bnodes_and_pn_local_escapes():
    doc = """
    @prefix ex: <http://example.org/> .
    _:b1 ex:p ex:with\\~tilde\\=eq .
    _:b1 ex:q ex:pct%41enc .
    """
    got = t(doc)
    assert got[0][0] == BNode("b1")
    assert str(got[0][2]) == EX + "with~tilde=eq"
    # %-encoding stays literal in the IRI per the Turtle spec
    assert str(got[1][2]) == EX + "pct%41enc"


def test_comments_and_dots_in_pnames():
    doc = """
    # leading comment
    @prefix ex.v2: <http://example.org/> .  # trailing comment
    ex.v2:a.b ex.v2:p ex.v2:o . # done
    """
    got = t(doc)
    assert got == [(IRI(EX + "a.b"), IRI(EX + "p"), IRI(EX + "o"))]


def test_trailing_semicolon_runs():
    got = t(f'<{EX}s> <{EX}p> <{EX}o> ; ; .')
    assert len(got) == 1


@pytest.mark.parametrize(
    "bad",
    [
        "<http://x> <http://p> .",           # missing object
        "<http://x> <http://p> <http://o>",  # missing final dot
        "ex:s ex:p ex:o .",                  # undeclared prefix
        '<http://x> <http://p> "unterminated .',
        "[] .",                              # ANON subject without predicates
        "@prefix ex <http://x> .",           # missing colon
    ],
)
def test_negative_syntax(bad):
    with pytest.raises(ParseError):
        t(bad)


def test_sink_subset_still_parses():
    from rdf_xml_ex_ray.sources.turtle import DEFAULT_PREFIXES, table_to_turtle
    import pyarrow as pa

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    rows = [
        ("c0!b10", "bnode", EX + "p", "literal", 'v "q" \\', None, None),
        ("http://e.org/s", "iri", EX + "q", "literal", "42", None, XSD + "integer"),
        ("http://e.org/s", "iri", EX + "r", "literal", "hi", "en", None),
    ]
    tbl = pa.table(
        {n: pa.array([r[i] for r in rows]) for i, n in enumerate(TRIPLE_SCHEMA.names)},
        schema=TRIPLE_SCHEMA,
    )
    doc = table_to_turtle(tbl, dict(DEFAULT_PREFIXES, ex=EX))
    got = t(doc)
    assert len(got) == 3
    lits = {(o.lexical, o.lang, o.datatype) for _, _, o in got if isinstance(o, Literal)}
    assert ('v "q" \\', None, None) in lits
    assert ("42", None, XSD + "integer") in lits
    assert ("hi", "en", None) in lits


def test_w3c_manifest_parity():
    """The manifest load the reference does through RDF.Turtle: exact
    162-entry (122 eval / 40 negative) description set, 169 total with the
    7 withdrawn on-disk cases."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from w3c_corpus import W3C_DIR, load_cases

    if not os.path.isdir(W3C_DIR):
        pytest.skip("W3C corpus unavailable")
    cases = load_cases()
    assert len(cases) == 169
    assert sum(c.positive for c in cases) == 128
    assert sum(not c.positive for c in cases) == 41
    manifest = [c for c in cases if c.in_manifest]
    assert len(manifest) == 162
    assert sum(c.positive for c in manifest) == 122
    lookup = {c.name: c for c in cases}
    assert lookup["amp-in-url/test001"].positive
    assert not lookup["rdf-containers-syntax-vs-schema/error001"].positive
    assert lookup["rdfms-empty-property-elements/test003"].in_manifest is False
