"""Property-based encode→decode roundtrip: any small graph the encoder can
serialize must decode back isomorphically (the reference has no randomized
tests; this guards the corner interactions its hand-picked cases miss)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_xml_ex_ray.core.isomorphism import isomorphic
from rdf_xml_ex_ray.core.model import Graph
from rdf_xml_ex_ray.core.terms import RDF_NS, BNode, IRI, Literal
from rdf_xml_ex_ray.decoder.parser import parse_rdfxml
from rdf_xml_ex_ray.encoder.encoder import encode

EG = "http://example.org/"
PFX = {"rdf": RDF_NS, "eg": EG}

# NCName-safe local parts; texts exercise escaping + unicode
_local = st.from_regex(r"[A-Za-z_][A-Za-z0-9_.\-]{0,8}", fullmatch=True)
# XML 1.0 can represent exactly three control chars (#x9 #xA #xD) — include
# them explicitly so the CR-escaping path is exercised; other Cc stay out
# (they are unrepresentable in XML even as character references)
_text = st.text(
    alphabet=st.one_of(
        st.characters(
            codec="utf-8",
            exclude_categories=("Cs", "Cc"),  # no surrogates / control chars
        ),
        st.sampled_from(["\t", "\n", "\r"]),
    ),
    max_size=40,
)

_subject = st.one_of(
    _local.map(lambda s: IRI(EG + s)),
    st.integers(0, 3).map(lambda i: BNode(f"n{i}")),
)
_predicate = _local.map(lambda s: IRI(EG + s))
_obj = st.one_of(
    _local.map(lambda s: IRI(EG + s)),
    st.integers(0, 3).map(lambda i: BNode(f"n{i}")),
    _text.map(Literal),
    st.tuples(_text, st.sampled_from(["en", "de", "fr-CH"])).map(
        lambda t: Literal(t[0], lang=t[1])
    ),
    st.tuples(_text, _local).map(lambda t: Literal(t[0], datatype=EG + "dt/" + t[1])),
)
_triple = st.tuples(_subject, _predicate, _obj)


@settings(max_examples=150, deadline=None)
@given(st.lists(_triple, min_size=1, max_size=12))
def test_encode_decode_roundtrip_isomorphic(triples):
    g = Graph(triples, prefixes=PFX)
    xml = encode(g)
    g2 = parse_rdfxml(xml, base="http://example.org/")
    assert isomorphic(g2.triples(), g.triples()), xml


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_parser_total_on_garbage(data):
    """Robustness: arbitrary input either parses or raises ParseError —
    never any other exception (the rejects side-channel depends on this)."""
    from rdf_xml_ex_ray.core.terms import ParseError
    try:
        parse_rdfxml(data, base="http://example.org/")
    except ParseError:
        pass


_xmlish = st.recursive(
    st.text(alphabet="abcdefgh<>&\"' =:/\n", max_size=20),
    lambda inner: st.tuples(
        st.sampled_from(["rdf:RDF", "rdf:Description", "eg:p", "rdf:li", "x"]),
        st.lists(st.tuples(st.sampled_from(["rdf:about", "rdf:ID", "xml:lang", "eg:a", "rdf:parseType"]), st.text(max_size=8)), max_size=2),
        st.lists(inner, max_size=3),
    ).map(
        lambda t: "<{0}{1}>{2}</{0}>".format(
            t[0],
            "".join(f' {k}="{v}"' for k, v in dict(t[1]).items()),
            "".join(t[2]),
        )
    ),
    max_leaves=10,
)


@settings(max_examples=200, deadline=None)
@given(_xmlish)
def test_parser_total_on_xmlish_documents(body):
    """Structured fuzz: well-formed-ish RDF/XML-shaped trees with random
    rdf attributes — same totality guarantee."""
    from rdf_xml_ex_ray.core.terms import ParseError
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        f'xmlns:eg="http://example.org/">{body}</rdf:RDF>'
    )
    try:
        parse_rdfxml(doc, base="http://example.org/")
    except ParseError:
        pass
