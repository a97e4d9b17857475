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
_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs", "Cc"),  # no surrogates / control chars
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
