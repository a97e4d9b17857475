"""SPARQL 1.1 results serializers (JSON / CSV / TSV) over typed SELECT
output — term kinds from the facet plan, derived BIND targets as plain
literals, internal bnode labels hex-encoded on the way out."""

import json

import pyarrow as pa
import pytest

from rdf_xml_ex_ray.core.terms import ParseError  # noqa: F401  (parity import)


def _store():
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    rows = [
        ("a", "iri", "http://e/p", "iri", "b", None, None),
        ("a", "iri", "http://e/name", "literal", "Ann", "en", None),
        ("c!b0", "bnode", "http://e/name", "literal", "5", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
    ]
    cols = {n: [r[i] for r in rows] for i, n in enumerate(TRIPLE_SCHEMA.names)}
    return rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))


def test_select_json_typed(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select_typed
    from rdf_xml_ex_ray.sources.results import select_json

    ds, out_vars, prov = sparql_select_typed(
        _store(),
        'SELECT ?s ?o (CONCAT("v=", ?o) AS ?d) '
        "WHERE { ?s <http://e/name> ?o } ORDER BY ?o",
    )
    doc = select_json(ds, out_vars, prov)
    assert doc["head"]["vars"] == ["s", "o", "d"]
    b = doc["results"]["bindings"]
    assert len(b) == 2
    # row order: ORDER BY ?o -> "5" before "Ann"
    assert b[0]["s"]["type"] == "bnode"
    assert b[0]["s"]["value"] != "c!b0"  # internal label hex-encoded
    assert b[0]["o"] == {
        "type": "literal", "value": "5",
        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
    }
    assert b[1]["s"] == {"type": "uri", "value": "a"}
    assert b[1]["o"] == {"type": "literal", "value": "Ann", "xml:lang": "en"}
    assert b[1]["d"] == {"type": "literal", "value": "v=Ann"}
    json.dumps(doc)  # the document is JSON-clean


def test_select_tsv_and_csv(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select, sparql_select_typed
    from rdf_xml_ex_ray.sources.results import select_csv, select_tsv

    ds, out_vars, prov = sparql_select_typed(
        _store(), "SELECT ?s ?o WHERE { ?s <http://e/name> ?o } ORDER BY ?o"
    )
    tsv = select_tsv(ds, out_vars, prov)
    lines = tsv.splitlines()
    assert lines[0] == "?s\t?o"
    assert lines[1].endswith(
        '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'
    ) and lines[1].startswith("_:")
    assert lines[2] == '<a>\t"Ann"@en'

    res = sparql_select(
        _store(), "SELECT ?s ?o WHERE { ?s <http://e/name> ?o } ORDER BY ?o"
    )
    csv_doc = select_csv(res, ["s", "o"])
    assert csv_doc.splitlines()[0] == "s,o"
    assert csv_doc.splitlines()[1:] == ["c!b0,5", "a,Ann"]


def test_typed_select_rejects_kindless_vars(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select_typed

    with pytest.raises(ValueError, match="carry no term kind"):
        sparql_select_typed(
            _store(),
            "SELECT ?s ?t WHERE { ?s <http://e/name> ?o . "
            "OPTIONAL { ?s <http://e/p> ?t } }",
        )
    with pytest.raises(ValueError, match="DISTINCT / GROUP BY"):
        sparql_select_typed(
            _store(), "SELECT DISTINCT ?s WHERE { ?s <http://e/name> ?o }"
        )


def test_select_xml_typed(ray_session):
    import xml.etree.ElementTree as ET

    from rdf_xml_ex_ray.pipelines.bgp import sparql_select_typed
    from rdf_xml_ex_ray.sources.results import select_xml

    ds, out_vars, prov = sparql_select_typed(
        _store(),
        'SELECT ?s ?o (CONCAT("v=", ?o) AS ?d) '
        "WHERE { ?s <http://e/name> ?o } ORDER BY ?o",
    )
    doc = select_xml(ds, out_vars, prov)
    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    root = ET.fromstring(doc)  # well-formed
    assert [v.get("name") for v in root.findall("sr:head/sr:variable", ns)] \
        == ["s", "o", "d"]
    results = root.findall("sr:results/sr:result", ns)
    assert len(results) == 2
    b0 = {b.get("name"): b[0] for b in results[0].findall("sr:binding", ns)}
    assert b0["s"].tag.endswith("bnode") and "!" not in b0["s"].text
    assert b0["o"].tag.endswith("literal")
    assert b0["o"].get("datatype") \
        == "http://www.w3.org/2001/XMLSchema#integer"
    assert b0["o"].text == "5"
    b1 = {b.get("name"): b[0] for b in results[1].findall("sr:binding", ns)}
    assert b1["s"].tag.endswith("uri") and b1["s"].text == "a"
    assert b1["o"].get(
        "{http://www.w3.org/XML/1998/namespace}lang"
    ) == "en" and b1["o"].text == "Ann"
    assert b1["d"].text == "v=Ann" and not b1["d"].attrib


def test_select_xml_control_chars(ray_session):
    import xml.etree.ElementTree as ET

    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select_typed
    from rdf_xml_ex_ray.sources.results import select_xml

    def store_with(val):
        cols = {n: [] for n in TRIPLE_SCHEMA.names}
        cols["subj"].append("s"); cols["subj_kind"].append("iri")
        cols["pred"].append("http://e/p"); cols["obj_kind"].append("literal")
        cols["obj_value"].append(val); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
        return rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))

    q = "SELECT ?o WHERE { ?s <http://e/p> ?o }"
    # \r must survive a conforming parse (raw \r normalizes to \n)
    doc = select_xml(*sparql_select_typed(store_with("a\rb"), q))
    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    lit = ET.fromstring(doc).find(".//sr:binding/sr:literal", ns)
    assert lit.text == "a\rb"
    # XML-unrepresentable C0 controls are rejected loudly, not emitted
    with pytest.raises(ValueError, match="XML 1.0"):
        select_xml(*sparql_select_typed(store_with("a\fb"), q))


def test_graph_document_tie_break_determinism(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.sources.results import graph_document

    # two triples equal on (subj, pred, obj_value), differing only in lang
    # — the full-column sort orders them identically however blocks arrive
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for lang in ("fr", "en"):
        cols["subj"].append("http://e/s"); cols["subj_kind"].append("iri")
        cols["pred"].append("http://e/p"); cols["obj_kind"].append("literal")
        cols["obj_value"].append("x"); cols["obj_lang"].append(lang)
        cols["obj_datatype"].append(None)
    fwd = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    rev = rd.from_arrow(
        pa.table({k: v[::-1] for k, v in cols.items()}, schema=TRIPLE_SCHEMA)
    )
    assert graph_document(fwd, "nt") == graph_document(rev, "nt")
    assert '"x"@en' in graph_document(fwd, "nt").splitlines()[0]


def test_ask_xml(ray_session):
    import xml.etree.ElementTree as ET

    from rdf_xml_ex_ray.pipelines.bgp import sparql_ask
    from rdf_xml_ex_ray.sources.results import ask_xml

    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    yes = ET.fromstring(
        ask_xml(sparql_ask(_store(), 'ASK { ?s <http://e/name> "Ann" }'))
    )
    no = ET.fromstring(
        ask_xml(sparql_ask(_store(), 'ASK { ?s <http://e/name> "Bob" }'))
    )
    assert yes.find("sr:boolean", ns).text == "true"
    assert no.find("sr:boolean", ns).text == "false"


def test_construct_typed_rows(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_construct_typed

    got = sparql_construct_typed(
        _store(),
        "CONSTRUCT { ?s <http://e/tagged> ?o } "
        "WHERE { ?s <http://e/name> ?o }",
    ).to_pandas().sort_values("obj_value").reset_index(drop=True)
    # full 7-column rows: kinds + lang/dt marks carried exactly
    assert list(got.columns) == [
        "subj", "subj_kind", "pred", "obj_kind", "obj_value",
        "obj_lang", "obj_datatype",
    ]
    assert got.loc[0, "subj"] == "c!b0" and got.loc[0, "subj_kind"] == "bnode"
    assert got.loc[0, "obj_datatype"] \
        == "http://www.w3.org/2001/XMLSchema#integer"
    assert got.loc[1, "obj_lang"] == "en" and got.loc[1, "obj_kind"] == "literal"
    # OPTIONAL-bound template variables carry no term kind -> loud reject
    with pytest.raises(ValueError, match="typed CONSTRUCT template"):
        sparql_construct_typed(
            _store(),
            "CONSTRUCT { ?s <http://e/x> ?t } WHERE { "
            "?s <http://e/name> ?o . OPTIONAL { ?s <http://e/p> ?t } }",
        )


def test_graph_document_nt_and_ttl(ray_session):
    from rdf_xml_ex_ray.core.ntriples import parse_ntriples
    from rdf_xml_ex_ray.core.turtle import parse_turtle
    from rdf_xml_ex_ray.pipelines.bgp import sparql_construct_typed
    from rdf_xml_ex_ray.sources.results import graph_document

    res = sparql_construct_typed(
        _store(),
        "CONSTRUCT { ?s <http://e/tagged> ?o } "
        "WHERE { ?s <http://e/name> ?o }",
    )
    nt = graph_document(res, "nt")
    triples = parse_ntriples(nt)
    assert len(triples) == 2
    assert "c!b0" not in nt  # internal bnode label hex-encoded
    assert '"Ann"@en' in nt
    assert '"5"^^<http://www.w3.org/2001/XMLSchema#integer>' in nt
    ttl = graph_document(res, "ttl")
    assert len(parse_turtle(ttl)) == 2 and ttl.startswith("@prefix")
    # RDF/XML via the repo's own encoder, auto-derived prefixes — and the
    # repo's own decoder reads it back to the same graph the NT doc holds
    from rdf_xml_ex_ray.decoder.parser import parse_rdfxml

    rdfxml = graph_document(res, "rdf")
    assert "c!b0" not in rdfxml
    # the fixture's subject IRI "a" is RELATIVE, so decode under a base
    # and compare against base-resolved expectations
    # ... and bnode labels are document-scoped: the decoder re-mints
    # them, so normalize bnodes to a placeholder on both sides
    from rdf_xml_ex_ray.core.terms import BNode as _BN

    def norm(s, p, o):
        sv = "<bnode>" if isinstance(s, _BN) else str(s)
        return (("http://b/" + sv) if sv == "a" else sv, str(p), o)

    back = {
        norm(s, p, o)
        for s, p, o in parse_rdfxml(rdfxml.encode(), base="http://b/")
    }
    want = {norm(s, p, o) for s, p, o in triples}
    assert back == want
    with pytest.raises(ValueError, match="nt"):
        graph_document(res, "jsonld")


def test_ask_json(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_ask
    from rdf_xml_ex_ray.sources.results import ask_json

    yes = ask_json(sparql_ask(_store(), 'ASK { ?s <http://e/name> "Ann" }'))
    no = ask_json(sparql_ask(_store(), 'ASK { ?s <http://e/name> "Bob" }'))
    assert yes == {"head": {}, "boolean": True}
    assert no == {"head": {}, "boolean": False}
