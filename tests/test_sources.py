"""RDF/XML file source/sink (Ray Data) — read .rdf corpus, write store,
read it back (format-module parity, reference xml.ex:17-24)."""

import os

import pytest

from w3c_corpus import load_cases


@pytest.fixture(scope="module")
def corpus_files():
    cases = [c for c in load_cases() if c.positive]
    if not cases:
        pytest.skip("W3C corpus unavailable")
    return [c.rdf_path for c in cases[:20]]


def test_read_rdfxml_corpus(ray_session, corpus_files):
    from rdf_xml_ex_ray.sources.rdfxml import read_rdfxml

    ds = read_rdfxml(corpus_files, base="http://example.org/base/doc")
    df = ds.to_pandas()
    ok = df[df["error"].isna()]
    assert len(ok) > 20  # plenty of triples decoded
    assert ok["conv_id"].nunique() > 5  # lineage per file


def test_write_read_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from rdf_xml_ex_ray.sources.rdfxml import read_rdfxml, write_rdfxml
    from rdf_xml_ex_ray.transcripts.ontology import CT_NS

    rows = [
        {
            "subj": f"http://example.org/conv/c{i}",
            "subj_kind": "iri",
            "pred": CT_NS + "text",
            "obj_kind": "literal",
            "obj_value": f"turn <{i}> & more",
            "obj_lang": "en",
            "obj_datatype": None,
        }
        for i in range(50)
    ]
    ds = rd.from_items(rows)
    out = str(tmp_path / "store")
    res = write_rdfxml(ds, out, prefixes={"rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#", "ct": CT_NS}, num_buckets=4).to_pandas()
    files = sorted(os.listdir(out))
    assert all(f.startswith("part-") and f.endswith(".rdf") for f in files)
    assert res["n_descriptions"].sum() == 50

    back = read_rdfxml([os.path.join(out, f) for f in files]).to_pandas()
    back_ok = back[back["error"].isna()]
    assert len(back_ok) == 50
    got = set(zip(back_ok["subj"], back_ok["obj_value"], back_ok["obj_lang"]))
    want = {(r["subj"], r["obj_value"], "en") for r in rows}
    assert got == want


def test_write_rdfxml_encodes_bnode_labels(ray_session, tmp_path):
    """Internal '{conv}!b{k}' labels must hex-encode to NCName-valid
    rdf:nodeID values (the repo-wide sink invariant — the raw '!' form is
    rejected by conformant parsers, including this repo's own decoder)."""
    import ray.data as rd

    from rdf_xml_ex_ray.decoder.parser import parse_rdfxml
    from rdf_xml_ex_ray.sources.rdfxml import write_rdfxml

    rows = [
        {
            "subj": "c0!b1", "subj_kind": "bnode",
            "pred": "http://e/p", "obj_kind": "bnode",
            "obj_value": "c0!b2", "obj_lang": None, "obj_datatype": None,
        }
    ]
    out = str(tmp_path / "bn")
    write_rdfxml(
        rd.from_items(rows), out,
        prefixes={"rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
                  "e": "http://e/"},
        num_buckets=2,
    ).to_pandas()
    docs = [open(os.path.join(out, f)).read() for f in sorted(os.listdir(out))]
    body = next(d for d in docs if "nodeID" in d)
    assert "c0!b1" not in body and 'rdf:nodeID="nc0_21b1"' in body
    # the repo's own decoder accepts the emitted document
    assert len(parse_rdfxml(body.encode(), base="http://b/")) == 1


def test_write_rdfxml_colocates_bnode_clusters(ray_session, tmp_path):
    """rdf:nodeID identity is per-FILE: a bnode's description and its
    references must share a part file or the decoded graph silently
    dangles. The sink routes every bnode-touching triple by the label's
    '{scope}!' prefix, so whole clusters land together and the decoded
    graph keeps its structure — verified by walking the chain back."""
    import ray.data as rd

    from rdf_xml_ex_ray.core.terms import BNode
    from rdf_xml_ex_ray.decoder.parser import parse_rdfxml
    from rdf_xml_ex_ray.sources.rdfxml import write_rdfxml

    rows = []
    for scope in ("c0", "c1", "c2", "c3"):
        # IRI -> bnode -> bnode -> literal chain, one per scope; a plain
        # subj-hash bucketing splits these across files for some scope
        rows += [
            {"subj": f"http://e/{scope}", "subj_kind": "iri",
             "pred": "http://e/use", "obj_kind": "bnode",
             "obj_value": f"{scope}!b0", "obj_lang": None,
             "obj_datatype": None},
            {"subj": f"{scope}!b0", "subj_kind": "bnode",
             "pred": "http://e/next", "obj_kind": "bnode",
             "obj_value": f"{scope}!b1", "obj_lang": None,
             "obj_datatype": None},
            {"subj": f"{scope}!b1", "subj_kind": "bnode",
             "pred": "http://e/val", "obj_kind": "literal",
             "obj_value": scope.upper(), "obj_lang": None,
             "obj_datatype": None},
        ]
    out = str(tmp_path / "cl")
    write_rdfxml(
        rd.from_items(rows), out,
        prefixes={"rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
                  "e": "http://e/"},
        num_buckets=8,
    ).to_pandas()
    # decode every part independently (per-file bnode identity, as any
    # conformant consumer would) and walk IRI -> b -> b' -> literal
    reached = {}
    for f in sorted(os.listdir(out)):
        g = parse_rdfxml(open(os.path.join(out, f), "rb").read(),
                         base="http://b/")
        nxt = {}
        use = {}
        val = {}
        for s, p, o in g:
            if str(p) == "http://e/use":
                use[str(s)] = o
            elif str(p) == "http://e/next":
                nxt[s] = o
            else:
                val[s] = o
        for iri, b in use.items():
            assert isinstance(b, BNode) and b in nxt, f"dangling chain in {f}"
            b2 = nxt[b]
            assert b2 in val, f"dangling tail in {f}"
            reached[iri] = val[b2].lexical
    assert reached == {f"http://e/{s}": s.upper()
                       for s in ("c0", "c1", "c2", "c3")}


def test_ntriples_sink_source_roundtrip(ray_session, tmp_path):
    """Flagship triples → .nt sink → .nt source → identical rows."""
    import os

    from rdf_xml_ex_ray.pipelines.kg import kg_triples_dataset
    from rdf_xml_ex_ray.sources.ntriples import read_ntriples, write_ntriples

    triples = kg_triples_dataset("/root/testdata/sf0.001", num_buckets=8)
    orig = triples.to_pandas()
    out = str(tmp_path / "nt")
    res = write_ntriples(triples, out, num_buckets=4).to_pandas()
    assert res["n_triples"].sum() == len(orig)
    files = [os.path.join(out, f) for f in sorted(os.listdir(out))]
    back = read_ntriples(files).to_pandas()
    cols = list(orig.columns)
    a = orig[cols].sort_values(cols).reset_index(drop=True)
    b = back[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_rdfxml_sink_roundtrip_of_flagship_store(ray_session, tmp_path):
    """Flagship triples (bnode-free slice) → .rdf sink → .rdf source →
    same triples (format-fidelity at the pipeline level)."""
    import os

    import pyarrow.compute as pc

    from rdf_xml_ex_ray.core.terms import RDF_NS
    from rdf_xml_ex_ray.pipelines.kg import kg_triples_dataset
    from rdf_xml_ex_ray.sources.rdfxml import read_rdfxml, write_rdfxml
    from rdf_xml_ex_ray.transcripts.ontology import CT_NS

    nob = kg_triples_dataset("/root/testdata/sf0.001", num_buckets=8).map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["subj_kind"], "iri"), pc.not_equal(t["obj_kind"], "bnode"))
        ),
        batch_format="pyarrow",
    )
    orig = nob.to_pandas()
    out = str(tmp_path / "rdf")
    write_rdfxml(nob, out, prefixes={"rdf": RDF_NS, "ct": CT_NS}, num_buckets=4).to_pandas()
    files = [os.path.join(out, f) for f in sorted(os.listdir(out))]
    back = read_rdfxml(files).to_pandas()
    back_ok = back[back["error"].isna()].drop(columns=["conv_id", "error"])
    cols = list(orig.columns)
    a = orig[cols].sort_values(cols).reset_index(drop=True)
    b = back_ok[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def _truncated_doc(n_descriptions: int) -> str:
    # valid head, missing </rdf:RDF> and a broken tag at the end; sized so
    # the streamed decoder crosses at least one 4 MiB feed-chunk boundary
    # (and its 10k-triple drain) before hitting the error
    descs = "\n".join(
        f'<rdf:Description rdf:about="http://example.org/things/{i:08d}">'
        f"<ex:p>value-{i:08d}</ex:p></rdf:Description>"
        for i in range(n_descriptions)
    )
    return (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://ex/">\n' + descs + "\n<broken"
    )


N_BAD_DESCS = 60_000  # ~6 MB > one FEED_CHUNK


def test_read_rdfxml_atomic_documents_on_streamed_error(ray_session, tmp_path):
    """A mid-document failure in a streamed (over-threshold) file must be
    all-or-nothing by default — even after the decoder has already drained
    tens of thousands of the doc's triples into the sink: one rejects row,
    ZERO triples, identical semantics to the under-threshold path."""
    from rdf_xml_ex_ray.sources.rdfxml import PARTIAL_ERROR_PREFIX, read_rdfxml

    bad = tmp_path / "bad.rdf"
    bad.write_text(_truncated_doc(N_BAD_DESCS), encoding="utf-8")
    good = tmp_path / "good.rdf"
    good.write_text(
        '<?xml version="1.0"?>'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:ex="http://ex/">'
        '<rdf:Description rdf:about="http://x/ok"><ex:p>v</ex:p></rdf:Description>'
        "</rdf:RDF>",
        encoding="utf-8",
    )

    df = read_rdfxml([str(bad), str(good)], streaming_threshold=100).to_pandas()
    rejects = df[df["error"].notna()]
    ok = df[df["error"].isna()]
    assert len(rejects) == 1
    assert rejects.iloc[0]["conv_id"].startswith("bad-")
    assert not rejects.iloc[0]["error"].startswith(PARTIAL_ERROR_PREFIX)
    # no triple of the failed doc leaked into the output
    assert not ok["conv_id"].str.startswith("bad-").any()
    # the good doc's triples are intact
    assert ok["conv_id"].str.startswith("good-").sum() == 1


def test_read_rdfxml_non_atomic_marks_partial(ray_session, tmp_path):
    from rdf_xml_ex_ray.sources.rdfxml import PARTIAL_ERROR_PREFIX, read_rdfxml

    bad = tmp_path / "bad.rdf"
    bad.write_text(_truncated_doc(N_BAD_DESCS), encoding="utf-8")
    df = read_rdfxml(
        [str(bad)], streaming_threshold=100, atomic_documents=False
    ).to_pandas()
    rejects = df[df["error"].notna()]
    assert len(rejects) == 1
    # the machine-checkable partial marker names the doc to anti-join
    assert rejects.iloc[0]["error"].startswith(PARTIAL_ERROR_PREFIX)
    # already-drained triples stand, as documented for the non-atomic mode
    assert (df["error"].isna()).sum() >= 10_000


def test_turtle_roundtrip_flagship(ray_session, tmp_path):
    """write_turtle over the flagship triples, read back with the subset
    reader: the triple multiset must round-trip exactly (set semantics —
    the sink writes the already-deduped canonical store)."""
    import pandas as pd

    from rdf_xml_ex_ray.pipelines.kg import kg_triples_dataset
    from rdf_xml_ex_ray.sources.turtle import read_turtle, write_turtle

    triples = kg_triples_dataset("/root/testdata/sf0.001")
    out = str(tmp_path / "ttl")
    stats = write_turtle(triples, out, num_buckets=4).to_pandas()
    assert stats["n_triples"].sum() > 0

    import glob

    back = read_turtle(sorted(glob.glob(f"{out}/part-*.ttl"))).to_pandas()
    orig = kg_triples_dataset("/root/testdata/sf0.001").to_pandas()
    cols = ["subj", "subj_kind", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"]
    a = back[cols].fillna("~").sort_values(cols).reset_index(drop=True)
    b = orig[cols].fillna("~").sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    assert a.equals(b)


def test_turtle_term_forms(ray_session, tmp_path):
    """Prefix compaction, non-compactable IRIs, bnodes, lang + datatype
    literals, and escapes all survive the write→read cycle."""
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.sources.turtle import parse_turtle, table_to_turtle

    rows = [
        ("http://example.org/convo#c1", "iri", "http://example.org/convo#turn", "iri",
         "http://example.org/convo#t1", None, None),
        ("http://example.org/convo#c1", "iri", "http://other.org/p?q=1", "literal",
         'esc "quote" and\nnewline\ttab \\ backslash', None, None),
        ("b7", "bnode", "http://example.org/convo#tool", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("http://example.org/convo#c2", "iri", "http://example.org/convo#label", "literal",
         "hallo", "de", None),
    ]
    tbl = pa.table(
        {n: pa.array([r[i] for r in rows]) for i, n in enumerate(TRIPLE_SCHEMA.names)},
        schema=TRIPLE_SCHEMA,
    )
    prefixes = {"c": "http://example.org/convo#", "xsd": "http://www.w3.org/2001/XMLSchema#"}
    doc = table_to_turtle(tbl, prefixes)
    assert "c:turn" in doc and "<http://other.org/p?q=1>" in doc and "_:b7" in doc
    assert '"hallo"@de' in doc and "^^xsd:integer" in doc
    got = {(str(s), str(p), repr(o)) for s, p, o in parse_turtle(doc)}
    from rdf_xml_ex_ray.core.model import row_to_term
    from rdf_xml_ex_ray.core.terms import BNode, IRI

    want = set()
    for subj, skind, pred, okind, oval, olang, odt in rows:
        s = BNode(subj) if skind == "bnode" else IRI(subj)
        o = row_to_term(okind, oval, olang, odt)
        want.add((str(s), str(pred), repr(o)))
    assert got == want


def test_bnode_label_encoding_roundtrip():
    """encode_bnode_label output is spec-valid BLANK_NODE_LABEL material
    (ADVICE r3: '!' in internal labels is outside PN_CHARS) and decode is
    its exact inverse for arbitrary labels."""
    import re

    from rdf_xml_ex_ray.core.ntriples import decode_bnode_label, encode_bnode_label

    cases = ["c0!b10", "b7", "x_y", "a b", "ünïcode!b1", "\U0001F600!b2", "_", "9lead",
             "a_5f", "has_u0041fake", "!", "c12!b0!b1"]
    valid = re.compile(r"[A-Za-z0-9_]+\Z")  # conservative subset of BLANK_NODE_LABEL
    for label in cases:
        enc = encode_bnode_label(label)
        assert valid.match(enc), (label, enc)
        assert decode_bnode_label(enc) == label, (label, enc)


def test_sink_bnode_labels_spec_valid(ray_session, tmp_path):
    """Exported .nt and .ttl files contain only spec-valid bnode labels even
    when internal labels carry '!', and the readers restore them exactly."""
    import glob
    import re

    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.sources.ntriples import read_ntriples, write_ntriples
    from rdf_xml_ex_ray.sources.turtle import read_turtle, write_turtle

    rows = [
        ("c0!b10", "bnode", "http://example.org/convo#next", "bnode", "c0!b11", None, None),
        ("c0!b11", "bnode", "http://example.org/convo#text", "literal", "hi", None, None),
        ("http://example.org/convo#c0", "iri", "http://example.org/convo#root", "bnode",
         "c0!b10", None, None),
    ]
    tbl = pa.table(
        {n: pa.array([r[i] for r in rows]) for i, n in enumerate(TRIPLE_SCHEMA.names)},
        schema=TRIPLE_SCHEMA,
    )
    ds = rd.from_arrow(tbl)
    valid = re.compile(r"_:([A-Za-z0-9_]+)")
    cols = list(TRIPLE_SCHEMA.names)

    for fmt, write, read in (
        ("nt", write_ntriples, read_ntriples),
        ("ttl", write_turtle, read_turtle),
    ):
        out = str(tmp_path / fmt)
        write(ds, out, num_buckets=2).to_pandas()
        files = sorted(glob.glob(f"{out}/part-*.{fmt}"))
        text = "".join(open(f, encoding="utf-8").read() for f in files)
        raw_labels = re.findall(r"_:(\S+)", text)
        assert raw_labels, fmt
        for lbl in raw_labels:
            assert re.fullmatch(r"[A-Za-z0-9_]+", lbl), (fmt, lbl)
        back = read(files).to_pandas()
        orig = tbl.to_pandas()
        a = back[cols].fillna("~").sort_values(cols).reset_index(drop=True)
        b = orig[cols].fillna("~").sort_values(cols).reset_index(drop=True)
        assert a.equals(b), fmt


def test_nquads_sink_source_roundtrip(ray_session, tmp_path):
    """Quad store write -> read preserves quads incl. named graphs, default
    graph (null), bnode graph labels, and spec-valid encoded bnode labels."""
    import glob
    import re

    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.sources.nquads import QUAD_SCHEMA, read_nquads, write_nquads

    rows = [
        # (subj, subj_kind, pred, obj_kind, obj_value, lang, dt, graph, graph_kind)
        ("http://e/s1", "iri", "http://e/p", "literal", 'say "hi"\n', "en", None,
         "http://e/g1", "iri"),
        ("c0!b1", "bnode", "http://e/p", "bnode", "c0!b2", None, None,
         "http://e/g1", "iri"),
        ("http://e/s2", "iri", "http://e/p", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer", None, None),  # default graph
        ("http://e/s3", "iri", "http://e/p", "iri", "http://e/o", None, None,
         "g!b0", "bnode"),  # bnode graph label
    ]
    tbl = pa.table(
        {n: pa.array([r[i] for r in rows]) for i, n in enumerate(QUAD_SCHEMA.names)},
        schema=QUAD_SCHEMA,
    )
    out = str(tmp_path / "nq")
    write_nquads(rd.from_arrow(tbl), out, num_buckets=2).to_pandas()
    files = sorted(glob.glob(f"{out}/part-*.nq"))
    text = "".join(open(f, encoding="utf-8").read() for f in files)
    for lbl in re.findall(r"_:(\S+)", text):
        assert re.fullmatch(r"[A-Za-z0-9_]+", lbl), lbl
    back = read_nquads(files).to_pandas()
    cols = list(QUAD_SCHEMA.names)
    a = back[cols].fillna("~").sort_values(cols).reset_index(drop=True)
    b = tbl.to_pandas()[cols].fillna("~").sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_trig_sink_source_roundtrip(ray_session, tmp_path):
    """TriG write -> read preserves quads: named-graph blocks, default
    graph, bnode graph labels, spec-valid encoded bnode labels — and the
    emitted files parse with the GENERAL TriG grammar (not a subset)."""
    import glob
    import re

    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.sources.nquads import QUAD_SCHEMA
    from rdf_xml_ex_ray.sources.trig import read_trig, write_trig

    rows = [
        ("http://e/s1", "iri", "http://e/p", "literal", 'say "hi"\n', "en", None,
         "http://e/g1", "iri"),
        ("c0!b1", "bnode", "http://e/p", "bnode", "c0!b2", None, None,
         "http://e/g1", "iri"),
        ("http://e/s2", "iri", "http://e/p", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer", None, None),
        ("http://e/s3", "iri", "http://e/p", "iri", "http://e/o", None, None,
         "g!b0", "bnode"),
    ]
    tbl = pa.table(
        {n: pa.array([r[i] for r in rows]) for i, n in enumerate(QUAD_SCHEMA.names)},
        schema=QUAD_SCHEMA,
    )
    out = str(tmp_path / "trig")
    write_trig(rd.from_arrow(tbl), out, num_buckets=2).to_pandas()
    files = sorted(glob.glob(f"{out}/part-*.trig"))
    text = "".join(open(f, encoding="utf-8").read() for f in files)
    for lbl in re.findall(r"_:(\S+)", text):
        assert re.fullmatch(r"[A-Za-z0-9_]+", lbl), lbl
    back = read_trig(files).to_pandas()
    cols = list(QUAD_SCHEMA.names)
    a = back[cols].fillna("~").sort_values(cols).reset_index(drop=True)
    b = tbl.to_pandas()[cols].fillna("~").sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_trig_iri_and_bnode_graphs_same_label_stay_distinct(ray_session, tmp_path):
    """An IRI graph and a bnode graph with an identical RAW label must land
    in separate blocks — the block key is (graph_kind, label), not label."""
    import glob

    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.sources.nquads import QUAD_SCHEMA
    from rdf_xml_ex_ray.sources.trig import read_trig, write_trig

    rows = [
        ("http://e/s1", "iri", "http://e/p", "iri", "http://e/o1", None, None,
         "glabel", "bnode"),
        ("http://e/s2", "iri", "http://e/p", "iri", "http://e/o2", None, None,
         "glabel", "iri"),
    ]
    tbl = pa.table(
        {n: pa.array([r[i] for r in rows]) for i, n in enumerate(QUAD_SCHEMA.names)},
        schema=QUAD_SCHEMA,
    )
    out = str(tmp_path / "trig2")
    write_trig(rd.from_arrow(tbl), out, num_buckets=1).to_pandas()
    back = read_trig(sorted(glob.glob(f"{out}/part-*.trig"))).to_pandas()
    cols = list(QUAD_SCHEMA.names)
    a = back[cols].fillna("~").sort_values(cols).reset_index(drop=True)
    b = tbl.to_pandas()[cols].fillna("~").sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    assert set(zip(back["graph_kind"], back["graph"])) == {
        ("bnode", "glabel"), ("iri", "glabel"),
    }


def test_trig_general_grammar_forms(ray_session, tmp_path):
    """The TriG reader is the general grammar: GRAPH keyword, label-less
    default block, collections and shorthand literals inside blocks."""
    doc = """
@prefix ex: <http://e/> .
ex:s ex:p "default" .
GRAPH ex:g1 { ex:a ex:p 1, 2 ; a ex:T . }
ex:g2 { ex:b ex:p (1 2) }
{ ex:c ex:p true . }
"""
    f = tmp_path / "t.trig"
    f.write_text(doc, encoding="utf-8")
    from rdf_xml_ex_ray.sources.trig import read_trig

    df = read_trig(str(f)).to_pandas()
    # 1 default + 3 in g1 + 5 in g2 (list head + 2x first/rest) + 1 anon
    assert len(df) == 10
    assert set(df["graph"].dropna()) == {"http://e/g1", "http://e/g2"}
    assert (df["graph"].isna()).sum() == 2  # bare statement + anon block
    assert (df["obj_datatype"] == "http://www.w3.org/2001/XMLSchema#integer").sum() == 4
