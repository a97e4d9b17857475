"""Incremental (SAX-style) decode: parity with the tree parser on the W3C
corpus, bounded memory on a document far larger than any drain batch, and the
two Ray file-source paths (VERDICT r1 'What's missing' #1)."""

import tracemalloc

import pytest

from w3c_corpus import load_cases


def _gen_large_doc_chunks(n_descriptions: int):
    """Generator of XML chunks for a synthetic document of n descriptions —
    never materializes the whole document."""
    yield (
        '<?xml version="1.0"?>\n'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:eg="http://example.org/ns#">\n'
    )
    for i in range(n_descriptions):
        yield (
            f'<rdf:Description rdf:about="http://example.org/e{i}">'
            f'<eg:name xml:lang="en">entity number {i} with some padding text</eg:name>'
            f'<eg:rank rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">{i}</eg:rank>'
            f'<eg:link rdf:resource="http://example.org/e{(i + 1) % n_descriptions}"/>'
            "</rdf:Description>\n"
        )
    yield "</rdf:RDF>\n"


def test_streaming_matches_tree_parser_on_w3c_corpus():
    """Every positive case: identical triple sets AND identical blank-node
    labels (same allocator order); every negative case: ParseError both ways."""
    from rdf_xml_ex_ray.core.terms import ParseError
    from rdf_xml_ex_ray.decoder.parser import parse_rdfxml
    from rdf_xml_ex_ray.decoder.streaming import stream_parse_rdfxml

    cases = load_cases()
    if not cases:
        pytest.skip("W3C corpus unavailable")
    n_pos = n_neg = 0
    for case in cases:
        data = open(case.rdf_path, "rb").read()
        # feed in awkward 37-byte chunks to exercise re-entrant expat state
        chunks = [data[i : i + 37] for i in range(0, len(data), 37)]
        if case.positive:
            g_tree = parse_rdfxml(data, base=case.base)
            g_stream = stream_parse_rdfxml(chunks, base=case.base)
            assert set(g_tree.triples()) == set(g_stream.triples()), case.name
            n_pos += 1
        else:
            with pytest.raises(ParseError):
                stream_parse_rdfxml(chunks, base=case.base)
            n_neg += 1
    assert n_pos > 100 and n_neg > 30


def test_streaming_decode_flat_memory():
    """A ~35 MB document decoded via iter_parse_rdfxml must never hold more
    than a few MB of Python heap: the tree is pruned per description and
    triples drain in bounded batches."""
    from rdf_xml_ex_ray.decoder.streaming import iter_parse_rdfxml

    n = 120_000  # ≈ 35 MB of XML, 480k triples
    total_triples = 0
    total_bytes = 0

    def counted_chunks():
        nonlocal total_bytes
        for c in _gen_large_doc_chunks(n):
            total_bytes += len(c)
            yield c

    tracemalloc.start()
    for batch in iter_parse_rdfxml(counted_chunks(), drain_rows=5_000):
        total_triples += len(batch)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    assert total_triples == 3 * n
    assert total_bytes > 30_000_000
    # tree parse of the same doc holds >10x the document size; the streaming
    # path must stay under a small constant regardless of document length
    assert peak < 16_000_000, f"peak heap {peak} bytes — streaming is not flat"


def test_streaming_drain_does_not_split_nodeid_scope():
    """rdf:nodeID labels must map to the same generated bnode across drains."""
    from rdf_xml_ex_ray.decoder.streaming import iter_parse_rdfxml

    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:eg="http://example.org/ns#">'
        '<rdf:Description rdf:nodeID="shared"><eg:p>one</eg:p></rdf:Description>'
        '<rdf:Description rdf:about="http://example.org/x">'
        '<eg:q rdf:nodeID="shared"/></rdf:Description>'
        "</rdf:RDF>"
    )
    batches = list(iter_parse_rdfxml([doc], drain_rows=1))
    triples = [t for b in batches for t in b]
    subj_bnodes = {s for s, _, _ in triples if type(s).__name__ == "BNode"}
    obj_bnodes = {o for _, _, o in triples if type(o).__name__ == "BNode"}
    assert subj_bnodes == obj_bnodes and len(subj_bnodes) == 1


def test_read_rdfxml_streaming_threshold_path(ray_session, tmp_path):
    """A file above the streaming threshold decodes identically to the tree
    path (same rows), through the generator UDF."""
    from rdf_xml_ex_ray.sources.rdfxml import read_rdfxml

    p = tmp_path / "big.rdf"
    with open(p, "w") as f:
        for chunk in _gen_large_doc_chunks(2000):
            f.write(chunk)

    tree_df = read_rdfxml([str(p)], streaming_threshold=1 << 40).to_pandas()
    stream_df = read_rdfxml([str(p)], streaming_threshold=1024).to_pandas()
    cols = [c for c in tree_df.columns]
    a = tree_df[cols].sort_values(cols).reset_index(drop=True)
    b = stream_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == 6000 and a.equals(b)


def test_read_rdfxml_streamed_source(ray_session, tmp_path):
    """The constant-memory source (chunked pyarrow.fs reads, no whole-file
    load) produces the same rows as the batch source."""
    from rdf_xml_ex_ray.sources.rdfxml import read_rdfxml, read_rdfxml_streamed

    paths = []
    for k in range(3):
        p = tmp_path / f"part{k}.rdf"
        with open(p, "w") as f:
            for chunk in _gen_large_doc_chunks(500):
                f.write(chunk)
        paths.append(str(p))

    batch_df = read_rdfxml(paths).to_pandas()
    stream_df = read_rdfxml_streamed(paths, feed_chunk=8192).to_pandas()
    cols = list(batch_df.columns)
    a = batch_df[cols].sort_values(cols).reset_index(drop=True)
    b = stream_df[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == 3 * 500 * 3 and a.equals(b)
