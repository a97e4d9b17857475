"""Stage-level units: renderer/parser invariants, linker, canonicalization,
dedup kernels — no Ray session needed (pure callables)."""

import pandas as pd
import pyarrow as pa

from rdf_xml_ex_ray.core.terms import Literal
from rdf_xml_ex_ray.decoder.parser import parse_rdfxml
from rdf_xml_ex_ray.pipelines.dedup import minhash_signature, simhash64, _shingles
from rdf_xml_ex_ray.stages.canonicalize import add_subj_bucket, dedup_sort_group
from rdf_xml_ex_ray.stages.linker import EntityLinker
from rdf_xml_ex_ray.stages.parse import ParseDocs
from rdf_xml_ex_ray.transcripts.ontology import P_ROLE, P_TEXT, ROLE_NS, turn_iri
from rdf_xml_ex_ray.transcripts.render import render_conversation

NASTY_TEXTS = [
    "plain text",
    'quotes " and \' apostrophes',
    "angle <brackets> & ampersands && more",
    "unicode: héllo wörld — ü ñ 中文 🙂",
    "  leading/trailing whitespace  ",
    "a]]>cdata-ish & <not-an-element>",
    "tab\there",
]


def test_per_turn_text_equality_invariant():
    """BASELINE.json input_hint: per-turn text equality under stable
    (conv_id, turn_idx) ordering — render → parse must preserve every turn's
    text byte-for-byte."""
    turns = [(f"user", t, None, 1000 + i) for i, t in enumerate(NASTY_TEXTS)]
    doc = render_conversation("cX", turns)
    g = parse_rdfxml(doc, bnode_prefix="cX!b")
    by_turn = {
        s: o.lexical
        for s, p, o in g
        if str(p) == P_TEXT and isinstance(o, Literal)
    }
    for i, t in enumerate(NASTY_TEXTS):
        assert by_turn[turn_iri("cX", i)] == t


def test_bnode_labels_deterministic_per_conversation():
    turns = [("tool", "x", "search", 1), ("user", "y", None, 2), ("tool", "z", "calc", 3)]
    doc = render_conversation("c7", turns)
    g = parse_rdfxml(doc, bnode_prefix="c7!b")
    bnodes = sorted({str(s) for s, _, _ in g if s.__class__.__name__ == "BNode"})
    assert bnodes == ["c7!b0", "c7!b1"]


def test_parse_docs_stage_rejects():
    stage = ParseDocs()
    batch = pa.table(
        {
            "conv_id": ["good", "bad"],
            "doc": [
                render_conversation("good", [("user", "hi", None, 1)]),
                "<broken",
            ],
        }
    )
    out = stage(batch)
    errs = out.filter(pa.compute.is_valid(out["error"]))
    assert errs.num_rows == 1 and errs["conv_id"][0].as_py() == "bad"
    oks = out.filter(pa.compute.is_null(out["error"]))
    assert set(oks["conv_id"].to_pylist()) == {"good"}


def test_entity_linker_rewrites_roles_only():
    linker = EntityLinker()
    batch = pa.table(
        {
            "pred": [P_ROLE, P_ROLE, P_ROLE, P_TEXT],
            "obj_kind": ["iri", "iri", "iri", "literal"],
            "obj_value": [
                ROLE_NS + "AI",
                ROLE_NS + "usr",
                ROLE_NS + "narrator",  # unknown → lowercased passthrough
                ROLE_NS + "AI",  # literal: untouched even though it matches
            ],
        }
    )
    out = linker(batch)["obj_value"].to_pylist()
    assert out == [
        ROLE_NS + "assistant",
        ROLE_NS + "user",
        ROLE_NS + "narrator",
        ROLE_NS + "AI",
    ]


def test_canonicalize_dedup_and_sort_deterministic():
    rows = pd.DataFrame(
        {
            "subj": ["b", "a", "b", "a"],
            "subj_kind": ["iri"] * 4,
            "pred": ["p", "p", "p", "p"],
            "obj_kind": ["literal"] * 4,
            "obj_value": ["2", "1", "2", "1"],
            "obj_lang": [None] * 4,
            "obj_datatype": [None] * 4,
            "subj_bucket": [0] * 4,
            "conv_id": ["c1", "c2", "c3", "c2"],
        }
    )
    out = dedup_sort_group(rows)
    assert list(out["subj"]) == ["a", "b"]
    # same rows in any order → same output
    out2 = dedup_sort_group(rows.iloc[::-1].reset_index(drop=True))
    assert list(out2["subj"]) == list(out["subj"])
    assert list(out2["obj_value"]) == list(out["obj_value"])


def test_subj_bucket_stable_across_calls():
    t = pa.table({"subj": ["x", "y", "z"]})
    b1 = add_subj_bucket(t, 16)["subj_bucket"].to_pylist()
    b2 = add_subj_bucket(t, 16)["subj_bucket"].to_pylist()
    assert b1 == b2
    assert all(0 <= b < 16 for b in b1)


def test_minhash_similarity_monotone():
    a = "the quick brown fox jumps over the lazy dog " * 5
    near = a.replace("lazy", "sleepy")
    far = "completely different content about spark query engines and rays"
    sig_a, sig_near, sig_far = map(minhash_signature, (a, near, far))
    est_near = (sig_a == sig_near).mean()
    est_far = (sig_a == sig_far).mean()
    assert est_near > 0.5 > est_far
    sa, sn = _shingles(a), _shingles(near)
    true_j = len(sa & sn) / len(sa | sn)
    assert abs(est_near - true_j) < 0.25


def test_simhash_near_docs_close_in_hamming():
    a = "the quick brown fox jumps over the lazy dog " * 5
    near = a + "extra token"
    far = "completely different words entirely here now"
    ha, hn, hf = simhash64(a), simhash64(near), simhash64(far)
    d_near = bin(ha ^ hn).count("1")
    d_far = bin(ha ^ hf).count("1")
    assert d_near < d_far
    assert d_near <= 8


def test_skew_aware_canonicalize_matches_plain(ray_session):
    """Hot-subject skew: one subject holds half the triples + duplicates;
    the two-phase skew-aware path must produce exactly the plain path's
    output."""
    import ray.data as rd

    from rdf_xml_ex_ray.stages.canonicalize import canonicalize, canonicalize_skew_aware

    rows = []
    for i in range(500):
        rows.append(
            {
                "subj": "http://example.org/role/system",  # hot
                "subj_kind": "iri",
                "pred": f"http://example.org/p{i % 7}",
                "obj_kind": "literal",
                "obj_value": f"v{i % 50}",  # duplicates across i
                "obj_lang": None,
                "obj_datatype": None,
                "conv_id": f"c{i % 13}",
            }
        )
        rows.append(
            {
                "subj": f"http://example.org/conv/c{i}",
                "subj_kind": "iri",
                "pred": "http://example.org/q",
                "obj_kind": "iri",
                "obj_value": f"http://example.org/o{i}",
                "obj_lang": None,
                "obj_datatype": None,
                "conv_id": f"c{i % 13}",
            }
        )
    ds = rd.from_items(rows)
    cols = ["subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype", "subj_bucket"]
    plain = canonicalize(ds, num_buckets=8).to_pandas()[cols]
    skew = canonicalize_skew_aware(rd.from_items(rows), num_buckets=8, dedup_partitions=32).to_pandas()[cols]
    key = cols
    a = plain.sort_values(key).reset_index(drop=True)
    b = skew.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # dedup really happened: 7*50 distinct hot triples + 500 conv triples
    assert len(a) == 7 * 50 + 500


def test_embedding_cell_cap_equivalence(ray_session, tmp_path):
    """A hot label split into capped block-pairs must emit exactly the same
    near-dup pairs as the uncapped all-pairs group (VERDICT r1 item 7)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_xml_ex_ray.pipelines.dedup import dedup_embedding

    rng = np.random.RandomState(7)
    n_hot, n_cold, dim = 40, 20, 8
    base = rng.randn(dim)
    vecs, labels = [], []
    for i in range(n_hot):  # hot label: many near-dups of one direction
        vecs.append((base + 0.3 * rng.randn(dim)).tolist())
        labels.append("hot")
    for i in range(n_cold):
        vecs.append(rng.randn(dim).tolist())
        labels.append(f"cold{i % 3}")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_hot + n_cold), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
            "label": pa.array(labels, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    capped = dedup_embedding(str(tmp_path), cell_cap=8).to_pandas()
    uncapped = dedup_embedding(str(tmp_path), cell_cap=10**9).to_pandas()
    key = ["vec_a", "vec_b"]
    a = capped.sort_values(key).reset_index(drop=True)
    b = uncapped.sort_values(key).reset_index(drop=True)
    assert len(a) > 50  # the hot label really produces pairs
    assert a[key].equals(b[key])
    assert np.allclose(a["cos_sim"], b["cos_sim"], atol=1e-9)
