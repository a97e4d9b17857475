"""CLI export surface (``ray job submit`` contract, run as real
subprocesses so each invocation owns its Ray session): the kg store exports
to spec-valid .nt/.ttl, the clean store exports to deterministic .jsonl,
and malformed --prefix specs are rejected up front (round-3 ADVICE)."""

import glob
import json
import os
import re
import subprocess
import sys

import pytest

SF = "/root/testdata/sf0.001"


def run_cli(*args, check=True):
    proc = subprocess.run(
        [sys.executable, "-m", "rdf_xml_ex_ray", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env=dict(os.environ, RAY_DEDUP_LOGS="0"),
    )
    if check and proc.returncode != 0:
        raise AssertionError(f"CLI failed ({proc.returncode}):\n{proc.stderr[-2000:]}")
    return proc


@pytest.fixture(scope="module")
def kg_store(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "kgstore")
    proc = run_cli("kg", "--sf-dir", SF, "--out", out, "--buckets", "8", "--num-cpus", "4")
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["n_triples"] > 0
    return out


@pytest.fixture(scope="module")
def clean_store(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "cleanstore")
    proc = run_cli("clean", "--sf-dir", SF, "--out", out, "--buckets", "8", "--num-cpus", "4")
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["n_docs"] > 0
    return out


def test_export_nt_spec_valid(kg_store, tmp_path):
    out = str(tmp_path / "nt")
    proc = run_cli("export", f"{kg_store}/triples", "--out", out, "--num-cpus", "4")
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    files = sorted(glob.glob(f"{out}/part-*.nt"))
    assert files and info["n_triples"] > 0
    text = "".join(open(f, encoding="utf-8").read() for f in files)
    assert text.count(" .\n") == info["n_triples"]
    for lbl in re.findall(r"_:(\S+)", text):
        assert re.fullmatch(r"[A-Za-z0-9_]+", lbl), lbl


def test_export_rdfxml_roundtrips(kg_store, tmp_path):
    """export --format rdf writes bucketed RDF/XML the repo's own decoder
    reads back in full (spec-valid nodeIDs, auto-derived prefixes)."""
    from rdf_xml_ex_ray.decoder.parser import parse_rdfxml

    out = str(tmp_path / "rdf")
    proc = run_cli(
        "export", f"{kg_store}/triples", "--out", out,
        "--format", "rdf", "--num-cpus", "4",
    )
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    files = sorted(glob.glob(f"{out}/part-*.rdf"))
    assert files and len(files) == info["files"]
    n = 0
    for f in files:
        n += len(parse_rdfxml(open(f, "rb").read(), base="http://b/"))
    # every store triple decodes back (set semantics both sides)
    import duckdb

    total = duckdb.sql(
        f"SELECT count(*) FROM '{kg_store}/triples/**/*.parquet'"
    ).fetchone()[0]
    assert n == total


def test_export_ttl_with_prefix_roundtrips(kg_store, tmp_path):
    out = str(tmp_path / "ttl")
    proc = run_cli(
        "export", f"{kg_store}/triples", "--out", out, "--format", "ttl",
        "--prefix", "c=http://example.org/convo#", "--num-cpus", "4",
    )
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    files = sorted(glob.glob(f"{out}/part-*.ttl"))
    assert files and info["n_triples"] > 0
    # the general reader parses the export back to the same triple count
    from rdf_xml_ex_ray.core.turtle import parse_turtle

    total = sum(len(parse_turtle(open(f, encoding="utf-8").read())) for f in files)
    assert total == info["n_triples"]


def test_export_bad_prefix_rejected(kg_store, tmp_path):
    for spec in ["=http://x#", "noeq", "9bad=http://x#", "c="]:
        proc = run_cli(
            "export", f"{kg_store}/triples", "--out", str(tmp_path / "x"),
            "--format", "ttl", "--prefix", spec, "--num-cpus", "4", check=False,
        )
        assert proc.returncode != 0, spec
        assert "--prefix" in proc.stderr, spec


def test_export_corpus_jsonl_roundtrip(clean_store, tmp_path):
    out = str(tmp_path / "jsonl")
    proc = run_cli(
        "export-corpus", f"{clean_store}/corpus", "--out", out, "--num-cpus", "4"
    )
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    files = sorted(glob.glob(f"{out}/part-*.jsonl"))
    assert files and info["n_docs"] > 0
    docs = [json.loads(line) for f in files for line in open(f, encoding="utf-8")]
    assert len(docs) == info["n_docs"]
    import pandas as pd
    import pyarrow.dataset as pads

    got = pd.DataFrame(docs).sort_values("doc_id").reset_index(drop=True)

    want = (
        pads.dataset(f"{clean_store}/corpus", partitioning="hive")
        .to_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert set(got["doc_id"]) == set(want["doc_id"])
    merged = got.merge(want, on="doc_id", suffixes=("_j", "_p"))
    assert (merged["text_j"] == merged["text_p"]).all()


def test_cli_bgp_over_store(kg_store):
    """BGP subcommand: pattern query over an exported store, both the
    printed-bindings path and a projected parquet output."""
    proc = run_cli(
        "bgp", os.path.join(kg_store, "triples"),
        "--pattern", "?conv <http://example.org/convo#turn> ?t",
        "--pattern", "?t <http://example.org/convo#toolUse> ?b",
        "--project", "conv,t",
        "--limit", "5", "--num-cpus", "4",
    )
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines() if x.startswith("{")]
    summary = lines[-1]
    assert summary["n_bindings"] > 0 and summary["shown"] == 5
    assert set(lines[0]) == {"conv", "t"}


def test_cli_bgp_rejects_cartesian(kg_store):
    proc = run_cli(
        "bgp", os.path.join(kg_store, "triples"),
        "--pattern", "?a <http://example.org/convo#turn> ?b",
        "--pattern", "?x <http://example.org/convo#tool> ?y",
        "--num-cpus", "4",
        check=False,
    )
    assert proc.returncode != 0
    assert "disconnected" in proc.stderr


def test_cli_export_quads(kg_store, tmp_path_factory):
    """export --format nq/trig: per-conversation named graphs derived at
    export time; the .nq file re-reads to the same quad count."""
    d = tmp_path_factory.mktemp("quads")
    proc = run_cli(
        "export", os.path.join(kg_store, "triples"),
        "--out", str(d / "nq"), "--format", "nq", "--buckets", "4", "--num-cpus", "4",
    )
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["n_quads"] > 0 and info["format"] == "nq"
    text = "".join(
        open(f, encoding="utf-8").read() for f in glob.glob(str(d / "nq" / "part-*.nq"))
    )
    assert text.count("\n") == info["n_quads"]
    assert "<http://example.org/conv/c" in text.splitlines()[0].rsplit(" ", 2)[-2]
    proc2 = run_cli(
        "export", os.path.join(kg_store, "triples"),
        "--out", str(d / "trig"), "--format", "trig", "--buckets", "4", "--num-cpus", "4",
    )
    info2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    assert info2["n_quads"] == info["n_quads"]


def test_cli_sparql_over_store(kg_store):
    proc = run_cli(
        "sparql",
        "PREFIX c: <http://example.org/convo#> "
        "SELECT DISTINCT ?conv ?tool WHERE { ?conv c:turn ?t . "
        "?t c:toolUse ?u . ?u c:tool ?tool } LIMIT 5",
        os.path.join(kg_store, "triples"),
        "--num-cpus", "4",
    )
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines() if x.startswith("{")]
    assert lines[-1]["n_bindings"] == 5  # LIMIT applied before count
    assert set(lines[0]) == {"conv", "tool"}


def test_cli_sparql_describe(kg_store):
    """DESCRIBE dispatches through the CLI (regression: the form was
    parsed but missing from the dispatch map -> KeyError)."""
    proc = run_cli(
        "sparql",
        "PREFIX c: <http://example.org/convo#> DESCRIBE ?conv "
        "WHERE { ?conv c:turn ?t } ",
        os.path.join(kg_store, "triples"),
        "--num-cpus", "4",
    )
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines() if x.startswith("{")]
    assert lines[-1]["n_bindings"] > 0
    assert {"subj", "pred", "obj_value"} <= set(lines[0])


def test_cli_construct_out_is_requeryable_store(kg_store, tmp_path_factory):
    """CONSTRUCT --out writes a canonical full-schema store the sparql
    subcommand can immediately query again."""
    store = os.path.join(kg_store, "triples")
    out = str(tmp_path_factory.mktemp("cstore") / "derived")
    cq = ("PREFIX c: <http://example.org/convo#> "
          "CONSTRUCT { ?conv c:usedTool ?tool } "
          "WHERE { ?conv c:turn ?t . ?t c:toolUse ?u . ?u c:tool ?tool }")
    proc = run_cli("sparql", cq, store, "--out", out, "--num-cpus", "4")
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["store"] is True and info["n_triples"] > 0
    proc = run_cli(
        "sparql",
        "PREFIX c: <http://example.org/convo#> SELECT DISTINCT ?tool "
        "WHERE { ?conv c:usedTool ?tool }",
        out, "--num-cpus", "4",
    )
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    assert lines[-1]["n_bindings"] > 0
    assert all("tool/" in r["tool"] for r in lines[:-1])


def test_cli_sparql_rejects_bad_query(kg_store):
    proc = run_cli(
        "sparql", "SELECT ?x WHERE { ?x ex:p ?y }",
        os.path.join(kg_store, "triples"), "--num-cpus", "4",
        check=False,
    )
    assert proc.returncode != 0
    assert "undeclared prefix" in proc.stderr


@pytest.fixture(scope="module")
def quad_store(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    d = tmp_path_factory.mktemp("cli") / "quads"
    d.mkdir()
    rows = [
        ("a", "iri", "http://e/p", "iri", "b", None, None, "http://g/1", "iri"),
        ("c", "iri", "http://e/p", "iri", "d", None, None, "http://g/2", "iri"),
    ]
    names = TRIPLE_SCHEMA.names + ["graph", "graph_kind"]
    pq.write_table(
        pa.table({n: [r[i] for r in rows] for i, n in enumerate(names)}),
        d / "part.parquet",
    )
    return str(d)


def test_cli_sparql_graph_pattern_on_quad_store(quad_store):
    """Regression: the CLI's column projection used to strip the graph
    columns, so GRAPH patterns over a quad store found nothing."""
    proc = run_cli(
        "sparql",
        "SELECT ?g ?o WHERE { GRAPH ?g { ?s <http://e/p> ?o } } ORDER BY ?g",
        quad_store, "--num-cpus", "4",
    )
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines() if x.startswith("{")]
    assert lines[-1]["n_bindings"] == 2
    assert [r["g"] for r in lines[:2]] == ["http://g/1", "http://g/2"]


def test_cli_update_rejects_quad_store(quad_store):
    """Silently dropping the graph column would rewrite a quad store as
    its default-graph projection — the update CLI rejects instead."""
    proc = run_cli(
        "update", "DELETE WHERE { ?s <http://e/p> ?o }",
        quad_store, "--out", quad_store + "_out", "--num-cpus", "4",
        check=False,
    )
    assert proc.returncode != 0 and "quad stores" in proc.stderr


def test_cli_update_roundtrip(kg_store, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "updated")
    proc = run_cli(
        "update",
        "PREFIX c: <http://example.org/convo#> "
        'DELETE { ?t c:role ?r } INSERT { ?t c:roleLabel ?r } '
        "WHERE { ?t c:role ?r }",
        os.path.join(kg_store, "triples"),
        "--out", out, "--num-cpus", "4",
    )
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["n_triples"] > 0
    # the rewritten store answers through the sparql CLI
    proc = run_cli(
        "sparql",
        "PREFIX c: <http://example.org/convo#> "
        "SELECT DISTINCT ?r WHERE { ?t c:roleLabel ?r }",
        out, "--num-cpus", "4",
    )
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines() if x.startswith("{")]
    assert lines[-1]["n_bindings"] >= 2  # user + assistant (+ any others)


def test_cli_sparql_results_formats(kg_store):
    store = os.path.join(kg_store, "triples")
    q = ("PREFIX c: <http://example.org/convo#> "
         "SELECT ?t ?r WHERE { ?t c:role ?r } LIMIT 3")
    proc = run_cli("sparql", q, store, "--format", "json", "--num-cpus", "4")
    doc = json.loads(proc.stdout.strip().splitlines()[-1])
    assert doc["head"]["vars"] == ["t", "r"]
    assert len(doc["results"]["bindings"]) == 3
    assert doc["results"]["bindings"][0]["r"]["type"] == "uri"
    proc = run_cli("sparql", q, store, "--format", "tsv", "--num-cpus", "4")
    assert proc.stdout.splitlines()[0] == "?t\t?r"
    proc = run_cli("sparql", q, store, "--format", "csv", "--num-cpus", "4")
    assert proc.stdout.splitlines()[0].rstrip("\r") == "t,r"
    proc = run_cli("sparql", q, store, "--format", "xml", "--num-cpus", "4")
    import xml.etree.ElementTree as ET

    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    root = ET.fromstring(proc.stdout)
    assert [v.get("name") for v in root.findall("sr:head/sr:variable", ns)] \
        == ["t", "r"]
    assert len(root.findall("sr:results/sr:result", ns)) == 3


def test_cli_sparql_graph_doc_formats(kg_store):
    from rdf_xml_ex_ray.core.ntriples import parse_ntriples
    from rdf_xml_ex_ray.core.turtle import parse_turtle

    store = os.path.join(kg_store, "triples")
    cq = ("PREFIX c: <http://example.org/convo#> "
          "CONSTRUCT { ?conv c:usedTool ?tool } "
          "WHERE { ?conv c:turn ?t . ?t c:toolUse ?u . ?u c:tool ?tool }")
    proc = run_cli("sparql", cq, store, "--format", "nt", "--num-cpus", "4")
    triples = parse_ntriples(proc.stdout)
    assert triples and all(
        str(p) == "http://example.org/convo#usedTool" for _s, p, _o in triples
    )
    dq = ("PREFIX c: <http://example.org/convo#> "
          "DESCRIBE ?t WHERE { <http://example.org/conv/c0> c:turn ?t }")
    proc = run_cli("sparql", dq, store, "--format", "ttl", "--num-cpus", "4")
    assert proc.stdout.startswith("@prefix") and parse_turtle(proc.stdout)
    # RDF/XML graph doc decodes back through the repo's own parser
    from rdf_xml_ex_ray.decoder.parser import parse_rdfxml

    proc = run_cli("sparql", cq, store, "--format", "rdf", "--num-cpus", "4")
    g = parse_rdfxml(proc.stdout.encode())
    assert len(g) == len(triples)  # same graph as the NT doc
    # SELECT doesn't serialize as a graph doc
    proc = run_cli(
        "sparql", "SELECT ?t ?r WHERE { ?t <http://example.org/convo#role> ?r }",
        store, "--format", "nt", "--num-cpus", "4", check=False,
    )
    assert proc.returncode != 0 and "nt" in proc.stderr
