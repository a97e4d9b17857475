#!/usr/bin/env python
"""Generate CONFORMANCE.md and earl_reports/rdf_xml_ex_ray.ttl — the W3C
RDF 1.1 XML suite results, in both the human-readable form and the
machine-readable EARL/Turtle format the reference publishes
(/root/reference/earl_reports/rdf_xml.ttl: 154 passed / 8 failed there;
same @prefix set, earl:Assertion shape, and test-IRI scheme).

Usage: python tools/conformance_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from w3c_corpus import load_cases  # noqa: E402

from rdf_xml_ex_ray.core.isomorphism import isomorphic  # noqa: E402
from rdf_xml_ex_ray.core.ntriples import parse_ntriples  # noqa: E402
from rdf_xml_ex_ray.core.terms import ParseError  # noqa: E402
from rdf_xml_ex_ray.decoder.parser import parse_rdfxml  # noqa: E402

# the reference's 8 documented skips (w3c_test.exs:21-46) — all pass here
REFERENCE_SKIPS = {
    "rdf-element-not-mandatory/test001",
    "rdfms-syntax-incomplete/test004",
    "rdf-ns-prefix-confusion/test0010",
    "rdf-ns-prefix-confusion/test0011",
    "rdf-ns-prefix-confusion/test0012",
    "rdf-ns-prefix-confusion/test0013",
    "rdf-ns-prefix-confusion/test0014",
    "xml-canon/test001",
}


def main() -> int:
    cases = load_cases()
    if not cases:
        print("W3C corpus not available", file=sys.stderr)
        return 1
    rows = []
    passed = failed = 0
    for c in cases:
        with open(c.rdf_path, "rb") as f:
            data = f.read()
        if c.positive:
            kind = "eval"
            try:
                g = parse_rdfxml(data, base=c.base, bnode_prefix="j")
                with open(c.nt_path, encoding="utf-8") as f:
                    ok = isomorphic(g.triples(), parse_ntriples(f.read()))
            except Exception:
                ok = False
        else:
            kind = "negative"
            try:
                parse_rdfxml(data, base=c.base)
                ok = False
            except ParseError:
                ok = True
            except Exception:
                ok = False
        passed += ok
        failed += not ok
        rows.append((c.name, kind, ok))

    n_eval = sum(1 for _, k, _ in rows if k == "eval")
    out = [
        "# W3C RDF 1.1 XML Syntax test suite — conformance report",
        "",
        f"Engine: rdf_xml_ex_ray (production parse path, `decoder/parser.py`).",
        f"Corpus: {len(rows)} cases ({n_eval} eval / {len(rows) - n_eval} negative-syntax).",
        "",
        f"**Result: {passed} passed / {failed} failed.**",
        f"Reference (rdf-xml-ex v1.2.1 EARL report): 161 passed / 8 skipped-failing;",
        "all 8 reference skips pass here:",
        "",
    ]
    for name in sorted(REFERENCE_SKIPS):
        status = "PASS" if next(ok for n, _, ok in rows if n == name) else "FAIL"
        out.append(f"- `{name}` — {status} (reference: skipped)")
    out += ["", "<details><summary>Full per-case results</summary>", ""]
    for name, kind, ok in rows:
        out.append(f"- {'✅' if ok else '❌'} `{name}` ({kind})")
    out += ["", "</details>", ""]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "CONFORMANCE.md"), "w") as f:
        f.write("\n".join(out))
    write_earl(rows, repo)
    print(f"{passed}/{len(rows)} passed → CONFORMANCE.md + earl_reports/rdf_xml_ex_ray.ttl")
    return 0 if failed == 0 else 2


PROJECT_IRI = "urn:rdf-xml-ex-ray:project"
TEST_BASE = "http://www.w3.org/2013/RDFXMLTests/#"


def write_earl(rows, repo: str) -> None:
    """EARL/Turtle assertions, one per suite case — the reference's report
    format (earl_reports/rdf_xml.ttl; emitted by its mix earl task,
    mix.exs:121-125). Assertor/subject are the project IRI (software, not a
    person); test IRIs use the suite's `<dir>-<name>` fragment scheme."""
    from datetime import datetime, timezone

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    lines = [
        "@prefix dc: <http://purl.org/dc/terms/> .",
        "@prefix doap: <http://usefulinc.com/ns/doap#> .",
        "@prefix earl: <http://www.w3.org/ns/earl#> .",
        "@prefix foaf: <http://xmlns.com/foaf/0.1/> .",
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .",
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
        "",
        "<>",
        f'    dc:issued "{stamp}"^^xsd:dateTime ;',
        f"    foaf:primaryTopic <{PROJECT_IRI}> .",
        "",
        f"<{PROJECT_IRI}>",
        "    a doap:Project, earl:Software, earl:TestSubject, earl:Assertor ;",
        '    doap:name "rdf_xml_ex_ray" ;',
        '    doap:shortdesc "Ray-Data-native RDF/XML engine" ;',
        "    doap:implements <http://www.w3.org/TR/rdf-syntax-grammar/> ;",
        '    doap:programming-language "Python" .',
        "",
    ]
    for name, _, ok in rows:
        outcome = "earl:passed" if ok else "earl:failed"
        test_iri = TEST_BASE + name.replace("/", "-")
        lines += [
            "[",
            "    a earl:Assertion ;",
            f"    earl:assertedBy <{PROJECT_IRI}> ;",
            "    earl:mode earl:automatic ;",
            "    earl:result [",
            "        a earl:TestResult ;",
            f'        dc:date "{stamp}"^^xsd:dateTime ;',
            f"        earl:outcome {outcome}",
            "    ] ;",
            f"    earl:subject <{PROJECT_IRI}> ;",
            f"    earl:test <{test_iri}>",
            "] .",
            "",
        ]
    earl_dir = os.path.join(repo, "earl_reports")
    os.makedirs(earl_dir, exist_ok=True)
    with open(os.path.join(earl_dir, "rdf_xml_ex_ray.ttl"), "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    sys.exit(main())
