"""SPARQL SELECT front-end: parser fragment coverage, loud rejection of
out-of-fragment syntax, and executor semantics (DISTINCT, deterministic
LIMIT) against the BGP engine on a tiny graph."""

import pyarrow as pa
import pytest

from rdf_xml_ex_ray.core.sparql import parse_select
from rdf_xml_ex_ray.core.terms import ParseError

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_parse_full_form():
    q = parse_select(
        """
        PREFIX ex: <http://e/>
        SELECT DISTINCT ?a ?b
        WHERE { ?a ex:knows ?b . ?b a ex:T . ?a ex:name "Ann" }
        LIMIT 5
        """
    )
    assert q["project"] == ["a", "b"]
    assert q["distinct"] is True
    assert q["limit"] == 5
    assert q["patterns"] == [
        ("?a", "http://e/knows", "?b"),
        ("?b", RDF_TYPE, "http://e/T"),
        ("?a", "http://e/name", "Ann"),
    ]


def test_parse_star_binds_all_vars_in_order():
    q = parse_select("SELECT * WHERE { ?x <http://e/p> ?y . ?y <http://e/q> ?z }")
    assert q["project"] == ["x", "y", "z"]
    assert q["distinct"] is False and q["limit"] is None


def test_parse_keywords_case_insensitive():
    q = parse_select("select ?x where { ?x <http://e/p> "
                     '"v" } limit 2')
    assert q["project"] == ["x"] and q["limit"] == 2


def test_parse_pname_must_not_absorb_statement_dot():
    # 'ex:o.' (statement terminator, no space) — PN_LOCAL must not end with
    # '.', so the dot lexes as the triple terminator, not into the IRI.
    q = parse_select(
        "PREFIX ex: <http://e/> SELECT ?s WHERE { ?s ex:p ex:o. ?s ex:q ?w }"
    )
    assert q["patterns"] == [
        ("?s", "http://e/p", "http://e/o"),
        ("?s", "http://e/q", "?w"),
    ]
    # interior dots are still legal PN_LOCAL
    q2 = parse_select("PREFIX ex: <http://e/> SELECT ?s WHERE { ?s ex:p ex:v1.2x }")
    assert q2["patterns"] == [("?s", "http://e/p", "http://e/v1.2x")]


def test_literal_echar_decodes_control_chars():
    q = parse_select(r'SELECT ?s WHERE { ?s <http://e/p> "line\nbreak\t\"q\"\\" }')
    assert q["patterns"][0][2] == 'line\nbreak\t"q"\\'
    with pytest.raises(ParseError, match="unknown literal escape"):
        parse_select(r'SELECT ?s WHERE { ?s <http://e/p> "bad\qesc" }')


def test_parse_rejects_out_of_fragment():
    with pytest.raises(ParseError):
        parse_select("SELECT ?x WHERE { }")
    with pytest.raises(ParseError):
        parse_select("SELECT WHERE { ?x <http://e/p> ?y }")
    with pytest.raises(ParseError):
        parse_select("PREFIX ex <http://e/> SELECT ?x WHERE { ?x ex:p ?y }")
    with pytest.raises(ParseError, match="undeclared prefix"):
        parse_select("SELECT ?x WHERE { ?x ex:p ?y }")
    with pytest.raises(ParseError, match="UNION"):
        parse_select(
            "SELECT ?x WHERE { ?x <http://e/p> ?y UNION { ?x <http://e/q> ?y } }"
        )
    # string ordering comparisons are collation-defined — out of fragment
    with pytest.raises(ParseError, match="numeric"):
        parse_select('SELECT ?x WHERE { ?x <http://e/p> ?y . FILTER(?y > "a") }')
    # '!' only before BOUND (3-valued NOT is out of fragment)
    with pytest.raises(ParseError, match="BOUND"):
        parse_select("SELECT ?x WHERE { ?x <http://e/p> ?y . FILTER(!(?y = ?x)) }")
    # OFFSET needs LIMIT (bounded driver-side skip)
    with pytest.raises(ParseError, match="OFFSET without LIMIT"):
        parse_select("SELECT ?x WHERE { ?x <http://e/p> ?y } OFFSET 3")
    # comparison must reference a variable
    with pytest.raises(ParseError):
        parse_select("SELECT ?x WHERE { ?x <http://e/p> ?y . FILTER(1 < 2) }")


def test_parse_filter_optional_order_offset():
    q = parse_select(
        """
        PREFIX ex: <http://e/>
        SELECT ?s ?v ?w WHERE {
          ?s ex:p ?v .
          FILTER(?v >= 2 && (?v < 9 || ?s = ex:special))
          OPTIONAL { ?s ex:q ?w . ?w ex:r ?z }
          FILTER(BOUND(?w) || ?v != 5)
        }
        ORDER BY DESC(?v) ?s
        LIMIT 10 OFFSET 4
        """
    )
    assert q["patterns"] == [("?s", "http://e/p", "?v")]
    assert q["optionals"] == [
        [("?s", "http://e/q", "?w"), ("?w", "http://e/r", "?z")]
    ]
    assert q["filters"] == [
        ("and", [
            ("cmp", ">=", ("var", "v"), ("num", 2.0)),
            ("or", [
                ("cmp", "<", ("var", "v"), ("num", 9.0)),
                ("cmp", "=", ("var", "s"), ("str", "http://e/special")),
            ]),
        ]),
        ("or", [("bound", "w"), ("cmp", "!=", ("var", "v"), ("num", 5.0))]),
    ]
    assert q["order_by"] == [("v", True), ("s", False)]
    assert q["limit"] == 10 and q["offset"] == 4


def test_executor_distinct_and_limit(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    rows = [
        ("a", "http://e/p", "x"), ("a", "http://e/p", "y"),
        ("b", "http://e/p", "x"), ("b", "http://e/p", "x2"),
        ("a", "http://e/q", "q1"), ("b", "http://e/q", "q2"),
    ]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("iri")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))

    # bag semantics: ?s bound twice per subject via p-join against q
    bag = sparql_select(ds, "SELECT ?s WHERE { ?s <http://e/p> ?o . ?s <http://e/q> ?w }")
    assert sorted(r["s"] for r in bag.take_all()) == ["a", "a", "b", "b"]
    dedup = sparql_select(
        ds, "SELECT DISTINCT ?s WHERE { ?s <http://e/p> ?o . ?s <http://e/q> ?w }"
    )
    assert sorted(r["s"] for r in dedup.take_all()) == ["a", "b"]
    lim = sparql_select(ds, "SELECT ?o WHERE { <a> <http://e/p> ?o } LIMIT 1")
    assert [r["o"] for r in lim.take_all()] == ["x"]  # deterministic: sorted


def _num_graph():
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    rows = [
        ("s1", "http://e/val", "3"), ("s2", "http://e/val", "10"),
        ("s3", "http://e/val", "7"), ("s4", "http://e/val", "oops"),
        ("s1", "http://e/tag", "alpha"), ("s3", "http://e/tag", "beta"),
    ]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    return rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))


def test_executor_filter_numeric_and_string(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    # numeric: TRY_CAST semantics — 'oops' fails the comparison silently
    got = sparql_select(
        ds, "SELECT ?s WHERE { ?s <http://e/val> ?v . FILTER(?v >= 7) }"
    ).to_pandas()
    assert sorted(got["s"]) == ["s2", "s3"]
    # string equality + || combination
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/val> ?v . '
        'FILTER(?v = "oops" || ?v < 5) }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s4"]


def test_executor_optional_left_join(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    got = sparql_select(
        ds,
        "SELECT ?s ?t WHERE { ?s <http://e/val> ?v . "
        "OPTIONAL { ?s <http://e/tag> ?t } } ORDER BY ?s",
    ).to_pandas()
    assert got["s"].tolist() == ["s1", "s2", "s3", "s4"]
    assert got["t"].tolist()[0] == "alpha" and got["t"].tolist()[2] == "beta"
    assert got["t"].isna().tolist() == [False, True, False, True]
    # BOUND filters the unmatched rows back out
    bound = sparql_select(
        ds,
        "SELECT ?s WHERE { ?s <http://e/val> ?v . "
        "OPTIONAL { ?s <http://e/tag> ?t } FILTER(!BOUND(?t)) }",
    ).to_pandas()
    assert sorted(bound["s"]) == ["s2", "s4"]


def test_executor_order_by_offset(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    got = sparql_select(
        ds,
        "SELECT ?s ?v WHERE { ?s <http://e/val> ?v } ORDER BY DESC(?s) LIMIT 2 OFFSET 1",
    ).to_pandas()
    assert got["s"].tolist() == ["s3", "s2"]  # s4 skipped by OFFSET 1


def test_parse_order_by_expression_key():
    q = parse_select(
        "SELECT ?s ?v WHERE { ?s <http://e/val> ?v } ORDER BY DESC(2 * ?v) ?s"
    )
    (key0, d0), (key1, d1) = q["order_by"]
    assert d0 is True and key0[0] == "nexpr"
    assert key1 == "s" and d1 is False


def test_executor_order_by_expression(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    # numeric order 3 < 7 < 10 (lexical would put '10' first); the
    # non-integer lexical 'oops' is unbound and sorts FIRST under ASC
    got = sparql_select(
        ds, "SELECT ?s ?v WHERE { ?s <http://e/val> ?v } ORDER BY ASC(?v + 0)"
    ).to_pandas()
    assert got["s"].tolist() == ["s4", "s1", "s3", "s2"]
    # DESC reverses: unbound last; LIMIT windows the numeric top-2
    got = sparql_select(
        ds,
        "SELECT ?s ?v WHERE { ?s <http://e/val> ?v } "
        "ORDER BY DESC(?v * 2) LIMIT 2",
    ).to_pandas()
    assert got["s"].tolist() == ["s2", "s3"]
    # STRLEN bridges the string grammar into the numeric key; ?s breaks ties
    got = sparql_select(
        ds,
        "SELECT ?s ?v WHERE { ?s <http://e/val> ?v } "
        "ORDER BY DESC(STRLEN(?v)) ?s",
    ).to_pandas()
    assert got["s"].tolist() == ["s4", "s2", "s1", "s3"]
    # expression keys must reference projected variables only
    with pytest.raises(ValueError, match="non-projected"):
        sparql_select(
            ds, "SELECT ?s WHERE { ?s <http://e/val> ?v } ORDER BY ASC(?v + 0)"
        ).to_pandas()


def test_typed_serialization_rejects_expression_order(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select_typed

    with pytest.raises(ValueError, match="out of fragment"):
        sparql_select_typed(
            _num_graph(),
            "SELECT ?s ?v WHERE { ?s <http://e/val> ?v } ORDER BY ASC(?v + 0)",
        )


def test_langmatches(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    rows = [  # (subj, lang) — obj literal "x", varying tags
        ("s1", "en"), ("s2", "en-US"), ("s3", "EN-gb"), ("s4", "fr"),
        ("s5", None),  # plain literal: LANG = "" matches nothing
    ]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, lang in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append("http://e/t"); cols["obj_kind"].append("literal")
        cols["obj_value"].append("x"); cols["obj_lang"].append(lang)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))

    def run(q):
        got = sparql_select(ds, q).to_pandas()
        return sorted(got["s"])

    base = "SELECT ?s WHERE { ?s <http://e/t> ?v FILTER(%s) }"
    # case-insensitive exact + subtag-prefix matching (RFC 4647 basic)
    assert run(base % 'langMatches(LANG(?v), "en")') == ["s1", "s2", "s3"]
    assert run(base % 'langMatches(LANG(?v), "en-us")') == ["s2"]
    # "*" matches any non-empty tag; the plain literal never matches
    assert run(base % 'langMatches(LANG(?v), "*")') == ["s1", "s2", "s3", "s4"]
    # negation: literal AND mismatch (the plain literal qualifies)
    assert run(base % '!langMatches(LANG(?v), "en")') == ["s4", "s5"]
    with pytest.raises(ParseError, match="empty langMatches"):
        parse_select(base % 'langMatches(LANG(?v), "")')
    with pytest.raises(ParseError, match="string literal"):
        parse_select(base % "langMatches(LANG(?v), ?r)")


def test_parse_var_vs_var_ordering_is_numeric():
    q = parse_select(
        "SELECT ?s WHERE { ?s <http://e/a> ?x . ?s <http://e/b> ?y "
        "FILTER(?x < ?y) }"
    )
    assert q["filters"][0][0] == "ncmp"
    # var-vs-CONSTANT-string ordering stays rejected (collation)
    with pytest.raises(ParseError, match="numeric operand"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/a> ?x FILTER(?x < "b") }'
        )


def test_executor_var_vs_var_numeric_filter(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _pair_graph()
    # numeric: 3<10 keep, 7>5 drop, 'oops' fails the read, -4<2 keep
    got = sparql_select(
        ds,
        "SELECT ?s WHERE { ?s <http://e/a> ?x . ?s <http://e/b> ?y "
        "FILTER(?x < ?y) } ORDER BY ?s LIMIT 10",
    ).to_pandas()
    assert got["s"].tolist() == ["s1", "s4"]


def test_having_agg_vs_agg(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    rows = [("s1", "http://e/t", "1"), ("s1", "http://e/t", "2"),
            ("s2", "http://e/t", "3"),
            ("s1", "http://e/u", "9"), ("s2", "http://e/u", "1")]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    # var-vs-var ordering over TYPED aggregate aliases (the ncmp path's
    # typed-column read): s1 sa=3 < sb=18 (join multiplicity doubles ?b)
    # keeps; s2 sa=3 > sb=1 drops
    got = sparql_select(
        ds,
        "SELECT ?s (SUM(?a) AS ?sa) (SUM(?b) AS ?sb) WHERE "
        "{ ?s <http://e/t> ?a . ?s <http://e/u> ?b } "
        "GROUP BY ?s HAVING(?sa < ?sb)",
    ).to_pandas()
    assert got.values.tolist() == [["s1", "3", "18"]]


def test_executor_abs(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    # BIND: |x - 5| -> 2 (3), 5 (10), 2 (7); 'oops' unbound
    got = sparql_select(
        ds,
        "SELECT ?s ?m WHERE { ?s <http://e/val> ?x . "
        "BIND(ABS(?x - 5) AS ?m) } ORDER BY ?s LIMIT 10",
    ).to_pandas()
    assert got["m"].tolist() == ["2", "5", "2", None]
    # ORDER BY expression key accepts ABS too
    got = sparql_select(
        ds,
        "SELECT ?s ?x WHERE { ?s <http://e/val> ?x } "
        "ORDER BY ASC(ABS(?x - 5)) ?s",
    ).to_pandas()
    assert got["s"].tolist() == ["s4", "s1", "s3", "s2"]


def test_executor_strbefore_strafter(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()  # vals: 3, 10, 7, oops; tags: alpha (s1), beta (s3)
    got = sparql_select(
        ds,
        "SELECT ?s ?b ?a WHERE { ?s <http://e/tag> ?t . "
        'BIND(STRBEFORE(?t, "l") AS ?b) . BIND(STRAFTER(?t, "l") AS ?a) } '
        "ORDER BY ?s LIMIT 10",
    ).to_pandas()
    # alpha -> a|pha ; beta (no 'l') -> "" / ""
    assert got["b"].tolist() == ["a", ""]
    assert got["a"].tolist() == ["pha", ""]
    # unbound input propagates NULL (OPTIONAL miss), not ""
    got = sparql_select(
        ds,
        "SELECT ?s ?b WHERE { ?s <http://e/val> ?v . "
        "OPTIONAL { ?s <http://e/tag> ?t } "
        'BIND(STRBEFORE(?t, "l") AS ?b) } ORDER BY ?s LIMIT 10',
    ).to_pandas()
    assert got["b"].tolist() == ["a", None, "", None]
    # empty separator rejected loudly
    with pytest.raises(ParseError, match="empty separator"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/tag> ?t . '
            'BIND(STRAFTER(?t, "") AS ?x) }'
        )


def _pair_graph():
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    rows = [
        ("s1", "http://e/a", "3"), ("s1", "http://e/b", "10"),
        ("s2", "http://e/a", "7"), ("s2", "http://e/b", "5"),
        ("s3", "http://e/a", "oops"), ("s3", "http://e/b", "1"),
        ("s4", "http://e/a", "-4"), ("s4", "http://e/b", "2"),
    ]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    return rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))


def test_parse_graph_block():
    q = parse_select(
        """
        PREFIX ex: <http://e/>
        SELECT ?g ?o WHERE {
          GRAPH ?g { ?s ex:p ?o . ?o ex:q ex:c }
          GRAPH ex:g1 { ?s ex:r ?w }
          ?s ex:t ?u
        }
        """
    )
    assert q["patterns"] == [
        ("?s", "http://e/p", "?o", "?g"),
        ("?o", "http://e/q", "http://e/c", "?g"),
        ("?s", "http://e/r", "?w", "http://e/g1"),
        ("?s", "http://e/t", "?u"),
    ]
    # SELECT * picks up the graph variable too
    star = parse_select("SELECT * WHERE { GRAPH ?g { ?s <http://e/p> ?o } }")
    assert star["project"] == ["s", "o", "g"]
    with pytest.raises(ParseError, match="empty GRAPH"):
        parse_select("SELECT ?g WHERE { GRAPH ?g { } ?s <http://e/p> ?o }")
    with pytest.raises(ParseError, match="GRAPH needs"):
        parse_select('SELECT ?s WHERE { GRAPH "lit" { ?s <http://e/p> ?o } }')


def _quad_graph():
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    rows = [
        ("s1", "http://e/p", "x", "g1"), ("s1", "http://e/q", "y", "g1"),
        ("s2", "http://e/p", "x", "g2"), ("s2", "http://e/q", "y", "g1"),
        ("s3", "http://e/p", "z", "g2"), ("s3", "http://e/q", "w", "g2"),
    ]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    graphs = []
    for s, p, o, g in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("iri")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None); graphs.append(g)
    tbl = pa.table(cols, schema=TRIPLE_SCHEMA).append_column(
        "graph", pa.array(graphs, pa.string())
    )
    return rd.from_arrow(tbl)


def test_executor_graph_patterns(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _quad_graph()
    # same-graph constraint: only subjects whose p AND q live in ONE graph
    got = sparql_select(
        ds,
        "SELECT ?s ?g WHERE { GRAPH ?g { ?s <http://e/p> ?x . "
        "?s <http://e/q> ?y } } ORDER BY ?s",
    ).to_pandas()
    assert list(zip(got["s"], got["g"])) == [("s1", "g1"), ("s3", "g2")]
    # constant graph filter
    got = sparql_select(
        ds, "SELECT ?s WHERE { GRAPH <g2> { ?s <http://e/p> ?x } } ORDER BY ?s"
    ).to_pandas()
    assert got["s"].tolist() == ["s2", "s3"]
    # 3-term pattern over the quad store scans the union of graphs
    got = sparql_select(
        ds, "SELECT DISTINCT ?s WHERE { ?s <http://e/q> ?y }"
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2", "s3"]


# ------------------------------------- round 5: UNION / aggregates / paths


def test_parse_property_paths():
    q = parse_select(
        "PREFIX c: <http://e/> SELECT ?a ?b WHERE { ?a c:p/c:q ?b }"
    )
    assert q["patterns"] == [
        ("?a", "http://e/p", "?__p0"),
        ("?__p0", "http://e/q", "?b"),
    ]
    # inverse flips subject/object per step
    q = parse_select("PREFIX c: <http://e/> SELECT * WHERE { ?a ^c:p/c:q ?b }")
    assert q["patterns"] == [
        ("?__p0", "http://e/p", "?a"),
        ("?__p0", "http://e/q", "?b"),
    ]
    # fresh path vars are excluded from SELECT *
    assert q["project"] == ["a", "b"]
    with pytest.raises(ParseError, match="out of fragment|must be an IRI"):
        parse_select("SELECT ?a WHERE { ?a ?p/<http://e/q> ?b }")
    with pytest.raises(ParseError, match="must be an IRI"):
        parse_select("SELECT ?a WHERE { ?a <http://e/p>/?v ?b }")


def test_parse_and_execute_values_multi(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    q = parse_select(
        "SELECT ?s ?g WHERE { ?s <http://e/grp> ?g . ?s <http://e/val> ?v "
        'VALUES (?s ?g) { ("s1" "A") ("s3" "B") ("s3" "A") } }'
    )
    assert q["filters"] == [
        ("in_rows", ["s", "g"], [("s1", "A"), ("s3", "B"), ("s3", "A")])
    ]
    ds = _grp_graph()
    got = sparql_select(
        ds,
        "SELECT ?s ?g WHERE { ?s <http://e/grp> ?g . ?s <http://e/val> ?v "
        'VALUES (?s ?g) { ("s1" "A") ("s3" "B") ("s2" "B") } } ORDER BY ?s',
    ).to_pandas()
    assert list(zip(got["s"], got["g"])) == [("s1", "A"), ("s3", "B")]
    # VALUES var not bound by the patterns -> loud reject at execution
    with pytest.raises(ValueError, match="unbound"):
        sparql_select(
            ds,
            "SELECT ?s WHERE { ?s <http://e/grp> ?g "
            'VALUES (?s ?zzz) { ("s1" "A") } }',
        )
    # duplicate VALUES variable -> loud parse error (SPARQL forbids it;
    # silently it would be an always-false v==c1 AND v==c2 filter)
    with pytest.raises(ParseError, match="duplicate variable"):
        parse_select(
            "SELECT ?s WHERE { ?s <http://e/grp> ?g "
            'VALUES (?s ?s) { ("s1" "A") } }'
        )
    # UNDEF = wildcard position: (s1 UNDEF) admits s1 under any group,
    # (UNDEF "B") admits every member of group B
    got = sparql_select(
        ds,
        "SELECT ?s ?g WHERE { ?s <http://e/grp> ?g . ?s <http://e/val> ?v "
        'VALUES (?s ?g) { ("s1" UNDEF) (UNDEF "B") } } ORDER BY ?s',
    ).to_pandas()
    assert list(zip(got["s"], got["g"])) == [
        ("s1", "A"), ("s3", "B"), ("s4", "B"),
    ]
    with pytest.raises(ParseError, match="all-UNDEF"):
        parse_select(
            "SELECT ?s WHERE { ?s <http://e/grp> ?g "
            "VALUES (?s ?g) { (UNDEF UNDEF) } }"
        )
    # single-var UNDEF stays out of fragment
    with pytest.raises(ParseError, match="out of fragment"):
        parse_select(
            "SELECT ?s WHERE { ?s <http://e/grp> ?g "
            "VALUES ?s { UNDEF } }"
        )


def _chain_graph():
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    # n0 -> n1 -> ... -> n5, plus a back edge n5 -> n2 (cycle)
    rows = [(f"n{i}", "http://e/next", f"n{i + 1}") for i in range(5)]
    rows.append(("n5", "http://e/next", "n2"))
    rows += [(f"n{i}", "http://e/mark", f"m{i}") for i in range(6)]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("iri")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    return rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))


def test_executor_path_plus(ray_session):
    from rdf_xml_ex_ray.core.sparql import PathPlus, parse_query
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    q = parse_query("SELECT ?x WHERE { <n0> <http://e/next>+ ?x }")
    assert q["patterns"] == [("n0", PathPlus("http://e/next"), "?x")]
    ds = _chain_graph()
    fwd = sparql_select(
        ds, "SELECT ?x WHERE { <n0> <http://e/next>+ ?x } ORDER BY ?x"
    ).to_pandas()
    assert fwd["x"].tolist() == ["n1", "n2", "n3", "n4", "n5"]
    # backward closure; the cycle n2->..->n5->n2 makes n4 reach itself
    bwd = sparql_select(
        ds, "SELECT ?x WHERE { ?x <http://e/next>+ <n4> } ORDER BY ?x"
    ).to_pandas()
    assert bwd["x"].tolist() == ["n0", "n1", "n2", "n3", "n4", "n5"]
    # closure result joins the rest of the BGP on its variable
    joined = sparql_select(
        ds,
        "SELECT ?x ?m WHERE { <n3> <http://e/next>+ ?x . "
        "?x <http://e/mark> ?m } ORDER BY ?x",
    ).to_pandas()
    assert list(zip(joined["x"], joined["m"])) == [
        ("n2", "m2"), ("n3", "m3"), ("n4", "m4"), ("n5", "m5"),
    ]
    # unreachable seed -> empty, schema intact
    empty = sparql_select(
        ds, "SELECT ?x WHERE { <n5x> <http://e/next>+ ?x }"
    ).to_pandas()
    assert len(empty) == 0
    # all-constant ASK with a closure must reject, not scan one hop
    # (regression: PathPlus is a tuple subclass and _scan would read it
    # as an alternation set, answering False for a 2-hop reachable pair)
    from rdf_xml_ex_ray.pipelines.bgp import sparql_ask

    with pytest.raises(ValueError, match="two constants"):
        sparql_ask(ds, "ASK { <n0> <http://e/next>+ <n2> }")
    for bad, msg in [
        ("SELECT ?x WHERE { ?x <http://e/next>+ ?y }", "constant endpoint"),
        ("SELECT ?x WHERE { <n0> <http://e/next>+ <n3> . "
         "?x <http://e/mark> ?m }", "two constants"),
        ("SELECT ?x WHERE { ?x <http://e/mark> ?m . "
         "OPTIONAL { ?x <http://e/next>+ ?y } }", "OPTIONAL groups"),
        ("SELECT ?x WHERE { ?x <http://e/mark> ?m . "
         "MINUS { ?x <http://e/next>+ ?y } }", "MINUS groups"),
    ]:
        with pytest.raises(ValueError, match=msg):
            sparql_select(ds, bad)
    # p* is in fragment since r5, but inherits the one-constant-endpoint
    # executor contract of p+
    with pytest.raises(ValueError, match="constant endpoint"):
        sparql_select(ds, "SELECT ?x WHERE { ?x <http://e/next>* ?y }")


def test_sum_avg_hostile_lexicals_match_oracle(ray_session):
    """End-to-end SUM/AVG parity on HOSTILE numeric lexical forms — the
    int_lex kernel is fuzzed against DuckDB in test_numeric.py, but this
    drives the same forms through the full pipeline (triple store ->
    sparql_select aggregation) against the SQL twin built from the shared
    _int_cast_sql spelling."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import _int_cast_sql, sparql_select

    forms = [
        "0", "7", "-7", "+7", "007", "123456789012345678",
        "1234567890123456789", " 7", "7 ", "\t7", "7\n", "", "-", "+",
        "- ", "+ ", "7.0", "7.", ".7", "7e1", "1_0", "0x7", "٧", "７",
        "inf", "nan", "7a", "68e ", "1e5.", "-0", "999999999999999999",
    ]
    rows = []
    for i, f in enumerate(forms):
        g = "G" + str(i % 3)
        rows.append((f"s{i}", "http://e/grp", g))
        rows.append((f"s{i}", "http://e/val", f))
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    got = sparql_select(
        ds,
        "SELECT ?g (COUNT(*) AS ?n) (SUM(?v) AS ?sv) (AVG(?v) AS ?av) "
        "WHERE { ?s <http://e/grp> ?g . ?s <http://e/val> ?v } "
        "GROUP BY ?g ORDER BY ?g",
    ).to_pandas()

    con = duckdb.connect()
    con.register(
        "kt",
        pd.DataFrame(
            {"subj": cols["subj"], "pred": cols["pred"],
             "obj_value": cols["obj_value"]}
        ),
    )
    want = con.execute(f"""
        SELECT g, COUNT(*) AS n, CAST(SUM(ic) AS VARCHAR) AS sv,
               CAST(CAST(SUM(ic) AS VARCHAR) AS DOUBLE) / COUNT(ic) AS av
        FROM (
          SELECT t1.obj_value AS g, {_int_cast_sql("t2.obj_value")} AS ic
          FROM kt t1 JOIN kt t2 ON t2.subj = t1.subj
               AND t2.pred = 'http://e/val'
          WHERE t1.pred = 'http://e/grp'
        ) GROUP BY g ORDER BY g
    """).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[got.columns].reset_index(drop=True),
        check_dtype=False,
    )


def test_aggregate_preagg_paths_match(ray_session):
    """The decomposable pre-aggregated grouped path must equal the
    ship-rows path bit-for-bit — including null group keys, all-null
    value groups and non-integer SUM inputs."""
    import ray.data as rd

    from rdf_xml_ex_ray.pipelines.bgp import _aggregate_bindings

    tbl = pa.table(
        {
            "g": ["A", "A", None, "B", "B", None, "C"],
            "v": ["3", "10", "7", None, "oops", "2", None],
            "w": ["x", None, "y", "z", "a", None, None],
        }
    )
    res = rd.from_arrow(tbl).repartition(3)
    aggs = [
        ("COUNT", None, False, "n"), ("COUNT", "v", False, "nv"),
        ("MIN", "w", False, "mnw"), ("MAX", "v", False, "mxv"),
        ("SUM", "v", False, "sv"), ("AVG", "v", False, "av"),
    ]
    outs = []
    for mode in (True, False):
        out, cols = _aggregate_bindings(res, ["g"], aggs, pre_aggregate=mode)
        df = out.to_pandas().sort_values("g", na_position="last").reset_index(drop=True)
        outs.append(df[cols])
    import pandas as pd

    pd.testing.assert_frame_equal(outs[0], outs[1])
    a = outs[0].to_dict("records")
    assert a[0] == {"g": "A", "n": 2, "nv": 2, "mnw": "x", "mxv": "3",
                    "sv": "13", "av": 6.5}
    with pytest.raises(ValueError, match="DISTINCT"):
        _aggregate_bindings(
            res, ["g"], [("COUNT", "v", True, "d")], pre_aggregate=True
        )


def test_closure_scale_paths_match(ray_session):
    """cap=0 forces the fully distributed closure regime (bucketed join +
    DISTINCT + anti-join per hop) from hop 0; results must equal the
    broadcast regime's — the repo's standard dual-path equivalence gate."""
    from rdf_xml_ex_ray.core.sparql import PathPlus
    from rdf_xml_ex_ray.pipelines import bgp

    ds = _chain_graph()
    for pat in [
        ("n0", PathPlus("http://e/next"), "?x"),
        ("?x", PathPlus("http://e/next"), "n4"),
        ("zzz", PathPlus("http://e/next"), "?x"),  # unreachable seed
    ]:
        bc, v1 = bgp._closure_nodes(ds, pat, 32)
        dist, v2 = bgp._closure_nodes(ds, pat, 32, broadcast_cap=0)
        assert v1 == v2
        a = sorted(r[v1] for r in bc.take_all())
        b = sorted(r[v2] for r in dist.take_all())
        assert a == b, (pat, a, b)
    # mid-flight migration: cap=2 overflows after the first hop
    mig, v = bgp._closure_nodes(
        ds, ("n0", PathPlus("http://e/next"), "?x"), 32, broadcast_cap=2
    )
    assert sorted(r[v] for r in mig.take_all()) == ["n1", "n2", "n3", "n4", "n5"]


def test_parse_minus():
    q = parse_select(
        "SELECT ?x WHERE { ?x <http://e/p> ?y . MINUS { ?x <http://e/q> ?z } "
        "MINUS { ?x <http://e/r> ?w } }"
    )
    assert q["minuses"] == [
        [("?x", "http://e/q", "?z")],
        [("?x", "http://e/r", "?w")],
    ]
    for bad in [
        "SELECT ?x WHERE { ?x <http://e/p> ?y . MINUS { } }",
        "SELECT ?x WHERE { { ?x <http://e/p> ?y } UNION { ?x <http://e/q> ?y } "
        "MINUS { ?x <http://e/r> ?z } }",
    ]:
        with pytest.raises(ParseError):
            parse_select(bad)


def test_executor_minus(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_ask, sparql_select

    ds = _grp_graph()
    # subjects with a val, minus those carrying a tag: s2, s4 survive
    got = sparql_select(
        ds,
        "SELECT ?s WHERE { ?s <http://e/val> ?v . "
        "MINUS { ?s <http://e/tag> ?t } } ORDER BY ?s",
    ).to_pandas()
    assert got["s"].tolist() == ["s2", "s4"]
    # empty MINUS group removes nothing
    keep = sparql_select(
        ds,
        "SELECT ?s WHERE { ?s <http://e/val> ?v . "
        "MINUS { ?s <http://e/none> ?t } } ORDER BY ?s",
    ).to_pandas()
    assert keep["s"].tolist() == ["s1", "s2", "s3", "s4"]
    # MINUS inside ASK
    ask = sparql_ask(
        ds,
        "ASK { ?s <http://e/grp> \"B\" . MINUS { ?s <http://e/val> ?v } }",
    ).to_pandas()
    assert ask["ask"].tolist() == [False]  # every grp-B subject has a val


def test_parse_union_and_groups():
    q = parse_select(
        "SELECT ?s ?x WHERE { { ?s <http://e/p> ?x } UNION "
        "{ ?s <http://e/q> ?x } UNION { ?s <http://e/r> ?x } }"
    )
    assert len(q["unions"]) == 3 and q["patterns"] == []
    assert q["project"] == ["s", "x"]
    # a single braced group is just its patterns
    q2 = parse_select("SELECT ?s WHERE { { ?s <http://e/p> ?x } }")
    assert q2["patterns"] == [("?s", "http://e/p", "?x")] and q2["unions"] == []
    # union mixed with required patterns parses (r5: executor joins the
    # union's binding table on the shared vars, every branch must bind them)
    q3 = parse_select(
        "SELECT ?s WHERE { { ?s <http://e/p> ?x } UNION "
        "{ ?s <http://e/q> ?x } ?s <http://e/r> ?w }"
    )
    assert len(q3["unions"]) == 2 and q3["patterns"] == [("?s", "http://e/r", "?w")]
    with pytest.raises(ParseError, match="multiple UNION"):
        parse_select(
            "SELECT ?s WHERE { { ?s <http://e/p> ?x } UNION { ?s <http://e/q> ?x } "
            "{ ?s <http://e/r> ?x } UNION { ?s <http://e/t> ?x } }"
        )
    with pytest.raises(ParseError, match="must follow"):
        parse_select("SELECT ?s WHERE { ?s <http://e/p> ?x UNION { ?s <http://e/q> ?x } }")


def test_parse_aggregates():
    q = parse_select(
        "SELECT ?g (COUNT(*) AS ?n) (COUNT(DISTINCT ?t) AS ?nd) (MIN(?v) AS ?mn) "
        "WHERE { ?s <http://e/g> ?g . ?s <http://e/v> ?v . "
        "OPTIONAL { ?s <http://e/t> ?t } } GROUP BY ?g"
    )
    assert q["aggregates"] == [
        ("COUNT", None, False, "n"),
        ("COUNT", "t", True, "nd"),
        ("MIN", "v", False, "mn"),
    ]
    assert q["group_by"] == ["g"] and q["project"] == ["g"]
    q2 = parse_select(
        "SELECT ?g (SUM(?v) AS ?s) (SUM(DISTINCT ?v) AS ?sd) (AVG(?v) AS ?a) "
        "WHERE { ?s <http://e/g> ?g . ?s <http://e/v> ?v } GROUP BY ?g"
    )
    assert q2["aggregates"] == [
        ("SUM", "v", False, "s"),
        ("SUM", "v", True, "sd"),
        ("AVG", "v", False, "a"),
    ]
    q3 = parse_select(
        "SELECT ?g (COUNT(*) AS ?n) WHERE { ?s <http://e/g> ?g } "
        "GROUP BY ?g HAVING (?n > 2) (?g != <http://e/x>) ORDER BY ?g"
    )
    assert q3["having"] == [
        ("cmp", ">", ("var", "n"), ("num", 2.0)),
        ("cmp", "!=", ("var", "g"), ("str", "http://e/x")),
    ]
    for bad, msg in [
        ("SELECT ?g WHERE { ?s <http://e/g> ?g } HAVING (?g > 2)", "HAVING"),
        ("SELECT (COUNT(*) AS ?n) WHERE { ?s <http://e/g> ?g } HAVING", "constraint"),
        ("SELECT (SUM(*) AS ?s) WHERE { ?x <http://e/p> ?v }", "COUNT"),
        ("SELECT (AVG(*) AS ?s) WHERE { ?x <http://e/p> ?v }", "COUNT"),
        ("SELECT (SUM(DISTINCT ?v) AS ?s) WHERE { ?x <http://e/p> ?v }", "GROUP BY"),
        ("SELECT (AVG(DISTINCT ?v) AS ?s) WHERE { ?x <http://e/p> ?v }", "GROUP BY"),
        ("SELECT (COUNT(DISTINCT ?v) AS ?n) WHERE { ?x <http://e/p> ?v }", "GROUP BY"),
        ("SELECT (MIN(*) AS ?n) WHERE { ?x <http://e/p> ?v }", "COUNT"),
        ("SELECT (MIN(DISTINCT ?v) AS ?n) WHERE { ?x <http://e/p> ?v } GROUP BY ?x", "COUNT|DISTINCT"),
        ("SELECT ?x WHERE { ?x <http://e/p> ?v } GROUP BY ?x", "without aggregate"),
        ("SELECT ?v (COUNT(*) AS ?n) WHERE { ?x <http://e/p> ?v } GROUP BY ?x", "GROUP BY"),
        ("SELECT DISTINCT (COUNT(*) AS ?n) WHERE { ?x <http://e/p> ?v }", "DISTINCT"),
        ("SELECT ?x (COUNT(*) AS ?x) WHERE { ?x <http://e/p> ?v } GROUP BY ?x", "duplicate"),
        ("SELECT * (COUNT(*) AS ?n) WHERE { ?x <http://e/p> ?v }", "."),
    ]:
        with pytest.raises(ParseError):
            parse_select(bad)


def _grp_graph():
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    rows = [
        ("s1", "http://e/val", "3"), ("s2", "http://e/val", "10"),
        ("s3", "http://e/val", "7"), ("s4", "http://e/val", "oops"),
        ("s1", "http://e/tag", "alpha"), ("s3", "http://e/tag", "beta"),
        ("s1", "http://e/grp", "A"), ("s2", "http://e/grp", "A"),
        ("s3", "http://e/grp", "B"), ("s4", "http://e/grp", "B"),
    ]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    return rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))


def test_executor_union(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _grp_graph()
    got = sparql_select(
        ds,
        "SELECT ?s ?x WHERE { { ?s <http://e/tag> ?x } UNION "
        "{ ?s <http://e/val> ?x } } ORDER BY ?s ?x",
    ).to_pandas()
    assert len(got) == 6  # bag semantics: 2 tags + 4 vals
    assert got.iloc[0].tolist() == ["s1", "3"]
    # branches binding different vars pad with nulls
    pad = sparql_select(
        ds,
        "SELECT ?s ?t ?v WHERE { { ?s <http://e/tag> ?t } UNION "
        "{ ?s <http://e/val> ?v } }",
    ).to_pandas()
    assert pad["t"].isna().sum() == 4 and pad["v"].isna().sum() == 2


def test_executor_aggregates(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _grp_graph()
    got = sparql_select(
        ds,
        "SELECT ?g (COUNT(*) AS ?n) (COUNT(?t) AS ?nt) (COUNT(DISTINCT ?t) AS ?ndt) "
        "(MIN(?v) AS ?mn) (MAX(?v) AS ?mx) (SUM(?v) AS ?sv) (AVG(?v) AS ?av) "
        "WHERE { ?s <http://e/grp> ?g . ?s <http://e/val> ?v . "
        "OPTIONAL { ?s <http://e/tag> ?t } } GROUP BY ?g ORDER BY ?g",
    ).to_pandas()
    # lexical MIN/MAX: '10' < '3'; COUNT(?t) skips OPTIONAL nulls;
    # SUM/AVG read integer lexical forms only ('oops' is unbound/NULL)
    assert got.to_dict("records") == [
        {"g": "A", "n": 2, "nt": 1, "ndt": 1, "mn": "10", "mx": "3",
         "sv": "13", "av": 6.5},
        {"g": "B", "n": 2, "nt": 1, "ndt": 1, "mn": "7", "mx": "oops",
         "sv": "7", "av": 7.0},
    ]
    glob = sparql_select(
        ds,
        "SELECT (COUNT(*) AS ?n) (MAX(?v) AS ?mx) (SUM(?v) AS ?sv) "
        "(AVG(?v) AS ?av) WHERE { ?s <http://e/val> ?v }",
    ).to_pandas()
    assert glob.to_dict("records") == [
        {"n": 4, "mx": "oops", "sv": "20", "av": 20.0 / 3.0}
    ]
    # SQL semantics on an empty match: COUNT = 0, MIN/SUM/AVG = null
    empty = sparql_select(
        ds,
        "SELECT (COUNT(?v) AS ?n) (MIN(?v) AS ?mn) (SUM(?v) AS ?sv) "
        "(AVG(?v) AS ?av) WHERE { ?s <http://e/none> ?v }",
    ).to_pandas()
    assert len(empty) == 1 and empty["n"][0] == 0 and empty["mn"].isna().all()
    assert empty["sv"].isna().all() and empty["av"].isna().all()
    # HAVING: a mask over the aggregated table (keys + aliases visible)
    hv = sparql_select(
        ds,
        "SELECT ?g (COUNT(*) AS ?n) (SUM(?v) AS ?sv) "
        "WHERE { ?s <http://e/grp> ?g . ?s <http://e/val> ?v } "
        "GROUP BY ?g HAVING (?sv > 10)",
    ).to_pandas()
    assert hv.to_dict("records") == [{"g": "A", "n": 2, "sv": "13"}]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-output"):
        sparql_select(
            ds,
            "SELECT ?g (COUNT(*) AS ?n) WHERE { ?s <http://e/grp> ?g . "
            "?s <http://e/val> ?v } GROUP BY ?g HAVING (?v > 1)",
        )
    # aggregate over a UNION
    au = sparql_select(
        ds,
        "SELECT ?s (COUNT(*) AS ?n) WHERE { { ?s <http://e/tag> ?x } UNION "
        "{ ?s <http://e/val> ?x } } GROUP BY ?s ORDER BY ?s",
    ).to_pandas()
    assert au["n"].tolist() == [2, 1, 2, 1]


def test_executor_property_path(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _grp_graph()
    got = sparql_select(
        ds,
        "SELECT ?g ?t WHERE { ?t ^<http://e/tag>/<http://e/grp> ?g } ORDER BY ?t",
    ).to_pandas()
    assert list(zip(got["g"], got["t"])) == [("A", "alpha"), ("B", "beta")]


def test_executor_path_alternation(ray_session):
    from rdf_xml_ex_ray.core.sparql import ParseError, parse_query
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _grp_graph()
    # (tag|grp): one scan, predicate-set filter
    got = sparql_select(
        ds,
        "SELECT ?s ?x WHERE { ?s (<http://e/tag>|<http://e/grp>) ?x } "
        "ORDER BY ?s ?x",
    ).to_pandas()
    assert list(zip(got["s"], got["x"])) == [
        ("s1", "A"), ("s1", "alpha"), ("s2", "A"),
        ("s3", "B"), ("s3", "beta"), ("s4", "B"),
    ]
    # whole-group inverse ^(tag|val): objects back to subjects
    inv = sparql_select(
        ds,
        "SELECT ?x ?s WHERE { ?x ^(<http://e/tag>|<http://e/val>) ?s } "
        "ORDER BY ?x",
    ).to_pandas()
    assert ("alpha", "s1") in set(zip(inv["x"], inv["s"]))
    assert ("3", "s1") in set(zip(inv["x"], inv["s"]))
    # alternation as a sequence step
    seq = sparql_select(
        ds,
        "SELECT DISTINCT ?g WHERE { ?t ^(<http://e/tag>|<http://e/val>)"
        "/<http://e/grp> ?g } ORDER BY ?g",
    ).to_pandas()
    assert seq["g"].tolist() == ["A", "B"]
    for bad, msg in [
        ("SELECT ?x WHERE { ?s <http://e/a>|<http://e/b> ?x }", "parenthesized"),
        ("SELECT ?x WHERE { ?s (^<http://e/a>|<http://e/b>) ?x }", "out of fragment"),
        ("SELECT ?x WHERE { ?s (<http://e/a>|?p) ?x }", "IRI"),
        ("SELECT ?x WHERE { ?s () ?x }", "IRI"),
    ]:
        with pytest.raises(ParseError, match=msg):
            parse_query(bad)


def test_parse_ask_and_construct():
    from rdf_xml_ex_ray.core.sparql import parse_query

    q = parse_query("ASK WHERE { ?s <http://e/p> ?o . FILTER(?o = \"x\") }")
    assert q["form"] == "ask" and len(q["filters"]) == 1
    # ASK without WHERE is legal SPARQL
    q2 = parse_query("ASK { ?s <http://e/p> ?o }")
    assert q2["form"] == "ask" and q2["patterns"] == [("?s", "http://e/p", "?o")]
    c = parse_query(
        "PREFIX e: <http://e/> CONSTRUCT { ?s e:d ?o . ?s a e:T } "
        "WHERE { ?s e:p/e:q ?o }"
    )
    assert c["form"] == "construct"
    assert c["template"] == [
        ("?s", "http://e/d", "?o"),
        ("?s", RDF_TYPE, "http://e/T"),
    ]
    with pytest.raises(ParseError, match="unbound"):
        parse_query("CONSTRUCT { ?s <http://e/d> ?w } WHERE { ?s <http://e/p> ?o }")
    with pytest.raises(ParseError, match="template"):
        parse_query("CONSTRUCT { ?s <http://e/a>/<http://e/b> ?o } WHERE { ?s <http://e/p> ?o }")
    with pytest.raises(ParseError, match="SELECT"):
        parse_select("ASK WHERE { ?s <http://e/p> ?o }")


def test_executor_ask(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_ask

    ds = _grp_graph()
    t = sparql_ask(ds, 'ASK { ?s <http://e/tag> "alpha" }').to_pandas()
    assert t.to_dict("records") == [{"ask": True}]
    f = sparql_ask(ds, 'ASK { ?s <http://e/tag> "nope" }').to_pandas()
    assert f.to_dict("records") == [{"ask": False}]
    # all-constant probe
    c = sparql_ask(ds, 'ASK { <s1> <http://e/tag> "alpha" }').to_pandas()
    assert c.to_dict("records") == [{"ask": True}]
    # FILTER participates
    ff = sparql_ask(
        ds, "ASK WHERE { ?s <http://e/val> ?v . FILTER(?v > 11) }"
    ).to_pandas()
    assert ff.to_dict("records") == [{"ask": False}]


def test_construct_where_shorthand(ray_session):
    from rdf_xml_ex_ray.core.sparql import parse_query
    from rdf_xml_ex_ray.pipelines.bgp import (
        sparql_construct,
        sparql_construct_typed,
    )

    q = parse_query("CONSTRUCT WHERE { ?s <http://e/tag> ?t }")
    assert q["template"] == [("?s", "http://e/tag", "?t")]
    assert q["template_tagged"] is None
    got = sparql_construct(
        _grp_graph(), "CONSTRUCT WHERE { ?s <http://e/tag> ?t }"
    ).to_pandas().sort_values("subj").reset_index(drop=True)
    assert got["obj_value"].tolist() == ["alpha", "beta"]
    with pytest.raises(ParseError, match="plain triple block"):
        parse_query(
            "CONSTRUCT WHERE { ?s <http://e/tag> ?t FILTER(?t = \"alpha\") }"
        )
    with pytest.raises(ParseError, match="plain triples"):
        parse_query("CONSTRUCT WHERE { ?s <http://e/a>/<http://e/b> ?t }")
    # closure / alternation / negated-set paths are non-str pattern terms
    for path in ("<http://e/a>+", "(<http://e/a>|<http://e/b>)",
                 "!<http://e/a>"):
        with pytest.raises(ParseError, match="plain triples"):
            parse_query("CONSTRUCT WHERE { ?s %s ?t }" % path)
    with pytest.raises(ValueError, match="typed output"):
        sparql_construct_typed(
            _grp_graph(), "CONSTRUCT WHERE { ?s <http://e/tag> ?t }"
        )


def test_executor_construct(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_construct

    ds = _grp_graph()
    got = sparql_construct(
        ds,
        "CONSTRUCT { ?s <http://e/labelled> ?t . ?t a <http://e/Tag> } "
        "WHERE { ?s <http://e/tag> ?t }",
    ).to_pandas().sort_values(["pred", "subj"]).reset_index(drop=True)
    assert list(got.itertuples(index=False, name=None)) == [
        ("s1", "http://e/labelled", "alpha"),
        ("s3", "http://e/labelled", "beta"),
        ("alpha", RDF_TYPE, "http://e/Tag"),
        ("beta", RDF_TYPE, "http://e/Tag"),
    ]
    # null template slots (from OPTIONAL) drop that instantiation; set
    # semantics dedup repeated emissions
    opt = sparql_construct(
        ds,
        "CONSTRUCT { ?s <http://e/hasTag> ?t } "
        "WHERE { ?s <http://e/val> ?v . OPTIONAL { ?s <http://e/tag> ?t } }",
    ).to_pandas()
    assert sorted(opt["subj"]) == ["s1", "s3"]


def test_parse_describe_and_values():
    from rdf_xml_ex_ray.core.sparql import parse_query

    d = parse_query("DESCRIBE <http://e/a> <http://e/b>")
    assert d["form"] == "describe" and d["iris"] == ["http://e/a", "http://e/b"]
    assert d["var"] is None
    dv = parse_query("DESCRIBE ?t WHERE { <http://e/c> <http://e/turn> ?t }")
    assert dv["var"] == "t" and dv["patterns"] == [("http://e/c", "http://e/turn", "?t")]
    with pytest.raises(ParseError, match="at most one variable"):
        parse_query("DESCRIBE ?a ?b WHERE { ?a <http://e/p> ?b }")
    with pytest.raises(ParseError, match="pick one"):
        parse_query("DESCRIBE <http://e/a> ?b WHERE { ?b <http://e/p> ?x }")
    with pytest.raises(ParseError, match="not bound"):
        parse_query("DESCRIBE ?z WHERE { ?a <http://e/p> ?b }")
    with pytest.raises(ParseError, match="out of fragment"):
        parse_query("DESCRIBE <http://e/a> WHERE { ?a <http://e/p> ?b }")
    v = parse_query(
        'SELECT ?s WHERE { ?s <http://e/p> ?o . VALUES ?o { "x" <http://e/y> 3 } }'
    )
    assert v["filters"] == [("in", "o", ["x", "http://e/y", "3"])]
    q_multi = parse_query(
        'SELECT ?s WHERE { ?s <http://e/p> ?o . VALUES (?o ?s) { ("x" "y") } }'
    )
    assert q_multi["filters"] == [("in_rows", ["o", "s"], [("x", "y")])]
    with pytest.raises(ParseError, match="UNDEF"):
        parse_query('SELECT ?s WHERE { ?s <http://e/p> ?o . VALUES ?o { UNDEF } }')
    with pytest.raises(ParseError, match="empty VALUES"):
        parse_query("SELECT ?s WHERE { ?s <http://e/p> ?o . VALUES ?o { } }")


def test_executor_values(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _grp_graph()
    got = sparql_select(
        ds,
        'SELECT ?s ?v WHERE { ?s <http://e/val> ?v . VALUES ?v { "3" "7" "absent" } } ORDER BY ?s',
    ).to_pandas()
    assert list(zip(got["s"], got["v"])) == [("s1", "3"), ("s3", "7")]
    # VALUES over an OPTIONAL-bound var: null rows fail membership
    opt = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/val> ?v . OPTIONAL { ?s <http://e/tag> ?t } '
        'VALUES ?t { "alpha" } }',
    ).to_pandas()
    assert got is not None and sorted(opt["s"]) == ["s1"]


def test_executor_describe(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_describe

    # s1 -p-> bnode b1 -q-> "leaf"; s2 plain
    rows = [
        ("s1", "iri", "http://e/p", "bnode", "b1"),
        ("b1", "bnode", "http://e/q", "literal", "leaf"),
        ("s2", "iri", "http://e/p", "literal", "v2"),
    ]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, sk, p, ok, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append(sk)
        cols["pred"].append(p); cols["obj_kind"].append(ok)
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))

    got = sparql_describe(ds, "DESCRIBE <s1>").to_pandas()
    # CBD: s1's triple plus the bnode closure through b1
    assert sorted(got["subj"]) == ["b1", "s1"]
    var = sparql_describe(
        ds, "DESCRIBE ?s WHERE { ?s <http://e/p> ?o }"
    ).to_pandas()
    assert sorted(var["subj"]) == ["b1", "s1", "s2"]


def test_parse_string_fns_and_in():
    q = parse_select(
        """
        PREFIX ex: <http://e/>
        SELECT ?s WHERE {
          ?s ex:p ?v .
          FILTER ( REGEX(?v, "^a.*b$") && REGEX(?s, "X", "i") )
          FILTER ( STRSTARTS(?v, "pre") || STRENDS(?v, "post") )
          FILTER ( !CONTAINS(?v, "mid") )
          FILTER ( ?v IN ("x", ex:y, 3) )
          FILTER ( ?s NOT IN (ex:z) )
        }
        """
    )
    assert q["filters"] == [
        ("and", [
            ("sfn", "REGEX", "v", "^a.*b$", False),
            ("sfn", "REGEX", "s", "X", True),
        ]),
        ("or", [
            ("sfn", "STRSTARTS", "v", "pre", False),
            ("sfn", "STRENDS", "v", "post", False),
        ]),
        ("not_sfn", ("sfn", "CONTAINS", "v", "mid", False)),
        ("in", "v", ["x", "http://e/y", "3"]),
        ("not_in", "s", ["http://e/z"]),
    ]
    # rejections: bad flag, non-literal arg, '!' before a comparison,
    # IN needs a var, unparseable regex
    with pytest.raises(ParseError, match='REGEX flags support only "i"'):
        parse_select('SELECT ?s WHERE { ?s <http://e/p> ?v . '
                     'FILTER(REGEX(?v, "a", "g")) }')
    with pytest.raises(ParseError, match="string-literal"):
        parse_select("SELECT ?s WHERE { ?s <http://e/p> ?v . "
                     "FILTER(CONTAINS(?v, ?s)) }")
    with pytest.raises(ParseError, match="only supported before"):
        parse_select("SELECT ?s WHERE { ?s <http://e/p> ?v . "
                     "FILTER(!(?v = 3)) }")
    with pytest.raises(ParseError, match="IN needs a variable"):
        parse_select('SELECT ?s WHERE { ?s <http://e/p> ?v . '
                     'FILTER("x" IN ("y")) }')
    with pytest.raises(ParseError, match="bad REGEX pattern"):
        parse_select('SELECT ?s WHERE { ?s <http://e/p> ?v . '
                     'FILTER(REGEX(?v, "(")) }')
    with pytest.raises(ParseError, match="exactly two arguments"):
        parse_select('SELECT ?s WHERE { ?s <http://e/p> ?v . '
                     'FILTER(CONTAINS(?v, "a", "i")) }')


def test_executor_string_fns_and_in(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()  # tags: s1 alpha, s3 beta; vals: 3 10 7 oops
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/val> ?v . '
        'FILTER(REGEX(?v, "^[0-9]+$")) }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2", "s3"]
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/val> ?v . '
        'FILTER(STRSTARTS(?v, "1") || STRENDS(?v, "ps") || CONTAINS(?v, "3")) }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2", "s4"]
    # case-insensitive REGEX
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/tag> ?t . FILTER(REGEX(?t, "ALPHA", "i")) }',
    ).to_pandas()
    assert got["s"].tolist() == ["s1"]
    # null semantics through OPTIONAL: fn -> False on unbound, !fn also
    # False on unbound (not-null AND not), NOT IN False on unbound
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/val> ?v . '
        'OPTIONAL { ?s <http://e/tag> ?t } FILTER(!CONTAINS(?t, "et")) }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1"]  # s3's beta contains 'et'; s2/s4 unbound
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/val> ?v . '
        'OPTIONAL { ?s <http://e/tag> ?t } FILTER(?t NOT IN ("beta")) }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1"]
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/val> ?v . FILTER(?v IN ("3", "10")) }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2"]


def test_parse_filter_exists():
    q = parse_select(
        """
        PREFIX ex: <http://e/>
        SELECT ?s WHERE {
          ?s ex:p ?v .
          FILTER EXISTS { ?s ex:q ?w }
          FILTER NOT EXISTS { ?s ex:r ex:bad }
        }
        """
    )
    assert q["exists"] == [
        (False, [("?s", "http://e/q", "?w")]),
        (True, [("?s", "http://e/r", "http://e/bad")]),
    ]
    with pytest.raises(ParseError, match="empty EXISTS"):
        parse_select("SELECT ?s WHERE { ?s <http://e/p> ?v . "
                     "FILTER EXISTS { } }")
    with pytest.raises(ParseError, match="UNION"):
        parse_select(
            "SELECT ?s WHERE { { ?s <http://e/p> ?v } UNION "
            "{ ?s <http://e/q> ?v } FILTER EXISTS { ?s <http://e/r> ?w } }"
        )


def test_executor_filter_exists(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_ask, sparql_select

    ds = _num_graph()  # tags: s1 alpha, s3 beta; vals: s1 3, s2 10, s3 7, s4 oops
    got = sparql_select(
        ds,
        "SELECT ?s WHERE { ?s <http://e/val> ?v . "
        "FILTER EXISTS { ?s <http://e/tag> ?t } }",
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s3"]
    # semi-join keeps each left row ONCE even with multiple matches; the
    # NOT EXISTS group can pin constants
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/val> ?v . '
        'FILTER NOT EXISTS { ?s <http://e/tag> "beta" } }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s2", "s4"]
    # no shared variable: a global gate
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/tag> ?t . '
        'FILTER EXISTS { ?x <http://e/val> "10" } }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s3"]
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/tag> ?t . '
        'FILTER NOT EXISTS { ?x <http://e/val> "10" } }',
    ).to_pandas()
    assert len(got) == 0
    # all-constant ASK honors the gates
    assert sparql_ask(
        ds,
        'ASK { <s1> <http://e/val> "3" . '
        'FILTER NOT EXISTS { ?x <http://e/val> "999" } }',
    ).take_all() == [{"ask": True}]
    assert sparql_ask(
        ds,
        'ASK { <s1> <http://e/val> "3" . '
        'FILTER EXISTS { ?x <http://e/val> "999" } }',
    ).take_all() == [{"ask": False}]


def test_parse_and_execute_path_star(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.core.sparql import PathPlus, parse_query
    from rdf_xml_ex_ray.pipelines.bgp import _closure_nodes, sparql_select

    q = parse_query("SELECT ?x WHERE { <n0> <http://e/next>* ?x }")
    assert q["patterns"] == [("n0", PathPlus("http://e/next", zero=True), "?x")]

    # chain n0 -> n1 -> n2 plus a detached n9
    rows = [("n0", "http://e/next", "n1"), ("n1", "http://e/next", "n2"),
            ("n9", "http://e/next", "n9")]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("iri")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))

    got = sparql_select(ds, "SELECT ?x WHERE { <n0> <http://e/next>* ?x }")
    assert sorted(r["x"] for r in got.take_all()) == ["n0", "n1", "n2"]
    # plus excludes the seed (no cycle through n0)
    got = sparql_select(ds, "SELECT ?x WHERE { <n0> <http://e/next>+ ?x }")
    assert sorted(r["x"] for r in got.take_all()) == ["n1", "n2"]
    # a seed ABSENT from the graph still matches itself under *
    got = sparql_select(ds, "SELECT ?x WHERE { <zzz> <http://e/next>* ?x }")
    assert sorted(r["x"] for r in got.take_all()) == ["zzz"]
    # self-loop: * must not duplicate the seed
    got = sparql_select(ds, "SELECT ?x WHERE { <n9> <http://e/next>* ?x }")
    assert sorted(r["x"] for r in got.take_all()) == ["n9"]
    # broadcast-cap=0 (fully distributed) equivalence
    nodes, var = _closure_nodes(
        ds, ("n0", PathPlus("http://e/next", zero=True), "?x"), 32,
        broadcast_cap=0,
    )
    assert sorted(r[var] for r in nodes.take_all()) == ["n0", "n1", "n2"]


def test_parse_bind():
    q = parse_select(
        "SELECT ?s ?w WHERE { ?s <http://e/val> ?v . BIND( 2 * ?v + 1 AS ?w ) }"
    )
    assert q["binds"] == [
        ("w", ("bop", "+", ("bop", "*", ("bnum", 2), ("bvar", "v")), ("bnum", 1)))
    ]
    # '?v -3' lexes the sign into the number token; folds to an addition
    q = parse_select("SELECT ?w WHERE { ?s <http://e/val> ?v . BIND(?v -3 AS ?w) }")
    assert q["binds"] == [("w", ("bop", "+", ("bvar", "v"), ("bnum", -3)))]
    # spelled-out subtraction is a real subtract node
    q = parse_select("SELECT ?w WHERE { ?s <http://e/val> ?v . BIND(?v - 3 AS ?w) }")
    assert q["binds"] == [("w", ("bop", "-", ("bvar", "v"), ("bnum", 3)))]
    # SELECT * includes the target after the pattern vars
    q = parse_select("SELECT * WHERE { ?s <http://e/val> ?v . BIND(?v + 0 AS ?w) }")
    assert q["project"] == ["s", "v", "w"]
    from rdf_xml_ex_ray.core.sparql import parse_query

    for bad, msg in [
        ("SELECT ?w WHERE { ?s <http://e/val> ?v . BIND(?v / 2 AS ?w) }",
         "expected AS"),
        ("SELECT ?w WHERE { ?s <http://e/val> ?v . BIND(1.5 + ?v AS ?w) }",
         "integer lexical"),
        ("SELECT ?w WHERE { ?s <http://e/val> ?v . BIND(1 AS ?w) BIND(2 AS ?w) }",
         "duplicate BIND target"),
        ("CONSTRUCT { ?s <http://e/q> ?s } WHERE "
         "{ ?s <http://e/val> ?v . BIND(1 AS ?w) }", "out of fragment"),
    ]:
        with pytest.raises(ParseError, match=msg):
            parse_query(bad)


def test_executor_bind(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_ask, sparql_select

    ds = _num_graph()
    # arithmetic + rendering + NULL propagation ("oops" is a non-integer
    # lexical form -> unbound)
    got = sparql_select(
        ds,
        "SELECT ?s ?w WHERE { ?s <http://e/val> ?v . BIND(2 * ?v + 1 AS ?w) } "
        "ORDER BY ?s",
    ).to_pandas()
    assert list(zip(got["s"], got["w"])) == [
        ("s1", "7"), ("s2", "21"), ("s3", "15"), ("s4", None),
    ]
    # bind-on-bind, FILTER over a bind target (null fails the comparison)
    got = sparql_select(
        ds,
        "SELECT ?s WHERE { ?s <http://e/val> ?v . BIND(?v * ?v AS ?sq) "
        "BIND(?sq - ?v AS ?d) FILTER(?d >= 42) } ORDER BY ?s",
    ).to_pandas()
    assert got["s"].tolist() == ["s2", "s3"]
    # parenthesized grouping; an all-constant expr broadcasts per row
    got = sparql_select(
        ds,
        "SELECT ?s ?k WHERE { ?s <http://e/tag> ?t . BIND((2 + 3) * 4 AS ?k) } "
        "ORDER BY ?s",
    ).to_pandas()
    assert got["k"].tolist() == ["20", "20"]
    # a bind target feeding an aggregate (re-read as an integer lexical)
    got = sparql_select(
        ds,
        "SELECT (SUM(?w) AS ?tot) WHERE { ?s <http://e/val> ?v . "
        "BIND(?v * 10 AS ?w) }",
    ).to_pandas()
    assert got["tot"].tolist() == ["200"]
    # ASK sees binds too
    assert sparql_ask(
        ds, "ASK { ?s <http://e/val> ?v . BIND(?v * 2 AS ?d) FILTER(?d = 20) }"
    ).take_all() == [{"ask": True}]
    assert sparql_ask(
        ds, "ASK { ?s <http://e/val> ?v . BIND(?v * 2 AS ?d) FILTER(?d = 21) }"
    ).take_all() == [{"ask": False}]
    for bad, msg in [
        ("SELECT ?s WHERE { ?s <http://e/val> ?v . BIND(?z + 1 AS ?w) }",
         "unbound"),
        ("SELECT ?s WHERE { ?s <http://e/val> ?v . BIND(1 AS ?v) }",
         "already bound"),
    ]:
        with pytest.raises(ValueError, match=msg):
            sparql_select(ds, bad)


def _facet_graph():
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    # (subj, subj_kind, pred, obj_kind, obj_value, obj_lang, obj_datatype)
    rows = [
        ("s1", "iri", "http://e/label", "literal", "hello", "en", None),
        ("s1", "iri", "http://e/label", "literal", "bonjour", "fr", None),
        ("s2", "iri", "http://e/label", "literal", "plain", None, None),
        ("s2", "iri", "http://e/size", "literal", "42", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("b0", "bnode", "http://e/label", "literal", "anon", None, None),
        ("s1", "iri", "http://e/link", "bnode", "b0", None, None),
        ("s2", "iri", "http://e/link", "iri", "http://e/s1", None, None),
    ]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, sk, p, ok, ov, ol, od in rows:
        cols["subj"].append(s); cols["subj_kind"].append(sk)
        cols["pred"].append(p); cols["obj_kind"].append(ok)
        cols["obj_value"].append(ov); cols["obj_lang"].append(ol)
        cols["obj_datatype"].append(od)
    return rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))


def test_parse_facet_functions():
    q = parse_select(
        'SELECT ?s WHERE { ?s <http://e/label> ?o '
        'FILTER(isBlank(?s) || LANG(?o) != "en") '
        'FILTER(DATATYPE(?o) = <http://www.w3.org/2001/XMLSchema#string>) }'
    )
    assert q["filters"][0] == (
        "or",
        [("kindis", "s", "bnode"),
         ("facet_cmp", "!=", ("lang", "o"), ("str", "en"))],
    )
    assert q["filters"][1] == (
        "facet_cmp", "=", ("dt", "o"),
        ("str", "http://www.w3.org/2001/XMLSchema#string"),
    )
    for bad, msg in [
        # facet must be on the left, constant on the right
        ('SELECT ?s WHERE { ?s <http://e/p> ?o FILTER("en" = LANG(?o)) }',
         "facet on the left"),
        ('SELECT ?s WHERE { ?s <http://e/p> ?o FILTER(LANG(?o) = ?s) }',
         "constant on the right"),
        # ordering comparisons are out
        ('SELECT ?s WHERE { ?s <http://e/p> ?o FILTER(LANG(?o) < "en") }',
         "only = / !="),
        # '!' only before the supported unary forms
        ('SELECT ?s WHERE { ?s <http://e/p> ?o FILTER(!(?o = "x")) }',
         "only supported before"),
    ]:
        with pytest.raises(ParseError, match=msg):
            parse_select(bad)


def test_executor_facet_functions(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_ask, sparql_select

    ds = _facet_graph()
    # LANG: tag equality, "" = plain literal, non-literal objects drop
    got = sparql_select(
        ds, 'SELECT ?s ?o WHERE { ?s <http://e/label> ?o '
            'FILTER(LANG(?o) = "en") }'
    ).to_pandas()
    assert list(zip(got["s"], got["o"])) == [("s1", "hello")]
    got = sparql_select(
        ds, 'SELECT ?o WHERE { ?s <http://e/label> ?o FILTER(LANG(?o) = "") } '
            'ORDER BY ?o'
    ).to_pandas()
    assert got["o"].tolist() == ["anon", "plain"]
    got = sparql_select(
        ds, 'SELECT ?o WHERE { ?s <http://e/label> ?o '
            'FILTER(LANG(?o) != "en") } ORDER BY ?o'
    ).to_pandas()
    assert got["o"].tolist() == ["anon", "bonjour", "plain"]
    # DATATYPE: explicit tag, xsd:string default, rdf:langString default;
    # a non-literal object (link -> bnode/iri) errors -> row dropped
    for const, want in [
        ("http://www.w3.org/2001/XMLSchema#integer", ["42"]),
        ("http://www.w3.org/2001/XMLSchema#string", ["anon", "plain"]),
        ("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
         ["bonjour", "hello"]),
    ]:
        got = sparql_select(
            ds, f"SELECT ?o WHERE {{ ?s ?p ?o FILTER(DATATYPE(?o) = <{const}>) }} "
                "ORDER BY ?o"
        ).to_pandas()
        assert got["o"].tolist() == want, const
    # kind tests on object AND subject positions; negation = bound-and-not
    got = sparql_select(
        ds, "SELECT ?s ?o WHERE { ?s <http://e/link> ?o FILTER(isBlank(?o)) }"
    ).to_pandas()
    assert list(zip(got["s"], got["o"])) == [("s1", "b0")]
    got = sparql_select(
        ds, "SELECT ?s WHERE { ?s <http://e/label> ?o FILTER(isBlank(?s)) }"
    ).to_pandas()
    assert got["s"].tolist() == ["b0"]
    got = sparql_select(
        ds, "SELECT ?s ?o WHERE { ?s <http://e/link> ?o FILTER(!isBlank(?o)) }"
    ).to_pandas()
    assert list(zip(got["s"], got["o"])) == [("s2", "http://e/s1")]
    # facets thread through a join chain (facet var bound by pattern 2)
    got = sparql_select(
        ds, 'SELECT ?s ?v WHERE { ?s <http://e/link> ?t . '
            '?t <http://e/label> ?v FILTER(isLiteral(?v) && LANG(?v) = "") }'
    ).to_pandas()
    assert list(zip(got["s"], got["v"])) == [("s1", "anon")]
    # ASK sees facets too
    assert sparql_ask(
        ds, 'ASK { ?s <http://e/size> ?o FILTER(DATATYPE(?o) = '
            "<http://www.w3.org/2001/XMLSchema#integer>) }"
    ).take_all() == [{"ask": True}]


def test_executor_facet_rejections(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _facet_graph()
    for bad, msg in [
        # facet var bound only by an OPTIONAL
        ("SELECT ?s WHERE { ?s <http://e/label> ?x "
         "OPTIONAL { ?s <http://e/link> ?o } FILTER(isBlank(?o)) }",
         "required pattern"),
        # LANG needs an object-position binding; ?s is subject-only
        ('SELECT ?s WHERE { ?s <http://e/label> ?o FILTER(LANG(?s) = "en") }',
         "OBJECT position"),
        # facets over UNION branches
        ('SELECT ?o WHERE { { ?s <http://e/label> ?o } UNION '
         '{ ?s <http://e/link> ?o } FILTER(LANG(?o) = "en") }',
         "UNION"),
    ]:
        with pytest.raises(ValueError, match=msg):
            sparql_select(ds, bad)
    # facet in HAVING (aggregate outputs carry no term metadata)
    with pytest.raises(ValueError, match="HAVING"):
        sparql_select(
            ds, "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s "
                "HAVING(isBlank(?s))"
        )


def test_executor_union_joined_with_patterns(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _facet_graph()
    # union joins the required bindings on ?s (bound by both branches)
    got = sparql_select(
        ds, "SELECT ?s ?o ?v WHERE { ?s <http://e/link> ?o . "
            "{ ?s <http://e/label> ?v } UNION { ?s <http://e/size> ?v } } "
            "ORDER BY ?s ?v"
    ).to_pandas()
    assert list(zip(got["s"], got["o"], got["v"])) == [
        ("s1", "b0", "bonjour"), ("s1", "b0", "hello"),
        ("s2", "http://e/s1", "42"), ("s2", "http://e/s1", "plain"),
    ]
    # a facet FILTER on a required-pattern var composes with the union
    got = sparql_select(
        ds, "SELECT ?s ?v WHERE { ?s <http://e/link> ?o . "
            "{ ?s <http://e/label> ?v } UNION { ?s <http://e/size> ?v } "
            "FILTER(isBlank(?o)) } ORDER BY ?v"
    ).to_pandas()
    assert list(zip(got["s"], got["v"])) == [
        ("s1", "bonjour"), ("s1", "hello")
    ]
    # union-only + OPTIONAL (every-branch vars are non-null, join is exact)
    got = sparql_select(
        ds, "SELECT ?s ?v ?w WHERE { "
            "{ ?s <http://e/label> ?v } UNION { ?s <http://e/size> ?v } "
            "OPTIONAL { ?s <http://e/link> ?w } } ORDER BY ?v"
    ).to_pandas()
    assert list(zip(got["s"], got["v"], got["w"])) == [
        ("s2", "42", "http://e/s1"), ("b0", "anon", None),
        ("s1", "bonjour", "b0"), ("s1", "hello", "b0"),
        ("s2", "plain", "http://e/s1"),
    ]
    # a var missing from one branch is a nullable OUTPUT
    got = sparql_select(
        ds, "SELECT ?v ?t WHERE { ?s <http://e/label> ?x . "
            "{ ?s <http://e/size> ?v } UNION "
            "{ ?s <http://e/size> ?v . ?s <http://e/link> ?t } } "
            "ORDER BY ?v ?t"
    ).to_pandas()
    # unbound sorts FIRST ascending (the SPARQL ordering the null-safe
    # sort pins)
    assert list(zip(got["v"], got["t"])) == [
        ("42", None), ("42", "http://e/s1"),
    ]
    for bad, msg in [
        # OPTIONAL joining through a nullable (branch-missing) union var
        ("SELECT ?s WHERE { { ?s <http://e/label> ?v } UNION "
         "{ ?s <http://e/size> ?v . ?s <http://e/link> ?t } "
         "OPTIONAL { ?t <http://e/label> ?w } }", "nullable"),
        # a JOIN var must be bound by every branch
        ("SELECT ?t WHERE { ?t <http://e/label> ?w . "
         "{ ?s <http://e/link> ?t } UNION { ?s <http://e/size> ?v } }",
         "bound by every branch"),
        # union sharing nothing with the required patterns
        ("SELECT ?a WHERE { ?a <http://e/size> ?b . "
         "{ ?s <http://e/label> ?v } UNION { ?s <http://e/size> ?v } }",
         "cartesian"),
    ]:
        with pytest.raises(ValueError, match=msg):
            sparql_select(ds, bad)


def test_parse_subquery():
    q = parse_select(
        "SELECT ?c ?n WHERE { ?c <http://e/turn> ?t . "
        "{ SELECT ?c (COUNT(?x) AS ?n) WHERE { ?c <http://e/turn> ?x } "
        "GROUP BY ?c } }"
    )
    assert len(q["subqueries"]) == 1
    sq = q["subqueries"][0]
    assert sq["project"] == ["c"] and sq["group_by"] == ["c"]
    assert sq["aggregates"] == [("COUNT", "x", False, "n")]
    # SELECT * includes subquery output columns
    q2 = parse_select(
        "SELECT * WHERE { ?c <http://e/turn> ?t . "
        "{ SELECT ?c (COUNT(?x) AS ?n) WHERE { ?c <http://e/turn> ?x } "
        "GROUP BY ?c } }"
    )
    assert q2["project"] == ["c", "t", "n"]
    from rdf_xml_ex_ray.core.sparql import parse_query

    for bad, msg in [
        ("SELECT ?c WHERE { ?c <http://e/p> ?t . { SELECT ?a WHERE { "
         "?a <http://e/q> ?b . { SELECT ?z WHERE { ?z <http://e/r> ?w } } "
         "} } }", "nested subqueries"),
        ("SELECT ?c WHERE { ?c <http://e/p> ?t . "
         "{ SELECT (AVG(?b) AS ?m) WHERE { ?a <http://e/q> ?b } } }",
         "AVG in a subquery"),
        ("SELECT ?c WHERE { ?c <http://e/p> ?t . { SELECT ?a WHERE { "
         "?a <http://e/q> ?b } ORDER BY ?a } }", "no effect"),
        ("ASK { ?c <http://e/p> ?t . { SELECT ?a WHERE { ?a <http://e/q> "
         "?b } } }", "only supported in SELECT"),
        ("SELECT ?c WHERE { ?c <http://e/p> ?t . { SELECT ?a WHERE { "
         "?a <http://e/q> ?b } } MINUS { ?c <http://e/r> ?z } }",
         "subquery is out of fragment"),
    ]:
        with pytest.raises(ParseError, match=msg):
            parse_query(bad)


def test_executor_subquery(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    rows = [("c1", "t1"), ("c1", "t2"), ("c1", "t3"), ("c2", "t4"),
            ("c2", "t5"), ("c3", "t6")]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for c, t in rows:
        cols["subj"].append(c); cols["subj_kind"].append("iri")
        cols["pred"].append("http://e/turn"); cols["obj_kind"].append("iri")
        cols["obj_value"].append(t); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))

    # aggregate subquery joined on its group key, COUNT re-read by FILTER
    got = sparql_select(
        ds, "SELECT ?c ?t ?n WHERE { ?c <http://e/turn> ?t . "
            "{ SELECT ?c (COUNT(?x) AS ?n) WHERE { ?c <http://e/turn> ?x } "
            "GROUP BY ?c } FILTER(?n >= 2) } ORDER BY ?c ?t"
    ).to_pandas()
    assert list(zip(got["c"], got["t"], got["n"])) == [
        ("c1", "t1", "3"), ("c1", "t2", "3"), ("c1", "t3", "3"),
        ("c2", "t4", "2"), ("c2", "t5", "2"),
    ]
    # subquery-only WHERE: the subquery is the binding table
    got = sparql_select(
        ds, "SELECT ?c ?n WHERE { { SELECT ?c (COUNT(?x) AS ?n) WHERE "
            "{ ?c <http://e/turn> ?x } GROUP BY ?c } } ORDER BY ?c"
    ).to_pandas()
    assert list(zip(got["c"], got["n"])) == [
        ("c1", "3"), ("c2", "2"), ("c3", "1")
    ]
    # DISTINCT subquery (non-aggregate) as a semi-join-style input
    got = sparql_select(
        ds, "SELECT ?c ?t WHERE { ?c <http://e/turn> ?t . "
            "{ SELECT DISTINCT ?c WHERE { ?c <http://e/turn> ?x "
            'FILTER(STRENDS(?x, "4")) } } }'
    ).to_pandas()
    assert sorted(zip(got["c"], got["t"])) == [("c2", "t4"), ("c2", "t5")]
    for bad, msg in [
        # no shared variable with the outer patterns
        ("SELECT ?c WHERE { ?c <http://e/turn> ?t . { SELECT ?a (COUNT(?x) "
         "AS ?n) WHERE { ?a <http://e/other> ?x } GROUP BY ?a } }",
         "cartesian"),
        # joining through a nullable aggregate alias
        ("SELECT ?t WHERE { ?c <http://e/turn> ?t . { SELECT ?a (MIN(?x) "
         "AS ?t) WHERE { ?a <http://e/turn> ?x } GROUP BY ?a } }",
         "nullable"),
    ]:
        with pytest.raises(ValueError, match=msg):
            sparql_select(ds, bad)


def test_parse_select_expression_projection():
    # (int-expr AS ?alias) in SELECT desugars to a BIND appended after the
    # WHERE clause's own binds, and the alias lands in the projection
    q = parse_select(
        "SELECT ?s (2 * ?v AS ?d) WHERE { ?s <http://e/val> ?v . "
        "BIND(?v + 1 AS ?w) }"
    )
    assert q["project"] == ["s", "d"]
    assert q["binds"] == [
        ("w", ("bop", "+", ("bvar", "v"), ("bnum", 1))),
        ("d", ("bop", "*", ("bnum", 2), ("bvar", "v"))),
    ]
    from rdf_xml_ex_ray.core.sparql import parse_query

    for bad, msg in [
        # duplicate target across BIND and the projection expression
        ("SELECT (1 AS ?w) WHERE { ?s <http://e/val> ?v . BIND(2 AS ?w) }",
         "duplicate BIND target"),
        # aggregates and expression projections don't mix
        ("SELECT (COUNT(*) AS ?n) (1 + 2 AS ?k) WHERE { ?s <http://e/p> ?v }",
         "out of fragment"),
        # the expression grammar is BIND's: integers only
        ("SELECT (1.5 + ?v AS ?k) WHERE { ?s <http://e/val> ?v }",
         "integer lexical"),
    ]:
        with pytest.raises(ParseError, match=msg):
            parse_query(bad)


def test_executor_select_expression_projection(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    got = sparql_select(
        ds,
        "SELECT ?s (3 * ?v - 1 AS ?r) (?r + 10 AS ?shift) "
        "WHERE { ?s <http://e/val> ?v } ORDER BY ?s",
    ).to_pandas()
    # non-integer lexical ('oops') propagates NULL through both exprs
    assert list(zip(got["s"], got["r"], got["shift"])) == [
        ("s1", "8", "18"), ("s2", "29", "39"), ("s3", "20", "30"),
        ("s4", None, None),
    ]
    # an expression projection target is already bound for later FILTERs
    got = sparql_select(
        ds,
        "SELECT (?v * ?v AS ?sq) WHERE { ?s <http://e/val> ?v "
        "FILTER(?v >= 7) } ORDER BY ?sq",
    ).to_pandas()
    assert got["sq"].tolist() == ["100", "49"]


def test_executor_bind_overflow_raises_both_engines(ray_session):
    """int64 overflow in BIND arithmetic is a LOUD error on both engines
    (Arrow checked kernels / DuckDB BIGINT) — never a silent wrap."""
    import duckdb
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    big = "999999999999999999"  # 18 digits: passes the lexical guard
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    cols["subj"].append("s9"); cols["subj_kind"].append("iri")
    cols["pred"].append("http://e/val"); cols["obj_kind"].append("literal")
    cols["obj_value"].append(big); cols["obj_lang"].append(None)
    cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    with pytest.raises(Exception, match="[Oo]verflow"):
        sparql_select(
            ds, "SELECT ?w WHERE { ?s <http://e/val> ?v . BIND(?v * ?v AS ?w) }"
        ).take_all()
    with pytest.raises(Exception, match="[Oo]ut of [Rr]ange|[Oo]verflow"):
        duckdb.connect().execute(
            f"SELECT CAST({big} AS BIGINT) * CAST({big} AS BIGINT)"
        )


def test_filter_numeric_hostile_lexicals_match_oracle(ray_session):
    """End-to-end numeric-FILTER parity on HOSTILE lexical forms — the
    comparison reads values through the finite-decimal guard
    (core/numeric.DBL_LEX_SQL_RE) + Arrow fast_float, and the twin spells
    the identical guarded TRY_CAST (_dbl_cast_sql). A bare to_numeric /
    TRY_CAST pair diverges on '1_0' (DuckDB: 10), padded whitespace
    (DuckDB trims), 'nan' (DuckDB's total order makes NaN = NaN TRUE) and
    '1e400' (pandas NULL, strtod +inf) — all probed, all in this battery."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import _dbl_cast_sql, sparql_select

    forms = [
        "3", " 3", "3 ", "+3", "-3", "3.5", "-3.5", "1e5", "1E5", ".5",
        "5.", "+.5", "1_0", "inf", "Infinity", "-inf", "nan", "NaN",
        "0x10", "3d", "", "٣", "1e", "1e+", "--3", "1,5", "\t7", "7\n",
        "1e400", "-1e400", "1e-400", "0b1", "³", "007", "0", "-0",
    ]
    rows = []
    for i, f in enumerate(forms):
        rows.append((f"s{i}", "http://e/val", f))
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))

    con = duckdb.connect()
    con.register(
        "kt",
        pd.DataFrame({"subj": cols["subj"], "pred": cols["pred"],
                      "obj_value": cols["obj_value"]}),
    )
    for sp_op, sql_op, const in [
        (">=", ">=", "1"), ("<", "<", "4"), (">", ">", "0"),
        ("<=", "<=", "100000"), ("=", "=", "3"), ("!=", "<>", "3"),
    ]:
        got = sparql_select(
            ds,
            "SELECT ?s WHERE { ?s <http://e/val> ?v . "
            f"FILTER(?v {sp_op} {const}) }} ORDER BY ?s",
        ).to_pandas()["s"].tolist()
        want = [
            r[0] for r in con.execute(
                f"SELECT subj FROM kt WHERE pred = 'http://e/val' AND "
                f"{_dbl_cast_sql('obj_value')} {sql_op} {const} "
                "ORDER BY subj"
            ).fetchall()
        ]
        assert got == want, (sp_op, const, got, want)


def test_order_by_nullable_keys(ray_session):
    """ORDER BY over nullable columns (UNION padding, BIND over a
    non-integer lexical, OPTIONAL) must not crash Ray's sort boundary
    sampling — _null_safe_sort surrogates make it total: unbound first
    under ASC (SPARQL ordering), last under DESC."""
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    rows = [("s1", "http://e/p", "3"), ("s2", "http://e/q", "5")]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    # ?w is null for the branch that doesn't bind ?z (UNION padding)
    q = ("SELECT ?w WHERE { { ?x <http://e/p> ?v } UNION "
         "{ ?v <http://e/q> ?z } BIND(?z + 1 AS ?w) } ORDER BY %s(?w)")
    got = sparql_select(ds, q % "ASC").to_pandas()
    assert got["w"].tolist() == [None, "6"]
    got = sparql_select(ds, q % "DESC").to_pandas()
    assert got["w"].tolist() == ["6", None]
    # nullable key in the implicit deterministic-LIMIT sort
    got = sparql_select(
        ds,
        "SELECT ?x ?w WHERE { { ?x <http://e/p> ?v } UNION "
        "{ ?v <http://e/q> ?z } BIND(?z + 1 AS ?w) } LIMIT 2",
    ).to_pandas()
    assert len(got) == 2
    # OPTIONAL-null in a tie-break column (appended behind ORDER BY ?s)
    rows2 = [("s1", "http://e/p", "3"), ("s2", "http://e/p", "4"),
             ("s1", "http://e/t", "tag")]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows2:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds2 = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    got = sparql_select(
        ds2,
        "SELECT ?s ?t WHERE { ?s <http://e/p> ?v . "
        "OPTIONAL { ?s <http://e/t> ?t } } ORDER BY ?s",
    ).to_pandas()
    assert list(zip(got["s"], got["t"])) == [("s1", "tag"), ("s2", None)]


def test_bind_target_in_minus_exists_rejected(ray_session):
    """A MINUS / FILTER EXISTS group naming a BIND target must reject
    loudly: groups join before binds evaluate, so the name would silently
    become a FREE inner variable instead of correlating on the computed
    value. OPTIONAL collisions trip the freshness check instead."""
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    for bad in [
        "SELECT ?s WHERE { ?s <http://e/val> ?v . BIND(?v + 1 AS ?w) "
        "MINUS { ?s <http://e/tag> ?w } }",
        "SELECT ?s WHERE { ?s <http://e/val> ?v . BIND(?v + 1 AS ?w) "
        "FILTER EXISTS { ?s <http://e/tag> ?w } }",
    ]:
        with pytest.raises(ValueError, match="BIND target"):
            sparql_select(ds, bad)
    with pytest.raises(ValueError, match="already bound"):
        sparql_select(
            ds,
            "SELECT ?s WHERE { ?s <http://e/val> ?v . BIND(?v + 1 AS ?w) "
            "OPTIONAL { ?s <http://e/tag> ?w } }",
        )


def test_parse_and_execute_negated_property_set(ray_session):
    from rdf_xml_ex_ray.core.sparql import NegSet
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    q = parse_select("SELECT ?o WHERE { ?s !<http://e/val> ?o }")
    assert q["patterns"] == [("?s", NegSet(("http://e/val",)), "?o")]
    q = parse_select(
        "PREFIX e: <http://e/> SELECT ?o WHERE { ?s !(e:val|e:tag) ?o }"
    )
    assert q["patterns"] == [("?s", NegSet(("http://e/val", "http://e/tag")), "?o")]
    # ^!p inverts the step (s/o swap), the set stays forward-only
    q = parse_select("SELECT ?o WHERE { ?s ^!<http://e/val> ?o }")
    assert q["patterns"] == [("?o", NegSet(("http://e/val",)), "?s")]
    for bad, msg in [
        ("SELECT ?o WHERE { ?s !(<http://e/a>|^<http://e/b>) ?o }",
         "out of fragment"),
        ("SELECT ?o WHERE { ?s !<http://e/a>+ ?o }", "out of fragment"),
        ("SELECT ?o WHERE { ?s !<http://e/a>* ?o }", "out of fragment"),
    ]:
        with pytest.raises(ParseError, match=msg):
            parse_select(bad)

    # executor: complement scan (s1 has val+tag; s2/s3 val only; s4 val)
    ds = _num_graph()
    got = sparql_select(
        ds, "SELECT ?s ?o WHERE { ?s !<http://e/val> ?o } ORDER BY ?s"
    ).to_pandas()
    assert list(zip(got["s"], got["o"])) == [("s1", "alpha"), ("s3", "beta")]
    # negset joined through a selector, sequence-position form
    got = sparql_select(
        ds,
        "SELECT ?s ?o WHERE { ?s <http://e/tag> ?t . "
        "?s !(<http://e/tag>) ?o } ORDER BY ?s",
    ).to_pandas()
    assert list(zip(got["s"], got["o"])) == [("s1", "3"), ("s3", "7")]


def test_group_concat(ray_session):
    """GROUP_CONCAT: codepoint-sorted concat, DISTINCT variant, custom
    separator, all-null group -> NULL (DuckDB's convention), and loud
    rejection of the global (no GROUP BY) form."""
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    q = parse_select(
        'SELECT ?g (GROUP_CONCAT(DISTINCT ?v ; SEPARATOR = "|") AS ?c) '
        "WHERE { ?s <http://e/g> ?g . ?s <http://e/v> ?v } GROUP BY ?g"
    )
    assert q["aggregates"] == [(("GC", "|"), "v", True, "c")]
    # default separator is one space
    q = parse_select(
        "SELECT ?g (GROUP_CONCAT(?v) AS ?c) "
        "WHERE { ?s <http://e/g> ?g . ?s <http://e/v> ?v } GROUP BY ?g"
    )
    assert q["aggregates"] == [(("GC", " "), "v", False, "c")]
    with pytest.raises(ParseError, match="global GROUP_CONCAT"):
        parse_select(
            "SELECT (GROUP_CONCAT(?v) AS ?c) WHERE { ?s <http://e/v> ?v }"
        )
    with pytest.raises(ParseError, match="only valid inside GROUP_CONCAT"):
        parse_select(
            'SELECT ?g (SUM(?v ; SEPARATOR = ",") AS ?c) '
            "WHERE { ?s <http://e/g> ?g . ?s <http://e/v> ?v } GROUP BY ?g"
        )

    rows = [("s1", "http://e/g", "A"), ("s1", "http://e/v", "z"),
            ("s2", "http://e/g", "A"), ("s2", "http://e/v", "b"),
            ("s3", "http://e/g", "A"), ("s3", "http://e/v", "z"),
            ("s4", "http://e/g", "B"), ("s4", "http://e/v", "k")]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    got = sparql_select(
        ds,
        'SELECT ?g (GROUP_CONCAT(?v ; SEPARATOR = ",") AS ?all) '
        '(GROUP_CONCAT(DISTINCT ?v ; SEPARATOR = ",") AS ?dis) '
        "WHERE { ?s <http://e/g> ?g . ?s <http://e/v> ?v } "
        "GROUP BY ?g ORDER BY ?g",
    ).to_pandas()
    assert list(zip(got["g"], got["all"], got["dis"])) == [
        ("A", "b,z,z", "b,z"), ("B", "k", "k"),
    ]
    # all-null group: OPTIONAL var never bound -> NULL concat
    got = sparql_select(
        ds,
        "SELECT ?g (GROUP_CONCAT(?t) AS ?c) WHERE { ?s <http://e/g> ?g . "
        "OPTIONAL { ?s <http://e/missing> ?t } } GROUP BY ?g ORDER BY ?g",
    ).to_pandas()
    assert got["c"].tolist() == [None, None]


def test_sample_aggregate(ray_session):
    """SAMPLE = the fragment's pinned codepoint-minimum choice (any group
    element conforms per SPARQL 1.1; a distributed engine must pick one
    deterministically). SAMPLE(DISTINCT x) = SAMPLE(x)."""
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    q = parse_select(
        "SELECT ?g (SAMPLE(?v) AS ?one) "
        "WHERE { ?s <http://e/g> ?g . ?s <http://e/v> ?v } GROUP BY ?g"
    )
    assert q["aggregates"] == [("MIN", "v", False, "one")]
    q = parse_select(
        "SELECT ?g (SAMPLE(DISTINCT ?v) AS ?one) "
        "WHERE { ?s <http://e/g> ?g . ?s <http://e/v> ?v } GROUP BY ?g"
    )
    assert q["aggregates"] == [("MIN", "v", False, "one")]
    ds = _num_graph()
    got = sparql_select(
        ds,
        "SELECT ?s (SAMPLE(?o) AS ?one) WHERE { ?s <http://e/val> ?v . "
        "?s <http://e/tag> ?o } GROUP BY ?s ORDER BY ?s",
    ).to_pandas()
    assert list(zip(got["s"], got["one"])) == [("s1", "alpha"), ("s3", "beta")]


def test_group_by_bind_target(ray_session):
    """GROUP BY over a BIND target, including the NULL group a
    non-integer lexical produces (SQL convention: nulls form one group;
    null-safe ORDER puts it first under ASC)."""
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    rows = [("s1", "http://e/v", "1"), ("s2", "http://e/v", "2"),
            ("s3", "http://e/v", "3"), ("s4", "http://e/v", "oops")]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("literal")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    got = sparql_select(
        ds,
        "SELECT ?w (COUNT(*) AS ?n) WHERE { ?s <http://e/v> ?v . "
        "BIND(?v + 10 AS ?w) } GROUP BY ?w ORDER BY ?w",
    ).to_pandas()
    assert list(zip(got["w"], got["n"])) == [
        (None, 1), ("11", 1), ("12", 1), ("13", 1),
    ]


# ------------------------------------------------- string value expressions


def test_parse_string_bind_and_strlen_projection():
    q = parse_select(
        """
        SELECT ?s (STRLEN(?t) * 2 AS ?l)
        WHERE {
          ?s <http://e/tag> ?t .
          BIND(CONCAT(UCASE(?t), "-", STR(?s)) AS ?c)
          BIND(REPLACE(SUBSTR(?t, 2, 3), "a", "o") AS ?r)
        }
        """
    )
    binds = dict(q["binds"])
    assert binds["c"] == (
        "sfn", "CONCAT", (("sfn", "UCASE", ("svar", "t")), ("sstr", "-"),
                          ("svar", "s")),
    )
    assert binds["r"] == (
        "sfn", "REPLACE", ("sfn", "SUBSTR", ("svar", "t"), 2, 3), "a", "o",
    )
    # the projection expression desugars to a BIND with the blen node
    assert binds["l"] == ("bop", "*", ("blen", ("svar", "t")), ("bnum", 2))


def test_parse_string_fns_reject_out_of_fragment():
    with pytest.raises(ParseError, match="SUBSTR start"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/p> ?t . BIND(SUBSTR(?t, 0) AS ?x) }'
        )
    with pytest.raises(ParseError, match="SUBSTR length"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/p> ?t . BIND(SUBSTR(?t, 1, -2) AS ?x) }'
        )
    with pytest.raises(ParseError, match="CONCAT needs at least 2"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/p> ?t . BIND(CONCAT(?t) AS ?x) }'
        )
    with pytest.raises(ParseError, match="REPLACE pattern"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/p> ?t . BIND(REPLACE(?t, ?t, "x") AS ?x) }'
        )
    # a string function is not an integer operand: arithmetic over UCASE
    # has no type — rejected at the parse level (STRLEN is the bridge)
    with pytest.raises(ParseError):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/p> ?t . BIND(UCASE(?t) + 1 AS ?x) }'
        )


def test_executor_string_bind_fns(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    got = sparql_select(
        ds,
        'SELECT ?s ?u ?m ?r WHERE { ?s <http://e/tag> ?t . '
        'BIND(UCASE(?t) AS ?u) BIND(SUBSTR(?t, 2, 3) AS ?m) '
        'BIND(REPLACE(?t, "a", "o") AS ?r) } ORDER BY ?s',
    ).to_pandas()
    assert got["u"].tolist() == ["ALPHA", "BETA"]
    assert got["m"].tolist() == ["lph", "eta"]
    assert got["r"].tolist() == ["olpho", "beto"]

    # STRLEN bridges into checked-int arithmetic; rendered as decimal string
    got = sparql_select(
        ds,
        "SELECT ?s (STRLEN(?t) * 2 AS ?l) WHERE { ?s <http://e/tag> ?t } ORDER BY ?s",
    ).to_pandas()
    assert got["l"].tolist() == ["10", "8"]

    # CONCAT propagates an OPTIONAL-null operand to an unbound target
    got = sparql_select(
        ds,
        'SELECT ?s ?c WHERE { ?s <http://e/val> ?v . '
        'OPTIONAL { ?s <http://e/tag> ?t } '
        'BIND(CONCAT(?s, ":", ?t) AS ?c) } ORDER BY ?s',
    ).to_pandas()
    assert got["c"].tolist()[0] == "s1:alpha"
    assert got["c"].isna().tolist() == [False, True, False, True]

    # FILTER over a string BIND target
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/tag> ?t . '
        'BIND(UCASE(?t) AS ?u) FILTER(?u = "ALPHA") }',
    ).to_pandas()
    assert got["s"].tolist() == ["s1"]


def test_parse_coalesce_if():
    q = parse_select(
        """
        SELECT ?s (IF(?v >= 7, "hi", COALESCE(?t, "none")) AS ?z)
        WHERE { ?s <http://e/val> ?v . OPTIONAL { ?s <http://e/tag> ?t } }
        """
    )
    binds = dict(q["binds"])
    assert binds["z"] == (
        "sif", ("cmp", ">=", ("var", "v"), ("num", 7.0)),
        ("sstr", "hi"), ("scoal", (("svar", "t"), ("sstr", "none"))),
    )
    with pytest.raises(ParseError, match="COALESCE needs at least 2"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/p> ?t . BIND(COALESCE(?t) AS ?x) }'
        )
    with pytest.raises(ParseError, match="term-facet forms inside IF"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/p> ?t . '
            'BIND(IF(isIRI(?t), "i", "l") AS ?x) }'
        )


def test_executor_coalesce_if(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()
    got = sparql_select(
        ds,
        'SELECT ?s ?d ?p WHERE { ?s <http://e/val> ?v . '
        'OPTIONAL { ?s <http://e/tag> ?t } '
        'BIND(COALESCE(?t, "none") AS ?d) '
        'BIND(IF(?v >= 7, "hi", "lo") AS ?p) } ORDER BY ?s',
    ).to_pandas()
    assert got["d"].tolist() == ["alpha", "none", "beta", "none"]
    # 'oops' fails the numeric comparison (error -> False -> else branch)
    assert got["p"].tolist() == ["lo", "hi", "hi", "lo"]


def test_parse_and_execute_zero_or_one_path(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.core.sparql import PathPlus
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    q = parse_select("SELECT ?n WHERE { <a> <http://e/p>? ?n }")
    assert q["patterns"] == [
        ("a", PathPlus("http://e/p", zero=True, max_hops=1), "?n")
    ]
    with pytest.raises(ParseError, match="out of fragment"):
        parse_select("SELECT ?n WHERE { ?s !<http://e/p>? ?n }")

    # a -> b -> c chain: p? from the seed is {a, b} — exactly one hop,
    # no convergence requirement (p* would add c)
    rows = [("a", "http://e/p", "b"), ("b", "http://e/p", "c")]
    cols = {n: [] for n in TRIPLE_SCHEMA.names}
    for s, p, o in rows:
        cols["subj"].append(s); cols["subj_kind"].append("iri")
        cols["pred"].append(p); cols["obj_kind"].append("iri")
        cols["obj_value"].append(o); cols["obj_lang"].append(None)
        cols["obj_datatype"].append(None)
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    got = sparql_select(ds, "SELECT ?n WHERE { <a> <http://e/p>? ?n } ORDER BY ?n")
    assert [r["n"] for r in got.take_all()] == ["a", "b"]
    # inverse anchoring: ?n p? <c> -> {c, b}
    got = sparql_select(ds, "SELECT ?n WHERE { ?n <http://e/p>? <c> } ORDER BY ?n")
    assert [r["n"] for r in got.take_all()] == ["b", "c"]
    # the unbounded forms still reach the whole chain
    got = sparql_select(ds, "SELECT ?n WHERE { <a> <http://e/p>* ?n } ORDER BY ?n")
    assert [r["n"] for r in got.take_all()] == ["a", "b", "c"]


def test_filter_strlen_operand(ray_session):
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    ds = _num_graph()  # tags: alpha (5), beta (4); vals incl. 'oops'
    got = sparql_select(
        ds,
        "SELECT ?s WHERE { ?s <http://e/tag> ?t . FILTER(STRLEN(?t) > 4) }",
    ).to_pandas()
    assert got["s"].tolist() == ["s1"]
    # STRLEN over a nested string expression; equality against a number
    got = sparql_select(
        ds,
        'SELECT ?s WHERE { ?s <http://e/tag> ?t . '
        'FILTER(STRLEN(REPLACE(?t, "a", "")) = 3) }',
    ).to_pandas()
    assert sorted(got["s"]) == ["s1", "s3"]  # "lph" and "bet"... both 3
    # ordering comparison without any numeric side still rejected
    with pytest.raises(ParseError, match="numeric operand"):
        parse_select(
            'SELECT ?s WHERE { ?s <http://e/tag> ?t . FILTER(?t < "x") }'
        )


def test_bind_facet_accessors(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA
    from rdf_xml_ex_ray.pipelines.bgp import sparql_select

    rows = [
        ("a", "iri", "http://e/v", "literal", "plain", None, None),
        ("b", "iri", "http://e/v", "literal", "tagged", "en-GB", None),
        ("c", "iri", "http://e/v", "literal", "typed", None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("d", "iri", "http://e/v", "iri", "http://x/iri-obj", None, None),
    ]
    cols = {n: [r[i] for r in rows] for i, n in enumerate(TRIPLE_SCHEMA.names)}
    ds = rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))
    got = sparql_select(
        ds,
        "SELECT ?s ?lg ?dt WHERE { ?s <http://e/v> ?o . "
        "BIND(LANG(?o) AS ?lg) BIND(DATATYPE(?o) AS ?dt) } ORDER BY ?s",
    ).to_pandas()
    assert got["lg"].tolist()[:3] == ["", "en-GB", ""]
    assert got["dt"].tolist()[:3] == [
        "http://www.w3.org/2001/XMLSchema#string",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
        "http://www.w3.org/2001/XMLSchema#integer",
    ]
    # non-literal -> unbound (error semantics), on both accessors
    assert got["lg"].isna().tolist() == [False, False, False, True]
    assert got["dt"].isna().tolist() == [False, False, False, True]
    # accessors compose with the string grammar
    got = sparql_select(
        ds,
        'SELECT ?s ?c WHERE { ?s <http://e/v> ?o . '
        'BIND(CONCAT(?o, "@", LANG(?o)) AS ?c) FILTER(BOUND(?c)) } ORDER BY ?s',
    ).to_pandas()
    assert got["c"].tolist() == ["plain@", "tagged@en-GB", "typed@"]
