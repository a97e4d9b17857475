"""SPARQL UPDATE: parser fragment coverage, loud rejection, and executor
semantics (value-identity deletes, full-row insert set-ness, facet-carried
term kinds) on a tiny store.

Reference parity: rdf-elixir mutates graphs via RDF.Graph.add/delete on
in-memory values; this is the distributed-store analogue (see
pipelines/update.py's module docstring for the semantics contract)."""

import pyarrow as pa
import pytest

from rdf_xml_ex_ray.core.sparql import parse_update
from rdf_xml_ex_ray.core.terms import ParseError

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _store():
    import ray.data as rd

    from rdf_xml_ex_ray.core.model import TRIPLE_SCHEMA

    rows = [
        ("a", "iri", "http://e/p", "iri", "b", None, None),
        ("b", "iri", "http://e/p", "iri", "c", None, None),
        ("a", "iri", "http://e/name", "literal", "Ann", None, None),
        ("b", "iri", "http://e/name", "literal", "Bob", "en", None),
    ]
    cols = {n: [r[i] for r in rows] for i, n in enumerate(TRIPLE_SCHEMA.names)}
    return rd.from_arrow(pa.table(cols, schema=TRIPLE_SCHEMA))


def _rows(ds):
    df = ds.to_pandas().sort_values(["subj", "pred", "obj_value"])
    return [tuple(None if pa.compute.is_null(pa.scalar(v)).as_py() else v
                  for v in r) for r in df.itertuples(index=False)]


def test_parse_update_forms_and_rejections():
    q = parse_update('INSERT DATA { <a> <http://e/p> "x"@en . }')
    assert q["op"] == "insert_data"
    assert q["data"] == [(("iri", "a"), ("iri", "http://e/p"),
                          ("lit", "x", "en", None))]
    q = parse_update(
        f'DELETE DATA {{ <a> <http://e/p> "5"^^<{XSD_INT}> }}'
    )
    assert q["data"][0][2] == ("lit", "5", None, XSD_INT)
    q = parse_update("DELETE WHERE { ?x <http://e/p> ?y . ?y <http://e/p> ?z }")
    assert q["op"] == "modify" and len(q["delete_tmpl"]) == 2
    assert q["insert_tmpl"] == []

    for bad, msg in [
        ('INSERT DATA { ?x <http://e/p> <b> }', "variables are not allowed"),
        ('INSERT DATA { <a> <http://e/p> 5 }', "bare numeric"),
        ('INSERT DATA { "lit" <http://e/p> <b> }', "literal subject"),
        ('DELETE WHERE { ?x <http://e/p> ?y FILTER(?y = "b") }',
         "plain pattern group"),
        ('DELETE WHERE { ?x <http://e/p>+ ?y }', "property paths"),
        ('INSERT { ?x <http://e/q> ?z } WHERE { ?x <http://e/p> ?y }',
         "unbound variables"),
        ('INSERT DATA { <a> <http://e/p> <b> } ; DELETE DATA { <a> <http://e/p> <b> }',
         "trailing content"),
        ('CLEAR GRAPH <g>', "unlexable SPARQL"),  # CLEAR isn't in the fragment
        ('SELECT ?x WHERE { ?x <http://e/p> ?y }',
         "expected an INSERT or DELETE"),
    ]:
        with pytest.raises(ParseError, match=msg):
            parse_update(bad)


def test_insert_data_full_fidelity_and_setness(ray_session):
    from rdf_xml_ex_ray.pipelines.update import sparql_update

    out = sparql_update(_store(), f'''
        INSERT DATA {{
          <c> <http://e/name> "Cid"@en .
          <c> <http://e/age> "5"^^<{XSD_INT}> .
          <a> <http://e/name> "Ann" .
        }}''')
    rows = _rows(out)
    assert len(rows) == 6  # the exact-duplicate <a> name row is a no-op
    assert ("c", "iri", "http://e/age", "literal", "5", None, XSD_INT) in rows
    assert ("c", "iri", "http://e/name", "literal", "Cid", "en", None) in rows


def test_delete_data_value_identity(ray_session):
    from rdf_xml_ex_ray.pipelines.update import sparql_update

    # value identity: the plain "Bob" constant removes the @en-tagged row
    out = sparql_update(_store(), 'DELETE DATA { <b> <http://e/name> "Bob" }')
    rows = _rows(out)
    assert len(rows) == 3
    assert not any(r[4] == "Bob" for r in rows)


def test_delete_where_and_modify_kind_fidelity(ray_session):
    from rdf_xml_ex_ray.pipelines.update import sparql_update

    out = sparql_update(_store(), "DELETE WHERE { ?x <http://e/p> ?y }")
    assert [r[2] for r in _rows(out)] == ["http://e/name", "http://e/name"]

    # rename a predicate: the inserted rows keep Bob's @en tag and the
    # literal/iri kinds via the facet plan
    out = sparql_update(_store(), '''
        DELETE { ?x <http://e/name> ?n }
        INSERT { ?x <http://e/label> ?n }
        WHERE { ?x <http://e/name> ?n }''')
    rows = _rows(out)
    assert len(rows) == 4
    assert ("a", "iri", "http://e/label", "literal", "Ann", None, None) in rows
    assert ("b", "iri", "http://e/label", "literal", "Bob", "en", None) in rows
    assert not any(r[2] == "http://e/name" for r in rows)

    # insert-only modify with an iri-kind object carried from the binding
    out = sparql_update(_store(), '''
        INSERT { ?y <http://e/from> ?x }
        WHERE { ?x <http://e/p> ?y }''')
    rows = _rows(out)
    assert ("b", "iri", "http://e/from", "iri", "a", None, None) in rows
    assert ("c", "iri", "http://e/from", "iri", "b", None, None) in rows
    assert len(rows) == 6


def test_modify_insert_needs_required_binding(ray_session):
    from rdf_xml_ex_ray.pipelines.update import sparql_update

    with pytest.raises(ValueError, match="required pattern"):
        sparql_update(_store(), '''
            INSERT { ?x <http://e/opt> ?t }
            WHERE { ?x <http://e/p> ?y .
                    OPTIONAL { ?x <http://e/name> ?t } }''').count()


def test_modify_is_idempotent_on_rerun(ray_session):
    from rdf_xml_ex_ray.pipelines.update import sparql_update

    req = '''
        INSERT { ?x <http://e/seen> "1" }
        WHERE { ?x <http://e/p> ?y }'''
    once = sparql_update(_store(), req).materialize()
    twice = sparql_update(once, req)
    assert sorted(_rows(once)) == sorted(_rows(twice))
