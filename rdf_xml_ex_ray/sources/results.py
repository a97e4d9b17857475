"""SPARQL 1.1 query-results serializers: JSON, CSV, TSV.

Reference parity: rdf-elixir's ecosystem exposes query results through
SPARQL.ex's result modules (JSON / CSV / TSV per the W3C recs); this gives
the distributed engine the same interchange surface on top of
pipelines/bgp.sparql_select{_typed}.

Formats (W3C SPARQL 1.1 Query Results):

- JSON (``application/sparql-results+json``): typed — every binding is
  ``{"type": "uri"|"literal"|"bnode", "value": ...}`` with ``xml:lang`` /
  ``datatype`` when present. Term kinds come from
  ``sparql_select_typed``'s facet columns; BIND / expression targets are
  genuine plain literals.
- TSV (``text/tab-separated-values``): typed — full term syntax per row
  (``<iri>``, ``"literal"@lang`` / ``^^<dt>`` with N-Triples escaping,
  ``_:label``).
- XML (``application/sparql-results+xml``): typed — the SPARQL Query
  Results XML Format (the native interchange doc of an RDF/XML engine):
  ``<sparql>`` / ``<head><variable/></head>`` / ``<results><result>
  <binding name="v"><uri|literal|bnode>``, literals carrying ``xml:lang``
  or ``datatype`` attributes; ASK emits ``<boolean>``.
- CSV (``text/csv``): UNTYPED by spec — raw lexical values, RFC 4180
  quoting, blank nodes as ``_:label``, unbound cells empty. Works on any
  plain ``sparql_select`` output (no kind provenance needed; bnode
  detection is by the store's internal label shape only when kind columns
  are present — plain CSV writes the raw value).

``graph_document`` serializes GRAPH results (CONSTRUCT via the typed
flavor, DESCRIBE's CBD rows, any full-schema scan) as one N-Triples,
Turtle or RDF/XML document — the CLI's ``--format nt|ttl|rdf`` path for
those forms (rdf runs the repo's own encoder with auto-derived
predicate-namespace prefixes).

Blank-node labels: the store's internal ``{conv}!b{k}`` labels hex-encode
to spec-valid labels on the way out (core/ntriples.encode_bnode_label —
the repo-wide sink invariant).

Serialization MATERIALIZES the result on the driver — these are
interchange documents, not data-scale sinks; write parquet for big result
sets (the CLI's default ``--out`` path)."""

from __future__ import annotations

import csv as _csv
import io
import re

from xml.sax.saxutils import escape as _xesc
from xml.sax.saxutils import quoteattr as _xattr

from ..core.ntriples import _escape, encode_bnode_label

__all__ = [
    "select_json",
    "select_csv",
    "select_tsv",
    "select_xml",
    "ask_json",
    "ask_xml",
    "graph_document",
]

_SR_NS = "http://www.w3.org/2005/sparql-results#"
_XML_DECL = '<?xml version="1.0" encoding="UTF-8"?>\n'

# C0 controls other than \t \n \r are not expressible in XML 1.0 at all
# (not even as character references) — serializing them would produce an
# ill-formed document every conforming parser rejects
_XML_INVALID = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _xml_text(val: str) -> str:
    """Escape a literal value for an XML text node: &<> entity-escaped,
    \\r character-referenced (a raw \\r is silently normalized to \\n by
    every conforming parser — data corruption), XML-unrepresentable C0
    controls rejected LOUDLY (the JSON/TSV serializers carry them fine)."""
    m = _XML_INVALID.search(val)
    if m:
        raise ValueError(
            f"literal contains U+{ord(m.group()):04X}, which XML 1.0 "
            "cannot represent — serialize as json or tsv"
        )
    return _xesc(val).replace("\r", "&#13;")


def _iter_typed_rows(ds, out_vars, prov):
    """Yield per-row [(var, kind, value, lang, dt) | None unbound]."""
    kc = {v: f"__f_kind__{v}" for v in out_vars if prov[v] == "facet"}
    lc = {v: f"__f_lang__{v}" for v in out_vars}
    dc = {v: f"__f_dt__{v}" for v in out_vars}
    for row in ds.iter_rows():
        out = []
        for v in out_vars:
            val = row.get(v)
            if val is None:
                out.append(None)
                continue
            if prov[v] == "derived":
                out.append((v, "literal", val, None, None))
                continue
            kind = row.get(kc[v]) or "literal"
            out.append(
                (v, kind, val, row.get(lc[v]), row.get(dc[v]))
            )
        yield out


def select_json(ds, out_vars, prov) -> dict:
    """(Dataset, vars, provenance) from sparql_select_typed → the SPARQL
    1.1 Query Results JSON document (a plain dict — json.dumps it)."""
    bindings = []
    for row in _iter_typed_rows(ds, out_vars, prov):
        b = {}
        for term in row:
            if term is None:
                continue
            v, kind, val, lang, dt = term
            if kind == "iri":
                b[v] = {"type": "uri", "value": val}
            elif kind == "bnode":
                b[v] = {"type": "bnode", "value": encode_bnode_label(val)}
            else:
                lit = {"type": "literal", "value": val}
                if lang:
                    lit["xml:lang"] = lang
                elif dt:
                    lit["datatype"] = dt
                b[v] = lit
        bindings.append(b)
    return {"head": {"vars": list(out_vars)},
            "results": {"bindings": bindings}}


def _term_tsv(kind: str, val: str, lang, dt) -> str:
    if kind == "iri":
        return f"<{val}>"
    if kind == "bnode":
        return "_:" + encode_bnode_label(val)
    body = f'"{_escape(val)}"'
    if lang:
        return f"{body}@{lang}"
    if dt:
        return f"{body}^^<{dt}>"
    return body


def select_tsv(ds, out_vars, prov) -> str:
    """→ SPARQL 1.1 TSV results (typed term syntax, unbound = empty)."""
    lines = ["\t".join("?" + v for v in out_vars)]
    for row in _iter_typed_rows(ds, out_vars, prov):
        lines.append(
            "\t".join(
                "" if t is None else _term_tsv(t[1], t[2], t[3], t[4])
                for t in row
            )
        )
    return "\n".join(lines) + "\n"


def select_csv(ds, out_vars) -> str:
    """→ SPARQL 1.1 CSV results: raw lexical values (untyped by spec),
    RFC 4180 quoting, unbound cells empty. Takes any plain sparql_select
    output — no kind provenance needed."""
    buf = io.StringIO()
    w = _csv.writer(buf, lineterminator="\r\n")  # RFC 4180 line ends
    w.writerow(out_vars)
    for row in ds.iter_rows():
        w.writerow(["" if row.get(v) is None else row[v] for v in out_vars])
    return buf.getvalue()


def _term_xml(kind: str, val: str, lang, dt) -> str:
    if kind == "iri":
        return f"<uri>{_xml_text(val)}</uri>"
    if kind == "bnode":
        return f"<bnode>{_xesc(encode_bnode_label(val))}</bnode>"
    if lang:
        return f"<literal xml:lang={_xattr(lang)}>{_xml_text(val)}</literal>"
    if dt:
        return f"<literal datatype={_xattr(dt)}>{_xml_text(val)}</literal>"
    return f"<literal>{_xml_text(val)}</literal>"


def select_xml(ds, out_vars, prov) -> str:
    """→ the SPARQL Query Results XML Format document (typed; unbound
    variables simply omit their <binding>, per spec)."""
    parts = [_XML_DECL, f'<sparql xmlns="{_SR_NS}">\n', "  <head>\n"]
    for v in out_vars:
        parts.append(f"    <variable name={_xattr(v)}/>\n")
    parts.append("  </head>\n  <results>\n")
    for row in _iter_typed_rows(ds, out_vars, prov):
        parts.append("    <result>\n")
        for t in row:
            if t is None:
                continue
            v, kind, val, lang, dt = t
            parts.append(
                f"      <binding name={_xattr(v)}>"
                f"{_term_xml(kind, val, lang, dt)}</binding>\n"
            )
        parts.append("    </result>\n")
    parts.append("  </results>\n</sparql>\n")
    return "".join(parts)


def ask_xml(ask_ds) -> str:
    """sparql_ask's one-row {ask: bool} Dataset → the XML boolean doc."""
    val = "true" if bool(ask_ds.take(1)[0]["ask"]) else "false"
    return (
        _XML_DECL
        + f'<sparql xmlns="{_SR_NS}">\n  <head/>\n'
        + f"  <boolean>{val}</boolean>\n</sparql>\n"
    )


def ask_json(ask_ds) -> dict:
    """sparql_ask's one-row {ask: bool} Dataset → the SPARQL JSON boolean
    document."""
    return {"head": {}, "boolean": bool(ask_ds.take(1)[0]["ask"])}


def _row_terms(g, bnode_encode=encode_bnode_label):
    """Triple-schema frame → [(s, p, o) term triples], internal bnode
    labels encoded per the sink invariant — the ONE place the document
    sinks build terms. ``bnode_encode`` is the label encoder:
    BLANK_NODE_LABEL form (default) for nt/ttl, NCName form
    (core/ntriples.ncname_bnode_label) for the RDF/XML paths whose
    rdf:nodeID forbids a leading digit."""
    from ..core.model import row_to_term
    from ..core.terms import BNode, IRI

    triples = []
    for r in g.itertuples():
        s = (
            BNode(bnode_encode(r.subj))
            if r.subj_kind == "bnode"
            else IRI(r.subj)
        )
        o = row_to_term(r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype)
        if isinstance(o, BNode):
            o = BNode(bnode_encode(str(o)))
        triples.append((s, IRI(r.pred), o))
    return triples


def graph_document(ds, fmt: str = "nt", prefixes=None) -> str:
    """A FULL-triple-schema Dataset (sparql_describe / the typed
    CONSTRUCT flavor / any store scan) → one N-Triples, Turtle or
    RDF/XML interchange document, rows in deterministic full-column
    order (lang/datatype/kind break value ties — byte-identical output
    across runs regardless of upstream block arrival order), internal
    bnode labels hex-encoded per the sink invariant. Driver-side
    materialization — interchange docs, not data-scale sinks (write the
    store layout for big graphs)."""
    from ..core.ntriples import term_to_nt

    g = ds.to_pandas().sort_values(
        [
            "subj", "pred", "obj_value",
            "obj_lang", "obj_datatype", "obj_kind", "subj_kind",
        ],
        kind="mergesort",
    )
    if fmt == "ttl":
        from .turtle import DEFAULT_PREFIXES, table_to_turtle

        return table_to_turtle(
            g, dict(DEFAULT_PREFIXES if prefixes is None else prefixes)
        )
    if fmt == "rdf":
        # RDF/XML through the repo's own encoder — prefixes auto-derived
        # from the distinct predicate namespaces (RDF/XML property
        # elements REQUIRE QNames; the encoder raises on any predicate
        # the map misses, so derive rather than guess), deterministic
        # ns1..nsK numbering over the sorted namespace list.
        from ..core.model import Graph
        from ..core.ntriples import ncname_bnode_label
        from ..encoder.encoder import encode
        from .rdfxml import derive_pred_prefixes
        from .turtle import DEFAULT_PREFIXES

        pfx = derive_pred_prefixes(
            g["pred"].drop_duplicates(),
            DEFAULT_PREFIXES if prefixes is None else prefixes,
        )
        return encode(
            Graph(
                _row_terms(g, bnode_encode=ncname_bnode_label), prefixes=pfx
            ),
            pretty=True,
        )
    if fmt != "nt":
        raise ValueError(
            f"graph_document formats are nt|ttl|rdf, got {fmt!r}"
        )
    return "".join(
        f"{term_to_nt(s)} {term_to_nt(p)} {term_to_nt(o)} .\n"
        for s, p, o in _row_terms(g)
    )
