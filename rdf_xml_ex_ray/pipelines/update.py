"""SPARQL UPDATE executor over the distributed triple store.

Reference parity: rdf-elixir pairs rdf-xml-ex graphs with the wider
RDF.ex/SPARQL.ex ecosystem, where graph mutation is RDF.Graph.add /
RDF.Graph.delete on an in-memory graph value — this module gives the
distributed store the equivalent mutation surface as a streaming
Dataset-to-Dataset transform (the store is immutable parquet; an update
produces the NEW store, written by the CLI next to the old one).

Semantics (the engine-wide kind-agnostic matching convention throughout):

- DELETION identity is ``(subj, pred, obj_value)`` — VALUE identity, the
  same convention every BGP constant match and SQL twin uses. A DELETE
  DATA / DELETE template row removes every store row sharing its three
  values regardless of kind/lang/datatype marks (which are therefore
  ignored, loudly documented here, in delete templates).
- INSERT set-ness is the FULL 7-column row (nulls compare equal): a row
  already present in the post-delete store is not duplicated; duplicate
  instantiations collapse to one.
- In a ``DELETE {} INSERT {} WHERE {}`` request the deletes apply before
  the inserts and BOTH templates instantiate from the same WHERE bindings
  (SPARQL 1.1 Update §3.1.3); a template row with a null slot (OPTIONAL /
  UNION padding) is skipped — the CONSTRUCT convention.
- INSERT template term kinds: constant IRIs / (optionally tagged or
  typed) literals carry their parsed kinds; VARIABLE slots read the
  term-kind facet columns the BGP engine attaches from the variable's
  required binding site (``bgp_execute(extra_facets=...)``) — so an
  inserted object keeps iri/bnode/literal kind and lang/datatype marks
  exactly. A variable bound only by OPTIONAL/UNION/BIND/closure carries
  no facet site and is rejected loudly for INSERT templates (DELETE
  templates need values only).

Scale shape (100 TB store): the WHERE bindings run through the ordinary
BGP engine; the DELETE side is ONE bucketed anti-join exchange over the
store (skipped entirely when the request deletes nothing — the store then
streams through untouched); the INSERT side ships only per-row KEYS of
the store through its dedup anti-join (1 column against the full rows of
the typically tiny insert set); DELETE DATA is a pure map-side filter
(constant key set, zero exchanges). Nothing materializes the store on
the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..core.model import TRIPLE_COLUMNS, TRIPLE_SCHEMA
from ..core.sparql import parse_update
from .bgp import _binding_site, _distinct, _facet_col, bgp_execute
from .dedup import _doc_bucket

__all__ = ["sparql_update"]

# per-column null sentinel for full-row keys: \x01 never starts a lexical
# form the store writes (IRIs, bnode labels and literal values are all
# produced from text), so a null column never collides with a value
_NULL = "\x01"


def _rebased(col) -> pa.Array:
    """ChunkedArray → one contiguous string array (the repo-wide sliced-
    chunk rebase before compute kernels)."""
    if getattr(col, "num_chunks", None) is None:
        return col.cast(pa.string())
    if col.num_chunks > 0:
        return pa.concat_arrays([c.cast(pa.string()) for c in col.chunks])
    return pa.array([], pa.string())


def _vkey(batch: pa.Table) -> pa.Array:
    """VALUE-identity key (subj, pred, obj_value) — never-null columns."""
    return pc.binary_join_element_wise(
        _rebased(batch["subj"]),
        _rebased(batch["pred"]),
        _rebased(batch["obj_value"]),
        "\x00",
    )


def _fkey(batch: pa.Table) -> pa.Array:
    """FULL 7-column identity key, null-safe (nulls compare equal via the
    \\x01 sentinel, SQL IS NOT DISTINCT FROM semantics)."""
    return pc.binary_join_element_wise(
        *[pc.fill_null(_rebased(batch[c]), _NULL) for c in TRIPLE_COLUMNS],
        "\x00",
    )


def _data_table(tagged) -> pa.Table:
    """Constant tagged triples (parse_update DATA block) → store rows,
    full term fidelity, deduped by full identity (a DATA block is a
    graph — set semantics)."""
    cols: dict[str, list] = {c: [] for c in TRIPLE_COLUMNS}
    seen: set = set()
    for s, p, o in tagged:
        if o[0] == "iri":
            row = (s[1], "iri", p[1], "iri", o[1], None, None)
        else:
            row = (s[1], "iri", p[1], "literal", o[1], o[2], o[3])
        if row in seen:
            continue
        seen.add(row)
        for c, v in zip(TRIPLE_COLUMNS, row):
            cols[c].append(v)
    return pa.table(cols, schema=TRIPLE_SCHEMA)


def _distinct_rows(ds, num_buckets: int):
    """Full-row set semantics over a triple-row Dataset: ONE bucketed
    exchange keyed by the null-safe 7-column key (per-column sentinel —
    unlike a joined-then-filled key, rows differing only in WHICH column
    is null stay distinct and spread across buckets)."""
    import pandas as pd

    def add_key(batch: pa.Table) -> pa.Table:
        key = _fkey(batch)
        batch = batch.append_column("__rk", key)
        return batch.append_column(
            "__rb", pa.array(_doc_bucket(key.to_pylist(), num_buckets))
        )

    def drop_dups(group: pd.DataFrame) -> pa.Table:
        d = group.drop_duplicates("__rk")[list(TRIPLE_COLUMNS)]
        return pa.table(
            {c: pa.array(d[c], pa.string()) for c in TRIPLE_COLUMNS},
            schema=TRIPLE_SCHEMA,
        )

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(drop_dups, batch_format="pandas")
    )


def _anti_by_key(left_ds, right_keys_ds, key_fn, num_buckets: int):
    """Keep the LEFT triple rows whose key has NO match in
    ``right_keys_ds`` (a Dataset with one ``__rk`` string column): the
    classic bucketed anti-join — one exchange, no driver state. Both
    callers pass triple-row datasets, so the data schema is
    TRIPLE_COLUMNS."""
    import pandas as pd

    data_cols = list(TRIPLE_COLUMNS)
    schema_cols = data_cols + ["__rk", "__rb", "__side"]

    def tag_left(batch: pa.Table) -> pa.Table:
        key = key_fn(batch)
        batch = batch.append_column("__rk", key)
        batch = batch.append_column(
            "__rb", pa.array(_doc_bucket(key.to_pylist(), num_buckets))
        )
        batch = batch.append_column(
            "__side", pa.repeat("l", batch.num_rows)
        )
        return batch.select(schema_cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        key = _rebased(batch["__rk"])
        cols = {c: pa.nulls(len(key), pa.string()) for c in data_cols}
        cols["__rk"] = key
        cols["__rb"] = pa.array(_doc_bucket(key.to_pylist(), num_buckets))
        cols["__side"] = pa.repeat("r", len(key))
        return pa.table(cols).select(schema_cols)

    left_t = left_ds.map_batches(tag_left, batch_format="pyarrow")
    right_t = right_keys_ds.map_batches(tag_right, batch_format="pyarrow")

    def anti(group: pd.DataFrame) -> pa.Table:
        right_keys = set(group.loc[group["__side"] == "r", "__rk"])
        keep = group[
            (group["__side"] == "l") & ~group["__rk"].isin(right_keys)
        ]
        return pa.table(
            {c: pa.array(keep[c], pa.string()) for c in data_cols}
        )

    return (
        left_t.union(right_t)
        .groupby("__rb")
        .map_groups(anti, batch_format="pandas")
    )


def _emit_value_triples(tmpl):
    """Plain delete-template triples → (subj, pred, obj_value) rows per
    solution, null slots dropped (vectorized, the CONSTRUCT emitter)."""

    def emit(batch: pa.Table) -> pa.Table:
        parts = []
        for pat in tmpl:
            t = batch
            for term in pat:
                if term.startswith("?"):
                    t = t.filter(pc.is_valid(t[term[1:]]))
            n = t.num_rows
            cols = {}
            for name, term in zip(("subj", "pred", "obj_value"), pat):
                cols[name] = (
                    _rebased(t[term[1:]])
                    if term.startswith("?")
                    else pa.repeat(term, n)
                )
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return emit


def _emit_insert_rows(tmpl, what="INSERT template"):
    """Tagged insert-template triples → full 7-column store rows per
    solution: constant slots carry their parsed kinds, variable slots
    read the term-kind facet columns; a literal binding in a subject
    slot or a non-IRI binding in a predicate slot is invalid RDF and
    raises loudly."""

    def emit(batch: pa.Table) -> pa.Table:
        parts = []
        for s, p, o in tmpl:
            t = batch
            for term in (s, p, o):
                if term[0] == "var":
                    t = t.filter(pc.is_valid(t[term[1]]))
            n = t.num_rows
            cols: dict = {}
            if s[0] == "var":
                sk = _rebased(t[_facet_col(s[1], "kind")])
                if n and pc.any(pc.equal(sk, "literal")).as_py():
                    raise ValueError(
                        f"{what} binds a literal into the subject "
                        f"slot (?{s[1]}) — invalid RDF"
                    )
                cols["subj"] = _rebased(t[s[1]])
                cols["subj_kind"] = sk
            else:
                cols["subj"] = pa.repeat(s[1], n)
                cols["subj_kind"] = pa.repeat("iri", n)
            if p[0] == "var":
                pk = _rebased(t[_facet_col(p[1], "kind")])
                if n and not pc.all(pc.equal(pk, "iri")).as_py():
                    raise ValueError(
                        f"{what} binds a non-IRI into the predicate "
                        f"slot (?{p[1]}) — invalid RDF"
                    )
                cols["pred"] = _rebased(t[p[1]])
            else:
                cols["pred"] = pa.repeat(p[1], n)
            if o[0] == "var":
                cols["obj_kind"] = _rebased(t[_facet_col(o[1], "kind")])
                cols["obj_value"] = _rebased(t[o[1]])
                lc, dc = _facet_col(o[1], "lang"), _facet_col(o[1], "dt")
                cols["obj_lang"] = (
                    _rebased(t[lc]) if lc in t.column_names
                    else pa.nulls(n, pa.string())
                )
                cols["obj_datatype"] = (
                    _rebased(t[dc]) if dc in t.column_names
                    else pa.nulls(n, pa.string())
                )
            elif o[0] == "iri":
                cols["obj_kind"] = pa.repeat("iri", n)
                cols["obj_value"] = pa.repeat(o[1], n)
                cols["obj_lang"] = pa.nulls(n, pa.string())
                cols["obj_datatype"] = pa.nulls(n, pa.string())
            else:
                cols["obj_kind"] = pa.repeat("literal", n)
                cols["obj_value"] = pa.repeat(o[1], n)
                cols["obj_lang"] = (
                    pa.repeat(o[2], n) if o[2] is not None
                    else pa.nulls(n, pa.string())
                )
                cols["obj_datatype"] = (
                    pa.repeat(o[3], n) if o[3] is not None
                    else pa.nulls(n, pa.string())
                )
            parts.append(pa.table(cols, schema=TRIPLE_SCHEMA))
        return pa.concat_tables(parts)

    return emit


def _insert_facet_plan(ins_tmpl, where_patterns, what="INSERT template") -> dict:
    """{var: facets} each template variable needs: kind always; lang/dt
    only when the variable's facet site is an object position
    (subject-bound variables are iri/bnode — lang/dt are null). Shared by
    UPDATE's INSERT templates and typed CONSTRUCT (``what`` names the
    construct in errors)."""
    extra: dict[str, set] = {}
    for s, p, o in ins_tmpl:
        for term in (s, p):
            if term[0] == "var":
                extra.setdefault(term[1], set()).add("kind")
        if o[0] == "var":
            extra.setdefault(o[1], set()).update({"kind", "lang", "dt"})
    for v in list(extra):
        site, pos = _binding_site(v, where_patterns)
        if site is None:
            raise ValueError(
                f"{what} variable ?{v} must be bound by a required "
                "pattern (OPTIONAL/UNION/BIND/closure-only bindings carry "
                "no term kind)"
            )
        if pos == "subj":
            extra[v] &= {"kind"}
    return extra


def sparql_update(triples_ds, text: str, num_buckets: int | None = None):
    """Apply one SPARQL UPDATE request (see core/sparql.parse_update for
    the fragment) to a triple-row Dataset; returns the NEW store Dataset
    (all 7 columns, original rows byte-identical — only membership
    changes)."""
    import ray.data as rd

    if num_buckets is None:
        try:
            num_buckets = max(32, 2 * triples_ds.num_blocks())
        except Exception:
            num_buckets = 64

    q = parse_update(text)
    if q["op"] == "delete_data":
        keys = _vkey(_data_table(q["data"])).to_pylist()
        key_set = pa.array(sorted(set(keys)), pa.string())

        def drop(batch: pa.Table) -> pa.Table:
            m = pc.is_in(_vkey(batch), value_set=key_set)
            return batch.filter(pc.invert(m))

        return triples_ds.map_batches(drop, batch_format="pyarrow")

    if q["op"] == "insert_data":
        rows = _data_table(q["data"])
        return _merge_inserts(triples_ds, rd.from_arrow(rows), num_buckets,
                              already_distinct=True)

    # ---- modify: DELETE {} INSERT {} WHERE {} --------------------------
    where = q["where"]
    del_tmpl, ins_tmpl = q["delete_tmpl"], q["insert_tmpl"]
    extra = _insert_facet_plan(ins_tmpl, where["patterns"]) if ins_tmpl else {}
    tvars = list(dict.fromkeys(
        [t[1:] for pat in del_tmpl for t in pat if t.startswith("?")]
        + [t[1] for trip in ins_tmpl for t in trip if t[0] == "var"]
    ))
    project = tvars + [
        _facet_col(v, f) for v in sorted(extra) for f in sorted(extra[v])
    ]
    bindings = bgp_execute(
        triples_ds,
        where["patterns"],
        project,
        num_buckets=num_buckets,
        optionals=where["optionals"],
        filters=where["filters"],
        unions=where["unions"],
        minuses=where["minuses"],
        exists=where["exists"],
        binds=where["binds"],
        extra_facets=extra or None,
    )
    if del_tmpl and ins_tmpl:
        # both emitters read the binding table — compute it once
        bindings = bindings.materialize()

    new_store = triples_ds
    if del_tmpl:
        del_set = _distinct(
            bindings.map_batches(
                _emit_value_triples(del_tmpl), batch_format="pyarrow"
            ),
            ["subj", "pred", "obj_value"],
        ).map_batches(
            lambda t: pa.table({"__rk": _vkey(t)}), batch_format="pyarrow"
        )
        new_store = _anti_by_key(new_store, del_set, _vkey, num_buckets)

    if ins_tmpl:
        ins_rows = bindings.map_batches(
            _emit_insert_rows(ins_tmpl), batch_format="pyarrow"
        )
        new_store = _merge_inserts(new_store, ins_rows, num_buckets,
                                   already_distinct=False)
    return new_store


def _merge_inserts(store_ds, ins_ds, num_buckets: int,
                   already_distinct: bool):
    """Union the insert rows into the store under full-row set semantics:
    dedup the inserts (one bucketed exchange, skipped for constant DATA
    blocks deduped at parse time), then anti-join them against the store
    — the store side ships only its KEY column; the store rows themselves
    stream through to the union untouched."""
    if not already_distinct:
        ins_ds = _distinct_rows(ins_ds, num_buckets)
    store_keys = store_ds.map_batches(
        lambda t: pa.table({"__rk": _fkey(t)}), batch_format="pyarrow"
    )
    fresh = _anti_by_key(ins_ds, store_keys, _fkey, num_buckets)
    return store_ds.union(fresh)


# ------------------------------------------------------- oracled queries

from .bgp import _C, _kg_triples_quarter  # noqa: E402  (appended section)
from .oracle import KG_TRIPLES_SQL  # noqa: E402

# DELETE/INSERT WHERE over the flagship KG: every role edge is rewritten
# to a roleLabel edge (the facet plan carries the object's iri kind into
# the inserted rows) plus a constant "flagged" mark per turn. Twin: kept =
# value-identity delete, inserts deduped by DISTINCT + a 7-column
# IS NOT DISTINCT FROM anti-probe against the kept store — exactly the
# engine's full-row set semantics.
KG_UPDATE_MODIFY_REQUEST = """
PREFIX c: <http://example.org/convo#>
DELETE { ?t c:role ?r }
INSERT { ?t c:roleLabel ?r . ?t c:flagged "yes" }
WHERE { ?t c:role ?r }
"""

KG_UPDATE_MODIFY_SQL = f"""
WITH kt AS (
  SELECT * FROM ( {KG_TRIPLES_SQL} ) AS base
), m AS (
  SELECT subj AS t, obj_kind AS rk, obj_value AS r,
         obj_lang AS rl, obj_datatype AS rd
  FROM kt WHERE pred = '{_C}role'
), kept AS (
  SELECT * FROM kt WHERE pred != '{_C}role'
), ins AS (
  SELECT DISTINCT * FROM (
    SELECT t AS subj, 'iri' AS subj_kind, '{_C}roleLabel' AS pred,
           rk AS obj_kind, r AS obj_value, rl AS obj_lang, rd AS obj_datatype
    FROM m
    UNION ALL
    SELECT t, 'iri', '{_C}flagged', 'literal', 'yes',
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM m
  )
), fresh AS (
  SELECT * FROM ins WHERE NOT EXISTS (
    SELECT 1 FROM kept k
    WHERE k.subj IS NOT DISTINCT FROM ins.subj
      AND k.subj_kind IS NOT DISTINCT FROM ins.subj_kind
      AND k.pred IS NOT DISTINCT FROM ins.pred
      AND k.obj_kind IS NOT DISTINCT FROM ins.obj_kind
      AND k.obj_value IS NOT DISTINCT FROM ins.obj_value
      AND k.obj_lang IS NOT DISTINCT FROM ins.obj_lang
      AND k.obj_datatype IS NOT DISTINCT FROM ins.obj_datatype
  )
)
SELECT * FROM kept UNION ALL SELECT * FROM fresh
"""


def kg_update_modify(sf_dir: str):
    """SPARQL UPDATE (modify form) over the flagship KG: rewrite every
    ``c:role`` edge to ``c:roleLabel`` (term kinds carried by the facet
    plan) and add a constant ``c:flagged "yes"`` mark per turn — returns
    the complete NEW store; untouched rows byte-identical."""
    return sparql_update(_kg_triples_quarter(sf_dir), KG_UPDATE_MODIFY_REQUEST)


# INSERT DATA: constant tagged triples (lang-tagged + typed literals and
# one exact duplicate of an existing store row, which the full-row set
# semantics drops). Twin: kt UNION ALL the constants minus the 7-column
# IS-NOT-DISTINCT-FROM probe.
KG_UPDATE_INSERT_DATA_REQUEST = """
PREFIX c: <http://example.org/convo#>
PREFIX conv: <http://example.org/conv/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
INSERT DATA {
  conv:c1 c:note "pinned"@en .
  conv:c1 c:priority "1"^^xsd:integer .
  conv:c1 a c:Conversation .
}
"""

KG_UPDATE_INSERT_DATA_SQL = f"""
WITH kt AS (
  SELECT * FROM ( {KG_TRIPLES_SQL} ) AS base
), ins AS (
  SELECT * FROM (VALUES
    ('http://example.org/conv/c1', 'iri', '{_C}note', 'literal',
     'pinned', 'en', CAST(NULL AS VARCHAR)),
    ('http://example.org/conv/c1', 'iri', '{_C}priority', 'literal',
     '1', CAST(NULL AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer'),
    ('http://example.org/conv/c1', 'iri',
     'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'iri',
     'http://example.org/convo#Conversation',
     CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
  ) AS v(subj, subj_kind, pred, obj_kind, obj_value, obj_lang, obj_datatype)
), fresh AS (
  SELECT * FROM ins WHERE NOT EXISTS (
    SELECT 1 FROM kt k
    WHERE k.subj IS NOT DISTINCT FROM ins.subj
      AND k.subj_kind IS NOT DISTINCT FROM ins.subj_kind
      AND k.pred IS NOT DISTINCT FROM ins.pred
      AND k.obj_kind IS NOT DISTINCT FROM ins.obj_kind
      AND k.obj_value IS NOT DISTINCT FROM ins.obj_value
      AND k.obj_lang IS NOT DISTINCT FROM ins.obj_lang
      AND k.obj_datatype IS NOT DISTINCT FROM ins.obj_datatype
  )
)
SELECT * FROM kt UNION ALL SELECT * FROM fresh
"""


def kg_update_insert_data(sf_dir: str):
    """SPARQL UPDATE (INSERT DATA) over the flagship KG: three constant
    triples — lang-tagged, xsd-typed, and one exact duplicate of an
    existing rdf:type row that the full-row set semantics drops."""
    return sparql_update(
        _kg_triples_quarter(sf_dir), KG_UPDATE_INSERT_DATA_REQUEST
    )
