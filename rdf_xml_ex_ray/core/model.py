"""In-memory graph (small, test/encode-side) and the Arrow triple schema.

The *distributed* representation of a graph is a ``ray.data.Dataset`` of
triple rows (one Arrow row per triple, see ``TRIPLE_SCHEMA``); the ``Graph``
class here is only the convenience container used by unit tests, the W3C
conformance comparator and the encoder — mirroring the role of ``RDF.Graph``
in the reference (set semantics: adding a duplicate triple is a no-op;
/root/reference/lib/rdf/xml/decoder/grammar.ex:18).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pyarrow as pa

from .terms import BNode, IRI, Literal

Triple = tuple  # (subject: IRI|BNode, predicate: IRI, object: IRI|BNode|Literal)

# Lineage columns (conv_id, doc_id) are appended by the pipeline stages, not
# part of the core triple schema.
TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("subj_kind", pa.string()),  # 'iri' | 'bnode'
        ("pred", pa.string()),
        ("obj_kind", pa.string()),  # 'iri' | 'bnode' | 'literal'
        ("obj_value", pa.string()),
        ("obj_lang", pa.string()),
        ("obj_datatype", pa.string()),
    ]
)

TRIPLE_COLUMNS = [f.name for f in TRIPLE_SCHEMA]


class Graph:
    """Ordered set of triples + base IRI + prefix map."""

    __slots__ = ("_triples", "base_iri", "prefixes")

    def __init__(
        self,
        triples: Iterable[Triple] | None = None,
        base_iri: str | None = None,
        prefixes: dict[str | None, str] | None = None,
    ):
        self._triples: dict[Triple, None] = {}
        self.base_iri = base_iri
        self.prefixes: dict[str | None, str] = dict(prefixes or {})
        if triples:
            for t in triples:
                self.add(t)

    def add(self, triple: Triple) -> None:
        self._triples[triple] = None

    def __iter__(self) -> Iterator[Triple]:
        return iter(self._triples)

    def __len__(self) -> int:
        return len(self._triples)

    def __contains__(self, triple: Triple) -> bool:
        return triple in self._triples

    def triples(self) -> list[Triple]:
        return list(self._triples)

    def subjects(self) -> list:
        seen: dict = {}
        for s, _, _ in self._triples:
            seen.setdefault(s, None)
        return list(seen)

    def description(self, subject) -> list[Triple]:
        return [t for t in self._triples if t[0] == subject]


class MultiGraph:
    """Append-only triple collector — the parse-stage fast path.

    Set semantics (``Graph``) cost a dict insert + full triple hash per
    emitted triple; pipelines that canonicalize downstream (per-bucket
    dedup+sort restores set semantics globally anyway) skip that by parsing
    into this collector instead. Same read API as ``Graph``."""

    __slots__ = ("_triples", "base_iri", "prefixes")

    def __init__(self, base_iri: str | None = None):
        self._triples: list[Triple] = []
        self.base_iri = base_iri
        self.prefixes: dict[str | None, str] = {}

    def add(self, triple: Triple) -> None:
        self._triples.append(triple)

    def __iter__(self) -> Iterator[Triple]:
        return iter(self._triples)

    def __len__(self) -> int:
        return len(self._triples)

    def triples(self) -> list[Triple]:
        return list(self._triples)


def term_to_row(term) -> tuple[str, str, str | None, str | None]:
    """→ (kind, value, lang, datatype) for the Arrow triple layout."""
    if isinstance(term, Literal):
        return ("literal", term.lexical, term.lang, term.datatype)
    if isinstance(term, BNode):
        return ("bnode", str(term), None, None)
    return ("iri", str(term), None, None)


def row_to_term(kind: str, value: str, lang=None, datatype=None):
    if kind == "literal":
        return Literal(value, lang=lang, datatype=datatype)
    if kind == "bnode":
        return BNode(value)
    return IRI(value)


def triples_to_table(triples: Iterable[Triple]) -> pa.Table:
    cols: dict[str, list] = {name: [] for name in TRIPLE_COLUMNS}
    for s, p, o in triples:
        s_kind, s_val, _, _ = term_to_row(s)
        o_kind, o_val, o_lang, o_dt = term_to_row(o)
        cols["subj"].append(s_val)
        cols["subj_kind"].append(s_kind)
        cols["pred"].append(str(p))
        cols["obj_kind"].append(o_kind)
        cols["obj_value"].append(o_val)
        cols["obj_lang"].append(o_lang)
        cols["obj_datatype"].append(o_dt)
    return pa.table(cols, schema=TRIPLE_SCHEMA)


def table_to_triples(table: pa.Table) -> list[Triple]:
    out = []
    d = {c: table.column(c).to_pylist() for c in TRIPLE_COLUMNS}
    for i in range(table.num_rows):
        subj = BNode(d["subj"][i]) if d["subj_kind"][i] == "bnode" else IRI(d["subj"][i])
        obj = row_to_term(d["obj_kind"][i], d["obj_value"][i], d["obj_lang"][i], d["obj_datatype"][i])
        out.append((subj, IRI(d["pred"][i]), obj))
    return out
