"""Ray stage: RDF/XML documents → triple rows (the hot parse stage).

A callable class for ``map_batches(ParseDocs, batch_format="pyarrow",
concurrency=N)`` — an actor pool, so per-actor setup happens once and the
pure-Python parser (decoder/parser.py, the striped state machine of
rules.ex) runs once per document row with all state function-local.

Documents that fail to parse become rows in the ``rejects`` side-channel
(error column set, no triples) instead of failing the task — the error
surface the reference exposes as ``{:error, _}`` (decoder.ex:55-61).
"""

from __future__ import annotations

import pyarrow as pa

from ..core.model import TRIPLE_COLUMNS
from ..core.terms import ParseError
from ..decoder.parser import parse_rdfxml

PARSE_OUT_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("subj_kind", pa.string()),
        ("pred", pa.string()),
        ("obj_kind", pa.string()),
        ("obj_value", pa.string()),
        ("obj_lang", pa.string()),
        ("obj_datatype", pa.string()),
        ("conv_id", pa.string()),
        ("error", pa.string()),
    ]
)


class ParseDocs:
    """Stateful parse stage. ``base`` applies to documents with relative
    IRIs (None for rendered transcripts — they are all-absolute).

    ``unique=False`` (default) parses into an append-only MultiGraph — no
    per-triple set insert. Safe for the flagship because the renderer never
    emits a duplicate triple within a conversation AND downstream
    canonicalization dedups per bucket; pass ``unique=True`` when feeding
    documents of unknown provenance whose consumers skip canonicalization."""

    def __init__(self, base: str | None = None, id_column: str = "conv_id",
                 unique: bool = False):
        self.base = base
        self.id_column = id_column
        self.unique = unique

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.terms import BNode, Literal

        docs = batch["doc"].to_pylist()
        ids = batch[self.id_column].to_pylist()
        subj, subj_kind, pred = [], [], []
        obj_kind, obj_value, obj_lang, obj_dt = [], [], [], []
        conv_id, error = [], []

        for doc, doc_id in zip(docs, ids):
            try:
                graph = parse_rdfxml(
                    doc, base=self.base, bnode_prefix=f"{doc_id}!b", unique=self.unique
                )
            except ParseError as e:
                subj.append(None)
                subj_kind.append(None)
                pred.append(None)
                obj_kind.append(None)
                obj_value.append(None)
                obj_lang.append(None)
                obj_dt.append(None)
                conv_id.append(doc_id)
                error.append(str(e))
                continue
            n0 = len(subj)
            # single interpreted pass with 8 appends — measured FASTER (4-6×)
            # than the "vectorized" zip(*graph) + per-column comprehensions
            # the r2 review suggested trying (each comprehension re-walks the
            # o-column with a type test + attribute access; 200k-triple
            # microbench: 0.05 s loop vs 0.22-0.30 s comprehensions)
            for s, p, o in graph:
                subj.append(s)  # IRI/BNode are str subclasses; no copy
                subj_kind.append("bnode" if type(s) is BNode else "iri")
                pred.append(p)
                if type(o) is Literal:
                    obj_kind.append("literal")
                    obj_value.append(o.lexical)
                    obj_lang.append(o.lang)
                    obj_dt.append(o.datatype)
                else:
                    obj_kind.append("bnode" if type(o) is BNode else "iri")
                    obj_value.append(o)
                    obj_lang.append(None)
                    obj_dt.append(None)
            added = len(subj) - n0
            conv_id.extend([doc_id] * added)
            error.extend([None] * added)
        return pa.table(
            {
                "subj": subj,
                "subj_kind": subj_kind,
                "pred": pred,
                "obj_kind": obj_kind,
                "obj_value": obj_value,
                "obj_lang": obj_lang,
                "obj_datatype": obj_dt,
                "conv_id": conv_id,
                "error": error,
            },
            schema=PARSE_OUT_SCHEMA,
        )


def split_rejects(table: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(triples, rejects) from a parse-stage output table."""
    import pyarrow.compute as pc

    ok = pc.is_null(table["error"])
    return (
        table.filter(ok).select(TRIPLE_COLUMNS + ["conv_id"]),
        table.filter(pc.invert(ok)).select(["conv_id", "error"]),
    )
