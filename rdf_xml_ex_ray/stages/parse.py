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

from ..core.model import TRIPLE_COLUMNS, term_to_row
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
    IRIs (None for rendered transcripts — they are all-absolute)."""

    def __init__(self, base: str | None = None, id_column: str = "conv_id"):
        self.base = base
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch["doc"].to_pylist()
        ids = batch[self.id_column].to_pylist()
        cols: dict[str, list] = {name: [] for name in PARSE_OUT_SCHEMA.names}

        def emit(s_kind, s_val, pred, o_kind, o_val, o_lang, o_dt, doc_id, err):
            cols["subj"].append(s_val)
            cols["subj_kind"].append(s_kind)
            cols["pred"].append(pred)
            cols["obj_kind"].append(o_kind)
            cols["obj_value"].append(o_val)
            cols["obj_lang"].append(o_lang)
            cols["obj_datatype"].append(o_dt)
            cols["conv_id"].append(doc_id)
            cols["error"].append(err)

        for doc, doc_id in zip(docs, ids):
            try:
                graph = parse_rdfxml(doc, base=self.base, bnode_prefix=f"{doc_id}!b")
            except ParseError as e:
                emit(None, None, None, None, None, None, None, doc_id, str(e))
                continue
            for s, p, o in graph:
                s_kind, s_val, _, _ = term_to_row(s)
                o_kind, o_val, o_lang, o_dt = term_to_row(o)
                emit(s_kind, s_val, str(p), o_kind, o_val, o_lang, o_dt, doc_id, None)
        return pa.table(cols, schema=PARSE_OUT_SCHEMA)


def split_rejects(table: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(triples, rejects) from a parse-stage output table."""
    import pyarrow.compute as pc

    ok = pc.is_null(table["error"])
    return (
        table.filter(ok).select(TRIPLE_COLUMNS + ["conv_id"]),
        table.filter(pc.invert(ok)).select(["conv_id", "error"]),
    )
