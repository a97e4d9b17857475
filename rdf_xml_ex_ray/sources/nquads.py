"""N-Quads source + sink for Ray Data: the named-graph interop surface.

RDF 1.1 N-Quads is N-Triples plus an optional graph label (IRI or bnode)
per statement — the standard line-oriented dataset exchange format (the
reference ecosystem's RDF.Dataset / RDF.NQuads counterpart). Line-oriented
means ``read_text`` parallelizes the read trivially and the sink streams
one line per quad; files partition by graph-hash bucket so a multi-graph
store writes (and resumes) per bucket.

Quad rows are TRIPLE_SCHEMA plus ``graph`` / ``graph_kind`` (both null for
the default graph). Blank-node labels are hex-encoded to spec-valid
BLANK_NODE_LABELs on write and decoded on read (core/ntriples — internal
labels contain '!', which is outside PN_CHARS).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..core.model import TRIPLE_SCHEMA, row_to_term, term_to_row
from ..core.ntriples import (
    decode_bnode_label,
    encode_bnode_label,
    parse_nquads,
    term_to_nt,
)
from ..core.terms import BNode, IRI

QUAD_SCHEMA = pa.schema(
    list(TRIPLE_SCHEMA)
    + [("graph", pa.string()), ("graph_kind", pa.string())]
)


def read_nquads(paths):
    """.nq file(s) → Dataset of quad rows (graph/graph_kind null for the
    default graph); malformed lines raise."""
    import ray.data as rd

    ds = rd.read_text(paths)

    def decode(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in QUAD_SCHEMA.names}
        for line in batch["text"].to_pylist():
            for s, p, o, g in parse_nquads(line):
                s_kind, s_val, _, _ = term_to_row(s)
                o_kind, o_val, o_lang, o_dt = term_to_row(o)
                if s_kind == "bnode":
                    s_val = decode_bnode_label(s_val)
                if o_kind == "bnode":
                    o_val = decode_bnode_label(o_val)
                if g is None:
                    g_kind = g_val = None
                else:
                    g_kind, g_val, _, _ = term_to_row(g)
                    if g_kind == "bnode":
                        g_val = decode_bnode_label(g_val)
                cols["subj"].append(s_val)
                cols["subj_kind"].append(s_kind)
                cols["pred"].append(str(p))
                cols["obj_kind"].append(o_kind)
                cols["obj_value"].append(o_val)
                cols["obj_lang"].append(o_lang)
                cols["obj_datatype"].append(o_dt)
                cols["graph"].append(g_val)
                cols["graph_kind"].append(g_kind)
        return pa.table(cols, schema=QUAD_SCHEMA)

    return ds.map_batches(decode, batch_format="pyarrow")


def write_nquads(quads_ds, out_dir: str, num_buckets: int = 16):
    """Quad-row Dataset → ``out_dir/part-<bucket>.nq`` (graph-hash
    partitioned, sorted within each bucket, atomic rename — the resumable
    store layout). Default-graph rows hash as graph ''."""
    import pandas as pd

    from ..pipelines.dedup import _doc_bucket

    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pc.fill_null(batch["graph"].cast(pa.string()), "").to_pylist()
        return batch.append_column("gbucket", pa.array(_doc_bucket(keys, num_buckets)))

    def _term_out(kind, value):
        if kind == "bnode":
            return BNode(encode_bnode_label(value))
        return IRI(value)

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["gbucket"].iloc[0])
        g = group.sort_values(
            ["graph", "subj", "pred", "obj_value"], kind="mergesort", na_position="first"
        )
        lines = []
        for r in g.itertuples():
            s = _term_out(r.subj_kind, r.subj)
            o = row_to_term(r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype)
            if isinstance(o, BNode):
                o = BNode(encode_bnode_label(str(o)))
            stmt = f"{term_to_nt(s)} {term_to_nt(IRI(r.pred))} {term_to_nt(o)}"
            if isinstance(r.graph, str):
                stmt += f" {term_to_nt(_term_out(r.graph_kind, r.graph))}"
            lines.append(stmt + " .\n")
        tmp = os.path.join(out_dir, f".part-{bucket:05d}.nq.tmp")
        final = os.path.join(out_dir, f"part-{bucket:05d}.nq")
        with open(tmp, "w", encoding="utf-8") as f:
            f.writelines(lines)
        os.replace(tmp, final)
        return pd.DataFrame({"gbucket": [bucket], "n_quads": [len(lines)]})

    return (
        quads_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(write_bucket, batch_format="pandas")
    )
