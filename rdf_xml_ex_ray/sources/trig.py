"""TriG source + sink: the block-structured RDF-dataset surface.

TriG 1.1 is Turtle plus graph blocks — the human-readable sibling of
N-Quads (the two round-trip the same quad rows; see sources/nquads.py).
The reader is the GENERAL core parser (core/turtle.py's _TriGParser
subclass — full Turtle term grammar inside graph blocks: collections,
bnode property lists, numeric/boolean shorthand, multi-line strings,
``GRAPH`` keyword, label-less default-graph blocks). The sink writes
deterministic absolute-IRI TriG — one block per named graph, default
graph as bare statements — with the bucketed atomic-rename store layout.

TriG is NOT line-oriented, so the source reads whole files (one parse
task per file — the rdfxml source's document-atomic pattern); the sink's
graph-hash bucket files keep blocks independent for parallel writes.
Blank-node labels are hex-encoded to spec-valid BLANK_NODE_LABELs on
write and decoded on read (core/ntriples; internal labels contain '!').
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..core.model import row_to_term, term_to_row
from ..core.ntriples import decode_bnode_label, encode_bnode_label, term_to_nt
from ..core.terms import BNode, IRI
from ..core.turtle import parse_trig
from .nquads import QUAD_SCHEMA


def read_trig(paths, base: str | None = None):
    """.trig file(s) → Dataset of quad rows (whole-file parse per row)."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]
    ds = rd.from_items([{"path": p} for p in paths])

    def decode(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in QUAD_SCHEMA.names}
        for path in batch["path"].to_pylist():
            with open(path, encoding="utf-8") as f:
                text = f.read()
            for s, p, o, g in parse_trig(text, base=base):
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


def write_trig(quads_ds, out_dir: str, num_buckets: int = 16):
    """Quad-row Dataset → ``out_dir/part-<bucket>.trig`` (graph-hash
    partitioned; named graphs as ``<g> { ... }`` blocks, default graph as
    bare statements; sorted within each block; atomic rename)."""
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
        # graph_kind participates in BOTH the sort and the open-block key:
        # an IRI graph and a bnode graph can share the same raw label, and
        # keying on the label alone would merge them into one block under
        # the first row's kind (silently reassigning quads).
        g = group.sort_values(
            ["graph_kind", "graph", "subj", "pred", "obj_value"],
            kind="mergesort",
            na_position="first",
        )
        lines: list[str] = []
        current: tuple[str, str] | None = None  # open block, (kind, label)
        n = 0
        for r in g.itertuples():
            glabel = r.graph if isinstance(r.graph, str) else None
            gkey = (r.graph_kind, glabel) if glabel is not None else None
            if gkey != current:
                if current is not None:
                    lines.append("}\n")
                if gkey is not None:
                    lines.append(f"{term_to_nt(_term_out(r.graph_kind, glabel))} {{\n")
                current = gkey
            s = _term_out(r.subj_kind, r.subj)
            o = row_to_term(r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype)
            if isinstance(o, BNode):
                o = BNode(encode_bnode_label(str(o)))
            indent = "  " if current is not None else ""
            lines.append(
                f"{indent}{term_to_nt(s)} {term_to_nt(IRI(r.pred))} {term_to_nt(o)} .\n"
            )
            n += 1
        if current is not None:
            lines.append("}\n")
        tmp = os.path.join(out_dir, f".part-{bucket:05d}.trig.tmp")
        final = os.path.join(out_dir, f"part-{bucket:05d}.trig")
        with open(tmp, "w", encoding="utf-8") as f:
            f.writelines(lines)
        os.replace(tmp, final)
        return pd.DataFrame({"gbucket": [bucket], "n_quads": [n]})

    return (
        quads_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(write_bucket, batch_format="pandas")
    )
