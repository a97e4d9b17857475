"""N-Triples source + sink for Ray Data.

The reference's ecosystem reads its W3C goldens via RDF.NTriples
(w3c_test.exs:54); this gives the engine the same interop surface as a
Dataset source/sink: line-oriented, so ``read_text`` parallelizes trivially
and the sink streams one line per triple.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..core.model import TRIPLE_SCHEMA, term_to_row
from ..core.ntriples import decode_bnode_label, encode_bnode_label, parse_ntriples, term_to_nt


def read_ntriples(paths):
    """.nt file(s) → Dataset of triple rows (malformed lines raise — the
    N-Triples grammar has no recoverable-error notion). Bnode labels are
    decoded from the sink's BLANK_NODE_LABEL encoding (core/ntriples
    decode_bnode_label), restoring internal ``{conv_id}!b{k}`` labels."""
    import ray.data as rd

    ds = rd.read_text(paths)

    def decode(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in TRIPLE_SCHEMA.names}
        for line in batch["text"].to_pylist():
            for s, p, o in parse_ntriples(line):
                s_kind, s_val, _, _ = term_to_row(s)
                o_kind, o_val, o_lang, o_dt = term_to_row(o)
                if s_kind == "bnode":
                    s_val = decode_bnode_label(s_val)
                if o_kind == "bnode":
                    o_val = decode_bnode_label(o_val)
                cols["subj"].append(s_val)
                cols["subj_kind"].append(s_kind)
                cols["pred"].append(str(p))
                cols["obj_kind"].append(o_kind)
                cols["obj_value"].append(o_val)
                cols["obj_lang"].append(o_lang)
                cols["obj_datatype"].append(o_dt)
        return pa.table(cols, schema=TRIPLE_SCHEMA)

    return ds.map_batches(decode, batch_format="pyarrow")


def write_ntriples(triples_ds, out_dir: str, num_buckets: int = 16):
    """Triple-row Dataset → ``out_dir/part-<bucket>.nt`` (sorted within each
    bucket file, atomic rename — same resumable layout as the stores)."""
    import pandas as pd

    from ..core.model import row_to_term
    from ..core.terms import BNode, IRI
    from ..stages.canonicalize import add_subj_bucket

    os.makedirs(out_dir, exist_ok=True)
    bucketed = triples_ds.map_batches(
        lambda t: add_subj_bucket(t, num_buckets), batch_format="pyarrow"
    )

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["subj_bucket"].iloc[0])
        g = group.sort_values(["subj", "pred", "obj_value"], kind="mergesort")
        lines = []
        for r in g.itertuples():
            s = BNode(encode_bnode_label(r.subj)) if r.subj_kind == "bnode" else IRI(r.subj)
            o = row_to_term(r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype)
            if isinstance(o, BNode):
                o = BNode(encode_bnode_label(str(o)))
            lines.append(f"{term_to_nt(s)} {term_to_nt(IRI(r.pred))} {term_to_nt(o)} .\n")
        tmp = os.path.join(out_dir, f".part-{bucket:05d}.nt.tmp")
        final = os.path.join(out_dir, f"part-{bucket:05d}.nt")
        with open(tmp, "w", encoding="utf-8") as f:
            f.writelines(lines)
        os.replace(tmp, final)
        return pd.DataFrame({"subj_bucket": [bucket], "n_triples": [len(lines)]})

    return bucketed.groupby("subj_bucket").map_groups(write_bucket, batch_format="pandas")
