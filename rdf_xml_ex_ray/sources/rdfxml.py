"""RDF/XML file source + sink for Ray Data (the `RDF.XML` format-module
analogue, reference /root/reference/lib/rdf/xml.ex:17-24 — `.rdf` /
`application/rdf+xml` read/write).

Source: ``read_binary_files("**/*.rdf")`` → per-file decode inside
``map_batches`` → triple rows (lineage column = file path).
Sink: canonical triple rows → one RDF/XML document per subject-hash bucket
(streaming encoder shape: header / one description per line / footer).
"""

from __future__ import annotations

import os
import zlib

import pyarrow as pa

from ..core.model import term_to_row
from ..core.terms import DEFAULT_PREFIXES, ParseError
from ..decoder.parser import parse_rdfxml
from ..stages.parse import PARSE_OUT_SCHEMA


def read_rdfxml(paths, base: str | None = None, bnode_prefix: str = "b"):
    """Directory/glob of .rdf files → Dataset of triple rows (+ doc lineage).

    Blank-node labels are namespaced per file (``{path-stem}!{prefix}{n}``) so
    the union over files stays globally collision-free — same scheme as the
    per-conversation allocation in the flagship.
    """
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def decode_batch(batch: pa.Table) -> pa.Table:
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

        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            # doc_id must be collision-free across the whole input set: two
            # files with the same basename in different directories (a/x.rdf,
            # b/x.rdf) must NOT share blank-node namespaces or lineage — so
            # the full path is folded in via a crc32 suffix
            stem = os.path.splitext(os.path.basename(path))[0]
            doc_id = f"{stem}-{zlib.crc32(path.encode('utf-8')):08x}"
            doc_base = base if base is not None else f"file://{path}"
            try:
                graph = parse_rdfxml(data, base=doc_base, bnode_prefix=f"{doc_id}!{bnode_prefix}")
            except ParseError as e:
                emit(None, None, None, None, None, None, None, doc_id, str(e))
                continue
            for s, p, o in graph:
                s_kind, s_val, _, _ = term_to_row(s)
                o_kind, o_val, o_lang, o_dt = term_to_row(o)
                emit(s_kind, s_val, str(p), o_kind, o_val, o_lang, o_dt, doc_id, None)
        return pa.table(cols, schema=PARSE_OUT_SCHEMA)

    return ds.map_batches(decode_batch, batch_format="pyarrow")


def write_rdfxml(
    triples_ds,
    out_dir: str,
    prefixes: dict[str | None, str] | None = None,
    base: str | None = None,
    num_buckets: int = 16,
):
    """Triple-row Dataset → ``out_dir/part-<bucket>.rdf`` documents.

    Streams via the per-description encoder (encoder.ex:94-123 shape): each
    bucket's descriptions are encoded independently, one file per bucket —
    the resumable, partitioned layout of the store, in RDF/XML form.
    """
    import pandas as pd

    from ..core.model import row_to_term
    from ..core.terms import BNode, IRI
    from ..core.terms import escape_attr
    from ..encoder.encoder import XML_DECL, encode_description, ns_declaration_attrs
    from ..stages.canonicalize import add_subj_bucket

    pfx = dict(DEFAULT_PREFIXES if prefixes is None else prefixes)
    os.makedirs(out_dir, exist_ok=True)
    decls = "".join(f' {n}="{escape_attr(v)}"' for n, v in ns_declaration_attrs(pfx, base, False))
    header = f"{XML_DECL}\n<rdf:RDF{decls}>\n"

    bucketed = triples_ds.map_batches(
        lambda t: add_subj_bucket(t, num_buckets), batch_format="pyarrow"
    )

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["subj_bucket"].iloc[0])
        lines = [header]
        for subj_val, g in group.sort_values("subj").groupby("subj", sort=True):
            kind = g["subj_kind"].iloc[0]
            subj = BNode(subj_val) if kind == "bnode" else IRI(subj_val)
            triples = [
                (subj, IRI(r.pred), row_to_term(r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype))
                for r in g.itertuples()
            ]
            lines.append(encode_description(subj, triples, base=base, prefixes=pfx) + "\n")
        lines.append("</rdf:RDF>\n")
        tmp = os.path.join(out_dir, f".part-{bucket:05d}.rdf.tmp")
        final = os.path.join(out_dir, f"part-{bucket:05d}.rdf")
        with open(tmp, "w", encoding="utf-8") as f:
            f.writelines(lines)
        os.replace(tmp, final)  # atomic: a present file is a complete file
        return pd.DataFrame(
            {"subj_bucket": [bucket], "n_descriptions": [group["subj"].nunique()]}
        )

    return bucketed.groupby("subj_bucket").map_groups(write_bucket, batch_format="pandas")
