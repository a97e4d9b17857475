"""Turtle sink (+ a reader for exactly the subset the sink emits).

Third serialization surface beside RDF/XML and N-Triples: the sink writes
deterministic, prefix-compacted Turtle — one predicate list per subject,
sorted (subj, pred, obj) — with the same bucketed, atomically-renamed
layout as write_ntriples. The reader parses the sink's own emission subset
(prefix decls, prefixed names, IRIs, bnodes, literals with lang/datatype,
``;`` predicate lists), which is what makes the write→read roundtrip a
self-contained correctness gate without an external Turtle parser.

Reference relationship: the reference is RDF/XML-only and reads goldens via
RDF.NTriples (w3c_test.exs:48-60); Turtle here is surface breadth for users
whose downstream tooling expects prefixed triples.

Blank nodes: internal labels (``{conv_id}!b{k}``) contain '!', which is
outside PN_CHARS — the sink emits them through encode_bnode_label so the
files are spec-valid BLANK_NODE_LABELs that conformant parsers accept;
read_turtle decodes, so roundtrips preserve internal labels.
"""

from __future__ import annotations

import os
import re

from ..core.model import TRIPLE_SCHEMA, term_to_row
from ..core.ntriples import _escape, decode_bnode_label, encode_bnode_label

# conservative PN_LOCAL: what we can compact WITHOUT Turtle escape rules
_PN_LOCAL_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_\-]*\Z")

DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def _compact(iri: str, prefixes: dict[str, str]) -> str:
    """Longest-namespace prefixed name, else <iri>."""
    best = None
    for pfx, ns in prefixes.items():
        if iri.startswith(ns) and (best is None or len(ns) > len(prefixes[best])):
            local = iri[len(ns):]
            if _PN_LOCAL_RE.match(local):
                best = pfx
    if best is None:
        return f"<{iri}>"
    return f"{best}:{iri[len(prefixes[best]):]}"


def _obj_tt(kind: str, value: str, lang, dt, prefixes) -> str:
    if kind == "literal":
        base = f'"{_escape(value)}"'
        if lang:
            return f"{base}@{lang}"
        if dt:
            return f"{base}^^{_compact(dt, prefixes)}"
        return base
    if kind == "bnode":
        return f"_:{encode_bnode_label(value)}"
    return _compact(value, prefixes)


def table_to_turtle(batch, prefixes: dict[str, str]) -> str:
    """One sorted Arrow/pandas triple table → a Turtle document string."""
    import pandas as pd

    g = batch if isinstance(batch, pd.DataFrame) else batch.to_pandas()
    g = g.sort_values(["subj", "pred", "obj_value"], kind="mergesort")
    out = [f"@prefix {p}: <{ns}> .\n" for p, ns in sorted(prefixes.items())]
    out.append("\n")
    cur_subj = None
    stanza: list[str] = []
    for r in g.itertuples():
        subj_tt = (
            f"_:{encode_bnode_label(r.subj)}"
            if r.subj_kind == "bnode"
            else _compact(r.subj, prefixes)
        )
        if subj_tt != cur_subj:
            if stanza:
                out.append(" ;\n".join(stanza) + " .\n")
            cur_subj = subj_tt
            stanza = []
        pred_tt = _compact(r.pred, prefixes)
        obj_tt = _obj_tt(r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype, prefixes)
        stanza.append(
            f"{subj_tt} {pred_tt} {obj_tt}" if not stanza else f"    {pred_tt} {obj_tt}"
        )
    if stanza:
        out.append(" ;\n".join(stanza) + " .\n")
    return "".join(out)


def write_turtle(triples_ds, out_dir: str, prefixes: dict[str, str] | None = None,
                 num_buckets: int = 16):
    """Triple-row Dataset → ``out_dir/part-<bucket>.ttl``: same subject-hash
    bucketing, deterministic in-bucket ordering and tmp+rename atomicity as
    write_ntriples — a crashed writer leaves no half-visible file."""
    import pandas as pd

    from ..stages.canonicalize import add_subj_bucket

    prefixes = dict(DEFAULT_PREFIXES if prefixes is None else prefixes)
    os.makedirs(out_dir, exist_ok=True)
    bucketed = triples_ds.map_batches(
        lambda t: add_subj_bucket(t, num_buckets), batch_format="pyarrow"
    )

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["subj_bucket"].iloc[0])
        doc = table_to_turtle(group, prefixes)
        tmp = os.path.join(out_dir, f".part-{bucket:05d}.ttl.tmp")
        final = os.path.join(out_dir, f"part-{bucket:05d}.ttl")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(doc)
        os.replace(tmp, final)
        return pd.DataFrame({"subj_bucket": [bucket], "n_triples": [len(group)]})

    return bucketed.groupby("subj_bucket").map_groups(write_bucket, batch_format="pandas")


# ------------------------------------------------------------------- reader

# Round 4: the reader is the GENERAL Turtle 1.1 parser (core/turtle.py —
# collections, `a`, @base, long literals, numeric/boolean shorthand,
# PN_LOCAL escapes…), of which the sink's emission is a strict subset.
from ..core.turtle import parse_turtle  # noqa: E402,F401  (re-export)


def read_turtle(paths):
    """.ttl file(s) → Dataset of triple rows (whole-file granularity: a
    Turtle doc's prefix decls scope the whole file, so the unit of work is
    one file — read_binary_files parallelizes across files)."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def decode(batch) -> "pa.Table":
        cols: dict[str, list] = {n: [] for n in TRIPLE_SCHEMA.names}
        for payload in batch["bytes"].to_pylist():
            for s, p, o in parse_turtle(payload.decode("utf-8")):
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
