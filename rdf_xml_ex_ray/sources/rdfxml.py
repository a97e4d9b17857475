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


# Above this size a file decodes via the incremental parser (expat +
# per-description pruning, decoder/streaming.py) instead of the tree parser:
# the tree/string overhead of a whole-document parse is a small multiple of
# the file size, so a multi-GB ontology dump must never take that path.
STREAMING_THRESHOLD = 8 * 1024 * 1024
FEED_CHUNK = 1 << 22  # 4 MiB expat feed granularity
ROWS_PER_OUTPUT_BATCH = 50_000

# Machine-checkable marker: a rejects row whose error starts with this means
# triples of the SAME doc_id were already emitted before the failure (only
# possible on the explicitly non-atomic paths) — consumers that require
# all-or-nothing documents must anti-join these doc_ids out.
PARTIAL_ERROR_PREFIX = "partial-document: "


def _doc_id_for(path: str) -> str:
    # doc_id must be collision-free across the whole input set: two files
    # with the same basename in different directories (a/x.rdf, b/x.rdf)
    # must NOT share blank-node namespaces or lineage — so the full path is
    # folded in via a crc32 suffix
    stem = os.path.splitext(os.path.basename(path))[0]
    return f"{stem}-{zlib.crc32(path.encode('utf-8')):08x}"


class _RowSink:
    """Accumulates triple rows and yields PARSE_OUT_SCHEMA tables in bounded
    batches (generator-UDF plumbing shared by the two sources below)."""

    def __init__(self):
        self.cols: dict[str, list] = {name: [] for name in PARSE_OUT_SCHEMA.names}
        self.n = 0

    def emit_triples(self, triples, doc_id: str):
        cols = self.cols
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
            cols["conv_id"].append(doc_id)
            cols["error"].append(None)
        self.n += len(triples)

    def emit_error(self, doc_id: str, err: str):
        cols = self.cols
        for name in PARSE_OUT_SCHEMA.names:
            cols[name].append(None)
        cols["conv_id"][-1] = doc_id
        cols["error"][-1] = err
        self.n += 1

    def drop_last_rows(self, k: int) -> None:
        """Retract the k most recently emitted rows (document-atomic error
        handling: a failed doc's pending rows must not reach the output)."""
        if k <= 0:
            return
        for name in PARSE_OUT_SCHEMA.names:
            del self.cols[name][-k:]
        self.n -= k

    def table(self) -> pa.Table:
        t = pa.table(self.cols, schema=PARSE_OUT_SCHEMA)
        self.cols = {name: [] for name in PARSE_OUT_SCHEMA.names}
        self.n = 0
        return t


def read_rdfxml(
    paths,
    base: str | None = None,
    bnode_prefix: str = "b",
    streaming_threshold: int = STREAMING_THRESHOLD,
    atomic_documents: bool = True,
):
    """Directory/glob of .rdf files → Dataset of triple rows (+ doc lineage).

    Blank-node labels are namespaced per file (``{stem}-{pathhash}!{prefix}{n}``)
    so the union over files stays globally collision-free — same scheme as the
    per-conversation allocation in the flagship.

    Files above ``streaming_threshold`` decode through the incremental parser
    (expat + per-description pruning) so worker memory never holds a parse
    tree.

    Invalid-document contract: with ``atomic_documents=True`` (default) a
    document either contributes ALL its triples or exactly one rejects row —
    regardless of file size (a streamed document's rows are held until its
    parse completes; memory is O(file bytes + that doc's triple rows)).
    ``atomic_documents=False`` restores free-flowing yields for streamed
    files — mid-document failures then leave already-yielded triples in the
    output and append a rejects row whose error starts with
    ``PARTIAL_ERROR_PREFIX``; consumers needing all-or-nothing documents
    MUST anti-join those doc_ids out.
    """
    import ray.data as rd

    from ..decoder.streaming import iter_parse_rdfxml

    ds = rd.read_binary_files(paths, include_paths=True)

    def decode_batch(batch: pa.Table):
        sink = _RowSink()
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            doc_id = _doc_id_for(path)
            doc_base = base if base is not None else f"file://{path}"
            bp = f"{doc_id}!{bnode_prefix}"
            if len(data) > streaming_threshold:
                mv = memoryview(data)
                chunks = (bytes(mv[i : i + FEED_CHUNK]) for i in range(0, len(mv), FEED_CHUNK))
                doc_rows = 0
                try:
                    for triples in iter_parse_rdfxml(chunks, base=doc_base, bnode_prefix=bp):
                        sink.emit_triples(triples, doc_id)
                        doc_rows += len(triples)
                        if not atomic_documents and sink.n >= ROWS_PER_OUTPUT_BATCH:
                            yield sink.table()
                except ParseError as e:
                    if atomic_documents:
                        # nothing yielded yet for this doc — retract its rows
                        sink.drop_last_rows(doc_rows)
                        sink.emit_error(doc_id, str(e))
                    else:
                        sink.emit_error(doc_id, f"{PARTIAL_ERROR_PREFIX}{e}")
            else:
                try:
                    sink.emit_triples(parse_rdfxml(data, base=doc_base, bnode_prefix=bp), doc_id)
                except ParseError as e:
                    sink.emit_error(doc_id, str(e))
            if sink.n >= ROWS_PER_OUTPUT_BATCH:
                yield sink.table()
        yield sink.table()

    return ds.map_batches(decode_batch, batch_format="pyarrow")


def read_rdfxml_streamed(
    paths: list[str],
    base: str | None = None,
    bnode_prefix: str = "b",
    feed_chunk: int = FEED_CHUNK,
):
    """Constant-memory variant of :func:`read_rdfxml` for very large files:
    one task per file, the file is read in ``feed_chunk`` slices through
    ``pyarrow.fs`` (local or remote URI) and fed straight into the
    incremental parser — at no point do the file bytes, the parse tree, or
    the triple set exist whole in memory. Worker RSS is O(feed chunk +
    largest description + one output batch).

    Constant memory forbids document-atomic buffering: a mid-document
    failure retracts the doc's not-yet-yielded rows, and if earlier batches
    of the doc were already yielded the rejects row's error carries
    ``PARTIAL_ERROR_PREFIX`` — anti-join those doc_ids for all-or-nothing
    semantics (or use :func:`read_rdfxml`, atomic by default)."""
    import ray.data as rd

    from ..decoder.streaming import iter_parse_rdfxml

    def decode_paths(batch: pa.Table):
        from pyarrow import fs as pafs

        for path in batch["path"].to_pylist():
            doc_id = _doc_id_for(path)
            doc_base = base if base is not None else f"file://{path}"
            filesystem, fs_path = pafs.FileSystem.from_uri(
                path if "://" in path else os.path.abspath(path)
            )
            sink = _RowSink()

            def chunk_iter():
                with filesystem.open_input_stream(fs_path) as f:
                    while True:
                        data = f.read(feed_chunk)
                        if not data:
                            return
                        yield data

            yielded_rows = 0
            try:
                for triples in iter_parse_rdfxml(
                    chunk_iter(), base=doc_base, bnode_prefix=f"{doc_id}!{bnode_prefix}"
                ):
                    sink.emit_triples(triples, doc_id)
                    if sink.n >= ROWS_PER_OUTPUT_BATCH:
                        yielded_rows += sink.n
                        yield sink.table()
            except ParseError as e:
                sink.drop_last_rows(sink.n)  # pending rows are all this doc's
                if yielded_rows:
                    sink.emit_error(doc_id, f"{PARTIAL_ERROR_PREFIX}{e}")
                else:
                    sink.emit_error(doc_id, str(e))
            yield sink.table()

    items = rd.from_items([{"path": p} for p in paths])
    # one file per task: each path's decode is sequential by nature, so the
    # parallel unit is the file (override_num_blocks at from_items default
    # already splits items one-per-block for small lists)
    return items.map_batches(decode_paths, batch_format="pyarrow", batch_size=1)


def derive_pred_prefixes(preds, base_prefixes):
    """Auto-derive ``ns1..nsK`` prefixes for predicate namespaces the
    base map misses — RDF/XML property elements REQUIRE QNames and the
    encoder raises on any unprefixed predicate, so derive (split at the
    last '#'/'/') rather than guess. Deterministic numbering over the
    sorted namespace list. Shared by the export CLI and
    sources/results.graph_document's rdf branch."""
    pfx = dict(base_prefixes)
    known = set(pfx.values())
    derived = set()
    for pred in preds:
        cut = max(pred.rfind("#"), pred.rfind("/")) + 1
        ns = pred[:cut]
        if cut and ns not in known:
            derived.add(ns)
    i = 1
    for ns in sorted(derived):
        while f"ns{i}" in pfx:  # never clobber a caller-supplied name
            i += 1
        pfx[f"ns{i}"] = ns
        i += 1
    return pfx


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

    Bucketing routes by BNODE SCOPE, not plain subject hash: rdf:nodeID
    identity is document-scoped (a conformant reader, including this
    repo's own decoder, re-mints labels per file), so a bnode's
    description and every triple referencing it MUST share a file. The
    engine's labels are '{scope}!b{k}' with bnode links never crossing a
    scope (parser-minted per conversation/document), so any triple
    touching a bnode routes by the label's scope prefix — co-locating
    whole bnode clusters — and pure-IRI triples route by subject (IRIs
    are global; their descriptions may span files freely). Labels with no
    '!' (external imports) route by the whole label: bnode-to-bnode
    links between DIFFERENT such labels could still split — out of
    contract for this sink, use the .nt export (label-preserving reader)
    for those stores. nodeID values are NCName-encoded
    (core/ntriples.ncname_bnode_label — BLANK_NODE_LABEL allows a
    leading digit, NCName does not).
    """
    import pandas as pd

    from ..core.ntriples import ncname_bnode_label
    from ..core.terms import escape_attr
    from ..encoder.encoder import XML_DECL, encode_description, ns_declaration_attrs
    from ..stages.canonicalize import add_crc32_bucket

    pfx = dict(DEFAULT_PREFIXES if prefixes is None else prefixes)
    os.makedirs(out_dir, exist_ok=True)
    decls = "".join(f' {n}="{escape_attr(v)}"' for n, v in ns_declaration_attrs(pfx, base, False))
    header = f"{XML_DECL}\n<rdf:RDF{decls}>\n"

    def _rebased(col):
        if col.num_chunks > 0:
            return pa.concat_arrays([c.cast(pa.string()) for c in col.chunks])
        return pa.array([], pa.string())

    def add_route_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        subj = _rebased(batch["subj"])
        objv = _rebased(batch["obj_value"])
        subj_scope = pc.list_element(
            pc.split_pattern(subj, pattern="!", max_splits=1), 0
        )
        obj_scope = pc.list_element(
            pc.split_pattern(objv, pattern="!", max_splits=1), 0
        )
        obj_bn = pc.equal(_rebased(batch["obj_kind"]), "bnode")
        subj_bn = pc.equal(_rebased(batch["subj_kind"]), "bnode")
        route = pc.if_else(
            obj_bn, obj_scope, pc.if_else(subj_bn, subj_scope, subj)
        )
        batch = batch.append_column("__route", route)
        batch = add_crc32_bucket(batch, "__route", num_buckets, "subj_bucket")
        return batch.drop_columns(["__route"])

    bucketed = triples_ds.map_batches(add_route_bucket, batch_format="pyarrow")

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        from .results import _row_terms

        bucket = int(group["subj_bucket"].iloc[0])
        lines = [header]
        ordered = group.sort_values(
            [
                "subj", "pred", "obj_value",
                "obj_lang", "obj_datatype", "obj_kind", "subj_kind",
            ],
            kind="mergesort",
        )
        for _subj_val, g in ordered.groupby("subj", sort=True):
            triples = _row_terms(g, bnode_encode=ncname_bnode_label)
            lines.append(
                encode_description(
                    triples[0][0], triples, base=base, prefixes=pfx
                )
                + "\n"
            )
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
