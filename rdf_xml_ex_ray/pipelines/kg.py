"""Flagship pipeline: transcripts → knowledge graph triple store.

Topology (SURVEY.md §3.4, all streaming — no mid-pipeline materialization):

    read_parquet(events, pruned columns)
    → map_batches(derive_turns_batch, pyarrow)          # vectorized derive
    → groupby(conv_id).map_groups(assemble_and_render)  # in-group turn sort
    → map_batches(ParseDocs, pyarrow, actor pool)       # striped parser
    → filter rejects
    → map_batches(EntityLinker, actor pool, broadcast registry)
    → canonicalize: bucket → per-bucket dedup + sort    # the one real shuffle
    → write_parquet(partition_cols=["subj_bucket"])     # resumable store

Scale notes: the only all-to-all exchanges are the conv_id groupby (inherent
to conversation assembly; groups are tiny) and the subject-hash bucket
groupby (pre-deduped per batch first). The linker registry is broadcast via
``ray.put`` once, read per actor in ``__init__``.
"""

from __future__ import annotations

import json
import os

import pyarrow.compute as pc

from ..stages.canonicalize import add_subj_bucket, bucket_metrics, canonicalize, prededup_batch
from ..stages.linker import EntityLinker, build_role_registry
from ..stages.parse import ParseDocs
from ..stages.render import assemble_and_render
from ..transcripts.derive import EVENT_COLUMNS, derive_turns_batch

TRIPLE_OUT_COLUMNS = [
    "subj",
    "subj_kind",
    "pred",
    "obj_kind",
    "obj_value",
    "obj_lang",
    "obj_datatype",
]


def read_transcript_turns(sf_dir: str):
    """events.parquet → un-indexed transcript turn rows (column-pruned read)."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=EVENT_COLUMNS)
    return ds.map_batches(derive_turns_batch, batch_format="pyarrow")


def render_documents(turns_ds):
    return turns_ds.groupby("conv_id").map_groups(assemble_and_render, batch_format="pandas")


def parse_documents(docs_ds, concurrency: int | tuple = (1, 8)):
    parsed = docs_ds.map_batches(
        ParseDocs,
        batch_format="pyarrow",
        batch_size=256,  # documents are wide rows (whole conversations)
        concurrency=concurrency,
    )
    return parsed.map_batches(
        lambda t: t.filter(pc.is_null(t["error"])).drop_columns(["error"]),
        batch_format="pyarrow",
    )


def link_entities(triples_ds, concurrency: int | tuple = (1, 4), registry_ref=None):
    if registry_ref is None:
        try:
            import ray

            registry_ref = ray.put(build_role_registry())
        except Exception:  # pragma: no cover - ray always present in practice
            registry_ref = None
    return triples_ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"registry_ref": registry_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def kg_triples_dataset(sf_dir: str, num_buckets: int = 16, keep_lineage: bool = False):
    """The full pipeline as a lazy Dataset of canonical triple rows."""
    turns = read_transcript_turns(sf_dir)
    docs = render_documents(turns)
    triples = parse_documents(docs)
    linked = link_entities(triples)
    canon = canonicalize(linked, num_buckets=num_buckets)
    drop = ["subj_bucket"] if keep_lineage else ["subj_bucket", "conv_id"]
    return canon.drop_columns(drop)


def kg_conv_stats(sf_dir: str):
    """Per-conversation stats straight off the turns (partial-agg friendly)."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.select(["conv_id", "tool"]).to_pandas()
        g = df.groupby("conv_id", sort=False).agg(
            n_turns=("conv_id", "size"), n_tool_calls=("tool", "count")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False).replace_schema_metadata(
            None
        )

    from ray.data.aggregate import Sum

    turns = read_transcript_turns(sf_dir)
    partials = turns.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("conv_id").aggregate(
        Sum("n_turns", alias_name="n_turns"), Sum("n_tool_calls", alias_name="n_tool_calls")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = pc.add(
            pc.add(1, pc.multiply(6, batch["n_turns"])), pc.multiply(3, batch["n_tool_calls"])
        )
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "n_turns": pc.cast(batch["n_turns"], pa.int64()),
                "n_tool_calls": pc.cast(batch["n_tool_calls"], pa.int64()),
                "n_triples": pc.cast(n, pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def kg_pred_counts(sf_dir: str):
    """Triple counts per predicate — combiner-style partial aggregation
    inside map_batches, then a tiny groupby over the partials."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("pred").aggregate([("pred", "count")])
        return t.rename_columns(["pred", "n_part"])

    from ray.data.aggregate import Sum

    ds = kg_triples_dataset(sf_dir).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby("pred").aggregate(Sum("n_part", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"pred": t["pred"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow",
    )


def kg_roundtrip_dataset(sf_dir: str, num_buckets: int = 16):
    """Encode→decode roundtrip over the bnode-free sub-graph: canonical
    triples → per-subject RDF/XML (encoder) → reparse (decoder) →
    canonicalize. Output must equal the bnode-free flagship triples —
    the encoder's distributed correctness check."""
    import pandas as pd
    import pyarrow as pa

    from ..core.model import row_to_term
    from ..core.terms import IRI, RDF_NS
    from ..encoder.encoder import XML_DECL, encode_description
    from ..transcripts.ontology import CT_NS

    prefixes = {"rdf": RDF_NS, "ct": CT_NS}
    header = f'{XML_DECL}<rdf:RDF xmlns:ct="{CT_NS}" xmlns:rdf="{RDF_NS}">'

    base = kg_triples_dataset(sf_dir, num_buckets=num_buckets)
    nob = base.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["subj_kind"], "iri"), pc.not_equal(t["obj_kind"], "bnode"))
        ),
        batch_format="pyarrow",
    )

    def encode_group(g: pd.DataFrame) -> pd.DataFrame:
        subj = IRI(g["subj"].iloc[0])
        triples = [
            (
                subj,
                IRI(r.pred),
                row_to_term(r.obj_kind, r.obj_value, r.obj_lang, r.obj_datatype),
            )
            for r in g.itertuples()
        ]
        doc = header + encode_description(subj, triples, prefixes=prefixes) + "</rdf:RDF>"
        return pd.DataFrame({"conv_id": [str(subj)], "doc": [doc]})

    docs = nob.groupby("subj").map_groups(encode_group, batch_format="pandas")
    reparsed = parse_documents(docs)
    return canonicalize(reparsed, num_buckets=num_buckets).drop_columns(
        ["subj_bucket", "conv_id"]
    )


def run_kg_job(
    sf_dir: str,
    out_dir: str,
    num_buckets: int = 16,
    resume: bool = True,
) -> dict:
    """Materialize the triple store with per-partition lineage + resume.

    Layout (resumable, north_rule):
        out_dir/triples/subj_bucket=N/*.parquet   (the store)
        out_dir/lineage.json                      (per-partition metrics)
        out_dir/_SUCCESS                          (job done marker)
    """
    success = os.path.join(out_dir, "_SUCCESS")
    lineage_path = os.path.join(out_dir, "lineage.json")
    if resume and os.path.exists(success):
        with open(lineage_path) as f:
            return json.load(f)

    os.makedirs(out_dir, exist_ok=True)
    turns = read_transcript_turns(sf_dir)
    docs = render_documents(turns)
    triples = parse_documents(docs)
    linked = link_entities(triples)
    canon = canonicalize(linked, num_buckets=num_buckets)

    canon.write_parquet(os.path.join(out_dir, "triples"), partition_cols=["subj_bucket"])

    import ray.data as rd

    store = rd.read_parquet(os.path.join(out_dir, "triples"))
    metrics = (
        store.groupby("subj_bucket").map_groups(bucket_metrics, batch_format="pandas").take_all()
    )
    lineage = {
        "sf_dir": sf_dir,
        "num_buckets": num_buckets,
        "n_triples": int(sum(m["n_triples"] for m in metrics)),
        "partitions": [
            {k: int(v) for k, v in m.items()} for m in sorted(metrics, key=lambda m: m["subj_bucket"])
        ],
    }
    with open(lineage_path, "w") as f:
        json.dump(lineage, f, indent=1)
    with open(success, "w") as f:
        f.write("ok\n")
    return lineage
