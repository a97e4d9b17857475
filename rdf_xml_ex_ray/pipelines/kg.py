"""Flagship pipeline: transcripts → knowledge graph triple store.

Topology (SURVEY.md §3.4, all streaming — no mid-pipeline materialization):

    read_parquet(events, pruned columns, pinned block count)
    → map_batches(derive_turns_batch, pyarrow)            # vectorized derive
    → groupby(conv_bucket).map_groups(assemble+render)    # THE shuffle
    → map_batches(parse → link → dedup+sort, fused tasks) # striped parser
    → write_parquet(partition_cols=["subj_bucket"])       # resumable store

Scale notes: the flagship needs exactly ONE all-to-all exchange, keyed on a
fixed-cardinality conversation bucket (crc32(conv_id) % B, not the raw key)
so Ray's per-group dispatch overhead is O(buckets) however many
conversations exist. Subjects are conversation-scoped, so that shuffle
already co-partitions subjects and dedup + (subj, pred, obj) sort run per
partition (see kg_triples_dataset; the general subject-hash canonicalization
shuffle remains in stages/canonicalize.py for multi-document subjects). The
linker registry is broadcast via ``ray.put`` once, resolved once per worker.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.compute as pc

from ..stages.canonicalize import add_subj_bucket, bucket_metrics, canonicalize
from ..stages.linker import EntityLinker, build_role_registry
from ..stages.parse import ParseDocs
from ..stages.render import assemble_and_render_bucket
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


def read_transcript_turns(sf_dir: str, num_blocks: int | None = None):
    """events.parquet → un-indexed transcript turn rows (column-pruned read).

    ``num_blocks`` pins the block count at the source: every downstream sort
    exchange moves O(map_blocks × reduce_blocks) objects, so blocks should
    track the CPU count, not Ray's tiny-block auto-split of a small file.
    """
    import ray.data as rd

    kwargs = {"override_num_blocks": num_blocks} if num_blocks else {}
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=EVENT_COLUMNS, **kwargs
    )
    return ds.map_batches(derive_turns_batch, batch_format="pyarrow")


def render_documents(turns_ds, num_conv_buckets: int = 64):
    """Conversation assembly: ONE shuffle keyed on a conversation bucket
    (crc32(conv_id) % B) — co-locates whole conversations while keeping the
    group count at B, so Ray's per-group dispatch overhead stays fixed as
    the number of conversations grows. Keying is dictionary-encoded
    (stages/canonicalize.add_crc32_bucket): conv_ids repeat ~6-15× per
    batch, so crc32 runs once per distinct conversation, not per row."""
    from ..stages.canonicalize import add_crc32_bucket

    def add_conv_bucket(batch):
        return add_crc32_bucket(batch, "conv_id", num_conv_buckets, "conv_bucket")

    bucketed = turns_ds.map_batches(add_conv_bucket, batch_format="pyarrow")
    return bucketed.groupby("conv_bucket").map_groups(
        assemble_and_render_bucket, batch_format="pandas"
    )


def parse_documents(docs_ds):
    # the parser is pure (no per-actor state) → stateless tasks, which are
    # elastic and skip actor-pool startup latency; the stateful-stage pattern
    # lives in EntityLinker (broadcast registry → actor pool)
    parser = ParseDocs()

    def parse_and_filter(t):
        out = parser(t)
        return out.filter(pc.is_null(out["error"])).drop_columns(["error"])

    return docs_ds.map_batches(
        parse_and_filter,
        batch_format="pyarrow",
        batch_size=256,  # documents are wide rows (whole conversations)
    )


_PROCESS_LINKER: EntityLinker | None = None


def link_entities(triples_ds, registry_ref=None):
    """Entity linking as a task stage over the broadcast registry.

    The registry ships once via ``ray.put``; each worker process resolves it
    once (module-level cache) — the guide's broadcast-lookup pattern. Task
    form (vs an actor pool) lets Ray fuse render→parse→link into one stage
    at full cluster parallelism: an actor pool here would cap the fused
    chain at the pool size and pay its autoscale ramp.
    """
    if registry_ref is None:
        try:
            import ray

            if ray.is_initialized():
                registry_ref = ray.put(build_role_registry())
        except Exception:  # pragma: no cover - ray always present in practice
            registry_ref = None

    def link_batch(batch):
        global _PROCESS_LINKER
        if _PROCESS_LINKER is None:
            _PROCESS_LINKER = EntityLinker(registry_ref)
        return _PROCESS_LINKER(batch)

    return triples_ds.map_batches(link_batch, batch_format="pyarrow")


def replicate_turns(turns_ds, replicas: int):
    """Emit `replicas` conversation-salted copies of every batch (benchmark
    scaling aid: conv_id gets a per-replica suffix, so every replica is an
    independent conversation space and triple counts scale exactly ×K).
    In-stage replication — one read, one operator — rather than a K-way
    ``union``, whose K planning branches add fixed per-run stall."""
    import pyarrow as pa

    if replicas <= 1:
        return turns_ds

    def salt_k(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("conv_id")
        copies = []
        for i in range(replicas):
            salted = pc.cast(
                pc.binary_join_element_wise(batch["conv_id"], pa.scalar(f"r{i}"), ""),
                pa.string(),
            )
            copies.append(batch.set_column(idx, "conv_id", salted))
        return pa.concat_tables(copies)

    return turns_ds.map_batches(salt_k, batch_format="pyarrow")


def _default_parallelism() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(4, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:  # pragma: no cover
        pass
    return 8


# Per-task budget for the fused render→parse→link→dedup chain. Blocks are
# sized to this so the straggler tail stays a small fraction of the wall;
# a fixed block count anti-scales — grow the input 3× and each task grows
# 3×, and the skewest block alone sets the wall (measured: 23M triples over
# 64 blocks = 935k triples/s vs 1.06M at 128 blocks, 32 CPUs).
TARGET_TURNS_PER_BLOCK = 25_000


def _scaled_num_blocks(sf_dir: str, replicas: int, parallelism: int) -> int:
    """Read block count for the flagship: floor of 3×CPUs (pool packing),
    scaled up with the *actual* input size (parquet footer metadata — no
    data read), capped at 8×CPUs. The cap bounds the sort exchange, which
    moves O(map_blocks × reduce_partitions) objects and Ray's sort uses
    reduce_partitions = map_blocks — at 16×CPUs (512×512 at 32 CPUs) the
    exchange cost anti-scaled the wall ~25% vs 8×CPUs (measured, ×24
    replicas). The floor was 2×CPUs through round 3; the fused
    render→parse→link→dedup stage shows a 1.1-5.5 s per-task spread from
    quantile-partition skew, and at 2 waves the skewest task alone sets
    the wall — 3 waves of smaller tasks pack the tail better (measured
    r4, ×12 replicas interleaved best-of-3: 64 blocks 11.40 s,
    96 blocks 10.58 s, 128 blocks 10.40 s at 32 CPUs)."""
    import pyarrow.parquet as pq

    try:
        base_rows = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    except Exception:  # pragma: no cover - non-parquet/custom layouts
        base_rows = 0
    desired = (base_rows * max(1, replicas)) // TARGET_TURNS_PER_BLOCK
    return int(max(3 * parallelism, min(desired, 8 * parallelism)))


def kg_triples_dataset(
    sf_dir: str,
    num_buckets: int = 16,
    keep_lineage: bool = False,
    replicas: int = 1,
    parallelism: int | None = None,
    co_partitioned: bool = True,
    turn_filter=None,
):
    """The full pipeline as a lazy Dataset of canonical triple rows.

    ``parallelism`` pins the block count entering the shuffle (default:
    cluster CPU count). Sort exchanges move O(map_blocks × reduce_blocks)
    objects; letting Ray auto-split a small input into hundreds of tiny
    blocks makes the exchange latency-bound.

    ``co_partitioned=True`` (default) exploits two flagship invariants:
    every subject IRI/bnode embeds its conv_id (conv/turn/bnode IRIs are all
    conversation-scoped) and the renderer never emits a duplicate triple
    within a conversation (so the parse stage's MultiGraph fast path is
    duplicate-free too). After the conversation-bucket shuffle all triples
    of a subject sit in one partition and cross-partition duplicates are
    impossible — dedup and the (subj, pred, obj) sort run per partition
    with NO second exchange.
    For graphs whose subjects span documents (e.g. the read_rdfxml source),
    pass ``co_partitioned=False`` for the general subject-hash
    canonicalization shuffle (stages/canonicalize.py).
    """
    if parallelism is None:
        parallelism = _default_parallelism()
    num_blocks = _scaled_num_blocks(sf_dir, replicas, parallelism)
    turns = replicate_turns(read_transcript_turns(sf_dir, num_blocks), replicas)
    if turn_filter is not None:
        # conversation-partition selector (whole convs only — subjects are
        # conv-scoped, so any conv-complete subset keeps canonical output
        # per conversation identical); powers kg_incremental
        turns = turns.map_batches(turn_filter, batch_format="pyarrow")
    # ~2 conv-buckets per block. Ray's sort range-partitions into
    # reduce_partitions = map_blocks, so bucket count must NEVER drop below
    # the block count — a round-3 experiment that capped buckets at 12×CPUs
    # (0.75 buckets/partition at ×24 replicas) left partitions empty and
    # anti-scaled the wall 36%. Finer granularity (8×blocks) trades the
    # ~±50% per-task quantile skew for per-group dispatch + sampling cost
    # and measures NET SLOWER in fresh runs (9.0 vs 8.0 s at ×12) — keep 2×.
    docs = render_documents(turns, num_conv_buckets=2 * num_blocks)
    triples = parse_documents(docs)
    linked = link_entities(triples)
    if co_partitioned:
        from ..stages.canonicalize import dedup_sort_table

        def dedup_sort_block(batch):
            return dedup_sort_table(add_subj_bucket(batch, num_buckets))

        canon = linked.map_batches(dedup_sort_block, batch_format="pyarrow", batch_size=None)
    else:
        canon = canonicalize(linked, num_buckets=num_buckets)
    if keep_lineage:
        return canon
    return canon.drop_columns(["subj_bucket", "conv_id"])


def kg_triples_from_transcripts(
    transcripts_ds,
    num_buckets: int = 16,
    num_conv_buckets: int = 64,
    keep_lineage: bool = False,
):
    """Pipeline entry for an input_hint-shaped transcripts table
    (conv_id, turn_idx:int32, role, text, tool, ts:timestamp[us]) — what a
    user with real transcript parquet feeds in directly. Same topology as
    the flagship; ordering comes from the explicit (conv_id, turn_idx)."""
    from ..stages.canonicalize import add_crc32_bucket, dedup_sort_table
    from ..stages.render import assemble_and_render_bucket_by_turn_idx

    def add_conv_bucket(batch):
        return add_crc32_bucket(batch, "conv_id", num_conv_buckets, "conv_bucket")

    docs = (
        transcripts_ds.map_batches(add_conv_bucket, batch_format="pyarrow")
        .groupby("conv_bucket")
        .map_groups(assemble_and_render_bucket_by_turn_idx, batch_format="pandas")
    )
    linked = link_entities(parse_documents(docs))

    def dedup_sort_block(batch):
        return dedup_sort_table(add_subj_bucket(batch, num_buckets))

    canon = linked.map_batches(dedup_sort_block, batch_format="pyarrow", batch_size=None)
    if keep_lineage:
        return canon
    return canon.drop_columns(["subj_bucket", "conv_id"])


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


def kg_top_entities(sf_dir: str, k: int = 10):
    """Top-k most-referenced entity IRIs (object position): per-batch partial
    counts → small groupby → global sort + limit. Deterministic tiebreak on
    the entity IRI."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    ds = kg_triples_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        iris = batch.filter(pc.equal(batch["obj_kind"], "iri"))
        agg = iris.group_by("obj_value").aggregate([("obj_value", "count")])
        return agg.rename_columns(["entity", "n_part"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("entity")
        .aggregate(Sum("n_part", alias_name="n"))
    )
    top = counts.sort(["n", "entity"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: pa.table({"entity": t["entity"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow",
    )


def kg_roundtrip_dataset(sf_dir: str, num_buckets: int | None = None):
    """Encode→decode roundtrip over the bnode-free sub-graph: canonical
    triples → per-subject RDF/XML (encoder) → reparse (decoder) →
    canonicalize. Output must equal the bnode-free flagship triples —
    the encoder's distributed correctness check.

    ``num_buckets`` (= encode-document count = encode parallelism) defaults
    to 2× cluster CPUs — never a constant cap (the round-2 verdict's
    16-group encode ceiling); the canonical output is bucket-count
    invariant, so the oracle is unaffected."""
    import pandas as pd
    import pyarrow as pa

    from ..core.model import row_to_term
    from ..core.terms import IRI, RDF_NS
    from ..encoder.encoder import XML_DECL, encode_description
    from ..stages.broadcast import cluster_cpus
    from ..transcripts.ontology import CT_NS

    if num_buckets is None:
        num_buckets = max(16, 2 * cluster_cpus())

    prefixes = {"rdf": RDF_NS, "ct": CT_NS}
    header = f'{XML_DECL}<rdf:RDF xmlns:ct="{CT_NS}" xmlns:rdf="{RDF_NS}">'

    base = kg_triples_dataset(sf_dir, num_buckets=num_buckets, keep_lineage=True)
    nob = base.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["subj_kind"], "iri"), pc.not_equal(t["obj_kind"], "bnode"))
        ),
        batch_format="pyarrow",
    )

    def encode_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one document per subject-hash bucket, one description per subject —
        # the streaming encoder layout (encoder.ex:94-123), bucket-granular so
        # the group count stays O(num_buckets). Subject runs are found on
        # sorted numpy arrays (no pandas groupby/itertuples in the loop).
        bucket = int(g["subj_bucket"].iloc[0])
        g = g.sort_values("subj", kind="mergesort")
        subj_v = g["subj"].to_numpy()
        pred_v = g["pred"].to_numpy()
        kind_v = g["obj_kind"].to_numpy()
        val_v = g["obj_value"].to_numpy()
        lang_v = g["obj_lang"].to_numpy()
        dt_v = g["obj_datatype"].to_numpy()
        starts = np.flatnonzero(np.r_[True, subj_v[1:] != subj_v[:-1]])
        ends = np.r_[starts[1:], len(subj_v)]
        parts = [header]
        for s, e in zip(starts, ends):
            subj = IRI(subj_v[s])
            triples = [
                (subj, IRI(pred_v[i]), row_to_term(kind_v[i], val_v[i], lang_v[i], dt_v[i]))
                for i in range(s, e)
            ]
            parts.append(encode_description(subj, triples, prefixes=prefixes))
        parts.append("</rdf:RDF>")
        return pd.DataFrame({"conv_id": [f"bucket{bucket}"], "doc": ["".join(parts)]})

    docs = nob.groupby("subj_bucket").map_groups(encode_bucket, batch_format="pandas")
    reparsed = parse_documents(docs)
    return canonicalize(reparsed, num_buckets=num_buckets).drop_columns(
        ["subj_bucket", "conv_id"]
    )


def kg_skew_canonicalize(sf_dir: str, num_buckets: int | None = None):
    """Multi-document-subject canonicalization through the GENERAL two-phase
    skew-aware shuffle (stages/canonicalize.canonicalize_skew_aware) — the
    path graphs take when subjects span documents and the flagship's
    co-partitioned fast path is invalid.

    Input construction forces exactly that shape: the bnode-free flagship
    sub-graph is re-encoded into RDF/XML documents bucketed by PREDICATE
    hash (every subject's description scatters across up to |preds|
    documents), and every triple is emitted into TWO documents — real
    cross-document duplicates that only the global dedup exchange can
    remove. After reparse + skew-aware canonicalization the result must
    equal the roundtrip oracle (KG_TRIPLES_NOBNODE_SQL): equality proves
    the triple-hash dedup phase + subject-bucket sort phase reproduce the
    canonical store without the conversation-scoping invariant."""
    import zlib

    import pandas as pd
    import pyarrow as pa

    from ..core.model import row_to_term
    from ..core.terms import IRI, RDF_NS
    from ..encoder.encoder import XML_DECL, encode_description
    from ..stages.broadcast import cluster_cpus
    from ..stages.canonicalize import canonicalize_skew_aware
    from ..transcripts.ontology import CT_NS

    if num_buckets is None:
        num_buckets = max(16, 2 * cluster_cpus())

    prefixes = {"rdf": RDF_NS, "ct": CT_NS}
    header = f'{XML_DECL}<rdf:RDF xmlns:ct="{CT_NS}" xmlns:rdf="{RDF_NS}">'

    base = kg_triples_dataset(sf_dir, num_buckets=num_buckets, keep_lineage=True)
    nob = base.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["subj_kind"], "iri"), pc.not_equal(t["obj_kind"], "bnode"))
        ),
        batch_format="pyarrow",
    )

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        # two copies of every triple, in adjacent predicate-hash buckets
        import numpy as np

        preds = batch["pred"].to_pylist()
        h = np.fromiter(
            (zlib.crc32(p.encode()) for p in preds), dtype=np.int64, count=len(preds)
        )
        both = pa.concat_tables([batch, batch])
        bucket = np.concatenate([h % num_buckets, (h + 1) % num_buckets]).astype(np.int32)
        return both.append_column("doc_bucket", pa.array(bucket, pa.int32()))

    def encode_doc(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["doc_bucket"].iloc[0])
        g = g.sort_values(["subj", "pred", "obj_value"], kind="mergesort")
        subj_v = g["subj"].to_numpy()
        starts = np.flatnonzero(np.r_[True, subj_v[1:] != subj_v[:-1]])
        ends = np.r_[starts[1:], len(subj_v)]
        pred_v = g["pred"].to_numpy()
        kind_v = g["obj_kind"].to_numpy()
        val_v = g["obj_value"].to_numpy()
        lang_v = g["obj_lang"].to_numpy()
        dt_v = g["obj_datatype"].to_numpy()
        parts = [header]
        for s, e in zip(starts, ends):
            subj = IRI(subj_v[s])
            triples = [
                (subj, IRI(pred_v[i]), row_to_term(kind_v[i], val_v[i], lang_v[i], dt_v[i]))
                for i in range(s, e)
            ]
            parts.append(encode_description(subj, triples, prefixes=prefixes))
        parts.append("</rdf:RDF>")
        return pd.DataFrame({"conv_id": [f"pbucket{bucket}"], "doc": ["".join(parts)]})

    docs = (
        nob.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("doc_bucket")
        .map_groups(encode_doc, batch_format="pandas")
    )
    reparsed = parse_documents(docs)
    return canonicalize_skew_aware(reparsed, num_buckets=num_buckets).drop_columns(
        ["subj_bucket", "conv_id"]
    )


def run_kg_job(
    sf_dir: str,
    out_dir: str,
    num_buckets: int = 16,
    resume: bool = True,
) -> dict:
    """Materialize the triple store, checkpoint-resumable at each stage
    boundary (north_rule), with per-partition lineage.

    Layout:
        out_dir/docs/…              stage 1: rendered conversation documents
        out_dir/docs/_SUCCESS
        out_dir/triples/subj_bucket=N/*.parquet   stage 2: canonical store
        out_dir/lineage.json        per-partition metrics
        out_dir/_SUCCESS            job done marker

    A rerun after a stage-2 crash skips stage 1 entirely (reads the
    checkpointed docs); a rerun after success returns the recorded lineage.
    """
    import ray.data as rd

    success = os.path.join(out_dir, "_SUCCESS")
    lineage_path = os.path.join(out_dir, "lineage.json")
    if resume and os.path.exists(success):
        with open(lineage_path) as f:
            return json.load(f)

    os.makedirs(out_dir, exist_ok=True)

    # We are (re)running: the job-level success markers from any previous
    # run are stale the moment stage outputs start changing — drop them
    # first, or a crash mid-rerun would leave _SUCCESS pointing at a store
    # that no longer exists and the next resume would return stale lineage.
    for marker in (success, lineage_path):
        if os.path.exists(marker):
            os.remove(marker)

    # ---- stage 1: derive + assemble + render (shuffle lives here) ----
    # Crash-safety invariant: write_parquet APPENDS uuid-named files, so an
    # incomplete stage dir (no _SUCCESS) must be cleared before re-running —
    # otherwise stale partial files from the crashed attempt sit beside the
    # fresh ones and silently duplicate rows downstream.
    import shutil

    docs_dir = os.path.join(out_dir, "docs")
    docs_done = os.path.join(docs_dir, "_SUCCESS")
    if not (resume and os.path.exists(docs_done)):
        shutil.rmtree(docs_dir, ignore_errors=True)
        parallelism = _default_parallelism()
        turns = read_transcript_turns(sf_dir, 2 * parallelism)
        docs = render_documents(turns, num_conv_buckets=4 * parallelism)
        docs.write_parquet(docs_dir)
        with open(docs_done, "w") as f:
            f.write("ok\n")

    # ---- stage 2: parse + link + canonicalize + store ----
    # reaching here means the job-level _SUCCESS is absent → any existing
    # stage-2 output is a partial write from a crashed attempt: clear it
    for partial in ("triples", "rejects"):
        shutil.rmtree(os.path.join(out_dir, partial), ignore_errors=True)
    docs = rd.read_parquet(docs_dir)
    # materialized: both the rejects sink and the store consume this once
    # (object-store pinned at the stage boundary; spills under pressure)
    parsed = docs.map_batches(ParseDocs(), batch_format="pyarrow", batch_size=256).materialize()
    rejects = parsed.map_batches(
        lambda t: t.filter(pc.is_valid(t["error"])).select(["conv_id", "error"]),
        batch_format="pyarrow",
    )
    n_rejects = rejects.count()
    if n_rejects:
        rejects.write_parquet(os.path.join(out_dir, "rejects"))
    triples = parsed.map_batches(
        lambda t: t.filter(pc.is_null(t["error"])).drop_columns(["error"]),
        batch_format="pyarrow",
    )
    linked = link_entities(triples)
    import pyarrow as pa

    from ..stages.canonicalize import dedup_sort_table

    def dedup_sort_block(batch: pa.Table) -> pa.Table:
        return dedup_sort_table(add_subj_bucket(batch, num_buckets))

    canon = linked.map_batches(dedup_sort_block, batch_format="pyarrow", batch_size=None)
    canon.write_parquet(os.path.join(out_dir, "triples"), partition_cols=["subj_bucket"])

    import ray.data as rd

    store = rd.read_parquet(os.path.join(out_dir, "triples"))
    metrics = (
        store.groupby("subj_bucket").map_groups(bucket_metrics, batch_format="pandas").take_all()
    )
    lineage = {
        "sf_dir": sf_dir,
        "num_buckets": num_buckets,
        "n_rejected_docs": int(n_rejects),
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


# ------------------------------------------------------------ kg_incremental

INCR_DELTA_MOD = 10  # user_id % 10 == 0 conversations form the "delta"


def kg_incremental(sf_dir: str, delta_mod: int = INCR_DELTA_MOD):
    """Partition-level incremental maintenance: the triple store rebuilt as
    BASE (conversations whose user_id % delta_mod != 0) plus an
    independently-processed DELTA partition (the rest), unioned — byte-equal
    to one full build, which is exactly what lets a 100 TB store re-ingest a
    changed conversation subset by deleting + rebuilding only its
    partitions (the ``rdf_xml_ex_ray kg`` job's checkpoint/resume relies on
    the same conversation-separability invariant).

    Oracle: the flagship KG_TRIPLES_SQL itself — equality IS the
    incremental-correctness statement."""
    base = kg_triples_dataset(sf_dir, turn_filter=_uid_partition(False, delta_mod))
    delta = kg_triples_dataset(sf_dir, turn_filter=_uid_partition(True, delta_mod))
    return base.union(delta)


def _uid_partition(keep_delta: bool, delta_mod: int):
    """Conversation-partition selector on user_id % delta_mod (whole convs
    only — shared by kg_incremental and kg_store_diff)."""
    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        # conv_id = 'c' || user_id (transcripts/derive.py): slice off the
        # tag, split any '!'-suffixed scope, cast — all Arrow kernels
        # (was a per-row int(c[1:].split(...)) Python loop)
        tail = pc.utf8_slice_codeunits(batch["conv_id"], 1)
        first = pc.list_element(pc.split_pattern(tail, "!", max_splits=1), 0)
        uid = pc.cast(first, pa.int64()).to_numpy(zero_copy_only=False)
        mask = (uid % delta_mod == 0) if keep_delta else (uid % delta_mod != 0)
        return batch.filter(pa.array(mask))

    return f


def kg_store_diff(sf_dir: str, delta_mod: int = INCR_DELTA_MOD):
    """Distributed diff of two canonical triple stores — the audit primitive
    for incremental maintenance: diff(full_build, base_build) must be
    exactly the delta partition's triples, all tagged 'added' (the base is
    a subset of the full build by construction; a nonzero 'removed' side
    here would mean canonicalization is not conversation-separable).

    Shape: both stores stream through ONE subject-bucket exchange (a
    duplicate row always shares its subject, hence its bucket); each group
    does a full-row anti-join both ways (pandas outer merge, nulls
    sentinel-coded because pandas merge keys never match NaN to NaN). No
    driver-side row set at any size — the diff of two 100 TB stores moves
    each store once."""
    import pandas as pd
    import pyarrow as pa

    from ..stages.canonicalize import add_crc32_bucket

    new = kg_triples_dataset(sf_dir)
    old = kg_triples_dataset(sf_dir, turn_filter=_uid_partition(False, delta_mod))

    def tag(role: int):
        def f(batch: pa.Table) -> pa.Table:
            t = add_crc32_bucket(batch, "subj", 64, "__bucket")
            return t.append_column(
                "__role", pa.array(np.full(t.num_rows, role, dtype=np.int8))
            )
        return f

    SENT = "\x00"
    out_schema = pa.schema(
        [("change", pa.string())] + [(c, pa.string()) for c in TRIPLE_OUT_COLUMNS]
    )

    def diff_group(g: pd.DataFrame) -> pa.Table:
        cols = TRIPLE_OUT_COLUMNS
        a = g.loc[g["__role"] == 1, cols].fillna(SENT)
        b = g.loc[g["__role"] == 2, cols].fillna(SENT)
        m = a.merge(b, how="outer", on=cols, indicator=True)
        frames = []
        for change, side in (("added", "left_only"), ("removed", "right_only")):
            part = m.loc[m["_merge"] == side, cols].copy()
            part.insert(0, "change", change)
            frames.append(part)
        out = pd.concat(frames, ignore_index=True).replace({SENT: None})
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    union = new.map_batches(tag(1), batch_format="pyarrow").union(
        old.map_batches(tag(2), batch_format="pyarrow")
    )
    return union.groupby("__bucket").map_groups(diff_group, batch_format="pandas")


# ------------------------------------------------------------------ kg_quads

# Named-graph (quad) view of the flagship KG: every triple goes into the
# named graph of the conversation that owns its subject (subjects embed
# conv_id — conv/turn IRIs carry it in the path, toolUse bnode labels in
# the '{conv_id}!b{k}' prefix). This is the RDF-dataset shape the N-Quads
# sink/store partitions by, and the provenance primitive for per-document
# KG lineage. Derivation is pure Arrow (split on '/' / '!'), no row loop.
from .oracle import KG_TRIPLES_SQL  # noqa: E402  (appended section)

_CONV_IRI_PREFIX = "http://example.org/conv/"

KG_QUADS_SQL = f"""
SELECT subj, subj_kind, pred, obj_kind, obj_value, obj_lang, obj_datatype,
       '{_CONV_IRI_PREFIX}' ||
         CASE WHEN subj_kind = 'bnode' THEN split_part(subj, '!', 1)
              ELSE split_part(replace(subj, '{_CONV_IRI_PREFIX}', ''), '/', 1)
         END AS graph,
       'iri' AS graph_kind
FROM ( {KG_TRIPLES_SQL} ) AS base
"""


def add_conv_graph(batch):
    """Triple rows → quad rows: per-conversation named graph derived from
    the subject (pure Arrow; shared by kg_quads and the export CLI)."""
    import pyarrow as pa

    subj = batch["subj"].cast(pa.string())
    bnode_conv = pc.list_element(pc.split_pattern(subj, "!"), 0)
    stripped = pc.replace_substring(subj, _CONV_IRI_PREFIX, "")
    iri_conv = pc.list_element(pc.split_pattern(stripped, "/"), 0)
    conv = pc.if_else(pc.equal(batch["subj_kind"], "bnode"), bnode_conv, iri_conv)
    graph = pc.binary_join_element_wise(
        pa.array([_CONV_IRI_PREFIX] * batch.num_rows, pa.string()), conv, ""
    )
    return batch.append_column("graph", graph).append_column(
        "graph_kind", pa.repeat("iri", batch.num_rows)
    )


def kg_quads(sf_dir: str):
    """Quad-row Dataset: flagship triples + per-conversation named graph."""
    return kg_triples_dataset(sf_dir).map_batches(add_conv_graph, batch_format="pyarrow")
