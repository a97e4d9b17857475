"""Ray stage: triple canonicalization — the wide step of the pipeline.

Hash-partition on subject (stable crc32 bucket — NOT Python ``hash``, which
is salted per process), then per-bucket exact dedup + (subj, pred, obj) sort.
A duplicate triple always shares its subject, hence its bucket, so per-bucket
dedup is globally exact. Determinism comes from data only: same input →
same buckets → same sorted partitions, regardless of task order/retries.

Skew note (north_star): hot *subjects* concentrate a bucket. Rendered
transcripts have uniformly distributed subjects (conv/turn/bnode IRIs —
hot entities like roles appear only as objects), so the default is
unsalted; ``num_buckets`` scales the shuffle fan-out, and a per-batch
pre-dedup (set-semantics restore) shrinks the exchange before it happens.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


SORT_KEYS = ["subj", "pred", "obj_kind", "obj_value", "obj_lang", "obj_datatype"]


def add_crc32_bucket(batch: pa.Table, col: str, num_buckets: int, out_col: str) -> pa.Table:
    """Append ``out_col`` = crc32(batch[col]) % num_buckets (stable across
    processes — NOT Python ``hash``, which is salted). Key values repeat
    heavily in every caller (subjects ~6-9 triples each, conv_ids ~6-15
    turns each), so dictionary-encode first and crc32 only the distinct
    values — the Python loop runs once per unique key, not per row."""
    arr = batch[col].combine_chunks()
    dict_arr = pc.dictionary_encode(arr)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    uniq = dict_arr.dictionary.to_pylist()
    uniq_buckets = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) % num_buckets for s in uniq),
        dtype=np.int32,
        count=len(uniq),
    )
    buckets = pa.array(uniq_buckets, pa.int32()).take(dict_arr.indices)
    return batch.append_column(out_col, buckets)


def add_subj_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    return add_crc32_bucket(batch, "subj", num_buckets, "subj_bucket")


def prededup_batch(batch: pa.Table) -> pa.Table:
    """Cheap in-batch set-semantics restore before the shuffle (combiner)."""
    df = batch.to_pandas()
    return pa.Table.from_pandas(
        df.drop_duplicates(subset=SORT_KEYS), preserve_index=False
    ).replace_schema_metadata(None)


def dedup_sort_group(group: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket global dedup + deterministic (subj, pred, obj) sort."""
    out = group.drop_duplicates(subset=SORT_KEYS).sort_values(SORT_KEYS, kind="mergesort")
    return out.reset_index(drop=True)


def dedup_sort_table(batch: pa.Table) -> pa.Table:
    """Arrow-native dedup + sort (same semantics as dedup_sort_group without
    the pandas round-trip: C++ multi-column sort, then drop rows whose whole
    sort key equals their predecessor's)."""
    t = batch.sort_by([(k, "ascending") for k in SORT_KEYS])
    n = t.num_rows
    if n <= 1:
        return t
    eq = None
    for k in SORT_KEYS:
        col = t[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):
            continue  # all-null column: every neighbor pair matches
        a, b = col.slice(1), col.slice(0, n - 1)
        e = pc.fill_null(pc.equal(a, b), False)
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        e = pc.or_(e, both_null)
        eq = e if eq is None else pc.and_(eq, e)
    if eq is None:  # every key column all-null: all rows identical
        return t.slice(0, 1)
    if isinstance(eq, pa.ChunkedArray):
        eq = eq.combine_chunks()
    mask = pa.concat_arrays([pa.array([True]), pc.invert(eq)])
    return t.filter(mask)


def canonicalize(ds, num_buckets: int = 64, prededup: bool = False):
    """Dataset of triple rows (+ conv_id lineage) → canonical store layout.

    ``prededup=True`` adds an in-batch combiner before the shuffle — worth it
    when upstream emits many duplicate triples. The flagship's parser already
    restores set semantics per document (Graph is a set) and its subjects are
    conversation-scoped, so cross-batch duplicates are impossible there and
    the combiner would be pure overhead; the per-bucket dedup below remains
    the global guarantee either way.
    """
    if prededup:
        fn = lambda b: prededup_batch(add_subj_bucket(b, num_buckets))  # noqa: E731
    else:
        fn = lambda b: add_subj_bucket(b, num_buckets)  # noqa: E731
    ds = ds.map_batches(fn, batch_format="pyarrow")
    return ds.groupby("subj_bucket").map_groups(dedup_sort_group, batch_format="pandas")


def canonicalize_skew_aware(ds, num_buckets: int = 64, dedup_partitions: int = 256):
    """Two-phase canonicalization for graphs with HOT subjects (north_star:
    system/assistant role entities can hold a large share of triples).

    A plain ``groupby(subj_bucket)`` sends every triple of a hot subject to
    one reducer. Phase 1 instead partitions by a hash of the FULL triple —
    perfectly uniform under any subject skew, and still correct for dedup
    because duplicate triples hash identically. Phase 2 then groups the
    (already-deduplicated) rows by subject bucket only to sort for the store
    layout; a hot subject still lands in one storage partition — that is the
    store's contract — but the expensive dedup exchange no longer hot-spots.
    """
    import pyarrow as pa

    def add_triple_bucket(batch: pa.Table) -> pa.Table:
        # vectorized: Arrow joins the key columns in C, pandas' deterministic
        # (fixed-key) string hasher maps them to uint64 in C — no per-row
        # Python loop. The bucket value only partitions (it never reaches the
        # output), so any cross-process-deterministic hash is correct.
        combined = pc.binary_join_element_wise(
            pc.cast(batch["subj"], pa.string()),
            pc.cast(batch["pred"], pa.string()),
            pc.cast(batch["obj_kind"], pa.string()),
            pc.cast(batch["obj_value"], pa.string()),
            "\x1f",
        )
        if isinstance(combined, pa.ChunkedArray):
            combined = combined.combine_chunks()
        h = pd.util.hash_array(combined.to_numpy(zero_copy_only=False), categorize=False)
        buckets = (h % np.uint64(dedup_partitions)).astype(np.int32)
        return batch.append_column("triple_bucket", pa.array(buckets, pa.int32()))

    def dedup_only(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(subset=SORT_KEYS).drop(columns=["triple_bucket"])

    deduped = (
        ds.map_batches(add_triple_bucket, batch_format="pyarrow")
        .groupby("triple_bucket")
        .map_groups(dedup_only, batch_format="pandas")
    )
    bucketed = deduped.map_batches(lambda b: add_subj_bucket(b, num_buckets), batch_format="pyarrow")

    def sort_only(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(SORT_KEYS, kind="mergesort").reset_index(drop=True)

    return bucketed.groupby("subj_bucket").map_groups(sort_only, batch_format="pandas")


def bucket_metrics(group: pd.DataFrame) -> pd.DataFrame:
    """Per-partition lineage/metrics record (north_rule: per-partition
    lineage + metrics)."""
    return pd.DataFrame(
        {
            "subj_bucket": [int(group["subj_bucket"].iloc[0])],
            "n_triples": [len(group)],
            "n_subjects": [group["subj"].nunique()],
            "n_convs": [group["conv_id"].nunique() if "conv_id" in group else 0],
        }
    )
