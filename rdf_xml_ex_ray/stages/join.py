"""Generic distributed many-to-many hash equi-join.

`_bucketed_attach` (pipelines/dedup.py) covers the many-to-ONE "attach a
payload column" case; this stage is the general inner equi-join: both
sides stay distributed, rows are tagged with ``crc32/Knuth-mix(key) %
num_buckets``, the two tagged datasets are unioned, and each bucket group
is joined with a vectorized ``pandas.merge`` inside
``groupby(bucket).map_groups``.  That is the classic partitioned hash
join: ONE all-to-all exchange (the groupby), no driver-side state, and
per-bucket memory bounded by the largest key bucket rather than either
input.  Skewed keys can be salted by raising ``num_buckets``; the bucket
function spreads sequential int ids via a Knuth multiplicative mix so
TPC-H-style dense keys don't land in one bucket range.

Reference parity note: the reference (rdf-elixir/rdf-xml-ex) has no join
surface — this is part of the training-data operator family layered on
top of the KG engine (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..pipelines.dedup import NUM_JOIN_BUCKETS, _doc_bucket

__all__ = ["bucketed_equijoin"]


def bucketed_equijoin(
    left_ds,
    right_ds,
    *,
    left_key: str,
    right_key: str,
    left_fields: list[tuple[str, pa.DataType]],
    right_fields: list[tuple[str, pa.DataType]],
    num_buckets: int = NUM_JOIN_BUCKETS,
    key_type: pa.DataType = pa.int64(),
    how: str = "inner",
):
    """Equi-join of two datasets on ``left_key == right_key``.

    ``left_fields`` / ``right_fields`` are each side's full (name, type)
    output schema (disjoint names; include the key column on whichever
    side(s) should carry it into the output).  Returns a dataset whose
    schema is ``left_fields + right_fields``.

    ``how`` is ``"inner"`` (default), ``"left"`` — the left-outer flavor
    keeps unmatched left rows with nulls in every right-side column (the
    SPARQL OPTIONAL primitive) — ``"anti"``: keep exactly the left rows
    whose key has NO right-side match (the SPARQL MINUS / SQL NOT EXISTS
    primitive) — or ``"semi"``: keep exactly the left rows whose key HAS a
    right-side match, each once (SQL EXISTS / SPARQL FILTER EXISTS). For
    anti/semi the output schema is ``left_fields`` only, so pass just the
    key in ``right_fields``. Same single-exchange shape for all four: a
    left row and its key-mates land in one bucket group, so the
    (un)matched test needs no second pass.
    """
    if how not in ("inner", "left", "anti", "semi"):
        raise ValueError(f"unsupported join type: {how!r}")
    overlap = {n for n, _ in left_fields} & {n for n, _ in right_fields}
    if overlap:
        raise ValueError(f"join output column collision: {sorted(overlap)}")

    all_fields = list(left_fields) + list(right_fields)
    out_schema = pa.schema(all_fields)
    left_names = [n for n, _ in left_fields]
    right_names = [n for n, _ in right_fields]

    def _tag(side_fields, key_col, is_left):
        def tag(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for name, typ in all_fields:
                if any(name == f for f, _ in side_fields):
                    cols[name] = batch[name].cast(typ)
                else:
                    cols[name] = pa.nulls(n, typ)
            cols["__left"] = pa.repeat(is_left, n)
            cols["__bucket"] = pa.array(
                _doc_bucket(batch[key_col].cast(key_type).to_pylist(), num_buckets)
            )
            return pa.table(cols)

        return tag

    left_schema = pa.schema(left_fields)

    def join_bucket(group: pd.DataFrame) -> pa.Table:
        is_left = group["__left"].astype(bool)
        lhs = group.loc[is_left, left_names]
        rhs = group.loc[~is_left, right_names]
        if how in ("anti", "semi"):
            if len(lhs) == 0:
                return left_schema.empty_table()
            if len(rhs):
                member = lhs[left_key].isin(rhs[right_key])
                lhs = lhs[~member] if how == "anti" else lhs[member]
            elif how == "semi":  # no right rows: nothing matches
                lhs = lhs.iloc[0:0]
            return pa.Table.from_arrays(
                [pa.array(lhs[n], type=t) for n, t in left_fields],
                schema=left_schema,
            )
        if len(lhs) == 0 or (how == "inner" and len(rhs) == 0):
            return out_schema.empty_table()
        if len(rhs) == 0:  # how == "left": all-null right side
            merged = lhs.copy()
            for name in right_names:
                merged[name] = None
        else:
            merged = lhs.merge(rhs, left_on=left_key, right_on=right_key, how=how)
        arrays = []
        for name, typ in all_fields:
            s = merged[name]
            if pa.types.is_integer(typ):
                if how == "left" and s.isna().any():
                    # unmatched rows: keep nulls (int64 astype would raise)
                    s = s.astype(object).where(s.notna(), None)
                else:
                    s = s.astype("int64")
            elif how == "left" and s.dtype.kind == "f" and name in set(right_names):
                # pandas floatified an unmatched object column — renull
                s = s.astype(object).where(s.notna(), None)
            arrays.append(pa.array(s, type=typ))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    tagged = left_ds.map_batches(
        _tag(left_fields, left_key, True), batch_format="pyarrow"
    ).union(right_ds.map_batches(_tag(right_fields, right_key, False), batch_format="pyarrow"))
    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
