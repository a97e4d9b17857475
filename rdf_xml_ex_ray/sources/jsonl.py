"""JSON-Lines source + sink for Ray Data document corpora.

The extract-side counterpart of the N-Triples/Turtle sinks, applied to the
``clean`` job's corpus store: one JSON object per document, hash-bucketed
``part-<bucket>.jsonl`` files, deterministic in-bucket ordering (sorted by
the id column, then sorted column names inside each object) and tmp+rename
atomicity — a crashed exporter leaves no half-visible file, and re-running
it converges to byte-identical output.

Reading goes through ``ray.data.read_json`` (jsonl is its native framing),
so the write→read roundtrip is a self-contained correctness gate.
"""

from __future__ import annotations

import os


def write_jsonl(ds, out_dir: str, num_buckets: int = 16, id_col: str = "doc_id"):
    """Dataset → ``out_dir/part-<bucket>.jsonl`` (returns per-bucket stats)."""
    import pandas as pd

    from ..pipelines.dedup import _doc_bucket

    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(batch):
        import pyarrow as pa

        ids = batch[id_col].to_pylist()
        return batch.append_column("__bucket", pa.array(_doc_bucket(ids, num_buckets)))

    def write_bucket(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["__bucket"].iloc[0])
        g = group.drop(columns=["__bucket"]).sort_values(id_col, kind="mergesort")
        g = g[sorted(g.columns)]
        payload = g.to_json(orient="records", lines=True, force_ascii=False)
        if payload and not payload.endswith("\n"):
            payload += "\n"
        tmp = os.path.join(out_dir, f".part-{bucket:05d}.jsonl.tmp")
        final = os.path.join(out_dir, f"part-{bucket:05d}.jsonl")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(payload)
        os.replace(tmp, final)
        return pd.DataFrame({"bucket": [bucket], "n_docs": [len(g)]})

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("__bucket").map_groups(write_bucket, batch_format="pandas")


def read_jsonl(paths):
    """.jsonl file(s) → Dataset (ray.data.read_json handles the framing)."""
    import ray.data as rd

    return rd.read_json(paths)
