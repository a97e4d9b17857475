"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the baseline: the query matrix is broadcast once
(``ray.put``), each ``map_batches`` task computes a per-batch partial top-k
with one float64 matmul, and a tiny ``groupby(query_id)`` merges partials.
At scale the same topology holds — the broadcast side stays small and only
(n_queries × k) rows per batch hit the shuffle. The label-blocked variant in
dedup.dedup_embedding is the IVF-style bucketed path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

N_QUERIES = 8
TOP_K = 10

ANN_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       round(sim, 4) AS cos_sim
FROM sims
QUALIFY rank <= {TOP_K}
"""


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class BatchTopK:
    """Actor-pool stage: per-batch partial top-k against the broadcast
    query matrix (loaded once per actor in __init__)."""

    def __init__(self, queries_ref):
        try:
            import ray

            q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        except ImportError:  # pragma: no cover
            q = queries_ref
        self.query_ids = q["ids"]
        self.query_mat = _normalize(q["mat"].astype(np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        sims = self.query_mat @ _normalize(mat).T  # (n_queries, batch)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            row = sims[qi]
            keep = vec_ids != qid
            ids_k, row_k = vec_ids[keep], row[keep]
            if len(row_k) > TOP_K:
                part = np.argpartition(-row_k, TOP_K)[:TOP_K]
                ids_k, row_k = ids_k[part], row_k[part]
            out_q.extend([qid] * len(ids_k))
            out_v.extend(ids_k)
            out_s.extend(row_k)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _merge_topk(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(TOP_K)
    return pd.DataFrame(
        {
            "query_id": g["query_id"].astype("int64"),
            "vec_id": g["vec_id"].astype("int64"),
            "rank": pd.Series(range(1, len(g) + 1), dtype="int64").values,
            "cos_sim": np.round(g["sim"].to_numpy(), 4),
        }
    )


N_CELLS = 16
N_PROBE = 4


def _assign_cells(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    return np.argmax(_normalize(mat) @ centroids.T, axis=1)


def ivf_centroids(path: str) -> np.ndarray:
    """Deterministic coarse quantizer: seed centroids from the first N_CELLS
    vectors, one Lloyd refinement over a fixed sample. At 100 TB the sample
    is a bounded `limit()`; the refined centroids broadcast to every task."""
    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    sample = np.stack(tbl["embedding"].to_pylist()[: max(1024, N_CELLS * 8)]).astype(np.float64)
    centroids = _normalize(sample[:N_CELLS].copy())
    assign = _assign_cells(sample, centroids)
    for c in range(N_CELLS):
        members = sample[assign == c]
        if len(members):
            centroids[c] = members.mean(axis=0)
    return _normalize(centroids)


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed ANN: vectors partition into coarse cells; each query
    probes only its N_PROBE nearest cells. Same output schema as ann_topk —
    pytest checks recall against the brute-force baseline."""
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    centroids = ivf_centroids(path)
    qtbl = pq.read_table(path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", N_QUERIES)])
    qmat = _normalize(np.stack(qtbl["embedding"].to_pylist()).astype(np.float64))
    q_probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :N_PROBE]
    broadcast = {
        "ids": np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64),
        "mat": qmat,
        "probes": q_probes,
        "centroids": centroids,
    }
    ref = ray.put(broadcast) if ray.is_initialized() else broadcast

    class IvfPartialTopK:
        def __init__(self, queries_ref):
            q = ray.get(queries_ref) if ray.is_initialized() else queries_ref
            self.q = q
            # per query, the set of cells it probes
            self.probe_sets = [set(p) for p in q["probes"]]

        def __call__(self, batch: pa.Table) -> pa.Table:
            vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            mat = _normalize(np.stack(batch["embedding"].to_pylist()).astype(np.float64))
            cells = _assign_cells(mat, self.q["centroids"])
            sims = self.q["mat"] @ mat.T
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.q["ids"]):
                probe = self.probe_sets[qi]
                keep = np.fromiter((c in probe for c in cells), bool, len(cells))
                keep &= vec_ids != qid
                ids_k, row_k = vec_ids[keep], sims[qi][keep]
                if len(row_k) > TOP_K:
                    part = np.argpartition(-row_k, TOP_K)[:TOP_K]
                    ids_k, row_k = ids_k[part], row_k[part]
                out_q.extend([qid] * len(ids_k))
                out_v.extend(ids_k)
                out_s.extend(row_k)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        IvfPartialTopK,
        fn_constructor_kwargs={"queries_ref": ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")


def ann_topk(sf_dir: str):
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", N_QUERIES)])
    queries = {
        "ids": np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64),
        "mat": np.stack(qtbl["embedding"].to_pylist()),
    }
    queries_ref = ray.put(queries) if ray.is_initialized() else queries

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        BatchTopK,
        fn_constructor_kwargs={"queries_ref": queries_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")
