"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the baseline: the query matrix is broadcast once
(``ray.put``), each ``map_batches`` *task* computes a per-batch partial top-k
with one float64 matmul (resolving the broadcast at most once per worker via
the module-level cache in stages/broadcast.py), and a tiny
``groupby(query_id)`` merges partials. At scale the same topology holds — the
broadcast side stays small and only (n_queries × k) rows per batch hit the
shuffle. Task stages (not actor pools) keep the map chain fusable at full
cluster parallelism.

The IVF variant is the scale path: a deterministic coarse quantizer built
from a *bounded* sample (never a full-table driver read), vectors assigned
to cells per batch, each query probing only its N_PROBE nearest cells.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..core.rounding import np_round_half_away
from ..stages.broadcast import put_broadcast, resolve_broadcast

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


def _partial_topk(query_ids, sims, vec_ids):
    """Per-batch partial top-k rows for every query; (3 lists).

    Selection orders by (sim DESC, vec_id ASC) — the same total order the
    SQL twins' ``ORDER BY sim DESC, vec_id`` uses — so tied similarities at
    the top-k boundary resolve identically on both engines (a bare
    argpartition keeps an arbitrary one of the tied rows)."""
    out_q, out_v, out_s = [], [], []
    for qi, qid in enumerate(query_ids):
        row = sims[qi]
        keep = vec_ids != qid
        ids_k, row_k = vec_ids[keep], row[keep]
        if len(row_k) > TOP_K:
            order = np.lexsort((ids_k, -row_k))[:TOP_K]
            ids_k, row_k = ids_k[order], row_k[order]
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


def _probed_partial_topk(b: dict, cells: np.ndarray, vec_ids: np.ndarray,
                         sims: np.ndarray) -> pa.Table:
    """Partial top-k restricted to each query's probed cells (shared by the
    IVF and sign-LSH variants): out-of-probe vectors are masked to -inf
    before selection and the placeholder rows filtered after."""
    import pyarrow.compute as pc

    probe_mask = np.zeros((len(b["ids"]), len(cells)), dtype=bool)
    for qi in range(len(b["ids"])):
        probe_mask[qi] = np.isin(cells, b["probes"][qi])
    sims = np.where(probe_mask, sims, -np.inf)
    out = _partial_topk(b["ids"], sims, vec_ids)
    return out.filter(pc.greater(out["sim"], -np.inf))


def _merge_topk(group: pd.DataFrame) -> pa.Table:
    g = group.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(TOP_K)
    return pa.table(
        {
            "query_id": pa.array(g["query_id"].astype("int64")),
            "vec_id": pa.array(g["vec_id"].astype("int64")),
            "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
            "cos_sim": pa.array(np_round_half_away(g["sim"].to_numpy(), 4), pa.float64()),
        }
    )


def _read_queries(path: str) -> dict:
    """Query vectors: a tiny row-group-filtered read (vec_id < N_QUERIES)."""
    qtbl = pq.read_table(path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", N_QUERIES)])
    return {
        "ids": np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64),
        "mat": _normalize(np.stack(qtbl["embedding"].to_pylist()).astype(np.float64)),
    }


def ann_topk(sf_dir: str):
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    queries_ref = put_broadcast(_read_queries(path))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q = resolve_broadcast(queries_ref)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        sims = q["mat"] @ _normalize(mat).T  # (n_queries, batch)
        return _partial_topk(q["ids"], sims, vec_ids)

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(batch_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")


# ------------------------------------------------------------------ IVF

N_CELLS = 16
N_PROBE = 4
CENTROID_SAMPLE = 1024


def _assign_cells(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    return np.argmax(_normalize(mat) @ centroids.T, axis=1)


def ivf_centroids(path: str) -> np.ndarray:
    """Deterministic coarse quantizer: seed centroids from the first N_CELLS
    vectors, one Lloyd refinement over a fixed-size sample.

    The sample read is BOUNDED — streamed row-group by row-group off the
    parquet footer and stopped at CENTROID_SAMPLE rows — so at 100 TB this is
    a constant-size driver read, never a full-table load. The refined
    centroids then broadcast to every task."""
    want = max(CENTROID_SAMPLE, N_CELLS * 8)
    pf = pq.ParquetFile(path)
    rows, have = [], 0
    for rb in pf.iter_batches(batch_size=min(want, 4096), columns=["embedding"]):
        rows.append(rb)
        have += rb.num_rows
        if have >= want:
            break
    tbl = pa.Table.from_batches(rows)
    sample = np.stack(tbl["embedding"].to_pylist()[:want]).astype(np.float64)
    centroids = _normalize(sample[:N_CELLS].copy())
    assign = _assign_cells(sample, centroids)
    for c in range(N_CELLS):
        members = sample[assign == c]
        if len(members):
            centroids[c] = members.mean(axis=0)
    return _normalize(centroids)


# ------------------------------------------------------------ sign-LSH

N_PLANES = 4  # 16 cells; queries probe own cell + Hamming-1 → 5/16 of data
LSH_DIM = 64  # embeddings table dim (fixed by the synth generator)

_LSH_PLANES = np.random.RandomState(11).randn(N_PLANES, LSH_DIM)


def _plane_literal(p: np.ndarray) -> str:
    # repr() emits the shortest round-tripping decimal — DuckDB parses it
    # back to the identical double, so both engines see the same hyperplane
    return "[" + ", ".join(repr(float(x)) for x in p) + "]"


_CELL_EXPR = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_plane_literal(_LSH_PLANES[j])}) > 0 "
    f"THEN {1 << j} ELSE 0 END)"
    for j in range(N_PLANES)
)

ANN_LSH_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c AS (SELECT vec_id, v, ({_CELL_EXPR}) AS cell FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, cell AS qcell FROM c WHERE vec_id < {N_QUERIES}),
probes AS (
  SELECT query_id, qv,
         unnest([qcell, xor(qcell, 1), xor(qcell, 2), xor(qcell, 4), xor(qcell, 8)]) AS pc
  FROM q
),
sims AS (
  SELECT p.query_id, t.vec_id, list_cosine_similarity(p.qv, t.v) AS sim
  FROM probes p JOIN c t ON t.cell = p.pc AND t.vec_id <> p.query_id
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       round(sim, 4) AS cos_sim
FROM sims
QUALIFY rank <= {TOP_K}
"""


def _sign_cells(raw_mat: np.ndarray) -> np.ndarray:
    """Cell id per vector: bit j = sign of the dot with hyperplane j.
    Computed on RAW vectors (matching the SQL side; normalization is a
    positive scale, so signs agree either way)."""
    bits = raw_mat @ _LSH_PLANES.T > 0  # (n, N_PLANES)
    return (bits @ (1 << np.arange(N_PLANES))).astype(np.int64)


def ann_lsh_topk(sf_dir: str):
    """Sign-LSH-bucketed ANN (the scale path with a full DuckDB twin):
    vectors hash into 2^N_PLANES cells by hyperplane side; each query scans
    only its own cell plus the N_PLANES Hamming-1 neighbors. The quantizer
    is integer-exact on both engines (fixed seeded hyperplanes embedded as
    SQL literals), so unlike the Lloyd-refined IVF variant this one is
    value-hash checked end to end."""
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", N_QUERIES)])
    qraw = np.stack(qtbl["embedding"].to_pylist()).astype(np.float64)
    qcells = _sign_cells(qraw)
    probes = np.stack([qcells ^ m for m in (0, 1, 2, 4, 8)], axis=1)  # (nq, 5)
    ref = put_broadcast(
        {
            "ids": np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64),
            "mat": _normalize(qraw),
            "probes": probes,
        }
    )

    def lsh_partial_topk(batch: pa.Table) -> pa.Table:
        b = resolve_broadcast(ref)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        raw = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        cells = _sign_cells(raw)
        sims = b["mat"] @ _normalize(raw).T
        return _probed_partial_topk(b, cells, vec_ids, sims)

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(lsh_partial_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed ANN: vectors partition into coarse cells; each query
    probes only its N_PROBE nearest cells. Same output schema as ann_topk —
    pytest checks recall against the brute-force baseline."""
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    centroids = ivf_centroids(path)
    q = _read_queries(path)
    q_probes = np.argsort(-(q["mat"] @ centroids.T), axis=1)[:, :N_PROBE]
    ref = put_broadcast(
        {"ids": q["ids"], "mat": q["mat"], "probes": q_probes, "centroids": centroids}
    )

    def ivf_partial_topk(batch: pa.Table) -> pa.Table:
        b = resolve_broadcast(ref)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _normalize(np.stack(batch["embedding"].to_pylist()).astype(np.float64))
        cells = _assign_cells(mat, b["centroids"])
        sims = b["mat"] @ mat.T
        return _probed_partial_topk(b, cells, vec_ids, sims)

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(ivf_partial_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")
