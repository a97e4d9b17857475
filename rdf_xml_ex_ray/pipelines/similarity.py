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

from ..core.embed import embed_matrix
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
        "mat": _normalize(embed_matrix(qtbl["embedding"])),
    }


def ann_topk(sf_dir: str):
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    queries_ref = put_broadcast(_read_queries(path))

    def batch_topk(batch: pa.Table) -> pa.Table:
        q = resolve_broadcast(queries_ref)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = embed_matrix(batch["embedding"])
        sims = q["mat"] @ _normalize(mat).T  # (n_queries, batch)
        return _partial_topk(q["ids"], sims, vec_ids)

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(batch_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")


# ------------------------------------------------------------------ IVF

N_CELLS = 16
N_PROBE = 6  # 6/16 cells scanned; recall 0.54-0.64 vs brute at sf0.001-0.1
IVF_QSCALE = 1024  # power of two: v * IVF_QSCALE is EXACT in float64

# Fixed integer codebook (the coarse quantizer). Integer centroid
# coordinates + integer-quantized vectors make cell assignment EXACT integer
# arithmetic on both engines: |round(v*1024)| <= 2^14 and |C| <= 99 < 2^7,
# so every dot product stays far below 2^53 and float summation order
# cannot change the result. A data-dependent Lloyd refinement (round-2
# version) is NOT SQL-replayable from a static oracle string — the codebook
# is data-independent by design, like ann_lsh's hyperplanes.
_IVF_CODEBOOK = np.random.RandomState(7).randint(-99, 100, size=(16, 64)).astype(np.float64)


def _ivf_quantize(raw_mat: np.ndarray) -> np.ndarray:
    """round-half-away(v * 2^10) — identical to DuckDB round(x*1024)."""
    return np_round_half_away(raw_mat * IVF_QSCALE, 0)


def _ivf_scores(raw_mat: np.ndarray) -> np.ndarray:
    """(n, N_CELLS) exact-integer-valued scores: dot(quantized v, codebook)."""
    return _ivf_quantize(raw_mat) @ _IVF_CODEBOOK.T


def _ivf_cells(raw_mat: np.ndarray) -> np.ndarray:
    """Cell per vector: argmax score, first-max (= lowest cell) tie-break —
    matching SQL list_position(scores, list_max(scores)) - 1."""
    return np.argmax(_ivf_scores(raw_mat), axis=1).astype(np.int64)


def _int_literal(row: np.ndarray) -> str:
    return "[" + ", ".join(str(int(x)) for x in row) + "]"


_IVF_SCORES_EXPR = "[" + ", ".join(
    f"list_dot_product(qv, {_int_literal(_IVF_CODEBOOK[c])})" for c in range(N_CELLS)
) + "]"

ANN_IVF_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id, v,
         list_transform(v, x -> round(x * {IVF_QSCALE})) AS qv
  FROM e
),
sc AS (SELECT vec_id, v, {_IVF_SCORES_EXPR} AS scores FROM qz),
cells AS (
  SELECT vec_id, v, scores,
         list_position(scores, list_max(scores)) - 1 AS cell
  FROM sc
),
q AS (SELECT vec_id AS query_id, v AS qvec, scores AS qscores
      FROM cells WHERE vec_id < {N_QUERIES}),
ranked_probes AS (
  SELECT q.query_id, q.qvec, g.cell AS pc,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY q.qscores[g.cell + 1] DESC, g.cell) AS pr
  FROM q, generate_series(0, {N_CELLS - 1}) AS g(cell)
),
probes AS (SELECT query_id, qvec, pc FROM ranked_probes WHERE pr <= {N_PROBE}),
sims AS (
  SELECT p.query_id, t.vec_id, list_cosine_similarity(p.qvec, t.v) AS sim
  FROM probes p JOIN cells t ON t.cell = p.pc AND t.vec_id <> p.query_id
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       round(sim, 4) AS cos_sim
FROM sims
QUALIFY rank <= {TOP_K}
"""


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
    qraw = embed_matrix(qtbl["embedding"])
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
        raw = embed_matrix(batch["embedding"])
        cells = _sign_cells(raw)
        sims = b["mat"] @ _normalize(raw).T
        return _probed_partial_topk(b, cells, vec_ids, sims)

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(lsh_partial_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")


# ------------------------------------------------- filtered vector search

ANN_FILTERED_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe, label AS ql
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q JOIN embeddings e ON e.label = q.ql AND e.vec_id <> q.query_id
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       round(sim, 4) AS cos_sim
FROM sims
QUALIFY rank <= {TOP_K}
"""


def ann_filtered_topk(sf_dir: str):
    """Metadata-filtered vector search (the 'where label = X' ANN every
    training-data store needs): each query's top-k is taken only over
    vectors sharing its label. Same broadcast + partial-top-k topology as
    ann_topk — the filter is a vectorized mask inside the batch, so the
    excluded rows cost one compare, not a shuffle."""
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(
        path, columns=["vec_id", "embedding", "label"], filters=[("vec_id", "<", N_QUERIES)]
    )
    ref = put_broadcast(
        {
            "ids": np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64),
            "mat": _normalize(embed_matrix(qtbl["embedding"])),
            "labels": np.asarray(qtbl["label"].to_pylist(), dtype=np.int64),
        }
    )

    def filtered_partial_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = resolve_broadcast(ref)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        sims = b["mat"] @ _normalize(embed_matrix(batch["embedding"])).T
        sims = np.where(b["labels"][:, None] == labels[None, :], sims, -np.inf)
        out = _partial_topk(b["ids"], sims, vec_ids)
        return out.filter(pc.greater(out["sim"], -np.inf))

    ds = rd.read_parquet(path, columns=["vec_id", "embedding", "label"])
    partials = ds.map_batches(filtered_partial_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")


# ------------------------------------------------- per-label centroids

EMBED_QSCALE = 1024  # power of two — v * EMBED_QSCALE is exact in float64

EMBEDDING_CENTROIDS_SQL = f"""
WITH q AS (
  SELECT label, t.i - 1 AS dim,
         round(CAST(embedding[t.i] AS DOUBLE) * {EMBED_QSCALE}) AS qv
  FROM embeddings, UNNEST(range(1, {LSH_DIM} + 1)) AS t(i)
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(qv) / ({EMBED_QSCALE}.0 * count(*)), 4) AS centroid
FROM q GROUP BY label, dim
"""


def embedding_centroids(sf_dir: str):
    """Per-label mean embedding — the distributed vector-aggregate shape:
    a vectorized combiner inside ``map_batches`` (per-batch per-label
    integer sums), ONE small exchange of O(labels × dims) rows, then an
    exact merge. Arithmetic is integer-exact on both engines (the
    ann_ivf_topk quantization pattern: round-half-away(v·2^10) sums stay
    below 2^53, and the single closing division runs on identical exact
    integers), so the oracle is value-hash equality, not tolerance."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch["label"].to_pylist(), dtype=np.int64)
        q = np_round_half_away(
            embed_matrix(batch["embedding"]) * EMBED_QSCALE, 0
        ).astype(np.int64)
        dims = q.shape[1]
        out_l, out_d, out_s, out_n = [], [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_l.extend([int(lab)] * dims)
            out_d.extend(range(dims))
            out_s.extend(q[m].sum(axis=0).tolist())
            out_n.extend([int(m.sum())] * dims)
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "dim": pa.array(out_d, pa.int64()),
                "qsum": pa.array(out_s, pa.int64()),
                "n_part": pa.array(out_n, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("qsum", alias_name="qsum_t"), Sum("n_part", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        qsum = np.asarray(batch["qsum_t"].to_pylist(), dtype=np.float64)
        n = np.asarray(batch["n"].to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "label": batch["label"].cast(pa.int64()),
                "dim": batch["dim"].cast(pa.int64()),
                "n": batch["n"].cast(pa.int64()),
                "centroid": pa.array(np_round_half_away(qsum / (EMBED_QSCALE * n), 4), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed ANN with a full DuckDB twin: vectors partition into
    coarse cells by max inner product against a fixed integer codebook;
    each query probes only its N_PROBE top-scoring cells (score DESC, cell
    ASC). Assignment and probe selection are exact integer arithmetic on
    both engines (see _IVF_CODEBOOK), so the whole query is value-hash
    checked end to end; pytest additionally pins recall vs brute force."""
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", N_QUERIES)])
    qraw = embed_matrix(qtbl["embedding"])
    qscores = _ivf_scores(qraw)
    # top-N_PROBE cells by (score DESC, cell ASC): stable argsort keeps
    # ascending cell order on exact-integer score ties
    q_probes = np.argsort(-qscores, axis=1, kind="stable")[:, :N_PROBE]
    ref = put_broadcast(
        {
            "ids": np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64),
            "mat": _normalize(qraw),
            "probes": q_probes,
        }
    )

    def ivf_partial_topk(batch: pa.Table) -> pa.Table:
        b = resolve_broadcast(ref)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        raw = embed_matrix(batch["embedding"])
        cells = _ivf_cells(raw)
        sims = b["mat"] @ _normalize(raw).T
        return _probed_partial_topk(b, cells, vec_ids, sims)

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(ivf_partial_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")


# --------------------------------------------------------- ann_range_search

RANGE_THRESH = 0.30  # nearest sim sits 4.5e-4 from this boundary at sf0.001-0.1

ANN_RANGE_SEARCH_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, vec_id, round(sim, 4) AS cos_sim
FROM sims WHERE sim >= {RANGE_THRESH}
"""


def ann_range_search(sf_dir: str, thresh: float = RANGE_THRESH):
    """Radius search: every vector within cosine ``thresh`` of each query —
    the recall-complete sibling of ann_topk (candidate harvesting for
    clustering, decontamination sweeps, near-dup audits).

    Topology is even simpler than top-k: broadcast query matrix, one float64
    matmul per batch, a vectorized threshold filter — NO shuffle or merge
    stage at all, so the operator's cost is exactly one pass over the
    embedding shards at any corpus size. Output floats are rounded to 4 dp
    through the shared half-away rule; the threshold compares the RAW sim on
    both engines and the corpus margin to the boundary (>=4e-4 across
    scales) is ~12 orders above any float-summation-order divergence."""
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    queries_ref = put_broadcast(_read_queries(path))

    def batch_range(batch: pa.Table) -> pa.Table:
        q = resolve_broadcast(queries_ref)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = embed_matrix(batch["embedding"])
        sims = q["mat"] @ _normalize(mat).T  # (n_queries, batch)
        qi, vi = np.nonzero(sims >= thresh)
        qids = q["ids"][qi]
        vids = vec_ids[vi]
        keep = qids != vids  # self-matches excluded, same as the SQL join
        return pa.table(
            {
                "query_id": pa.array(qids[keep], pa.int64()),
                "vec_id": pa.array(vids[keep], pa.int64()),
                "cos_sim": pa.array(
                    np_round_half_away(sims[qi[keep], vi[keep]], 4), pa.float64()
                ),
            }
        )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    return ds.map_batches(batch_range, batch_format="pyarrow", batch_size=4096)


# ------------------------------------------------------------- embedding_pq

PQ_M = 8  # subspaces (64-dim embedding → 8 dims each)
PQ_K = 16  # codewords per subspace → one nibble per subspace, 32-bit code
PQ_SUB = LSH_DIM // PQ_M

# Fixed integer codebook, data-independent like the IVF coarse quantizer:
# |round(v*1024)| <= 2^14 and |c| <= 99, so each squared-diff term and every
# 8-term subspace distance is an exact integer in float64 on both engines.
_PQ_CODEBOOK = np.random.RandomState(13).randint(-99, 100, size=(PQ_M, PQ_K, PQ_SUB)).astype(np.float64)


def _pq_dist_expr(m: int, c: int) -> str:
    base = m * PQ_SUB
    return " + ".join(
        f"(qv[{base + i + 1}] - {int(_PQ_CODEBOOK[m, c, i])})"
        f" * (qv[{base + i + 1}] - {int(_PQ_CODEBOOK[m, c, i])})"
        for i in range(PQ_SUB)
    )


_PQ_DISTS_EXPRS = [
    "[" + ", ".join(f"({_pq_dist_expr(m, c)})" for c in range(PQ_K)) + "]"
    for m in range(PQ_M)
]

_PQ_CODE_EXPR = " + ".join(
    f"CAST(list_position(d{m}, list_min(d{m})) - 1 AS BIGINT) * {PQ_K ** m}"
    for m in range(PQ_M)
)
_PQ_ERR_EXPR = " + ".join(f"list_min(d{m})" for m in range(PQ_M))

EMBEDDING_PQ_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (SELECT vec_id, list_transform(v, x -> round(x * {IVF_QSCALE})) AS qv FROM e),
d AS (
  SELECT vec_id,
         {", ".join(f"{_PQ_DISTS_EXPRS[m]} AS d{m}" for m in range(PQ_M))}
  FROM qz
)
SELECT vec_id,
       CAST({_PQ_CODE_EXPR} AS BIGINT) AS pq_code,
       CAST({_PQ_ERR_EXPR} AS BIGINT) AS pq_err
FROM d
"""


def embedding_pq(sf_dir: str):
    """Product quantization: each embedding compressed to an 8-nibble code
    (one 16-codeword argmin per 8-dim subspace) plus its total squared
    reconstruction error — the vector-compression step that turns a 100 TB
    float store into a RAM-resident ANN index.

    Pure streaming map (no shuffle): one (batch × K × sub) numpy broadcast
    per subspace, argmin with the same first-min tie-break the SQL's
    list_position uses. Quantized inputs and the integer codebook keep every
    distance an exact float64 integer, so codes and errors are bit-equal
    across engines and cluster sizes."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def encode(batch: pa.Table) -> pa.Table:
        raw = embed_matrix(batch["embedding"])
        qv = _ivf_quantize(raw)
        code = np.zeros(len(raw), dtype=np.int64)
        err = np.zeros(len(raw), dtype=np.int64)
        for m in range(PQ_M):
            sub = qv[:, m * PQ_SUB : (m + 1) * PQ_SUB]  # (n, 8)
            # (n, K): exact integer-valued distances
            d = ((sub[:, None, :] - _PQ_CODEBOOK[m][None, :, :]) ** 2).sum(axis=2)
            cm = np.argmin(d, axis=1)  # first min = lowest codeword, as in SQL
            code += cm.astype(np.int64) * (PQ_K**m)
            err += d[np.arange(len(raw)), cm].astype(np.int64)
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "pq_code": pa.array(code, pa.int64()),
                "pq_err": pa.array(err, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", batch_size=4096)


# ------------------------------------------------------------- ann_pq_topk

# Asymmetric-distance PQ search (the IVF-PQ second stage): queries keep
# their full (quantized) vectors, the database side is ONLY the 8-nibble
# codes from embedding_pq — 8 bytes/vector, the representation that makes
# a 100 TB float store RAM-resident. Distance(query, vector) =
# Σ_m dtab_q[m][code_m], where dtab_q is the query's per-subspace distance
# table against the fixed integer codebook — every term an exact float64
# integer, so the whole ranking is value-hash checkable in DuckDB.
_PQ_ADIST_EXPR = " + ".join(
    f"qd{m}[1 + CAST((c.pq_code // {PQ_K ** m}) % {PQ_K} AS INT)]" for m in range(PQ_M)
)

ANN_PQ_TOPK_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (SELECT vec_id, list_transform(v, x -> round(x * {IVF_QSCALE})) AS qv FROM e),
d AS (
  SELECT vec_id,
         {", ".join(f"{_PQ_DISTS_EXPRS[m]} AS d{m}" for m in range(PQ_M))}
  FROM qz
),
codes AS (
  SELECT vec_id, CAST({_PQ_CODE_EXPR} AS BIGINT) AS pq_code FROM d
),
qd AS (
  SELECT vec_id AS query_id, {", ".join(f"d{m} AS qd{m}" for m in range(PQ_M))}
  FROM d WHERE vec_id < {N_QUERIES}
),
sims AS (
  SELECT q.query_id, c.vec_id,
         CAST({_PQ_ADIST_EXPR} AS BIGINT) AS pq_dist
  FROM qd q JOIN codes c ON c.vec_id <> q.query_id
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY pq_dist, vec_id) AS BIGINT) AS rank,
       pq_dist
FROM sims QUALIFY rank <= {TOP_K}
"""


def ann_pq_topk(sf_dir: str):
    """Top-k by asymmetric PQ distance (see block comment above).

    Topology = ann_topk's broadcast + partial-top-k merge, but the
    per-batch work is integer table lookups over 4-bit codes instead of a
    float matmul over raw vectors: the query-side distance tables
    (N_QUERIES × M × K int64, a constant) broadcast once; each batch
    encodes to codes (the embedding_pq kernel) and gathers
    dtab[m][code_m] — O(n_q × batch × M) adds, zero float comparisons.
    Ranking is (pq_dist ASC, vec_id ASC); distances are exact integers on
    both engines so ties (identical codes — every near-duplicate) resolve
    identically with no rounding subtleties."""
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    qtbl = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", N_QUERIES)]
    )
    qraw = embed_matrix(qtbl["embedding"])
    qv = _ivf_quantize(qraw)
    # (n_q, M, K) exact-integer distance tables
    dtab = np.stack(
        [
            ((qv[:, m * PQ_SUB : (m + 1) * PQ_SUB][:, None, :] - _PQ_CODEBOOK[m][None, :, :]) ** 2).sum(axis=2)
            for m in range(PQ_M)
        ],
        axis=1,
    ).astype(np.int64)
    ref = put_broadcast(
        {"ids": np.asarray(qtbl["vec_id"].to_pylist(), dtype=np.int64), "dtab": dtab}
    )

    def batch_pq_topk(batch: pa.Table) -> pa.Table:
        b = resolve_broadcast(ref)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        raw = embed_matrix(batch["embedding"])
        qvb = _ivf_quantize(raw)
        dists = np.zeros((len(b["ids"]), len(vec_ids)), dtype=np.int64)
        for m in range(PQ_M):
            sub = qvb[:, m * PQ_SUB : (m + 1) * PQ_SUB]
            d = ((sub[:, None, :] - _PQ_CODEBOOK[m][None, :, :]) ** 2).sum(axis=2)
            cm = np.argmin(d, axis=1)  # first-min tie-break = SQL list_position
            dists += b["dtab"][:, m, :][:, cm]
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(b["ids"]):
            keep = vec_ids != qid
            ids_k, row_k = vec_ids[keep], dists[qi][keep]
            if len(row_k) > TOP_K:
                order = np.lexsort((ids_k, row_k))[:TOP_K]
                ids_k, row_k = ids_k[order], row_k[order]
            out_q.extend([qid] * len(ids_k)); out_v.extend(ids_k); out_s.extend(row_k)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "pq_dist": pa.array(out_s, pa.int64()),
            }
        )

    def merge_pq(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["pq_dist", "vec_id"], kind="mergesort").head(TOP_K)
        return pa.table(
            {
                "query_id": pa.array(g["query_id"].astype("int64")),
                "vec_id": pa.array(g["vec_id"].astype("int64")),
                "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
                "pq_dist": pa.array(g["pq_dist"].astype("int64")),
            }
        )

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    partials = ds.map_batches(batch_pq_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(merge_pq, batch_format="pandas")


# ------------------------------------------------------------------ kNN graph

# SemDeDup / graph-based-curation primitive: every vector's top-K cosine
# neighbors over the whole corpus (brute-force exact — the verification
# baseline the IVF/LSH variants above approximate sublinearly at scale).
KNN_K = 5
KNN_CHUNK_CAP = 1024  # rows per side of one blocked matmul

KNN_GRAPH_SQL = f"""
WITH sims AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS sim
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
)
SELECT src, dst,
       CAST(row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS BIGINT) AS rank,
       round(sim, 4) AS cos_sim
FROM sims QUALIFY rank <= {KNN_K}
"""


def knn_graph(sf_dir: str, k: int = KNN_K, chunk_cap: int = KNN_CHUNK_CAP):
    """Exact k-NN graph over the embedding column (all-pairs blocked):
    vectors split into C = ceil(n / chunk_cap) hash chunks; every ordered
    chunk pair (qc, dc) is ONE group holding a bounded (≤ cap²) float64
    matmul, each group emits per-query partial top-k, and a final
    groupby(src) merges C partials per query.

    Scale shape: the quadratic work is inherent to the exact graph (the
    sublinear path is ann_lsh/ann_ivf's blocking); what matters is that no
    group ever exceeds cap² work / 2·cap vectors of memory, chunks are
    deterministic (vec_id % C), and both shuffles move only top-k rows —
    O(n·C·k) — never the similarity matrix."""
    import ray.data as rd

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    n = ds.count()
    n_chunks = max(1, -(-n // chunk_cap))

    def expand(batch: pa.Table) -> pa.Table:
        """Replicate each row to every group it participates in: as query
        for (own_chunk, dc) ∀dc, as candidate for (qc, own_chunk) ∀qc —
        the (c, c) group gets one row serving both roles."""
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        own = vids % n_chunks
        idx, grp, role = [], [], []
        for row, c in enumerate(own):
            for other in range(n_chunks):
                idx.append(row); grp.append(int(c) * n_chunks + other); role.append(1)  # query in (c, other)
                if other != c:
                    idx.append(row); grp.append(other * n_chunks + int(c)); role.append(2)  # candidate in (other, c)
        t = batch.take(pa.array(idx, pa.int64()))
        return (
            t.append_column("__grp", pa.array(grp, pa.int32()))
            .append_column("__role", pa.array(role, pa.int8()))
        )

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )

    def block_topk(group: pd.DataFrame) -> pa.Table:
        # diagonal groups are identified by the group KEY (qc == dc), not by
        # the roles present — a group whose candidate chunk happens to be an
        # empty residue class must yield nothing, not self-pairs
        gid = int(group["__grp"].iloc[0])
        diag = (gid // n_chunks) == (gid % n_chunks)
        qm = group["__role"].to_numpy() == 1
        q = group[qm]
        c = group if diag else group[~qm]
        if len(q) == 0 or len(c) == 0:
            return empty
        q_ids = q["vec_id"].to_numpy().astype(np.int64)
        c_ids = c["vec_id"].to_numpy().astype(np.int64)
        qmat = embed_matrix(q["embedding"])
        cmat = embed_matrix(c["embedding"])
        qn = np.linalg.norm(qmat, axis=1); qn[qn == 0] = 1.0
        cn = np.linalg.norm(cmat, axis=1); cn[cn == 0] = 1.0
        sims = (qmat @ cmat.T) / (qn[:, None] * cn[None, :])
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            keep = c_ids != qid
            ids_k, row_k = c_ids[keep], sims[qi][keep]
            if len(row_k) > k:
                order = np.lexsort((ids_k, -row_k))[:k]
                ids_k, row_k = ids_k[order], row_k[order]
            out_q.extend([qid] * len(ids_k)); out_v.extend(ids_k); out_s.extend(row_k)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        return pa.table(
            {
                "src": pa.array(g["query_id"].astype("int64")),
                "dst": pa.array(g["vec_id"].astype("int64")),
                "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
                "cos_sim": pa.array(np_round_half_away(g["sim"].to_numpy(), 4), pa.float64()),
            }
        )

    partials = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("__grp")
        .map_groups(block_topk, batch_format="pandas")
    )
    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# ----------------------------------------------------------- knn_graph_ann

# ANN-blocked kNN graph — the 100-TB path knn_graph (exact, all-pairs)
# verifies. Every vector is a QUERY probing the top `probe` cells of an
# integer-exact coarse quantizer, and a CANDIDATE only inside its own
# cell: total pair-compute drops from n²/2 to ~n² × probe_mass (the share
# of corpus mass in probed cells). Cell assignment and probe ranking are
# exact integer arithmetic on both engines (same construction as
# _IVF_CODEBOOK), so DuckDB replays the whole graph and the oracle
# hash-checks it end to end; knn_recall_eval grades recall vs exact.
#
# BOTH knobs are corpus-scaled configs, derivable by a STATIC oracle:
# - cells = the smallest power of two in [16, 256] with cells² >= n
#   (≈ √n, so mean cell size also grows ≈ √n) — integer thresholds the
#   SQL twin reproduces with a CASE on count(*); the codebook is one
#   fixed 256-row table of which the first `cells` rows are active.
# - probe = cells // 2, the RECALL-TARGETED default: the synthetic sf*
#   embeddings are label-independent ISOTROPIC noise (measured: within-
#   label cos sim = across-label = 0.0), and on isotropic data any cell-
#   probing index has recall ≈ probed mass — recall@5 0.8 therefore
#   *requires* probing ~half the corpus (measured 0.82 @ mass 0.50 at
#   sf0.1; still 2× under brute). On clustered data the same index hits
#   the target at a small fraction of that mass
#   (tests/test_similarity.py::test_knn_ann_clustered_data_low_mass).
KNN_CELLS_MAX = 256

_KNN_CODEBOOK = np.random.RandomState(17).randint(
    -99, 100, size=(KNN_CELLS_MAX, LSH_DIM)
).astype(np.float64)


def _knn_config(n: int) -> tuple[int, int]:
    """(cells, probe) for an n-vector corpus — smallest power of two in
    [16, 256] with cells² >= n; probe = half the cells (see block note)."""
    cells = 16
    while cells * cells < n and cells < KNN_CELLS_MAX:
        cells *= 2
    return cells, cells // 2


_KNN_SCORES_EXPR = "[" + ", ".join(
    f"list_dot_product(qv, {_int_literal(_KNN_CODEBOOK[c])})"
    for c in range(KNN_CELLS_MAX)
) + "]"

# the SQL twin derives the same (cells, probe) from count(*): the CASE
# thresholds are exactly _knn_config's integer rule, and the full 256-row
# codebook scores are sliced to the active prefix
_KNN_NC_SQL = """
  SELECT CASE WHEN count(*) <= 256 THEN 16 WHEN count(*) <= 1024 THEN 32
              WHEN count(*) <= 4096 THEN 64 WHEN count(*) <= 16384 THEN 128
              ELSE 256 END AS cells
  FROM e
"""

KNN_GRAPH_ANN_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nc AS ({_KNN_NC_SQL}),
qz AS (
  SELECT vec_id, v, list_transform(v, x -> round(x * {IVF_QSCALE})) AS qv
  FROM e
),
sc AS (
  SELECT vec_id, v,
         list_slice({_KNN_SCORES_EXPR}, 1, (SELECT cells FROM nc)) AS scores
  FROM qz
),
cells AS (
  SELECT vec_id, v, scores,
         list_position(scores, list_max(scores)) - 1 AS cell
  FROM sc
),
ranked_probes AS (
  SELECT c.vec_id AS src, c.v AS qvec, g.cell AS pc,
         row_number() OVER (PARTITION BY c.vec_id
                            ORDER BY c.scores[g.cell + 1] DESC, g.cell) AS pr
  FROM cells c, generate_series(0, {KNN_CELLS_MAX - 1}) AS g(cell)
  WHERE g.cell < (SELECT cells FROM nc)
),
probes AS (
  SELECT src, qvec, pc FROM ranked_probes
  WHERE pr <= (SELECT cells // 2 FROM nc)
),
sims AS (
  SELECT p.src, t.vec_id AS dst, list_cosine_similarity(p.qvec, t.v) AS sim
  FROM probes p JOIN cells t ON t.cell = p.pc AND t.vec_id <> p.src
)
SELECT src, dst,
       CAST(row_number() OVER (PARTITION BY src ORDER BY round(sim, 4) DESC, dst) AS BIGINT) AS rank,
       round(sim, 4) AS cos_sim
FROM sims QUALIFY rank <= {KNN_K}
"""
# ^ ranking is on the ROUNDED sim (unlike the brute twins): duplicate
# vectors land in different blocked groups whose matmul shapes differ, so
# BLAS summation order can split their raw sims by 1 ulp while DuckDB's
# per-row kernel computes them exactly equal — quantizing to the emitted
# 4 dp before the (sim DESC, dst) tiebreak makes the rank order identical
# on both engines for exactly the values the oracle hash compares.


def _knn_cells_probes(raw_mat: np.ndarray, cells: int, probe: int):
    """(cell, probes) per vector under the `cells`-row prefix of the graph
    quantizer: argmax first-max cell, top-`probe` probe cells by
    (score DESC, cell ASC) — both identical to the SQL twin's
    list_position / row_number ranking."""
    scores = _ivf_quantize(raw_mat) @ _KNN_CODEBOOK[:cells].T
    cell = np.argmax(scores, axis=1).astype(np.int64)
    probes = np.argsort(-scores, axis=1, kind="stable")[:, :probe].astype(np.int64)
    return cell, probes


def knn_graph_ann(
    sf_dir: str,
    k: int = KNN_K,
    chunk_cap: int = KNN_CHUNK_CAP,
    probe: int | None = None,
):
    """Approximate kNN graph, cell-blocked (see block comment above).

    Topology: one counting pass (per-cell candidate + probing-query totals
    → chunk counts, a 64-row broadcast), then an expansion pass that
    replicates each row into its bounded (probe_cell, query_chunk,
    cand_chunk) groups — numpy repeat/cumsum, no Python loop — one blocked
    matmul per group, and a groupby(src) merge of per-group partial top-k.
    No group holds more than ~2×chunk_cap rows or cap² pair-work, and the
    two shuffles move only expansion rows and top-k partials. Row
    replication totals O(pair_compute / chunk_cap) — proportional to the
    ANN-reduced work, not to n²."""
    import ray.data as rd

    from ray.data.aggregate import Sum

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
    n_cells, n_probe = _knn_config(ds.count())  # metadata-only row count
    if probe is not None:  # recall/compute trade knob (oracle uses default)
        n_probe = min(probe, n_cells)

    def cell_counts(batch: pa.Table) -> pa.Table:
        raw = embed_matrix(batch["embedding"])
        cell, probes = _knn_cells_probes(raw, n_cells, n_probe)
        return pa.table(
            {
                "cell": pa.array(np.arange(n_cells, dtype=np.int64)),
                "n_cand_part": pa.array(np.bincount(cell, minlength=n_cells).astype(np.int64)),
                "n_query_part": pa.array(
                    np.bincount(probes.ravel(), minlength=n_cells).astype(np.int64)
                ),
            }
        )

    counts = (
        ds.map_batches(cell_counts, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_cand_part", alias_name="n_cand"), Sum("n_query_part", alias_name="n_query"))
        .take_all()
    )
    cc = np.ones(n_cells, dtype=np.int64)  # candidate chunks per cell
    qc = np.ones(n_cells, dtype=np.int64)  # query chunks per cell
    for r in counts:
        cc[int(r["cell"])] = max(1, -(-int(r["n_cand"]) // chunk_cap))
        qc[int(r["cell"])] = max(1, -(-int(r["n_query"]) // chunk_cap))
    chunks_ref = put_broadcast({"cc": cc, "qc": qc})

    def expand(batch: pa.Table) -> pa.Table:
        b = resolve_broadcast(chunks_ref)
        cc_, qc_ = b["cc"], b["qc"]
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        raw = embed_matrix(batch["embedding"])
        cell, probes = _knn_cells_probes(raw, n_cells, n_probe)
        n = len(vids)
        # candidate side: own cell, own cand-chunk, replicated to every
        # query chunk of that cell
        qcnt = qc_[cell]
        idx_c = np.repeat(np.arange(n, dtype=np.int64), qcnt)
        offs = np.r_[0, np.cumsum(qcnt)]
        qch_c = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], qcnt)
        grp_c = (np.repeat(cell, qcnt) << 40) | (qch_c << 20) | np.repeat(vids % cc_[cell], qcnt)
        # query side: each probed cell, own query-chunk there, replicated to
        # every cand chunk of that cell
        pcf = probes.reshape(-1)
        row_f = np.repeat(np.arange(n, dtype=np.int64), n_probe)
        ccnt = cc_[pcf]
        idx_q = np.repeat(row_f, ccnt)
        offs2 = np.r_[0, np.cumsum(ccnt)]
        cch_q = np.arange(int(offs2[-1]), dtype=np.int64) - np.repeat(offs2[:-1], ccnt)
        grp_q = (
            (np.repeat(pcf, ccnt) << 40)
            | (np.repeat(vids[row_f] % qc_[pcf], ccnt) << 20)
            | cch_q
        )
        idx = np.concatenate([idx_c, idx_q])
        grp = np.concatenate([grp_c, grp_q])
        role = np.concatenate(
            [np.full(len(idx_c), 2, np.int8), np.full(len(idx_q), 1, np.int8)]
        )
        t = batch.take(pa.array(idx, pa.int64()))
        return (
            t.append_column("__grp", pa.array(grp, pa.int64()))
            .append_column("__role", pa.array(role, pa.int8()))
        )

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )

    def block_topk(group: pd.DataFrame) -> pa.Table:
        # roles are explicit on BOTH sides here (a row probing its own cell
        # appears twice), so unlike knn_graph's diagonal groups no role is
        # ever inferred from the group key
        qm = group["__role"].to_numpy() == 1
        q, c = group[qm], group[~qm]
        if len(q) == 0 or len(c) == 0:
            return empty
        q_ids = q["vec_id"].to_numpy().astype(np.int64)
        c_ids = c["vec_id"].to_numpy().astype(np.int64)
        qmat = _normalize(embed_matrix(q["embedding"]))
        cmat = _normalize(embed_matrix(c["embedding"]))
        # rounded before selection — see the SQL twin's ranking note
        sims = np_round_half_away(qmat @ cmat.T, 4)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            keep = c_ids != qid
            ids_k, row_k = c_ids[keep], sims[qi][keep]
            if len(row_k) > k:
                order = np.lexsort((ids_k, -row_k))[:k]
                ids_k, row_k = ids_k[order], row_k[order]
            out_q.extend([qid] * len(ids_k)); out_v.extend(ids_k); out_s.extend(row_k)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["sim", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        return pa.table(
            {
                "src": pa.array(g["query_id"].astype("int64")),
                "dst": pa.array(g["vec_id"].astype("int64")),
                "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
                "cos_sim": pa.array(np_round_half_away(g["sim"].to_numpy(), 4), pa.float64()),
            }
        )

    partials = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("__grp")
        .map_groups(block_topk, batch_format="pandas")
    )
    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# Integer recall@k of the ANN graph vs the exact graph, per source vector —
# the ann_recall_eval pattern applied to knn_graph_ann (index-quality gauge
# for the subquadratic path).
KNN_RECALL_EVAL_SQL = f"""
WITH brute AS ({KNN_GRAPH_SQL}),
approx AS ({KNN_GRAPH_ANN_SQL})
SELECT b.src,
       CAST(count(a.dst) AS BIGINT) AS n_hits,
       CAST(count(*) AS BIGINT) AS k
FROM brute b LEFT JOIN approx a
  ON a.src = b.src AND a.dst = b.dst
GROUP BY b.src
"""


def knn_recall_eval(sf_dir: str, probe: int | None = None):
    """Per-vector hit count of knn_graph_ann's edges among the exact
    graph's top-k — same union → groupby(src) shape as ann_recall_eval,
    integer outputs so the oracle compare is exact. ``probe`` overrides
    the recall-targeted default for trade-curve measurement (the oracle
    only replays the default)."""
    brute = knn_graph(sf_dir)
    approx = knn_graph_ann(sf_dir, probe=probe)

    def tag(role: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch["src"].cast(pa.int64()),
                    "dst": batch["dst"].cast(pa.int64()),
                    "role": pa.array(np.full(batch.num_rows, role, dtype=np.int8)),
                }
            )
        return f

    def score(group: pd.DataFrame) -> pa.Table:
        b = group[group["role"] == 1]
        a_set = set(group.loc[group["role"] == 2, "dst"].astype("int64"))
        hits = int(b["dst"].astype("int64").isin(a_set).sum())
        return pa.table(
            {
                "src": pa.array([int(group["src"].iloc[0])], pa.int64()),
                "n_hits": pa.array([hits], pa.int64()),
                "k": pa.array([len(b)], pa.int64()),
            }
        )

    union = brute.map_batches(tag(1), batch_format="pyarrow").union(
        approx.map_batches(tag(2), batch_format="pyarrow")
    )
    return union.groupby("src").map_groups(score, batch_format="pandas")


# -------------------------------------------------------------- recall eval

# Pipeline-evaluation primitive: measure the approximate index's quality
# against the exact baseline — recall@k per query as INTEGER hit counts
# (n_hits of TOP_K), never a float ratio, so the oracle compare is exact.
ANN_RECALL_EVAL_SQL = f"""
WITH brute AS ({ANN_TOPK_SQL}),
approx AS ({ANN_LSH_TOPK_SQL})
SELECT b.query_id,
       CAST(count(a.vec_id) AS BIGINT) AS n_hits,
       CAST(count(*) AS BIGINT) AS k
FROM brute b LEFT JOIN approx a
  ON a.query_id = b.query_id AND a.vec_id = b.vec_id
GROUP BY b.query_id
"""


def ann_recall_eval(sf_dir: str):
    """Recall@k of ann_lsh_topk vs the brute-force ground truth, per query.

    Both inputs are top-k results — O(n_queries × k) by construction — so
    the comparison itself is a small groupby(query_id) over their union
    (role-tagged rows; hits counted inside the group). Works unchanged for
    arbitrarily large query sets: the union stays a dataset and every query
    ranks in its own group."""
    import pandas as pd
    import ray.data as rd  # noqa: F401  (datasets arrive from the two pipelines)

    brute = ann_topk(sf_dir)
    approx = ann_lsh_topk(sf_dir)

    def tag(role: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "query_id": batch["query_id"].cast(pa.int64()),
                    "vec_id": batch["vec_id"].cast(pa.int64()),
                    "role": pa.array(np.full(batch.num_rows, role, dtype=np.int8)),
                }
            )
        return f

    def score(group: pd.DataFrame) -> pa.Table:
        # query_id comes from the GROUP (not the brute-force slice): a query
        # present only in the approx results must degrade to n_hits=0, k=0
        # instead of IndexError-ing on an empty brute slice.
        b = group[group["role"] == 1]
        a_set = set(group.loc[group["role"] == 2, "vec_id"].astype("int64"))
        hits = int(b["vec_id"].astype("int64").isin(a_set).sum())
        return pa.table(
            {
                "query_id": pa.array([int(group["query_id"].iloc[0])], pa.int64()),
                "n_hits": pa.array([hits], pa.int64()),
                "k": pa.array([len(b)], pa.int64()),
            }
        )

    union = brute.map_batches(tag(1), batch_format="pyarrow").union(
        approx.map_batches(tag(2), batch_format="pyarrow")
    )
    return union.groupby("query_id").map_groups(score, batch_format="pandas")


# ------------------------------------------------------------------ semdedup

# SemDeDup (Abbas et al. 2023): semantic dedup with NO labels — block by
# the unsupervised coarse quantizer (the same integer-exact IVF cells the
# ANN index uses), mark any vector whose cell holds a smaller-id vector
# within cosine >= threshold as a duplicate, keep the rest. The
# cell-assignment arithmetic is integer-exact on both engines; the cosine
# threshold follows dedup_embedding's convention.
SEMDEDUP_THRESHOLD = 0.3
SEMDEDUP_CELL_CAP = 4096  # rows per side of one blocked matmul
SEMDEDUP_NUM_BUCKETS = 64

DOC_SEMDEDUP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id, v, list_transform(v, x -> round(x * {IVF_QSCALE})) AS qv
  FROM e
),
sc AS (SELECT vec_id, v, {_IVF_SCORES_EXPR} AS scores FROM qz),
cells AS (
  SELECT vec_id, v, list_position(scores, list_max(scores)) - 1 AS cell
  FROM sc
),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= {SEMDEDUP_THRESHOLD}
)
SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
       d.vec_id IS NULL AS keep
FROM cells c LEFT JOIN dups d ON d.vec_id = c.vec_id
"""


def doc_semdedup(sf_dir: str, cell_cap: int = SEMDEDUP_CELL_CAP,
                 num_buckets: int = SEMDEDUP_NUM_BUCKETS):
    """Label-free semantic dedup: IVF-cell blocking → within-cell (chunked)
    all-pairs cosine → smaller-id representative wins.

    Scale shape: cell assignment is a stateless map; oversized cells split
    into √-scaled chunks so no group exceeds cap² matmul work (the
    dedup_embedding topology with the quantizer replacing labels — the
    per-cell count poll is O(N_CELLS) driver memory, a constant); the dup
    ids then attach to the cell roster through a bucketed union-join —
    no driver-side id set."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    from .dedup import _doc_bucket

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        raw = embed_matrix(batch["embedding"])
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "embedding": batch["embedding"],
                "cell": pa.array(_ivf_cells(raw), pa.int64()),
            }
        )

    cells = ds.map_batches(assign, batch_format="pyarrow")

    counts = cells.groupby("cell").aggregate(Count(alias_name="n")).take_all()
    n_chunks = {int(r["cell"]): max(1, -(-int(r["n"]) // cell_cap)) for r in counts}
    chunks_ref = put_broadcast(n_chunks)

    def expand(batch: pa.Table) -> pa.Table:
        # vectorized chunk-pair expansion: the only Python loop is the
        # chunk-count lookup over the batch's DISTINCT cells; the per-row
        # fan-out (each row → kk pair rows) is numpy repeat/cumsum
        m = resolve_broadcast(chunks_ref)
        cell = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ucells, inv = np.unique(cell, return_inverse=True)
        ukk = np.fromiter((m.get(int(c), 1) for c in ucells), np.int64, count=len(ucells))
        kk = ukk[inv]
        c = vid % kk
        idx = np.repeat(np.arange(len(cell), dtype=np.int64), kk)
        offsets = np.r_[0, np.cumsum(kk)]
        other = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(offsets[:-1], kk)
        c_rep = np.repeat(c, kk)
        i = np.minimum(c_rep, other)
        j = np.maximum(c_rep, other)
        # (cell, i, j) packed collision-free for up to 2^20 chunks per cell
        # (cap² rows — far beyond any real cell)
        blocks = (np.repeat(cell, kk) << 40) | (i << 20) | j
        t = batch.take(pa.array(idx, pa.int64()))
        return (
            t.append_column("__block", pa.array(blocks, pa.int64()))
            .append_column("__ci", pa.array(i.astype(np.int32), pa.int32()))
            .append_column("__cj", pa.array(j.astype(np.int32), pa.int32()))
            .append_column("__chunk", pa.array(c_rep.astype(np.int32), pa.int32()))
        )

    def block_dups(group: pd.DataFrame) -> pa.Table:
        ci, cj = int(group["__ci"].iloc[0]), int(group["__cj"].iloc[0])
        left = group[group["__chunk"] == ci]
        if len(left) == 0 or (ci != cj and (group["__chunk"] == cj).sum() == 0):
            return pa.table({"vec_id": pa.array([], pa.int64())})
        ids_l = left["vec_id"].to_numpy().astype(np.int64)
        mat_l = embed_matrix(left["embedding"])
        nl = np.linalg.norm(mat_l, axis=1); nl[nl == 0] = 1.0
        if ci == cj:
            sims = (mat_l @ mat_l.T) / np.outer(nl, nl)
            iu = np.triu_indices(len(ids_l), k=1)
            mask = sims[iu] >= SEMDEDUP_THRESHOLD
            a, b = ids_l[iu[0][mask]], ids_l[iu[1][mask]]
        else:
            right = group[group["__chunk"] == cj]
            ids_r = right["vec_id"].to_numpy().astype(np.int64)
            mat_r = embed_matrix(right["embedding"])
            nr = np.linalg.norm(mat_r, axis=1); nr[nr == 0] = 1.0
            sims = (mat_l @ mat_r.T) / np.outer(nl, nr)
            ii, jj = np.nonzero(sims >= SEMDEDUP_THRESHOLD)
            a, b = ids_l[ii], ids_r[jj]
        dup = np.unique(np.maximum(a, b))
        return pa.table({"vec_id": pa.array(dup, pa.int64())})

    dups = (
        cells.map_batches(expand, batch_format="pyarrow")
        .groupby("__block")
        .map_groups(block_dups, batch_format="pandas")
    )

    def tag_cell(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "cell": batch["cell"].cast(pa.int64()),
                "is_dup": pa.array(np.zeros(batch.num_rows, dtype=bool)),
                "vbucket": pa.array(_doc_bucket(ids, num_buckets)),
            }
        )

    def tag_dup(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "cell": pa.nulls(batch.num_rows, pa.int64()),
                "is_dup": pa.array(np.ones(batch.num_rows, dtype=bool)),
                "vbucket": pa.array(_doc_bucket(ids, num_buckets)),
            }
        )

    def resolve(group: pd.DataFrame) -> pa.Table:
        dup_ids = set(group.loc[group["is_dup"], "vec_id"].astype("int64"))
        c = group.loc[~group["is_dup"]]
        ids = c["vec_id"].astype("int64").to_numpy()
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(c["cell"].astype("int64"), pa.int64()),
                "keep": pa.array([int(v) not in dup_ids for v in ids]),
            }
        )

    roster = cells.map_batches(
        lambda b: b.select(["vec_id", "cell"]), batch_format="pyarrow"
    )
    union = roster.map_batches(tag_cell, batch_format="pyarrow").union(
        dups.map_batches(tag_dup, batch_format="pyarrow")
    )
    return union.groupby("vbucket").map_groups(resolve, batch_format="pandas")


# ------------------------------------------------------------------- k-means

# Distributed Lloyd's k-means over the embedding column — the classic
# iterative-ML loop (assignment map → per-cell partial sums → tiny
# aggregate → broadcast new centroids → repeat). Everything is
# integer-exact so DuckDB replays every round bit-for-bit: vectors are
# quantized once (round(v·1024)), centroids start as the first K quantized
# vectors (Forgy init on vec_id < K) and are RE-QUANTIZED after every mean
# (sum and count are integers, sum/count is the correctly-rounded IEEE
# quotient on both engines, and round-half-away is the shared convention).
# Cells that lose all members vanish from the next round on both engines.
KM_CELLS = 16
KM_ITERS = 2  # centroid updates; assignments run KM_ITERS + 1 times


def _kmeans_sql() -> str:
    dist = (
        "list_sum(list_transform(range(1, len(e.qv) + 1), "
        "i -> (e.qv[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) ** 2))"
    )
    parts = [
        f"""WITH e AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * {IVF_QSCALE})) AS qv
  FROM embeddings
),
c0 AS (SELECT vec_id AS cell, qv AS cv FROM e WHERE vec_id < {KM_CELLS})"""
    ]
    for t in range(KM_ITERS + 1):
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cell) AS rn
    FROM e, c{t} c
  ) WHERE rn = 1
)"""
        )
        if t < KM_ITERS:
            parts.append(
                f"""c{t + 1} AS (
  SELECT cell, list(cvd ORDER BY d) AS cv FROM (
    SELECT a.cell, d,
           round(CAST(sum(e.qv[CAST(d AS INT)]) AS DOUBLE) / count(*)) AS cvd
    FROM a{t} a JOIN e USING (vec_id), UNNEST(range(1, 65)) AS t(d)
    GROUP BY a.cell, d
  ) GROUP BY cell
)"""
            )
    parts_sql = ",\n".join(parts)
    return f"""{parts_sql}
SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a{KM_ITERS}
"""


EMBEDDING_KMEANS_SQL = _kmeans_sql()


def embedding_kmeans(sf_dir: str, iters: int = KM_ITERS):
    """Distributed k-means: each round is ONE stateless assignment +
    partial-sum map over the corpus (centroids broadcast via ray.put), a
    (cell × dim)-row groupby (constant-size exchange: K·D rows per block,
    K·D groups total), and an O(K·D) driver reduction — the canonical
    topology for iterative fitting at 100 TB. The assignment argmin is one
    float64 matmul per batch over integer-valued operands (< 2^53, exact)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    path = os.path.join(sf_dir, "embeddings.parquet")
    ds = rd.read_parquet(path, columns=["vec_id", "embedding"])

    seed = pq.read_table(
        path, columns=["vec_id", "embedding"], filters=[("vec_id", "<", KM_CELLS)]
    )
    order = np.argsort(np.asarray(seed["vec_id"].to_pylist()))
    cent_ids = np.asarray(seed["vec_id"].to_pylist(), dtype=np.int64)[order]
    cents = _ivf_quantize(embed_matrix(seed["embedding"])[order])

    def _assign(qv: np.ndarray, cents_: np.ndarray) -> np.ndarray:
        # argmin ||x-c||² = argmin (||c||² - 2 x·c); ties → first (lowest) cell
        scores = -2.0 * (qv @ cents_.T) + (cents_ * cents_).sum(axis=1)[None, :]
        return np.argmin(scores, axis=1)

    for _ in range(iters):
        cref = put_broadcast((cent_ids, cents))

        def partial_sums(batch: pa.Table) -> pa.Table:
            ids_, cs = resolve_broadcast(cref)
            qv = _ivf_quantize(embed_matrix(batch["embedding"]))
            cell_idx = _assign(qv, cs)
            out_cell, out_dim, out_s, out_n = [], [], [], []
            for k in range(len(ids_)):
                m = cell_idx == k
                if not m.any():
                    continue
                sums = qv[m].sum(axis=0)
                d = qv.shape[1]
                out_cell.extend([int(ids_[k])] * d)
                out_dim.extend(range(d))
                out_s.extend(int(x) for x in sums)
                out_n.extend([int(m.sum())] * d)
            return pa.table(
                {
                    "cell": pa.array(out_cell, pa.int64()),
                    "dim": pa.array(out_dim, pa.int64()),
                    "s_part": pa.array(out_s, pa.int64()),
                    "n_part": pa.array(out_n, pa.int64()),
                }
            )

        agg = (
            ds.map_batches(partial_sums, batch_format="pyarrow")
            .groupby(["cell", "dim"])
            .aggregate(Sum("s_part", alias_name="s"), Sum("n_part", alias_name="n"))
            .to_pandas()
        )
        from ..core.rounding import np_round_half_away as _rha

        agg = agg.sort_values(["cell", "dim"])
        new_ids = np.asarray(sorted(agg["cell"].unique()), dtype=np.int64)
        d = int(agg["dim"].max()) + 1
        new_cents = np.empty((len(new_ids), d), dtype=np.float64)
        for row, cid in enumerate(new_ids):
            sub = agg[agg["cell"] == cid]
            new_cents[row] = _rha(
                sub["s"].to_numpy().astype(np.float64) / sub["n"].to_numpy().astype(np.float64),
                0,
            )
        cent_ids, cents = new_ids, new_cents

    cref_final = put_broadcast((cent_ids, cents))

    def final_assign(batch: pa.Table) -> pa.Table:
        ids_, cs = resolve_broadcast(cref_final)
        qv = _ivf_quantize(embed_matrix(batch["embedding"]))
        cell_idx = _assign(qv, cs)
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "cell": pa.array(ids_[cell_idx], pa.int64()),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")


# -------------------------------------------------------- ann_hybrid_search

# Hybrid retrieval: keyword-filter THEN vector-rank — the RAG-serving
# staple (restrict candidates to documents containing a query term, rank
# the survivors by embedding cosine). The term filter is map-only over
# documents; survivors semi-join the embedding store through ONE bucketed
# int-key exchange (no driver-side id set — the filtered corpus can be
# arbitrarily large at 100 TB); ranking reuses the brute-force partial
# top-k + merge machinery (same (sim DESC, vec_id) total order and
# round-half-away emission as ann_topk, so cross-block ties are safe).
HYBRID_TERM = "vector"
# single shared RE2 boundary pattern (corpus_phrase_search precedent):
# Arrow match_substring_regex and DuckDB regexp_matches are both RE2, so
# token membership is engine-identical by construction
from .text import ASCII_WS as _HY_WS  # noqa: E402  (appended section)

_HYBRID_RE = f"(^|[{_HY_WS}]){HYBRID_TERM}([{_HY_WS}]|$)"

ANN_HYBRID_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
docs_f AS (
  SELECT doc_id FROM documents
  WHERE regexp_matches(lower(text), '{_HYBRID_RE}')
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
  FROM q
  JOIN embeddings e ON e.vec_id <> q.query_id
  JOIN docs_f d ON d.doc_id = e.vec_id
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       round(sim, 4) AS cos_sim
FROM sims
QUALIFY rank <= {TOP_K}
"""


def ann_hybrid_search(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    from .dedup import NUM_JOIN_BUCKETS, _bucketed_attach

    path = os.path.join(sf_dir, "embeddings.parquet")
    queries_ref = put_broadcast(_read_queries(path))

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def term_filter(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring_regex(
            pc.utf8_lower(batch["text"].cast(pa.string())), _HYBRID_RE
        )
        t = batch.filter(keep)
        return pa.table(
            {"doc_id": t["doc_id"].cast(pa.int64()), "payload": pa.repeat(1, t.num_rows)}
        )

    doc_ids = docs.map_batches(term_filter, batch_format="pyarrow")
    emb = rd.read_parquet(path, columns=["vec_id", "embedding"])

    def emb_fields(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": batch["vec_id"].cast(pa.int64()), "embedding": batch["embedding"]}
        )

    survivors = _bucketed_attach(
        emb.map_batches(emb_fields, batch_format="pyarrow"),
        doc_ids,
        key_col="vec_id",
        payload_type=pa.int64(),
        out_col="__hit",
        pair_fields=[("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))],
        num_buckets=NUM_JOIN_BUCKETS,
    )

    def batch_topk(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch["__hit"]))
        if t.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        q = resolve_broadcast(queries_ref)
        vec_ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        mat = embed_matrix(t["embedding"])
        sims = q["mat"] @ _normalize(mat).T
        return _partial_topk(q["ids"], sims, vec_ids)

    partials = survivors.map_batches(batch_topk, batch_format="pyarrow", batch_size=4096)
    return partials.groupby("query_id").map_groups(_merge_topk, batch_format="pandas")
