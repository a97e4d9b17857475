"""Randomized-embeddings oracle parity: seeded random vectors with
DELIBERATE exact-duplicate injections (cosine ties at the top-k boundary)
must keep every similarity operator ≡ its oracle. The synthetic embeddings
table has no duplicate vectors, so rank-tie resolution (sim DESC, vec_id)
is never exercised by the driver gate. Vectors are never exactly zero —
the documented precondition (list_cosine_similarity of a zero vector is
undefined on both engines)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _make_embeddings(seed: int, n: int = 300, dim: int = 64):
    rng = np.random.RandomState(seed)
    mat = rng.randn(n, dim).astype(np.float32)
    # inject exact duplicates (~15%): rank ties resolve by vec_id
    for _ in range(n // 7):
        a, b = rng.randint(n), rng.randint(n)
        if a != b:
            mat[b] = mat[a]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 10).astype(np.int32), pa.int32()),
        }
    )


EMB_OPS = [
    "ann_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_filtered_topk",
    "ann_range_search", "embedding_centroids", "embedding_pq",
    "knn_graph", "knn_graph_ann", "knn_recall_eval", "ann_recall_eval",
    "ann_pq_topk", "doc_semdedup", "embedding_kmeans", "dedup_embedding",
]


@pytest.mark.parametrize("seed", [43, 71])
@pytest.mark.parametrize("name", EMB_OPS)
def test_random_embeddings_oracle_parity(ray_session, tmp_path_factory, seed, name):
    import duckdb

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp(f"randemb{seed}")
    pq.write_table(_make_embeddings(seed), d / "embeddings.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")

    result = e.queries()[name](str(d))
    rdf = result.to_pandas() if hasattr(result, "to_pandas") else result
    sdf = con.execute(e.oracle_sql()[name]).fetchdf()
    cols = sorted(rdf.columns)
    assert cols == sorted(sdf.columns)
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = sdf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if a[c].dtype.kind == "f":
            a[c] = a[c].round(6); b[c] = b[c].round(6)
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    assert a.equals(b[cols]), f"{name} diverges on random embeddings (seed {seed})"
