"""ANN: IVF-bucketed variant must recover most of the brute-force top-k."""


def test_ivf_recall_vs_brute_force(ray_session, sf_dir):
    from rdf_xml_ex_ray.pipelines.similarity import TOP_K, ann_ivf_topk, ann_topk

    brute = ann_topk(sf_dir).to_pandas()
    ivf = ann_ivf_topk(sf_dir).to_pandas()
    recalls = []
    for qid, g in brute.groupby("query_id"):
        want = set(g["vec_id"])
        got = set(ivf[ivf["query_id"] == qid]["vec_id"])
        recalls.append(len(want & got) / TOP_K)
    mean_recall = sum(recalls) / len(recalls)
    # the round-3 quantizer trades Lloyd-adapted centroids (r2 recall 0.89)
    # for an integer-exact codebook that DuckDB replays bit-for-bit — on the
    # near-uniform synthetic embeddings a fixed codebook probing 6/16 cells
    # recovers 0.54-0.64 of the exact top-k across sf0.001-0.1
    assert mean_recall >= 0.45, f"IVF recall too low: {mean_recall}"
    assert len(ivf) > 0


def test_lsh_recall_vs_brute_force(ray_session, sf_dir):
    """Sign-LSH with Hamming-1 probing scans ~5/16 of the data; recall
    against exact top-k should still be substantial."""
    from rdf_xml_ex_ray.pipelines.similarity import TOP_K, ann_lsh_topk, ann_topk

    brute = ann_topk(sf_dir).to_pandas()
    lsh = ann_lsh_topk(sf_dir).to_pandas()
    recalls = []
    for qid, g in brute.groupby("query_id"):
        want = set(g["vec_id"])
        got = set(lsh[lsh["query_id"] == qid]["vec_id"])
        recalls.append(len(want & got) / TOP_K)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.4, f"LSH recall too low: {mean_recall}"
    assert len(lsh) > 0


def test_knn_ann_recall_floor_sf01(ray_session):
    """The recall-targeted default config (probe = cells // 2) must hold
    recall@5 >= 0.8 on the sf0.1 corpus. The sf* embeddings are isotropic
    noise (no label geometry), the worst case for any cell-probing index —
    recall ~= probed mass there — so this floor pins the honest price of
    the target on unstructured data (probing half the corpus, 2x under
    brute force). Structured data hits the same recall at a fraction of
    the mass (see test_knn_ann_clustered_low_mass)."""
    import os

    import pytest

    sf_dir = "/root/testdata/sf0.1"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        pytest.skip("sf0.1 testdata not present")
    from rdf_xml_ex_ray.pipelines.similarity import knn_recall_eval

    ev = knn_recall_eval(sf_dir).to_pandas()
    recall = ev["n_hits"].sum() / ev["k"].sum()
    assert recall >= 0.8, f"knn_graph_ann recall@5 below floor: {recall:.3f}"


def test_knn_ann_clustered_low_mass(ray_session, tmp_path):
    """On data with cluster structure (the production regime for near-dup
    embeddings), the SAME quantizer reaches recall@5 >= 0.9 while probing
    only ~1/8 of the cells (~17% of corpus mass) — the scale path the
    isotropic sf* tables cannot exercise."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_xml_ex_ray.pipelines.similarity import _knn_config, knn_recall_eval

    rng = np.random.RandomState(42)
    ncl, per, dim = 16, 64, 64
    centers = rng.randn(ncl, dim)
    pts = np.repeat(centers, per, axis=0) + 0.25 * rng.randn(ncl * per, dim)
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    n = len(pts)
    cells, _ = _knn_config(n)
    assert cells == 32  # n=1024 -> 32 cells under the corpus-scaled rule
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in pts], pa.list_(pa.float32())
                ),
                "label": pa.array(np.repeat(np.arange(ncl), per), pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    ev = knn_recall_eval(str(tmp_path), probe=4).to_pandas()
    recall = ev["n_hits"].sum() / ev["k"].sum()
    assert recall >= 0.9, f"clustered recall@5 at probe=4/32: {recall:.3f}"


def test_knn_graph_empty_residue_chunk(ray_session, tmp_path):
    """All-even vec_ids with a tiny chunk_cap force an EMPTY residue class:
    a non-diagonal block group then contains only queries, which must yield
    no pairs (role-inferred diagonal detection used to self-pair here and
    duplicate ranks)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_xml_ex_ray.pipelines.similarity import KNN_GRAPH_SQL, knn_graph

    rng = np.random.RandomState(3)
    n = 40
    emb = rng.randn(n, 8).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n) * 2, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, r)) for r in emb], pa.list_(pa.float32())
                ),
                "label": pa.array(np.zeros(n), pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS FROM '{tmp_path}/embeddings.parquet'")
    r = knn_graph(str(tmp_path), chunk_cap=32).to_pandas()
    o = con.execute(KNN_GRAPH_SQL).df()
    cols = sorted(r.columns)
    a = r[cols].sort_values(cols).reset_index(drop=True)
    b = o[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if a[c].dtype.kind == "f":
            a[c] = a[c].round(6); b[c] = b[c].round(6)
    assert len(a) == len(b) and a.equals(b)
