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
