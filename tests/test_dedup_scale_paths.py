"""The distributed (beyond-cap) paths of dedup_minhash and dedup_clusters
must produce the identical answer to the bounded broadcast fast paths —
forced here by zeroing the caps. This is what keeps the 100 TB topology
(bucketed semi-join shingle shipping; label⋈edge join propagation)
oracle-true even though the small-scale gate naturally takes the fast path.
"""


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


def test_minhash_scale_path_matches_fast_path(ray_session, sf_dir):
    from rdf_xml_ex_ray.pipelines.dedup import dedup_minhash

    cols = ["doc_a", "doc_b"]
    fast = _sorted(dedup_minhash(sf_dir).to_pandas(), cols)
    scale = _sorted(dedup_minhash(sf_dir, broadcast_pair_cap=0).to_pandas(), cols)
    assert len(fast) > 0
    assert fast.equals(scale)


def test_clusters_distributed_propagation_matches_broadcast(ray_session, sf_dir):
    from rdf_xml_ex_ray.pipelines.dedup import dedup_clusters

    broad = _sorted(dedup_clusters(sf_dir).to_pandas(), ["doc_id"])
    dist = _sorted(dedup_clusters(sf_dir, broadcast_edge_cap=0).to_pandas(), ["doc_id"])
    assert (broad["cluster_id"] != broad["doc_id"]).any()  # real clusters exist
    assert broad.equals(dist)


def test_reachability_distributed_matches_broadcast(ray_session, sf_dir):
    from rdf_xml_ex_ray.pipelines.graph import kg_reachability

    broad = _sorted(kg_reachability(sf_dir).to_pandas(), ["node"])
    dist = _sorted(kg_reachability(sf_dir, broadcast_edge_cap=0).to_pandas(), ["node"])
    assert len(broad) > 1 and broad["depth"].max() >= 2
    assert broad.equals(dist)


def test_pagerank_distributed_matches_broadcast(ray_session, sf_dir):
    from rdf_xml_ex_ray.pipelines.graph import kg_pagerank

    broad = _sorted(kg_pagerank(sf_dir).to_pandas(), ["entity"])
    dist = _sorted(kg_pagerank(sf_dir, broadcast_node_cap=0).to_pandas(), ["entity"])
    assert len(broad) > 1 and (broad["pr_micro"] > 1_000_000).any()  # mass moved
    assert broad.equals(dist)


def test_describe_scale_path_matches_fast_path(ray_session, sf_dir):
    from rdf_xml_ex_ray.pipelines.graph import kg_describe

    cols = ["subj", "pred", "obj_value"]
    fast = _sorted(kg_describe(sf_dir).to_pandas(), cols)
    dist = _sorted(kg_describe(sf_dir, broadcast_node_cap=0).to_pandas(), cols)
    assert len(fast) > 0
    assert fast.equals(dist)


def test_triangle_count_scale_paths_match(ray_session, sf_dir):
    """All four regime combinations agree: guarded broadcast (rank map +
    sorted key array) vs bucketed-attach distributed (cap=0), and the
    block-local co-partitioned edge build vs the general sbucket shuffle."""
    from rdf_xml_ex_ray.pipelines.graph import kg_triangle_count

    cols = ["entity", "n_triangles"]
    fast = _sorted(kg_triangle_count(sf_dir).to_pandas(), cols)
    dist = _sorted(
        kg_triangle_count(sf_dir, broadcast_edge_cap=0).to_pandas(), cols
    )
    general = _sorted(
        kg_triangle_count(
            sf_dir, co_partitioned=False, broadcast_edge_cap=0
        ).to_pandas(),
        cols,
    )
    assert len(fast) > 0 and (fast["n_triangles"] > 0).all()
    assert fast.equals(dist)
    assert fast.equals(general)
