"""Corpus clean+dedup materialization job: fresh run, clean resume,
crash-resume (stale stage-2 partials must be discarded), and content
integrity (the stored corpus is exactly corpus_clean's survivor set with
original text attached)."""

import json
import os


def test_clean_job_fresh_resume_and_content(ray_session, tmp_path):
    import ray.data as rd

    from rdf_xml_ex_ray.pipelines.corpus import corpus_clean, run_clean_job

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus_store")
    lineage = run_clean_job(sf, out, num_buckets=8)
    assert lineage["n_docs"] > 0
    assert os.path.exists(os.path.join(out, "_SUCCESS"))

    # resume after success: recorded lineage, no recompute
    again = run_clean_job(sf, out, num_buckets=8)
    assert again == lineage

    # content: store ids == corpus_clean survivor ids; text matches source
    store = rd.read_parquet(os.path.join(out, "corpus")).to_pandas()
    surv = corpus_clean(sf).to_pandas()
    assert sorted(store["doc_id"]) == sorted(surv["doc_id"])
    src = rd.read_parquet(os.path.join(sf, "documents.parquet")).to_pandas()
    merged = store.merge(src[["doc_id", "text"]], on="doc_id", suffixes=("", "_src"))
    assert (merged["text"] == merged["text_src"]).all()


def test_clean_job_crash_resume_discards_stale_partials(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from rdf_xml_ex_ray.pipelines.corpus import run_clean_job

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus_store")
    clean = run_clean_job(sf, out, num_buckets=8)

    os.remove(os.path.join(out, "_SUCCESS"))
    stale_dir = os.path.join(out, "corpus", "doc_bucket=0")
    os.makedirs(stale_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10**9], pa.int64()),
                "text": pa.array(["stale row"], pa.string()),
                "source": pa.array(["stale"], pa.string()),
                "pred_lang": pa.array(["en"], pa.string()),
            }
        ),
        os.path.join(stale_dir, "zz-stale.parquet"),
    )

    resumed = run_clean_job(sf, out, num_buckets=8)
    assert resumed["n_docs"] == clean["n_docs"], "stale partials leaked into the store"
    store = rd.read_parquet(os.path.join(out, "corpus")).to_pandas()
    assert 10**9 not in set(store["doc_id"])
