"""Edge cases for the quality-filter family: repetition ratio, fixed-point
logreg scoring, and benchmark decontamination. The oracle gate + randomized
parity cover SQL equality; these pin the operator-side boundary semantics."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _doc_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_repetition_short_docs_excluded():
    from rdf_xml_ex_ray.pipelines.text import doc_repetition_batch

    out = doc_repetition_batch(_doc_table(["solo", "", "two words"]))
    # 1-word docs have no bigrams -> no row (matches the SQL's empty range)
    assert out["doc_id"].to_pylist() == [2]
    assert out["n_grams"].to_pylist() == [1]
    assert out["rep_ratio"].to_pylist() == [0.0]


def test_repetition_all_same_word():
    from rdf_xml_ex_ray.pipelines.text import doc_repetition_batch

    out = doc_repetition_batch(_doc_table(["x x x x x"]))
    # 4 bigrams, 1 distinct -> 3/4 repeated
    assert out["n_grams"].to_pylist() == [4]
    assert out["n_distinct"].to_pylist() == [1]
    assert out["rep_ratio"].to_pylist() == [0.75]


def test_quality_logreg_decision_boundary(ray_session, tmp_path):
    from rdf_xml_ex_ray.pipelines.text import QUALITY_WEIGHTS, doc_quality_logreg

    # craft a doc with score exactly 0: bias -900, so need
    # 5*n_words + 1*n_chars + 10*n_distinct == 900
    # "aa bb cc ... " with k distinct 2-char words: words=k, chars=3k-1,
    # distinct=k -> 5k + 3k - 1 + 10k = 18k - 1; k=50 -> 899 (score -1).
    # Add one char to one word: chars=3k -> score 0 -> keep=1.
    words = [f"a{i:02d}" for i in range(49)] + ["b" * 4]  # 49*3 + 4 chars + 49 spaces
    text = " ".join(words)
    n_words, n_chars, n_distinct = 50, len(text), 50
    score = (
        QUALITY_WEIGHTS["bias"]
        + QUALITY_WEIGHTS["n_words"] * n_words
        + QUALITY_WEIGHTS["n_chars"] * n_chars
        + QUALITY_WEIGHTS["n_distinct"] * n_distinct
    )
    pq.write_table(_doc_table([text]), tmp_path / "documents.parquet")
    out = doc_quality_logreg(str(tmp_path)).to_pandas()
    assert out["score"].tolist() == [score]
    assert out["keep"].tolist() == [1 if score >= 0 else 0]


def test_decontaminate_bench_docs_never_emitted(ray_session, tmp_path):
    from rdf_xml_ex_ray.pipelines.corpus import DECON_BENCH_MOD, doc_decontaminate

    # doc 0 is benchmark (0 % mod == 0); doc 1 copies its text (fully
    # contaminated); doc 2 shares nothing.
    texts = {0: "alpha beta gamma delta epsilon", 1: "alpha beta gamma delta epsilon", 2: "zeta eta theta iota kappa"}
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }
    )
    assert 0 % DECON_BENCH_MOD == 0 and 1 % DECON_BENCH_MOD != 0
    pq.write_table(t, tmp_path / "documents.parquet")
    out = doc_decontaminate(str(tmp_path)).to_pandas()
    # only doc 1 appears: benchmark docs and clean docs emit no row
    assert out["doc_id"].tolist() == [1]
    # 3 distinct word-3-grams in a 5-word doc, all shared
    assert out["n_shared"].tolist() == [3]


def test_bigram_lm_no_cross_doc_pairs(ray_session, tmp_path):
    from rdf_xml_ex_ray.pipelines.corpus import token_bigram_lm

    # "b a" would only exist as a cross-document pair — it must not appear
    pq.write_table(_doc_table(["a b", "a b"]), tmp_path / "documents.parquet")
    out = token_bigram_lm(str(tmp_path)).to_pandas()
    assert out[["w1", "w2", "n"]].values.tolist() == [["a", "b", 2]]


def test_retention_same_day_events_dedup(ray_session, tmp_path):
    import pyarrow as pa

    from rdf_xml_ex_ray.pipelines.streaming import DAY_US, events_retention

    # user 1: three events on day 0, one on day 2 -> cells (0,0)=1, (0,2)=1
    # user 2: first seen day 2 -> cohort 2, cell (2,0)=1
    ts = pa.array(
        [10, 20, 30, 2 * DAY_US + 5, 2 * DAY_US + 7], pa.timestamp("us")
    )
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "ts": ts,
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = events_retention(str(tmp_path)).to_pandas()
    got = sorted(map(tuple, out[["cohort_day", "day_offset", "n_users"]].values.tolist()))
    assert got == [(0, 0, 1), (0, 2, 1), (2, 0, 1)]
