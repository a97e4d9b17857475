"""Unit tests for the corpus-level operators and the generic bucketed
many-to-many equi-join (the oracle gate in test_correctness.py covers the
end-to-end SQL parity; these pin the building blocks and edge cases)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _join_df(result) -> pd.DataFrame:
    df = result.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bucketed_equijoin_many_to_many(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.stages.join import bucketed_equijoin

    left = rd.from_items([{"k": 1, "a": "x"}, {"k": 1, "a": "y"}, {"k": 2, "a": "z"}, {"k": 9, "a": "w"}])
    right = rd.from_items([{"k2": 1, "b": 10}, {"k2": 1, "b": 11}, {"k2": 2, "b": 20}, {"k2": 7, "b": 70}])
    i, s = pa.int64(), pa.string()
    out = bucketed_equijoin(
        left,
        right,
        left_key="k",
        right_key="k2",
        left_fields=[("k", i), ("a", s)],
        right_fields=[("k2", i), ("b", i)],
        num_buckets=4,
    )
    got = _join_df(out)
    exp = (
        pd.DataFrame({"k": [1, 1, 2, 9], "a": ["x", "y", "z", "w"]})
        .merge(pd.DataFrame({"k2": [1, 1, 2, 7], "b": [10, 11, 20, 70]}), left_on="k", right_on="k2")
    )
    exp = exp[["k", "a", "k2", "b"]].sort_values(["k", "a", "k2", "b"]).reset_index(drop=True)
    got = got[["k", "a", "k2", "b"]]
    # 2×2 cross product on k=1, single match on k=2, dangling keys dropped
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) == 5


def test_bucketed_equijoin_string_keys_and_collision(ray_session):
    import ray.data as rd

    from rdf_xml_ex_ray.stages.join import bucketed_equijoin

    s = pa.string()
    left = rd.from_items([{"k": "a", "v": "L"}])
    right = rd.from_items([{"k2": "a", "w": "R"}])
    out = bucketed_equijoin(
        left,
        right,
        left_key="k",
        right_key="k2",
        left_fields=[("k", s), ("v", s)],
        right_fields=[("k2", s), ("w", s)],
        key_type=s,
    ).to_pandas()
    assert out.to_dict("records") == [{"k": "a", "v": "L", "k2": "a", "w": "R"}]

    with pytest.raises(ValueError, match="collision"):
        bucketed_equijoin(
            left,
            right,
            left_key="k",
            right_key="k",
            left_fields=[("k", s)],
            right_fields=[("k", s)],
            key_type=s,
        )


def test_distinct_kmv_estimate_and_exact_paths(ray_session, sf_dir):
    from rdf_xml_ex_ray.pipelines.corpus import KMV_K, distinct_kmv

    import os

    truth = (
        pd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"])
        .groupby("event_type")["user_id"]
        .nunique()
    )
    df = distinct_kmv(sf_dir).to_pandas().set_index("event_type")
    for et, nd in truth.items():
        row = df.loc[et]
        assert row["n_mins"] == min(nd, KMV_K)
        if nd < KMV_K:
            assert row["est_distinct"] == nd  # sketch not full → exact
        else:
            # KMV relative error ~ 1/√(k−2) ≈ 0.18 at k=32; allow 3σ
            assert abs(row["est_distinct"] - nd) < 0.6 * nd

    # below-k path: fewer distinct values than k → exact count, no estimate
    import ray.data as rd

    from rdf_xml_ex_ray.pipelines import corpus

    small = pd.DataFrame({"event_type": ["a"] * 20, "user_id": [i % 5 for i in range(20)]})
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        small.to_parquet(os.path.join(td, "events.parquet"))
        out = corpus.distinct_kmv(td).to_pandas()
    assert out.to_dict("records")[0]["n_mins"] == 5
    assert out.to_dict("records")[0]["est_distinct"] == 5


def test_group_quantiles_tiny_groups(ray_session):
    import os
    import tempfile

    from rdf_xml_ex_ray.pipelines.corpus import group_quantiles

    docs = pd.DataFrame(
        {
            "doc_id": range(5),
            "lang": ["en", "en", "en", "en", "de"],
            "n_chars": [10, 20, 30, 40, 7],
        }
    )
    with tempfile.TemporaryDirectory() as td:
        docs.to_parquet(os.path.join(td, "documents.parquet"))
        out = group_quantiles(td).to_pandas().set_index("lang")
    # en: N=4 → p50 threshold ceil(2.0)=2 → 20; p90 ceil(3.6)=4 → 40
    assert out.loc["en", "p50"] == 20
    assert out.loc["en", "p90"] == 40
    assert out.loc["en", "p99"] == 40
    # single-row group: every percentile is the value itself
    assert out.loc["de", ["p50", "p90", "p99"]].tolist() == [7, 7, 7]


def test_vocab_topk_tiebreak(ray_session):
    import os
    import tempfile

    from rdf_xml_ex_ray.pipelines.corpus import vocab_topk

    docs = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["b a c\ta", "c B  a"]}
    )
    with tempfile.TemporaryDirectory() as td:
        docs.to_parquet(os.path.join(td, "documents.parquet"))
        out = vocab_topk(td, k=3).to_pandas()
    # counts: a=3, b=2 (case-folded), c=2 → tie (b,c) broken alphabetically
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["n"].tolist() == [3, 2, 2]


def test_kg_pattern_join_matches_manual(ray_session, sf_dir):
    """Cross-check the 2-join BGP plan against a single-process pandas
    evaluation of the same pattern over the triple table."""
    from rdf_xml_ex_ray.pipelines.graph import P_TOOL, P_TOOLUSE, P_TURN, kg_pattern_join
    from rdf_xml_ex_ray.pipelines.kg import kg_triples_dataset

    trip = kg_triples_dataset(sf_dir).to_pandas()
    turns = trip[trip["pred"] == P_TURN][["subj", "obj_value"]].rename(
        columns={"subj": "conv", "obj_value": "turn"}
    )
    uses = trip[trip["pred"] == P_TOOLUSE][["subj", "obj_value"]].rename(
        columns={"subj": "turn", "obj_value": "bnode"}
    )
    tools = trip[trip["pred"] == P_TOOL][["subj", "obj_value"]].rename(
        columns={"subj": "bnode", "obj_value": "tool"}
    )
    exp = (
        turns.merge(uses, on="turn").merge(tools, on="bnode")
        .groupby(["conv", "tool"], as_index=False)
        .size()
        .rename(columns={"size": "n_uses"})
        .sort_values(["conv", "tool"])
        .reset_index(drop=True)
    )
    got = (
        kg_pattern_join(sf_dir)
        .to_pandas()
        .sort_values(["conv", "tool"])
        .reset_index(drop=True)[["conv", "tool", "n_uses"]]
    )
    pd.testing.assert_frame_equal(got, exp[["conv", "tool", "n_uses"]], check_dtype=False)


def test_doc_pack_shard_boundaries(ray_session):
    import os
    import tempfile

    from rdf_xml_ex_ray.pipelines.corpus import doc_pack

    # 5 docs × 3 ws-tokens each, budget 4 → cum_before 0,3,6,9,12 → shards 0,0,1,2,3
    docs = pd.DataFrame({"doc_id": range(5), "text": ["a b c"] * 5})
    with tempfile.TemporaryDirectory() as td:
        docs.to_parquet(os.path.join(td, "documents.parquet"))
        out = (
            doc_pack(td, budget=4, num_buckets=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert out["n_tokens"].tolist() == [3, 3, 3, 3, 3]
    assert out["shard_id"].tolist() == [0, 0, 1, 2, 3]


def test_doc_pack_matches_sequential(ray_session, sf_dir):
    """Distributed two-pass prefix-sum == single-process cumsum."""
    import os
    import re

    from rdf_xml_ex_ray.pipelines.corpus import PACK_BUDGET, _WS_TOKEN_PATTERN, doc_pack

    docs = pd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).sort_values("doc_id")
    pat = re.compile(_WS_TOKEN_PATTERN)
    n = docs["text"].map(lambda t: len(pat.findall(t))).to_numpy()
    exp_shard = (np.cumsum(n) - n) // PACK_BUDGET
    out = doc_pack(sf_dir).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_tokens"].tolist() == n.tolist()
    assert out["shard_id"].tolist() == exp_shard.tolist()


def test_token_postings_cap(ray_session):
    import os
    import tempfile

    from rdf_xml_ex_ray.pipelines.corpus import token_postings

    docs = pd.DataFrame({"doc_id": range(30), "text": ["common"] * 30})
    docs.loc[7, "text"] = "common rare"
    with tempfile.TemporaryDirectory() as td:
        docs.to_parquet(os.path.join(td, "documents.parquet"))
        out = token_postings(td, cap=5).to_pandas().set_index("token")
    assert out.loc["common", "df"] == 30  # df counts ALL docs…
    assert out.loc["common", "postings"] == "0,1,2,3,4"  # …postings truncate
    assert out.loc["rare", "df"] == 1
    assert out.loc["rare", "postings"] == "7"


def test_stratified_sample_rates(ray_session, sf_dir):
    from rdf_xml_ex_ray.pipelines.corpus import (
        STRAT_DEFAULT_RATE,
        STRAT_RATES,
        doc_stratified_sample,
    )

    import os

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"])
    out = doc_stratified_sample(sf_dir).to_pandas()
    # per-stratum keep fraction tracks its configured rate (binomial 4σ)
    for lang, total in docs.groupby("lang").size().items():
        rate = STRAT_RATES.get(lang, STRAT_DEFAULT_RATE)
        kept = (out["lang"] == lang).sum()
        sigma = (total * rate * (1 - rate)) ** 0.5
        assert abs(kept - total * rate) <= 4 * sigma + 1, (lang, kept, total)


def test_events_funnel_strict_ordering(ray_session):
    """A click BEFORE the first view must not count; a purchase before the
    first qualifying click must not count."""
    import os
    import tempfile

    from rdf_xml_ex_ray.pipelines.streaming import events_funnel

    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame(
        {
            "event_id": range(8),
            "user_id": [1, 1, 1, 2, 2, 2, 3, 3],
            "ts": [
                base + pd.Timedelta(minutes=m) for m in [5, 1, 10, 1, 2, 0, 3, 4]
            ],
            "event_type": [
                "view", "click", "purchase",      # u1: click@1 < view@5 → stage 1... purchase@10 needs click AFTER view
                "view", "purchase", "click",      # u2: click@0 < view@1, purchase@2 > view but needs click → stage 1
                "click", "view",                  # u3: no view-first click → stage 1
            ],
        }
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    with tempfile.TemporaryDirectory() as td:
        ev.to_parquet(os.path.join(td, "events.parquet"))
        out = events_funnel(td).to_pandas().set_index("user_id")
    assert out.loc[1, "funnel_stage"] == 1  # click precedes first view
    assert out.loc[2, "funnel_stage"] == 1
    assert out.loc[3, "funnel_stage"] == 1
    assert out.loc[3, "t_click_us"] == -1 and out.loc[3, "t_purchase_us"] == -1


def test_corpus_clean_is_conjunction(ray_session, sf_dir):
    """Every emitted doc passes all three conditions; every doc passing all
    three is emitted."""
    from rdf_xml_ex_ray.pipelines.corpus import (
        CLEAN_MIN_STOPWORD_RATIO,
        CLEAN_MIN_WORDS,
        corpus_clean,
        dedup_keep,
    )
    from rdf_xml_ex_ray.pipelines.text import doc_stats, lang_id

    out = corpus_clean(sf_dir).to_pandas()
    stats = doc_stats(sf_dir).to_pandas().set_index("doc_id")
    langs = lang_id(sf_dir).to_pandas().set_index("doc_id")
    kept = set(dedup_keep(sf_dir).to_pandas()["doc_id"])
    expected = {
        d
        for d in stats.index
        if stats.loc[d, "n_words"] >= CLEAN_MIN_WORDS
        and stats.loc[d, "stopword_ratio"] >= CLEAN_MIN_STOPWORD_RATIO
        and langs.loc[d, "pred_lang"] != "und"
        and d in kept
    }
    assert set(out["doc_id"]) == expected
