"""True-BPE token counting (pluggable merge table) pinned against the
pretokenizer estimator and hand-computed merges."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_bpe_symbol_count_hand_cases():
    from rdf_xml_ex_ray.pipelines.text import _bpe_symbol_count

    ranks = {("h", "e"): 0, ("l", "l"): 1, ("he", "ll"): 2, ("hell", "o"): 3}
    # hello: he+ll → hell → hello: 1 symbol
    assert _bpe_symbol_count("hello", ranks) == 1
    # hell: he, ll, hell: 1
    assert _bpe_symbol_count("hell", ranks) == 1
    # help: he,l,p (no further merges): 3
    assert _bpe_symbol_count("help", ranks) == 3
    # no applicable merges → one symbol per char
    assert _bpe_symbol_count("xyz", ranks) == 3
    # merge applies at EVERY occurrence of the best pair in one step
    assert _bpe_symbol_count("llll", {("l", "l"): 0, ("ll", "ll"): 1}) == 1


def test_count_bpe_tokens_vs_pretokens():
    from rdf_xml_ex_ray.pipelines.text import _bpe_tok_pat, count_bpe_tokens

    ranks = {("h", "e"): 0, ("l", "l"): 1, ("he", "ll"): 2}
    text = "hello hello world"
    pretokens = _bpe_tok_pat.findall(text)
    n = count_bpe_tokens(text, ranks)
    # every pretoken contributes >= 1 symbol; chars is the no-merge ceiling
    assert len(pretokens) <= n <= len(text)
    # 'hello'→hell,o =2 ; ' hello'→' ',hell,o? no — pretoken is ' hello':
    # symbols [' ',h,e,l,l,o] → [' ',he,ll,o] → [' ',hell,o] = 3
    # ' world' → no merges → 6 chars
    assert n == 2 + 3 + 6
    # empty merge table degenerates to character count per pretoken
    assert count_bpe_tokens("abc de", {}) == len("abc") + len(" de")


def test_token_count_bpe_dataset(ray_session, sf_dir, tmp_path):
    from rdf_xml_ex_ray.pipelines.text import token_count, token_count_bpe

    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("i", "n")]
    base = token_count(sf_dir).to_pandas().set_index("doc_id").sort_index()
    bpe = token_count_bpe(sf_dir, merges).to_pandas().set_index("doc_id").sort_index()
    # estimator columns identical to the plain operator
    for col in ("n_ws_tokens", "n_bpe_tokens", "n_chars"):
        assert (base[col] == bpe[col]).all()
    # true counts bounded by pretokens below and characters above
    assert (bpe["n_tokens"] >= bpe["n_bpe_tokens"]).all()
    assert (bpe["n_tokens"] <= bpe["n_chars"]).all()
    # the merge table actually merges something on real text
    assert (bpe["n_tokens"] < bpe["n_chars"]).any()


def test_fixture_merges_pinned_totals(ray_session):
    """The shipped fixture merge table (BPE_FIXTURE_MERGES) over the two
    small corpora: exact totals pinned — the correctness record for the
    queries() entry, which has no SQL twin (iterative BPE merging is not
    replayable in a static oracle string)."""
    from rdf_xml_ex_ray.pipelines.text import token_count_bpe_fixture

    expect = {
        "/root/testdata/sf0.001": (500, 93598, {0: 75, 1: 264, 2: 226}),
        "/root/testdata/sf0.01": (500, 90796, {0: 99, 1: 245, 2: 148}),
    }
    for sf_dir, (n_rows, total, spot) in expect.items():
        df = token_count_bpe_fixture(sf_dir).to_pandas()
        assert len(df) == n_rows
        assert int(df["n_tokens"].sum()) == total
        got = df.set_index("doc_id")["n_tokens"]
        for doc_id, n in spot.items():
            assert int(got[doc_id]) == n


def test_fixture_merges_consistent_with_exact_counter():
    """Hand-checkable words under the pinned table, ensuring the pinned
    list round-trips through the rank-dict plumbing."""
    from rdf_xml_ex_ray.pipelines.text import BPE_FIXTURE_MERGES, count_bpe_tokens

    ranks = {tuple(m): i for i, m in enumerate(BPE_FIXTURE_MERGES)}
    assert count_bpe_tokens("data", ranks) == 1
    assert count_bpe_tokens("agg", ranks) == 1
    assert count_bpe_tokens("customer", ranks) == 1
    assert count_bpe_tokens("zzz", ranks) == 3  # no merges apply
