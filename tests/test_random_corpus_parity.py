"""Randomized-corpus oracle parity: seeded random documents (mixed
languages, near-duplicate injections, whitespace noise) must keep operator ≡
oracle for the most intricate SQL twins (minhash banding simulation, simhash
bit arithmetic, winnowing, token counting, ngram jaccard). Fixed test data
can hide divergences (the sf0.1 run caught two); random corpora widen the
net while staying deterministic."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

VOCAB = (
    "the a an and or of to in is it that for data model graph node edge "
    "stream batch shard bucket hash sort merge join scan der die das und "
    "ist nicht el la los de que le les et un une alpha beta gamma delta"
).split()


def _make_corpus(seed: int, n_docs: int = 80):
    rng = np.random.RandomState(seed)
    texts = []
    for i in range(n_docs):
        n = rng.randint(0, 60)
        words = [VOCAB[rng.randint(len(VOCAB))] for _ in range(n)]
        texts.append(" ".join(words))
    # inject near-duplicate clusters (drives minhash/simhash/ngram)
    for _ in range(n_docs // 6):
        src = rng.randint(n_docs)
        dst = rng.randint(n_docs)
        if src == dst or not texts[src]:
            continue
        words = texts[src].split(" ")
        if len(words) > 3:
            words[rng.randint(len(words))] = VOCAB[rng.randint(len(VOCAB))]
        texts[dst] = " ".join(words)
    # whitespace / punctuation noise
    for _ in range(n_docs // 8):
        k = rng.randint(n_docs)
        texts[k] = texts[k] + rng.choice([" \t tail", "  double  space", " it's!", " end."])
    return texts


OPS = ["dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard", "dedup_clusters",
       "token_count", "doc_winnow", "lang_id", "doc_stats", "doc_pii_scrub",
       "doc_repetition", "doc_quality_logreg", "doc_decontaminate",
       "token_bigram_lm", "doc_chunk", "token_collocations",
       "token_heavy_hitters",
       "doc_substring_dedup", "doc_blocklist_filter", "doc_lm_coverage"]


@pytest.mark.parametrize("seed", [101, 202, 303])
@pytest.mark.parametrize("name", OPS)
def test_random_corpus_oracle_parity(ray_session, tmp_path_factory, seed, name):
    import duckdb

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp(f"rand{seed}")
    texts = _make_corpus(seed)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")

    result = e.queries()[name](str(d))
    rdf = result.to_pandas() if hasattr(result, "to_pandas") else result
    sdf = con.execute(e.oracle_sql()[name]).fetchdf()
    cols = sorted(rdf.columns)
    assert cols == sorted(sdf.columns)
    a = rdf[cols].sort_values(cols).reset_index(drop=True)
    b = sdf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if a[c].dtype.kind == "f":
            a[c] = a[c].round(6)
            b[c] = b[c].round(6)
    assert len(a) == len(b), f"{name} seed={seed}: {len(a)} vs {len(b)} rows"
    assert a.equals(b[cols]), f"{name} seed={seed} diverges"
