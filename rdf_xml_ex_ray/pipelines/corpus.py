"""Corpus-level training-data operators: joins, vocabulary, sketches,
quantiles, and the end-to-end dedup "keep one per cluster" materialization.

All five queries here are fully SQL-oracled (column-name-exact DuckDB
twins); every float that crosses the compare boundary is either absent or
derived from the same two integers on both engines (IEEE-deterministic).

Scale notes per operator live in the docstrings; the shared building
blocks are the bucketed many-to-many hash join (stages/join.py) and the
partial-aggregate → small-groupby combiner pattern used across the repo.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import ASCII_WS

# --------------------------------------------------------------- shared SQL

# Little-endian uint64 of the first 8 md5 bytes — the same byte-swizzle the
# minhash oracle uses (dedup.py), so both engines hash identically.


def _md5_le_uint64_sql(expr: str) -> str:
    parts = " || ".join(f"substr(md5({expr}),{i},2)" for i in (15, 13, 11, 9, 7, 5, 3, 1))
    return f"(('0x' || {parts})::UBIGINT)"


def _md5_le_uint64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


# ------------------------------------------------------------ doc_embed_join

DOC_EMBED_JOIN_SQL = """
SELECT d.doc_id AS doc_id, d.lang AS lang, d.n_chars AS n_chars,
       e.vec_id AS vec_id, CAST(e.label AS BIGINT) AS label,
       CAST(len(e.embedding) AS BIGINT) AS emb_dim
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
"""


def doc_embed_join(sf_dir: str):
    """Large×large equi-join (documents ⋈ embeddings on doc_id = vec_id)
    through the generic bucketed hash join: ONE all-to-all exchange, a
    vectorized pandas merge per key bucket, no driver state. The pattern a
    100 TB corpus uses to marry text shards to an embedding store when
    neither side fits in (or should transit) one node."""
    import ray.data as rd

    from ..stages.join import bucketed_equijoin

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]
    )

    def emb_proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "label": batch["label"].cast(pa.int64()),
                "emb_dim": pc.list_value_length(batch["embedding"]).cast(pa.int64()),
            }
        )

    embs = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "label", "embedding"]
    ).map_batches(emb_proj, batch_format="pyarrow")

    i, s = pa.int64(), pa.string()
    return bucketed_equijoin(
        docs,
        embs,
        left_key="doc_id",
        right_key="vec_id",
        left_fields=[("doc_id", i), ("lang", s), ("n_chars", i)],
        right_fields=[("vec_id", i), ("label", i), ("emb_dim", i)],
    )


# --------------------------------------------------------------- vocab_topk

VOCAB_TOPK_K = 100

VOCAB_TOPK_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[{ASCII_WS}]+')) AS token FROM documents
),
counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks WHERE token <> '' GROUP BY token
)
SELECT token, n FROM counts ORDER BY n DESC, token LIMIT {VOCAB_TOPK_K}
"""


def vocab_topk(sf_dir: str, k: int = VOCAB_TOPK_K):
    """Corpus vocabulary: global token frequencies, top-k by count with a
    deterministic (n DESC, token ASC) tiebreak. Fully vectorized Arrow
    tokenize (utf8_lower + split_pattern_regex — no Python loop), in-batch
    partial counts, ONE groupby over the partials, then an EXACT per-block
    top-k prune before the final tiny sort: post-groupby blocks hold
    disjoint tokens, so pruning each block to its own top-k loses nothing
    while the global sort input shrinks from |vocab| to blocks×k."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    split_re = f"[{ASCII_WS}]+"

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(batch["text"].cast(pa.string())), split_re)
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        agg = pa.table({"token": toks}).group_by("token").aggregate([("token", "count")])
        return pa.table(
            {"token": agg["token"], "n_part": agg["token_count"].cast(pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def prune(batch: pa.Table) -> pa.Table:
        t = pa.table({"token": batch["token"].cast(pa.string()), "n": batch["n"].cast(pa.int64())})
        idx = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("token", "ascending")]
        )[:k]
        return t.take(idx)

    return (
        counts.map_batches(prune, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


# ------------------------------------------------------------- distinct_kmv

KMV_K = 32
_TWO64 = "18446744073709551616.0"

DISTINCT_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type,
    {_md5_le_uint64_sql("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM h
)
SELECT event_type,
       CAST(least(nd, {KMV_K}) AS BIGINT) AS n_mins,
       CAST(hv AS VARCHAR) AS kth_hash,
       CAST(CASE WHEN nd < {KMV_K} THEN nd
                 ELSE floor(CAST({KMV_K - 1} AS DOUBLE) * {_TWO64} / CAST(hv AS DOUBLE))
            END AS BIGINT) AS est_distinct
FROM r WHERE rn = least(nd, {KMV_K})
"""


def distinct_kmv(sf_dir: str, k: int = KMV_K):
    """K-minimum-values distinct-count sketch: per event_type, the k
    smallest distinct md5-LE-uint64 user hashes; estimate = floor((k-1) ·
    2⁶⁴ / kth_min) once the sketch is full, exact count below k. Unlike
    HLL this is exactly SQL-replayable (the estimate divides the same two
    integers on both engines), while keeping the sketch property that
    matters at 100 TB: each batch contributes at most k rows per group, so
    the exchange is O(blocks · k), never O(distinct users).

    md5 here is the oracle-parity choice (one Python call per row, same
    trade as doc_fingerprint); a production run would swap in a vectorized
    64-bit hash — the merge topology is unchanged."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pylist(),
                "hv": np.fromiter(
                    (_md5_le_uint64(str(u)) for u in batch["user_id"].to_pylist()),
                    dtype=np.uint64,
                    count=batch.num_rows,
                ),
            }
        ).drop_duplicates()
        pruned = df.sort_values(["event_type", "hv"]).groupby("event_type", sort=False).head(k)
        return pa.table(
            {
                "event_type": pa.array(pruned["event_type"], pa.string()),
                "hv": pa.array(pruned["hv"].to_numpy(), pa.uint64()),
            }
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        et = group["event_type"].iloc[0]
        mins = np.sort(np.unique(group["hv"].to_numpy().astype(np.uint64)))[:k]
        n_mins = len(mins)
        kth = int(mins[-1])
        if n_mins < k:
            est = n_mins
        else:
            est = int(np.floor(float(k - 1) * 2.0**64 / float(kth)))
        return pa.table(
            {
                "event_type": pa.array([et], pa.string()),
                "n_mins": pa.array([n_mins], pa.int64()),
                "kth_hash": pa.array([str(kth)], pa.string()),
                "est_distinct": pa.array([est], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
    )


# ---------------------------------------------------------- group_quantiles

# integer-exact quantile definition shared by both engines: the smallest
# value whose cumulative count reaches ceil(p·N/100), with the ceiling as
# pure integer arithmetic — no float thresholds anywhere.
GROUP_QUANTILES_SQL = """
WITH c AS (
  SELECT lang, n_chars, count(*) AS cnt FROM documents GROUP BY lang, n_chars
),
w AS (
  SELECT lang, n_chars,
         sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
         sum(cnt) OVER (PARTITION BY lang) AS total
  FROM c
)
SELECT lang,
  CAST(min(CASE WHEN cum >= (50*total + 99)//100 THEN n_chars END) AS BIGINT) AS p50,
  CAST(min(CASE WHEN cum >= (90*total + 99)//100 THEN n_chars END) AS BIGINT) AS p90,
  CAST(min(CASE WHEN cum >= (99*total + 99)//100 THEN n_chars END) AS BIGINT) AS p99
FROM w GROUP BY lang
"""


def group_quantiles(sf_dir: str):
    """Exact distributed percentiles (p50/p90/p99 of n_chars per lang) via
    the histogram route: in-batch (lang, value) partial counts, one
    groupby(lang), then a cumulative scan over the per-group histogram.
    The exchange carries O(distinct values) rows per group — for bounded
    integer measures (lengths, token counts) that is tiny at any corpus
    size, which is why histogram-percentile is the 100 TB shape while
    sort-based percentile is not."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["lang", "n_chars"]).aggregate([("lang", "count")])
        return pa.table(
            {
                "lang": agg["lang"].cast(pa.string()),
                "n_chars": agg["n_chars"].cast(pa.int64()),
                "cnt": agg["lang_count"].cast(pa.int64()),
            }
        )

    def quantiles(group: pd.DataFrame) -> pa.Table:
        hist = group.groupby("n_chars", sort=True)["cnt"].sum()
        cum = hist.cumsum()
        total = int(cum.iloc[-1])
        vals = hist.index.to_numpy()

        def pick(p: int) -> int:
            thresh = (p * total + 99) // 100
            return int(vals[np.searchsorted(cum.to_numpy(), thresh, side="left")])

        return pa.table(
            {
                "lang": pa.array([group["lang"].iloc[0]], pa.string()),
                "p50": pa.array([pick(50)], pa.int64()),
                "p90": pa.array([pick(90)], pa.int64()),
                "p99": pa.array([pick(99)], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(quantiles, batch_format="pandas")
    )


# ---------------------------------------------------------------- dedup_keep


def _dedup_keep_sql() -> str:
    from .dedup import DEDUP_CLUSTERS_SQL

    return f"""
WITH cl AS ( {DEDUP_CLUSTERS_SQL} ),
keep AS (SELECT cluster_id, min(doc_id) AS keep_id FROM cl GROUP BY cluster_id)
SELECT d.doc_id AS doc_id, d.lang AS lang, d.n_chars AS n_chars
FROM documents d
JOIN cl ON cl.doc_id = d.doc_id
JOIN keep k ON k.cluster_id = cl.cluster_id
WHERE d.doc_id = k.keep_id
"""


def dedup_keep(sf_dir: str):
    """End-to-end dedup materialization: MinHash near-dup clusters → keep
    the min-doc_id representative per cluster → surviving documents with
    their metadata. This is the step a training-data pipeline actually
    ships — the cleaned corpus, not the pair list. Representative choice
    is a groupby(min); both attach steps are bucketed hash joins, so no
    cluster map ever lands on the driver."""
    from ray.data.aggregate import Min

    import ray.data as rd

    from ..stages.join import bucketed_equijoin
    from .dedup import dedup_clusters

    clusters = dedup_clusters(sf_dir).materialize()  # (doc_id, cluster_id), all docs
    reps = clusters.groupby("cluster_id").aggregate(Min("doc_id", alias_name="keep_id"))

    i, s = pa.int64(), pa.string()
    labeled = bucketed_equijoin(
        clusters,
        reps.map_batches(
            lambda t: pa.table(
                {
                    "cluster_id2": t["cluster_id"].cast(pa.int64()),
                    "keep_id": t["keep_id"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        left_key="cluster_id",
        right_key="cluster_id2",
        left_fields=[("doc_id", i), ("cluster_id", i)],
        right_fields=[("cluster_id2", i), ("keep_id", i)],
    )
    survivors = labeled.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.equal(t["doc_id"], t["keep_id"]))["doc_id"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang", "n_chars"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id2": t["doc_id"].cast(pa.int64()),
                "lang": t["lang"].cast(pa.string()),
                "n_chars": t["n_chars"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_equijoin(
        survivors,
        docs,
        left_key="doc_id",
        right_key="doc_id2",
        left_fields=[("doc_id", i)],
        right_fields=[("doc_id2", i), ("lang", s), ("n_chars", i)],
    )
    return joined.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"], "n_chars": t["n_chars"]}
        ),
        batch_format="pyarrow",
    )


DEDUP_KEEP_SQL = _dedup_keep_sql()


# ------------------------------------------------------------------ doc_pack

PACK_BUDGET = 1024  # tokens per training shard
PACK_NUM_BUCKETS = 32

_WS_TOKEN_PATTERN = f"[^{ASCII_WS}]+"

DOC_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(text, '{_WS_TOKEN_PATTERN}')) AS n_tokens
  FROM documents
),
w AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS shard_id
FROM w
"""


def doc_pack(sf_dir: str, budget: int = PACK_BUDGET, num_buckets: int = PACK_NUM_BUCKETS):
    """Sequence packing: assign documents (in doc_id order) to fixed-budget
    training shards — shard_id = floor(exclusive-prefix-token-sum / budget),
    the step that turns a corpus into pretraining batches.

    A global ordered cumulative sum is inherently sequential, so this runs
    the classic two-pass distributed prefix-sum: range-bucket by doc_id,
    (1) per-bucket token totals → tiny driver-side exclusive offsets
    (num_buckets rows, O(buckets) not O(docs)), (2) per-bucket local cumsum
    + broadcast offset inside one groupby. Token counting is the vectorized
    Arrow regex count (same expression as token_count's ws tokens)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    max_id = ds.max("doc_id")
    span = int(max_id) + 1

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64())
        n_tok = pc.count_substring_regex(
            batch["text"].cast(pa.string()), _WS_TOKEN_PATTERN
        ).cast(pa.int64())
        bucket = pc.divide(pc.multiply(ids, num_buckets), span)
        return pa.table({"doc_id": ids, "n_tokens": n_tok, "bucket": bucket.cast(pa.int32())})

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    totals = {
        int(r["bucket"]): int(r["sum(n_tokens)"])
        for r in tagged.groupby("bucket").sum("n_tokens").take_all()
    }
    offsets, acc = {}, 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += totals.get(b, 0)

    def pack(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("doc_id")
        base = offsets[int(g["bucket"].iloc[0])]
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        cum_before = base + np.cumsum(n) - n
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(dtype=np.int64)),
                "n_tokens": pa.array(n),
                "shard_id": pa.array(cum_before // budget),
            }
        )

    return tagged.groupby("bucket").map_groups(pack, batch_format="pandas")


# --------------------------------------------- exploded-token shared helper


def _explode_lower_tokens(batch: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """(doc_id repeated per token, lower-cased ws tokens) for a batch of
    whole documents — vectorized split, no Python loop. Each document is a
    single row, so per-(doc, token) aggregates computed inside one batch
    are already final (no cross-batch combine needed for tf)."""
    lists = pc.split_pattern_regex(
        pc.utf8_lower(batch["text"].cast(pa.string())), f"[{ASCII_WS}]+"
    )
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    doc_ids = np.repeat(batch["doc_id"].cast(pa.int64()).to_numpy(zero_copy_only=False), lens)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "")
    mask = keep.to_numpy(zero_copy_only=False)
    return doc_ids[mask], flat.filter(keep)


# --------------------------------------------------------------------- tfidf

TFIDF_K = 3

TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[{ASCII_WS}]+')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks WHERE token <> '' GROUP BY doc_id, token
),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
s AS (
  SELECT t.doc_id, t.token, t.tf, df.df,
         CAST(t.tf AS DOUBLE) * n.nd / df.df AS score
  FROM tf t JOIN df ON df.token = t.token CROSS JOIN n
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn FROM s
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
FROM r WHERE rn <= {TFIDF_K}
"""


def tfidf(sf_dir: str, k: int = TFIDF_K):
    """Per-document top-k most-distinctive terms by tf·(N/df) — the
    linear-idf variant, chosen because tf·N/df divides the same two
    integers on both engines (IEEE-deterministic) where ln(N/df) would
    hinge on libm equality. Monotone in tf and 1/df, so the selected terms
    match classic tf-idf for fixed tf.

    Topology: in-batch final tf (documents are row-atomic, see
    _explode_lower_tokens), df via partial counts + one groupby(token),
    tf⋈df through the generic bucketed hash join, then one groupby(doc_id)
    for the per-doc top-k — O(doc-term pairs) through 3 exchanges, nothing
    driver-side but the scalar N."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.join import bucketed_equijoin

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    n_docs = float(ds.count())

    def tf_batch(batch: pa.Table) -> pa.Table:
        doc_ids, toks = _explode_lower_tokens(batch)
        t = (
            pa.table({"doc_id": pa.array(doc_ids, pa.int64()), "token": toks})
            .group_by(["doc_id", "token"])
            .aggregate([("doc_id", "count")])
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "token": t["token"].cast(pa.string()),
                "tf": t["doc_id_count"].cast(pa.int64()),
            }
        )

    tf_ds = ds.map_batches(tf_batch, batch_format="pyarrow").materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("token").aggregate([("token", "count")])
        return pa.table(
            {"token2": t["token"].cast(pa.string()), "df_part": t["token_count"].cast(pa.int64())}
        )

    df_ds = (
        tf_ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token2")
        .aggregate(Sum("df_part", alias_name="df"))
        .map_batches(
            lambda t: pa.table(
                {"token2": t["token2"].cast(pa.string()), "df": t["df"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )

    i, s = pa.int64(), pa.string()
    joined = bucketed_equijoin(
        tf_ds,
        df_ds,
        left_key="token",
        right_key="token2",
        left_fields=[("doc_id", i), ("token", s), ("tf", i)],
        right_fields=[("token2", s), ("df", i)],
        key_type=s,
    )

    def topk(group: pd.DataFrame) -> pa.Table:
        g = group.copy()
        g["score"] = g["tf"].astype(float) * n_docs / g["df"].astype(float)
        g = g.sort_values(["score", "token"], ascending=[False, True]).head(k)
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(dtype=np.int64)),
                "token": pa.array(g["token"], pa.string()),
                "tf": pa.array(g["tf"].to_numpy(dtype=np.int64)),
                "df": pa.array(g["df"].to_numpy(dtype=np.int64)),
                "score": pa.array(g["score"].to_numpy(dtype=np.float64)),
            }
        )

    return joined.groupby("doc_id").map_groups(topk, batch_format="pandas")


# -------------------------------------------------------- stratified sample

STRAT_SALT = "strat1"
STRAT_DEFAULT_RATE = 0.05
STRAT_RATES = {"en": 0.30, "de": 0.15, "fr": 0.10}


def _strat_thresholds() -> dict[str, int]:
    out = {lang: int(rate * (1 << 32)) for lang, rate in STRAT_RATES.items()}
    out["__default__"] = int(STRAT_DEFAULT_RATE * (1 << 32))
    return out


_STRAT_T = _strat_thresholds()

_STRAT_CASE = (
    "CASE "
    + " ".join(f"WHEN lang = '{lang}' THEN {_STRAT_T[lang]}" for lang in sorted(STRAT_RATES))
    + f" ELSE {_STRAT_T['__default__']} END"
)

DOC_STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{STRAT_SALT}'), 1, 8))::UBIGINT AS BIGINT) AS sample_key
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{STRAT_SALT}'), 1, 8))::UBIGINT
      < ({_STRAT_CASE})
"""


def doc_stratified_sample(sf_dir: str):
    """Deterministic per-stratum hash-bernoulli sample: each language gets
    its own keep rate (the data-mixture lever of a pretraining corpus —
    upsample rare strata, downsample dominant ones) with doc_sample's
    reproducible md5 keying. Pure per-row filter: no shuffle at any scale."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"])
    default_thr = _STRAT_T["__default__"]

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        langs = batch["lang"].to_pylist()
        keys = [
            int(hashlib.md5(f"{d}:{STRAT_SALT}".encode()).hexdigest()[:8], 16) for d in ids
        ]
        mask = pa.array(
            [k < _STRAT_T.get(lang, default_thr) for k, lang in zip(keys, langs)]
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "lang": batch["lang"].cast(pa.string()),
                "sample_key": pa.array(keys, pa.int64()),
            }
        ).filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------------------ token_postings

POSTINGS_CAP = 20

TOKEN_POSTINGS_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(lower(text), '[{ASCII_WS}]+')) AS token
  FROM documents
),
t AS (SELECT doc_id, token FROM toks WHERE token <> ''),
agg AS (SELECT token, count(*) AS df FROM t GROUP BY token),
r AS (
  SELECT token, doc_id, row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn FROM t
),
p AS (
  SELECT token, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
  FROM r WHERE rn <= {POSTINGS_CAP} GROUP BY token
)
SELECT a.token AS token, CAST(a.df AS BIGINT) AS df, p.postings AS postings
FROM agg a JOIN p ON p.token = a.token
"""


def token_postings(sf_dir: str, cap: int = POSTINGS_CAP):
    """Inverted-index construction: token → (document frequency, first
    ``cap`` posting doc_ids as a comma string). Postings are truncated to
    the cap so a stop-word's list can't blow up a row; the per-batch
    partial keeps only each token's cap smallest doc_ids plus a count, so
    the exchange is O(tokens·cap) per block — the same bounded-merge
    argument as the KMV sketch (min-k of a union = min-k of per-part
    min-ks)."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        doc_ids, toks = _explode_lower_tokens(batch)
        df = pd.DataFrame({"token": toks.to_pandas(), "doc_id": doc_ids}).drop_duplicates()
        df = df.sort_values(["token", "doc_id"])
        g = df.groupby("token", sort=False)
        counts = g.size()
        pruned = g.head(cap).copy()
        # exactly ONE row per (token, batch) carries the batch's full df
        # contribution (rest carry 0), so the merge can just sum df_part
        first = (~pruned["token"].duplicated()).to_numpy()
        dfp = np.zeros(len(pruned), dtype=np.int64)
        dfp[first] = counts.loc[pruned.loc[first, "token"]].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "token": pa.array(pruned["token"], pa.string()),
                "doc_id": pa.array(pruned["doc_id"].to_numpy(dtype=np.int64)),
                "df_part": pa.array(dfp),
            }
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        tok = group["token"].iloc[0]
        # (token, doc_id) pairs are unique across batches (a doc lives in
        # one batch); min-cap of the union = min-cap of per-batch min-caps
        doc_ids = np.sort(np.unique(group["doc_id"].to_numpy(dtype=np.int64)))[:cap]
        df_total = int(group["df_part"].sum())
        postings = ",".join(str(d) for d in doc_ids)
        return pa.table(
            {
                "token": pa.array([tok], pa.string()),
                "df": pa.array([df_total], pa.int64()),
                "postings": pa.array([postings], pa.string()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .map_groups(merge, batch_format="pandas")
    )


# -------------------------------------------------------------- corpus_clean

CLEAN_MIN_WORDS = 20
CLEAN_MIN_STOPWORD_RATIO = 0.02


def _corpus_clean_sql() -> str:
    from .text import DOC_STATS_SQL, LANG_ID_SQL

    return f"""
WITH stats AS ( {DOC_STATS_SQL} ),
langs AS ( {LANG_ID_SQL} ),
kept AS ( {DEDUP_KEEP_SQL} )
SELECT s.doc_id AS doc_id, l.pred_lang AS pred_lang, s.n_chars AS n_chars,
       s.n_words AS n_words, s.stopword_ratio AS stopword_ratio
FROM stats s
JOIN langs l ON l.doc_id = s.doc_id
JOIN kept k ON k.doc_id = s.doc_id
WHERE s.n_words >= {CLEAN_MIN_WORDS}
  AND s.stopword_ratio >= {CLEAN_MIN_STOPWORD_RATIO}
  AND l.pred_lang <> 'und'
"""


CORPUS_CLEAN_SQL = _corpus_clean_sql()


def corpus_clean(sf_dir: str):
    """The composite C4-style cleaning pipeline — what a user actually runs
    end-to-end: quality heuristics (word count, stopword ratio) AND
    language-ID confidence AND near-dup survival, emitting the cleaned
    corpus with its quality features. Stats + lang-ID run fused in ONE
    map over the documents (both are per-row, so they pipeline with the
    read); the dedup-survivor condition is a bucketed semi-join against
    dedup_keep's output. Thresholds compare the same already-rounded
    values the oracled doc_stats/lang_id queries emit, so the filter
    decisions are engine-identical by construction."""
    import ray.data as rd

    from ..stages.join import bucketed_equijoin
    from .text import doc_stats_batch, lang_id_batch

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def stats_lang(batch: pa.Table) -> pa.Table:
        stats = doc_stats_batch(batch)
        langs = lang_id_batch(batch)
        t = pa.table(
            {
                "doc_id": stats["doc_id"].cast(pa.int64()),
                "pred_lang": langs["pred_lang"],
                "n_chars": stats["n_chars"],
                "n_words": stats["n_words"],
                "stopword_ratio": stats["stopword_ratio"],
            }
        )
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(t["n_words"], CLEAN_MIN_WORDS),
                pc.greater_equal(t["stopword_ratio"], CLEAN_MIN_STOPWORD_RATIO),
            ),
            pc.not_equal(t["pred_lang"], "und"),
        )
        return t.filter(mask)

    quality = ds.map_batches(stats_lang, batch_format="pyarrow")
    survivors = dedup_keep(sf_dir).map_batches(
        lambda t: pa.table({"doc_id2": t["doc_id"].cast(pa.int64())}), batch_format="pyarrow"
    )

    i, s, f = pa.int64(), pa.string(), pa.float64()
    joined = bucketed_equijoin(
        quality,
        survivors,
        left_key="doc_id",
        right_key="doc_id2",
        left_fields=[
            ("doc_id", i),
            ("pred_lang", s),
            ("n_chars", i),
            ("n_words", i),
            ("stopword_ratio", f),
        ],
        right_fields=[("doc_id2", i)],
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "pred_lang": t["pred_lang"],
                "n_chars": t["n_chars"],
                "n_words": t["n_words"],
                "stopword_ratio": t["stopword_ratio"],
            }
        ),
        batch_format="pyarrow",
    )


# --------------------------------------------------------- doc_decontaminate

# Benchmark decontamination (the GPT-3 appendix-C / FLAN "n-gram overlap"
# pass): before training, drop or flag corpus documents that share a word
# n-gram with the evaluation set, so benchmark answers don't leak into
# training data. The "benchmark" here is the deterministic doc_id % 25 == 0
# slice of the corpus itself — same shape as shipping a real eval set in.
DECON_N = 3
DECON_BENCH_MOD = 25
DECON_NUM_BUCKETS = 64

DOC_DECONTAMINATE_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS gram
  FROM w, UNNEST(range(1, len(words) - 1)) AS t(i)
),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
bench AS (SELECT DISTINCT gram FROM gd WHERE doc_id % {DECON_BENCH_MOD} = 0)
SELECT gd.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_shared
FROM gd JOIN bench USING (gram)
WHERE gd.doc_id % {DECON_BENCH_MOD} <> 0
GROUP BY gd.doc_id
"""


def doc_decontaminate(sf_dir: str, num_gram_buckets: int = DECON_NUM_BUCKETS):
    """Per non-benchmark doc: how many of its distinct word-3-grams appear
    anywhere in the benchmark slice (n_shared >= 1 == contaminated).

    Topology — ONE all-to-all exchange, like dedup_ngram_jaccard: distinct
    (doc, gram) rows bucketed by gram hash, so every occurrence of a gram
    (benchmark and corpus alike) lands in the same bucket group; the
    contaminated-gram test is then bucket-local (a vectorized pandas isin
    against the bucket's benchmark grams), and per-doc partial hit counts
    sum through a tiny groupby. The benchmark side is NOT broadcast: a real
    eval set can be millions of grams, and the semi-join keeps it
    distributed. Reference analogue: set-membership over graph terms,
    graph.ex via rdf-ex (semantics only; topology is Ray's)."""
    import zlib

    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        doc_ids, grams, buckets, is_bench = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            words = text.split(" ")
            bench = doc_id % DECON_BENCH_MOD == 0
            for gm in {
                " ".join(words[i : i + DECON_N]) for i in range(len(words) - DECON_N + 1)
            }:
                doc_ids.append(doc_id)
                grams.append(gm)
                buckets.append(zlib.crc32(gm.encode()) % num_gram_buckets)
                is_bench.append(bench)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "gram": pa.array(grams, pa.string()),
                "gram_bucket": pa.array(buckets, pa.int32()),
                "is_bench": pa.array(is_bench, pa.bool_()),
            }
        )

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")

    def bucket_pass(group: pd.DataFrame) -> pa.Table:
        bench_grams = group.loc[group["is_bench"], "gram"]
        hits = group[~group["is_bench"] & group["gram"].isin(set(bench_grams))]
        counts = hits.groupby("doc_id", sort=False).size()
        return pa.table(
            {
                "doc_id": pa.array(counts.index.to_numpy(np.int64), pa.int64()),
                "n_part": pa.array(counts.to_numpy(np.int64), pa.int64()),
            }
        )

    partials = grams.groupby("gram_bucket").map_groups(bucket_pass, batch_format="pandas")
    agg = partials.groupby("doc_id").aggregate(Sum("n_part", alias_name="n_shared"))
    return agg.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"].cast(pa.int64()), "n_shared": t["n_shared"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------- token_bigram_lm

# Bigram language-model counts: the adjacency statistics an n-gram LM (or a
# BPE-merge/tokenizer-training pass) is built from. Top-k by count with a
# deterministic (n DESC, w1, w2) tiebreak.
BIGRAM_TOPK_K = 100

TOKEN_BIGRAM_LM_SQL = f"""
WITH w AS (SELECT string_split(lower(text), ' ') AS words FROM documents),
g AS (
  SELECT words[i] AS w1, words[i+1] AS w2
  FROM w, UNNEST(range(1, len(words))) AS t(i)
)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
FROM g GROUP BY w1, w2
ORDER BY n DESC, w1, w2 LIMIT {BIGRAM_TOPK_K}
"""


def token_bigram_lm(sf_dir: str, k: int = BIGRAM_TOPK_K):
    """Corpus bigram counts, fully vectorized: split once per batch (Arrow
    kernel), build (w1, w2) adjacency from the FLATTENED token array plus
    its list offsets (a boolean mask knocks out the doc-boundary pairs —
    no per-document Python loop), partial-count in-batch, ONE groupby over
    the partials, exact per-block top-k prune (post-groupby blocks hold
    disjoint pairs), tiny final sort. Identical topology to vocab_topk with
    a composite key."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(batch["text"].cast(pa.string())), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        flat = la.flatten()
        nf = len(flat)
        if nf < 2:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_part": pa.array([], pa.int64()),
                }
            )
        offs = la.offsets.to_numpy(zero_copy_only=False)
        mask = np.ones(nf - 1, dtype=bool)
        ends = offs[1:] - 1  # last-token index of each doc: no pair starts here
        ends = ends[(ends >= 0) & (ends < nf - 1)]
        mask[ends] = False
        t = (
            pa.table({"w1": flat.slice(0, nf - 1), "w2": flat.slice(1)})
            .filter(pa.array(mask))
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"w1": t["w1"], "w2": t["w2"], "n_part": t["count_all"].cast(pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def prune(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "w1": batch["w1"].cast(pa.string()),
                "w2": batch["w2"].cast(pa.string()),
                "n": batch["n"].cast(pa.int64()),
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[("n", "descending"), ("w1", "ascending"), ("w2", "ascending")],
        )[:k]
        return t.take(idx)

    return (
        counts.map_batches(prune, batch_format="pyarrow")
        .sort(["n", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


# ------------------------------------------------------- token_heavy_hitters

HH_K = 20
# Frequency-threshold divisor for candidate generation: a block keeps a token
# iff block_count * HH_M > block_total. Any token with global count > N/HH_M
# must clear that bar in at least one block (pigeonhole), so the union of
# per-block survivors is a superset of every global heavy hitter.
HH_M = 2048
HH_BROADCAST_CANDIDATE_CAP = 2_000_000

# The oracle is the EXACT top-k — the operator's two-pass sketch is required
# to reproduce it or raise (see the provability guard in the function).
TOKEN_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[{ASCII_WS}]+')) AS token FROM documents
),
counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks WHERE token <> '' GROUP BY token
)
SELECT token, n FROM counts ORDER BY n DESC, token LIMIT {HH_K}
"""


def token_heavy_hitters(
    sf_dir: str,
    k: int = HH_K,
    m: int = HH_M,
    broadcast_candidate_cap: int = HH_BROADCAST_CANDIDATE_CAP,
):
    """Exact top-k frequent tokens via the two-pass heavy-hitters pattern:
    a threshold-pruned candidate sweep, then an exact count of candidates
    only. This is how top-k works when the FULL vocabulary is too large to
    shuffle (vocab_topk's plan): pass 1 never ships more than ~m tokens per
    block, pass 2's groupby runs over candidate tokens only.

    Guarantee (and self-check): a token that survives no block has global
    count <= N // m; the operator verifies the k-th result clears that bound
    and raises otherwise, so it can never silently return a wrong top-k.
    The candidate set is broadcast below ``broadcast_candidate_cap`` and
    attached via the distributed bucketed semi-join above it."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.broadcast import put_broadcast, resolve_broadcast

    path = os.path.join(sf_dir, "documents.parquet")
    split_re = f"[{ASCII_WS}]+"

    def tokenize(batch: pa.Table) -> pa.Array:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(batch["text"].cast(pa.string())), split_re)
        )
        return toks.filter(pc.not_equal(toks, ""))

    def sweep(batch: pa.Table) -> pa.Table:
        toks = tokenize(batch)
        total = len(toks)
        if total == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "n_total": pa.array([], pa.int64())}
            )
        agg = pa.table({"token": toks}).group_by("token").aggregate([("token", "count")])
        keep = pc.greater(pc.multiply(agg["token_count"].cast(pa.int64()), m), total)
        cand = agg.filter(keep)
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [cand["token"].combine_chunks().cast(pa.string()), pa.array([""], pa.string())]
                ),
                "n_total": pa.concat_arrays(
                    [
                        pa.repeat(pa.scalar(0, pa.int64()), cand.num_rows),
                        pa.array([total], pa.int64()),
                    ]
                ),
            }
        )

    pass1 = (
        rd.read_parquet(path, columns=["text"])
        .map_batches(sweep, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n_total", alias_name="n_total"))
        .materialize()
    )
    n_tokens = pass1.sum("n_total")  # only the "" marker rows carry totals
    candidates = pass1.filter(lambda r: r["token"] != "")
    n_candidates = candidates.count()

    if n_candidates <= broadcast_candidate_cap:
        cand_set = set()
        for bt in candidates.iter_batches(batch_format="pyarrow"):
            cand_set.update(bt["token"].to_pylist())
        cand_ref = put_broadcast(pa.array(sorted(cand_set), pa.string()))

        def exact_partial(batch: pa.Table) -> pa.Table:
            toks = tokenize(batch)
            toks = toks.filter(pc.is_in(toks, value_set=resolve_broadcast(cand_ref)))
            agg = pa.table({"token": toks}).group_by("token").aggregate([("token", "count")])
            return pa.table(
                {"token": agg["token"].cast(pa.string()), "n_part": agg["token_count"].cast(pa.int64())}
            )

        counts = (
            rd.read_parquet(path, columns=["text"])
            .map_batches(exact_partial, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Sum("n_part", alias_name="n"))
        )
    else:
        # distributed semi-join: full per-block counts bucket-joined against
        # the candidate set, non-candidates dropped before the global groupby
        from .dedup import NUM_JOIN_BUCKETS, _bucketed_attach

        def all_partial(batch: pa.Table) -> pa.Table:
            toks = tokenize(batch)
            agg = pa.table({"token": toks}).group_by("token").aggregate([("token", "count")])
            return pa.table(
                {"token": agg["token"].cast(pa.string()), "n_part": agg["token_count"].cast(pa.int64())}
            )

        cand_payload = candidates.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["token"].cast(pa.string()),
                    "payload": pa.repeat(pa.scalar(1, pa.int64()), t.num_rows),
                }
            ),
            batch_format="pyarrow",
        )
        tagged = _bucketed_attach(
            rd.read_parquet(path, columns=["text"]).map_batches(
                all_partial, batch_format="pyarrow"
            ),
            cand_payload,
            key_col="token",
            payload_type=pa.int64(),
            out_col="__is_cand",
            pair_fields=[("token", pa.string()), ("n_part", pa.int64())],
            num_buckets=NUM_JOIN_BUCKETS,
            key_type=pa.string(),
        )
        counts = (
            tagged.map_batches(
                lambda t: t.filter(pc.is_valid(t["__is_cand"])).select(["token", "n_part"]),
                batch_format="pyarrow",
            )
            .groupby("token")
            .aggregate(Sum("n_part", alias_name="n"))
        )

    def prune(batch: pa.Table) -> pa.Table:
        t = pa.table({"token": batch["token"].cast(pa.string()), "n": batch["n"].cast(pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"), ("token", "ascending")])[:k]
        return t.take(idx)

    top = (
        counts.map_batches(prune, batch_format="pyarrow")
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
        .materialize()
    )
    rows = top.take(k)
    if len(rows) < k:
        raise ValueError(
            f"token_heavy_hitters: only {len(rows)} candidates for top-{k} — "
            "the pruned sweep cannot prove completeness; lower m"
        )
    if rows[-1]["n"] <= n_tokens // m:
        raise ValueError(
            f"token_heavy_hitters: top-{k} not provably exact — k-th count "
            f"{rows[-1]['n']} <= N/m bound {n_tokens // m}; lower m or raise k"
        )
    return top


# ---------------------------------------------------------------- group_topk

GROUP_TOPK_K = 5

GROUP_TOPK_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(lower(text), '[{ASCII_WS}]+')) AS token
  FROM documents
),
counts AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS n
  FROM toks WHERE token <> '' GROUP BY lang, token
),
r AS (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
  FROM counts
)
SELECT lang, token, n, CAST(rnk AS BIGINT) AS rank FROM r WHERE rnk <= {GROUP_TOPK_K}
"""


def group_topk(sf_dir: str, k: int = GROUP_TOPK_K):
    """Top-k tokens PER GROUP (language) with dense 1..k ranks — the grouped
    top-k / window-function pattern (per-domain vocabularies, per-source
    quality leaders, per-shard heavy hitters).

    Plan: vectorized explode of (lang, token) with lang repeated by the
    token-list lengths, in-batch partial counts, ONE composite groupby, then
    a per-block per-lang prune (each token appears in exactly one
    post-groupby block, so a block's per-lang top-k retains every global
    top-k candidate) before the final tiny per-lang rank assignment — the
    all-to-all stays O(groups × k × blocks), never O(vocab)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["lang", "text"])
    split_re = f"[{ASCII_WS}]+"

    def partial(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(pc.utf8_lower(batch["text"].cast(pa.string())), split_re)
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        toks = lists.flatten()
        langs = pa.array(
            np.repeat(
                np.asarray(batch["lang"].to_pylist(), dtype=object),
                pc.list_value_length(lists).to_numpy(zero_copy_only=False),
            ),
            pa.string(),
        )
        t = pa.table({"lang": langs, "token": toks}).filter(pc.not_equal(toks, ""))
        agg = t.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": agg["lang"],
                "token": agg["token"],
                "n_part": agg["count_all"].cast(pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "token"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def prune(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "token": batch["token"].to_pylist(),
                "n": batch["n"].to_pylist(),
            }
        )
        kept = (
            df.sort_values(["lang", "n", "token"], ascending=[True, False, True], kind="mergesort")
            .groupby("lang", sort=False)
            .head(k)
        )
        return pa.table(
            {
                "lang": pa.array(kept["lang"], pa.string()),
                "token": pa.array(kept["token"], pa.string()),
                "n": pa.array(kept["n"], pa.int64()),
            }
        )

    def rank_group(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["n", "token"], ascending=[False, True], kind="mergesort").head(k)
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "token": pa.array(g["token"], pa.string()),
                "n": pa.array(g["n"].astype("int64")),
                "rank": pa.array(np.arange(1, len(g) + 1, dtype=np.int64)),
            }
        )

    return (
        counts.map_batches(prune, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(rank_group, batch_format="pandas")
    )


# ----------------------------------------------------------------- doc_chunk

CHUNK_SIZE = 120
CHUNK_STRIDE = 100  # 20-char overlap between consecutive chunks

DOC_CHUNK_SQL = f"""
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       substr(text, CAST(i * {CHUNK_STRIDE} AS BIGINT) + 1, {CHUNK_SIZE}) AS chunk
FROM documents,
     UNNEST(range(0, CAST(ceil(greatest(length(text), 1) / {CHUNK_STRIDE}.0) AS BIGINT))) AS t(i)
"""


def doc_chunk(sf_dir: str, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE):
    """Overlapping fixed-window chunking (doc → (chunk_idx, chunk_start,
    chunk) rows) — the fan-out step that precedes embedding / context
    packing in a training pipeline. Every document yields
    ceil(max(len, 1) / stride) chunks of up to ``size`` chars starting at
    stride multiples, so consecutive chunks overlap by size - stride.

    Vectorized flat_map: one pandas ``str.slice`` per chunk ordinal (the
    loop runs max-chunks-per-batch times, never per row), emitted as typed
    Arrow. Output grows ~size/stride × input — at 100 TB the stage stays a
    pure streaming map (no shuffle), so blocks fan out and flow on."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pylist(), dtype=object).astype(str)
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        n = s.str.len().to_numpy(dtype=np.int64)
        n_chunks = -(-np.maximum(n, 1) // stride)  # ceil
        parts = []
        for i in range(int(n_chunks.max()) if len(n_chunks) else 0):
            mask = n_chunks > i
            sub = s[mask].str.slice(i * stride, i * stride + size)
            m = int(mask.sum())
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids[mask], pa.int64()),
                        "chunk_idx": pa.repeat(pa.scalar(i, pa.int64()), m),
                        "chunk_start": pa.repeat(pa.scalar(i * stride, pa.int64()), m),
                        "chunk": pa.array(sub, pa.string()),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_start": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(parts)

    return ds.map_batches(chunks, batch_format="pyarrow")


# -------------------------------------------------------- token_collocations

COLLOC_MIN_COUNT = 5
COLLOC_K = 50

# Lift in parts-per-million, exact integer arithmetic: n_xy * N_bigrams *
# 1e6 // (n_x * n_y). HUGEINT in SQL; Python's arbitrary-precision ints on
# the Ray side (the stage runs over count-filtered PAIRS, not tokens, so the
# per-row Python cost is off the hot path). Tokenization matches
# token_bigram_lm (lower + single-space split, empties kept).
TOKEN_COLLOCATIONS_SQL = f"""
WITH w AS (SELECT string_split(lower(text), ' ') AS words FROM documents),
uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(words) AS tok FROM w) GROUP BY tok
),
g AS (
  SELECT words[i] AS w1, words[i+1] AS w2
  FROM w, UNNEST(range(1, len(words))) AS t(i)
),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy FROM g GROUP BY w1, w2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM g)
SELECT b.w1, b.w2, b.n_xy,
       CAST(CAST(b.n_xy AS HUGEINT) * t.nb * 1000000
            // (CAST(u1.n AS HUGEINT) * u2.n) AS BIGINT) AS lift_ppm
FROM big b
CROSS JOIN tot t
JOIN uni u1 ON u1.tok = b.w1
JOIN uni u2 ON u2.tok = b.w2
WHERE b.n_xy >= {COLLOC_MIN_COUNT}
ORDER BY lift_ppm DESC, b.w1, b.w2 LIMIT {COLLOC_K}
"""


def token_collocations(
    sf_dir: str, min_count: int = COLLOC_MIN_COUNT, k: int = COLLOC_K
):
    """Collocation extraction: top-k token bigrams by PMI-style lift
    (n_xy·N / (n_x·n_y), reported in exact integer ppm) — the phrase-mining
    pass of corpus analysis (multi-word expressions, named-entity cues).

    Plan: one bigram-count exchange and one unigram-count exchange (both
    partial-aggregated in-batch), the count-filtered pair stream then picks
    up n_x and n_y through two bucketed map-side joins — no driver dict, no
    broadcast of the vocabulary. Lift is integer-exact on both engines, so
    ranking ties and values reproduce bit-for-bit at any scale."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .dedup import NUM_JOIN_BUCKETS, _bucketed_attach

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def bigram_partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.utf8_lower(batch["text"].cast(pa.string())), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        flat = la.flatten()
        nf = len(flat)
        if nf < 2:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_part": pa.array([], pa.int64()),
                }
            )
        offs = la.offsets.to_numpy(zero_copy_only=False)
        mask = np.ones(nf - 1, dtype=bool)
        ends = offs[1:] - 1
        ends = ends[(ends >= 0) & (ends < nf - 1)]
        mask[ends] = False
        t = (
            pa.table({"w1": flat.slice(0, nf - 1), "w2": flat.slice(1)})
            .filter(pa.array(mask))
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"w1": t["w1"], "w2": t["w2"], "n_part": t["count_all"].cast(pa.int64())}
        )

    big = (
        ds.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n_part", alias_name="n_xy"))
        .materialize()
    )
    nb = big.sum("n_xy")

    def uni_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.utf8_lower(batch["text"].cast(pa.string())), " ")
        )
        agg = pa.table({"tok": toks}).group_by("tok").aggregate([("tok", "count")])
        return pa.table(
            {"tok": agg["tok"].cast(pa.string()), "n_part": agg["tok_count"].cast(pa.int64())}
        )

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(
            lambda t: pa.table({"doc_id": t["tok"].cast(pa.string()), "payload": t["n"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    s, i = pa.string(), pa.int64()
    filtered = big.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_xy"], min_count)), batch_format="pyarrow"
    )
    with_nx = _bucketed_attach(
        filtered,
        uni,
        key_col="w1",
        payload_type=i,
        out_col="n_x",
        pair_fields=[("w1", s), ("w2", s), ("n_xy", i)],
        num_buckets=NUM_JOIN_BUCKETS,
        key_type=s,
    )
    with_ny = _bucketed_attach(
        with_nx,
        uni,
        key_col="w2",
        payload_type=i,
        out_col="n_y",
        pair_fields=[("w1", s), ("w2", s), ("n_xy", i), ("n_x", i)],
        num_buckets=NUM_JOIN_BUCKETS,
        key_type=s,
    )

    def lift(batch: pa.Table) -> pa.Table:
        lifts = [
            (int(nxy) * int(nb) * 1_000_000) // (int(nx) * int(ny))
            for nxy, nx, ny in zip(
                batch["n_xy"].to_pylist(), batch["n_x"].to_pylist(), batch["n_y"].to_pylist()
            )
        ]
        t = pa.table(
            {
                "w1": batch["w1"].cast(s),
                "w2": batch["w2"].cast(s),
                "n_xy": batch["n_xy"].cast(i),
                "lift_ppm": pa.array(lifts, i),
            }
        )
        idx = pc.sort_indices(
            t,
            sort_keys=[("lift_ppm", "descending"), ("w1", "ascending"), ("w2", "ascending")],
        )[:k]
        return t.take(idx)

    return (
        with_ny.map_batches(lift, batch_format="pyarrow")
        .sort(["lift_ppm", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


# ------------------------------------------------------------ corpus_mixture

# Source-weighted epoch replication — the "data mixing" primitive of LLM
# training pipelines (repeat high-quality sources >1 epoch, subsample noisy
# ones <1). Weights are kept in integer HALF-EPOCHS (1..5 → 0.5x..2.5x) so
# replication count and the fractional-epoch coin are integer-exact on both
# engines: reps = halves // 2, plus one more copy iff halves is odd and the
# doc's hash-bernoulli coin (md5(doc_id:mixture) % 2 == 0) lands heads.
MIXTURE_SALT = "mixture"

CORPUS_MIXTURE_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         1 + ({_md5_le_uint64_sql("source")} % 5) AS halves
  FROM documents
),
r AS (
  SELECT doc_id, source, halves,
         halves // 2 + CASE WHEN halves % 2 = 1
           AND ({_md5_le_uint64_sql(f"CAST(doc_id AS VARCHAR) || ':{MIXTURE_SALT}'")} % 2) = 0
           THEN 1 ELSE 0 END AS reps
  FROM w
)
SELECT doc_id, source, CAST(halves AS BIGINT) AS weight_halves,
       CAST(i AS BIGINT) AS copy_idx
FROM r, UNNEST(range(0, CAST(reps AS BIGINT))) AS t(i)
"""


def corpus_mixture(sf_dir: str):
    """Deterministic mixture sampling: every document is replicated
    floor(w) times plus a hash-bernoulli extra copy for the fractional
    epoch, where w = weight_halves/2 derives from the source name's hash.
    Output is one row per (doc, copy) — the expanded training manifest.

    Scale shape: a single stateless map_batches (no shuffle at all); the
    only per-row Python is the short-string id/source md5 (the doc_sample
    precedent) — replication itself is one np.repeat + arange per batch."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        halves_by_src = {s: 1 + (_md5_le_uint64(s) % 5) for s in set(srcs)}
        halves = np.array([halves_by_src[s] for s in srcs], dtype=np.int64)
        coin = np.array(
            [_md5_le_uint64(f"{d}:{MIXTURE_SALT}") % 2 == 0 for d in ids], dtype=bool
        )
        reps = halves // 2 + ((halves % 2 == 1) & coin)
        total = int(reps.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "weight_halves": pa.array([], pa.int64()),
                    "copy_idx": pa.array([], pa.int64()),
                }
            )
        idx = np.repeat(np.arange(len(ids)), reps)
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        copy_idx = np.arange(total, dtype=np.int64) - starts
        return pa.table(
            {
                "doc_id": pc.take(batch["doc_id"].cast(pa.int64()), pa.array(idx)),
                "source": pc.take(batch["source"].cast(pa.string()), pa.array(idx)),
                "weight_halves": pa.array(halves[idx], pa.int64()),
                "copy_idx": pa.array(copy_idx, pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow")


# ----------------------------------------------------------- doc_lm_coverage

# LM-based quality filtering surrogate: score every document by how much of
# it the corpus's own bigram table "explains" — the integer-exact stand-in
# for a perplexity filter (CCNet-style). A doc whose bigrams rarely appear
# in the global top-K table is gibberish/outlier-shaped; the two counts stay
# integers so the oracle compare never touches a float.

DOC_LM_COVERAGE_SQL = f"""
WITH lm AS ({TOKEN_BIGRAM_LM_SQL}),
w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
g AS (
  SELECT doc_id, words[i] AS w1, words[i+1] AS w2
  FROM w, UNNEST(range(1, len(words))) AS t(i)
)
SELECT w.doc_id,
       CAST(greatest(len(w.words) - 1, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_in_lm
FROM w LEFT JOIN (
  SELECT g.doc_id, count(*) AS n_hits
  FROM g JOIN lm ON lm.w1 = g.w1 AND lm.w2 = g.w2
  GROUP BY g.doc_id
) h USING (doc_id)
"""


def doc_lm_coverage(sf_dir: str):
    """Per-doc bigram coverage against the corpus top-K bigram table.

    Two passes: token_bigram_lm's distributed top-K (a CONSTANT-size
    result) is broadcast once via ray.put, then one stateless map_batches
    scores every doc — flattened-token bigram construction (the
    token_bigram_lm kernel) + one Arrow is_in membership test against the
    broadcast set + one np.add.at segment-sum per batch. No shuffle in the
    scoring pass; driver state is O(K), a constant."""
    import ray.data as rd

    from ..stages.broadcast import put_broadcast, resolve_broadcast

    lm = token_bigram_lm(sf_dir).to_pandas()
    # Length-prefixed key: tokens come from a single-space split, so they may
    # themselves contain \x1f on hostile text; "len(w1)\x1f w1\x1f w2" makes
    # the pair encoding injective (same prefix ⇒ same w1 length ⇒ same split
    # point), matching the SQL oracle's exact two-column join semantics.
    lm_keys = pa.array(
        sorted(f"{len(w1)}\x1f{w1}\x1f{w2}" for w1, w2 in zip(lm["w1"], lm["w2"])),
        pa.string(),
    )
    lm_ref = put_broadcast(lm_keys)

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        keys = resolve_broadcast(lm_ref)
        words = pc.split_pattern(pc.utf8_lower(batch["text"].cast(pa.string())), " ")
        la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        flat = la.flatten()
        nf = len(flat)
        offs = la.offsets.to_numpy(zero_copy_only=False)
        n_bigrams = np.maximum(offs[1:] - offs[:-1] - 1, 0).astype(np.int64)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        if nf >= 2:
            mask = np.ones(nf - 1, dtype=bool)
            ends = offs[1:] - 1  # last-token index of each doc: no pair starts here
            ends = ends[(ends >= 0) & (ends < nf - 1)]
            mask[ends] = False
            valid = np.flatnonzero(mask)  # pair-start positions within one doc
            w1 = flat.slice(0, nf - 1)
            joined = pc.binary_join_element_wise(
                pc.cast(pc.utf8_length(w1), pa.string()), w1, flat.slice(1), "\x1f"
            )
            in_lm = pc.is_in(joined, value_set=keys).to_numpy(zero_copy_only=False)
            pair_doc = np.searchsorted(offs, valid, side="right") - 1
            np.add.at(hits, pair_doc, in_lm[valid].astype(np.int64))
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_bigrams": pa.array(n_bigrams, pa.int64()),
                "n_in_lm": pa.array(hits, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------------------ corpus_shuffle

# Deterministic global training order: every doc gets a reproducible
# shuffle position (rank of its salted hash). The classic "shuffle the
# corpus identically on every rerun / resume" requirement. Assigning a
# GLOBAL dense rank distributedly needs two passes: an exact histogram of
# hash prefixes gives every prefix-bucket its global offset (a tiny
# broadcast), then each bucket ranks locally — no single-reducer sort, no
# driver-side row enumeration.
SHUFFLE_SALT = "shuffle"
SHUFFLE_PREFIX_BITS = 12  # 4096 prefix buckets

CORPUS_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         {_md5_le_uint64_sql(f"CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SALT}'")} AS skey
  FROM documents
)
SELECT doc_id,
       -- two's-complement view of the uint64 key (DuckDB raises on a
       -- narrowing CAST; numpy .astype(int64) wraps — make SQL wrap too)
       CAST(CAST(skey AS HUGEINT)
            - CASE WHEN skey >= 9223372036854775808::UBIGINT
                   THEN 18446744073709551616::HUGEINT ELSE 0 END AS BIGINT) AS shuffle_key,
       CAST(row_number() OVER (ORDER BY skey, doc_id) AS BIGINT) AS shuffle_pos
FROM keyed
"""


def corpus_shuffle(sf_dir: str):
    """Deterministic corpus shuffle rank. Pass 1: per-batch counts of the
    hash's top SHUFFLE_PREFIX_BITS (partial histograms → one tiny groupby →
    exclusive-prefix-sum offsets broadcast via ray.put, O(2^bits) driver
    state — a constant). Pass 2: groupby(prefix) ranks each bucket locally
    and adds its offset. Both exchanges move O(rows) once; the uint64 key
    fits in BIGINT's value range here because md5's top bit halves to the
    prefix space (we store it as signed via the same CAST on both engines)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.broadcast import put_broadcast, resolve_broadcast

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    shift = 64 - SHUFFLE_PREFIX_BITS

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        keys = np.array(
            [_md5_le_uint64(f"{d}:{SHUFFLE_SALT}") for d in ids], dtype=np.uint64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "shuffle_key": pa.array(keys.astype(np.int64), pa.int64()),
                "prefix": pa.array((keys >> np.uint64(shift)).astype(np.int32)),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    def hist(batch: pa.Table) -> pa.Table:
        agg = batch.select(["prefix"]).group_by("prefix").aggregate([([], "count_all")])
        return pa.table(
            {"prefix": agg["prefix"], "n_part": agg["count_all"].cast(pa.int64())}
        )

    counts = (
        keyed_ds.map_batches(hist, batch_format="pyarrow")
        .groupby("prefix")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    counts = counts.sort_values("prefix")
    offsets = np.zeros(1 << SHUFFLE_PREFIX_BITS, dtype=np.int64)
    np.add.at(offsets, counts["prefix"].to_numpy(), counts["n"].to_numpy())
    offsets = np.concatenate([[0], np.cumsum(offsets)[:-1]])
    off_ref = put_broadcast(offsets)

    def rank_bucket(group: pd.DataFrame) -> pa.Table:
        offs = resolve_broadcast(off_ref)
        # signed int64 view of the uint64 key preserves order WITHIN one
        # prefix bucket (all keys share the top bits, so the sign is
        # constant across the bucket)
        g = group.sort_values(["shuffle_key", "doc_id"], kind="mergesort")
        base = int(offs[int(g["prefix"].iloc[0])])
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].astype("int64")),
                "shuffle_key": pa.array(g["shuffle_key"].astype("int64")),
                "shuffle_pos": pa.array(
                    base + np.arange(1, len(g) + 1, dtype=np.int64), pa.int64()
                ),
            }
        )

    return keyed_ds.groupby("prefix").map_groups(rank_bucket, batch_format="pandas")


# -------------------------------------------------------------- run_clean_job

def run_clean_job(sf_dir: str, out_dir: str, num_buckets: int = 16, resume: bool = True) -> dict:
    """Materialize the cleaned training corpus — the LLM-data counterpart of
    pipelines/kg.run_kg_job: quality gates + lang-ID + near-dup survival
    (corpus_clean), then the surviving documents with their text, written as
    a hash-partitioned, checkpoint-resumable parquet store.

    Layout:
        out_dir/survivors/…                stage 1: corpus_clean output (ids + features)
        out_dir/survivors/_SUCCESS
        out_dir/corpus/doc_bucket=N/*.parquet   stage 2: cleaned corpus
        out_dir/lineage.json               per-partition doc/byte counts
        out_dir/_SUCCESS                   job done marker

    A rerun after a stage-2 crash skips the (expensive, shuffle-bearing)
    clean+dedup stage entirely; a rerun after success returns the recorded
    lineage. write_parquet appends uuid-named files, so any stage dir
    without its _SUCCESS is cleared before re-running (the kg-job
    crash-safety invariant)."""
    import json
    import shutil

    import ray.data as rd

    from .dedup import _doc_bucket

    success = os.path.join(out_dir, "_SUCCESS")
    lineage_path = os.path.join(out_dir, "lineage.json")
    if resume and os.path.exists(success):
        with open(lineage_path) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    for marker in (success, lineage_path):
        if os.path.exists(marker):
            os.remove(marker)

    # ---- stage 1: quality gates + lang-ID + dedup survival ----
    surv_dir = os.path.join(out_dir, "survivors")
    surv_done = os.path.join(surv_dir, "_SUCCESS")
    if not (resume and os.path.exists(surv_done)):
        shutil.rmtree(surv_dir, ignore_errors=True)
        corpus_clean(sf_dir).write_parquet(surv_dir)
        with open(surv_done, "w") as f:
            f.write("ok\n")

    # ---- stage 2: attach text, partition, store ----
    shutil.rmtree(os.path.join(out_dir, "corpus"), ignore_errors=True)
    survivors = rd.read_parquet(surv_dir, columns=["doc_id", "pred_lang"])
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    )

    def tag_surv(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "pred_lang": batch["pred_lang"].cast(pa.string()),
                "text": pa.nulls(n, pa.string()),
                "source": pa.nulls(n, pa.string()),
                "doc_bucket": pa.array(_doc_bucket(ids, num_buckets)),
            }
        )

    def tag_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "pred_lang": pa.nulls(n, pa.string()),
                "text": batch["text"].cast(pa.string()),
                "source": batch["source"].cast(pa.string()),
                "doc_bucket": pa.array(_doc_bucket(ids, num_buckets)),
            }
        )

    def attach(group: pd.DataFrame) -> pa.Table:
        is_surv = group["pred_lang"].notna()
        keep = set(group.loc[is_surv, "doc_id"].astype("int64"))
        lang = dict(
            zip(group.loc[is_surv, "doc_id"].astype("int64"), group.loc[is_surv, "pred_lang"])
        )
        d = group.loc[~is_surv]
        d = d[d["doc_id"].astype("int64").isin(keep)]
        ids = d["doc_id"].astype("int64").to_numpy()
        bucket = int(group["doc_bucket"].iloc[0])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(d["text"], pa.string()),
                "source": pa.array(d["source"], pa.string()),
                "pred_lang": pa.array([lang[int(i)] for i in ids], pa.string()),
                "doc_bucket": pa.array(np.full(len(ids), bucket, dtype=np.int32)),
            }
        )

    union = survivors.map_batches(tag_surv, batch_format="pyarrow").union(
        docs.map_batches(tag_doc, batch_format="pyarrow")
    )
    cleaned = union.groupby("doc_bucket").map_groups(attach, batch_format="pandas")
    cleaned.write_parquet(os.path.join(out_dir, "corpus"), partition_cols=["doc_bucket"])

    store = rd.read_parquet(os.path.join(out_dir, "corpus"))

    def part_metrics(group: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "doc_bucket": pa.array([int(group["doc_bucket"].iloc[0])], pa.int64()),
                "n_docs": pa.array([len(group)], pa.int64()),
                "n_bytes": pa.array(
                    [int(sum(len(t.encode("utf-8")) for t in group["text"]))], pa.int64()
                ),
            }
        )

    metrics = store.groupby("doc_bucket").map_groups(part_metrics, batch_format="pandas").take_all()
    lineage = {
        "sf_dir": sf_dir,
        "num_buckets": num_buckets,
        "n_docs": int(sum(m["n_docs"] for m in metrics)),
        "n_bytes": int(sum(m["n_bytes"] for m in metrics)),
        "partitions": [
            {k: int(v) for k, v in m.items()}
            for m in sorted(metrics, key=lambda m: m["doc_bucket"])
        ],
    }
    with open(lineage_path, "w") as f:
        json.dump(lineage, f, indent=1)
    with open(success, "w") as f:
        f.write("ok\n")
    return lineage


# ---------------------------------------------------------- corpus_source_stats

# Per-source datasheet: documents, bytes, whitespace tokens and the
# exact-duplicate rate of every source — the "datasheets for datasets"
# table a corpus release ships, and the input the mixture planner
# (corpus_mixture) weights against. Integer-only.

CORPUS_SOURCE_STATS_SQL = f"""
WITH d AS (
  SELECT source, doc_id, strlen(text) AS n_bytes,
         len(list_filter(regexp_split_to_array(text, '[{ASCII_WS}]+'), x -> x <> '')) AS n_tokens,
         md5(text) AS h
  FROM documents
),
dup AS (
  SELECT source, count(*) - count(DISTINCT h) AS n_dup_docs FROM d GROUP BY source
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(any_value(dup.n_dup_docs) AS BIGINT) AS n_dup_docs
FROM d JOIN dup USING (source)
GROUP BY d.source
"""


def corpus_source_stats(sf_dir: str):
    """Per-source corpus datasheet. One scan computes per-batch partials
    for bytes/tokens/docs; the exact per-source duplicate count needs
    distinct content hashes per source, so (source, hash) pairs dedup
    progressively (in-batch group first, then the (source,hash)-bucketed
    group) before a per-source count — the same progressive-distinct
    topology as events_rollup's user roster."""
    import zlib

    import ray.data as rd
    from ray.data.aggregate import Sum

    from .text import ASCII_WS as _ws

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "text"]
    )
    split_re = f"[{_ws}]+"

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["text"].cast(pa.string()), split_re)
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = la.flatten()
        offs = la.offsets.to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok_np = (
            np.add.reduceat(np.append(nonempty, 0), np.minimum(offs[:-1], len(nonempty)))[
                : batch.num_rows
            ]
            if len(nonempty)
            else np.zeros(batch.num_rows, dtype=np.int64)
        )
        # reduceat quirk guard: token lists are never empty (split of ""
        # yields [""]), so no segment is zero-width
        n_tok = pa.array(n_tok_np.astype(np.int64), pa.int64())
        hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        t = pa.table(
            {
                "source": batch["source"].cast(pa.string()),
                "n_bytes": pc.binary_length(pc.cast(batch["text"], pa.large_binary())).cast(pa.int64()),
                "n_tokens": n_tok,
                "h": pa.array(hashes, pa.string()),
            }
        )
        agg = t.group_by(["source", "h"]).aggregate(
            [("n_bytes", "sum"), ("n_tokens", "sum"), ([], "count_all")]
        )
        hb = np.fromiter(
            (
                zlib.crc32(f"{s}|{h}".encode()) % 64
                for s, h in zip(agg["source"].to_pylist(), agg["h"].to_pylist())
            ),
            dtype=np.int32,
            count=agg.num_rows,
        )
        return pa.table(
            {
                "source": agg["source"],
                "h": agg["h"],
                "b_part": agg["n_bytes_sum"].cast(pa.int64()),
                "t_part": agg["n_tokens_sum"].cast(pa.int64()),
                "c_part": agg["count_all"].cast(pa.int64()),
                "hbucket": pa.array(hb),
            }
        )

    def merge(group: pd.DataFrame) -> pa.Table:
        # all copies of a (source, hash) land here: docs = sum of counts,
        # distinct = 1 per (source, hash) row after the inner group
        agg = (
            group.groupby(["source", "h"], sort=False)
            .agg(b=("b_part", "sum"), t=("t_part", "sum"), c=("c_part", "sum"))
            .reset_index()
        )
        out = (
            agg.groupby("source", sort=False)
            .agg(
                n_docs=("c", "sum"),
                n_bytes=("b", "sum"),
                n_tokens=("t", "sum"),
                n_distinct=("h", "size"),
            )
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(out["source"], pa.string()),
                "docs_part": pa.array(out["n_docs"].astype("int64")),
                "bytes_part": pa.array(out["n_bytes"].astype("int64")),
                "tokens_part": pa.array(out["n_tokens"].astype("int64")),
                "distinct_part": pa.array(out["n_distinct"].astype("int64")),
            }
        )

    final = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hbucket")
        .map_groups(merge, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("docs_part", alias_name="n_docs"),
            Sum("bytes_part", alias_name="n_bytes"),
            Sum("tokens_part", alias_name="n_tokens"),
            Sum("distinct_part", alias_name="n_distinct"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        nd = batch["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = batch["n_distinct"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "source": batch["source"].cast(pa.string()),
                "n_docs": pa.array(nd, pa.int64()),
                "n_bytes": batch["n_bytes"].cast(pa.int64()),
                "n_tokens": batch["n_tokens"].cast(pa.int64()),
                "n_dup_docs": pa.array(nd - ns, pa.int64()),
            }
        )

    return final.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------- corpus_search

# Conjunctive (AND) term search with term-frequency ranking — the serving
# twin of token_postings: given K query terms, return the top-N documents
# containing ALL of them, ranked by total tf. Documents are row-atomic, so
# the entire match+score is MAP-ONLY (per-batch explode → filter to the
# query set → per-doc tf); the only global step is the top-N sort over the
# (already tiny) candidate set — no exchange touches non-matching docs.
SEARCH_TERMS = ("table", "join", "fast")
SEARCH_TOPN = 20

CORPUS_SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[{ASCII_WS}]+')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks
  WHERE token IN {str(tuple(SEARCH_TERMS))}
  GROUP BY doc_id, token
),
hits AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf_total
  FROM tf GROUP BY doc_id
  HAVING count(DISTINCT token) = {len(SEARCH_TERMS)}
)
SELECT doc_id, tf_total FROM hits
ORDER BY tf_total DESC, doc_id LIMIT {SEARCH_TOPN}
"""


def corpus_search(sf_dir: str, terms: tuple = SEARCH_TERMS, topn: int = SEARCH_TOPN):
    """Top-N docs containing ALL query terms, ranked by summed tf."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    term_set = pa.array(sorted(terms), pa.string())
    n_terms = len(terms)

    def match(batch: pa.Table) -> pa.Table:
        doc_ids, toks = _explode_lower_tokens(batch)
        keep = pc.is_in(toks, value_set=term_set)
        mask = keep.to_numpy(zero_copy_only=False)
        if not mask.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "tf_total": pa.array([], pa.int64())}
            )
        df = pd.DataFrame(
            {"doc_id": doc_ids[mask], "token": toks.filter(keep).to_pandas()}
        )
        per = df.groupby("doc_id")["token"].agg(["count", "nunique"])
        hits = per[per["nunique"] == n_terms]
        return pa.table(
            {
                "doc_id": pa.array(hits.index.to_numpy(dtype=np.int64)),
                "tf_total": pa.array(hits["count"].to_numpy(dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(match, batch_format="pyarrow")
        .sort(["tf_total", "doc_id"], descending=[True, False])
        .limit(topn)
    )


# ------------------------------------------------------ corpus_phrase_search

# Exact-phrase (adjacent-token) search — the positional complement of
# corpus_search's bag-of-words AND. Both engines evaluate the SAME RE2
# pattern (Arrow's match_substring_regex and DuckDB's regexp_matches are
# both RE2), so token-boundary semantics are engine-identical by
# construction: the phrase must be delimited by ASCII whitespace or
# text edges. Map-only: no exchange touches non-matching documents.
PHRASE = ("table", "hash")
_PHRASE_RE = (
    f"(^|[{ASCII_WS}])" + f"[{ASCII_WS}]+".join(PHRASE) + f"([{ASCII_WS}]|$)"
)

CORPUS_PHRASE_SEARCH_SQL = f"""
SELECT doc_id, source
FROM documents
WHERE regexp_matches(lower(text), '{_PHRASE_RE}')
"""


def corpus_phrase_search(sf_dir: str):
    """(doc_id, source) of documents containing the phrase as adjacent
    whitespace-delimited tokens."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    )

    def match(batch: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(
            pc.utf8_lower(batch["text"].cast(pa.string())), _PHRASE_RE
        )
        t = batch.filter(hit)
        return pa.table(
            {"doc_id": t["doc_id"].cast(pa.int64()), "source": t["source"].cast(pa.string())}
        )

    return ds.map_batches(match, batch_format="pyarrow")


# --------------------------------------------------------------- corpus_bm25

# BM25-ranked disjunctive search over the query terms — the lexical-ranking
# baseline every retrieval stack ships. Like tfidf, the idf factor is the
# LINEAR N/df (dividing the same two integers is IEEE-deterministic on both
# engines, where ln() would hinge on libm equality); the BM25 novelty kept
# here is the tf-saturation + length-normalization term, which is pure
# rational arithmetic evaluated in the IDENTICAL expression order in numpy
# and SQL, so every double is bit-equal. Two passes over documents (the
# doc_length_filter two-pass precedent): a stats pass reduces to 2+K driver
# scalars (N, sum(dl), df per query term — constant size), then a map-only
# scoring pass + global top-N sort.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPN = 20

_BM25_SCORE_SQL = f"""
  (n.nd / df.df) * (tf.tf * ({BM25_K1} + 1.0)) /
  (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / n.avgdl))
"""

CORPUS_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[{ASCII_WS}]+')) AS token
  FROM documents
),
t AS (SELECT doc_id, token FROM toks WHERE token <> ''),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM t GROUP BY doc_id),
n AS (
  SELECT CAST(count(*) AS DOUBLE) AS nd,
         (SELECT CAST(count(*) AS DOUBLE) FROM t) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM t
  WHERE token IN {str(tuple(SEARCH_TERMS))}
  GROUP BY doc_id, token
),
df AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM t
  WHERE token IN {str(tuple(SEARCH_TERMS))}
  GROUP BY token
),
scores AS (
  SELECT tf.doc_id,
         sum(CAST(floor(({_BM25_SCORE_SQL}) * 1000000.0 + 0.5) AS BIGINT)) AS si
  FROM tf
  JOIN df ON df.token = tf.token
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN n
  GROUP BY tf.doc_id
)
SELECT doc_id, round(si / 1000000.0, 4) AS score
FROM scores ORDER BY round(si / 1000000.0, 4) DESC, doc_id LIMIT {BM25_TOPN}
"""
# NB: per-term parts are quantized to INTEGER micro-units (floor(x*1e6+.5),
# parts are strictly positive) BEFORE the per-doc sum, so the sum is exact
# integer arithmetic and independent of summation ORDER — sum() order is
# unspecified in SQL while the Python side sums in token-sorted order, and
# float addition is non-associative, so summing raw doubles could differ by
# 1 ulp at an exact round(.,4) half-way point and flip the top-N boundary.
# The final cut still ranks by the ROUNDED score on BOTH engines
# (knn_graph_ann precedent).


def corpus_bm25(sf_dir: str, terms: tuple = SEARCH_TERMS, topn: int = BM25_TOPN):
    """Top-N docs under BM25 (linear-idf variant) for the query terms."""
    import ray.data as rd

    from ..core.rounding import np_round_half_away

    path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    term_list = sorted(terms)
    term_set = pa.array(term_list, pa.string())

    # ---- pass 1: corpus stats (reduces to 2 + K scalars on the driver)
    def stats_partial(batch: pa.Table) -> pa.Table:
        doc_ids, toks = _explode_lower_tokens(batch)
        keep = pc.is_in(toks, value_set=term_set)
        mask = keep.to_numpy(zero_copy_only=False)
        dfp = np.zeros(len(term_list), dtype=np.int64)
        if mask.any():
            hit = pd.DataFrame(
                {"doc_id": doc_ids[mask], "token": toks.filter(keep).to_pandas()}
            ).drop_duplicates()
            vc = hit["token"].value_counts()
            for i, w in enumerate(term_list):
                dfp[i] = int(vc.get(w, 0))
        return pa.table(
            {
                "one": pa.array([0], pa.int64()),
                "n_docs": pa.array([batch.num_rows], pa.int64()),
                "n_toks": pa.array([len(doc_ids)], pa.int64()),
                **{f"df_{i}": pa.array([dfp[i]], pa.int64()) for i in range(len(term_list))},
            }
        )

    from ray.data.aggregate import Sum

    aggs = [Sum("n_docs", alias_name="N"), Sum("n_toks", alias_name="T")] + [
        Sum(f"df_{i}", alias_name=f"DF{i}") for i in range(len(term_list))
    ]
    stats = ds.map_batches(stats_partial, batch_format="pyarrow").groupby("one").aggregate(*aggs).take_all()[0]
    nd = float(stats["N"])
    avgdl = float(stats["T"]) / nd
    dfs = {term_list[i]: float(stats[f"DF{i}"]) for i in range(len(term_list))}

    # ---- pass 2: map-only scoring (expression order mirrors the SQL twin)
    def score(batch: pa.Table) -> pa.Table:
        doc_ids, toks = _explode_lower_tokens(batch)
        dl_all = pd.Series(doc_ids).groupby(doc_ids).size()  # tokens per doc
        keep = pc.is_in(toks, value_set=term_set)
        mask = keep.to_numpy(zero_copy_only=False)
        if not mask.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        df_ = pd.DataFrame({"doc_id": doc_ids[mask], "token": toks.filter(keep).to_pandas()})
        tf = df_.groupby(["doc_id", "token"]).size().reset_index(name="tf")
        tfv = tf["tf"].to_numpy(dtype=np.float64)
        dlv = dl_all.loc[tf["doc_id"]].to_numpy(dtype=np.float64)
        dfv = tf["token"].map(dfs).to_numpy(dtype=np.float64)
        part = (nd / dfv) * (tfv * (BM25_K1 + 1.0)) / (
            tfv + BM25_K1 * (1.0 - BM25_B + BM25_B * dlv / avgdl)
        )
        # integer micro-units before the sum — order-independent, exact
        # (mirrors the SQL twin's floor(part*1e6+0.5) cast; parts > 0)
        part_int = np.floor(part * 1e6 + 0.5).astype(np.int64)
        agg = (
            pd.DataFrame({"doc_id": tf["doc_id"], "part": part_int})
            .groupby("doc_id")["part"]
            .sum()
        )
        return pa.table(
            {
                "doc_id": pa.array(agg.index.to_numpy(dtype=np.int64)),
                "score": pa.array(
                    np_round_half_away(agg.to_numpy(dtype=np.float64) / 1e6, 4),
                    pa.float64(),
                ),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(topn)
    )
