"""Deduplication operators over the ``documents`` table.

Large-scale training-data pipeline staples, each expressed Ray-Data-first:

* exact        — content hash → hash-partitioned groupby → keep first
* minhash LSH  — shingles → minhash sig → banded buckets → candidate pairs
                 → exact-Jaccard verify (classic MinHash/LSH, Broder '97)
* simhash      — 64-bit Charikar simhash per doc + band bucket
* embedding    — label-blocked cosine near-dup pairs (numpy per group)

Exact + embedding have DuckDB oracle twins; the sketch-based ones are
pinned by pytest instead (not SQL-expressible).
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------- exact

DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents
GROUP BY md5(text)
"""


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def dedup_exact(sf_dir: str):
    """Exact dedup: hash → groupby(hash) → min doc_id per content."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = pa.array([_md5_hex(t) for t in batch["text"].to_pylist()])
        return pa.table({"text_hash": hashes, "doc_id": batch["doc_id"]})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    agg = hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dups")
    )

    def cast(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "text_hash": batch["text_hash"],
                "keep_doc_id": pc.cast(batch["keep_doc_id"], pa.int64()),
                "n_dups": pc.cast(batch["n_dups"], pa.int64()),
            }
        )

    return agg.map_batches(cast, batch_format="pyarrow")


# ---------------------------------------------------------------- minhash LSH

N_PERM = 64
N_BANDS = 8  # 8 bands × 8 rows
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5

_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def _shingles(text: str, k: int = SHINGLE_K) -> set[int]:
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = set()
    for g in grams:
        out.add(struct.unpack("<Q", hashlib.md5(g.encode()).digest()[:8])[0] & _MERSENNE)
    return out


def minhash_signature(text: str) -> np.ndarray:
    sh = _shingles(text)
    if not sh:
        return np.full(N_PERM, _MERSENNE, dtype=np.uint64)
    vals = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (a*x + b) mod p for each permutation, vectorized over shingles
    prods = (vals[None, :] * _PERM_A[:, None] + _PERM_B[:, None]) % _MERSENNE
    return prods.min(axis=1)


class MinhashBands:
    """Actor-pool stage: doc → (band_id, band_hash, pair_bucket, doc_id)
    rows. ``pair_bucket`` (crc32 of the band hash) is the shuffle key — a
    fixed-cardinality partition of the band space, so the downstream groupby
    has O(buckets) groups however many docs there are."""

    NUM_PAIR_BUCKETS = 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        doc_ids, band_ids, band_hashes, buckets = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = minhash_signature(text)
            for b in range(N_BANDS):
                band = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                h = hashlib.md5(band.tobytes()).hexdigest()[:16]
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(h)
                buckets.append(zlib.crc32(h.encode()) % self.NUM_PAIR_BUCKETS)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "pair_bucket": pa.array(buckets, pa.int32()),
            }
        )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs for every (band_id, band_hash) bucket in one hash
    partition; only buckets with ≥2 docs contribute (the rare case, so the
    inner loop touches almost nothing)."""
    a, b = [], []
    sizes = group.groupby(["band_id", "band_hash"], sort=False)["doc_id"]
    for _, ids_s in sizes:
        if len(ids_s) < 2:
            continue
        ids = sorted(ids_s.unique())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
    return pd.DataFrame({"doc_a": pd.Series(a, dtype="int64"), "doc_b": pd.Series(b, dtype="int64")})


def dedup_minhash(sf_dir: str, threshold: float = JACCARD_THRESHOLD):
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    Verification broadcasts the shingle sets of *candidate* docs only (the
    candidate set is tiny relative to the corpus by construction)."""
    import ray
    import ray.data as rd

    docs_path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    bands = ds.map_batches(MinhashBands, batch_format="pyarrow", concurrency=(1, 4))
    pairs = bands.groupby("pair_bucket").map_groups(_bucket_pairs, batch_format="pandas")

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    pairs = pairs.map_batches(dedup_pairs, batch_format="pyarrow")

    candidate_rows = pairs.take_all()  # candidate pair set is small by design
    if not candidate_rows:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    cand = pd.DataFrame(candidate_rows).drop_duplicates(["doc_a", "doc_b"])
    needed = set(cand["doc_a"]) | set(cand["doc_b"])

    import pyarrow.parquet as pq

    tbl = pq.read_table(docs_path, columns=["doc_id", "text"])
    texts = {
        d: t
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
        if d in needed
    }
    sh = {d: _shingles(t) for d, t in texts.items()}
    out_a, out_b, out_j = [], [], []
    for a, b in sorted(zip(cand["doc_a"], cand["doc_b"])):
        sa, sb = sh.get(a, set()), sh.get(b, set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(round(j, 4))
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard": pa.array(out_j, pa.float64()),
        }
    )


# ------------------------------------------------------------ ngram jaccard

NGRAM_N = 5

DEDUP_NGRAM_JACCARD_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
g AS (
  SELECT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
         words[i+3] || ' ' || words[i+4] AS gram
  FROM w, UNNEST(range(1, len(words) - {NGRAM_N - 2})) AS t(i)
),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
sizes AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isz
  FROM gd a JOIN gd b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(isz / (sa.n + sb.n - isz), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""


def _word_ngrams(text: str, n: int = NGRAM_N) -> set[str]:
    words = text.split(" ")
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def dedup_ngram_jaccard(sf_dir: str, num_gram_buckets: int = 64):
    """Exact word-5-gram Jaccard over candidate pairs (docs sharing ≥1 gram).

    Topology: shingle rows (bucketed by gram hash) → per-bucket pair
    emission per exact gram → pair-count groupby (= intersection size) →
    jaccard against broadcast per-doc gram counts. The broadcast side is one
    int per doc — small at any corpus size; everything heavy (the shingle
    join) is hash-partitioned.
    """
    import zlib

    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        doc_ids, grams, buckets = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for gm in _word_ngrams(text):
                doc_ids.append(doc_id)
                grams.append(gm)
                buckets.append(zlib.crc32(gm.encode()) % num_gram_buckets)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "gram": pa.array(grams, pa.string()),
                "gram_bucket": pa.array(buckets, pa.int32()),
            }
        )

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")

    # per-doc gram counts → broadcast dict (one int per doc)
    sizes_rows = grams.groupby("doc_id").aggregate(Count(alias_name="n")).take_all()
    sizes = {r["doc_id"]: r["n"] for r in sizes_rows}
    sizes_ref = ray.put(sizes) if ray.is_initialized() else sizes

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        a, b = [], []
        for _, ids_s in group.groupby("gram", sort=False)["doc_id"]:
            if len(ids_s) < 2:
                continue
            ids = sorted(set(ids_s))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame(
            {"doc_a": pd.Series(a, dtype="int64"), "doc_b": pd.Series(b, dtype="int64")}
        )

    pair_rows = grams.groupby("gram_bucket").map_groups(pairs_in_bucket, batch_format="pandas")
    isz = pair_rows.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="isz"))

    def jaccard(batch: pa.Table) -> pa.Table:
        s = ray.get(sizes_ref) if ray.is_initialized() else sizes_ref
        da = batch["doc_a"].to_pylist()
        db = batch["doc_b"].to_pylist()
        iszs = batch["isz"].to_pylist()
        j = [round(i / (s[x] + s[y] - i), 4) for x, y, i in zip(da, db, iszs)]
        return pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            }
        )

    return isz.map_batches(jaccard, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    v = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = struct.unpack("<Q", hashlib.md5(w.encode()).digest()[:8])[0]
        bits = np.unpackbits(np.frombuffer(struct.pack("<Q", h), dtype=np.uint8))
        v += np.where(bits == 1, 1, -1)
    out = np.packbits((v > 0).astype(np.uint8))
    return struct.unpack("<Q", out.tobytes())[0]


def dedup_simhash(sf_dir: str):
    """Per-doc 64-bit simhash + 16-bit band bucket (near-dup blocking key)."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def compute(batch: pa.Table) -> pa.Table:
        hashes = [simhash64(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array([f"{h:016x}" for h in hashes], pa.string()),
                "bucket16": pa.array([h >> 48 for h in hashes], pa.int64()),
            }
        )

    return ds.map_batches(compute, batch_format="pyarrow")


# ---------------------------------------------------------------- embedding

EMBED_COS_THRESHOLD = 0.3

DEDUP_EMBEDDING_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {EMBED_COS_THRESHOLD}
"""


def _embed_group_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = group["vec_id"].to_numpy()
    mat = np.stack(group["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    sims = (mat @ mat.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= EMBED_COS_THRESHOLD
    a, b = ids[iu[0][mask]], ids[iu[1][mask]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pd.DataFrame(
        {
            "vec_a": pd.Series(lo, dtype="int64"),
            "vec_b": pd.Series(hi, dtype="int64"),
            "cos_sim": np.round(sims[iu][mask], 4),
        }
    )


def dedup_embedding(sf_dir: str):
    """Embedding-cosine near-dup pairs, blocked by label (the IVF-style
    bucketing: at scale the blocking key is a coarse quantizer cell)."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding", "label"]
    )
    return ds.groupby("label").map_groups(_embed_group_pairs, batch_format="pandas")
