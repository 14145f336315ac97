"""Deduplication operators for training-data pipelines.

All operators are expressed Ray-Data-first (SURVEY.md §2.6 J4 exact-dedup
semantics generalized to near-dup):

* **exact**: content-hash → hash-partitioned ``groupby(fp)`` keep-first
  (``pipelines/queries.py::q_dedup_exact``);
* **MinHash + LSH**: per-batch vectorized shingle→minhash signatures →
  explode to ``(band_id, band_hash, doc_id)`` → ``groupby`` band buckets →
  candidate pairs → Jaccard-estimate filter.  The only shuffle moves the
  tiny band-bucket rows, never documents;
* **SimHash**: 64-bit sign-of-weighted-sum fingerprints; near-dup via
  banded Hamming buckets;
* **n-gram Jaccard**: exact verification kernel for candidate pairs;
* **embedding near-dup**: block × broadcast-matrix cosine, emitting pairs
  above a threshold.

Determinism: all hash-function parameters derive from a fixed seed; results
are reproducible across runs and partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .hashing import fnv1a64_single

MERSENNE_61 = (1 << 61) - 1


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_61, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_61, size=num_hashes, dtype=np.uint64)
    return a, b


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique FNV64 hashes of word k-grams (k-shingles)."""
    words = (text or "").split(" ")
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(np.fromiter((fnv1a64_single(g) for g in grams), dtype=np.uint64, count=len(grams)))


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_hashes minima of (a*x + b) mod M61 over the shingle set."""
    # (S, 1) * (H,) broadcast — vectorized over shingles × hash functions
    x = shingles.reshape(-1, 1)
    with np.errstate(over="ignore"):
        h = (x * a + b) % np.uint64(MERSENNE_61)
    return h.min(axis=0)


class MinHasher:
    """map_batches stage: text → LSH band rows (band_id, band_hash, doc_id).

    Stateful (hash parameters + band layout built once) — usable as an actor
    pool for large corpora; cheap enough to run as tasks too.
    """

    def __init__(self, num_hashes: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 42):
        assert num_hashes % bands == 0
        self.a, self.b = _hash_params(num_hashes, seed)
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return minhash_signature(word_shingles(text, self.shingle_k), self.a, self.b)

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        n = len(doc_ids)
        out_doc, out_band, out_hash = [], [], []
        for d, s in zip(doc_ids, texts):
            sig = self.signature(s)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                # band bucket key: FNV64 over the band's signature bytes
                h = fnv1a64_single(chunk.tobytes().hex())
                out_doc.append(d)
                out_band.append(band)
                out_hash.append(np.uint64(h))
        return pa.table(
            {
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(np.array(out_hash, dtype=np.uint64)),
                "doc_id": pa.array(out_doc),
            }
        )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def minhash_lsh_pairs(
    docs: Dataset,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    verify: bool = True,
) -> pd.DataFrame:
    """Near-duplicate candidate pairs with est. (and optionally exact) Jaccard.

    Pipeline: map_batches(MinHasher) → groupby(band bucket) → pairs →
    estimate similarity from full signatures → (optional) exact-Jaccard
    verify.  Signatures for the pair stages come from a broadcast of the
    (doc_id → signature) map — at 100 TB this broadcast becomes a second
    co-grouped shuffle keyed on doc_id; the bucket-pair structure is
    unchanged (documented partitioning assumption).

    Returns columns: doc_a, doc_b, est_jaccard[, jaccard] (doc_a < doc_b).
    """
    hasher = MinHasher(num_hashes=num_hashes, bands=bands, shingle_k=shingle_k, seed=seed)

    band_rows = docs.map_batches(hasher, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(df["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    pairs = (
        band_rows.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if pairs.empty:
        cols = ["doc_a", "doc_b", "est_jaccard"] + (["jaccard"] if verify else [])
        return pd.DataFrame(columns=cols)

    # signatures (and shingles for verify) of only the docs appearing in pairs
    needed = set(pairs["doc_a"]) | set(pairs["doc_b"])
    needed_ref = ray.put(needed)

    def collect(t: pa.Table) -> pa.Table:
        want = ray.get(needed_ref) if isinstance(needed_ref, ray.ObjectRef) else needed_ref
        mask = [d in want for d in t["doc_id"].to_pylist()]
        return t.filter(pa.array(mask))

    hits = docs.map_batches(collect, batch_format="pyarrow").to_pandas()
    texts = dict(zip(hits["doc_id"], hits["text"]))
    sigs = {d: hasher.signature(s) for d, s in texts.items()}
    est = [
        float((sigs[a] == sigs[b]).mean()) for a, b in zip(pairs["doc_a"], pairs["doc_b"])
    ]
    pairs = pairs.assign(est_jaccard=np.round(est, 6))
    pairs = pairs[pairs["est_jaccard"] >= threshold].reset_index(drop=True)
    if verify and len(pairs):
        sh = {d: word_shingles(texts[d], shingle_k) for d in set(pairs["doc_a"]) | set(pairs["doc_b"])}
        pairs = pairs.assign(
            jaccard=np.round(
                [jaccard(sh[a], sh[b]) for a, b in zip(pairs["doc_a"], pairs["doc_b"])], 6
            )
        )
    elif verify:
        pairs = pairs.assign(jaccard=pd.Series(dtype="float64"))
    return pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """map_batches stage: text → 64-bit SimHash fingerprint."""

    def __init__(self, seed: int = 42):
        self.seed = seed  # word hashes are FNV64; no extra params needed

    @staticmethod
    def simhash(text: str) -> int:
        words = (text or "").split(" ")
        if not words:
            return 0
        hashes = np.fromiter((fnv1a64_single(w) for w in words), dtype=np.uint64, count=len(words))
        bits = ((hashes.reshape(-1, 1) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        score = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for i in range(64):
            if score[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out)

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = [self.simhash(s) for s in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "simhash": pa.array(np.array(fps, dtype=np.uint64))}
        )


def simhash_neardup_pairs(docs: Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash banding: 4 bands of 16 bits — any pair with
    Hamming distance ≤ 3 shares at least one exact 16-bit band (pigeonhole).
    Bucket groupby per band → candidate pairs → exact Hamming verify."""
    fps = docs.map_batches(SimHasher(), batch_format="pyarrow", zero_copy_batch=True)

    def explode(t: pa.Table) -> pa.Table:
        sims = t["simhash"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_pylist()
        band_id, band_val, doc = [], [], []
        for b in range(4):
            chunk = (sims >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            band_id.extend([b] * len(ids))
            band_val.extend(chunk.tolist())
            doc.extend(ids)
        return pa.table(
            {
                "band_id": pa.array(band_id, type=pa.int32()),
                "band_val": pa.array(band_val, type=pa.int64()),
                "doc_id": pa.array(doc),
                "simhash": pa.array(np.tile(sims, 4)),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = df.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        hs = rows["simhash"].tolist()
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = int(bin(int(hs[i]) ^ int(hs[j])).count("1"))
                if d <= max_hamming:
                    out.append((ids[i], ids[j], d))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    pairs = (
        fps.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band_id", "band_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(embeddings: Dataset, threshold: float = 0.95) -> pd.DataFrame:
    """All pairs with cosine ≥ threshold: per-batch block × broadcast full
    matrix (fits comfortably: N×dim float32).  At larger N, replace the
    broadcast with an LSH/IVF bucket shuffle (see functions/sim.py)."""
    full = embeddings.to_pandas()
    ids = full["vec_id"].to_numpy()
    mat = np.asarray([np.asarray(e, dtype=np.float64) for e in full["embedding"]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    mat_ref = ray.put((ids, mat, norms))

    def block_pairs(t: pa.Table) -> pa.Table:
        all_ids, all_mat, all_norms = ray.get(mat_ref)
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        block = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        bids = np.asarray(t["vec_id"].to_pylist())
        bnorms = np.sqrt((block * block).sum(axis=1))
        cos = (block @ all_mat.T) / np.outer(bnorms, all_norms)
        ii, jj = np.nonzero(cos >= threshold)
        keep = bids[ii] < all_ids[jj]
        return pa.table(
            {
                "vec_a": pa.array(bids[ii][keep], type=pa.int64()),
                "vec_b": pa.array(all_ids[jj][keep], type=pa.int64()),
                "cos": pa.array(np.round(cos[ii, jj][keep], 6)),
            }
        )

    out = embeddings.map_batches(block_pairs, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
