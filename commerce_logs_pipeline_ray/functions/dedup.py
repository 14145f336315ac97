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
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .hashing import fnv1a64, fnv1a64_single

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

    Fully batch-vectorized: one Arrow-buffer FNV pass over every word in the
    batch, k-gram shingle hashes built by mixing the word hashes with
    shifted-array arithmetic (no per-gram string construction), signatures
    via segment minima (``np.minimum.reduceat``) over the flat shingle
    stream, band keys by mixing signature rows.  Stateful (hash parameters
    built once) — usable as an actor pool for large corpora.
    """

    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def __init__(self, num_hashes: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 42):
        assert num_hashes % bands == 0
        self.a, self.b = _hash_params(num_hashes, seed)
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_k = shingle_k
        rng = np.random.default_rng(seed + 1)
        self.gram_mix = rng.integers(1, 1 << 62, size=shingle_k, dtype=np.uint64)

    def _shingle_stream(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Flat k-gram hash stream + per-doc offsets, vectorized."""
        k = self.shingle_k
        words_per_doc = [(s or "").split(" ") for s in texts]
        counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=len(texts))
        flat_words = [w for ws in words_per_doc for w in ws]
        wh = fnv1a64(pa.array(flat_words, type=pa.string()))
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        # k-gram mix within docs: gram_i = Σ_j mix_j * wh[i+j]; grams shorter
        # than k fall back to the doc's full-word mix (matches word_shingles'
        # short-doc behaviour of one whole-doc gram)
        gram_counts = np.maximum(counts - k + 1, 1)
        g_starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(gram_counts, out=g_starts[1:])
        total = int(g_starts[-1])
        grams = np.zeros(total, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # positions: for doc d, gram g lives at g_starts[d]+g and reads
            # words starts[d]+g .. +g+k-1 (clamped for short docs)
            doc_idx = np.repeat(np.arange(len(texts)), gram_counts)
            within = np.arange(total) - g_starts[doc_idx]
            base = starts[doc_idx] + within
            for j in range(k):
                widx = np.minimum(base + j, starts[doc_idx] + counts[doc_idx] - 1)
                grams += self.gram_mix[j] * wh[widx]
        return grams, g_starts

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_hashes) MinHash signatures, vectorized."""
        grams, g_starts = self._shingle_stream(texts)
        n = len(g_starts) - 1
        with np.errstate(over="ignore"):
            # (G, H) universal-hash matrix, segment-min per doc
            H = (grams.reshape(-1, 1) * self.a + self.b) % np.uint64(MERSENNE_61)
        return np.minimum.reduceat(H, g_starts[:-1], axis=0)

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"]
        texts = t["text"].to_pylist()
        n = len(texts)
        sigs = self.signatures(texts)  # (n, H)
        # band bucket key: mix the band's signature rows (vectorized)
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        hashes = np.zeros((self.bands, n), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for band in range(self.bands):
                chunk = sigs[:, band * self.rows_per_band : (band + 1) * self.rows_per_band]
                h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
                for j in range(self.rows_per_band):
                    h = (h ^ chunk[:, j]) * self._MIX
                hashes[band] = h
        doc_rep = pa.concat_arrays([doc_ids.combine_chunks() if isinstance(doc_ids, pa.ChunkedArray) else doc_ids] * self.bands) if self.bands > 1 else (doc_ids.combine_chunks() if isinstance(doc_ids, pa.ChunkedArray) else doc_ids)
        return pa.table(
            {
                "band_id": pa.array(band_ids),
                "band_hash": pa.array(hashes.reshape(-1)),
                "doc_id": doc_rep,
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

    # prune singleton buckets BEFORE the co-group: in a mostly-unique corpus
    # >99% of band buckets hold one doc, and a per-group UDF call for each is
    # the dominant cost.  One cheap count pass (coarse-bucket reduce — Ray's
    # sort groupby is pathological at this key cardinality) + broadcast
    # membership filter leaves only buckets that can produce pairs.
    from .relational import bucketed_group_reduce

    def count_buckets(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["band_id", "band_hash"], as_index=False).size()
        return out[out["size"] > 1].rename(columns={"size": "n"})

    dup_tbl = bucketed_group_reduce(
        band_rows, ["band_id", "band_hash"], count_buckets
    ).to_pandas()
    if dup_tbl.empty:
        cols = ["doc_a", "doc_b", "est_jaccard"] + (["jaccard"] if verify else [])
        return pd.DataFrame(columns=cols)
    # composite key band_id*2^64 ⊕ band_hash is overkill; (band_id, hash) pairs
    # are few — broadcast as a python set of tuples, filter vectorized-ish
    # vectorized membership: pack (band_id, band_hash) into one uint64 key
    # and broadcast an Arrow array (zero-copy per worker; per-row Python
    # set probes + per-batch set unpickling measured as a hotspot)
    def _pack(band_ids, band_hashes) -> np.ndarray:
        b = np.asarray(band_ids, dtype=np.uint64)
        h = np.asarray(band_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (b << np.uint64(58)) ^ (h & np.uint64((1 << 58) - 1))

    dup_packed = pa.array(_pack(dup_tbl["band_id"].to_numpy(), dup_tbl["band_hash"].to_numpy()))
    dup_ref = ray.put(dup_packed)

    def keep_dup_buckets(t: pa.Table) -> pa.Table:
        keys = ray.get(dup_ref) if isinstance(dup_ref, ray.ObjectRef) else dup_ref
        packed = pa.array(
            _pack(
                t["band_id"].to_numpy(zero_copy_only=False),
                t["band_hash"].to_numpy(zero_copy_only=False),
            )
        )
        mask = pc.is_in(packed, value_set=keys)
        return t.filter(pc.fill_null(mask, False))

    survivors = band_rows.map_batches(keep_dup_buckets, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(df["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    pairs = (
        survivors.groupby(["band_id", "band_hash"])
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
        mask = pc.is_in(t["doc_id"], value_set=pa.array(list(want)))
        return t.filter(pc.fill_null(mask, False))

    hits = docs.map_batches(collect, batch_format="pyarrow").to_pandas()
    texts = dict(zip(hits["doc_id"], hits["text"]))
    cand_ids = list(texts.keys())
    sig_mat = hasher.signatures([texts[d] for d in cand_ids])  # ONE vectorized pass
    sigs = dict(zip(cand_ids, sig_mat))
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
    """map_batches stage: text → 64-bit SimHash fingerprint.

    Fully batch-vectorized (same shape as :class:`MinHasher`): ONE
    Arrow-buffer FNV pass over every word in the batch, a (words × 64) ±1
    bit-contribution matrix, per-doc segment sums via ``np.add.reduceat``,
    sign → packed uint64.  No per-row Python, no per-word scalar hashing.
    """

    _BITS = np.arange(64, dtype=np.uint64)
    _POW2 = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def __init__(self, seed: int = 42):
        self.seed = seed  # word hashes are FNV64; no extra params needed

    def simhash_batch(self, texts: list[str]) -> np.ndarray:
        """(n,) uint64 fingerprints for a batch of texts."""
        words_per_doc = [(s or "").split(" ") for s in texts]
        counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=len(texts))
        flat_words = [w for ws in words_per_doc for w in ws]
        wh = fnv1a64(pa.array(flat_words, type=pa.string()))
        # ±1 contribution per (word, bit); per-doc segment sums.  split(" ")
        # yields >= 1 word per doc, so every reduceat segment is non-empty.
        contrib = (2 * ((wh.reshape(-1, 1) >> self._BITS) & np.uint64(1)).astype(np.int32)) - 1
        starts = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        scores = np.add.reduceat(contrib, starts[:-1], axis=0)  # (n, 64)
        with np.errstate(over="ignore"):
            return ((scores > 0).astype(np.uint64) * self._POW2).sum(axis=1, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        return int(self.simhash_batch([text])[0])

    def __call__(self, t: pa.Table) -> pa.Table:
        fps = self.simhash_batch(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(fps)})


def simhash_neardup_pairs(docs: Dataset, max_hamming: int = 3, bands: int = 4) -> pd.DataFrame:
    """Near-dup pairs by SimHash banding: ``bands`` equal bit-bands — any
    pair with Hamming distance ≤ bands-1 shares at least one exact band
    (pigeonhole).  Candidate recall is only guaranteed for
    ``max_hamming <= bands - 1``; asking for a larger radius without more
    bands would silently miss qualifying pairs, so it is rejected."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs at least {max_hamming + 1} bands "
            f"(got {bands}): banding only guarantees recall up to bands-1 bit flips"
        )
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    fps = docs.map_batches(SimHasher(), batch_format="pyarrow", zero_copy_batch=True)
    bits_per_band = 64 // bands
    band_mask = np.uint64((1 << bits_per_band) - 1)

    def explode(t: pa.Table) -> pa.Table:
        sims = t["simhash"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_pylist()
        band_id, band_val, doc = [], [], []
        for b in range(bands):
            chunk = (sims >> np.uint64(bits_per_band * b)) & band_mask
            band_id.extend([b] * len(ids))
            band_val.extend(chunk.tolist())
            doc.extend(ids)
        return pa.table(
            {
                "band_id": pa.array(band_id, type=pa.int32()),
                "band_val": pa.array(band_val, type=pa.int64()),
                "doc_id": pa.array(doc),
                "simhash": pa.array(np.tile(sims, bands)),
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
