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
from .rounding import round_like_duckdb as _rd

# max tile edge for hot-bucket new×prior signature comparisons in
# minhash_dedup_against_state: peak per-tile memory is
# _CROSS_TILE² × 2 bytes (uint16 agreement counts) ≈ 2 MB
_CROSS_TILE = 1024

MERSENNE_61 = (1 << 61) - 1

# Sentinel "word hash" for pad positions in sub-k-word docs (an arbitrary
# odd 64-bit constant; collides with a real word hash w.p. ~2^-64).
_PAD_WORD_HASH = np.uint64(0xD6E8FEB86659FD93)


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


def gram_hash_stream(
    texts: list[str], k: int, gram_mix: np.ndarray, pad_short: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Flat k-gram hash stream + per-doc offsets, vectorized.

    ONE Arrow-buffer FNV pass over every word in the batch; k-gram hashes
    built by mixing the word hashes with shifted-array arithmetic (no
    per-gram string construction).  Shared by :class:`MinHasher` and
    :class:`ShingleExploder`.

    ``pad_short`` controls docs shorter than k words: True (the MinHash /
    contamination convention) emits ONE pad-sentinel gram per short doc so
    every doc has a shingle set; False (the substring-dedup convention,
    matching SQL ``generate_series(1, len(w) - k + 1)``) emits ZERO grams —
    a <k-word doc has no k-word window to deduplicate.
    """
    words_per_doc = [(s or "").split(" ") for s in texts]
    counts = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64, count=len(texts))
    flat_words = [w for ws in words_per_doc for w in ws]
    wh = fnv1a64(pa.array(flat_words, type=pa.string()))
    starts = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    # k-gram mix within docs: gram_i = Σ_j mix_j * wh[i+j]; docs shorter
    # than k words emit ONE gram with out-of-range positions filled by a
    # pad sentinel (matching word_shingles' one-whole-doc-gram semantics).
    # Padding — NOT clamp-repeating the last word — so a 2-word doc "a b"
    # can never hash-collide with a genuine "a b b" 3-gram in a longer doc.
    gram_counts = np.maximum(counts - k + 1, 1 if pad_short else 0)
    g_starts = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(gram_counts, out=g_starts[1:])
    total = int(g_starts[-1])
    grams = np.zeros(total, dtype=np.uint64)
    wh_ext = np.append(wh, _PAD_WORD_HASH)
    pad_idx = wh.shape[0]
    with np.errstate(over="ignore"):
        # positions: for doc d, gram g lives at g_starts[d]+g and reads
        # words starts[d]+g .. +g+k-1 (pad-sentinel past the doc's end)
        doc_idx = np.repeat(np.arange(len(texts)), gram_counts)
        within = np.arange(total) - g_starts[doc_idx]
        base = starts[doc_idx] + within
        last = starts[doc_idx] + counts[doc_idx] - 1
        for j in range(k):
            widx = base + j
            grams += gram_mix[j] * wh_ext[np.where(widx > last, pad_idx, widx)]
    return grams, g_starts


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

    def __init__(
        self,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_k: int = 3,
        seed: int = 42,
        emit_signature: bool = False,
    ):
        assert num_hashes % bands == 0
        self.a, self.b = _hash_params(num_hashes, seed)
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_k = shingle_k
        # emit_signature=True carries each doc's full signature on its band
        # rows (fixed-size binary), so pair estimation happens inside the
        # bucket co-group — no second pass over the corpus and no driver
        # signature table (the shuffle pays num_hashes*8 bytes per band row)
        self.emit_signature = emit_signature
        rng = np.random.default_rng(seed + 1)
        self.gram_mix = rng.integers(1, 1 << 62, size=shingle_k, dtype=np.uint64)

    def _shingle_stream(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Flat k-gram hash stream + per-doc offsets, vectorized."""
        return gram_hash_stream(texts, self.shingle_k, self.gram_mix)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_hashes) MinHash signatures, vectorized.

        Computed one hash FUNCTION at a time over the flat gram stream with
        in-place ops: the (grams × num_hashes) matrix never materializes —
        each column pass stays cache-resident, measured 20×+ faster than the
        broadcasted matrix at identical output."""
        grams, g_starts = self._shingle_stream(texts)
        n = len(g_starts) - 1
        M = np.uint64(MERSENNE_61)
        out = np.empty((n, len(self.a)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(len(self.a)):
                col = grams * self.a[j]
                col += self.b[j]
                col %= M
                out[:, j] = np.minimum.reduceat(col, g_starts[:-1])
        return out

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
        doc_arr = doc_ids.combine_chunks() if isinstance(doc_ids, pa.ChunkedArray) else doc_ids
        doc_rep = pa.concat_arrays([doc_arr] * self.bands) if self.bands > 1 else doc_arr
        cols = {
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(hashes.reshape(-1)),
            "doc_id": doc_rep,
        }
        if self.emit_signature:
            sig_type = pa.binary(self.num_hashes * 8)
            buf = pa.py_buffer(np.ascontiguousarray(sigs).tobytes())
            sig_arr = pa.FixedSizeBinaryArray.from_buffers(sig_type, n, [None, buf])
            cols["sig"] = pa.concat_arrays([sig_arr] * self.bands) if self.bands > 1 else sig_arr
        return pa.table(cols)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


class ShingleExploder:
    """map_batches stage: text → distinct ``(shingle, doc_id, n_sh)`` rows.

    One vectorized gram-hash pass per batch (:func:`gram_hash_stream`), then
    per-doc dedup via one lexsort — no per-row Python.  ``n_sh`` (the doc's
    DISTINCT shingle count) rides on every exploded row so the downstream
    pair reduce can compute Jaccard without a second join back to the corpus.
    """

    def __init__(self, shingle_k: int = 3, seed: int = 42):
        rng = np.random.default_rng(seed + 1)
        self.gram_mix = rng.integers(1, 1 << 62, size=shingle_k, dtype=np.uint64)
        self.shingle_k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table(
                {"shingle": pa.array([], type=pa.uint64()),
                 "doc_id": t["doc_id"],
                 "n_sh": pa.array([], type=pa.int64())}
            )
        grams, g_starts = gram_hash_stream(texts, self.shingle_k, self.gram_mix)
        doc_idx = np.repeat(np.arange(n), np.diff(g_starts))
        order = np.lexsort((grams, doc_idx))
        di, gr = doc_idx[order], grams[order]
        keep = np.r_[True, (di[1:] != di[:-1]) | (gr[1:] != gr[:-1])]
        di, gr = di[keep], gr[keep]
        n_sh = np.bincount(di, minlength=n)
        doc_arr = t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        return pa.table(
            {
                "shingle": pa.array(gr),
                "doc_id": pc.take(doc_arr, pa.array(di, type=pa.int64())),
                "n_sh": pa.array(n_sh[di], type=pa.int64()),
            }
        )


def ngram_jaccard_pairs(
    docs: Dataset,
    threshold: float = 0.5,
    shingle_k: int = 3,
    seed: int = 42,
    df_cutoff: int | None = None,
    return_counts: bool = False,
) -> pd.DataFrame:
    """EXACT all pairs with word-k-gram-shingle Jaccard ≥ ``threshold``,
    distributed as a shingle inverted-index self-join (the classic exact
    set-similarity join): explode docs to distinct ``(shingle, doc_id,
    n_sh)`` rows → group by shingle → emit co-occurring doc pairs → group by
    pair → ``|A∩B| = pair count``, ``J = c / (n_a + n_b - c)``.

    Both exchanges move coarse hash buckets (:func:`bucketed_group_reduce`),
    never documents; nothing but the qualifying pairs reaches the driver.

    Scale note: the pair stream is Θ(Σ_shingle df²) — a shingle appearing in
    m docs emits m(m-1)/2 rows.  Natural-language k≥3 shingles are
    near-unique so this is ~|near-dup pairs|·|shingles/doc| in practice, but
    a pathological hot shingle (boilerplate) can blow it up; ``df_cutoff``
    drops shingles with document frequency > cutoff (standard df-pruning —
    a doc pair sharing ONLY ultra-common shingles is below any useful
    threshold anyway, but strictly this trades exactness for boundedness;
    prefix/positional filtering à la PPJoin is the published exact scale
    path).  Default ``None`` = exact.

    Returns columns ``doc_a, doc_b, jaccard`` (doc_a < doc_b), exact — the
    ground-truth counterpart of :func:`minhash_lsh_pairs`' estimates
    (oracle-checked in SQL via DuckDB gram explode, see
    ``pipelines/queries.py::SQL_JACCARD_NEARDUP``).
    """
    from .relational import bucketed_group_reduce

    rows = docs.map_batches(
        ShingleExploder(shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def shingle_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Per coarse bucket: emit co-occurring doc pairs per shingle group.
        Size-2 groups (the overwhelming case for near-dup corpora) are one
        vectorized pass; rare df>2 shingles take `np.triu_indices`."""
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype=df["doc_id"].dtype),
             "doc_b": pd.Series(dtype=df["doc_id"].dtype),
             "na": pd.Series(dtype="int64"), "nb": pd.Series(dtype="int64")}
        )
        df = df.sort_values(["shingle", "doc_id"], kind="stable")
        sh = df["shingle"].to_numpy()
        n = len(df)
        if n == 0:
            return empty
        change = np.r_[True, sh[1:] != sh[:-1]]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, n])
        if df_cutoff is not None:
            keep = sizes <= df_cutoff
            starts, sizes = starts[keep], sizes[keep]
        ids = df["doc_id"].to_numpy()
        ns = df["n_sh"].to_numpy()
        outs = []
        s2 = starts[sizes == 2]
        if len(s2):
            outs.append(pd.DataFrame({
                "doc_a": ids[s2], "doc_b": ids[s2 + 1],
                "na": ns[s2], "nb": ns[s2 + 1],
            }))
        for s, m in zip(starts[sizes > 2], sizes[sizes > 2]):
            gi, gn = ids[s : s + m], ns[s : s + m]
            ii, jj = np.triu_indices(m, k=1)
            outs.append(pd.DataFrame({
                "doc_a": gi[ii], "doc_b": gi[jj], "na": gn[ii], "nb": gn[jj],
            }))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    pair_stream = bucketed_group_reduce(rows, ["shingle"], shingle_pairs)

    def pair_reduce(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            c=("na", "size"), na=("na", "first"), nb=("nb", "first")
        )
        j = g["c"] / (g["na"] + g["nb"] - g["c"])
        out = g.assign(jaccard=j)
        cols = (["doc_a", "doc_b", "jaccard", "c", "na", "nb"]
                if return_counts else ["doc_a", "doc_b", "jaccard"])
        return out.loc[out["jaccard"] >= threshold, cols]

    result = bucketed_group_reduce(pair_stream, ["doc_a", "doc_b"], pair_reduce).to_pandas()
    if result.empty:
        empty = {"doc_a": pd.Series(dtype="object"), "doc_b": pd.Series(dtype="object"),
                 "jaccard": pd.Series(dtype="float64")}
        if return_counts:
            empty.update({c: pd.Series(dtype="int64") for c in ["c", "na", "nb"]})
        return pd.DataFrame(empty)
    return result.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


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

    Fully distributed pipeline: map_batches(MinHasher, emit_signature=True)
    → singleton-bucket prune → bucket co-group emits pairs ALREADY
    est-filtered from the signatures carried on the band rows → distributed
    pair dedup.  No driver-side signature/text table: the only data that
    ever reaches the driver is the qualifying-pair result itself, plus —
    when ``verify=True`` — the shingle sets of exactly the docs in that
    result (Θ(|result|), computed distributed and collected for the final
    per-pair exact-Jaccard join).

    Returns columns: doc_a, doc_b, est_jaccard[, jaccard] (doc_a < doc_b).
    """
    hasher = MinHasher(
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k, seed=seed, emit_signature=True
    )

    # materialize once: both the bucket-count prune and the pair stage
    # consume the band rows — without pinning, Ray re-executes the signature
    # pass per consumer (signatures are the dominant compute)
    band_rows = docs.map_batches(hasher, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # prune singleton buckets BEFORE the co-group: in a mostly-unique corpus
    # >99% of band buckets hold one doc, and a per-group UDF call for each is
    # the dominant cost.  One cheap count pass (coarse-bucket reduce — Ray's
    # sort groupby is pathological at this key cardinality) + broadcast
    # membership filter leaves only buckets that can produce pairs.
    from .relational import bucketed_group_reduce

    def count_buckets(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["band_id", "band_hash"], as_index=False).size()
        return out[out["size"] > 1].rename(columns={"size": "n"})

    # the count prune needs only the two 8-byte key columns — never ship the
    # 512-byte signatures (or doc ids) through this exchange
    dup_tbl = bucketed_group_reduce(
        band_rows.select_columns(["band_id", "band_hash"]), ["band_id", "band_hash"], count_buckets
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

    H = num_hashes

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Per coarse bucket: for each (band_id, band_hash) group, emit the
        pairs whose signature-agreement fraction clears the threshold.  The
        signatures ride on the band rows, so estimation is local to the
        group — nothing returns to the driver.

        Near-dup band buckets are overwhelmingly SIZE 2, so those are
        estimated in ONE vectorized pass across all groups (adjacent rows
        after the group sort); only the rare m>2 buckets take the per-group
        path."""
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype="object"), "doc_b": pd.Series(dtype="object"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
        df = df.sort_values(["band_id", "band_hash", "doc_id"], kind="stable")
        df = df.drop_duplicates(["band_id", "band_hash", "doc_id"])
        bi = df["band_id"].to_numpy()
        bh = df["band_hash"].to_numpy()
        n = len(df)
        if n == 0:
            return empty
        change = np.r_[True, (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, n])
        ids = df["doc_id"].to_numpy()
        sig_mat = np.frombuffer(b"".join(df["sig"]), dtype=np.uint64).reshape(n, H)
        outs = []
        s2 = starts[sizes == 2]
        if len(s2):
            est2 = (sig_mat[s2] == sig_mat[s2 + 1]).mean(axis=1)
            keep = est2 >= threshold
            if keep.any():
                outs.append(pd.DataFrame({
                    "doc_a": ids[s2[keep]],
                    "doc_b": ids[s2[keep] + 1],
                    "est_jaccard": _rd(est2[keep], 6),
                }))
        for s, m in zip(starts[sizes > 2], sizes[sizes > 2]):
            gs = sig_mat[s : s + m]
            gids = ids[s : s + m]
            # memory-light pairwise agreement: one m×m accumulator, H passes
            agree = np.zeros((m, m), dtype=np.uint16)
            for h in range(H):
                col = gs[:, h]
                agree += col[:, None] == col[None, :]
            est = agree / H
            ii, jj = np.nonzero(np.triu(est >= threshold, k=1))
            if len(ii):
                outs.append(pd.DataFrame({
                    "doc_a": gids[ii], "doc_b": gids[jj],
                    "est_jaccard": _rd(est[ii, jj], 6),
                }))
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    pair_stream = bucketed_group_reduce(survivors, ["band_id", "band_hash"], bucket_pairs)
    # a pair can surface from several bands — the duplicate stream is
    # Θ(bands × |result|), i.e. output-sized, so the dedup runs where the
    # result lands anyway (swap in a bucketed reduce if |result| outgrows
    # the driver)
    pairs = pair_stream.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    if pairs.empty:
        cols = ["doc_a", "doc_b", "est_jaccard"] + (["jaccard"] if verify else [])
        return pd.DataFrame(columns=cols)

    if verify:
        # exact-Jaccard verify over ONLY the docs appearing in the result:
        # broadcast the (output-sized) id set, compute shingle sets
        # distributed, collect Θ(|result|) shingle rows for the final join
        needed_ref = ray.put(pa.array(list(set(pairs["doc_a"]) | set(pairs["doc_b"]))))

        def shingle_rows(t: pa.Table) -> pa.Table:
            want = ray.get(needed_ref) if isinstance(needed_ref, ray.ObjectRef) else needed_ref
            mask = pc.is_in(t["doc_id"], value_set=want)
            sub = t.filter(pc.fill_null(mask, False))
            sh = [word_shingles(s, shingle_k) for s in sub["text"].to_pylist()]
            return pa.table(
                {"doc_id": sub["doc_id"], "shingles": pa.array([x.tolist() for x in sh],
                                                               type=pa.list_(pa.uint64()))}
            )

        hits = docs.map_batches(shingle_rows, batch_format="pyarrow").to_pandas()
        sh = {d: np.asarray(v, dtype=np.uint64) for d, v in zip(hits["doc_id"], hits["shingles"])}
        pairs = pairs.assign(
            jaccard=_rd(
                [jaccard(sh[a], sh[b]) for a, b in zip(pairs["doc_a"], pairs["doc_b"])], 6
            )
        )
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
        """fp → one (band_id, band_val, doc_id, simhash) row per band —
        all columns built by numpy repeat/shift, no per-row Python."""
        sims = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sims)
        shifts = (np.uint64(bits_per_band) * np.arange(bands, dtype=np.uint64))[:, None]
        vals = ((sims[None, :] >> shifts) & band_mask).astype(np.int64)  # (bands, n)
        doc_arr = t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        return pa.table(
            {
                "band_id": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                "band_val": pa.array(vals.reshape(-1)),
                "doc_id": pa.concat_arrays([doc_arr] * bands) if bands > 1 else doc_arr,
                "simhash": pa.array(np.tile(sims, bands)),
            }
        )

    _POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)

    def _popcount64(x: np.ndarray) -> np.ndarray:
        return _POP8[x.view(np.uint8)].reshape(len(x), 8).sum(axis=1)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Per coarse bucket: pairwise Hamming distances within each
        (band_id, band_val) group — XOR + byte-table popcount, vectorized
        over all candidate pairs at once."""
        empty = pd.DataFrame(
            {"doc_a": pd.Series(dtype="object"), "doc_b": pd.Series(dtype="object"),
             "hamming": pd.Series(dtype="int64")}
        )
        df = df.drop_duplicates(["band_id", "band_val", "doc_id"]).sort_values(
            ["band_id", "band_val", "doc_id"], kind="stable"
        )
        n = len(df)
        if n == 0:
            return empty
        bi = df["band_id"].to_numpy()
        bv = df["band_val"].to_numpy()
        change = np.r_[True, (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, n])
        ids = df["doc_id"].to_numpy()
        hs = df["simhash"].to_numpy().astype(np.uint64)
        ii_all, jj_all = [], []
        for s, m in zip(starts[sizes > 1], sizes[sizes > 1]):
            ii, jj = np.triu_indices(m, k=1)
            ii_all.append(ii + s)
            jj_all.append(jj + s)
        if not ii_all:
            return empty
        ii = np.concatenate(ii_all)
        jj = np.concatenate(jj_all)
        d = _popcount64(hs[ii] ^ hs[jj])
        keep = d <= max_hamming
        return pd.DataFrame(
            {"doc_a": ids[ii[keep]], "doc_b": ids[jj[keep]],
             "hamming": d[keep].astype(np.int64)}
        )

    from .relational import bucketed_group_reduce

    pairs = bucketed_group_reduce(
        fps.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        ["band_id", "band_val"],
        bucket_pairs,
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def _emb_block(t: pa.Table, id_col: str = "vec_id") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if len(t) == 0:  # reshape(0, -1) raises; empty blocks are legal
        return (np.zeros(0, dtype=np.int64), np.zeros((0, 1)), np.zeros(0))
    arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
    mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    return ids, mat, norms


@ray.remote
def _block_pair_cosine(ta: pa.Table, tb: pa.Table, threshold: float, same: bool) -> pa.Table:
    """One tile of the all-pairs cosine matrix: block_a × block_b."""
    empty = pa.table(
        {"vec_a": pa.array([], type=pa.int64()), "vec_b": pa.array([], type=pa.int64()),
         "cos": pa.array([], type=pa.float64())}
    )
    if len(ta) == 0 or len(tb) == 0:
        return empty
    ia, ma, na = _emb_block(ta)
    ib, mb, nb = _emb_block(tb)
    cos = (ma @ mb.T) / np.outer(na, nb)
    ii, jj = np.nonzero(cos >= threshold)
    # each unordered BLOCK pair is computed exactly once, so orienting by id
    # (and, for the diagonal tile, keeping the strict upper triangle) makes
    # every qualifying vector pair appear exactly once
    keep = ia[ii] != ib[jj] if not same else ia[ii] < ib[jj]
    ii, jj = ii[keep], jj[keep]
    a, b = ia[ii], ib[jj]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table(
        {
            "vec_a": pa.array(lo, type=pa.int64()),
            "vec_b": pa.array(hi, type=pa.int64()),
            "cos": pa.array(_rd(cos[ii, jj], 6)),
        }
    )


def embedding_neardup_pairs(embeddings: Dataset, threshold: float = 0.95) -> pd.DataFrame:
    """EXACT all pairs with cosine ≥ threshold, distributed as block-pair
    tile tasks: the dataset's blocks stay in the object store and each task
    pulls exactly two blocks (zero-copy) and emits one tile of qualifying
    pairs — no driver-side matrix, no full-corpus broadcast.

    All-pairs at a low threshold is inherently O(N²) compute; this
    distributes it as B(B+1)/2 independent tiles (B = num blocks), each
    O((N/B)²·d) — the classic exact self-join tiling.  For HIGH thresholds
    (true near-dup, cos ≥ ~0.9) prefer :func:`embedding_neardup_lsh`, which
    prunes candidate pairs with hyperplane-LSH band buckets at a measured
    recall (tests/test_dedup.py) — on this corpus the qualifying pairs sit at
    θ≈60-66° (cos 0.4-0.6) where hyperplane banding cannot prune soundly, so
    the exact tiling is the default.
    """
    refs = embeddings.to_arrow_refs()
    tasks = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            tasks.append(_block_pair_cosine.remote(refs[i], refs[j], threshold, i == j))
    tiles = [t for t in ray.get(tasks) if t.num_rows]
    if not tiles:
        return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                             "vec_b": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    out = pa.concat_tables(tiles).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_neardup_lsh(
    embeddings: Dataset,
    threshold: float = 0.4,
    bits_per_band: int = 4,
    n_bands: int = 16,
    seed: int = 42,
    dim: int = 64,
) -> pd.DataFrame:
    """Approximate near-dup pairs via banded hyperplane LSH: per-batch band
    signatures → bucket-keyed exchange → exact cosine verify within buckets
    (precision 1.0 by construction) → distributed pair dedup.

    Recall per true pair at angle θ is 1-(1-(1-θ/π)^r)^L (r=bits_per_band,
    L=n_bands) — a dial measured against the exact tiling in
    tests/test_dedup.py.  The only shuffle moves (band, bucket, id, vector)
    rows; no driver-side corpus materialization.
    """
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, bits_per_band * n_bands))
    planes_ref = ray.put(planes)
    pow2 = (1 << np.arange(bits_per_band)).astype(np.int64)

    def band_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"band_id": pa.array([], type=pa.int32()),
                 "band_val": pa.array([], type=pa.int64()),
                 "vec_id": pa.array([], type=pa.int64()),
                 "embedding": t["embedding"]}
            )
        pl = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        ids, mat, norms = _emb_block(t)
        signs = (mat @ pl) >= 0  # (n, r*L)
        n = len(ids)
        out_band, out_val = [], []
        for b in range(n_bands):
            chunk = signs[:, b * bits_per_band : (b + 1) * bits_per_band]
            out_band.append(np.full(n, b, dtype=np.int32))
            out_val.append(chunk @ pow2)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(out_band)),
                "band_val": pa.array(np.concatenate(out_val), type=pa.int64()),
                "vec_id": pa.array(np.tile(ids, n_bands), type=pa.int64()),
                "embedding": pa.concat_arrays(
                    [t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]] * n_bands
                ) if n_bands > 1 else t["embedding"],
            }
        )

    rows = embeddings.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (_, _), g in df.groupby(["band_id", "band_val"], sort=False):
            g = g.drop_duplicates("vec_id")
            if len(g) < 2:
                continue
            ids = g["vec_id"].to_numpy()
            mat = np.asarray([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
            norms = np.sqrt((mat * mat).sum(axis=1))
            cos = (mat @ mat.T) / np.outer(norms, norms)
            ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
            if len(ii) == 0:
                continue
            a, b = ids[ii], ids[jj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            outs.append(pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos": _rd(cos[ii, jj], 6)}))
        if not outs:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64"),
                                 "cos": pd.Series(dtype="float64")})
        return pd.concat(outs, ignore_index=True)

    from .relational import bucketed_group_reduce

    pairs = bucketed_group_reduce(rows, ["band_id", "band_val"], bucket_pairs)
    # a pair found in k bands appears k times — dedup distributed, keyed on
    # the pair itself, before the (output-sized) driver collect
    deduped = bucketed_group_reduce(
        pairs, ["vec_a", "vec_b"], lambda df: df.drop_duplicates(["vec_a", "vec_b"])
    ).to_pandas()
    return deduped.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def minhash_dedup_against_state(
    new_docs: Dataset,
    prior_band_rows: "Dataset | None",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
) -> "tuple[pd.DataFrame, Dataset]":
    """INCREMENTAL near-dup: match a NEW batch of docs against the persisted
    LSH band state of everything already ingested — the near-dup analogue
    of the exact/span-level incremental dedups (dedup a new crawl against
    the existing corpus without recomputing or even REREADING it).

    Returns ``(matches, new_band_rows)``: ``matches`` has one row per new
    doc whose best prior match clears ``threshold``
    (``doc_id, matched_prior, est_jaccard`` — ties broken by smallest prior
    id), and ``new_band_rows`` is the materialized band-row Dataset to
    append to the state (parquet of band_id/band_hash/doc_id/sig — the
    signatures ride the rows, so future runs never need prior text).

    Distribution: prior rows union with new rows tagged by side; ONE
    bucketed co-group on (band_id, band_hash) — only buckets holding both
    sides compare signatures (vectorized new×prior agreement per bucket);
    the exchange carries band rows, never documents.  Params must match
    the run that built the state.  Doc ids must be unique across runs.
    """
    hasher = MinHasher(
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k, seed=seed,
        emit_signature=True,
    )
    new_rows = new_docs.map_batches(
        hasher, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    empty = pd.DataFrame(
        {"doc_id": pd.Series(dtype="object"), "matched_prior": pd.Series(dtype="object"),
         "est_jaccard": pd.Series(dtype="float64")}
    )
    if prior_band_rows is None:
        return empty, new_rows

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in ("band_id", "band_hash", "doc_id", "sig")}
            cols["side"] = pa.nulls(len(t), pa.int8()).fill_null(side)
            return pa.table(cols)

        return fn

    both = new_rows.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True).union(
        prior_band_rows.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
    )
    H = num_hashes

    def cross_matches(df: pd.DataFrame) -> pd.DataFrame:
        out: list[pd.DataFrame] = []
        df = df.drop_duplicates(["band_id", "band_hash", "doc_id", "side"])
        # vectorized prune first: only buckets holding BOTH sides can yield a
        # cross match — in a mostly-unique corpus that's a tiny fraction, and
        # the per-group Python loop below must never see the rest
        sides = df.groupby(["band_id", "band_hash"], sort=False)["side"]
        df = df[sides.transform("min") != sides.transform("max")]
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            new = g[g["side"] == 1]
            old = g[g["side"] == 0]
            if len(new) == 0 or len(old) == 0:
                continue
            sn = np.frombuffer(b"".join(new["sig"]), dtype=np.uint64).reshape(len(new), H)
            so = np.frombuffer(b"".join(old["sig"]), dtype=np.uint64).reshape(len(old), H)
            nid = new["doc_id"].to_numpy()
            oid = old["doc_id"].to_numpy()
            # tile the new×prior agreement matrix: a band-hash hot on BOTH
            # sides (degenerate all-identical corpus) must not build an m×n
            # matrix in one task — peak memory stays ≤ _CROSS_TILE² cells
            # per tile regardless of bucket size (same block-pair trick as
            # skew_join / embedding_neardup_exact)
            side = _CROSS_TILE
            for i0 in range(0, len(sn), side):
                sn_t = sn[i0 : i0 + side]
                for j0 in range(0, len(so), side):
                    so_t = so[j0 : j0 + side]
                    agree = np.zeros((len(sn_t), len(so_t)), dtype=np.uint16)
                    for h in range(H):
                        agree += sn_t[:, h][:, None] == so_t[:, h][None, :]
                    est = agree / H
                    ii, jj = np.nonzero(est >= threshold)
                    if len(ii):
                        out.append(pd.DataFrame({
                            "doc_id": nid[i0 + ii],
                            "matched_prior": oid[j0 + jj],
                            "est_jaccard": est[ii, jj],
                        }))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    from .relational import bucketed_group_reduce

    cand = bucketed_group_reduce(both, ["band_id", "band_hash"], cross_matches).to_pandas()
    if len(cand) == 0 or "doc_id" not in cand.columns:
        return empty, new_rows
    # best prior match per new doc (max est, then smallest prior id)
    cand = cand.sort_values(
        ["doc_id", "est_jaccard", "matched_prior"], ascending=[True, False, True],
        kind="stable",
    ).drop_duplicates("doc_id", keep="first")
    cand["est_jaccard"] = _rd(cand["est_jaccard"].to_numpy(), 6)
    return cand.reset_index(drop=True), new_rows
