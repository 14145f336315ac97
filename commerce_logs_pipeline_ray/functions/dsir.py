"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by the log-likelihood ratio of a
hashed-ngram unigram model of a TARGET distribution vs the RAW distribution,
then select documents whose (length-normalized) log ratio is positive.

Shape for 100 TB:
* pass 1 — ``map_batches`` emits per-batch bucket-count partials (B buckets,
  B=128 → a few KB per batch, regardless of corpus size); driver reduces two
  B-vectors and derives the log-ratio table λ once.
* pass 2 — λ (1 KB) rides the task closure; per-doc weights come from one
  vectorized gram-hash pass per batch.  No shuffle anywhere; the only
  exchange is the KB-sized partial stream.

Hashed features are word BIGRAMS: ``fnv1a64("w1 w2") % n_buckets`` — the
oracle cross-checks the vectorized hash path against an independent
scalar-FNV (gram → bucket) mapping artifact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .hashing import fnv1a64
from .rounding import round_like_duckdb as _rd

N_BUCKETS = 128


def _bigram_buckets(t: pa.Table, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket per bigram, doc_idx per bigram) — vectorized: arrow split,
    element-wise join of adjacent words, one FNV pass."""
    words = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(words), dtype=np.int64), counts)
    flat = words.flatten()
    if len(flat) < 2:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    grams = pc.binary_join_element_wise(flat.slice(0, len(flat) - 1), flat.slice(1), " ")
    same = doc_idx[:-1] == doc_idx[1:]
    h = fnv1a64(grams)
    bucket = (h % np.uint64(n_buckets)).astype(np.int64)[same]
    return bucket, doc_idx[:-1][same]


def dsir_bucket_counts(
    ds: Dataset, target_mask_col: str = "is_target", n_buckets: int = N_BUCKETS
) -> tuple[np.ndarray, np.ndarray]:
    """Pass 1: (target_counts, raw_counts) B-vectors from per-batch partials."""

    def partial(t: pa.Table) -> pa.Table:
        bucket, bdoc = _bigram_buckets(t, n_buckets)
        is_t = t[target_mask_col].to_numpy(zero_copy_only=False)[bdoc]
        ct = np.bincount(bucket[is_t], minlength=n_buckets).astype(np.int64)
        cr = np.bincount(bucket[~is_t], minlength=n_buckets).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(np.arange(n_buckets, dtype=np.int64)),
                "ct": pa.array(ct),
                "cr": pa.array(cr),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = agg.groupby("bucket").sum().reindex(range(n_buckets), fill_value=0)
    return g["ct"].to_numpy(np.int64), g["cr"].to_numpy(np.int64)


def dsir_weights(
    ds: Dataset, target_mask_col: str = "is_target", n_buckets: int = N_BUCKETS
) -> Dataset:
    """Full DSIR scoring: returns a per-doc Dataset (doc_id, source, n_grams,
    weight, selected) where weight is the mean per-gram log ratio
    ln(p_target/p_raw) under add-1 smoothed bucket models, rounded to 6, and
    selected = weight > 0."""
    ct, cr = dsir_bucket_counts(ds, target_mask_col, n_buckets)
    total_t, total_r = int(ct.sum()), int(cr.sum())
    lam = np.log((ct + 1) / np.float64(total_t + n_buckets)) - np.log(
        (cr + 1) / np.float64(total_r + n_buckets)
    )

    def score(t: pa.Table) -> pa.Table:
        bucket, bdoc = _bigram_buckets(t, n_buckets)
        n = len(t)
        n_grams = np.bincount(bdoc, minlength=n).astype(np.int64)
        s = np.bincount(bdoc, weights=lam[bucket], minlength=n)
        with np.errstate(invalid="ignore"):
            weight = _rd(np.where(n_grams > 0, s / np.maximum(n_grams, 1), 0.0), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "n_grams": pa.array(n_grams),
                "weight": pa.array(weight, pa.float64()),
                "selected": pa.array((weight > 0).astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
