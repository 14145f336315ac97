"""Distributed exact global window ranks: ROW_NUMBER / NTILE over a Dataset.

Ray Data has no window functions; this is the standard MPP construction
(range-bucket by sort key, count per bucket, broadcast prefix offsets,
rank within bucket), composed from public Dataset ops only:

1. sample the primary sort key deterministically (a few rows per block)
   and derive ``num_buckets - 1`` quantile boundaries;
2. assign each row a range bucket with ``np.searchsorted`` — all rows with
   EQUAL primary-key values land in the same bucket, so ties never straddle
   a bucket edge;
3. count rows per bucket (per-batch partials, tiny driver reduce) and
   prefix-sum the counts in bucket order → each bucket's global offset;
4. one grouped exchange on the bucket id; inside each bucket a vectorized
   pandas sort over (key, *tiebreak) assigns ``offset + 1..len``.

Exactness does not depend on the sample — only balance does.  Skew caveat
(documented contract): a single key value repeated N times forms one
unsplittable bucket, like any range-partitioned sort.

Scale notes: the only all-to-all moves the projected rows once (same cost
class as ``Dataset.sort``); the counting pre-pass touches the key column
only, so pass the NARROWEST projection you can.  The upstream pipeline
executes twice (count pass + rank pass) — give this operator a cheap
upstream (a column-pruned read), not an expensive transform chain, or
materialize first.

Reference parity: the reference exposes no window ranks; this backs the
NTILE/decile analytics queries (SURVEY.md §2.8 sorts/limits extended).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_BUCKET_COL = "__rbucket"


def _sample_boundaries(ds: Dataset, key: str, num_buckets: int, per_block: int = 24) -> np.ndarray:
    """Deterministic boundary sample: ``per_block`` evenly-spaced key values
    from each block (no RNG — reproducible across runs), quantile cuts over
    the pooled sample."""

    def pick(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.select([key])
        idx = np.unique(np.linspace(0, n - 1, min(per_block, n)).astype(np.int64))
        return t.select([key]).take(pa.array(idx))

    sample = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    vals = np.sort(sample[key].to_numpy())
    if len(vals) == 0 or num_buckets <= 1:
        return np.array([], dtype=vals.dtype if len(vals) else np.float64)
    cut_pos = (np.arange(1, num_buckets) * len(vals)) // num_buckets
    return np.unique(vals[cut_pos])


def global_row_number(
    ds: Dataset,
    key: str,
    tiebreak: list[str],
    num_buckets: int | None = None,
    out_col: str = "rn",
) -> tuple[Dataset, int]:
    """Exact 1-based global ROW_NUMBER ordered by ``(key, *tiebreak)``
    ascending.  ``(key, *tiebreak)`` must be unique per row for a
    deterministic result (SQL says the same).  Descending: negate a numeric
    key at the call site.

    Returns ``(dataset_with_out_col, total_rows)`` — the total falls out of
    the counting pass for free and every NTILE-style consumer needs it.
    """
    import ray

    if num_buckets is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_buckets = 4 * cpus
    boundaries = _sample_boundaries(ds, key, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        b = np.searchsorted(boundaries, k, side="right").astype(np.int64)
        return t.append_column(_BUCKET_COL, pa.array(b))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    # counting pre-pass: per-batch bucket histogram → tiny driver reduce
    def count_partial(t: pa.Table) -> pa.Table:
        b = t[_BUCKET_COL].to_numpy(zero_copy_only=False)
        ids, cnts = np.unique(b, return_counts=True)
        return pa.table({_BUCKET_COL: ids, "n": cnts})

    counts = (
        bucketed.select_columns([_BUCKET_COL])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby(_BUCKET_COL)["n"]
        .sum()
        .sort_index()
    )
    total = int(counts.sum())
    offsets = {int(b): int(o) for b, o in zip(counts.index, counts.cumsum() - counts)}

    sort_cols = [key, *tiebreak]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        off = offsets[int(df[_BUCKET_COL].iloc[0])]
        df = df.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        df[out_col] = off + 1 + np.arange(len(df), dtype=np.int64)
        return df.drop(columns=[_BUCKET_COL])

    ranked = bucketed.groupby(_BUCKET_COL).map_groups(assign, batch_format="pandas")
    return ranked, total


def ntile_of(rn: np.ndarray, total: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from a 1-based global row number: the first
    ``total % k`` tiles hold ``total // k + 1`` rows, the rest ``total // k``."""
    base, big = divmod(total, k)
    cut = big * (base + 1)
    rn = np.asarray(rn, dtype=np.int64)
    small = np.maximum(base, 1)  # guard k > total: every tile is size ≤ 1
    return np.where(rn <= cut, (rn - 1) // (base + 1) + 1, big + (rn - cut - 1) // small + 1)
