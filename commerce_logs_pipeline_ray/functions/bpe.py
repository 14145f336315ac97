"""Distributed BPE merge training over the ``tokens: list<int32>`` payload.

Byte-pair-encoding training is the canonical ITERATIVE token-pipeline job:
each round (1) counts adjacent within-sequence pairs corpus-wide, (2) picks
the globally most frequent pair, (3) rewrites every sequence replacing that
pair with a fresh id — then repeats on the rewritten corpus (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

Ray Data shape per round:

* pair counts reuse the packed-int64 bigram combiners from ``tokens.py``
  (per-batch ``np`` pair packing → bucketed reduce — the exchange moves only
  per-batch (pair, n) partials, never tokens);
* the global argmax is a distributed top-1 (per-block prune), so the driver
  only ever sees ONE row per round;
* the merge apply is a vectorized ``map_batches`` rewrite on the flat Arrow
  values/offsets buffers — greedy left-to-right non-overlapping matches via
  run-parity selection (no Python over tokens);
* the rewritten corpus is ``materialize()``d between rounds — at cluster
  scale this is the per-iteration checkpoint you want anyway (each round is
  a full pass; re-deriving round k from round 0 lazily would recompute k-1
  rewrites per task and inflate lineage on failure).

Determinism: ties on the max count break toward the smallest packed pair
key, so training is reproducible across partitionings (pair counts are
partition-independent sums).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .tokens import _bigram_partial, _flat_tokens


def _select_merge_positions(mask: np.ndarray) -> np.ndarray:
    """Greedy left-to-right non-overlapping match positions from a candidate
    mask over pair-start indices: within each RUN of consecutive candidates
    (e.g. 'aaaa' matching pair (a,a) → candidates 0,1,2) keep alternating
    members starting at the run head — exactly the sequential greedy result,
    computed without a Python loop."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return idx
    new_run = np.empty(idx.size, dtype=bool)
    new_run[0] = True
    new_run[1:] = idx[1:] != idx[:-1] + 1
    run_head = idx[np.maximum.accumulate(np.where(new_run, np.arange(idx.size), 0))]
    return idx[((idx - run_head) % 2) == 0]


def merge_pair_np(
    values: np.ndarray, offsets: np.ndarray, a: int, b: int, new_id: int
) -> tuple[np.ndarray, np.ndarray]:
    """Rewrite flat (values, offsets) replacing each non-overlapping adjacent
    (a, b) with ``new_id``.  ``offsets`` must be rebased to values[0]."""
    n = len(values)
    if n < 2:
        return values.copy(), offsets.copy()
    mask = (values[:-1] == a) & (values[1:] == b)
    ends = offsets[1:] - 1  # last index of each sequence: pair would span
    ends = ends[(ends >= 0) & (ends < n - 1)]
    mask[ends] = False
    pos = _select_merge_positions(mask)
    if pos.size == 0:
        return values.copy(), offsets.copy()
    out = values.copy()
    out[pos] = new_id
    keep = np.ones(n, dtype=bool)
    keep[pos + 1] = False
    # each deletion at flat index j shrinks every offset boundary > j by one
    return out[keep], offsets - np.searchsorted(pos + 1, offsets, side="left")


def _apply_merge_batch(t: pa.Table, a: int, b: int, new_id: int, col: str = "tokens") -> pa.Table:
    values, offsets = _flat_tokens(t, col)
    base = offsets[0]
    window = values[base : offsets[-1]]
    new_vals, new_off = merge_pair_np(window, offsets - base, int(a), int(b), int(new_id))
    arr = pa.LargeListArray.from_arrays(
        pa.array(new_off, type=pa.int64()), pa.array(new_vals, type=pa.int32())
    ).cast(pa.list_(pa.int32()))
    return t.set_column(t.schema.get_field_index(col), col, arr)


def top_pair(ds: Dataset, col: str = "tokens") -> tuple[int, int, int] | None:
    """Globally most frequent adjacent pair (count desc, packed key asc):
    bigram combiners → bucketed reduce → distributed top-1."""
    from .relational import bucketed_group_reduce, topk

    if col != "tokens":  # _bigram_partial reads the canonical column name
        ds = ds.map_batches(
            lambda t: t.rename_columns(
                [("tokens" if c == col else c) for c in t.schema.names]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    partials = ds.map_batches(_bigram_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = bucketed_group_reduce(
        partials, ["bigram"], lambda df: df.groupby("bigram", as_index=False)["count"].sum()
    )
    best = topk(agg, ["count", "bigram"], [True, False], 1).to_pandas()
    if best.empty or int(best["count"].iloc[0]) < 1:
        return None
    packed = int(best["bigram"].iloc[0])
    return packed >> 32, packed & 0xFFFFFFFF, int(best["count"].iloc[0])


def bpe_train(
    ds: Dataset, num_merges: int, vocab_base: int, col: str = "tokens"
) -> pd.DataFrame:
    """Run ``num_merges`` BPE rounds; returns the merge table
    ``(merge_idx, left, right, count, new_id)`` with new ids allocated
    sequentially from ``vocab_base``.  The input Dataset must carry a
    ``list<int32>`` token column; all other columns pass through the
    rewrites untouched."""
    merges = []
    cur = ds
    for i in range(num_merges):
        hit = top_pair(cur, col)
        if hit is None:
            break
        a, b, count = hit
        new_id = vocab_base + i
        merges.append((i, int(a), int(b), int(count), new_id))
        cur = cur.map_batches(
            lambda t, _a=a, _b=b, _n=new_id: _apply_merge_batch(t, _a, _b, _n, col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()  # per-round checkpoint: next round's counts scan this
    return pd.DataFrame(
        merges, columns=["merge_idx", "left", "right", "count", "new_id"]
    ).astype("int64")


def bpe_decode(tokens: list[int], merges: pd.DataFrame) -> list[int]:
    """Expand merged ids back to the base alphabet (test/verification helper:
    decode(train-rewritten corpus) must equal the original bit-exactly)."""
    table = {int(r.new_id): (int(r.left), int(r.right)) for r in merges.itertuples()}

    def expand(tok: int) -> list[int]:
        if tok not in table:
            return [tok]
        l, r = table[tok]
        return expand(l) + expand(r)

    out: list[int] = []
    for tok in tokens:
        out.extend(expand(tok))
    return out


def bpe_encode(ds: Dataset, merges: pd.DataFrame, col: str = "tokens") -> Dataset:
    """Apply a TRAINED merge table to sequences — the tokenizer INFERENCE
    path (training's dual).  Merges apply exhaustively in ``merge_idx``
    (priority) order, each one fully vectorized over the batch's flat token
    stream (same kernel as training, :func:`_apply_merge_batch`), so
    ``encode(original corpus)`` is bit-identical to the corpus state
    training left behind.  The merge table rides one ``ray.put`` broadcast;
    the stage itself is a stateless fused ``map_batches``."""
    rows = [
        (int(r.left), int(r.right), int(r.new_id))
        for r in merges.sort_values("merge_idx").itertuples()
    ]
    mref = ray.put(rows)

    def apply_all(t: pa.Table) -> pa.Table:
        for a, b, new_id in ray.get(mref):
            t = _apply_merge_batch(t, a, b, new_id, col)
        return t

    return ds.map_batches(apply_all, batch_format="pyarrow", zero_copy_batch=True)
