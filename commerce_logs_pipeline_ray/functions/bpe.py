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

import heapq

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


def bpe_encode_passes(ds: Dataset, merges: pd.DataFrame, col: str = "tokens") -> Dataset:
    """Reference encode path: one full vectorized pass over the batch's flat
    token stream PER merge rule, in ``merge_idx`` order (same kernel as
    training, :func:`_apply_merge_batch`).  Bit-exact to the training rewrite
    by construction, but O(num_merges × tokens) per batch — kept as the
    independent oracle/testing implementation for :func:`bpe_encode`, which
    computes the identical result sublinearly in dead rules."""
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


# per-worker-process cache of the decoded rule index for a broadcast merge
# table (keyed by the ObjectRef hex) — the index is built once per process,
# not once per batch
_RULE_INDEX_CACHE: dict[str, tuple] = {}


def _rule_index(mref) -> tuple:
    key = mref.hex()
    if key not in _RULE_INDEX_CACHE:
        left, right, new_id = ray.get(mref)
        packed = (left.astype(np.int64) << np.int64(32)) | right.astype(np.int64)
        order = np.argsort(packed, kind="stable")
        rank_dict = {int(p): r for r, p in enumerate(packed)}
        _RULE_INDEX_CACHE.clear()  # one live merge table per process is the norm
        _RULE_INDEX_CACHE[key] = (
            packed[order],
            order.astype(np.int64),
            rank_dict,
            left.astype(np.int64),
            right.astype(np.int64),
            new_id.astype(np.int64),
        )
    return _RULE_INDEX_CACHE[key]


def _linked_list_init(
    values: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(vals:int64 mutable copy, nxt, prv) doubly-linked list over the flat
    stream with -1 links at sequence boundaries (``offsets`` rebased to 0)."""
    n = len(values)
    vals = values.astype(np.int64)
    nxt = np.arange(1, n + 1, dtype=np.int64)
    prv = np.arange(-1, n - 1, dtype=np.int64)
    if n:
        nxt[n - 1] = -1
    nonempty = offsets[1:] > offsets[:-1]
    nxt[offsets[1:][nonempty] - 1] = -1
    prv[offsets[:-1][nonempty]] = -1
    return vals, nxt, prv


def _initial_occurrences(
    vals: np.ndarray, nxt: np.ndarray, sorted_keys: np.ndarray, sorted_rank: np.ndarray
) -> dict[int, list[int]]:
    """rank → ascending flat positions of every initial within-sequence pair
    that matches a rule, discovered in ONE vectorized pass."""
    n = len(vals)
    if n < 2 or len(sorted_keys) == 0:
        return {}
    packed = (vals[:-1] << np.int64(32)) | vals[1:]
    in_seq = nxt[:-1] == np.arange(1, n, dtype=np.int64)
    ins = np.searchsorted(sorted_keys, packed)
    ins_c = np.minimum(ins, len(sorted_keys) - 1)
    pos = np.flatnonzero(in_seq & (sorted_keys[ins_c] == packed))
    if pos.size == 0:
        return {}
    ranks = sorted_rank[ins_c[pos]]
    order = np.argsort(ranks, kind="stable")  # stable keeps positions ascending
    pos, ranks = pos[order], ranks[order]
    heads = np.flatnonzero(np.concatenate(([True], ranks[1:] != ranks[:-1])))
    bounds = np.append(heads, len(pos))
    return {int(ranks[h]): pos[h : bounds[i + 1]].tolist() for i, h in enumerate(heads)}


def encode_flat(
    values: np.ndarray, offsets: np.ndarray, rule_index: tuple
) -> tuple[np.ndarray, np.ndarray]:
    """Apply a trained merge table to a flat (values, offsets) stream with
    the classic linked-list priority encoder: rules fire in ``merge_idx``
    order, each exhaustively with greedy left-to-right non-overlap — the
    exact semantics of :func:`bpe_encode_passes`, but total work is
    O(tokens + merges_applied) instead of O(num_merges × tokens): rules whose
    pair never occurs in the batch are never touched (dead-rule elimination
    falls out of indexing occurrences, not rules).

    Soundness of the single ascending-rank sweep: a merge (a,b)→n only
    creates pairs CONTAINING n, and any rule whose pair contains n was
    trained after n existed, so its rank is strictly greater than the rank
    that minted n — new occurrences always land on ranks still ahead of the
    sweep, never behind it."""
    if len(values) == 0 or len(rule_index[0]) == 0:
        return values.copy(), offsets.copy()
    sorted_keys, sorted_rank, rank_dict, left, right, new_id = rule_index
    vals, nxt, prv = _linked_list_init(values, offsets)
    occ = _initial_occurrences(vals, nxt, sorted_keys, sorted_rank)
    heap = sorted(occ.keys())
    while heap:
        r = heapq.heappop(heap)
        plist = occ.pop(r)
        plist.sort()  # appended (newly created) positions arrive unsorted
        a, b, nid = int(left[r]), int(right[r]), int(new_id[r])
        for p in plist:
            if vals[p] != a:
                continue
            q = nxt[p]
            if q == -1 or vals[q] != b:
                continue
            vals[p] = nid
            vals[q] = -1
            nq = nxt[q]
            nxt[p] = nq
            if nq != -1:
                prv[nq] = p
            pp = prv[p]
            if pp != -1:
                nr = rank_dict.get((int(vals[pp]) << 32) | nid)
                if nr is not None:
                    lst = occ.get(nr)
                    if lst is None:
                        occ[nr] = [pp]
                        heapq.heappush(heap, nr)
                    else:
                        lst.append(pp)
            if nq != -1:
                nr = rank_dict.get((nid << 32) | int(vals[nq]))
                if nr is not None:
                    lst = occ.get(nr)
                    if lst is None:
                        occ[nr] = [p]
                        heapq.heappush(heap, nr)
                    else:
                        lst.append(p)
    keep = vals >= 0
    prefix = np.concatenate(([0], np.cumsum(keep, dtype=np.int64)))
    return vals[keep].astype(np.int32), prefix[offsets]


def bpe_encode(ds: Dataset, merges: pd.DataFrame, col: str = "tokens") -> Dataset:
    """Apply a TRAINED merge table to sequences — the tokenizer INFERENCE
    path (training's dual).  Bit-identical to the training rewrite (and to
    :func:`bpe_encode_passes`), but scale-safe in the vocabulary: the
    linked-list priority encoder (:func:`encode_flat`) does O(tokens) work
    per batch regardless of merge-table size, so a realistic 32k–100k-merge
    vocab costs the same as a toy 6-merge one.  The merge table rides one
    ``ray.put`` broadcast; the per-process rule index is built once
    (``_rule_index`` cache), and the stage is a stateless fused
    ``map_batches``."""
    m = merges.sort_values("merge_idx")
    mref = ray.put(
        (
            m["left"].to_numpy(dtype=np.int64),
            m["right"].to_numpy(dtype=np.int64),
            m["new_id"].to_numpy(dtype=np.int64),
        )
    )

    def apply_fast(t: pa.Table) -> pa.Table:
        idx = _rule_index(mref)
        values, offsets = _flat_tokens(t, col)
        base = offsets[0]
        nv, no = encode_flat(values[base : offsets[-1]], offsets - base, idx)
        arr = pa.LargeListArray.from_arrays(
            pa.array(no, type=pa.int64()), pa.array(nv, type=pa.int32())
        ).cast(pa.list_(pa.int32()))
        return t.set_column(t.schema.get_field_index(col), col, arr)

    return ds.map_batches(apply_fast, batch_format="pyarrow", zero_copy_batch=True)


def bpe_train_flat(
    values: np.ndarray, offsets: np.ndarray, num_merges: int, vocab_base: int
) -> pd.DataFrame:
    """Driver-side incremental BPE trainer over a flat (values, offsets)
    stream — the classic linked-list + lazy-max-heap algorithm with EXACT
    adjacent-occurrence counts maintained per merge, so the merge table it
    emits is bit-identical to the distributed per-round-recount
    :func:`bpe_train` on the same corpus (same count, same smallest-packed-
    pair tie-break, same greedy rewrite).  O(tokens log vocab) total instead
    of O(num_merges × corpus): this is the trainer to run on a bounded
    SAMPLE (merge-table quality is statistical) while :func:`bpe_encode`
    applies the result to the full corpus distributed."""
    merges: list[tuple[int, int, int, int, int]] = []
    n = len(values)
    if n >= 2 and num_merges > 0:
        vals, nxt, prv = _linked_list_init(values, offsets)
        packed = (vals[:-1] << np.int64(32)) | vals[1:]
        pos = np.flatnonzero(nxt[:-1] == np.arange(1, n, dtype=np.int64))
        keys = packed[pos]
        order = np.argsort(keys, kind="stable")
        pos, keys = pos[order], keys[order]
        heads = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        bounds = np.append(heads, len(pos))
        occ = {int(keys[h]): pos[h : bounds[i + 1]].tolist() for i, h in enumerate(heads)}
        counts = {k: len(v) for k, v in occ.items()}
        heap = [(-c, k) for k, c in counts.items()]
        heapq.heapify(heap)
        for i in range(num_merges):
            best = None
            while heap:
                c, k = heapq.heappop(heap)
                cur = counts.get(k, 0)
                if cur == -c and cur >= 1:
                    best = (k, cur)
                    break
                if cur >= 1:  # stale entry: reinsert at its true count
                    heapq.heappush(heap, (-cur, k))
            if best is None:
                break
            k, cur = best
            a, b = k >> 32, k & 0xFFFFFFFF
            nid = vocab_base + i
            merges.append((i, a, b, cur, nid))
            plist = occ.pop(k)
            plist.sort()
            for p in plist:
                if vals[p] != a:
                    continue
                q = nxt[p]
                if q == -1 or vals[q] != b:
                    continue
                counts[k] -= 1
                pp, nq = prv[p], nxt[q]
                if pp != -1:
                    x = int(vals[pp])
                    counts[(x << 32) | a] -= 1
                    nk = (x << 32) | nid
                    counts[nk] = counts.get(nk, 0) + 1
                    occ.setdefault(nk, []).append(int(pp))
                    heapq.heappush(heap, (-counts[nk], nk))
                if nq != -1:
                    y = int(vals[nq])
                    counts[(b << 32) | y] -= 1
                    nk = (nid << 32) | y
                    counts[nk] = counts.get(nk, 0) + 1
                    occ.setdefault(nk, []).append(int(p))
                    heapq.heappush(heap, (-counts[nk], nk))
                vals[p] = nid
                vals[q] = -1
                nxt[p] = nq
                if nq != -1:
                    prv[nq] = p
    return pd.DataFrame(
        merges, columns=["merge_idx", "left", "right", "count", "new_id"]
    ).astype("int64")


def bpe_train_sampled(
    parquet_path: str,
    num_merges: int,
    vocab_base: int,
    max_rows: int = 2000,
    col: str = "tokens",
) -> pd.DataFrame:
    """Train a merge table on a deterministic bounded prefix of a Parquet
    corpus (file row order is stable), driver-side via
    :func:`bpe_train_flat`.  The production shape for large vocabularies:
    the vocab is a STATISTIC of the corpus, so it trains on a capped sample
    while encode runs distributed over everything."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=[col])
    if len(t) > max_rows:
        t = t.slice(0, max_rows)
    values, offsets = _flat_tokens(t, col)
    base = offsets[0]
    return bpe_train_flat(values[base : offsets[-1]], offsets - base, num_merges, vocab_base)
