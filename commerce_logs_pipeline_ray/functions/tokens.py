"""Vectorized operators over the ``tokens: list<int32>`` payload column.

These are the training-data-pipeline operations the tokens table exists for.
Every kernel works directly on the Arrow list array's flat values+offsets
buffers (zero-copy views) — no per-row Python over token data.

* ``token_frequency``: corpus vocab histogram — per-batch
  ``pc.value_counts`` partials, then a distributed ``groupby(token)`` reduce
  (vocab-sized key space ⇒ the shuffle moves ≤|vocab| rows per block);
* ``bigram_topk``: n-gram statistics via packed-int64 bigram keys;
* ``length_histogram``: sequence-length buckets;
* ``pack_sequences``: greedy first-fit packing of documents into fixed-size
  training rows.  Packing is block-local (each block packs its own rows);
  at scale, pre-``repartition`` or length-bucket the input for tighter
  packing — the local strategy keeps packing embarrassingly parallel and
  deterministic per block, which is the right trade at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum
from .rounding import round_like_duckdb as _rd


def _flat_tokens(t: pa.Table, col: str = "tokens") -> tuple[np.ndarray, np.ndarray]:
    """(values:int32[], offsets:int64[n+1]) zero-copy views of the list column."""
    arr = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
    arr = arr.cast(pa.large_list(pa.int32()))  # int64 offsets, uniform view
    values = np.asarray(arr.values, dtype=np.int32)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    return values, offsets


def token_frequency(ds: Dataset, topk: int | None = None) -> pd.DataFrame:
    """(token, count) histogram over the whole corpus."""

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0] : offsets[-1]]
        vc = pc.value_counts(pa.array(window))
        return pa.table(
            {
                "token": pc.struct_field(vc, "values"),
                "count": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    from .relational import bucketed_group_reduce

    out = bucketed_group_reduce(
        partials, ["token"], lambda df: df.groupby("token", as_index=False)["count"].sum()
    ).to_pandas()
    out["token"] = out["token"].astype("int64")
    out["count"] = out["count"].astype("int64")
    out = out.sort_values(["count", "token"], ascending=[False, True]).reset_index(drop=True)
    return out.head(topk) if topk else out


def _bigram_partial(t: pa.Table) -> pa.Table:
    """Per-batch packed-int64 bigram counts (within-sequence only)."""
    values, offsets = _flat_tokens(t)
    base = offsets[0]
    window = values[offsets[0] : offsets[-1]].astype(np.int64)
    if len(window) < 2:
        return pa.table({"bigram": pa.array([], pa.int64()), "count": pa.array([], pa.int64())})
    a = window[:-1]
    b = window[1:]
    # drop pairs spanning a sequence boundary: positions where the FIRST
    # element is the last token of its sequence
    ends = (offsets[1:] - base - 1)  # last index of each sequence in window coords
    ends = ends[(ends >= 0) & (ends < len(a))]
    keep = np.ones(len(a), dtype=bool)
    keep[ends] = False
    key = (a[keep] << np.int64(32)) | b[keep]
    vc = pc.value_counts(pa.array(key))
    return pa.table(
        {
            "bigram": pc.struct_field(vc, "values"),
            "count": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
        }
    )


def bigram_topk(ds: Dataset, k: int = 20) -> pd.DataFrame:
    """Top-k adjacent token pairs (within-sequence, not across boundaries)."""
    partials = ds.map_batches(_bigram_partial, batch_format="pyarrow", zero_copy_batch=True)
    from .relational import bucketed_group_reduce

    agg = bucketed_group_reduce(
        partials, ["bigram"], lambda df: df.groupby("bigram", as_index=False)["count"].sum()
    ).to_pandas()
    agg = agg.sort_values(["count", "bigram"], ascending=[False, True]).head(k)
    out = pd.DataFrame(
        {
            "token_a": (agg["bigram"].to_numpy() >> 32).astype("int64"),
            "token_b": (agg["bigram"].to_numpy() & 0xFFFFFFFF).astype("int64"),
            "count": agg["count"].astype("int64").to_numpy(),
        }
    )
    return out.reset_index(drop=True)


def pmi_topk(ds: Dataset, k: int = 20, min_count: int = 5) -> pd.DataFrame:
    """Top-k collocations by pointwise mutual information
    ``ln( (c_ab/T_bi) / ((c_a/T_uni)·(c_b/T_uni)) )``.

    Scale shape: the ``min_count`` support filter is applied INSIDE the
    bigram reduce — ``bucketed_group_reduce`` co-locates every partial of a
    bigram in one bucket, so the filter is exact there and only survivors
    (plus one sentinel row per bucket carrying the bucket's total bigram
    mass, key −1 — packed keys are always ≥ 0) ever reach the driver.  The
    unigram table is vocabulary-bounded.  The PMI expression mirrors the
    DuckDB oracle's division order exactly so both sides round identically.
    """
    from .relational import bucketed_group_reduce

    partials = ds.map_batches(_bigram_partial, batch_format="pyarrow", zero_copy_batch=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("bigram", as_index=False)["count"].sum()
        total = int(s["count"].sum())
        keep = s[s["count"] >= min_count]
        sentinel = pd.DataFrame({"bigram": [np.int64(-1)], "count": [total]})
        return pd.concat([keep, sentinel], ignore_index=True)

    red = bucketed_group_reduce(partials, ["bigram"], combine).to_pandas()
    t_bi = float(red.loc[red["bigram"] == -1, "count"].sum())
    cand = red[red["bigram"] != -1].copy()

    uni = token_frequency(ds)  # full vocab histogram (bounded)
    t_uni = float(uni["count"].sum())
    cnt = dict(zip(uni["token"], uni["count"]))

    a = (cand["bigram"].to_numpy() >> 32).astype("int64")
    b = (cand["bigram"].to_numpy() & 0xFFFFFFFF).astype("int64")
    c_ab = cand["count"].to_numpy().astype("float64")
    c_a = np.array([cnt[x] for x in a], dtype="float64")
    c_b = np.array([cnt[x] for x in b], dtype="float64")
    pmi = np.log((c_ab / t_bi) / ((c_a / t_uni) * (c_b / t_uni)))
    out = pd.DataFrame(
        {"token_a": a, "token_b": b, "count": cand["count"].astype("int64").to_numpy(), "pmi": pmi}
    )
    out = out.sort_values(["pmi", "token_a", "token_b"], ascending=[False, True, True]).head(k)
    out["pmi"] = out["pmi"].pipe(_rd)
    return out.reset_index(drop=True)


def length_histogram(ds: Dataset, bucket_width: int = 128) -> pd.DataFrame:
    """(bucket, n_sequences, n_tokens) histogram of sequence lengths."""

    def partial(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.divide(t["n_tok"], pa.scalar(bucket_width, pa.int32())), pa.int32())
        flat = pa.table({"bucket": b, "n_tok": t["n_tok"]})
        g = flat.group_by(["bucket"]).aggregate([("n_tok", "count"), ("n_tok", "sum")])
        return pa.table(
            {
                "bucket": pc.cast(g["bucket"], pa.int64()),
                "n_sequences": pc.cast(g["n_tok_count"], pa.int64()),
                "n_tokens": pc.cast(g["n_tok_sum"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        partials.groupby("bucket")
        .aggregate(Sum("n_sequences", alias_name="n_sequences"), Sum("n_tokens", alias_name="n_tokens"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def pack_batch(t: pa.Table, *, max_len: int = 2048, pad_id: int = 0, pad: bool = False) -> pa.Table:
    """Greedy first-fit packing of this block's sequences into rows of at
    most ``max_len`` tokens.  Token values are moved with numpy slice copies
    of the flat buffer — bit-exact, no per-token Python.

    Output: pack_key (block-local), doc_ids (list<string>), tokens
    (list<int32>), n_tok, n_docs.  Sequences longer than max_len are emitted
    alone (never split) — truncation policy belongs to the caller.
    """
    values, offsets = _flat_tokens(t)
    doc_ids = t["doc_id"].to_pylist()
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)

    bins: list[list[int]] = []   # row indices per bin
    bin_free: list[int] = []
    # first-fit decreasing over this block
    order = np.argsort(-lens, kind="stable")
    for i in order:
        L = int(lens[i])
        placed = False
        for bi in range(len(bins)):
            if bin_free[bi] >= L:
                bins[bi].append(int(i))
                bin_free[bi] -= L
                placed = True
                break
        if not placed:
            bins.append([int(i)])
            bin_free.append(max(0, max_len - L))

    out_tokens: list[np.ndarray] = []
    out_docs: list[list[str]] = []
    out_ntok: list[int] = []
    for rows in bins:
        parts = [values[offsets[r] : offsets[r + 1]] for r in rows]
        packed = np.concatenate(parts) if parts else np.zeros(0, np.int32)
        if pad and len(packed) < max_len:
            packed = np.concatenate([packed, np.full(max_len - len(packed), pad_id, np.int32)])
        out_tokens.append(packed)
        out_docs.append([doc_ids[r] for r in rows])
        out_ntok.append(int(sum(int(lens[r]) for r in rows)))

    n = len(bins)
    flat = np.concatenate(out_tokens) if out_tokens else np.zeros(0, np.int32)
    tok_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum([len(x) for x in out_tokens], out=tok_offsets[1:])
    return pa.table(
        {
            "pack_key": pa.array(np.arange(n, dtype=np.int64)),
            "doc_ids": pa.array(out_docs, type=pa.list_(pa.string())),
            "tokens": pa.LargeListArray.from_arrays(pa.array(tok_offsets), pa.array(flat)).cast(
                pa.list_(pa.int32())
            ),
            "n_tok": pa.array(out_ntok, type=pa.int32()),
            "n_docs": pa.array([len(d) for d in out_docs], type=pa.int32()),
        }
    )


def pack_sequences(ds: Dataset, max_len: int = 2048, batch_size: int = 4096) -> Dataset:
    return ds.map_batches(
        pack_batch,
        fn_kwargs={"max_len": max_len},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Sequence-level exact dedup on the tokens payload
# ---------------------------------------------------------------------------

# two independent odd multipliers → a 128-bit effective position-sensitive
# fingerprint; with an odd base, any single-position token difference changes
# the hash (Δ·r^p ≡ 0 mod 2^64 ⇒ Δ ≡ 0), and multi-position cancellations
# must defeat BOTH bases simultaneously
_FP_R1 = np.uint64(0x9E3779B97F4A7C15)
_FP_R2 = np.uint64(0xC2B2AE3D27D4EB4F)
_FP_MIX = np.uint64(0xFF51AFD7ED558CCD)


def sequence_fingerprints(t: pa.Table, col: str = "tokens") -> tuple[np.ndarray, np.ndarray]:
    """Order-sensitive 2×64-bit fingerprints of each row's token array,
    fully vectorized over the flat values buffer: fp_j = (Σ_i tok_i · r_j^i
    mod 2^64) · MIX ⊕ len.  Segment sums via wrap-around cumsum (no
    reduceat edge cases); bit-exact function of the token array only, so
    equal arrays collide by construction and unequal ones don't (w.p.
    ~2^-128)."""
    values, offsets = _flat_tokens(t, col)
    starts = (offsets - offsets[0]).astype(np.int64)
    lens = np.diff(starts)
    window = values[offsets[0] : offsets[-1]].astype(np.uint64)
    n = len(lens)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint64)
    maxlen = int(lens.max()) if len(window) else 0
    pos = (np.arange(len(window), dtype=np.int64) - np.repeat(starts[:-1], lens)) if len(window) else np.zeros(0, np.int64)
    out = []
    with np.errstate(over="ignore"):
        for r in (_FP_R1, _FP_R2):
            pows = np.ones(max(maxlen, 1), dtype=np.uint64)
            if maxlen > 1:
                pows[1:] = np.cumprod(np.full(maxlen - 1, r, dtype=np.uint64))
            terms = window * pows[pos]
            csum = np.zeros(len(window) + 1, dtype=np.uint64)
            np.cumsum(terms, out=csum[1:])
            seg = csum[starts[1:]] - csum[starts[:-1]]
            out.append((seg * _FP_MIX) ^ lens.astype(np.uint64))
    return out[0], out[1]


def sequence_dedup_stats(ds: Dataset, group_col: str = "source") -> pd.DataFrame:
    """(group, n_seqs, n_unique) where n_unique counts DISTINCT token arrays
    (bit-exact list equality) within each group — the sequence-level exact
    dedup a tokenized corpus needs before training.

    Per-batch: fingerprint every row (one vectorized pass), dedup locally,
    emit (group, fp1, fp2) partials + per-group row counts.  The exchange
    then moves distinct-fingerprint rows only, bucketed by fingerprint hash
    so each bucket dedups its own keys exactly (same tail shape as
    ``dedup_exact``/``distinct_users_per_type``)."""
    from .relational import bucketed_group_reduce

    def partial(t: pa.Table) -> pa.Table:
        fp1, fp2 = sequence_fingerprints(t)
        df = pd.DataFrame(
            {group_col: t[group_col].to_pandas(), "fp1": fp1, "fp2": fp2, "n": 1}
        )
        g = df.groupby([group_col, "fp1", "fp2"], as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([group_col, "fp1", "fp2"], as_index=False)["n"].sum()
        return g.groupby(group_col, as_index=False).agg(
            n_seqs=("n", "sum"), n_unique=("fp1", "count")
        )

    parts = bucketed_group_reduce(partials, [group_col, "fp1", "fp2"], per_bucket).to_pandas()
    out = parts.groupby(group_col, as_index=False).agg(
        n_seqs=("n_seqs", "sum"), n_unique=("n_unique", "sum")
    )
    for c in ("n_seqs", "n_unique"):
        out[c] = out[c].astype("int64")
    return out.sort_values(group_col, ignore_index=True)


# ---------------------------------------------------------------------------
# Unigram-LM surprisal (perplexity-style quality signal on the tokens payload)
# ---------------------------------------------------------------------------

def unigram_counts(ds: Dataset, vocab_size: int) -> np.ndarray:
    """Dense (vocab_size,) int64 corpus token histogram.

    Per-batch ``np.bincount`` over the flat values buffer → per-batch sparse
    (token, count) partials → driver sum into the dense array.  The driver
    holds Θ(vocab) only (a BPE vocab is ~10^5 — KBs), never corpus rows."""

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0] : offsets[-1]]
        cnt = np.bincount(window, minlength=vocab_size)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"token": pa.array(nz, type=pa.int64()),
             "count": pa.array(cnt[nz], type=pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    dense = np.zeros(vocab_size, dtype=np.int64)
    np.add.at(dense, parts["token"].to_numpy(), parts["count"].to_numpy())
    return dense


def surprisal_stats(
    ds: Dataset, vocab_size: int, group_col: str = "source"
) -> pd.DataFrame:
    """Per-group mean unigram surprisal: two-phase aggregate → broadcast →
    scan.  Phase 1 builds the corpus unigram distribution (distributed
    histogram); phase 2 broadcasts the dense log-prob table (``ray.put``,
    read zero-copy per task) and scores every sequence —
    surp(seq) = mean_i −ln p(tok_i) — emitting per-group partial sums only.

    Returns (group, n_seqs, avg_surprisal) with avg_surprisal = the mean of
    per-sequence surprisals, rounded to 6 (float64 on both engine and
    oracle; summation-order noise is ~1e-13, far inside the rounding)."""
    import ray as _ray

    counts = unigram_counts(ds, vocab_size)
    total = float(counts.sum())
    with np.errstate(divide="ignore"):
        neg_logp = -np.log(counts / total)  # inf for unseen tokens (never indexed)
    lp_ref = _ray.put(neg_logp)

    def partial(t: pa.Table) -> pa.Table:
        lp = _ray.get(lp_ref) if isinstance(lp_ref, _ray.ObjectRef) else lp_ref
        values, offsets = _flat_tokens(t)
        window = values[offsets[0] : offsets[-1]]
        starts = (offsets - offsets[0]).astype(np.int64)
        lens = np.diff(starts)
        csum = np.zeros(len(window) + 1, dtype=np.float64)
        np.cumsum(lp[window], out=csum[1:])
        per_seq = (csum[starts[1:]] - csum[starts[:-1]]) / np.maximum(lens, 1)
        flat = pa.table(
            {group_col: t[group_col],
             "n_seqs": pa.array(np.ones(len(t), dtype=np.int64)),
             "surp_sum": pa.array(per_seq)}
        )
        g = flat.group_by([group_col]).aggregate([("n_seqs", "sum"), ("surp_sum", "sum")])
        return pa.table(
            {group_col: g[group_col], "n_seqs": g["n_seqs_sum"], "surp_sum": g["surp_sum_sum"]}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby(group_col, as_index=False).sum()
    out["avg_surprisal"] = (out["surp_sum"] / out["n_seqs"]).pipe(_rd)
    out["n_seqs"] = out["n_seqs"].astype("int64")
    return out[[group_col, "n_seqs", "avg_surprisal"]].sort_values(group_col, ignore_index=True)


# ---------------------------------------------------------------------------
# Sequence chunking (context-window splitting)
# ---------------------------------------------------------------------------

def chunk_batch(t: pa.Table, *, max_len: int, id_col: str = "doc_id") -> pa.Table:
    """Split every row's token array into ⌈n/max_len⌉ contiguous chunks of at
    most ``max_len`` tokens (last chunk short).  The flat values buffer is
    REUSED — chunking only rewrites the offsets array, so token bytes are
    never copied (cf. pack_batch, which must copy to reorder).

    Output: (id_col, chunk_id, tokens, n_tok, …passthrough group cols)."""
    values, offsets = _flat_tokens(t)
    starts = (offsets - offsets[0]).astype(np.int64)
    lens = np.diff(starts)
    n_chunks = np.maximum((lens + max_len - 1) // max_len, 1)
    # chunk boundary offsets: for row r with c chunks, offsets start[r] +
    # j*max_len (j=0..c-1), then the row's end closes the last chunk
    row_idx = np.repeat(np.arange(len(t)), n_chunks)
    within = np.arange(len(row_idx)) - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    chunk_starts = starts[row_idx] + within * max_len
    chunk_ends = np.minimum(chunk_starts + max_len, starts[1:][row_idx])
    chunk_ends = np.maximum(chunk_ends, chunk_starts)  # empty rows → one empty chunk
    clens = chunk_ends - chunk_starts
    # chunks tile each row's span and rows tile the window, so the chunk
    # boundaries ARE a valid offsets array over the shared window view —
    # no token gather, just new offsets over the same buffer
    window = values[offsets[0] : offsets[-1]]
    chunk_offsets = (
        np.concatenate([chunk_starts, [int(chunk_ends[-1])]])
        if len(row_idx)
        else np.zeros(1, np.int64)
    )
    tokens = pa.LargeListArray.from_arrays(
        pa.array(chunk_offsets), pa.array(window, type=pa.int32())
    )
    cols = {
        id_col: pc.take(
            t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col],
            pa.array(row_idx, type=pa.int64()),
        ),
        "chunk_id": pa.array(within.astype(np.int32)),
        "tokens": tokens.cast(pa.list_(pa.int32())),
        "n_tok": pa.array(clens.astype(np.int32)),
    }
    for extra in t.column_names:
        if extra not in (id_col, "tokens", "n_tok", "chunk_id"):
            col = t[extra].combine_chunks() if isinstance(t[extra], pa.ChunkedArray) else t[extra]
            cols[extra] = pc.take(col, pa.array(row_idx, type=pa.int64()))
    return pa.table(cols)


def chunk_sequences(ds: Dataset, max_len: int = 128, id_col: str = "doc_id") -> Dataset:
    """Dataset-level chunking stage (embarrassingly parallel, zero-shuffle)."""
    return ds.map_batches(
        chunk_batch,
        fn_kwargs={"max_len": max_len, "id_col": id_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# Heavy hitters: two-pass exact top-k without a token exchange
# ---------------------------------------------------------------------------

def heavy_hitters_topk(ds: Dataset, k: int = 20, capacity: int = 256) -> pd.DataFrame:
    """EXACT top-k tokens via the classic two-pass heavy-hitter pattern —
    no shuffle at all, unlike :func:`token_frequency`'s grouped exchange:

    1. **Candidate pass**: per batch, keep tokens with batch count >
       |batch|/``capacity``.  Pigeonhole: any token with GLOBAL frequency
       > n/capacity must clear that bar in ≥1 batch, and at most
       ``capacity`` tokens per batch can — so the union (driver-side,
       ≤ capacity × blocks rows) provably contains every global heavy
       hitter.  Exactness requires the k-th frequency > n/capacity (true
       for any Zipf-ish corpus; raise ``capacity`` otherwise — the result
       degrades loudly via the assertion, never silently).
    2. **Verify pass**: broadcast the candidate set, count ONLY candidates
       exactly in one streaming scan, take the top-k.

    Works for unbounded key domains (bigrams, URLs) where a dense
    histogram is impossible; per-batch work is one ``np.bincount``-free
    ``pc.value_counts``.
    """
    import ray as _ray

    def candidates(t: pa.Table) -> pa.Table:
        """ONE row per batch: (candidate token list, batch token total)."""
        values, offsets = _flat_tokens(t)
        window = values[offsets[0] : offsets[-1]]
        vc = pc.value_counts(pa.array(window))
        counts = pc.struct_field(vc, "counts")
        mask = pc.greater(counts, pa.scalar(len(window) // capacity, pa.int64()))
        toks = pc.struct_field(vc, "values").filter(mask)
        return pa.table(
            {"cands": pa.array([toks.to_pylist()], type=pa.list_(pa.int32())),
             "n_batch": pa.array([len(window)], pa.int64())}
        )

    cand = ds.map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n_total = int(cand["n_batch"].sum())
    cand_tokens = np.unique(
        np.concatenate([np.asarray(x, np.int32) for x in cand["cands"]])
    ) if len(cand) else np.zeros(0, np.int32)
    if len(cand_tokens) < k:
        # fewer certified candidates than requested — the distribution is too
        # flat for this capacity; a silent short result would be unsound
        raise AssertionError(
            f"heavy_hitters_topk: only {len(cand_tokens)} candidates cleared "
            f"n/capacity — raise capacity for exactness"
        )
    cand_ref = _ray.put(cand_tokens)

    out = _exact_recount(ds, cand_ref).head(k).reset_index(drop=True)
    # soundness check: the k-th hitter must clear the pigeonhole bar, else
    # capacity was too small for this distribution — fail loudly, never
    # return a silently-unsound top-k
    assert len(out) < k or out["count"].iloc[-1] > n_total / capacity, (
        f"heavy_hitters_topk: k-th count {out['count'].iloc[-1]} ≤ n/capacity "
        f"{n_total / capacity:.1f} — raise capacity for exactness"
    )
    return out[["token", "count"]]

def _exact_recount(ds: Dataset, cand_ref) -> pd.DataFrame:
    """Broadcast a SORTED candidate int32 array (ray.put ref), count ONLY
    those tokens exactly in one streaming scan, return (token, count)
    sorted by count desc, token asc.  Shared verify pass for the exact and
    CMS heavy-hitter variants."""
    import ray as _ray

    def exact(t: pa.Table) -> pa.Table:
        cs = _ray.get(cand_ref) if isinstance(cand_ref, _ray.ObjectRef) else cand_ref
        values, offsets = _flat_tokens(t)
        window = values[offsets[0] : offsets[-1]]
        idx = np.searchsorted(cs, window)
        idx[idx == len(cs)] = 0
        hit = cs[idx] == window if len(cs) else np.zeros(len(window), bool)
        cnt = np.bincount(idx[hit], minlength=len(cs)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"token": pa.array(cs[nz].astype(np.int64)), "count": pa.array(cnt[nz])}
        )

    parts = ds.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    agg = parts.groupby("token", as_index=False)["count"].sum()
    return agg.sort_values(["count", "token"], ascending=[False, True], ignore_index=True)


def cms_heavy_hitters(
    ds: Dataset,
    k: int = 20,
    capacity: int = 256,
    width: int = 8192,
    depth: int = 4,
    merge_batch: int = 64,
) -> pd.DataFrame:
    """EXACT top-k tokens with FIXED-memory candidate pruning via a
    mergeable Count-Min sketch.

    :func:`heavy_hitters_topk`'s candidate union grows with the number of
    blocks (≤ capacity × blocks rows on the driver) — at 10^12 rows that is
    millions of candidates to broadcast and recount.  This variant runs the
    same pigeonhole candidate pass (provably complete) but ALSO folds every
    batch into a ``depth × width`` CMS partial:

    1. **One scan** emits per batch: certified candidate list + a 256 KB
       CMS blob (the combiner).
    2. **Tree merge**: a second ``map_batches`` stage sums ``merge_batch``
       sketches per task — the driver only ever merges ``blocks/merge_batch``
       blobs (sketch merging is associative, any tree shape works).
    3. **Prune on the driver over candidate IDS only** (no data pass): CMS
       estimates never underestimate, so any candidate whose upper bound
       ``est`` falls below ``E_k - εn`` (E_k = k-th largest estimate,
       ε = e/width) cannot be a true top-k token — for the k top-estimate
       tokens, ``true ≥ est - εn ≥ E_k - εn`` bounds the k-th true count
       from below.  The surviving set is O(k + near-ties), INDEPENDENT of
       block count.
    4. **Broadcast exact recount** of the survivors (same verify pass as
       the exact variant) → exact, SQL-comparable top-k.

    The ε-margin step-3 bound relies on the standard CMS overestimate
    bound holding for the top-k estimates (prob ≥ 1-k·e^-depth; raise
    ``depth``/``width`` if the loud final assertion ever trips)."""
    import ray as _ray

    from .sketch import CountMinSketch

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0] : offsets[-1]]
        vc = pc.value_counts(pa.array(window))
        counts = np.asarray(pc.struct_field(vc, "counts"), dtype=np.int64)
        toks = np.asarray(pc.struct_field(vc, "values"), dtype=np.int32)
        sk = CountMinSketch(width, depth)
        sk.add_hashes(toks.astype(np.int64).astype(np.uint64), counts)
        bar = len(window) // capacity
        cand = toks[counts > bar]
        return pa.table(
            {
                "cands": pa.array([cand.tolist()], type=pa.list_(pa.int32())),
                "n_batch": pa.array([len(window)], pa.int64()),
                "sketch": pa.array([sk.serialize()], type=pa.binary()),
            }
        )

    def merge_stage(t: pa.Table) -> pa.Table:
        merged = CountMinSketch(width, depth)
        for blob in t["sketch"].to_pylist():
            merged = merged.merge(CountMinSketch.deserialize(blob, width, depth))
        cand = np.unique(
            np.concatenate(
                [np.asarray(x, np.int32) for x in t["cands"].to_pylist()]
                or [np.zeros(0, np.int32)]
            )
        )
        n = int(pc.sum(t["n_batch"]).as_py() or 0)
        return pa.table(
            {
                "cands": pa.array([cand.tolist()], type=pa.list_(pa.int32())),
                "n_batch": pa.array([n], pa.int64()),
                "sketch": pa.array([merged.serialize()], type=pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    folded = partials.map_batches(
        merge_stage, batch_format="pyarrow", batch_size=merge_batch
    ).to_pandas()

    cms = CountMinSketch(width, depth)
    for blob in folded["sketch"]:
        cms = cms.merge(CountMinSketch.deserialize(blob, width, depth))
    n_total = int(folded["n_batch"].sum())
    cand_tokens = (
        np.unique(np.concatenate([np.asarray(x, np.int32) for x in folded["cands"]]))
        if len(folded)
        else np.zeros(0, np.int32)
    )
    if len(cand_tokens) < k:
        raise AssertionError(
            f"cms_heavy_hitters: only {len(cand_tokens)} candidates cleared "
            f"n/capacity — raise capacity for exactness"
        )

    est = cms.estimate_hashes(cand_tokens.astype(np.int64).astype(np.uint64))
    eps_n = int(np.ceil(np.e / width * n_total))
    e_k = np.partition(est, -k)[-k]
    keep = est >= e_k - eps_n
    survivors = np.sort(cand_tokens[keep])

    cand_ref = _ray.put(survivors)
    out = _exact_recount(ds, cand_ref).head(k).reset_index(drop=True)
    assert len(out) < k or out["count"].iloc[-1] > n_total / capacity, (
        f"cms_heavy_hitters: k-th count {out['count'].iloc[-1]} ≤ n/capacity "
        f"{n_total / capacity:.1f} — raise capacity for exactness"
    )
    return out[["token", "count"]]


# ---------------------------------------------------------------------------
# GPT-style concat-and-chunk training layout
# ---------------------------------------------------------------------------

def concat_chunk_tokens(
    ds: Dataset,
    seq_len: int = 2048,
    eos_id: int = 2_147_483_647,
    num_buckets: int = 64,
    emit_tokens: bool = False,
    id_col: str = "doc_id",
) -> Dataset:
    """GPT-style concat-and-chunk: documents ordered by ``doc_id`` are
    concatenated into one logical token stream (one ``eos_id`` after each
    doc) and cut into fixed ``seq_len`` blocks that SPAN document
    boundaries — the standard pretraining layout, complementing
    ``pack_sequences`` (which keeps docs whole).

    Distributed shape (100-TB-safe):

    1. *offset pass* — only ``(doc_id, n_tok)`` 16-byte rows move: range
       buckets from sampled ``doc_id`` boundaries, per-bucket exact
       exclusive cumsum (sorted within bucket), bucket bases from one tiny
       driver-side scan of per-bucket totals;
    2. *piece pass* — each doc slices its own tokens at chunk boundaries
       locally (vectorized over the flat Arrow values buffer; the pieces of
       a batch tile its extended buffer, so the list column is ONE
       zero-copy offsets rebind, no token copy);
    3. *assembly* — the only token-byte exchange: pieces group by
       ``chunk_id`` (bucketed reduce), concatenate in ``start_in_chunk``
       order.  Repacking is inherently an all-to-all of token bytes; this
       moves each byte exactly once.

    The doc→offset attach is a broadcast join (offsets are 16-byte rows;
    fine to ~10M docs per run) — swap in ``relational.hash_join`` for a
    larger catalog.  Output rows: ``chunk_id, n_tokens, n_doc_starts,
    token_sum`` (+ ``tokens`` when ``emit_tokens``); the final chunk may be
    shorter than ``seq_len`` (no padding — the trainer's collator owns pad
    policy).
    """
    import ray.data as _rd

    from .rank import _sample_boundaries
    from .relational import broadcast_join, bucketed_group_reduce

    L = int(seq_len)
    proj = ds.select_columns([id_col, "n_tok"])
    boundaries = _sample_boundaries(proj, id_col, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[id_col].to_numpy(zero_copy_only=False)
        b = np.searchsorted(boundaries, k, side="right").astype(np.int64)
        return t.append_column("__b", pa.array(b))

    bucketed = proj.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    # bucket totals: per-batch partials -> tiny driver frame -> exclusive scan
    def bucket_totals(t: pa.Table) -> pa.Table:
        b = t["__b"].to_numpy(zero_copy_only=False)
        ext = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64) + 1
        tot = np.bincount(b, weights=ext, minlength=len(boundaries) + 1)
        nz = np.flatnonzero(tot)
        return pa.table({"__b": pa.array(nz, pa.int64()),
                         "tot": pa.array(tot[nz].astype(np.int64))})

    tot_df = (
        bucketed.map_batches(bucket_totals, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    n_b = len(boundaries) + 1
    totals = np.zeros(n_b, dtype=np.int64)
    if len(tot_df):
        agg = tot_df.groupby("__b")["tot"].sum()
        totals[agg.index.to_numpy()] = agg.to_numpy()
    base = np.concatenate([[0], np.cumsum(totals[:-1])])

    def per_bucket_offsets(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable")
        ext = df["n_tok"].to_numpy(np.int64) + 1
        local = np.concatenate([[0], np.cumsum(ext[:-1])]) if len(df) else np.zeros(0, np.int64)
        b = int(df["__b"].iloc[0])
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "_off": base[b] + local})

    off_pd = (
        bucketed.groupby("__b")
        .map_groups(per_bucket_offsets, batch_format="pandas")
        .to_pandas()
    )
    off_tbl = pa.Table.from_pandas(off_pd, preserve_index=False)
    joined = broadcast_join(ds, off_tbl, id_col, include=["_off"])

    def pieces(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "chunk_id": pa.array([], pa.int64()),
            "start_in_chunk": pa.array([], pa.int64()),
            "is_doc_start": pa.array([], pa.int8()),
            "toks": pa.LargeListArray.from_arrays(
                pa.array([0], pa.int64()), pa.array([], pa.int32())),
        })
        n = t.num_rows
        if n == 0:
            return empty
        values, offs = _flat_tokens(t)
        lens = np.diff(offs)
        off = t["_off"].to_numpy(zero_copy_only=False).astype(np.int64)
        ext_len = lens + 1
        ext_starts = np.concatenate([[0], np.cumsum(ext_len)])
        ext = np.full(int(ext_starts[-1]), eos_id, dtype=np.int32)
        region = values[offs[0]: offs[-1]]
        if len(region):
            lo = (offs - offs[0]).astype(np.int64)
            doc_of_val = np.repeat(np.arange(n), lens)
            within = np.arange(len(region), dtype=np.int64) - lo[:-1][doc_of_val]
            ext[ext_starts[:-1][doc_of_val] + within] = region
        first_chunk = off // L
        n_pieces = (off + ext_len - 1) // L - first_chunk + 1
        pstarts = np.concatenate([[0], np.cumsum(n_pieces)])
        total_p = int(pstarts[-1])
        pdoc = np.repeat(np.arange(n), n_pieces)
        wip = np.arange(total_p, dtype=np.int64) - pstarts[:-1][pdoc]
        gstart = np.where(wip == 0, off[pdoc], (first_chunk[pdoc] + wip) * L)
        gend = np.minimum((first_chunk[pdoc] + wip + 1) * L, off[pdoc] + ext_len[pdoc])
        plen = gend - gstart
        loffs = np.concatenate([[0], np.cumsum(plen)])
        toks = pa.LargeListArray.from_arrays(pa.array(loffs, pa.int64()),
                                             pa.array(ext, pa.int32()))
        return pa.table({
            "chunk_id": pa.array(gstart // L, pa.int64()),
            "start_in_chunk": pa.array(gstart % L, pa.int64()),
            "is_doc_start": pa.array((wip == 0).astype(np.int8)),
            "toks": toks,
        })

    piece_ds = joined.map_batches(pieces, batch_format="pyarrow", zero_copy_batch=True)

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            cols = {"chunk_id": pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "n_doc_starts": pd.Series(dtype="int64"),
                    "token_sum": pd.Series(dtype="int64")}
            if emit_tokens:
                cols["tokens"] = pd.Series(dtype="object")
            return pd.DataFrame(cols)
        df = df.sort_values(["chunk_id", "start_in_chunk"], kind="stable")
        cid = df["chunk_id"].to_numpy(np.int64)
        change = np.r_[True, cid[1:] != cid[:-1]]
        starts = np.flatnonzero(change)
        cells = [np.asarray(x, dtype=np.int64) for x in df["toks"]]
        lens = np.fromiter((len(x) for x in cells), np.int64, len(df))
        flat = np.concatenate(cells) if cells else np.zeros(0, np.int64)
        tok_bounds = np.concatenate([[0], np.cumsum(lens)])
        out = pd.DataFrame({
            "chunk_id": cid[starts],
            "n_tokens": np.add.reduceat(lens, starts),
            "n_doc_starts": np.add.reduceat(
                df["is_doc_start"].to_numpy(np.int64), starts),
            "token_sum": np.add.reduceat(flat, tok_bounds[starts])
            if len(flat) else np.zeros(len(starts), np.int64),
        })
        if emit_tokens:
            out["tokens"] = [
                flat[tok_bounds[s]: tok_bounds[s] + nt].astype(np.int32)
                for s, nt in zip(starts, out["n_tokens"].to_numpy())
            ]
        return out

    return bucketed_group_reduce(piece_ds, ["chunk_id"], assemble)


# ---------------------------------------------------------------------------
# Sliding-window (strided, overlapping) chunking — the retrieval-corpus
# layout (window W, stride S < W → W-S token overlap between neighbours)
# ---------------------------------------------------------------------------

def stride_window_stats(
    ds: Dataset, window: int = 32, stride: int = 24, group_col: str = "source"
) -> pd.DataFrame:
    """Per-group stats of the strided chunking (chunk k of a doc covers
    token positions [k·S, k·S + min(W, n−k·S))): chunk count, total chunk
    tokens (overlap counted), full-window chunks, and an edge checksum
    (Σ first+last token of every chunk) that pins the slicing arithmetic.
    Offsets-only per-batch math over the shared token buffer; integer
    partials reduce driver-side."""

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        lens = np.diff(starts)
        vals = values[offsets[0] : offsets[-1]].astype(np.int64)
        pos = lens > 0
        k_count = np.where(pos, (np.maximum(lens, 1) - 1) // stride + 1, 0)
        row_idx = np.repeat(np.arange(len(t)), k_count)
        within = np.arange(len(row_idx)) - np.repeat(np.cumsum(k_count) - k_count, k_count)
        s = within * stride
        clen = np.minimum(window, lens[row_idx] - s)
        first = vals[starts[row_idx] + s]
        last = vals[starts[row_idx] + s + clen - 1]
        grp = (
            t[group_col].combine_chunks()
            if isinstance(t[group_col], pa.ChunkedArray)
            else t[group_col]
        )
        part = pa.table(
            {
                group_col: pc.take(grp, pa.array(row_idx, type=pa.int64())),
                "n_chunks": pa.array(np.ones(len(row_idx), dtype=np.int64)),
                "chunk_tokens": pa.array(clen.astype(np.int64)),
                "full_chunks": pa.array((clen == window).astype(np.int64)),
                "edge_checksum": pa.array(first + last),
            }
        )
        cols = [c for c in part.column_names if c != group_col]
        g = part.group_by([group_col]).aggregate([(c, "sum") for c in cols])
        return g.rename_columns([group_col] + cols)

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return agg.groupby(group_col, as_index=False).sum().sort_values(group_col, ignore_index=True)


# ---------------------------------------------------------------------------
# Fill-in-the-middle layout (Bavarian et al. 2022): deterministically split
# every sequence into prefix/middle/suffix and reorder to PSM
# ---------------------------------------------------------------------------

def fim_layout_stats(ds: Dataset, min_len: int = 12, group_col: str = "source") -> pd.DataFrame:
    """PSM reorder [prefix][suffix][middle] with integer-deterministic cuts
    (c1 = n//4 + t₁ mod 5, c2 = min(c1 + n//2 − t₂ mod 3, n−1), docs with
    n ≥ min_len).  Emits per-group segment token sums and a position-weighted
    checksum Σ pos·token over the REORDERED stream — any slicing or ordering
    bug shifts it.  Pure offset arithmetic; nothing is re-materialized."""

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        lens = np.diff(starts)
        vals = values[offsets[0] : offsets[-1]].astype(np.int64)
        elig = lens >= min_len
        head = starts[:-1]
        t1 = np.where(lens > 0, vals[np.minimum(head, max(len(vals) - 1, 0))], 0)
        t2 = np.where(lens > 1, vals[np.minimum(head + 1, max(len(vals) - 1, 0))], 0)
        c1 = lens // 4 + t1 % 5
        c2 = np.minimum(c1 + lens // 2 - t2 % 3, lens - 1)
        # per-token reordered position: j<=c1 → j; j>c2 → c1 + j - c2;
        # else → c1 + (n - c2) + (j - c1)
        row_idx = np.repeat(np.arange(len(t)), lens)
        j = np.arange(len(vals)) - starts[row_idx] + 1
        c1r, c2r, nr = c1[row_idx], c2[row_idx], lens[row_idx]
        pos = np.where(
            j <= c1r, j, np.where(j > c2r, c1r + j - c2r, c1r + (nr - c2r) + (j - c1r))
        )
        contrib = np.where(elig[row_idx], pos * vals, 0)
        checksum = np.bincount(row_idx, weights=contrib, minlength=len(t)).astype(np.int64)
        grp = (
            t[group_col].combine_chunks()
            if isinstance(t[group_col], pa.ChunkedArray)
            else t[group_col]
        )
        e = elig.astype(np.int64)
        part = pa.table(
            {
                group_col: grp,
                "n_docs_fim": pa.array(e),
                "prefix_tokens": pa.array(np.where(elig, c1, 0)),
                "middle_tokens": pa.array(np.where(elig, c2 - c1, 0)),
                "suffix_tokens": pa.array(np.where(elig, lens - c2, 0)),
                "fim_checksum": pa.array(checksum),
            }
        )
        cols = [c for c in part.column_names if c != group_col]
        g = part.group_by([group_col]).aggregate([(c, "sum") for c in cols])
        return g.rename_columns([group_col] + cols)

    agg = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return agg.groupby(group_col, as_index=False).sum().sort_values(group_col, ignore_index=True)
