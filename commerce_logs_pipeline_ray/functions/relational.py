"""Reusable relational operators, Ray-Data-first.

These are the scale-aware building blocks the query layer composes
(SURVEY.md §2.6-2.8).  Design rules applied throughout:

* **small side broadcast, never shuffled** — dimension tables go through
  ``ray.put`` once and are joined per batch with Arrow ``index_in``/``take``
  (the reference's header→record enrichment J1, ``service.go:284-309``);
* **pre-aggregate before any groupby** — per-batch Arrow hash aggregation
  collapses batches to partials so the all-to-all exchange moves partials,
  not rows (A1-A5 semantics);
* **last-by-key = partial argmax then tiny reduce** — the reference's
  compacted-topic fold ``state[key] = latest`` (``blob_state_processor.go:
  163-260``, Makefile:195-204) without shuffling full rows.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum


class BroadcastJoiner:
    """map_batches callable: hash-join each batch against a broadcast
    dimension table (small side).  No shuffle; dict dereferenced once per
    actor/task from the object store."""

    def __init__(self, lookup, key: str, include: list[str] | None = None):
        if isinstance(lookup, ray.ObjectRef):
            lookup = ray.get(lookup)
        if isinstance(lookup, pa.Table):
            lookup = lookup.combine_chunks()
        self.key = key
        self.keys = lookup[key].combine_chunks() if isinstance(lookup[key], pa.ChunkedArray) else lookup[key]
        cols = include if include is not None else [c for c in lookup.column_names if c != key]
        self.columns = {c: lookup[c].combine_chunks() for c in cols}

    def __call__(self, t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[self.key], value_set=self.keys)
        for name, values in self.columns.items():
            t = t.append_column(name, pc.take(values, idx))
        return t


def _bcast_join_batch(t: pa.Table, *, ref, key: str, include) -> pa.Table:
    # ray.get on an already-local object is a zero-copy pointer lookup —
    # the dim table ships to each worker process once, not per batch.
    joiner = BroadcastJoiner(ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref, key, include)
    return joiner(t)


def broadcast_join(
    ds: Dataset,
    dim: pa.Table,
    key: str,
    include: list[str] | None = None,
    batch_size: int | None = None,
    use_actors: bool = False,
) -> Dataset:
    """Broadcast hash join.  Stateless tasks by default (worker-local
    ``ray.get`` is zero-copy and cached, no pool spin-up); pass
    ``use_actors=True`` when the join needs heavy per-actor preprocessing."""
    ref = ray.put(dim)
    if use_actors:
        return ds.map_batches(
            BroadcastJoiner,
            fn_constructor_kwargs={"lookup": ref, "key": key, "include": include},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=(1, 8),
            zero_copy_batch=True,
        )
    return ds.map_batches(
        _bcast_join_batch,
        fn_kwargs={"ref": ref, "key": key, "include": include},
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def bucketed_group_reduce(
    ds: Dataset,
    keys: list[str],
    combine,
    num_buckets: int = 64,
) -> Dataset:
    """High-cardinality grouped reduce: hash rows into ``num_buckets``
    coarse buckets, exchange on the bucket id, run the VECTORIZED pandas
    ``combine(df) -> df`` once per bucket.

    Why: Ray's sort-based ``groupby().aggregate`` iterates groups in Python
    — measured 26 s for 600k rows / 150k keys vs 0.3 s for this pattern.
    The per-group Python cost moves from |keys| to |buckets|; combine sees
    whole buckets and aggregates them with one pandas groupby.
    All rows of one key land in one bucket, so the reduce is exact.
    """
    from .hashing import bucket_indices

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", pa.array(bucket_indices(t, keys, num_buckets)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return combine(df.drop(columns=["__bucket"]))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed.groupby("__bucket").map_groups(per_bucket, batch_format="pandas")


def grouped_sums(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_name: str | None = None,
    batch_size: int | None = None,
    reduce: str = "distributed",
) -> Dataset:
    """groupby(keys) with SUM/COUNT — pre-aggregated per batch (combiner),
    then a final reduce over partials only.

    ``sums``: {output_name: input_column}.  ``count_name``: output COUNT(*).

    ``reduce="distributed"`` (the safe DEFAULT — correct at any key
    cardinality): coarse hash-bucket exchange + vectorized per-bucket combine
    (see :func:`bucketed_group_reduce`); the exchange only ever moves the
    per-batch partials.  ``reduce="driver"`` (opt-in for key spaces bounded
    by schema or value domain, e.g. enum columns): the combiner bounds the
    partial stream to ``|distinct keys| × num_blocks`` rows and the final
    reduce is a driver-side pandas groupby — no all-to-all at all (the
    reference's partial+final fold, ``blob_state_processor.go:231-260``).
    ``reduce="sort"``: Ray's native sort-based groupby — avoid for >10k keys
    (per-group Python overhead).
    """
    sum_inputs = sorted(set(sums.values()))

    def partial(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        for c in sum_inputs:
            cols[c] = t[c]
        flat = pa.table(cols)
        aggs: list = [(c, "sum") for c in sum_inputs]
        if count_name is not None:
            aggs.append(([], "count_all"))  # COUNT(*) incl. nulls
        g = flat.group_by(keys).aggregate(aggs)
        out = {k: g[k] for k in keys}
        for out_name, in_col in sums.items():
            out[out_name] = g[f"{in_col}_sum"]
        if count_name is not None:
            out[count_name] = pc.cast(g["count_all"], pa.int64())
        return pa.table(out)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    value_cols = [*sums.keys()] + ([count_name] if count_name else [])
    if reduce == "driver":
        import ray.data as rd

        pdf = partials.to_pandas()
        # dropna=False: null keys are groups too (SQL GROUP BY semantics —
        # pandas' default silently drops them)
        out = pdf.groupby(keys, as_index=False, dropna=False)[value_cols].sum()
        return rd.from_pandas(out)
    if reduce == "distributed":
        def combine(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(keys, as_index=False, dropna=False)[value_cols].sum()

        return bucketed_group_reduce(partials, keys, combine)
    agg_fns = [Sum(name, alias_name=name) for name in value_cols]
    return partials.groupby(keys).aggregate(*agg_fns)


def last_by_key(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    payload_cols: list[str],
    batch_size: int | None = None,
    reduce: str = "distributed",
) -> Dataset:
    """Per-key latest row (compacted-state fold, A6).

    Two-level: per-batch argmax by ``order_cols`` (combiner) → final argmax
    over the few surviving candidates.  Only candidates leave the map stage.
    ``reduce="distributed"`` (default — safe at any key cardinality) folds
    candidates through a coarse hash-bucket exchange;
    ``reduce="driver"`` (opt-in when key cardinality is bounded, the typical
    state-compaction shape) folds the candidate stream on the driver.
    """
    cols = [key, *order_cols, *[c for c in payload_cols if c not in order_cols and c != key]]

    def batch_last(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols]
        df = df.sort_values([key, *order_cols], kind="stable")
        # dropna=False everywhere: a null key is a group (SQL semantics)
        return df.groupby(key, as_index=False, sort=False, dropna=False).tail(1)

    candidates = ds.map_batches(batch_last, batch_format="pandas", batch_size=batch_size)

    if reduce == "driver":
        import ray.data as rd

        pdf = candidates.to_pandas()
        pdf = pdf.sort_values([key, *order_cols], kind="stable")
        return rd.from_pandas(
            pdf.groupby(key, as_index=False, sort=False, dropna=False).tail(1).reset_index(drop=True)
        )

    def bucket_last(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="stable")
        # NB: groupby(...).tail respects dropna; keep null-key groups here too
        return df.groupby(key, as_index=False, sort=False, dropna=False).tail(1)

    return bucketed_group_reduce(candidates, [key], bucket_last)


def topk(
    ds: Dataset,
    sort_keys: list[str],
    descending: list[bool],
    k: int,
) -> Dataset:
    """Distributed top-k: per-block prune to k candidates, then sort+limit.

    The per-batch prune keeps the final sort's input at ``k × num_blocks``
    rows regardless of input size (A5 top-10 display,
    ``explore_raw_logs.py:552-556``)."""

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(sort_keys, ascending=[not d for d in descending]).head(k)

    pruned = ds.map_batches(prune, batch_format="pandas")
    return pruned.sort(sort_keys, descending=descending).limit(k)


def grouped_topk(
    ds: Dataset,
    keys: list[str],
    sort_cols: list[str],
    descending: list[bool],
    k: int,
) -> Dataset:
    """Per-GROUP top-k (SQL ``row_number() OVER (PARTITION BY keys ORDER BY
    …) <= k``): per-batch prune to k candidates per key (combiner), then a
    bucketed exchange and one vectorized per-bucket head — the shuffle moves
    at most ``k × |keys| × num_blocks`` candidate rows, never the corpus."""
    ascending = [not d for d in descending]

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=ascending, kind="stable")
        return df.groupby(keys, sort=False, dropna=False).head(k)

    candidates = ds.map_batches(prune, batch_format="pandas")
    return bucketed_group_reduce(candidates, keys, prune)


def hash_join(
    left: Dataset,
    right: Dataset,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int = 16,
) -> Dataset:
    """Large×large join: both sides hash-partitioned on the key, partitions
    joined independently (Ray ``Dataset.join``; SURVEY §2.6 J3 semantics).

    Partitioning assumption: key hash distributes evenly; a pathologically
    hot key concentrates one aggregator — pre-aggregate or salt the hot side
    first (see ``grouped_sums``) before joining when keys are skewed.
    For a small side, use ``broadcast_join`` instead — no shuffle at all.
    """
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else (tuple(right_on) if right_on else None)
    return left.join(right, how, num_partitions=num_partitions, on=on, right_on=right_on)


def auto_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int = 16,
    broadcast_threshold_rows: int = 2_000_000,
) -> Dataset:
    """Size-aware join planner: when the right side is small enough to
    broadcast, do the zero-shuffle broadcast hash join; otherwise fall back
    to the hash-partitioned ``Dataset.join`` (whose shuffle aggregators cost
    seconds of spin-up — only worth paying when the small side genuinely
    does not fit).  Mirrors the classic broadcast-vs-exchange planner rule.

    Only inner joins take the broadcast path (broadcast right-semantics for
    outer joins differ); others always use the exchange.  The broadcast path
    is a LOOKUP join — right keys must be unique (dimension-table shape).
    """
    try:
        # materialize once: size probing would otherwise execute the right
        # pipeline for count() and AGAIN for the join — the materialized
        # blocks are reused by whichever path wins (runtime size estimation's
        # standard cost; callers that KNOW the right side is huge should call
        # hash_join directly and skip the probe)
        right = right.materialize()
        right_rows = right.count()
    except Exception:  # count unavailable → be conservative
        right_rows = None
    if how == "inner" and right_rows is not None and right_rows <= broadcast_threshold_rows:
        rkey = right_on or on
        dim = pa.Table.from_pandas(right.to_pandas(), preserve_index=False)
        if rkey != on:
            dim = dim.rename_columns([on if c == rkey else c for c in dim.column_names])
        # the broadcast path is a LOOKUP join (index_in takes the first
        # match) — duplicate right keys would silently drop rows, so guard
        # with a cheap distinct-count and fall back to the exchange join
        if pc.count_distinct(dim[on]).as_py() == dim.num_rows:
            # inner semantics via a dedicated non-null sentinel — never infer
            # the match from payload validity (legit null dim values survive)
            dim = dim.append_column("__match", pa.array([1] * dim.num_rows, type=pa.int8()))
            joined = broadcast_join(left, dim, on)
            return joined.map_batches(
                lambda t: t.filter(pc.is_valid(t["__match"])).drop_columns(["__match"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
    return hash_join(left, right, on, right_on, how, num_partitions)


def semi_join_broadcast(ds: Dataset, keys: pa.Table | list, key: str, anti: bool = False) -> Dataset:
    """Semi/anti join against a broadcast key set (guide pattern): the key
    set ships once via ``ray.put``; each batch filters with a vectorized
    ``is_in``.  At scale, swap the exact set for a Bloom filter — same
    structure, bounded memory."""
    if isinstance(keys, pa.Table):
        key_array = keys[key].combine_chunks()
    else:
        key_array = pa.array(keys)
    ref = ray.put(key_array)

    def filt(t: pa.Table, *, ref=ref, anti=anti) -> pa.Table:
        ks = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        mask = pc.is_in(t[key], value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return t.filter(pc.fill_null(mask, False))  # null keys never match

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def to_table(result: Any) -> pa.Table:
    """Materialize a small Dataset/DataFrame result as one pa.Table."""
    if isinstance(result, Dataset):
        result = result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    return result


def _key_hashes(col: pa.Array | pa.ChunkedArray) -> "np.ndarray":
    """uint64 hash per key value (strings → FNV-1a 64, integers → identity
    bits; both finalized downstream by the sketch's mixer)."""
    import numpy as np

    from .hashing import fnv1a64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if (
        pa.types.is_string(col.type)
        or pa.types.is_large_string(col.type)
        or pa.types.is_binary(col.type)
        or pa.types.is_large_binary(col.type)
        or pa.types.is_fixed_size_binary(col.type)
    ):
        return fnv1a64(col)
    return np.asarray(pc.cast(col, pa.int64())).astype(np.int64).astype(np.uint64)


def bloom_semi_join(
    big: Dataset,
    small: Dataset,
    on: str,
    right_on: str | None = None,
    bits_per_key: int = 10,
    num_partitions: int = 16,
) -> Dataset:
    """EXACT semi join of ``big`` against ``small``'s key set, for a small
    side too large to broadcast exactly: the classic bloom-join.

    1. **Build** (combiner): each small-side batch emits one Bloom blob
       (fixed ``n·bits_per_key`` bits, sized from the dataset count);
       blobs OR-merge on the driver — order-free, any tree shape.
    2. **Prefilter** (broadcast): the merged filter ships once via
       ``ray.put``; every big-side batch drops non-members vectorized.
       No false negatives, ~1% false positives at 10 bits/key — at
       10^10 keys the filter is ~12 GB vs 80+ GB for the exact set.
    3. **Exact verify**: the ~1% survivors flow into the hash-partitioned
       semi join against the deduped key column, scrubbing false
       positives — the shuffle moves only survivors, which is the point.

    Partitioning note for the extreme tail (key set so large even the
    filter strains one task's heap): hash-partition the keys into P
    blooms of m/P bits and join partition-aligned, so each big-side
    partition ships only its 1/P slice of the filter.
    """
    from .sketch import BloomFilter

    rkey = right_on or on
    keys = small.select_columns([rkey])
    n_keys = max(64, keys.count())
    proto = BloomFilter.for_capacity(n_keys, bits_per_key)
    n_bits, n_hashes = proto.n_bits, proto.k

    def build(t: pa.Table) -> pa.Table:
        b = BloomFilter(n_bits, n_hashes)
        col = t[rkey]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = col.drop_null()
        if len(col):
            b.add_hashes(_key_hashes(col))
        return pa.table({"blob": pa.array([b.serialize()], type=pa.binary())})

    merged = BloomFilter(n_bits, n_hashes)
    for batch in keys.map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch["blob"].to_pylist():
            merged = merged.merge(BloomFilter.deserialize(blob, n_bits, n_hashes))
    words_ref = ray.put(merged.words)

    def prefilter(t: pa.Table) -> pa.Table:
        from .sketch import BloomFilter as BF

        words = ray.get(words_ref) if isinstance(words_ref, ray.ObjectRef) else words_ref
        b = BF(n_bits, n_hashes)
        b.words = words
        col = t[on]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        valid = pc.is_valid(col)
        mask = b.contains_hashes(_key_hashes(pc.fill_null(col, col[0] if len(col) else None)))
        keep = pc.and_(pa.array(mask), valid) if len(col) else pa.array([], pa.bool_())
        return t.filter(pc.fill_null(keep, False))

    survivors = big.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    uniq = keys.map_batches(
        lambda t: pa.table({rkey: pc.unique(t[rkey].combine_chunks() if isinstance(t[rkey], pa.ChunkedArray) else t[rkey]).drop_null()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).groupby(rkey).count().drop_columns(["count()"])
    return hash_join(survivors, uniq, on, rkey, "inner", num_partitions)


def bloom_anti_join(
    big: Dataset,
    small: Dataset,
    on: str,
    right_on: str | None = None,
    bits_per_key: int = 10,
    num_partitions: int = 16,
) -> Dataset:
    """EXACT anti join (rows of ``big`` whose key is NOT in ``small``) for a
    key set too large to broadcast — the Bloom dual of ``bloom_semi_join``:

    1. the merged filter ships once; rows FAILING it are *definitely new*
       (no false negatives) and pass through with zero further work — at a
       typical 99%+ novelty rate almost everything short-circuits here;
    2. rows passing the filter (true members + ~1% false positives) take a
       hash-partitioned LEFT OUTER join against the deduped key column and
       only right-null rows survive — false positives are scrubbed exactly.
    """
    from .sketch import BloomFilter

    rkey = right_on or on
    keys = small.select_columns([rkey]).materialize()
    n_keys = max(64, keys.count())
    proto = BloomFilter.for_capacity(n_keys, bits_per_key)
    n_bits, n_hashes = proto.n_bits, proto.k

    def build(t: pa.Table) -> pa.Table:
        b = BloomFilter(n_bits, n_hashes)
        col = t[rkey]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = col.drop_null()
        if len(col):
            b.add_hashes(_key_hashes(col))
        return pa.table({"blob": pa.array([b.serialize()], type=pa.binary())})

    merged = BloomFilter(n_bits, n_hashes)
    for batch in keys.map_batches(
        build, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch["blob"].to_pylist():
            merged = merged.merge(BloomFilter.deserialize(blob, n_bits, n_hashes))
    words_ref = ray.put(merged.words)

    def split(t: pa.Table, want_member: bool) -> pa.Table:
        from .sketch import BloomFilter as BF

        if len(t) == 0:
            return t
        words = ray.get(words_ref) if isinstance(words_ref, ray.ObjectRef) else words_ref
        b = BF(n_bits, n_hashes)
        b.words = words
        col = t[on]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        member = pa.array(b.contains_hashes(_key_hashes(pc.fill_null(col, col[0]))))
        member = pc.and_(member, pc.is_valid(col))  # null keys are never members
        return t.filter(member if want_member else pc.invert(member))

    definitely_new = big.map_batches(
        lambda t: split(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    candidates = big.map_batches(
        lambda t: split(t, True), batch_format="pyarrow", zero_copy_batch=True
    )
    uniq = keys.map_batches(
        lambda t: pa.table(
            {rkey: pc.unique(
                t[rkey].combine_chunks() if isinstance(t[rkey], pa.ChunkedArray) else t[rkey]
            ).drop_null(),
             "__hit": pa.array([1] * len(pc.unique(
                 t[rkey].combine_chunks() if isinstance(t[rkey], pa.ChunkedArray) else t[rkey]
             ).drop_null()), pa.int8())}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).groupby(rkey).max("__hit")
    joined = hash_join(candidates, uniq, on, rkey, "left_outer", num_partitions)
    hit_col = "max(__hit)"
    scrubbed = joined.map_batches(
        lambda t: t.filter(pc.is_null(t[hit_col])).drop_columns(
            [c for c in (hit_col, rkey) if c in t.column_names and c != on]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return definitely_new.union(scrubbed)


def detect_hot_keys(
    ds: Dataset,
    on: str,
    hot_threshold: int,
    sample_mod: int = 64,
) -> pd.DataFrame:
    """Estimate per-key row counts from a deterministic 1/``sample_mod``
    hash sample and return keys whose ESTIMATED count exceeds
    ``hot_threshold`` (frame: key column + ``est_count``).

    Hot-key detection must not cost a full groupby over the fact table —
    the sample pass ships only ~|distinct sampled keys| partial rows per
    block through one grouped reduce.  Detection is approximate by design;
    callers use it to choose a PLAN (broadcast vs exchange), so a miss
    costs performance, never correctness.

    The sample is a positional stride WITHIN each block (every
    ``sample_mod``-th row), not a key-hash modulus: hashing the KEY puts a
    hot key entirely in or entirely out of the sample (one hash decides
    all its rows) — a 1-1/mod chance of missing the very key the detector
    exists for.  The stride samples ROWS, so a key's sampled count
    concentrates at count/mod regardless of identity.  Deterministic for a
    given block layout (no RNG); plan choice may shift with partitioning,
    results never do.
    """

    def sample_partial(t: pa.Table) -> pa.Table:
        sampled = t.take(np.arange(0, len(t), sample_mod))
        return pa.table({on: sampled[on]}).group_by([on]).aggregate([([], "count_all")])

    partials = ds.map_batches(sample_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sums(partials, [on], {"n": "count_all"}, reduce="distributed").to_pandas()
    if agg.empty:
        return pd.DataFrame({on: pd.Series(dtype="object"), "est_count": pd.Series(dtype="int64")})
    agg["est_count"] = agg["n"] * sample_mod
    hot = agg.loc[agg["est_count"] > hot_threshold, [on, "est_count"]]
    return hot.reset_index(drop=True)


def _tile_join_task(lt: pa.Table, rt: pa.Table, on: str, rkey: str, out_cols: list, schema):
    """One tile of the both-sides-hot join: inner-merge exactly two blocks.

    Per-task memory is bounded by the two input blocks plus the tile's own
    output — the pair explosion is distributed across A×B independent
    tiles instead of landing on one exchange partition."""
    m = lt.to_pandas().merge(
        rt.to_pandas(), left_on=on, right_on=rkey, how="inner", suffixes=("", "__r")
    )
    return pa.Table.from_pandas(m[out_cols], schema=schema, preserve_index=False)


def skew_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    hot_threshold: int = 2_000_000,
    sample_mod: int = 64,
    num_partitions: int = 16,
    hot_keys: list | None = None,
    right_hot_threshold: int | None = None,
    tile_rows: int = 1_000_000,
) -> Dataset:
    """Skew-aware inner join: the cure for the one-hot-key aggregator that
    ``hash_join`` documents as its failure mode.

    Plan: (1) estimate per-key row counts on BOTH sides from deterministic
    stride samples (:func:`detect_hot_keys` — no full groupby); (2) keys
    hot on the left but small on the right join against the broadcast of
    the right side's MATCHING rows only (a per-batch pandas m:n merge —
    true inner semantics under duplicate right keys, unlike the
    lookup-join broadcast path); (3) every key hot on the RIGHT — whether
    or not the left side is also hot — takes pair-explosion control: each
    side's matching rows are re-blocked to ~``tile_rows`` rows and every
    (left block, right block) pair joins as its own Ray task — the
    fragment-replicate tiling; per-task memory is two blocks, never
    Σ(hot rows), and the O(|L_k|·|R_k|) output is spread over A×B
    independent tiles (a right-hot/left-cold key degenerates to a 1×B
    strip); (4) the cold remainder takes the normal hash-partitioned
    exchange with every hot key (either side) REMOVED from both sides, so
    no partition ever receives a hot key's row flood.  Result is the
    union; the row multiset equals ``hash_join``'s for any split, so
    hot-key detection misses degrade throughput, never results.
    """
    import ray

    rkey = right_on or on
    if hot_keys is None:
        hot_df = detect_hot_keys(left, on, hot_threshold, sample_mod)
        hot_keys = hot_df[on].tolist()
    # keys heavy on the RIGHT can be neither broadcast nor hash-partitioned
    # (one partition would take the full right-side row flood) — tile them,
    # even when the left side is cold for that key
    rh = detect_hot_keys(right, rkey, right_hot_threshold or hot_threshold, sample_mod)
    rh_keys = set(rh[rkey].tolist())
    if not hot_keys and not rh_keys:
        return hash_join(left, right, on, right_on, "inner", num_partitions)

    right = right.materialize()
    both_hot = sorted(rh_keys)  # the tiling set: every right-hot key
    bcast_hot = [k for k in hot_keys if k not in rh_keys]
    hot_arr = pa.array(sorted(set(hot_keys) | rh_keys))

    # canonical output column order shared by all paths:
    # left columns, then right columns minus the (renamed-away) join key
    left_cols = left.schema().names
    right_payload = [c for c in right.schema().names if c != rkey]
    out_cols = list(left_cols) + right_payload

    def split(t: pa.Table, keys: pa.Array, want: bool) -> pa.Table:
        mask = pc.is_in(t[on], value_set=keys)
        return t.filter(mask if want else pc.invert(mask))

    pieces: list[Dataset] = []

    if bcast_hot:
        bcast_arr = pa.array(bcast_hot)
        right_hot_df = right.map_batches(
            lambda t: t.filter(pc.is_in(t[rkey], value_set=bcast_arr)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()
        right_hot_ref = ray.put(right_hot_df)

        def bcast_merge(df: pd.DataFrame, *, ref=right_hot_ref) -> pd.DataFrame:
            dim = ray.get(ref) if not isinstance(ref, pd.DataFrame) else ref
            m = df.merge(dim, left_on=on, right_on=rkey, how="inner", suffixes=("", "__r"))
            return m[out_cols]

        left_bcast_hot = left.map_batches(
            lambda t: split(t, bcast_arr, True), batch_format="pyarrow", zero_copy_batch=True
        )
        pieces.append(left_bcast_hot.map_batches(bcast_merge, batch_format="pandas"))

    if both_hot:
        both_arr = pa.array(both_hot)
        lb = left.map_batches(
            lambda t: split(t, both_arr, True), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        rb = right.map_batches(
            lambda t: t.filter(pc.is_in(t[rkey], value_set=both_arr)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        la = max(1, -(-lb.count() // tile_rows))
        rbn = max(1, -(-rb.count() // tile_rows))
        lrefs = lb.repartition(la).to_arrow_refs()
        rrefs = rb.repartition(rbn).to_arrow_refs()
        # target schema fixed on the driver so empty tiles keep exact types
        lschema = pa.concat_tables([ray.get(lrefs[0])]).schema if lrefs else None
        rschema = pa.concat_tables([ray.get(rrefs[0])]).schema if rrefs else None
        if lrefs and rrefs:
            fields = [lschema.field(c) for c in left_cols] + [
                rschema.field(c) for c in right_payload
            ]
            tile_schema = pa.schema(fields)
            tile_fn = ray.remote(_tile_join_task)
            tiles = [
                tile_fn.remote(lr, rr, on, rkey, out_cols, tile_schema)
                for lr in lrefs
                for rr in rrefs
            ]
            pieces.append(rd.from_arrow_refs(tiles))

    left_cold = left.map_batches(
        lambda t: split(t, hot_arr, False), batch_format="pyarrow", zero_copy_batch=True
    )
    right_cold = right.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t[rkey], value_set=hot_arr))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cold_joined = hash_join(left_cold, right_cold, on, right_on, "inner", num_partitions)
    cold_joined = cold_joined.map_batches(
        lambda df: df[out_cols], batch_format="pandas"
    )
    out = pieces[0] if pieces else cold_joined
    for p in pieces[1:]:
        out = out.union(p)
    return out.union(cold_joined) if pieces else out


def sort_merge_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    num_ranges: int = 16,
) -> Dataset:
    """Range-partitioned SORT-MERGE inner join — the third physical join
    next to ``broadcast_join`` (small side) and ``hash_join`` (hash
    exchange): both sides are bucketed by the SAME sampled key ranges (the
    ``rank.py`` boundary machinery), co-grouped per range, and each range
    joins by sort + ``searchsorted`` run expansion instead of a hash table.

    When it wins at scale: the output must stay key-ordered for a
    downstream merge consumer, or the inputs are already range-partitioned
    on disk (z-/range-clustered lakehouse tables) so the exchange is free
    and no hash table is ever built.  Ties (duplicate keys both sides)
    expand to the full cross product per key, exactly like hash join.
    """
    import pandas as pd

    from .rank import _sample_boundaries

    rkey = right_on or on
    if rkey == on:
        raise ValueError("sort_merge_join needs distinct left/right key names")
    bounds = _sample_boundaries(left, on, num_ranges)
    def _arrow_type(x):
        # pandas-backed Datasets report numpy dtypes; object == string here
        if isinstance(x, pa.DataType):
            return x
        try:
            return pa.from_numpy_dtype(np.dtype(x))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    ls, rs = left.schema(), right.schema()
    lcols, rcols = list(ls.names), list(rs.names)
    ltype = {n_: _arrow_type(t_) for n_, t_ in zip(ls.names, ls.types)}
    rtype = {n_: _arrow_type(t_) for n_, t_ in zip(rs.names, rs.types)}
    if set(lcols) & set(rcols):
        raise ValueError("sort_merge_join needs disjoint column names")

    def bucket_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(bounds, vals, side="right").astype(np.int64)

    def tag(t: pa.Table, key: str, side: str) -> pa.Table:
        # emit the COMBINED schema (other side's columns null) so the two
        # tagged streams union into one range exchange
        n = len(t)
        cols: dict[str, pa.Array] = {}
        for name in lcols:
            cols[name] = t[name] if side == "l" else pa.nulls(n, ltype[name])
        for name in rcols:
            cols[name] = t[name] if side == "r" else pa.nulls(n, rtype[name])
        vals = t[key].to_numpy(zero_copy_only=False)
        cols["__rng"] = pa.array(bucket_of(vals))
        cols["__side"] = pa.array(np.full(n, side))
        return pa.table(cols)

    lt = left.map_batches(
        lambda t: tag(t, on, "l"), batch_format="pyarrow", zero_copy_batch=True
    )
    rt = right.map_batches(
        lambda t: tag(t, rkey, "r"), batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_range(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df["__side"] == "l"]
        rdf = df[df["__side"] == "r"]
        if not len(ldf) or not len(rdf):
            return pd.DataFrame(columns=[*lcols, *[c for c in rcols if c != rkey]])
        ldf = ldf.sort_values(on, kind="stable", ignore_index=True)
        rdf = rdf.sort_values(rkey, kind="stable", ignore_index=True)
        lk = ldf[on].to_numpy()
        rk = rdf[rkey].to_numpy()
        lo = np.searchsorted(rk, lk, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        n = hi - lo
        total = int(n.sum())
        lidx = np.repeat(np.arange(len(lk)), n)
        ridx = np.repeat(lo, n) + (np.arange(total) - np.repeat(np.cumsum(n) - n, n))
        out = ldf.iloc[lidx][lcols].reset_index(drop=True)
        for c in rcols:
            if c != rkey:
                out[c] = rdf.iloc[ridx][c].to_numpy()
        # the null-padded union floats integer columns in pandas; restore
        for c in out.columns:
            at = ltype.get(c) or rtype.get(c)
            if at is not None and pa.types.is_integer(at):
                out[c] = out[c].astype("int64")
            elif at is not None and pa.types.is_floating(at):
                out[c] = out[c].astype("float64")
        return out

    both = lt.union(rt)
    return both.groupby("__rng").map_groups(merge_range, batch_format="pandas")
