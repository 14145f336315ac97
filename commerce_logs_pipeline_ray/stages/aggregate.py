"""Aggregate stage — salted, pre-aggregated per-sink counts.

The north rule's aggregate is per-sink ``groupby(source, n_tok_bucket)``
row/token counts (the reference's per-blob line counts + listing summaries,
SURVEY §2.7 A1/A2/A5).  At 100 TB a bare ``groupby`` over raw rows is an
all-to-all shuffle of every row; instead:

1. **combiner**: each ``map_batches`` task collapses its batch to at most
   ``|distinct keys|`` partial rows with Arrow's hash aggregation
   (``Table.group_by``) — the shuffle then moves partials, not rows;
2. **salt**: the partial key optionally includes ``salt = FNV(doc_id) % S``
   so one Zipf-hot source (``apache-proxy``) cannot concentrate a single
   reducer (north-rule skew requirement; the reference has no skew handling
   — a hot blob saturates one Kafka partition, SURVEY §4);
3. **final reduce**: ``ds.groupby(keys).aggregate(Sum, Sum)`` over the tiny
   partial stream, then (when salted) a second groupby without the salt.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.hashing import fnv1a32
from ..schema import AGG_KEYS, N_TOK_BUCKET_WIDTH


def add_bucket(t: pa.Table, *, bucket_width: int = N_TOK_BUCKET_WIDTH) -> pa.Table:
    """Append ``n_tok_bucket = n_tok // bucket_width`` (int32)."""
    bucket = pc.cast(
        pc.divide(t["n_tok"], pa.scalar(bucket_width, pa.int32())), pa.int32()
    )
    return t.append_column("n_tok_bucket", bucket)


def partial_agg(
    t: pa.Table,
    *,
    keys: list[str] | None = None,
    bucket_width: int = N_TOK_BUCKET_WIDTH,
    salt_mod: int = 0,
) -> pa.Table:
    """Per-batch combiner: collapse a batch to partial (row, token) counts."""
    keys = list(keys) if keys is not None else list(AGG_KEYS)
    if "n_tok_bucket" in keys and "n_tok_bucket" not in t.column_names:
        t = add_bucket(t, bucket_width=bucket_width)
    group_keys = list(keys)
    cols = {k: t[k] for k in keys}
    cols["n_tok"] = t["n_tok"]
    if salt_mod > 1:
        if "key_hash" in t.column_names:  # reuse the parse stage's FNV pass
            h = t["key_hash"].combine_chunks().to_numpy(zero_copy_only=False)
            salt = (h % salt_mod).astype(np.int32)
        else:
            salt = (fnv1a32(t["doc_id"]) % np.uint32(salt_mod)).astype(np.int32)
        cols["salt"] = pa.array(salt)
        group_keys.append("salt")
    flat = pa.table(cols)
    g = flat.group_by(group_keys).aggregate([("n_tok", "count"), ("n_tok", "sum")])
    return pa.table(
        {
            **{k: g[k] for k in group_keys},
            "row_count": pc.cast(g["n_tok_count"], pa.int64()),
            "token_count": pc.cast(g["n_tok_sum"], pa.int64()),
        }
    )


def _combine_partials(t: pa.Table, *, group_keys: list[str]) -> pa.Table:
    if len(t) == 0:
        return t
    g = t.group_by(group_keys).aggregate([("row_count", "sum"), ("token_count", "sum")])
    return pa.table(
        {
            **{k: g[k] for k in group_keys},
            "row_count": g["row_count_sum"],
            "token_count": g["token_count_sum"],
        }
    )


def detect_hot_keys(agg: pa.Table, key: str = "source", threshold: float = 0.25) -> dict[str, float]:
    """Skew detector: keys holding more than ``threshold`` of all rows.

    Fed from the (tiny) final aggregate table, so detection is free; the
    result is recorded in the shard manifest and is the signal to raise
    ``salt_mod`` for subsequent runs (north-rule skew handling — the
    reference has none and a hot blob saturates one Kafka partition,
    SURVEY §4)."""
    if agg.num_rows == 0:
        return {}
    flat = pa.table({key: agg[key], "row_count": agg["row_count"]})
    g = flat.group_by([key]).aggregate([("row_count", "sum")])
    counts = dict(zip(g[key].to_pylist(), g["row_count_sum"].to_pylist()))
    total = sum(counts.values()) or 1
    return {k: round(v / total, 4) for k, v in counts.items() if v / total >= threshold}


def final_agg(
    partials: Dataset,
    *,
    keys: list[str] | None = None,
    salted: bool = False,
    mode: str = "driver",
    tree_width: int = 16,
):
    """Reduce a Dataset of partials to final per-key counts.

    ``mode="driver"`` (default): consume the partial stream and merge with
    ONE pandas groupby on the driver; returns a ``pandas.DataFrame``.  The
    partial stream is bounded by |keys|·salt·blocks (hundreds of rows per
    block — the per-batch combiner already collapsed raw rows), so the
    collect is KBs at any corpus size.  Measured: the alternative AllToAll
    operators cost 10+ s at 8 CPUs on a 2.4 M-row shard because the
    streaming executor's all-to-all resource reservation starves the fused
    map stage that does all the real work (interleaved same-session
    comparison, 2026-08-17: driver 8.1–8.8 s, shuffle 20.4–21 s,
    tree 26–29 s; at 32 CPUs all three converge to 4.4–5.0 s).

    ``mode="shuffle"``: Ray sort-based hash-shuffle ``groupby`` over
    ``keys (+salt)`` then un-salted re-reduce — the explicit-exchange path;
    REQUIRED when the key space is too large for any single reducer
    (unbounded group-by keys), and the path the salting exists for.
    (Replacing the second groupby with ``repartition(1)`` + hash-combine
    was A/B-measured SLOWER — 27-31 s vs 20.5-22.7 s at 8 CPUs, alternating
    cycles 2026-08-17: repartition is itself an all-to-all plus a
    single-task bottleneck, and a hash exchange is what the unbounded-key
    contract needs anyway.  Don't retry.)

    ``mode="tree"``: coalesce the partial stream into ``tree_width`` blocks
    and hash-aggregate each, then once more — a middle ground when partials
    outgrow the driver but an all-to-all is still unnecessary.

    All three produce bit-identical tables (tests/test_flagship.py).
    """
    keys = list(keys) if keys is not None else list(AGG_KEYS)
    if mode == "driver":
        pdf = partials.to_pandas()
        return (
            pdf.groupby(keys, as_index=False, dropna=False, sort=True)[
                ["row_count", "token_count"]
            ].sum()
        )
    if mode == "tree":
        out = partials.repartition(tree_width).map_batches(
            _combine_partials,
            fn_kwargs={"group_keys": keys},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return out.repartition(1).map_batches(
            _combine_partials,
            fn_kwargs={"group_keys": keys},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    first_keys = keys + (["salt"] if salted else [])
    out = partials.groupby(first_keys).aggregate(
        Sum("row_count", alias_name="row_count"),
        Sum("token_count", alias_name="token_count"),
    )
    if salted:
        out = out.groupby(keys).aggregate(
            Sum("row_count", alias_name="row_count"),
            Sum("token_count", alias_name="token_count"),
        )
    return out
