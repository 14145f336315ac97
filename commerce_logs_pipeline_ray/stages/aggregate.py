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
        cols["salt"] = pa.array((fnv1a32(t["doc_id"]) % np.uint32(salt_mod)).astype(np.int32))
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


def final_agg(partials: Dataset, *, keys: list[str] | None = None, salted: bool = False) -> Dataset:
    """Reduce a Dataset of partials to final per-key counts (hash shuffle)."""
    keys = list(keys) if keys is not None else list(AGG_KEYS)
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
