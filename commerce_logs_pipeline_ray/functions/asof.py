"""As-of (temporal) join — the reference's designed correlation joins
(SURVEY §2.6 J2/J3: link records to the latest prior related record by key,
``pipeline_design.md:63-74``) generalized as a reusable operator.

Ray Data has no as-of join; composition (guide pattern): align both sides to
one schema with a ``side`` tag, union, hash-shuffle ``groupby(by)`` so each
key co-locates, and run ``pd.merge_asof`` over the time-sorted group.

Partitioning assumption: one group (all rows of one ``by`` key, both sides)
fits a worker; for skewed keys pre-split by coarse time range and stitch the
boundary (the last right-side row of range i is the seed row of range i+1).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _arrow_schema(ds: Dataset) -> pa.Schema:
    """Dataset schema as pa.Schema (pandas-block datasets report numpy
    dtypes; object dtype is assumed to be string)."""
    base = getattr(ds.schema(), "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    import numpy as np

    fields = []
    sch = ds.schema()
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
            continue
        try:
            fields.append(pa.field(name, pa.from_numpy_dtype(np.dtype(typ))))
        except (pa.ArrowNotImplementedError, TypeError):
            fields.append(pa.field(name, pa.string()))
    return pa.schema(fields)


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    right_payload: list[str],
    direction: str = "backward",
    suffix: str = "_right",
    inner: bool = True,
) -> Dataset:
    """For each left row: the latest right row with ``right.on <= left.on``
    (direction="backward"; "forward" = earliest >=) sharing ``by``.

    ``inner=True`` drops left rows without a match (DuckDB ``ASOF JOIN``
    semantics); ``False`` keeps them with nulls (``ASOF LEFT JOIN``).

    Rows with a null ``on`` value never match (SQL comparison semantics) and
    are excluded from both sides before the merge.
    """
    # __match: non-null int8 sentinel on every right row — inner-join
    # filtering keys off THIS, never off payload nullability (a matched row
    # whose payload value is legitimately null must survive)
    payload_with_match = [*right_payload, "__match"]
    both = _cogroup_union(left, right, by, on, payload_with_match, suffix)
    suffixed = [f"{c}{suffix}" for c in payload_with_match]
    match_col = f"__match{suffix}"

    # merge_asof picks the LAST right row in sort order among ties on
    # (by, on); without a deterministic secondary key that order is shuffle
    # arrival order — sort ties by the (suffixed) payload columns so the
    # matched row is identical across runs and partitionings.
    tie_keys = [c for c in suffixed if c != match_col]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized merge_asof(by=) per BUCKET of keys, not per key
        df = df[df[on].notna()]
        l = df[df["__side"] == "l"].sort_values([on, by], kind="stable")
        r = df[df["__side"] == "r"].sort_values([on, by, *tie_keys], kind="stable")
        l = l.drop(columns=["__side", *suffixed])
        r_small = r[[by, on, *suffixed]]
        if len(l) == 0:
            return l.assign(**{c: pd.Series(dtype="float64") for c in suffixed}).drop(
                columns=[match_col]
            )
        merged = pd.merge_asof(l, r_small, on=on, by=by, direction=direction)
        if inner:
            merged = merged[merged[match_col].notna()]
        return merged.drop(columns=[match_col])

    from .relational import bucketed_group_reduce

    return bucketed_group_reduce(both, [by], merge)


def _cogroup_union(
    left: Dataset, right: Dataset, by: str, on: str, right_payload: list[str], suffix: str
) -> Dataset:
    """Shared co-group scaffolding: tag sides, align the right side onto the
    left schema (payload carried in suffixed columns; the literal name
    "__match" becomes a constant non-null sentinel), union.
    """
    left_schema = _arrow_schema(left)
    right_schema = _arrow_schema(right)
    left_cols = list(left_schema.names)
    payload_types = {
        c: (pa.int8() if c == "__match" else right_schema.field(c).type) for c in right_payload
    }

    def tag(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("__side", pa.array([side] * len(t), type=pa.string()))

        return fn

    def align_left(t: pa.Table) -> pa.Table:
        for c in right_payload:
            t = t.append_column(f"{c}{suffix}", pa.nulls(len(t), payload_types[c]))
        return t

    def align_right(t: pa.Table) -> pa.Table:
        cols = {by: t[by], on: t[on], "__side": t["__side"]}
        out = pa.table(cols)
        for c in left_cols:
            if c not in out.column_names:
                out = out.append_column(c, pa.nulls(len(t), left_schema.field(c).type))
        for c in right_payload:
            if c == "__match":
                out = out.append_column(f"{c}{suffix}", pa.array([1] * len(t), type=pa.int8()))
            else:
                out = out.append_column(f"{c}{suffix}", t[c])
        return out

    lt = left.map_batches(tag("l"), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag("r"), batch_format="pyarrow", zero_copy_batch=True)
    lt = lt.map_batches(align_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = rt.map_batches(align_right, batch_format="pyarrow", zero_copy_batch=True)
    rt = rt.select_columns(lt.schema().names)  # identical column order for union
    return lt.union(rt)


def global_range_join_count(
    left: Dataset,
    right: Dataset,
    on: str,
    window: float,
    count_name: str = "n_in_window",
    num_buckets: int = 64,
) -> Dataset:
    """KEYLESS range (interval) join, count form: for each left row, how
    many right rows ANYWHERE in the dataset satisfy
    ``left.on - window < right.on <= left.on``.

    :func:`range_join_count` co-groups on an equality key; with no key the
    exchange key must be derived from the interval predicate itself.  The
    classic band-join partitioning: bucket time by ``width == window``
    (``b = floor(on/window)``), so a left row's window spans at most its own
    bucket and the previous one; each RIGHT row is replicated to buckets
    ``(b, b+1)`` — a bounded 2× blow-up of one side instead of an all-pairs
    product — then every bucket counts locally with one vectorized
    ``searchsorted`` per bucket.  At 100 TB the exchange moves each right
    row twice and each left row once; no pair set ever materializes.

    Buckets are hash-coarsened into ``num_buckets`` exchange partitions
    (many time-buckets per task; the per-time-bucket loop inside a task is
    over slices, each handled vectorized).  ``on`` may be numeric or a
    timestamp (compared at nanosecond precision, ``window`` in seconds).
    Rows with null ``on`` never match and left nulls are dropped (same
    contract as :func:`range_join_count`).
    """
    import numpy as np

    left_schema = _arrow_schema(left)
    left_cols = list(left_schema.names)
    is_ts = pa.types.is_timestamp(left_schema.field(on).type)
    # integer window width: ns for timestamps, raw units for numerics (a
    # float width would make floor(on/width) bucket edges inexact)
    width = int(window * 1e9) if is_ts else int(window)
    if width <= 0:
        raise ValueError("window must be positive and >= 1 unit")

    def to_num(arr: pa.ChunkedArray | pa.Array) -> "np.ndarray":
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if is_ts:
            a = pc.cast(a, pa.timestamp("ns"))
        return pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[on]))
        nums = to_num(t[on])
        t = t.append_column("__on_num", pa.array(nums, type=pa.int64()))
        t = t.append_column("__tbucket", pa.array(nums // width, type=pa.int64()))
        return t.append_column("__side", pa.array(["l"] * len(t), type=pa.string()))

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[on]))
        nums = to_num(t[on])
        b = nums // width
        nums2 = np.concatenate([nums, nums])
        buckets = np.concatenate([b, b + 1])
        out = pa.table(
            {
                "__on_num": pa.array(nums2, type=pa.int64()),
                "__tbucket": pa.array(buckets, type=pa.int64()),
                "__side": pa.array(["r"] * len(nums2), type=pa.string()),
            }
        )
        for c in left_cols:  # null-pad onto the left schema for the union
            out = out.append_column(c, pa.nulls(len(nums2), left_schema.field(c).type))
        return out

    lt = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    rt = rt.select_columns(lt.schema().names)
    both = lt.union(rt)

    def count(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        l = df[df["__side"] == "l"]
        if len(l) == 0:
            return (
                l.drop(columns=["__side", "__on_num", "__tbucket"])
                .assign(**{count_name: pd.Series(dtype="int64")})
            )
        r = df[df["__side"] == "r"]
        out_counts = np.zeros(len(l), dtype=np.int64)
        r_by_bucket = {
            k: np.sort(g["__on_num"].to_numpy()) for k, g in r.groupby("__tbucket", sort=False)
        }
        for k, g in l.groupby("__tbucket", sort=False):
            on_r = r_by_bucket.get(k)
            if on_r is None or len(on_r) == 0:
                continue
            on_l = g["__on_num"].to_numpy()
            hi = np.searchsorted(on_r, on_l, side="right")
            lo = np.searchsorted(on_r, on_l - width, side="right")
            out_counts[l.index.get_indexer(g.index)] = hi - lo
        return l.drop(columns=["__side", "__on_num", "__tbucket"]).assign(
            **{count_name: out_counts}
        )

    from .relational import bucketed_group_reduce

    return bucketed_group_reduce(both, ["__tbucket"], count, num_buckets=num_buckets)


def range_join_count(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    window: float,
    count_name: str = "n_in_window",
) -> Dataset:
    """Range (interval) join, count form: for each left row, how many right
    rows share ``by`` with ``left.on - window < right.on <= left.on``.

    Same co-group shape as :func:`asof_join`; inside the group the count is
    a vectorized ``searchsorted`` over the sorted right timestamps — O((L+R)
    log R) per key instead of the naive O(L·R) pair expansion, and no pair
    blow-up ever materializes.  ``on`` values are compared as int64
    nanoseconds when datetimes.
    """

    both = _cogroup_union(left, right, by, on, [], suffix="_right")

    import numpy as np

    def count(df: pd.DataFrame) -> pd.DataFrame:
        # per-bucket: iterate KEYS (bounded by bucket size) with vectorized
        # searchsorted over each key's sorted right timestamps
        l = df[df["__side"] == "l"].drop(columns=["__side"])
        r = df[df["__side"] == "r"]
        if len(l) == 0:
            return l.assign(**{count_name: pd.Series(dtype="int64")})

        def to_num(arr):
            if np.issubdtype(arr.dtype, np.datetime64):
                return arr.astype("datetime64[ns]").astype("int64"), int(window * 1e9)
            return arr, window

        r_sorted = r.sort_values([by, on], kind="stable")
        r_groups = {k: g[on].to_numpy() for k, g in r_sorted.groupby(by, sort=False)}
        out_counts = np.zeros(len(l), dtype=np.int64)
        for k, g in l.groupby(by, sort=False):
            on_r = r_groups.get(k)
            if on_r is None or len(on_r) == 0:
                continue
            on_l_n, w = to_num(g[on].to_numpy())
            on_r_n, _ = to_num(on_r)
            hi = np.searchsorted(on_r_n, on_l_n, side="right")
            lo = np.searchsorted(on_r_n, on_l_n - w, side="right")
            out_counts[l.index.get_indexer(g.index)] = hi - lo
        return l.assign(**{count_name: out_counts})

    from .relational import bucketed_group_reduce

    return bucketed_group_reduce(both, [by], count)
