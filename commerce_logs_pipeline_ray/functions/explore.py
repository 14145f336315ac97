"""Exploration / debugging utilities.

Rebuilds the reference's CLI-side helpers as engine functions:

* group-count exploration + top-k display —
  ``cli/scripts/explore_raw_logs.py:480-556`` (A5);
* log-tail: filter → limit → pretty rows —
  ``pipeline/log-tail/internal/consumer/kafka.go:46-171`` (S7/F8);
* safe-eval row filter: user-supplied predicate evaluated in a sandboxed
  namespace — ``cli/scripts/explore_raw_logs.py:33-66`` (F9).  Row-at-a-time
  by design (an escape hatch, not a hot path — the vectorized filters in
  the stages are the engine path);
* shard filter: ``sum(md5(key)) % shards == shard`` —
  ``pipeline/ingest/internal/filters/filters.go:160-189`` (F5), kept as a
  deterministic input-split function for cross-job sharding;
* human-byte formatter — ``processor.go:345-355`` (M14).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .relational import grouped_sums, topk
from .rounding import round_like_duckdb as _rd


def group_counts(ds: Dataset, column: str, k: int = 10) -> pd.DataFrame:
    """Top-k value counts for one column (A5 exploration stats)."""
    counted = grouped_sums(ds, [column], {}, "n")
    out = topk(counted, ["n", column], [True, False], k).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


def tail(ds: Dataset, predicate=None, n: int = 10) -> list[dict]:
    """log-tail: optional row predicate → first n rows as dicts (S7).

    ``predicate`` is a per-row callable; fine for debugging — use
    vectorized ``map_batches`` filters in pipelines.
    """
    if predicate is not None:
        ds = ds.filter(predicate)
    return ds.limit(n).take(n)


_SAFE_BUILTINS = {
    "len": len, "abs": abs, "min": min, "max": max, "round": round,
    "str": str, "int": int, "float": float, "bool": bool,
}


def compile_safe_filter(expr: str):
    """F9 sandboxed row filter: compile `expr` evaluated against row fields.

    The namespace exposes only the row's columns + a small builtin
    allowlist; double-underscore access is rejected.
    """
    if "__" in expr:
        raise ValueError("double underscores not allowed in filter expressions")
    code = compile(expr, "<row-filter>", "eval")
    for name in code.co_names:
        if name.startswith("__"):
            raise ValueError(f"illegal name in filter: {name}")

    def predicate(row: dict) -> bool:
        try:
            return bool(eval(code, {"__builtins__": _SAFE_BUILTINS}, dict(row)))
        except Exception:
            return False

    return predicate


def safe_filter(ds: Dataset, expr: str) -> Dataset:
    """Row-level UDF filter escape hatch (non-vectorized; documented)."""
    return ds.filter(compile_safe_filter(expr))


def shard_of(key: str, num_shards: int) -> int:
    """Reference shard assignment: sum of md5 digest bytes mod shards
    (``filters.go:160-189``)."""
    return sum(hashlib.md5(key.encode()).digest()) % num_shards


def shard_files(files: list[str], num_shards: int, shard: int) -> list[str]:
    """Deterministic input split for running disjoint jobs over one corpus."""
    return [f for f in files if shard_of(f, num_shards) == shard]


def human_bytes(n: float) -> str:
    """B/KB/MB/GB display formatter (``processor.go:345-355``)."""
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024.0 or unit == "GB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024.0
    return f"{n:.1f} GB"


def analyze_columns(ds: Dataset, columns: list[str]) -> pd.DataFrame:
    """ANALYZE-style per-column statistics — the catalog-stats pass a
    planner needs (row count, null count, exact NDV, min/max):

    * one streaming pass computes n/nulls/min/max for ALL columns at once
      (per-batch Arrow aggregates → a handful of partial rows to fold);
    * exact NDV runs per column as per-batch ``unique`` partials → bucketed
      distinct reduce — the partial stream is each block's distinct set, so
      a unique-id column ships ~its own size (exact NDV's inherent cost;
      the mergeable-HLL path in ``sketch.py`` is the approximate scale
      alternative when ±2% is acceptable).

    Returns (col_name, n_rows, n_nulls, n_distinct, min_v, max_v) with
    min/max as float64 — callers pick numeric/castable columns.
    """
    import numpy as np
    import pyarrow.compute as pc

    from .relational import bucketed_group_reduce

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = t[c]
            nn = len(t) - col.null_count
            mn = pc.min(col).as_py() if nn else None
            mx = pc.max(col).as_py() if nn else None
            rows.append(
                {"col_name": c, "n": len(t), "nulls": col.null_count,
                 "mn": float(mn) if mn is not None else np.nan,
                 "mx": float(mx) if mx is not None else np.nan}
            )
        return pa.Table.from_pylist(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    base = parts.groupby("col_name").agg(
        n_rows=("n", "sum"), n_nulls=("nulls", "sum"), min_v=("mn", "min"), max_v=("mx", "max")
    )

    ndv = {}
    for c in columns:
        uniques = ds.map_batches(
            lambda t, _c=c: pa.table({"v": pc.unique(t[_c].combine_chunks().drop_null())}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"nd": [df["v"].nunique()]})

        nd = bucketed_group_reduce(uniques, ["v"], per_bucket).to_pandas()
        ndv[c] = int(nd["nd"].sum())

    out = base.reset_index()
    out["n_distinct"] = out["col_name"].map(ndv)
    out = out[["col_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v"]]
    out[["min_v", "max_v"]] = out[["min_v", "max_v"]].apply(_rd)
    return out.sort_values("col_name", ignore_index=True).astype(
        {"n_rows": "int64", "n_nulls": "int64", "n_distinct": "int64"}
    )
