"""Interval (range) overlap join — the join family Ray Data has no native
operator for: pair rows whose [start, end) intervals intersect.

The naive plan is an inequality self-join (O(N²) comparisons with no
hash-partitionable equality key).  The scale shape used here is the
standard **grid-bucketed interval join**: quantize the time axis into
fixed-width cells, fan each interval out to every cell it covers, hash-
exchange on the cell id, enumerate candidate pairs only within a cell, and
count a pair exactly once — in the unique cell containing
``max(start_a, start_b)`` (both intervals cover that instant whenever they
overlap, and it lies in exactly one cell).  Per-cell work is a vectorized
triangular scan; no pair set or interval table ever materializes on the
driver, and cell width bounds the per-task candidate count the same way a
band bounds an LSH bucket.

Reference parity: the reference engine has no interval join; this is one of
the beyond-reference operators (brief: "operations a large-scale
training-data pipeline would need" — co-activity / overlap analysis).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .relational import bucketed_group_reduce

# Cell width for the time-axis grid (µs).  One hour: user-day activity
# intervals span ≤ 24 cells, and a cell's candidate set is "users active
# that hour" — the same bound a sweep line would touch at its widest point.
CELL_US = 3_600_000_000


def overlap_pairs_per_cell(
    iv: pd.DataFrame,
    group_col: str,
    cell_us: int = CELL_US,
) -> pd.DataFrame:
    """Exact overlapping-pair aggregates per ``group_col`` via the grid.

    ``iv`` columns: ``group_col`` (pairs only form within a group — e.g.
    the day), ``item`` (distinct entity id; pairs are item_a < item_b),
    ``s``/``e`` int64 µs with s < e (closed-open semantics: overlap iff
    ``a.s < b.e AND b.s < a.e``).

    Returns per-group: ``n_pairs``, ``total_overlap_us``, ``max_overlap_us``.
    """
    rows = []
    for _, g in iv.groupby(group_col, sort=False):
        s = g["s"].to_numpy(np.int64)
        e = g["e"].to_numpy(np.int64)
        item = g["item"].to_numpy(np.int64)
        m = len(g)
        if m < 2:
            continue
        # candidate pairs within the cell: triangular index grid
        ia, ib = np.triu_indices(m, k=1)
        ss = np.maximum(s[ia], s[ib])
        ee = np.minimum(e[ia], e[ib])
        ov = ee - ss
        keep = ov > 0
        rows.append(
            pd.DataFrame(
                {
                    group_col: g[group_col].iloc[0],
                    "item_a": np.minimum(item[ia[keep]], item[ib[keep]]),
                    "item_b": np.maximum(item[ia[keep]], item[ib[keep]]),
                    "start_max": ss[keep],
                    "overlap_us": ov[keep],
                }
            )
        )
    if not rows:
        return pd.DataFrame(
            columns=[group_col, "item_a", "item_b", "start_max", "overlap_us"]
        )
    return pd.concat(rows, ignore_index=True)


def interval_overlap_join(
    intervals: Dataset,
    group_col: str,
    cell_us: int = CELL_US,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Distributed exact overlap self-join over ``intervals`` rows
    ``(group_col, item, s, e)``; returns per-group pair aggregates.

    Stage 1 (flat_map): each interval emits one row per grid cell it
    covers — ``cell = floor(t / cell_us)`` for t in [s, e).  Stage 2: one
    hash exchange on ``(group_col, cell)``; per cell, enumerate candidate
    pairs vectorized and KEEP a pair only when its ``max(s_a, s_b)`` falls
    inside this very cell — every overlapping pair is counted exactly once
    across all cells.  Stage 3: tiny grouped sum over per-cell partials.
    """

    def fan_out(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        s = df["s"].to_numpy(np.int64)
        e = df["e"].to_numpy(np.int64)
        c0 = s // cell_us
        c1 = (e - 1) // cell_us  # e is exclusive
        reps = (c1 - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), reps)
        # per-repeat cell offsets: 0..reps-1 within each interval
        off = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        out = df.iloc[idx].reset_index(drop=True)
        out["cell"] = c0[idx] + off
        return pa.Table.from_pandas(out, preserve_index=False)

    def per_cell(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for (grp, cell), g in df.groupby([group_col, "cell"], sort=False):
            pairs = overlap_pairs_per_cell(
                g.assign(**{group_col: grp}), group_col, cell_us
            )
            if not len(pairs):
                continue
            # count the pair only in the cell holding max(s_a, s_b)
            own = pairs[pairs["start_max"] // cell_us == cell]
            if not len(own):
                continue
            parts.append(
                pd.DataFrame(
                    {
                        group_col: [grp],
                        "n_pairs": [np.int64(len(own))],
                        "total_overlap_us": [own["overlap_us"].sum()],
                        "max_overlap_us": [own["overlap_us"].max()],
                    }
                )
            )
        if not parts:
            return pd.DataFrame(
                columns=[group_col, "n_pairs", "total_overlap_us", "max_overlap_us"]
            )
        return pd.concat(parts, ignore_index=True)

    fanned = intervals.map_batches(fan_out, batch_format="pyarrow")
    partials = bucketed_group_reduce(
        fanned, [group_col, "cell"], per_cell, num_buckets=num_buckets
    )
    # day-level partials are GROUP-bounded (one row per (group, cell)) —
    # fold them on the driver instead of paying a third exchange
    p = partials.to_pandas()
    if p.empty:
        return pd.DataFrame(
            columns=[group_col, "n_pairs", "total_overlap_us", "max_overlap_us"]
        )
    return p.groupby(group_col, as_index=False).agg(
        n_pairs=("n_pairs", "sum"),
        total_overlap_us=("total_overlap_us", "sum"),
        max_overlap_us=("max_overlap_us", "max"),
    )
