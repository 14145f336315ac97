"""CDC MERGE (upsert + delete) — apply a change batch to a keyed snapshot
without rescanning history: the engine-side equivalent of SQL
``MERGE INTO state USING batch`` with last-writer-wins rows, additive
accumulators, and tombstone deletes (e.g. a GDPR erasure feed).

Scale shape: the snapshot at 10^12 keys never fits a broadcast, so both
sides ride ONE hash exchange — batch rows are pre-combined per key inside
``map_batches`` (combiner-first: what reaches the exchange is one partial
row per key per block, not raw events), tagged, unioned with the snapshot
rows, and folded per key in a bucketed group reduce.  Deletes resolve
inside the same group (a tombstoned key emits nothing), so no second
anti-join pass is needed.  This composes with the incremental-aggregate
state family: the output is a valid next snapshot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .relational import bucketed_group_reduce

STATE_COLS = ["key", "last_ts_us", "last_type", "total_value_c", "n_events", "tomb"]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[STATE_COLS].copy()
    out["key"] = out["key"].astype("int64")
    out["last_ts_us"] = out["last_ts_us"].astype("int64")
    out["total_value_c"] = out["total_value_c"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    out["tomb"] = out["tomb"].astype(bool)
    return out


def combine_events(
    df: pd.DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    tomb_flag_col: str | None = None,
) -> pd.DataFrame:
    """Per-block combiner: raw change rows → one partial state row per key.
    Values are folded as integer cents so merge order can never perturb a
    float sum.  ``tomb_flag_col`` (bool) marks erasure rows."""
    ts_s = df[ts_col]
    if pd.api.types.is_datetime64_any_dtype(ts_s):
        ts_s = ts_s.astype("datetime64[us]")  # pandas defaults to ns — µs convention
    ts = ts_s.astype("int64")
    d = pd.DataFrame(
        {
            "key": df[key_col].astype("int64"),
            "last_ts_us": ts,
            "last_type": df[type_col].astype(str),
            "total_value_c": (df[value_col] * 100).round().astype("int64"),
            "n_events": np.int64(1),
            "tomb": df[tomb_flag_col].astype(bool) if tomb_flag_col else False,
        }
    )
    # last-writer within the block: idxmax on ts (ts ties broken by
    # position are impossible here — event timestamps are µs-unique per key
    # in the corpus; documented convention)
    idx = d.groupby("key")["last_ts_us"].idxmax()
    last = d.loc[idx, ["key", "last_ts_us", "last_type"]].set_index("key")
    agg = d.groupby("key").agg(
        total_value_c=("total_value_c", "sum"),
        n_events=("n_events", "sum"),
        tomb=("tomb", "any"),
    )
    out = agg.join(last).reset_index()
    return _normalize(out)


def merge_state(
    snapshot: Dataset | None, delta_partials: Dataset, num_buckets: int = 64
) -> Dataset:
    """MERGE: union the tagged sides, one hash exchange on key, fold.

    Fold semantics per key: tombstone anywhere in the delta ⇒ key absent
    from the output; otherwise accumulators add, and (last_ts_us,
    last_type) come from the row with the max ts across both sides.
    Keys only in the delta are inserts; keys only in the snapshot pass
    through unchanged.  ``snapshot=None`` when the caller already mixed
    both sides' partials into one stream (the fold is associative).
    """

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        dead = df.loc[df["tomb"], "key"].unique()
        live = df[~df["key"].isin(dead)]
        if live.empty:
            return _normalize(pd.DataFrame(columns=STATE_COLS))
        idx = live.groupby("key")["last_ts_us"].idxmax()
        last = live.loc[idx, ["key", "last_ts_us", "last_type"]].set_index("key")
        agg = live.groupby("key").agg(
            total_value_c=("total_value_c", "sum"),
            n_events=("n_events", "sum"),
        )
        out = agg.join(last).reset_index()
        out["tomb"] = False
        return _normalize(out)

    unioned = (
        delta_partials if snapshot is None else snapshot.union(delta_partials)
    )
    return bucketed_group_reduce(unioned, ["key"], fold, num_buckets=num_buckets)
