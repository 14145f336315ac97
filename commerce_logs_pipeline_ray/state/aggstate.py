"""Incremental aggregate maintenance — persisted per-key partial aggregates
folded across runs (the materialized-view / streaming-upsert analogue of the
curation pipeline's cross-run dedup state).

A run's NEW data reduces to per-key integer partials (one combiner
exchange); the persisted state parquet is outer-merged with the partials and
atomically replaced.  Run ids are recorded so re-applying a run is a no-op —
the same at-least-once-delivery idempotence contract as the flagship
manifest (state/manifest.py).  Reading the state is O(|keys|), never
O(|history|): a 100-TB event history folds into a key-cardinality-sized
parquet that each new day's run updates in one pass over the NEW data only.

Only mergeable integer partials belong here (counts, integer sums, min/max);
averages/ratios derive at read time — the repo-wide exactness convention.
"""

from __future__ import annotations

import json
import os
import uuid

import pandas as pd


class IncrementalAgg:
    """Cross-run per-key additive aggregate state.

    ``keys``: grouping columns; ``sums``: additive int64 columns (a ``n``
    count column is always maintained).
    """

    def __init__(self, state_dir: str, keys: list[str], sums: list[str]):
        self.state_dir = state_dir
        self.keys = list(keys)
        self.sums = list(sums)
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _parquet(self) -> str:
        return os.path.join(self.state_dir, "agg_state.parquet")

    @property
    def _runs_path(self) -> str:
        return os.path.join(self.state_dir, "applied_runs.json")

    def applied_runs(self) -> list[str]:
        if not os.path.exists(self._runs_path):
            return []
        with open(self._runs_path) as f:
            return json.load(f)

    def read(self) -> pd.DataFrame:
        if not os.path.exists(self._parquet):
            return pd.DataFrame(columns=[*self.keys, "n", *self.sums])
        return pd.read_parquet(self._parquet)

    def update(self, partials: pd.DataFrame, run_id: str) -> bool:
        """Fold a run's per-key partials (columns: keys + n + sums) into the
        state; returns False (no-op) when ``run_id`` was already applied.
        Write is atomic (tmp + rename for both files, state first)."""
        runs = self.applied_runs()
        if run_id in runs:
            return False
        prior = self.read()
        cols = [*self.keys, "n", *self.sums]
        merged = (
            pd.concat([prior[cols] if len(prior) else prior, partials[cols]],
                      ignore_index=True)
            .groupby(self.keys, as_index=False)
            .sum()
        )
        for c in ("n", *self.sums):
            merged[c] = merged[c].astype("int64")
        merged = merged.sort_values(self.keys, ignore_index=True)
        tmp = self._parquet + f".tmp-{uuid.uuid4().hex}"
        merged.to_parquet(tmp, index=False)
        os.replace(tmp, self._parquet)
        tmp2 = self._runs_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp2, "w") as f:
            json.dump([*runs, run_id], f)
        os.replace(tmp2, self._runs_path)
        return True


def fold_run(ds, state: IncrementalAgg, run_id: str, cents_col: str = "value") -> bool:
    """One run of the maintenance pipeline: reduce the NEW Dataset to
    per-key integer partials (count + exact cents) and fold into ``state``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.relational import grouped_sums

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.fill_null(t[cents_col], 0.0), 100.0)), pa.int64()
        )
        cols = {k: t[k] for k in state.keys}
        cols["cents"] = cents
        return pa.table(cols)

    parts = grouped_sums(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        state.keys, {"cents": "cents"}, "n",
    ).to_pandas()
    for c in ("n", "cents"):
        parts[c] = parts[c].astype("int64")
    return state.update(parts, run_id)
