"""Windowed / session semantics over the bounded events stream.

Ray Data has no event-time windowing; per the batch equivalence in
SURVEY.md §2.9 we treat the events table as a partitioned log: hash-shuffle
by key, order by (ts, event_id) within the group, window with pandas inside
``groupby().map_groups``.  Tumbling windows are pure key arithmetic
(``events_per_hour`` in pipelines/queries.py); this module adds gap-based
session windows (the reference's only window is the blob-closing inactivity
timeout — ``blob_closing_processor.go:68-92`` — which is exactly a session
gap rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from .rounding import round_like_duckdb as _rd


def sessionize(
    events: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: float = 1800.0,
) -> Dataset:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap_seconds`` (order: ts, tiebreak).

    Output: one row per (key, session_id) with n_events, first/last event id.
    Partitioning assumption: all rows of one key co-locate via the groupby
    hash shuffle; within-group order is established by an explicit sort, so
    block arrival order never matters.
    """

    from .relational import bucketed_group_reduce

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized over ALL keys in the bucket: session breaks at key
        # change OR gap over threshold, session ids via per-key cumsum
        df = df.sort_values([key, ts_col, tiebreak_col], kind="stable")
        ts = df[ts_col].to_numpy(dtype="datetime64[ns]").astype("int64") / 1e9
        keys_arr = df[key].to_numpy()
        gaps = np.diff(ts, prepend=ts[0] if len(ts) else 0.0)
        key_change = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            key_change[1:] = keys_arr[1:] != keys_arr[:-1]
        new_sess = (key_change | (gaps > gap_seconds)).astype(np.int64)
        global_sess = np.cumsum(new_sess)  # distinct across keys
        df = df.assign(__gs=global_sess)
        g = df.groupby("__gs", sort=False)
        out = pd.DataFrame(
            {
                key: g[key].first().to_numpy(),
                "__gs": g.size().index,
                "n_events": g.size().to_numpy(),
                "first_event_id": g[tiebreak_col].min().to_numpy(),
                "last_event_id": g[tiebreak_col].max().to_numpy(),
            }
        )
        # renumber sessions 1..n within each key
        out = out.sort_values([key, "__gs"], kind="stable")
        out["session_id"] = out.groupby(key, sort=False).cumcount() + 1
        return out.drop(columns=["__gs"])[[key, "session_id", "n_events", "first_event_id", "last_event_id"]]

    return bucketed_group_reduce(events, [key], per_bucket)


def funnel_counts(
    events: Dataset,
    stages: list[str],
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Ordered funnel: how many users reach stage i — a ``stages[i]`` event
    STRICTLY AFTER their earliest qualifying ``stages[i-1]`` event (min-ts
    semantics, so the result is order-scan-free and deterministic under ts
    ties).  One hash exchange on ``key`` co-locates each user's events; the
    per-bucket pass is vectorized pandas over ALL users in the bucket
    (filter → merge-on-key → min), never a per-user Python loop.  Returns
    the final ``len(stages)``-row frame (per-bucket partials are summed
    driver-side — |stages| × num_buckets tiny rows)."""
    from .relational import bucketed_group_reduce

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cur = (
            df[df[type_col] == stages[0]]
            .groupby(key, as_index=False)[ts_col]
            .min()
            .rename(columns={ts_col: "__prev"})
        )
        counts = [len(cur)]
        for s in stages[1:]:
            nxt = df.loc[df[type_col] == s, [key, ts_col]].merge(cur, on=key)
            cur = (
                nxt.loc[nxt[ts_col] > nxt["__prev"]]
                .groupby(key, as_index=False)[ts_col]
                .min()
                .rename(columns={ts_col: "__prev"})
            )
            counts.append(len(cur))
        return pd.DataFrame(
            {"stage": np.arange(1, len(stages) + 1, dtype=np.int64),
             "event_type": stages, "users": np.asarray(counts, dtype=np.int64)}
        )

    partials = bucketed_group_reduce(events, [key], per_bucket).to_pandas()
    out = partials.groupby(["stage", "event_type"], as_index=False)["users"].sum()
    return out.astype({"stage": "int64", "users": "int64"})


def cohort_retention(
    events: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604_800,
) -> pd.DataFrame:
    """Cohort retention matrix: cohort = each user's first activity period,
    cell (cohort, offset) = distinct users of that cohort active
    ``offset`` periods later.  Pipeline: per-batch DISTINCT (user, period)
    combiner (Arrow hash group_by — the exchange moves unique pairs, not
    events), one hash exchange on ``key``, vectorized transform('min') per
    bucket, tiny driver sum (≤ periods² rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import bucketed_group_reduce

    period_us = period_seconds * 1_000_000

    def distinct_pairs(t: pa.Table) -> pa.Table:
        micros = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        w = pc.divide(micros, pa.scalar(period_us, pa.int64()))
        return (
            pa.table({key: t[key], "__w": w}).group_by([key, "__w"]).aggregate([])
        )

    pairs = events.map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([key, "__w"])
        first = df.groupby(key)["__w"].transform("min")
        out = pd.DataFrame({"cohort_week": first, "week_offset": df["__w"] - first})
        return out.groupby(["cohort_week", "week_offset"], as_index=False).size().rename(
            columns={"size": "users"}
        )

    partials = bucketed_group_reduce(pairs, [key], per_bucket).to_pandas()
    out = partials.groupby(["cohort_week", "week_offset"], as_index=False)["users"].sum()
    return out.astype({"cohort_week": "int64", "week_offset": "int64", "users": "int64"})


def lag_gap_stats(
    events: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Distributed LAG(): per event type, stats over the gap between each
    event and the SAME user's previous event (order: ts, tiebreak) — the
    window-function shape ``x - LAG(x) OVER (PARTITION BY key ORDER BY ts)``
    without a global sort: one hash exchange co-locates each key's rows,
    the per-bucket pass sorts ONCE for all keys in the bucket and diffs
    vectorized; only |types| partial rows (n, sum_us, max_us) leave each
    bucket, folded exactly in int64 microseconds (no float drift between
    partials).
    """
    from .relational import bucketed_group_reduce

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tiebreak_col], kind="stable")
        ts_us = df[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        keys_arr = df[key].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = keys_arr[1:] == keys_arr[:-1]
        gap = np.zeros(len(df), dtype="int64")
        if len(df) > 1:
            gap[1:] = ts_us[1:] - ts_us[:-1]
        sub = pd.DataFrame({type_col: df[type_col].to_numpy()[same], "gap_us": gap[same]})
        g = sub.groupby(type_col)["gap_us"]
        return pd.DataFrame(
            {
                type_col: g.count().index,
                "n": g.count().to_numpy(),
                "sum_us": g.sum().to_numpy(),
                "max_us": g.max().to_numpy(),
            }
        )

    partials = bucketed_group_reduce(events, [key], per_bucket).to_pandas()
    agg = partials.groupby(type_col, as_index=False).agg(
        n_gaps=("n", "sum"), sum_us=("sum_us", "sum"), max_us=("max_us", "max")
    )
    agg["avg_gap_s"] = (agg["sum_us"] / 1_000_000.0 / agg["n_gaps"]).pipe(_rd)
    agg["max_gap_s"] = (agg["max_us"] / 1_000_000.0).pipe(_rd)
    out = agg[[type_col, "n_gaps", "avg_gap_s", "max_gap_s"]].sort_values(type_col)
    return out.astype({"n_gaps": "int64"}).reset_index(drop=True)


def transition_matrix(
    events: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Per-key Markov transitions: counts and row-normalized probability of
    consecutive (prev_type → next_type) event pairs within each key's
    ts-ordered stream.  Same single-exchange shape as :func:`lag_gap_stats`;
    each bucket emits ≤ |types|² pair-count partials, the driver folds them
    and normalizes the tiny matrix.
    """
    from .relational import bucketed_group_reduce

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, tiebreak_col], kind="stable")
        keys_arr = df[key].to_numpy()
        types = df[type_col].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = keys_arr[1:] == keys_arr[:-1]
        pairs = pd.DataFrame(
            {"prev_type": np.roll(types, 1)[same], "next_type": types[same]}
        )
        return pairs.groupby(["prev_type", "next_type"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    partials = bucketed_group_reduce(events, [key], per_bucket).to_pandas()
    out = partials.groupby(["prev_type", "next_type"], as_index=False)["n"].sum()
    out["p"] = (out["n"] / out.groupby("prev_type")["n"].transform("sum")).pipe(_rd, 9)
    out = out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    return out.astype({"n": "int64"})


def range_window_peak(
    events: Dataset,
    key: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    out_name: str = "max_burst",
) -> pd.DataFrame:
    """Time-RANGE frame window (``COUNT(*) OVER (PARTITION BY key ORDER BY
    ts RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW)``), reduced to
    each key's PEAK value — "most events any sliding w-window ever held".

    Unlike the ROWS frame this is value-based: the frame holds every row
    with ``ts ∈ [ts_i − w, ts_i]`` INCLUDING peers of the current row
    (rows sharing ts_i) — SQL RANGE semantics, matched exactly.

    One hash exchange on ``key``; per bucket the counts for ALL keys
    resolve in two vectorized ``np.searchsorted`` calls: timestamps are
    remapped to per-key disjoint bands (``ts + key_index · span``) so one
    GLOBAL binary search respects key boundaries — no per-key loop.
    """
    from .relational import bucketed_group_reduce

    win_us = np.int64(window_seconds) * 1_000_000

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="stable")
        ts_us = df[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        keys_arr = df[key].to_numpy()
        # dense key index in sorted order
        new_key = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            new_key[1:] = keys_arr[1:] != keys_arr[:-1]
        kidx = np.cumsum(new_key) - 1
        span = np.int64(ts_us.max() - ts_us.min() + win_us + 2) if len(df) else np.int64(1)
        mapped = (ts_us - ts_us.min()) + kidx * span
        right = np.searchsorted(mapped, mapped, side="right")
        left = np.searchsorted(mapped, mapped - win_us, side="left")
        c = right - left
        out = pd.DataFrame({key: keys_arr, out_name: c})
        return out.groupby(key, as_index=False)[out_name].max()

    out = bucketed_group_reduce(events, [key], per_bucket).to_pandas()
    return out.sort_values(key, ignore_index=True).astype({out_name: "int64"})


def linear_attribution(
    events,
    window_us: int = 24 * 3_600_000_000,
    key: str = "user_id",
) -> "pd.DataFrame":
    """Multi-touch LINEAR attribution with integer-exact credit: every
    purchase's value (in cents) is split across the user's view events in
    the strictly-preceding ``window_us`` — each view gets cents // n and the
    EARLIEST view (ts, then event_id) takes the remainder, so credits are
    integers that sum exactly to the purchase and no float order can drift.

    One user-bucketed exchange; inside each bucket the per-purchase view
    windows come from two searchsorted calls and the view-expansion is the
    vectorized repeat/cumsum range trick — no per-purchase Python.
    Returns hour-of-day → (n_views credited, attributed_cents)."""
    import pandas as pd

    from .relational import bucketed_group_reduce

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_h, out_n, out_c = [], [], []
        for _, g in df.groupby(key, sort=False):
            v = g[g["event_type"] == "view"].sort_values(["ts_us", "event_id"])
            p = g[g["event_type"] == "purchase"]
            if not len(v) or not len(p):
                continue
            vts = v["ts_us"].to_numpy(np.int64)
            vhr = ((vts // 3_600_000_000) % 24).astype(np.int64)
            pts = p["ts_us"].to_numpy(np.int64)
            cents = p["cents"].to_numpy(np.int64)
            lo = np.searchsorted(vts, pts - window_us, side="left")
            hi = np.searchsorted(vts, pts, side="left")
            n = hi - lo
            keep = n > 0
            lo, hi, n, cents = lo[keep], hi[keep], n[keep], cents[keep]
            if not len(n):
                continue
            # expand [lo_i, hi_i) ranges: repeat/cumsum trick
            total = int(n.sum())
            idx = np.repeat(lo, n) + (
                np.arange(total) - np.repeat(np.cumsum(n) - n, n)
            )
            base = np.repeat(cents // n, n)
            credit = base.copy()
            firsts = np.cumsum(n) - n  # position of each purchase's first view
            credit[firsts] += cents % n
            hrs = vhr[idx]
            out_h.append(hrs)
            out_n.append(np.ones(total, dtype=np.int64))
            out_c.append(credit)
        if not out_h:
            return pd.DataFrame({"hour": pd.Series(dtype="int64"),
                                 "n_views": pd.Series(dtype="int64"),
                                 "attributed_cents": pd.Series(dtype="int64")})
        part = pd.DataFrame(
            {"hour": np.concatenate(out_h), "n_views": np.concatenate(out_n),
             "attributed_cents": np.concatenate(out_c)}
        )
        return part.groupby("hour", as_index=False).sum()

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["view", "purchase"]))
        t = t.filter(keep)
        # normalize to µs whatever the input unit (parquet is us, pandas ns)
        ts_us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(pc.fill_null(t["value"], 0.0), 100.0)), pa.int64()
        )
        return pa.table(
            {
                key: t[key],
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "ts_us": ts_us,
                "cents": cents,
            }
        )

    prepped = events.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    agg = bucketed_group_reduce(prepped, [key], per_bucket).to_pandas()
    if not len(agg) or "hour" not in agg.columns:
        return pd.DataFrame({"hour": pd.Series(dtype="int64"),
                             "n_views": pd.Series(dtype="int64"),
                             "attributed_cents": pd.Series(dtype="int64")})
    return (
        agg.groupby("hour", as_index=False)
        .sum()
        .sort_values("hour", ignore_index=True)
        .astype({"hour": "int64", "n_views": "int64", "attributed_cents": "int64"})
    )
