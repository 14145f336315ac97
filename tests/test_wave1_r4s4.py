"""Round-4 session-4 wave-1 operators: interval overlap join, CDC
upsert-merge, SymSpell edit-1 join, Feistel format-preserving shuffle —
planted-truth unit tests (the registry queries carry the DuckDB oracles)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from commerce_logs_pipeline_ray.functions.intervals import (
    CELL_US,
    interval_overlap_join,
)
from commerce_logs_pipeline_ray.functions.linkage import symspell_edit1_join
from commerce_logs_pipeline_ray.functions.merge_cdc import (
    combine_events,
    merge_state,
)
from commerce_logs_pipeline_ray.functions.permute import (
    feistel_permute,
    feistel_sql_expr,
)

HOUR = CELL_US


def _iv_ds(rows):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["day", "item", "s", "e"])
    ).repartition(3)


def brute_overlap(rows):
    out = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[0] != b[0] or a[1] == b[1]:
                continue
            ov = min(a[3], b[3]) - max(a[2], b[2])
            if ov > 0:
                d = out.setdefault(a[0], [0, 0, 0])
                d[0] += 1
                d[1] += ov
                d[2] = max(d[2], ov)
    return out


class TestIntervalOverlap:
    def test_matches_brute_force_across_cells(self):
        # intervals spanning multiple hour cells; overlaps that start in a
        # LATER cell than either interval's own start (dedup correctness)
        rows = [
            (0, 1, 0, 3 * HOUR),
            (0, 2, HOUR // 2, 2 * HOUR),          # overlaps item 1 across 2 cells
            (0, 3, 2 * HOUR + 5, 4 * HOUR),       # overlap with 1 starts in cell 2
            (0, 4, 5 * HOUR, 6 * HOUR),           # disjoint from all
            (1, 1, 10, 20),                        # different day: never pairs with day 0
            (1, 5, 15, 40),
        ]
        got = interval_overlap_join(_iv_ds(rows), "day")
        want = brute_overlap(rows)
        assert set(got["day"]) == set(want)
        for _, r in got.iterrows():
            n, tot, mx = want[r["day"]]
            assert (r["n_pairs"], r["total_overlap_us"], r["max_overlap_us"]) == (
                n,
                tot,
                mx,
            )

    def test_touching_intervals_do_not_pair(self):
        rows = [(0, 1, 0, HOUR), (0, 2, HOUR, 2 * HOUR)]  # share one instant
        got = interval_overlap_join(_iv_ds(rows), "day")
        assert got["n_pairs"].sum() == 0 if len(got) else True

    def test_pair_counted_once_despite_many_shared_cells(self):
        rows = [(0, 1, 0, 30 * HOUR), (0, 2, 0, 30 * HOUR)]
        got = interval_overlap_join(_iv_ds(rows), "day")
        assert got["n_pairs"].tolist() == [1]
        assert got["total_overlap_us"].tolist() == [30 * HOUR]


def _state_df(rows):
    return pd.DataFrame(
        rows,
        columns=["key", "last_ts_us", "last_type", "total_value_c", "n_events", "tomb"],
    )


class TestUpsertMerge:
    def test_insert_update_delete(self):
        snap = _state_df(
            [
                (1, 100, "view", 500, 3, False),
                (2, 90, "click", 200, 1, False),
                (3, 80, "view", 900, 2, False),
            ]
        )
        delta_raw = pd.DataFrame(
            {
                "user_id": [1, 1, 4, 3],
                "ts": pd.to_datetime([200, 150, 50, 120], unit="us"),
                "event_type": ["purchase", "view", "signup", "error"],
                "value": [2.5, 1.0, 0.0, 0.0],
                "del_flag": [False, False, False, True],
            }
        )
        partials = combine_events(
            delta_raw, "user_id", "ts", "event_type", "value", "del_flag"
        )
        merged = (
            merge_state(
                rd.from_pandas(_state_df([]) if snap is None else snap),
                rd.from_pandas(partials),
            )
            .to_pandas()
            .sort_values("key", ignore_index=True)
        )
        # key 3 tombstoned; key 4 inserted; key 1 folded with last-writer ts
        assert merged["key"].tolist() == [1, 2, 4]
        k1 = merged[merged["key"] == 1].iloc[0]
        assert k1["last_ts_us"] == 200 and k1["last_type"] == "purchase"
        assert k1["total_value_c"] == 500 + 350 and k1["n_events"] == 5
        k4 = merged[merged["key"] == 4].iloc[0]
        assert k4["n_events"] == 1 and k4["last_type"] == "signup"

    def test_combiner_last_writer_within_block(self):
        df = pd.DataFrame(
            {
                "u": [7, 7],
                "ts": pd.to_datetime([5, 9], unit="us"),
                "et": ["a", "b"],
                "v": [1.0, 2.0],
            }
        )
        got = combine_events(df, "u", "ts", "et", "v")
        assert got.iloc[0]["last_type"] == "b"
        assert got.iloc[0]["total_value_c"] == 300


class TestSymspell:
    def test_exact_recall_and_false_candidate_prune(self):
        names = {
            10: "alpha",
            11: "alpba",  # sub → d=1 to alpha (shares deletion key)
            12: "alph",   # deletion → d=1 to alpha
            13: "ab",
            14: "ba",     # shares del-keys with "ab" but d=2: must be pruned
            15: "zzzzz",  # isolated
        }
        ds = rd.from_pandas(
            pd.DataFrame({"rec_id": list(names), "name": list(names.values())})
        ).repartition(2)
        got = symspell_edit1_join(ds).to_pandas()
        pairs = set(zip(got["id_a"], got["id_b"]))
        assert (10, 11) in pairs and (10, 12) in pairs
        assert (13, 14) not in pairs
        assert all(d <= 1 for d in got["dist"])
        # exact recall: brute-force reference over the same dictionary
        import itertools

        def lev1(a, b):
            if a == b:
                return True
            la, lb = len(a), len(b)
            if abs(la - lb) > 1:
                return False
            if la == lb:
                return sum(x != y for x, y in zip(a, b)) == 1
            if la > lb:
                a, b, la, lb = b, a, lb, la
            i = 0
            while i < la and a[i] == b[i]:
                i += 1
            return a[i:] == b[i + 1 :]

        want = {
            (i, j)
            for i, j in itertools.combinations(sorted(names), 2)
            if lev1(names[i], names[j])
        }
        assert pairs == want


class TestFeistel:
    def test_bijection_full_domain(self):
        k = 8
        x = np.arange(1 << (2 * k), dtype=np.int64)
        y = feistel_permute(x, 0, seed=3, k=k)
        assert y.min() == 0 and y.max() == (1 << (2 * k)) - 1
        assert len(np.unique(y)) == len(x)

    def test_seed_changes_order(self):
        x = np.arange(4096, dtype=np.int64)
        assert not np.array_equal(
            feistel_permute(x, 0, seed=1, k=6), feistel_permute(x, 0, seed=2, k=6)
        )

    def test_sql_expr_matches_numpy(self):
        import duckdb

        x = np.arange(5000, dtype=np.int64) * 7 + 3
        want = feistel_permute(x, 0, seed=7, k=16)
        expr = feistel_sql_expr("v", 0, seed=7, k=16)
        con = duckdb.connect()
        con.register("xs", pd.DataFrame({"i": np.arange(len(x)), "v": x}))
        got = (
            con.execute(f"SELECT {expr} AS y FROM xs ORDER BY i")
            .df()["y"]
            .to_numpy()
        )
        np.testing.assert_array_equal(got, want)
