"""Randomized oracle tests, part 4: the round-4 session-4 operator families
(interval join, CDC merge, SymSpell join, Feistel shuffle, Mann-Whitney,
Theil-Sen, KS+BH FDR, conformal, IPS) on random inputs with planted edge
cases, Ray vs DuckDB on the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

WORDS = ["spark", "query", "vector", "hash", "join", "table", "scan", "merge",
         "lorem", "ipsum", "delta", "gamma"]

EVENT_QUERIES = [
    "interval_overlap_join",
    "upsert_merge",
    "feistel_permutation",
    "mannwhitney_u",
    "theilsen_trend",
    "ips_policy_value",
    "watermark_late_events",
    "schema_drift_audit",
    "group_sequential_ab",
    "compaction_plan",
]


def _run(name: str, d: str, con) -> None:
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    problems = compare(name, got, want)
    assert not problems, problems


def random_events4(seed: int, n: int = 2500) -> pa.Table:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01").value // 1000  # µs; spans the merge cutoff
    ts_us = base + rng.integers(0, 30 * 24 * 3600, size=n).astype(np.int64) * 1_000_000
    ts_us[:4] = ts_us[4]  # planted equal timestamps
    vals = np.round(rng.uniform(0, 50, size=n), 2)
    vals[: n // 5] = 7.0  # heavy value ties (Mann-Whitney tie correction)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(1, 60, size=n).astype(np.int64)),
            "event_type": pa.array(
                rng.choice(["view", "purchase", "click", "error", "signup"], size=n)
            ),
            "value": pa.array(vals),
            "props": pa.array(["" for _ in range(n)]),
        }
    )


@pytest.mark.parametrize("seed", [5, 41])
@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_random_events4(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"r4ev{seed}")
    pq.write_table(random_events4(seed), str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run(name, str(d), con)


@pytest.mark.parametrize("seed", [8, 23])
def test_random_ks_fdr(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n = 300
    src = rng.integers(0, 6, size=n)
    n_chars = rng.integers(40, 400, size=n).astype(np.int64)
    n_chars[src == 2] += 400  # planted drifted source → a real discovery
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x" for _ in range(n)]),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"s{int(x)}" for x in src]),
            "n_chars": pa.array(n_chars),
        }
    )
    d = tmp_path_factory.mktemp(f"r4ks{seed}")
    pq.write_table(t, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    _run("ks_fdr_audit", str(d), con)
    got = REGISTRY["ks_fdr_audit"].fn(str(d))
    assert bool(got.loc[got["source"] == "s2", "discovery"].iloc[0])


@pytest.mark.parametrize("seed", [12, 33])
def test_random_conformal(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n_orders = 400
    okeys = np.arange(1, n_orders + 1, dtype=np.int64)
    li_keys = np.repeat(okeys, rng.integers(1, 7, size=n_orders))
    counts = pd.Series(li_keys).value_counts().sort_index()
    price = np.round(counts.to_numpy() * 120.0 + rng.normal(0, 40, size=n_orders), 2)
    orders = pa.table(
        {
            "o_orderkey": pa.array(okeys),
            "o_totalprice": pa.array(np.abs(price)),
        }
    )
    lineitem = pa.table({"l_orderkey": pa.array(li_keys)})
    d = tmp_path_factory.mktemp(f"r4cf{seed}")
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _run("conformal_interval", str(d), con)
    got = REGISTRY["conformal_interval"].fn(str(d))
    # finite-sample marginal coverage should land near 1-α on iid noise
    assert 0.75 <= got["coverage"].iloc[0] <= 1.0


@pytest.mark.parametrize("seed", [7, 29])
def test_random_symspell(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n = 160
    names = [
        " ".join(rng.choice(WORDS, size=int(rng.integers(2, 4)))) for _ in range(n)
    ]
    part = pa.table(
        {
            "p_partkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "p_name": pa.array(names),
            "p_brand": pa.array(["b"] * n),
            "p_type": pa.array(["t"] * n),
            "p_size": pa.array(np.ones(n, dtype=np.int32)),
            "p_retailprice": pa.array(np.ones(n)),
        }
    )
    d = tmp_path_factory.mktemp(f"r4sy{seed}")
    pq.write_table(part, str(d / "part.parquet"))
    con = duckdb.connect()
    _run("symspell_edit1_join", str(d), con)


class TestWave2Math:
    def test_mannwhitney_matches_brute_force(self, ray_session, tmp_path_factory):
        rng = np.random.default_rng(99)
        n = 400
        t = random_events4(99, n)
        d = tmp_path_factory.mktemp("mwu")
        pq.write_table(t, str(d / "events.parquet"))
        got = REGISTRY["mannwhitney_u"].fn(str(d))
        df = t.to_pandas()
        vc = (df["value"] * 100).round().astype("int64").to_numpy()
        for _, row in got.iterrows():
            g1 = vc[df["event_type"].to_numpy() == row["event_type"]]
            g2 = vc[df["event_type"].to_numpy() != row["event_type"]]
            # brute U: #(x>y) + 0.5·#(x==y) over all cross pairs
            gt = (g1[:, None] > g2[None, :]).sum()
            eq = (g1[:, None] == g2[None, :]).sum()
            u_brute = gt + 0.5 * eq
            assert abs(row["u"] - u_brute) < 0.51  # row u is rounded to 1 digit

    def test_theilsen_outlier_robust(self, ray_session, tmp_path_factory):
        # perfect +3/day trend with one wrecked day: median slope stays 3
        days = np.arange(20, dtype=np.int64)
        rows = []
        eid = 0
        base = pd.Timestamp("2024-01-01").value // 1000
        for dday in days:
            cnt = 10 + 3 * int(dday)
            if dday == 9:
                cnt = 500  # outlier day
            for _ in range(cnt):
                rows.append((eid, base + dday * 86_400_000_000 + eid % 1000, 1,
                             "view", 1.0, ""))
                eid += 1
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype=np.int64), pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows]),
                "props": pa.array([r[5] for r in rows]),
            }
        )
        d = tmp_path_factory.mktemp("ts_rob")
        pq.write_table(t, str(d / "events.parquet"))
        got = REGISTRY["theilsen_trend"].fn(str(d))
        assert abs(got.loc[got["event_type"] == "view", "slope"].iloc[0] - 3.0) < 0.2

    def test_bh_adjustment_known_case(self):
        # classic BH example: p = (.01, .02, .03, .04, .05) with M=5
        from commerce_logs_pipeline_ray.pipelines.queries import _BH_ALPHA  # noqa: F401

        p = np.array([0.01, 0.04, 0.03, 0.02, 0.05])
        order = np.argsort(p, kind="stable")
        ranked = p[order] * len(p) / np.arange(1, len(p) + 1)
        adj = np.minimum(np.minimum.accumulate(ranked[::-1])[::-1], 1.0)
        out = np.empty_like(adj)
        out[order] = adj
        np.testing.assert_allclose(out, [0.05, 0.05, 0.05, 0.05, 0.05])

    def test_ips_hand_case(self, ray_session, tmp_path_factory):
        # users chosen so the md5 policy rule is known per user
        import hashlib

        users = list(range(1, 30))
        pol = {
            u: "purchase"
            if hashlib.md5(f"{u}:policy".encode()).hexdigest()[0] in "01234567"
            else "view"
            for u in users
        }
        rows = []
        base = pd.Timestamp("2024-01-05").value // 1000
        for i, u in enumerate(users):
            rows.append((i, base + i, u, "purchase", 10.0, ""))
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype=np.int64), pa.timestamp("us")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows]),
                "props": pa.array([r[5] for r in rows]),
            }
        )
        d = tmp_path_factory.mktemp("ips")
        pq.write_table(t, str(d / "events.parquet"))
        got = REGISTRY["ips_policy_value"].fn(str(d))
        row = got[got["event_type"] == "purchase"].iloc[0]
        n_match = sum(1 for u in users if pol[u] == "purchase")
        assert row["n_a"] == len(users)
        assert row["n_match"] == n_match
        assert abs(row["ips_term"] - (10.0 * n_match) / len(users)) < 1e-6


@pytest.mark.parametrize("seed", [11, 37])
def test_random_ldiv_bloom(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n_cust, n_orders = 120, 500
    customer = pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n_cust + 1, dtype=np.int64)),
            "c_mktsegment": pa.array(rng.choice(["B", "A", "M"], size=n_cust)),
            "c_nationkey": pa.array(rng.integers(0, 6, size=n_cust).astype(np.int64)),
        }
    )
    base = pd.Timestamp("2024-01-01").value // 1000
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n_orders + 1, dtype=np.int64)),
            # only HALF the customers order → real bloom negatives
            "o_custkey": pa.array(
                rng.integers(1, n_cust // 2 + 1, size=n_orders).astype(np.int64)
            ),
            "o_orderdate": pa.array(
                base + rng.integers(0, 10 * 86400, size=n_orders).astype(np.int64)
                * 1_000_000,
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(rng.choice(["1-U", "2-H", "3-M"], size=n_orders)),
            "o_totalprice": pa.array(np.round(rng.uniform(10, 900, n_orders), 2)),
        }
    )
    d = tmp_path_factory.mktemp(f"r4lb{seed}")
    pq.write_table(customer, str(d / "customer.parquet"))
    pq.write_table(orders, str(d / "orders.parquet"))
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _run("l_diversity_audit", str(d), con)
    _run("bloom_fp_audit", str(d), con)
    got = REGISTRY["bloom_fp_audit"].fn(str(d))
    assert got["n_neg_probes"].iloc[0] >= n_cust  # shifted twins + non-orderers


@pytest.mark.parametrize("seed", [14, 44])
def test_random_wave5_events(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"r4w5e{seed}")
    pq.write_table(random_events4(seed), str(d / "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run("sliding_p95_value", str(d), con)
    _run("seasonal_dow_decompose", str(d), con)


@pytest.mark.parametrize("seed", [16, 48])
def test_random_wave5_docs(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    n = 200
    texts = [" ".join(rng.choice(WORDS, size=int(rng.integers(5, 30))))
             for _ in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 5, size=n)]),
            "n_chars": pa.array([len(t_) for t_ in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp(f"r4w5d{seed}")
    pq.write_table(t, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    _run("quantile_normalize", str(d), con)
    _run("doremi_mixture_step", str(d), con)


@pytest.mark.parametrize("seed", [19, 52])
def test_random_link_prediction(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed)
    # few orders over a small part pool → plenty of repeated (strong) pairs
    n_li = 900
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(rng.integers(1, 120, size=n_li).astype(np.int64)),
            "l_partkey": pa.array(rng.integers(1, 40, size=n_li).astype(np.int64)),
        }
    )
    d = tmp_path_factory.mktemp(f"r4lp{seed}")
    pq.write_table(lineitem, str(d / "lineitem.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    _run("link_prediction_jaccard", str(d), con)
