"""Randomized oracle tests, part 6: the session-5 wave-9 family (Count-Min
audit, Spearman/Kendall rank statistics, OLAP cube, MLM masking layout,
decayed heavy hitters, HITS, consistent-hash rebalance) on random inputs
with planted edge cases, Ray vs DuckDB on the same corpus."""

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
         "lorem", "ipsum", "delta", "gamma", "batch", "index"]


def _run(name: str, d: str, con) -> None:
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    problems = compare(name, got, want)
    assert not problems, problems


def _con_for(d, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return con


def _events_table(seed: int, n: int = 3000, weeks: int = 12) -> pa.Table:
    rng = np.random.default_rng(seed)
    # zipf-ish heavy user + >9-week span to hit the decay clamp
    users = rng.integers(1, 400, size=n).astype(np.int64)
    users[: n // 10] = 7  # planted heavy hitter
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, weeks * 7 * 86_400_000_000, size=n)
    ts[0] = base  # oldest: age > 9 weeks → clamped weight
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(users),
        "event_type": pa.array(
            np.asarray(["view", "purchase", "error"], dtype=object)[
                rng.integers(0, 3, size=n)]),
        "value": pa.array(np.round(rng.uniform(0, 50, size=n), 2)),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [5, 23])
@pytest.mark.parametrize("name", ["count_min_audit", "decayed_topk_users"])
def test_random_events_wave9(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w9ev{seed}")
    pq.write_table(_events_table(seed), str(d / "events.parquet"))
    _run(name, str(d), _con_for(d, ["events"]))


def _lineitem_table(seed: int, n: int = 4000) -> pa.Table:
    rng = np.random.default_rng(seed)
    q = rng.integers(1, 51, size=n).astype(np.float64)
    q[:200] = 7.0  # planted tie run in quantity
    price = np.round(rng.uniform(900, 105000, size=n), 2)
    price[:50] = 1234.56  # planted tie run in price
    disc = np.round(rng.integers(0, 11, size=n) / 100.0, 2)
    return pa.table({
        "l_orderkey": pa.array(rng.integers(1, 500, size=n).astype(np.int64)),
        "l_partkey": pa.array(rng.integers(1, 80, size=n).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(1, 40, size=n).astype(np.int64)),
        "l_linenumber": pa.array(rng.integers(1, 7, size=n).astype(np.int32)),
        "l_quantity": pa.array(q),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(disc),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, size=n), 2)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(
            np.full(n, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
    })


def _orders_table(seed: int, n: int = 600) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    days = rng.integers(0, 6 * 365, size=n).astype(np.int64)
    base = pd.Timestamp("2019-01-01").value // 1000
    return pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(1, 120, size=n).astype(np.int64)),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 400000, size=n), 2)),
        "o_orderdate": pa.array(base + days * 86_400_000_000).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.asarray([f"{i}-P" for i in range(1, 6)], dtype=object)[
                rng.integers(0, 5, size=n)]),
    })


@pytest.mark.parametrize("seed", [9, 31])
@pytest.mark.parametrize("name", ["spearman_qty_price", "kendall_tau_qty_disc"])
def test_random_rank_stats(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w9li{seed}")
    pq.write_table(_lineitem_table(seed), str(d / "lineitem.parquet"))
    _run(name, str(d), _con_for(d, ["lineitem"]))


@pytest.mark.parametrize("seed", [13])
def test_random_hits(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w9h{seed}")
    pq.write_table(_lineitem_table(seed), str(d / "lineitem.parquet"))
    pq.write_table(_orders_table(seed), str(d / "orders.parquet"))
    _run("hits_scores", str(d), _con_for(d, ["lineitem", "orders"]))


@pytest.mark.parametrize("seed", [17])
def test_random_cube(seed, ray_session, tmp_path_factory):
    rng = np.random.default_rng(seed + 2)
    d = tmp_path_factory.mktemp(f"w9c{seed}")
    pq.write_table(_orders_table(seed), str(d / "orders.parquet"))
    ncust = 120
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(1, ncust + 1, dtype=np.int64)),
        "c_nationkey": pa.array(rng.integers(0, 6, size=ncust).astype(np.int64)),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(6, dtype=np.int64)),
        "n_regionkey": pa.array((np.arange(6) % 3).astype(np.int64)),
    }), str(d / "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(3, dtype=np.int64)),
        "r_name": pa.array(["AMERICA", "ASIA", "EUROPE"]),
    }), str(d / "region.parquet"))
    _run("cube_revenue", str(d),
         _con_for(d, ["orders", "customer", "nation", "region"]))


def _docs_table(seed: int, n: int = 300) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(WORDS, size=int(rng.integers(6, 40))))
        for _ in range(n)
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 4, size=n)]),
    })


@pytest.mark.parametrize("seed", [19, 41])
@pytest.mark.parametrize("name", ["ring_rebalance", "mlm_mask_stats"])
def test_random_docs_wave9(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w9d{seed}")
    pq.write_table(_docs_table(seed), str(d / "documents.parquet"))
    _run(name, str(d), _con_for(d, ["documents"]))


def test_cms_overcount_property(ray_session, tmp_path_factory):
    """CMS estimates can never undercount: overcount >= 0 for every row."""
    d = tmp_path_factory.mktemp("w9prop")
    pq.write_table(_events_table(3), str(d / "events.parquet"))
    out = REGISTRY["count_min_audit"].fn(str(d))
    assert (out["overcount"] >= 0).all()
    assert (out["cms_est"] >= out["exact_n"]).all()


def test_ring_minimal_movement(ray_session, tmp_path_factory):
    """Removing one shard moves ONLY its docs: n_after - n_before equals the
    moved-in count for every surviving shard, and totals are conserved."""
    d = tmp_path_factory.mktemp("w9ring")
    pq.write_table(_docs_table(7, n=500), str(d / "documents.parquet"))
    out = REGISTRY["ring_rebalance"].fn(str(d))
    s0 = out[out["shard"] == "s0"].iloc[0]
    assert s0["n_after"] == 0 and s0["n_moved_in"] == 0
    rest = out[out["shard"] != "s0"]
    assert (rest["n_after"] - rest["n_before"] == rest["n_moved_in"]).all()
    assert out["n_before"].sum() == out["n_after"].sum() == 500
    assert rest["n_moved_in"].sum() == s0["n_before"]
