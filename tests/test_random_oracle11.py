"""Randomized oracle tests, part 11: the wave-18 family (DeepWalk walk
corpus, Pareto layer peeling) on random inputs with planted edge cases —
degree-1 nodes (forced backtracking walks), a star hub, duplicate
(price, date) orders on the frontier, and a strictly-dominated chain whose
layer assignment is known in closed form — Ray vs DuckDB on the same
corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare


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


def _lineitem(seed: int, n: int = 2200) -> pa.Table:
    rng = np.random.default_rng(seed)
    ok = rng.integers(1, 400, size=n).astype(np.int64)
    pk = rng.integers(1, 70, size=n).astype(np.int64)
    # planted: pendant node 900 attached only to hub 901 (degree-1 walk must
    # bounce), and hub 901 co-purchased with 902..909 (a star)
    extra_ok, extra_pk = [], []
    extra_ok += [9000, 9000]
    extra_pk += [900, 901]
    for i, p in enumerate(range(902, 910)):
        extra_ok += [9001 + i, 9001 + i]
        extra_pk += [901, p]
    return pa.table({
        "l_orderkey": pa.array(np.concatenate([ok, np.array(extra_ok, np.int64)])),
        "l_partkey": pa.array(np.concatenate([pk, np.array(extra_pk, np.int64)])),
        "l_suppkey": pa.array(np.ones(n + len(extra_ok), np.int64)),
        "l_linenumber": pa.array(np.ones(n + len(extra_ok), np.int32)),
        "l_quantity": pa.array(np.ones(n + len(extra_ok))),
        "l_extendedprice": pa.array(np.full(n + len(extra_ok), 100.0)),
        "l_discount": pa.array(np.zeros(n + len(extra_ok))),
        "l_tax": pa.array(np.zeros(n + len(extra_ok))),
        "l_returnflag": pa.array(["N"] * (n + len(extra_ok))),
        "l_linestatus": pa.array(["O"] * (n + len(extra_ok))),
        "l_shipdate": pa.array(
            np.full(n + len(extra_ok), 1_700_000_000_000_000, np.int64)
        ).cast(pa.timestamp("us")),
    })


def _orders(seed: int, n: int = 900) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    price = np.round(rng.uniform(1000, 400000, size=n), 2)
    price[:6] = 399999.99  # duplicate top prices: price-class tie handling
    base = pd.Timestamp("2020-01-01").value // 1000
    days = rng.integers(0, 1500, size=n).astype(np.int64)
    days[:3] = 0  # duplicate (price, date) rows all survive on the frontier
    return pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(1, 120, size=n).astype(np.int64)),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(base + days * 86_400_000_000).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-P"] * n),
    })


@pytest.mark.parametrize("seed", [37, 79])
def test_random_walk_corpus(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w18rw{seed}")
    pq.write_table(_lineitem(seed), str(d / "lineitem.parquet"))
    _run("random_walk_corpus", str(d), _con_for(d, ["lineitem"]))


@pytest.mark.parametrize("seed", [41, 83])
def test_random_pareto_layers(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w18pl{seed}")
    pq.write_table(_orders(seed), str(d / "orders.parquet"))
    _run("pareto_layers", str(d), _con_for(d, ["orders"]))


def test_pareto_layers_planted_chain(ray_session, tmp_path_factory):
    """A strictly-dominated chain (price decreasing, date increasing) has
    exactly one point per layer: point k sits on layer k."""
    d = tmp_path_factory.mktemp("w18plc")
    n = 6
    base = pd.Timestamp("2020-01-01").value // 1000
    t = pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "o_custkey": pa.array(np.ones(n, np.int64)),
        "o_orderstatus": pa.array(["O"] * n),
        "o_totalprice": pa.array([1000.0 - 10 * k for k in range(n)]),
        "o_orderdate": pa.array(
            [base + k * 86_400_000_000 for k in range(n)]
        ).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-P"] * n),
    })
    pq.write_table(t, str(d / "orders.parquet"))
    out = REGISTRY["pareto_layers"].fn(str(d))
    assert out["n_orders"].tolist() == [1, 1, 1]
    assert out["orderkey_sum"].tolist() == [1, 2, 3]
