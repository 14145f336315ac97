"""Randomized oracle tests, part 9: the wave-16 family (expectation suite,
degree assortativity, JL projection distortion, successive halving) on random
inputs with planted edge cases — out-of-domain event types, malformed props,
duplicate event ids (uniqueness violations), zero-price orders, dangling
lineitem FKs, identical consecutive embeddings (zero-distance bucket), metric
ties at the halving cut — Ray vs DuckDB on the same corpus."""

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


def _dirty_events(seed: int, n: int = 3000) -> pa.Table:
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(-10, 60, size=n), 2)
    vals[:40] = 10.0  # planted metric ties across users at the halving cut
    vals[45] = 200000.0  # range violation
    types = np.asarray(["view", "purchase", "error", "signup", "click"],
                       dtype=object)[rng.integers(0, 5, size=n)]
    types[:250] = "purchase"  # metric mass for the halving arms
    types[257] = "rogue"  # accepted-values violation
    props = np.asarray(["{}"] * n, dtype=object)
    props[11] = "not-json"  # format violation
    eid = np.arange(n, dtype=np.int64)
    eid[21] = eid[20]  # duplicate id: uniqueness violation
    ts = 1_700_000_000_000_000 + rng.integers(0, 60 * 86_400_000_000, size=n)
    uid = rng.integers(1, 60, size=n).astype(np.int64)
    return pa.table({
        "event_id": pa.array(eid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(props),
    })


def _dirty_orders(seed: int, n: int = 500) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    price = np.round(rng.uniform(1000, 400000, size=n), 2)
    price[3] = 0.0  # non-positive price violation
    status = np.asarray(["O", "F", "P"], dtype=object)[rng.integers(0, 3, size=n)]
    status[9] = "X"  # domain violation
    base = pd.Timestamp("2019-01-01").value // 1000
    return pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(1, 120, size=n).astype(np.int64)),
        "o_orderstatus": pa.array(status),
        "o_totalprice": pa.array(price),
        "o_orderdate": pa.array(
            base + rng.integers(0, 2000, size=n) * 86_400_000_000
        ).cast(pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-P"] * n),
    })


def _dirty_lineitem(seed: int, n: int = 2500) -> pa.Table:
    rng = np.random.default_rng(seed + 2)
    ok = rng.integers(1, 500, size=n).astype(np.int64)
    ok[:4] = 99_999  # dangling FK rows
    q = rng.integers(1, 51, size=n).astype(np.float64)
    q[8] = 99.0  # quantity range violation
    return pa.table({
        "l_orderkey": pa.array(ok),
        "l_partkey": pa.array(rng.integers(1, 80, size=n).astype(np.int64)),
        "l_suppkey": pa.array(np.ones(n, np.int64)),
        "l_linenumber": pa.array(np.ones(n, np.int32)),
        "l_quantity": pa.array(q),
        "l_extendedprice": pa.array(np.full(n, 100.0)),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(
            np.full(n, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
    })


def _embeddings(seed: int, n: int = 240, d: int = 24) -> pa.Table:
    rng = np.random.default_rng(seed)
    mat = rng.normal(0, 0.3, size=(n, d)).astype(np.float32)
    mat[10] = mat[11]  # identical consecutive pair -> 'zero' bucket
    mat[20] = 0.0
    mat[21] = 0.0  # all-zero pair, also 'zero'
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row for row in mat.tolist()],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(n, np.int32)),
    })


@pytest.mark.parametrize("seed", [17, 43])
def test_random_expectation_audit(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w16x{seed}")
    pq.write_table(_dirty_events(seed), str(d / "events.parquet"))
    pq.write_table(_dirty_orders(seed), str(d / "orders.parquet"))
    pq.write_table(_dirty_lineitem(seed), str(d / "lineitem.parquet"))
    con = _con_for(d, ["events", "orders", "lineitem"])
    _run("expectation_audit", str(d), con)
    # planted truth: exactly these rules must FAIL
    got = REGISTRY["expectation_audit"].fn(str(d))
    failed = set(got[got["passed"] == 0]["rule_id"])
    assert failed == {
        "events_value_range", "events_type_domain", "events_id_unique",
        "events_props_json", "orders_price_positive", "orders_status_domain",
        "lineitem_fk_orders", "lineitem_qty_range",
    }


@pytest.mark.parametrize("seed", [19, 47])
def test_random_halving_and_assortativity(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w16h{seed}")
    pq.write_table(_dirty_events(seed), str(d / "events.parquet"))
    pq.write_table(_dirty_lineitem(seed), str(d / "lineitem.parquet"))
    con = _con_for(d, ["events", "lineitem"])
    _run("successive_halving", str(d), con)
    _run("degree_assortativity", str(d), con)


@pytest.mark.parametrize("seed", [23, 59])
def test_random_jl_projection(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w16j{seed}")
    pq.write_table(_embeddings(seed), str(d / "embeddings.parquet"))
    con = _con_for(d, ["embeddings"])
    _run("jl_projection_audit", str(d), con)
    got = REGISTRY["jl_projection_audit"].fn(str(d))
    z = got[got["bucket"] == "zero"]
    assert len(z) == 1 and int(z["n_pairs"].iloc[0]) >= 2
