"""Randomized oracle tests, part 22: the wave-30 family (MRR eval,
rich-club coefficient) on random inputs with planted edge cases — a short
non-containing doc that outranks longer containing docs (the rank-1≠relevant
case MRR exists to catch), a hub clique (rich club density 1 at high k), and
thresholds above the max degree (N_k < 2 → NULL/NaN parity) — Ray vs DuckDB
on the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

WORDS = ["spark", "query", "vector", "hash", "join", "table", "scan", "merge"]


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


def _documents(seed: int, n: int = 170) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for idx in range(n):
        k = int(rng.integers(1, 30))
        texts.append(" ".join(rng.choice(WORDS, size=k)))
    texts[0] = "zz"  # very short doc with NO frequent term: smoothing winner
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _lineitem_clique(seed: int, n: int = 1800) -> pa.Table:
    rng = np.random.default_rng(seed)
    ok = rng.integers(1, 350, size=n).astype(np.int64)
    pk = rng.integers(1, 40, size=n).astype(np.int64)
    # planted 10-node clique among parts 700..709 (one order holds all 10):
    # they each gain degree ≥ 9 and are fully connected to each other
    extra_ok = [9999] * 10
    extra_pk = list(range(700, 710))
    m = n + 10
    return pa.table({
        "l_orderkey": pa.array(np.concatenate([ok, np.array(extra_ok, np.int64)])),
        "l_partkey": pa.array(np.concatenate([pk, np.array(extra_pk, np.int64)])),
        "l_suppkey": pa.array(np.ones(m, np.int64)),
        "l_linenumber": pa.array(np.ones(m, np.int32)),
        "l_quantity": pa.array(np.ones(m)),
        "l_extendedprice": pa.array(np.full(m, 100.0)),
        "l_discount": pa.array(np.zeros(m)),
        "l_tax": pa.array(np.zeros(m)),
        "l_returnflag": pa.array(["N"] * m),
        "l_linestatus": pa.array(["O"] * m),
        "l_shipdate": pa.array(
            np.full(m, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
    })


@pytest.mark.parametrize("seed", [107, 179])
def test_random_mrr(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w30m{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("mrr_eval", str(d), _con_for(d, ["documents"]))


@pytest.mark.parametrize("seed", [109, 181])
def test_random_rich_club(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w30r{seed}")
    pq.write_table(_lineitem_clique(seed), str(d / "lineitem.parquet"))
    _run("rich_club_coefficient", str(d), _con_for(d, ["lineitem"]))


def test_rich_club_pure_clique(ray_session, tmp_path_factory):
    """A lone 10-clique: nodes with degree > 8 are exactly its 9-degree
    members... none (degree == 9 > 8 → all 10); φ(8) = 1.0 exactly, and
    k=16 exceeds the max degree → NULL/NaN."""
    d = tmp_path_factory.mktemp("w30c")
    extra_ok = [1] * 10
    extra_pk = list(range(700, 710))
    m = 10
    t = pa.table({
        "l_orderkey": pa.array(np.array(extra_ok, np.int64)),
        "l_partkey": pa.array(np.array(extra_pk, np.int64)),
        "l_suppkey": pa.array(np.ones(m, np.int64)),
        "l_linenumber": pa.array(np.ones(m, np.int32)),
        "l_quantity": pa.array(np.ones(m)),
        "l_extendedprice": pa.array(np.full(m, 100.0)),
        "l_discount": pa.array(np.zeros(m)),
        "l_tax": pa.array(np.zeros(m)),
        "l_returnflag": pa.array(["N"] * m),
        "l_linestatus": pa.array(["O"] * m),
        "l_shipdate": pa.array(
            np.full(m, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
    })
    pq.write_table(t, str(d / "lineitem.parquet"))
    out = REGISTRY["rich_club_coefficient"].fn(str(d)).set_index("k")
    assert float(out.loc[8, "phi"]) == 1.0
    assert int(out.loc[8, "n_nodes"]) == 10
    assert np.isnan(float(out.loc[16, "phi"]))
