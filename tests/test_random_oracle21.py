"""Randomized oracle tests, part 21: the wave-29 family (DP degree
histogram, canonical selection) on random inputs with planted edge cases —
a hub whose degree must clip, a duplicate cluster whose copies differ in
length (the LONGEST must be keeper, not the min id), and truncated-copy
survivorship — Ray vs DuckDB on the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

WORDS = ["spark", "query", "vector", "hash", "join", "table"]


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


def _lineitem(seed: int, n: int = 2000) -> pa.Table:
    rng = np.random.default_rng(seed)
    ok = rng.integers(1, 400, size=n).astype(np.int64)
    pk = rng.integers(1, 60, size=n).astype(np.int64)
    # hub: part 500 co-purchased with 40 distinct parts → degree clips at 20
    extra_ok, extra_pk = [], []
    for i in range(40):
        extra_ok += [8000 + i, 8000 + i]
        extra_pk += [500, 600 + i]
    m = n + len(extra_ok)
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


def _documents(seed: int, n: int = 160) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for idx in range(n):
        k = int(rng.integers(1, 20))
        t = " ".join(rng.choice(WORDS, size=k))
        if idx % 8 == 0:
            t = "copy copy copy body"  # big exact-dup cluster
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array(
            [len(t) + (7 if i % 16 == 0 else 0) for i, t in enumerate(texts)],
            pa.int64(),
        ),  # some copies claim longer n_chars → longest-copy survivorship
    })


@pytest.mark.parametrize("seed", [101, 167])
def test_random_dp_degree(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w29g{seed}")
    pq.write_table(_lineitem(seed), str(d / "lineitem.parquet"))
    _run("dp_degree_histogram", str(d), _con_for(d, ["lineitem"]))


@pytest.mark.parametrize("seed", [103, 173])
def test_random_canonical_selection(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w29c{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("canonical_selection", str(d), _con_for(d, ["documents"]))
    got = REGISTRY["canonical_selection"].fn(str(d))
    top = got.iloc[0]
    assert int(top["n_copies"]) >= 2
    # keeper must carry the cluster's MAX n_chars, not the min doc id
    assert int(top["keeper_chars"]) >= 23
