"""Randomized oracle tests, part 10: the wave-17 family (sorted-adjacent LCP
audit, Bradley-Terry preference scoring) on random inputs with planted edge
cases — exact duplicate texts (full-length LCP), shared boilerplate prefixes,
empty/single-word docs, quantity ties at the match level and parts that lose
every match (the GREATEST(u,1) floor path) — Ray vs DuckDB on the same
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


def _documents(seed: int, n: int = 200) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for idx in range(n):
        k = int(rng.integers(1, 24))
        t = " ".join(rng.choice(WORDS, size=k))
        if idx % 13 == 0:
            t = "lorem ipsum delta " + t  # shared boilerplate prefix family
        if idx % 19 == 0 and idx > 0:
            t = texts[idx - 1]  # exact duplicate: full-length LCP
        if idx % 23 == 0:
            t = ""  # empty text
        if idx % 29 == 0:
            t = "solo"
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 5, size=n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _lineitem(seed: int, n: int = 3000) -> pa.Table:
    rng = np.random.default_rng(seed)
    q = rng.integers(1, 51, size=n).astype(np.float64)
    q[:400] = 10.0  # heavy tie mass: exercises the smaller-id-wins rule
    pk = rng.integers(1, 60, size=n).astype(np.int64)
    pk[:5] = 59  # a part that mostly appears with max id: likely loses ties
    return pa.table({
        "l_orderkey": pa.array(rng.integers(1, 500, size=n).astype(np.int64)),
        "l_partkey": pa.array(pk),
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


@pytest.mark.parametrize("seed", [29, 71])
def test_random_adjacent_lcp(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w17lcp{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("adjacent_lcp_audit", str(d), _con_for(d, ["documents"]))
    got = REGISTRY["adjacent_lcp_audit"].fn(str(d))
    # planted duplicates guarantee long-LCP pairs exist
    assert int(got[got["bucket"] == "9+"]["n_pairs"].sum()) >= 1


@pytest.mark.parametrize("seed", [31, 73])
def test_random_bradley_terry(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w17bt{seed}")
    pq.write_table(_lineitem(seed), str(d / "lineitem.parquet"))
    _run("bradley_terry_step", str(d), _con_for(d, ["lineitem"]))


def test_bradley_terry_planted_order(ray_session, tmp_path_factory):
    """Planted truth: a strict dominance chain (part 1 beats 2 beats 3) must
    score in that order after two MM iterations."""
    d = tmp_path_factory.mktemp("w17btp")
    rows = []
    ok = 0
    for _ in range(30):  # 1 vs 2: part 1 wins (q 9 vs 3)
        ok += 1
        rows += [(ok, 1, 9.0), (ok, 2, 3.0)]
    for _ in range(30):  # 2 vs 3: part 2 wins
        ok += 1
        rows += [(ok, 2, 9.0), (ok, 3, 3.0)]
    for _ in range(30):  # 1 vs 3: part 1 wins
        ok += 1
        rows += [(ok, 1, 9.0), (ok, 3, 3.0)]
    n = len(rows)
    t = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array(np.ones(n, np.int64)),
        "l_linenumber": pa.array(np.ones(n, np.int32)),
        "l_quantity": pa.array([r[2] for r in rows]),
        "l_extendedprice": pa.array(np.full(n, 100.0)),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(
            np.full(n, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
    })
    pq.write_table(t, str(d / "lineitem.parquet"))
    out = REGISTRY["bradley_terry_step"].fn(str(d))
    assert out["part"].tolist() == [1, 2, 3]
    s = out.set_index("part")["score"]
    assert int(s[1]) > int(s[2]) > int(s[3]) >= 1
