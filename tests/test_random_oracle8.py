"""Randomized oracle tests, part 8: the wave-15 family (sequential-pattern
triples, Neyman stratified allocation, positional phrase search, partition
digests, min-label propagation) on random inputs with planted edge cases —
single-event users, tied timestamps, overlapping phrase runs ("rep rep rep"),
empty/single-word docs, singleton strata, negative values on the digest
rounding path, and a long co-purchase chain that 4 propagation rounds must
NOT fully collapse — Ray vs DuckDB on the same corpus."""

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
         "lorem", "ipsum", "delta", "gamma", "batch", "index", "rep"]


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


def _events(seed: int, n: int = 3000) -> pa.Table:
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(-10, 60, size=n), 2)
    vals[:30] = -7.5  # negative tie run exercises the cents rounding path
    types = np.asarray(["view", "purchase", "error", "signup", "click"],
                       dtype=object)[rng.integers(0, 5, size=n)]
    ts = 1_700_000_000_000_000 + rng.integers(0, 90 * 86_400_000_000, size=n)
    ts[:20] = 1_700_000_000_000_000  # tied timestamps: event_id breaks order
    uid = rng.integers(1, 120, size=n).astype(np.int64)
    uid[0] = 9001  # single-event user: no triples, still digested
    uid[1:3] = 9002  # two-event user: no triples either
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })


def _documents(seed: int, n: int = 180) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(1, 30))
        t = " ".join(rng.choice(WORDS, size=k))
        if i % 17 == 0:
            t = "rep rep rep rep"  # overlapping phrase occurrences
        if i % 23 == 0:
            t = ""  # empty text: single '' word, zero pairs
        if i % 29 == 0:
            t = "solo"  # single word: zero pairs
        texts.append(t)
    srcs = [f"s{int(x)}" for x in rng.integers(0, 6, size=n)]
    srcs[0] = "tiny"  # singleton stratum: q10 == q90, alloc may round to zero
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _lineitem_chain(seed: int, n: int = 2500) -> pa.Table:
    """Random co-purchase rows PLUS a planted 40-part chain in a disjoint id
    range (parts 500..540, consecutive pairs in dedicated orders): 4 rounds
    of min-label propagation must show partial, round-by-round convergence
    on the chain — exactly what the per-round stats assert."""
    rng = np.random.default_rng(seed)
    ok = rng.integers(1, 700, size=n).astype(np.int64)
    pk = rng.integers(1, 90, size=n).astype(np.int64)
    chain_ok, chain_pk = [], []
    for i in range(40):
        chain_ok += [10_000 + i, 10_000 + i]
        chain_pk += [500 + i, 500 + i + 1]
    return pa.table({
        "l_orderkey": pa.array(np.concatenate([ok, np.array(chain_ok, np.int64)])),
        "l_partkey": pa.array(np.concatenate([pk, np.array(chain_pk, np.int64)])),
        "l_suppkey": pa.array(np.ones(n + 80, np.int64)),
        "l_linenumber": pa.array(np.ones(n + 80, np.int32)),
        "l_quantity": pa.array(np.ones(n + 80)),
        "l_extendedprice": pa.array(np.full(n + 80, 100.0)),
        "l_discount": pa.array(np.zeros(n + 80)),
        "l_tax": pa.array(np.zeros(n + 80)),
        "l_returnflag": pa.array(["N"] * (n + 80)),
        "l_linestatus": pa.array(["O"] * (n + 80)),
        "l_shipdate": pa.array(
            np.full(n + 80, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
    })


@pytest.mark.parametrize("seed", [7, 53])
@pytest.mark.parametrize("name", ["sequence_mining_triples", "partition_digest"])
def test_random_events_wave15(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w15ev{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run(name, str(d), _con_for(d, ["events"]))


@pytest.mark.parametrize("seed", [11, 37])
@pytest.mark.parametrize("name", ["neyman_sample", "phrase_search"])
def test_random_docs_wave15(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w15doc{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run(name, str(d), _con_for(d, ["documents"]))


@pytest.mark.parametrize("seed", [13, 61])
def test_random_chain_label_propagation(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w15li{seed}")
    pq.write_table(_lineitem_chain(seed), str(d / "lineitem.parquet"))
    _run("label_propagation", str(d), _con_for(d, ["lineitem"]))


def test_label_propagation_chain_partial(ray_session, tmp_path_factory):
    """Planted-truth check independent of the SQL oracle: on a pure 40-part
    chain, after r rounds each node's label is the min id within r hops, so
    round r has exactly 41-r distinct labels and the max group is r+1."""
    d = tmp_path_factory.mktemp("w15chain")
    chain_ok, chain_pk = [], []
    for i in range(40):
        chain_ok += [10_000 + i, 10_000 + i]
        chain_pk += [500 + i, 500 + i + 1]
    n = len(chain_ok)
    t = pa.table({
        "l_orderkey": pa.array(np.array(chain_ok, np.int64)),
        "l_partkey": pa.array(np.array(chain_pk, np.int64)),
        "l_suppkey": pa.array(np.ones(n, np.int64)),
        "l_linenumber": pa.array(np.ones(n, np.int32)),
        "l_quantity": pa.array(np.ones(n)),
        "l_extendedprice": pa.array(np.full(n, 100.0)),
        "l_discount": pa.array(np.zeros(n)),
        "l_tax": pa.array(np.zeros(n)),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array(
            np.full(n, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
    })
    pq.write_table(t, str(d / "lineitem.parquet"))
    out = REGISTRY["label_propagation"].fn(str(d))
    for _, row in out.iterrows():
        r = int(row["round"])
        assert int(row["n_labels"]) == 41 - r
        assert int(row["max_csize"]) == r + 1
