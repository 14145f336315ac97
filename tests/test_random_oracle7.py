"""Randomized oracle tests, part 7: the session-5 wave-10–13 family
(Kneser-Ney smoothing, Good-Turing counts, tokenizer fertility, stride
interleave audit, RBO, CSV ingest, parquet footprint, Poisson bootstrap,
DP counts, CCNet perplexity buckets) on random inputs with planted edge
cases — single-token docs, empty/duplicate texts, tie runs — Ray vs DuckDB
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


def _documents(seed: int, n: int = 160) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(1, 26))
        t = " ".join(rng.choice(WORDS, size=k))
        if i % 19 == 0:
            t = "solo"  # single-token doc: zero bigrams, odd token count
        if i % 23 == 0:
            t = ""  # empty text → one FNV('') token after split
        if i % 11 == 0 and i > 0:
            t = texts[i - 1]  # exact duplicate
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 5, size=n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


@pytest.mark.parametrize("seed", [3, 41])
@pytest.mark.parametrize("name", [
    "kneser_ney_bigram", "good_turing_counts", "chars_per_token",
    "train_interleave_audit", "ccnet_perplexity_buckets",
])
def test_random_docs_wave10(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w10d{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run(name, str(d), _con_for(d, ["documents"]))


def _events(seed: int, n: int = 2500) -> pa.Table:
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(-10, 60, size=n), 2)
    vals[:40] = 7.77  # planted tie run across users
    types = np.asarray(["view", "purchase", "error", "signup"], dtype=object)[
        rng.integers(0, 4, size=n)]
    types[:200] = "purchase"  # both halves get purchases
    ts = 1_700_000_000_000_000 + rng.integers(0, 90 * 86_400_000_000, size=n)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 150, size=n).astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [9, 57])
@pytest.mark.parametrize("name", [
    "rbo_rank_overlap", "poisson_bootstrap_ci", "dp_event_counts",
])
def test_random_events_wave12(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w12e{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run(name, str(d), _con_for(d, ["events"]))


def test_random_csv_ingest(ray_session, tmp_path_factory):
    rng = np.random.default_rng(13)
    n = 800
    d = tmp_path_factory.mktemp("w11csv")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(1, 99, size=n).astype(np.int64)),
        "o_totalprice": pa.array(np.round(rng.uniform(10, 9e4, size=n), 2)),
    }), str(d / "orders.parquet"))
    _run("csv_ingest_stats", str(d), duckdb.connect())


def test_random_parquet_footprint(ray_session, tmp_path_factory):
    rng = np.random.default_rng(29)
    n = 20_000
    d = tmp_path_factory.mktemp("w11fp")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(1, 4000, size=n).astype(np.int64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 1e5, size=n), 2)),
        "l_returnflag": pa.array(
            np.asarray(["A", "N", "R"], dtype=object)[rng.integers(0, 3, size=n)]),
        "l_shipdate": pa.array(
            (1_700_000_000_000_000
             + rng.integers(0, 300 * 86_400_000_000, size=n))
        ).cast(pa.timestamp("us")),
    }), str(d / "lineitem.parquet"))
    _run("parquet_footprint_audit", str(d), duckdb.connect())
