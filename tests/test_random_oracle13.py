"""Randomized oracle tests, part 13: the wave-20 family (Gorilla timestamp
compression audit, Dirichlet query-likelihood retrieval, diff-in-diff) on
random inputs with planted edge cases — single-event users (header-only
streams), a perfectly regular cadence user (dod_0 bucket), docs missing every
query term (pure-smoothing scores), empty texts, and purchase mass skewed
onto one group-period cell — Ray vs DuckDB on the same corpus."""

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


def _events(seed: int, n: int = 3000) -> pa.Table:
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(-10, 60, size=n), 2)
    types = np.asarray(["view", "purchase", "error", "signup", "click"],
                       dtype=object)[rng.integers(0, 5, size=n)]
    types[:600] = "purchase"
    uid = rng.integers(1, 100, size=n).astype(np.int64)
    ts = 1_700_000_000_000_000 + rng.integers(0, 60 * 86_400_000_000, size=n)
    uid[0] = 9001  # single-event user → header-only stream
    uid[1:3] = 9002  # two-event user → header + first_delta, no dod rows
    # perfectly regular cadence user: every dod == 0
    uid[10:40] = 9003
    ts[10:40] = 1_690_000_000_000_000 + np.arange(30, dtype=np.int64) * 60_000_000
    # skew all early purchases to odd users: loads one DiD cell
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
    for idx in range(n):
        k = int(rng.integers(1, 26))
        t = " ".join(rng.choice(WORDS, size=k))
        if idx % 17 == 0:
            t = "qqq zzz yyy"  # no query terms: pure smoothing score
        if idx % 23 == 0:
            t = ""
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 5, size=n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


@pytest.mark.parametrize("seed", [53, 101])
@pytest.mark.parametrize("name", ["gorilla_timestamp_audit", "diff_in_diff"])
def test_random_events_wave20(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w20e{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run(name, str(d), _con_for(d, ["events"]))


@pytest.mark.parametrize("seed", [59, 103])
def test_random_dirichlet_ql(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w20q{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("dirichlet_ql_retrieval", str(d), _con_for(d, ["documents"]))


def test_gorilla_regular_cadence_bucket(ray_session, tmp_path_factory):
    """Planted truth: a metronome stream of k events yields exactly k-2
    dod_0 rows of 1 bit each."""
    d = tmp_path_factory.mktemp("w20gp")
    k = 50
    t = pa.table({
        "event_id": pa.array(np.arange(k, dtype=np.int64)),
        "ts": pa.array(
            1_690_000_000_000_000 + np.arange(k, dtype=np.int64) * 1_000_000
        ).cast(pa.timestamp("us")),
        "user_id": pa.array(np.full(k, 7, np.int64)),
        "event_type": pa.array(["view"] * k),
        "value": pa.array(np.ones(k)),
        "props": pa.array(["{}"] * k),
    })
    pq.write_table(t, str(d / "events.parquet"))
    out = REGISTRY["gorilla_timestamp_audit"].fn(str(d)).set_index("bucket")
    assert int(out.loc["dod_0", "n"]) == k - 2
    assert int(out.loc["dod_0", "bits"]) == k - 2
    assert int(out.loc["header", "n"]) == 1
