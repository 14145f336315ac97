"""Randomized oracle tests, part 23: the wave-31 family (prefix-filtered
similarity join, Markov stationary distribution) on random inputs with
planted edge cases — exact duplicates (Jaccard 1), one-word-edited
near-duplicates straddling the 0.6 threshold, docs too short for shingles,
an absorbing event type (stationary mass concentrates), and a type never
followed by anything — Ray vs DuckDB on the same corpus."""

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
         "lorem", "ipsum", "delta", "gamma", "batch", "index", "prune", "leaf"]


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
        k = int(rng.integers(1, 28))
        t = " ".join(rng.choice(WORDS, size=k))
        if idx % 11 == 0 and idx > 0:
            t = texts[idx - 1]  # exact duplicate: Jaccard 1
        if idx % 13 == 0 and idx > 0 and len(texts[idx - 1].split()) > 8:
            ws = texts[idx - 1].split()
            ws[4] = "edited"  # one-word edit: near-dup straddling 0.6
            t = " ".join(ws)
        if idx % 23 == 0:
            t = "too short"  # < 3 words: zero shingles
        texts.append(t)
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _events(seed: int, n: int = 2500) -> pa.Table:
    rng = np.random.default_rng(seed)
    types = np.asarray(["view", "purchase", "error", "signup", "click"],
                       dtype=object)[rng.integers(0, 5, size=n)]
    # absorbing-ish: errors mostly follow errors
    for i in range(1, n):
        if types[i - 1] == "error" and rng.random() < 0.8:
            types[i] = "error"
    ts = 1_700_000_000_000_000 + rng.integers(0, 30 * 86_400_000_000, size=n)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 60, size=n).astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.round(rng.uniform(0, 60, size=n), 2)),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [113, 191])
def test_random_prefix_filter_join(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w31p{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("prefix_filter_join", str(d), _con_for(d, ["documents"]))
    got = REGISTRY["prefix_filter_join"].fn(str(d))
    assert len(got) >= 1  # planted duplicates must qualify
    full = got[got["inter"] == got["uni"]]
    assert len(full) >= 1  # exact duplicates: Jaccard exactly 1


@pytest.mark.parametrize("seed", [127, 193])
def test_random_markov_stationary(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w31m{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run("markov_stationary", str(d), _con_for(d, ["events"]))
    got = REGISTRY["markov_stationary"].fn(str(d)).set_index("state")
    # the absorbing-ish error state must hold the largest stationary mass
    assert got["pi"].idxmax() == "error"
