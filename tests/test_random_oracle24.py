"""Randomized oracle tests, part 24: the wave-32 family (Efraimidis-Spirakis
weighted sampling, selectivity independence audit) on random inputs with
planted edge cases — weight-1 docs vs huge-weight docs (selection must tilt
toward heavy weights), a perfectly-correlated predicate pair (lift far above
1, 'positive' flag), an anti-correlated pair ('negative'), and the
statistical property that heavy docs are sampled more often across seeds —
Ray vs DuckDB on the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tools.check_queries import compare

WORDS = ["spark", "query", "vector", "hash"]


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


def _documents(seed: int, n: int = 300) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(WORDS, size=int(rng.integers(1, 10))))
             for _ in range(n)]
    n_chars = rng.integers(1, 40, size=n).astype(np.int64)
    n_chars[: n // 10] = 5000  # heavy-weight cohort: should dominate the sample
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array(n_chars),
    })


def _events(seed: int, n: int = 2000, mode: str = "random") -> pa.Table:
    rng = np.random.default_rng(seed)
    types = np.asarray(["view", "purchase"], dtype=object)[rng.integers(0, 2, size=n)]
    vals = np.round(rng.uniform(0, 60, size=n), 2)
    if mode == "positive":  # purchases always have value > 30
        vals = np.where(types == "purchase",
                        np.round(rng.uniform(31, 60, size=n), 2),
                        np.round(rng.uniform(0, 29, size=n), 2))
    elif mode == "negative":  # purchases never have value > 30
        vals = np.where(types == "purchase",
                        np.round(rng.uniform(0, 29, size=n), 2),
                        np.round(rng.uniform(31, 60, size=n), 2))
    ts = 1_700_000_000_000_000 + rng.integers(0, 30 * 86_400_000_000, size=n)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 50, size=n).astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [131, 197])
def test_random_weighted_sample(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w32s{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("weighted_sample_es", str(d), _con_for(d, ["documents"]))
    got = REGISTRY["weighted_sample_es"].fn(str(d))
    # 10% of docs hold ~97% of the weight mass: they must dominate the top-20
    assert int((got["w"] == 5000).sum()) >= 15


@pytest.mark.parametrize("mode,expect", [("positive", "positive"),
                                         ("negative", "negative")])
def test_selectivity_flags(mode, expect, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w32c{mode}")
    pq.write_table(_events(41, mode=mode), str(d / "events.parquet"))
    _run("selectivity_independence_audit", str(d), _con_for(d, ["events"]))
    got = REGISTRY["selectivity_independence_audit"].fn(str(d))
    assert got["flag"].iloc[0] == expect


@pytest.mark.parametrize("seed", [137, 199])
def test_random_selectivity(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w32r{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run("selectivity_independence_audit", str(d), _con_for(d, ["events"]))
