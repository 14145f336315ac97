"""Randomized oracle tests, part 19: the wave-27 family (nucleus vocab cut,
DP clipped mean) on random inputs with planted edge cases — a single-word
source (nucleus = 1), a uniform-frequency source (cut lands mid-tie run),
negative values and outliers on the clipping path — Ray vs DuckDB on the
same corpus."""

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
         "lorem", "ipsum", "delta", "gamma"]


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
    texts, srcs = [], []
    for idx in range(n):
        k = int(rng.integers(1, 22))
        texts.append(" ".join(rng.choice(WORDS, size=k)))
        srcs.append(f"s{int(rng.integers(0, 5))}")
    texts[0] = "mono mono mono mono"  # near-single-word source
    srcs[0] = "mono"
    # uniform-frequency source: 12 distinct words exactly once each →
    # the 90% cut lands inside an all-tied run, ordered by word
    texts[1] = " ".join(WORDS)
    srcs[1] = "uniform"
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _events(seed: int, n: int = 2500) -> pa.Table:
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(-50, 300, size=n), 2)
    vals[:20] = -33.33   # negative values clip to 0
    vals[20:40] = 9999.0  # outliers clip to the cap
    types = np.asarray(["view", "purchase", "error", "signup", "click"],
                       dtype=object)[rng.integers(0, 5, size=n)]
    ts = 1_700_000_000_000_000 + rng.integers(0, 30 * 86_400_000_000, size=n)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 80, size=n).astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [91, 151])
def test_random_nucleus(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w27n{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("nucleus_vocab_cut", str(d), _con_for(d, ["documents"]))
    got = REGISTRY["nucleus_vocab_cut"].fn(str(d)).set_index("source")
    assert int(got.loc["mono", "n_nucleus"]) == 1
    # uniform 12-words source: ceil(0.9*12)=11 → nucleus = 11 words
    assert int(got.loc["uniform", "n_nucleus"]) == 11


@pytest.mark.parametrize("seed", [93, 157])
def test_random_dp_clipped_mean(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w27d{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run("dp_clipped_mean", str(d), _con_for(d, ["events"]))
