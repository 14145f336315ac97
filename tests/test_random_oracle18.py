"""Randomized oracle tests, part 18: the wave-26 family (1-D Wasserstein,
vocab id assignment, exact streaming moments) on random inputs with planted
edge cases — identical distributions (W₁ = 0), one-sided groups (NULL/NaN
parity), words first appearing in the same doc (tie by word), huge cents
values stressing the >64-bit power sums, and a closed-form moment check —
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


def _events(seed: int, n: int = 3000, mirror: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(0, 90000, size=n), 2)  # huge cents → big S4
    types = np.asarray(["view", "purchase"], dtype=object)[rng.integers(0, 2, size=n)]
    uid = rng.integers(1, 200, size=n).astype(np.int64)
    if mirror:
        # every purchase value appears once under an odd AND an even user
        vals[1::2] = vals[0::2]
        uid[0::2] = 1
        uid[1::2] = 2
        types[:] = "purchase"
    ts = 1_700_000_000_000_000 + rng.integers(0, 30 * 86_400_000_000, size=n)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })


def _documents(seed: int, n: int = 150) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(WORDS, size=int(rng.integers(1, 15))))
             for _ in range(n)]
    texts[0] = "zebra yak xylo"  # several words first appearing together: tie by word
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


@pytest.mark.parametrize("seed", [87, 139])
@pytest.mark.parametrize("name", ["wasserstein_1d", "streaming_moments"])
def test_random_events_wave26(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w26e{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run(name, str(d), _con_for(d, ["events"]))


@pytest.mark.parametrize("seed", [89, 149])
def test_random_vocab_ids(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w26v{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("vocab_id_assignment", str(d), _con_for(d, ["documents"]))


def test_wasserstein_identical_distributions(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("w26wz")
    pq.write_table(_events(5, n=400, mirror=True), str(d / "events.parquet"))
    _run("wasserstein_1d", str(d), _con_for(d, ["events"]))
    out = REGISTRY["wasserstein_1d"].fn(str(d))
    assert float(out["w1_cents"].iloc[0]) == 0.0


def test_streaming_moments_closed_form(ray_session, tmp_path_factory):
    """Bernoulli-style two-point distribution has closed-form moments:
    cents ∈ {0, 10000} equally → mean 5000, var 5000², skew 0, kurt 1."""
    d = tmp_path_factory.mktemp("w26m")
    n = 500
    vals = np.where(np.arange(n) % 2 == 0, 0.0, 100.0)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            np.full(n, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
        "user_id": pa.array(np.ones(n, np.int64)),
        "event_type": pa.array(["purchase"] * n),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(d / "events.parquet"))
    out = REGISTRY["streaming_moments"].fn(str(d))
    assert float(out["mean_cents"].iloc[0]) == 5000.0
    assert float(out["var_cents"].iloc[0]) == 25_000_000.0
    assert float(out["skewness"].iloc[0]) == 0.0
    assert float(out["kurtosis"].iloc[0]) == 1.0
