"""Randomized oracle tests, part 25: the wave-33 family (Shapley
attribution, token-bucket replay) on random inputs with planted edge
cases — purchases with NO prior touches (empty coalition earns nothing),
single-channel users (that channel gets full credit), efficiency
(Σ shapley = total attributable cents ×6), a burst user who must drop
events, and a slow user who never drops — Ray vs DuckDB on the same
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


def _events(seed: int, n: int = 2500) -> pa.Table:
    rng = np.random.default_rng(seed)
    types = np.asarray(["view", "purchase", "click", "signup", "error"],
                       dtype=object)[rng.integers(0, 5, size=n)]
    ts = 1_700_000_000_000_000 + rng.integers(0, 20 * 86_400_000_000, size=n)
    uid = rng.integers(1, 70, size=n).astype(np.int64)
    # burst user: 40 events within 30 s → must drop most of them
    uid[:40] = 9001
    ts[:40] = 1_690_000_000_000_000 + np.arange(40, dtype=np.int64) * 750_000
    # slow user: 20 events spaced a day apart → zero drops
    uid[40:60] = 9002
    ts[40:60] = 1_690_000_000_000_000 + np.arange(20, dtype=np.int64) * 86_400_000_000
    # purchase with no prior touch: first event of user 9003
    uid[60] = 9003
    types[60] = "purchase"
    ts[60] = 1_689_000_000_000_000
    vals = np.round(rng.uniform(1, 90, size=n), 2)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(uid),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [139, 211])
@pytest.mark.parametrize("name", ["shapley_attribution", "token_bucket_audit"])
def test_random_events_wave33(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w33{seed}{name[:4]}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run(name, str(d), _con_for(d, ["events"]))


def test_token_bucket_planted(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("w33tb")
    pq.write_table(_events(7), str(d / "events.parquet"))
    got = REGISTRY["token_bucket_audit"].fn(str(d)).set_index("user_id")
    # burst user: 40 events at 750 ms gaps — every gap floors to 0 refill
    # tokens, so only the initial bucket of 5 admits: 35 drops
    assert int(got.loc[9001, "dropped"]) == 40 - 5
    assert 9002 not in got.index or int(got.loc[9002, "dropped"]) == 0


def test_shapley_single_channel_full_credit(ray_session, tmp_path_factory):
    """One user, one 'click' then one purchase: click takes ALL credit."""
    d = tmp_path_factory.mktemp("w33sh")
    t = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000, 1_700_000_100_000_000],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["click", "purchase"]),
        "value": pa.array([0.0, 50.0]),
        "props": pa.array(["{}", "{}"]),
    })
    pq.write_table(t, str(d / "events.parquet"))
    out = REGISTRY["shapley_attribution"].fn(str(d)).set_index("channel")
    assert int(out.loc["click", "shapley_sixth_cents"]) == 6 * 5000
    assert int(out.loc["view", "shapley_sixth_cents"]) == 0
    assert float(out.loc["click", "share"]) == 1.0
