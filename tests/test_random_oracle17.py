"""Randomized oracle tests, part 17: the wave-25 family (champion lists,
LOSO ablation, burn-rate alerts) on random inputs with planted edge cases —
tf ties at the champion cut, a single-source corpus (LOSO divide-by-zero →
NULL/NaN parity), a quiet error-free stream (zero alerts), and a planted
burst that must alert in both windows — Ray vs DuckDB on the same corpus."""

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
         "lorem", "ipsum"]


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


def _documents(seed: int, n: int = 200, single_source: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for idx in range(n):
        k = int(rng.integers(1, 24))
        t = " ".join(rng.choice(WORDS, size=k))
        if idx % 9 == 0:
            t = "spark spark spark"  # tf ties at the champion cut
        texts.append(t)
    srcs = ["only"] * n if single_source else [
        f"s{int(x)}" for x in rng.integers(0, 5, size=n)]
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _events(seed: int, n: int = 4000, quiet: bool = False) -> pa.Table:
    rng = np.random.default_rng(seed)
    types = np.asarray(["view", "purchase", "signup", "click"],
                       dtype=object)[rng.integers(0, 4, size=n)]
    ts = 1_700_000_000_000_000 + rng.integers(0, 40 * 86_400_000_000, size=n)
    if not quiet:
        # planted 3-hour full-error burst: alerts in both windows
        burst = 1_700_500_000_000_000
        types[:300] = "error"
        ts[:300] = burst + rng.integers(0, 3 * 3_600_000_000, size=300)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 80, size=n).astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(np.round(rng.uniform(0, 60, size=n), 2)),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [79, 131])
@pytest.mark.parametrize("name", ["champion_lists", "loso_quality_delta"])
def test_random_docs_wave25(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w25d{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run(name, str(d), _con_for(d, ["documents"]))


def test_loso_single_source_null_parity(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("w25ss")
    pq.write_table(_documents(7, single_source=True), str(d / "documents.parquet"))
    _run("loso_quality_delta", str(d), _con_for(d, ["documents"]))
    got = REGISTRY["loso_quality_delta"].fn(str(d))
    assert np.isnan(float(got["mean_without"].iloc[0]))


@pytest.mark.parametrize("seed", [83, 137])
def test_random_burn_rate(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w25b{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run("burn_rate_alerts", str(d), _con_for(d, ["events"]))
    got = REGISTRY["burn_rate_alerts"].fn(str(d))
    assert len(got) >= 1  # the planted burst must alert


def test_burn_rate_quiet_stream(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("w25q")
    pq.write_table(_events(11, quiet=True), str(d / "events.parquet"))
    _run("burn_rate_alerts", str(d), _con_for(d, ["events"]))
    got = REGISTRY["burn_rate_alerts"].fn(str(d))
    assert len(got) == 0
