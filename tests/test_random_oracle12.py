"""Randomized oracle tests, part 12: the wave-19 family (Elias-Fano posting
audit, columnar encoding advisor) on random inputs with planted edge cases —
hapax words (n=1 bucket), a stop-word in every doc (65+ bucket), duplicate
texts, gapped event ids (positional LAG vs id-adjacency), long constant runs
(RLE path) and a high-cardinality column (PLAIN path) — Ray vs DuckDB on the
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


def _documents(seed: int, n: int = 220) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for idx in range(n):
        k = int(rng.integers(1, 22))
        t = "the " + " ".join(rng.choice(WORDS, size=k))  # 'the' in every doc
        if idx % 13 == 0:
            t += f" hapax{idx}"  # n=1 postings
        if idx % 19 == 0 and idx > 0:
            t = texts[idx - 1]
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


def _events(seed: int, n: int = 3000) -> pa.Table:
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(-10, 60, size=n), 2)
    vals[:500] = 5.0  # long constant run → RLE territory for value
    types = np.asarray(["view", "purchase", "error", "signup", "click"],
                       dtype=object)[rng.integers(0, 5, size=n)]
    # gapped + shuffled event ids: positional LAG order ≠ file order
    eid = np.sort(rng.choice(np.arange(n * 3, dtype=np.int64), size=n, replace=False))
    eid = rng.permutation(eid)
    ts = 1_700_000_000_000_000 + rng.integers(0, 30 * 86_400_000_000, size=n)
    return pa.table({
        "event_id": pa.array(eid),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(1, 2000, size=n).astype(np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.parametrize("seed", [43, 89])
def test_random_elias_fano(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w19ef{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run("elias_fano_audit", str(d), _con_for(d, ["documents"]))
    got = REGISTRY["elias_fano_audit"].fn(str(d))
    buckets = set(got["bucket"])
    assert "1" in buckets and "65+" in buckets  # hapax + stop word planted


@pytest.mark.parametrize("seed", [47, 97])
def test_random_encoding_advisor(seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w19enc{seed}")
    pq.write_table(_events(seed), str(d / "events.parquet"))
    _run("encoding_advisor", str(d), _con_for(d, ["events"]))


def test_encoding_advisor_planted_rules(ray_session, tmp_path_factory):
    """Planted truth: a constant column is RLE, a 2-value alternating column
    is DICT (runs = n), a unique column is PLAIN."""
    d = tmp_path_factory.mktemp("w19encp")
    n = 400
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            np.full(n, 1_700_000_000_000_000, np.int64)).cast(pa.timestamp("us")),
        "user_id": pa.array(np.arange(n, dtype=np.int64)),          # unique → PLAIN
        "event_type": pa.array(["view"] * n),                       # constant → RLE
        "value": pa.array((np.arange(n) % 2).astype(np.float64)),   # alternating → DICT
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(d / "events.parquet"))
    out = REGISTRY["encoding_advisor"].fn(str(d)).set_index("column_name")
    assert out.loc["event_type", "encoding"] == "RLE"
    assert out.loc["value", "encoding"] == "DICT"
    assert out.loc["user_id", "encoding"] == "PLAIN"
    assert int(out.loc["event_type", "n_runs"]) == 1
    assert int(out.loc["value", "n_runs"]) == n
