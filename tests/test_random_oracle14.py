"""Randomized oracle tests, part 14: the wave-21 family (SoftDeDup loss
weighting, stratified k-fold) on random inputs with planted edge cases —
heavy duplicate clusters spanning sources (weight 1/c splits across strata),
empty texts (their md5 still clusters), strata smaller than k (some folds
empty for that source), and a balance planted-truth check — Ray vs DuckDB on
the same corpus."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import (
    _KFOLD_K,
    ORACLE_ARTIFACT_DIR,
    REGISTRY,
)
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


def _documents(seed: int, n: int = 240) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for idx in range(n):
        k = int(rng.integers(1, 26))
        t = " ".join(rng.choice(WORDS, size=k))
        if idx % 7 == 0:
            t = "dup dup cluster text"  # big cross-source duplicate cluster
        if idx % 23 == 0:
            t = ""  # empty texts form their own duplicate cluster
        texts.append(t)
    srcs = [f"s{int(x)}" for x in rng.integers(0, 6, size=n)]
    srcs[0] = "tiny"  # stratum of size 1 < k: folds 1..4 empty for it
    srcs[1] = "trio"
    srcs[2] = "trio"
    srcs[3] = "trio"  # stratum of size 3 < k
    return pa.table({
        "doc_id": pa.array(rng.permutation(np.arange(n)).astype(np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


@pytest.mark.parametrize("seed", [61, 107])
@pytest.mark.parametrize("name", ["soft_dedup_weights", "stratified_kfold"])
def test_random_docs_wave21(name, seed, ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"w21{seed}")
    pq.write_table(_documents(seed), str(d / "documents.parquet"))
    _run(name, str(d), _con_for(d, ["documents"]))


def test_kfold_balance_planted(ray_session, tmp_path_factory):
    """Planted truth: fold sizes within each stratum differ by at most 1 and
    every doc appears exactly once."""
    d = tmp_path_factory.mktemp("w21bal")
    pq.write_table(_documents(3), str(d / "documents.parquet"))
    out = REGISTRY["stratified_kfold"].fn(str(d))
    total = int(out["n_docs"].sum())
    assert total == 240
    for src, g in out.groupby("source"):
        sizes = g["n_docs"].to_numpy()
        assert sizes.max() - sizes.min() <= 1


def test_soft_dedup_effective_mass(ray_session, tmp_path_factory):
    """A corpus of one text duplicated c times has effective mass
    c·⌊10⁶·n_words/c⌋ — the 1/c weighting exactly cancels duplication."""
    d = tmp_path_factory.mktemp("w21sd")
    c, words = 8, 5
    t = pa.table({
        "doc_id": pa.array(np.arange(c, dtype=np.int64)),
        "text": pa.array(["one two three four five"] * c),
        "lang": pa.array(["en"] * c),
        "source": pa.array(["s0"] * c),
        "n_chars": pa.array([23] * c, pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    out = REGISTRY["soft_dedup_weights"].fn(str(d))
    assert int(out["raw_words"].iloc[0]) == c * words
    assert int(out["eff_uwords"].iloc[0]) == c * ((words * 1_000_000) // c)
    assert int(out["dup_docs"].iloc[0]) == c
