"""Randomized oracle tests, part 45: wave-53 queries — Dunning LLR keywords
(the planted src0-exclusive word must dominate) and true-DL linkage on a
random part corpus (its result must be a SUPERSET of the Levenshtein
linkage: transpositions only rescue pairs, never drop them)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tests.test_random_oracle33 import VOCAB
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(d))
    want = con.execute(sql).df()
    assert not compare(name, got, want), name
    return got


@pytest.mark.parametrize("seed", [311, 313])
def test_random_llr_damerau(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w53s{seed}"))
    rng = np.random.default_rng(seed)
    n = 160
    texts, sources = [], []
    for i in range(n):
        src = "src0" if i % 3 == 0 else "src1"
        words = list(rng.choice(VOCAB, rng.integers(2, 40)))
        if src == "src0":
            words += ["plantedkey"] * int(rng.integers(1, 4))
        texts.append(" ".join(words))
        sources.append(src)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    keys = np.sort(rng.choice(np.arange(1, 4000), 250, replace=False)).astype(np.int64)
    pq.write_table(pa.table({
        "p_partkey": pa.array(keys),
        "p_name": pa.array([f"{rng.choice(['cold', 'hot'])} widget" for _ in keys]),
        "p_brand": pa.array(["Brand#1"] * len(keys)),
        "p_type": pa.array(["STANDARD"] * len(keys)),
        "p_size": pa.array(np.ones(len(keys), np.int32)),
        "p_retailprice": pa.array(np.ones(len(keys))),
    }), f"{d}/part.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    got = _run("dunning_llr_keywords", d, con)
    assert got.iloc[0]["word"] == "plantedkey"
    dl = _run("damerau_linkage", d, con)
    lev = REGISTRY["record_linkage"].fn(d)
    lev_pairs = set(zip(lev["id_a"], lev["id_b"]))
    dl_pairs = set(zip(dl["id_a"], dl["id_b"]))
    assert lev_pairs <= dl_pairs
