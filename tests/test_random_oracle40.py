"""Randomized oracle tests, part 40: wave-48 queries — odds-ratio keyness
(a source-exclusive planted word must surface with the Haldane correction)
and LCS of the top-2 users (the vectorized prefix-max sweep vs the scalar
Wagner-Fischer artifact, plus a direct fuzz of the identity)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tests.test_random_oracle31 import _events
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


@pytest.mark.parametrize("seed", [241, 251])
def test_random_keyness_lcs(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w48s{seed}"))
    rng = np.random.default_rng(seed)
    n = 180
    texts, sources = [], []
    for i in range(n):
        src = "src0" if i % 3 == 0 else f"src{1 + i % 2}"
        words = list(rng.choice(VOCAB, rng.integers(2, 40)))
        if src == "src0" and rng.random() < 0.6:
            words.append("exclusiveterm")  # src0-only keyword
        texts.append(" ".join(words))
        sources.append(src)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(sources),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    _events(seed, d)
    con = duckdb.connect()
    for t in ["documents", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    _run("keyness_odds_ratio", d, con)
    _run("lcs_event_sequences", d, con)
    got = REGISTRY["keyness_odds_ratio"].fn(d)
    assert got.iloc[0]["word"] == "exclusiveterm"
