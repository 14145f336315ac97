"""Randomized oracle tests, part 39: wave-47 queries — decision-stump Gini
scores (all-purchase and no-purchase corpora exercise the pos==n / pos==0
degenerate splits) and the vocab pruning curve (vocab smaller than the
largest cutoff exercises the coverage clamp)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle31 import _events
from tools.check_queries import compare


def _run(name, d, con):
    spec = REGISTRY[name]
    got = spec.fn(d)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.execute(spec.sql).df()
    assert not compare(name, got, want), name


@pytest.mark.parametrize("seed,forced_type", [(157, None), (229, "purchase"),
                                              (233, "view")])
def test_random_stump(seed, forced_type, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w47s{seed}"))
    _events(seed, d)
    if forced_type is not None:  # degenerate single-class corpus
        t = pq.read_table(f"{d}/events.parquet")
        t = t.set_column(t.schema.get_field_index("event_type"), "event_type",
                         pa.array([forced_type] * len(t)))
        pq.write_table(t, f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run("decision_stump_split", d, con)


@pytest.mark.parametrize("seed,vocab_n", [(163, 30), (239, 4)])
def test_random_vocab_curve(seed, vocab_n, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w47v{seed}"))
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(vocab_n)]
    n = 150
    texts = [" ".join(rng.choice(vocab, rng.integers(2, 40))) for _ in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s0"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    _run("vocab_pruning_curve", d, con)
