"""Randomized oracle tests, part 44: wave-52 queries — item-item cosine
top-k on the random star schema and the freshness audit on random events
(a planted long-stale event type)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR, REGISTRY
from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir
from tests.test_random_oracle28 import _con_for, _star
from tests.test_random_oracle31 import _events
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


@pytest.mark.parametrize("seed", [293, 307])
def test_random_itemsim_fresh(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w52s{seed}"))
    _star(seed, d)
    _events(seed + 2, d)
    # plant a stale type: push every 'error' event 20 days before the rest
    t = pq.read_table(f"{d}/events.parquet").to_pandas()
    err = t["event_type"] == "error"
    t.loc[err, "ts"] = t.loc[err, "ts"] - pd.Timedelta(days=20)
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False),
                   f"{d}/events.parquet")
    con = _con_for(d)
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _run("item_similarity_topk", d, con)
    got = _run("freshness_audit", d, con)
    stale = got.set_index("event_type")["stale_days"]
    assert stale.get("error", 0) >= 15
