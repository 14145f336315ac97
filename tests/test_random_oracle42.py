"""Randomized oracle tests, part 42: wave-50 queries — Kaplan-Meier over
random order spans (single-order customers give t=0 spikes; the censor
window planted near the horizon) and candidate-key profiling (orders keys
made deliberately non-unique to flip the verdict)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tests.test_random_oracle31 import _events
from tools.check_queries import compare

W50 = ["kaplan_meier_survival", "candidate_key_audit"]


@pytest.mark.parametrize("seed", [271, 277])
def test_random_survival_keys(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w50s{seed}"))
    _star(seed, d)
    _events(seed + 1, d)
    if seed % 2:  # duplicate an orderkey so o_orderkey stops being a key
        t = pq.read_table(f"{d}/orders.parquet").to_pandas()
        t.loc[1, "o_orderkey"] = t.loc[0, "o_orderkey"]
        pq.write_table(pa.Table.from_pandas(t, preserve_index=False),
                       f"{d}/orders.parquet")
    con = _con_for(d)
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    for name in W50:
        spec = REGISTRY[name]
        got = spec.fn(d)
        want = con.execute(spec.sql).df()
        assert not compare(name, got, want), name
