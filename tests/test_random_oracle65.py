"""Randomized oracle tests, part 65: wave-73 queries — MDE (the 1/√n
scaling law: a nation with 4× the events must show ~half the MDE at equal
rates) and the aspect-ratio audit on the random star + events corpora."""

import numpy as np
import pandas as pd
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tests.test_random_oracle31 import _events
from tools.check_queries import compare


@pytest.mark.parametrize("seed", [521, 523])
def test_random_power_mde(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w73s{seed}"))
    _star(seed, d)
    _events(seed + 7, d)
    con = _con_for(d)
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    spec = REGISTRY["abtest_power_mde"]
    got = spec.fn(d)
    want = con.execute(spec.sql).df()
    assert not compare("abtest_power_mde", got, want)
    # 1/sqrt(n) law: across nations, mde²·n should be ~proportional to
    # p(1−p); check the rough monotone relation on the two extreme rows
    if len(got) >= 2:
        big = got.sort_values("n_events").iloc[-1]
        small = got.sort_values("n_events").iloc[0]
        if big["n_events"] >= 4 * small["n_events"]:
            assert big["mde_ppm"] < small["mde_ppm"]
