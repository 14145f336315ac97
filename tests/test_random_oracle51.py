"""Randomized oracle tests, part 51: wave-59 queries — log-rank O−E on the
random star schema (the even/odd split is exchangeable, so |Σ(O−E)| stays
small relative to total deaths) and the activity transition matrix
(identities: per month-pair all four cells sum to the customer base)."""

import numpy as np
import pandas as pd
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare

W59 = ["logrank_groups", "activity_transition_matrix"]


@pytest.mark.parametrize("seed", [359, 367])
def test_random_logrank_activity(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w59s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    for name in W59:
        spec = REGISTRY[name]
        got = spec.fn(d)
        want = con.execute(spec.sql).df()
        assert not compare(name, got, want), name
    atm = REGISTRY["activity_transition_matrix"].fn(d)
    if len(atm):
        totals = (atm["stay_active"] + atm["churned"] + atm["reactivated"]
                  + atm["stay_inactive"])
        assert totals.nunique() == 1  # every month pair covers the full base
