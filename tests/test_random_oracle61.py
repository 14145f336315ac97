"""Randomized oracle tests, part 61: wave-69 hierarchy rollup on the random
star schema — plus tree identities: region shares sum to 10⁶ (up to trunc
slack) and every nation's share_of_parent ≤ 10⁶."""

import numpy as np
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare


@pytest.mark.parametrize("seed", [467, 479])
def test_random_hierarchy(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w69s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    spec = REGISTRY["hierarchy_rollup_shares"]
    got = spec.fn(d)
    want = con.execute(spec.sql).df()
    assert not compare("hierarchy_rollup_shares", got, want)
    regions = got[got["level"] == 0]
    assert 1_000_000 - len(regions) <= regions["share_total_ppm"].sum() <= 1_000_000
    assert (got["share_parent_ppm"] <= 1_000_000).all()
