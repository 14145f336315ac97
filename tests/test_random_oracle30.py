"""Randomized oracle tests, part 30: wave-38 TPC-H final trio (Q15 tie-kept
max-revenue supplier, Q20 majority-volume suppliers, Q21 only-late supplier)
on the random star schema from part 28."""

import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare

W38 = ["top_revenue_supplier", "dominant_part_suppliers", "waiting_suppliers"]


@pytest.mark.parametrize("seed", [59, 131])
def test_random_tpch_final(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w38s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    for name in W38:
        spec = REGISTRY[name]
        got = spec.fn(d)
        want = con.execute(spec.sql).df()
        assert not compare(name, got, want), name
