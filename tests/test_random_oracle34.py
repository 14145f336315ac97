"""Randomized oracle tests, part 34: wave-42 queries — per-brand OLS price
trend (negative slopes exercise the truncating-division sign parity),
Herfindahl concentration, and integer percent-rank (duplicate prices
exercise RANK tie semantics) on the random star schema from part 28."""

import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare

W42 = ["ols_price_trend", "herfindahl_by_nation", "percent_rank_prices"]


@pytest.mark.parametrize("seed", [101, 179])
def test_random_ols_hhi(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w42s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    for name in W42:
        spec = REGISTRY[name]
        got = spec.fn(d)
        want = con.execute(spec.sql).df()
        assert not compare(name, got, want), name
