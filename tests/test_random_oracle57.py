"""Randomized oracle tests, part 57: wave-65 apportionment — random star
schemas plus the invariants: each method hands out exactly 100 seats, and
Sainte-Laguë never favors the largest party more than D'Hondt does (the
textbook large-party-bias ordering)."""

import numpy as np
import pytest

from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY
from tests.test_random_oracle28 import _con_for, _star
from tools.check_queries import compare


@pytest.mark.parametrize("seed", [421, 431])
def test_random_apportionment(seed, ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"w65s{seed}"))
    _star(seed, d)
    con = _con_for(d)
    spec = REGISTRY["seat_apportionment_compare"]
    got = spec.fn(d)
    want = con.execute(spec.sql).df()
    assert not compare("seat_apportionment_compare", got, want)
    assert got["dhondt_seats"].sum() == 100
    assert got["slague_seats"].sum() == 100
    top = got.sort_values(["votes", "n_name"],
                          ascending=[False, True]).iloc[0]
    assert top["dhondt_seats"] >= top["slague_seats"]  # D'Hondt's big-party bias
