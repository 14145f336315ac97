"""The shared rounding convention (functions/rounding.py) vs DuckDB ROUND —
BITWISE, over planted half boundaries and dense quotient grids.

pandas/numpy round half-to-even, DuckDB half-away-from-zero: a
``Series.round(6)`` mirrored by ``ROUND(x, 6)`` flips the driver's value
hash on quotients like 1/128 (= 0.0078125 exactly).  Every Python-side
rounding that mirrors SQL goes through ``round_like_duckdb`` — this test
is the contract."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from commerce_logs_pipeline_ray.functions.rounding import round_like_duckdb as _rd


def _sweep_values() -> np.ndarray:
    rng = np.random.default_rng(0)
    vals = []
    # every quotient a/b for b ≤ 300 (group-ratio shapes), both signs
    for b in range(1, 301):
        a = np.arange(0, b + 1, dtype=np.float64)
        vals += [a / b, -a / b]
    vals.append(rng.uniform(-1e6, 1e6, 100_000))
    vals.append(rng.normal(0, 1e-6, 50_000))
    # exact half boundaries at every digit count we mirror
    for d in (0, 2, 3, 5, 6, 8, 9):
        k = rng.integers(-(10**6), 10**6, 20_000).astype(np.float64)
        vals.append((2 * k + 1) / (2 * 10.0**d))
    vals.append(np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e300, -1e300, 5e-324]))
    return np.concatenate(vals)


@pytest.mark.parametrize("digits", [0, 2, 3, 5, 6, 8, 9])
def test_round_like_duckdb_bitwise(digits):
    x = _sweep_values()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": x}))
    want = con.execute(f"SELECT ROUND(x, {digits}) AS r FROM t").df()["r"].to_numpy()
    got = np.asarray(_rd(x, digits))
    eq = (got.view(np.uint64) == want.view(np.uint64)) | (np.isnan(got) & np.isnan(want))
    bad = np.nonzero(~eq)[0]
    assert len(bad) == 0, [(x[i], got[i], want[i]) for i in bad[:5]]


def test_arrow_half_towards_infinity_at_zero_digits_bitwise():
    """The cent conversions use pc.round(..., 0, half_towards_infinity) —
    must equal DuckDB ROUND(x) bitwise (validated here; at 6+ digits Arrow
    drifts 1 ulp on large magnitudes, which is why fractional mirroring
    uses round_like_duckdb instead)."""
    x = _sweep_values()
    x = x[np.isfinite(x)]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": x}))
    want = con.execute("SELECT ROUND(x, 0) AS r FROM t").df()["r"].to_numpy()
    got = pc.round(pa.array(x), ndigits=0, round_mode="half_towards_infinity").to_numpy()
    eq = (got.view(np.uint64) == want.view(np.uint64)) | (np.isnan(got) & np.isnan(want))
    assert (~eq).sum() == 0


def test_pandas_round_would_diverge():
    """Sanity: the hazard is real — plain pandas .round(6) disagrees with
    DuckDB on the planted boundary, so the helper is load-bearing."""
    x = pd.Series([1 / 128, 9 / 128])
    con = duckdb.connect()
    duck = con.execute("SELECT ROUND(CAST(1 AS DOUBLE)/128, 6)").fetchone()[0]
    assert float(x.round(6).iloc[0]) != duck
    assert _rd(x).iloc[0] == duck


def test_scalar_and_series_forms_agree():
    vals = [1 / 128, -1 / 128, 0.5, -0.5, 2.675, 0.0, -0.0]
    s = pd.Series(vals)
    out_s = _rd(s)
    for v, r in zip(vals, out_s):
        assert _rd(v) == r or (np.isnan(r) and np.isnan(_rd(v)))
    assert isinstance(_rd(0.25), float)
    assert isinstance(out_s, pd.Series)
