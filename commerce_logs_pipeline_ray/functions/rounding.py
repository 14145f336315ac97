"""The ONE shared rounding convention for every query/oracle pair.

numpy/pandas round half-to-even while DuckDB ``ROUND`` rounds half away
from zero (std::round), so a pandas ``Series.round(6)`` mirrored by SQL
``ROUND(x, 6)`` diverges on any quotient landing exactly on a half
boundary — reachable with innocent group sizes: 1/128 = 0.0078125 →
pandas 0.007812, DuckDB 0.007813.  Every Python-side rounding that mirrors
a SQL ``ROUND`` must go through :func:`round_like_duckdb` (imported as
``_rd`` across the codebase).

Arrow's ``pc.round(..., round_mode="half_towards_infinity")`` is bitwise-
identical to DuckDB at ``ndigits=0`` (validated over ~1.2M values) and is
used for the cent conversions; at 6+ digits Arrow's scaling differs from
DuckDB's by 1 ulp on large magnitudes, so fractional-digit mirroring uses
this numpy implementation, validated bitwise against DuckDB over ~1.7M
values including planted half boundaries (tests/test_rounding_convention.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def round_like_duckdb(x, digits: int = 6):
    """Round mirroring DuckDB ``ROUND(x, digits)`` BITWISE.

    Scales, rounds half-away via floor+remainder (no ``+0.5`` ulp hazard),
    unscales with the same division DuckDB performs, keeps ``-0.0``
    (rounding never crosses zero) and passes non-finite/overflow inputs
    through.  Accepts scalars, numpy arrays and pandas Series (use
    ``s.pipe(_rd, d)`` in method chains)."""
    arr = np.asarray(x, dtype=np.float64)
    p = np.float64(10.0) ** digits
    with np.errstate(over="ignore", invalid="ignore"):
        y = arr * p
        f = np.floor(y)
        r = y - f
        out = (f + (r > 0.5) + ((r == 0.5) & (y > 0))) / p
        out = np.copysign(out, arr)
        out = np.where(np.isfinite(y), out, arr)
    if isinstance(x, pd.Series):
        return pd.Series(out, index=x.index, name=x.name)
    if np.ndim(x) == 0:
        return float(out)
    return out
