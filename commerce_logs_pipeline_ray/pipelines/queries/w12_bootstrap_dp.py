"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 12: Poisson-bootstrap CI + differentially-private count release
# ---------------------------------------------------------------------------

_PB_B = 64          # bootstrap replicates
_PB_A = 2654435761  # Knuth multiplicative constant
_PB_C = 40503
_PB_M = 2_147_483_648
# Poisson(1) CDF thresholds (k = 0..6; u beyond the last bucket -> weight 7)
_PB_CDF = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
           0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
           0.999916758850712)


def q_poisson_bootstrap_ci(sf_dir: str) -> pd.DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value — the
    WEB-SCALE bootstrap: instead of gathering n×B resamples, every row
    derives its own deterministic Poisson(1) weight per replicate from a
    hash of (event_id, b), so the corpus is read ONCE and the only exchange
    is B weighted-sum partials per block.  CI = 2nd / 63rd order statistic
    of the 64 replicate means.  The oracle explodes events × replicates and
    must reproduce the weights bit-exactly from the same integer hash."""
    ds = _t(sf_dir, "events", ["event_id", "value"])
    cdf = np.asarray(_PB_CDF)

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = t["value"].to_numpy(zero_copy_only=False)
        b = np.arange(1, _PB_B + 1, dtype=np.int64)
        h = (ids[:, None] * np.int64(_PB_A) + b[None, :] * np.int64(_PB_C)) \
            % np.int64(_PB_M)
        w = np.searchsorted(cdf, h / float(_PB_M), side="right").astype(np.float64)
        return pd.DataFrame({
            "b": b,
            "sw": w.sum(axis=0),
            "swv": (w * val[:, None]).sum(axis=0),
            "n": np.full(_PB_B, len(ids), np.int64),
            "sv": np.full(_PB_B, float(val.sum()), np.float64),
        })

    parts = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["b"], {"sw": "sw", "swv": "swv", "n": "n", "sv": "sv"},
        reduce="driver",
    ).to_pandas().sort_values("b", ignore_index=True)
    means = np.sort((parts["swv"] / parts["sw"]).to_numpy())
    n = int(parts["n"].iloc[0])
    point = float(parts["sv"].iloc[0]) / n
    out = pd.DataFrame([{
        "n": n, "b": _PB_B,
        "point_mean": _rd(point, 6),
        "ci_lo": _rd(float(means[1]), 6),
        "ci_hi": _rd(float(means[_PB_B - 2]), 6),
    }])
    return _i64(out, ["n", "b"])


SQL_POISSON_BOOTSTRAP_CI = f"""
WITH r AS (SELECT CAST(b AS BIGINT) AS b FROM generate_series(1, {_PB_B}) t(b)),
w AS (
  SELECT r.b, e.value,
         CASE WHEN u < {_PB_CDF[0]!r} THEN 0 WHEN u < {_PB_CDF[1]!r} THEN 1
              WHEN u < {_PB_CDF[2]!r} THEN 2 WHEN u < {_PB_CDF[3]!r} THEN 3
              WHEN u < {_PB_CDF[4]!r} THEN 4 WHEN u < {_PB_CDF[5]!r} THEN 5
              WHEN u < {_PB_CDF[6]!r} THEN 6 ELSE 7 END AS w
  FROM events e CROSS JOIN r
  CROSS JOIN LATERAL (SELECT ((e.event_id * {_PB_A} + r.b * {_PB_C})
                              % {_PB_M}) / {_PB_M}.0 AS u) uu),
m AS (SELECT b, SUM(w * value) / SUM(w) AS mean_b FROM w GROUP BY b),
o AS (SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b) AS rn FROM m)
SELECT (SELECT COUNT(*) FROM events) AS n, {_PB_B} AS b,
       (SELECT ROUND(SUM(value) / COUNT(*), 6) FROM events) AS point_mean,
       (SELECT ROUND(mean_b, 6) FROM o WHERE rn = 2) AS ci_lo,
       (SELECT ROUND(mean_b, 6) FROM o WHERE rn = {_PB_B - 1}) AS ci_hi
"""


def q_dp_event_counts(sf_dir: str) -> pd.DataFrame:
    """Differentially-private count release (ε=1 Laplace mechanism) for the
    per-type event histogram: exact counts from one bounded combiner
    aggregate; the noise draw is the Laplace inverse-CDF applied to a
    DETERMINISTIC 48-bit uniform seeded from md5(event_type) — auditable,
    reproducible DP release, same convention as the SQL oracle.  Rounds out
    the privacy suite (k-anonymity / l-diversity / t-closeness audits)."""
    import math

    ds = _t(sf_dir, "events", ["event_type"])
    out = grouped_sums(ds, ["event_type"], {}, "n", reduce="driver"
                       ).to_pandas().sort_values("event_type",
                                                 ignore_index=True)
    noisy = []
    for et, n in zip(out["event_type"], out["n"].astype(int)):
        u = int(md5_hex_str(et)[:12], 16) / float(1 << 48)
        noise = math.log(2 * u) if u < 0.5 else -math.log(2 - 2 * u)
        noisy.append(_rd(n + noise, 6))
    out["noisy_n"] = noisy
    return _i64(out, ["n"])


def md5_hex_str(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


SQL_DP_EVENT_COUNTS = """
WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
u AS (SELECT event_type, n,
             CAST('0x' || substr(md5(event_type), 1, 12) AS BIGINT)
               / 281474976710656.0 AS u
      FROM c)
SELECT event_type, n,
       ROUND(n + CASE WHEN u < 0.5 THEN LN(2 * u) ELSE -LN(2 - 2 * u) END, 6)
         AS noisy_n
FROM u ORDER BY event_type
"""


