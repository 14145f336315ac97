"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd  # noqa: F401
from .w12_bootstrap_dp import md5_hex_str  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 27: top-p nucleus vocab cut, DP clipped mean
# ---------------------------------------------------------------------------

_NUCLEUS_NUM = 9
_NUCLEUS_DEN = 10


def q_nucleus_vocab_cut(sf_dir: str) -> pd.DataFrame:
    """Top-p (nucleus) vocabulary cut per source — the vocab-truncation
    analysis behind nucleus sampling and frequency-pruned tokenizers: the
    smallest prefix of the frequency-sorted vocabulary covering ≥ 90% of
    token mass, with the threshold ⌈0.9·total⌉ taken in INTEGERS so the cut
    index is exact.  One (source, word) combiner exchange; the cut scan runs
    per source over its vocab-bounded histogram."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["source", "text"])

    def wc(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        src = np.repeat(np.asarray(t["source"].to_pylist(), dtype=object), lens)
        w = lst.values.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": src, "w": w, "c": 1})
        return df.groupby(["source", "w"], as_index=False).sum()

    counts = grouped_sums(
        ds.map_batches(wc, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "w"],
        {"c": "c"},
    )

    def per_source(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in df.groupby("source", sort=True):
            g = g.sort_values(["c", "w"], ascending=[False, True], kind="stable")
            c = g["c"].to_numpy(np.int64)
            tot = int(c.sum())
            thresh = (_NUCLEUS_NUM * tot + _NUCLEUS_DEN - 1) // _NUCLEUS_DEN
            cum = np.cumsum(c)
            k = int(np.searchsorted(cum, thresh))
            rows.append((src, len(c), tot, k + 1, int(cum[k])))
        return pd.DataFrame(
            rows,
            columns=["source", "vocab_size", "total_words", "n_nucleus",
                     "nucleus_mass"],
        )

    out = (
        bucketed_group_reduce(counts, ["source"], per_source, num_buckets=16)
        .to_pandas()
        .sort_values("source", ignore_index=True)
    )
    return _i64(out, ["vocab_size", "total_words", "n_nucleus", "nucleus_mass"])


SQL_NUCLEUS_VOCAB_CUT = f"""
WITH w AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS wd FROM documents),
cnt AS (SELECT source, wd, COUNT(*) AS c FROM w GROUP BY 1, 2),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS total_words,
               COUNT(*) AS vocab_size
        FROM cnt GROUP BY 1),
r AS (SELECT source, c,
             SUM(c) OVER (PARTITION BY source ORDER BY c DESC, wd) AS cum,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, wd) AS rn
      FROM cnt),
cut AS (
  SELECT r.source, MIN(r.rn) AS n_nucleus
  FROM r JOIN tot ON tot.source = r.source
  WHERE r.cum >= ({_NUCLEUS_NUM} * tot.total_words + {_NUCLEUS_DEN} - 1)
                 // {_NUCLEUS_DEN}
  GROUP BY 1),
mass AS (
  SELECT r.source, CAST(r.cum AS BIGINT) AS nucleus_mass, r.rn
  FROM r JOIN cut ON cut.source = r.source AND cut.n_nucleus = r.rn)
SELECT tot.source, tot.vocab_size, tot.total_words,
       CAST(cut.n_nucleus AS BIGINT) AS n_nucleus, mass.nucleus_mass
FROM tot JOIN cut ON cut.source = tot.source
JOIN mass ON mass.source = tot.source
ORDER BY tot.source
"""


_DP_CLIP = 10_000  # cents


def q_dp_clipped_mean(sf_dir: str) -> pd.DataFrame:
    """Differentially-private mean release (ε=1, clip-and-Laplace — the
    standard bounded-sensitivity recipe): per-type event cents clip to
    [0, 10000], the
    exact clipped sum gets Laplace noise of scale C/ε from the md5-seeded
    deterministic uniform (dp_event_counts convention, LN parity), and the
    released mean divides by the exact count.  One combiner exchange; noise
    applies to bounded per-type rows driver-side."""
    import math

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        cents = _rd(t["value"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        clipped = np.minimum(np.maximum(cents, 0), _DP_CLIP)
        typ = np.asarray(t["event_type"].to_pylist(), dtype=object)
        df = pd.DataFrame({"event_type": typ, "n": 1, "s": clipped})
        return df.groupby("event_type", as_index=False).sum()

    g = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"],
        {"n": "n", "s": "s"},
    ).to_pandas().sort_values("event_type", ignore_index=True)
    rel = []
    for et, n, s in zip(g["event_type"], g["n"].astype(int), g["s"].astype(int)):
        u = int(md5_hex_str(str(et) + ":mean")[:12], 16) / float(1 << 48)
        noise = math.log(2 * u) if u < 0.5 else -math.log(2 - 2 * u)
        rel.append(_rd((float(s) + _DP_CLIP * noise) / float(n), 6))
    g["noisy_mean"] = rel
    return _i64(g, ["n", "s"])


SQL_DP_CLIPPED_MEAN = f"""
WITH p AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(ROUND(value * 100, 0) AS BIGINT), 0), {_DP_CLIP}) AS c
  FROM events),
g AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s
      FROM p GROUP BY 1),
u AS (SELECT event_type, n, s,
             CAST('0x' || substr(md5(event_type || ':mean'), 1, 12) AS BIGINT)
               / 281474976710656.0 AS u
      FROM g)
SELECT event_type, n, s,
       ROUND((CAST(s AS DOUBLE)
              + {_DP_CLIP} * CASE WHEN u < 0.5 THEN LN(2 * u)
                                  ELSE -LN(2 - 2 * u) END)
             / CAST(n AS DOUBLE), 6) AS noisy_mean
FROM u ORDER BY event_type
"""


