"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _t, grouped_sums, np, pa, pc, pd, topk  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 35: skip-gram context-pair generation
# ---------------------------------------------------------------------------

_SG_WINDOW = 2


def q_skipgram_pairs(sf_dir: str) -> pd.DataFrame:
    """Skip-gram (center, context) pair generation with window ±2 (Mikolov
    et al. 2013) — the word2vec training-corpus primitive that pairs with
    `vocab_id_assignment` and `negative_sampling_table`: every in-document
    position emits its ≤4 context words, pairs count through one combiner
    exchange, top-20 by frequency.  The pair emission is two shifted
    vectorized views per offset over the shared flat word buffer — no
    per-row Python."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def pairs(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        vals = lst.values
        L = len(vals)
        w = vals.to_numpy(zero_copy_only=False)
        frames = []
        for d in range(1, _SG_WINDOW + 1):
            if L <= d:
                continue
            idx = np.arange(L - d, dtype=np.int64)
            doc_of = np.searchsorted(off, idx, side="right") - 1
            valid = idx + d < off[doc_of + 1]
            a = w[:-d][valid]
            b = w[d:][valid]
            frames.append(pd.DataFrame({"center": a, "context": b}))
            frames.append(pd.DataFrame({"center": b, "context": a}))
        if not frames:
            return pd.DataFrame({"center": pd.Series([], dtype=object),
                                 "context": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.concat(frames, ignore_index=True)
        df["n"] = 1
        return df.groupby(["center", "context"], as_index=False).sum()

    counts = grouped_sums(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["center", "context"],
        {"n": "n"},
    )
    out = topk(counts, ["n", "center", "context"], [True, False, False], 20).to_pandas()
    return _i64(out, ["n"]).reset_index(drop=True)


SQL_SKIPGRAM_PAIRS = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (
  SELECT ws[g.i] AS center, ws[h.j] AS context
  FROM w,
       unnest(generate_series(1, len(ws))) AS g(i),
       unnest([g.i - {_SG_WINDOW}, g.i - 1, g.i + 1, g.i + {_SG_WINDOW}]) AS h(j)
  WHERE h.j BETWEEN 1 AND len(ws))
SELECT center, context, COUNT(*) AS n
FROM p GROUP BY 1, 2
ORDER BY n DESC, center, context LIMIT 20
"""


