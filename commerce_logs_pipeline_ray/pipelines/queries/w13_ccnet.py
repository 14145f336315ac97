"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _i64, grouped_sums, np, pa, pd, rd  # noqa: F401
from .neardup_a import ensure_derived_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 13: CCNet-style perplexity bucketing
# ---------------------------------------------------------------------------


def q_ccnet_perplexity_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): an add-one
    unigram LM is fit on the REFERENCE half of the corpus (docs with an
    even token count — a deterministic, fully vectorizable split), every
    doc is scored in integer µnats-per-token, and docs split into
    head/middle/tail by exact integer terciles; the report is each source's
    bucket composition.  One token-count exchange (full-vocab keys carry
    reference counts so unseen-token smoothing is a plain lookup), one
    broadcast-cost scoring pass, one bounded (source × bucket) reduce —
    the doc corpus itself is never shuffled."""
    import math as _math

    import ray as _ray

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir),
                         columns=["source", "tokens"],
                         override_num_blocks=8)

    def count_part(t: pa.Table) -> pd.DataFrame:
        from ...functions.tokens import _flat_tokens

        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        flat = values[offsets[0]:offsets[-1]].astype(np.int64)
        lens = starts[1:] - starts[:-1]
        is_ref = np.repeat(lens % 2 == 0, lens)
        keys, inv = np.unique(flat, return_inverse=True)
        n_all = np.bincount(inv, minlength=len(keys)).astype(np.int64)
        n_ref = np.bincount(inv, weights=is_ref.astype(np.float64),
                            minlength=len(keys)).astype(np.int64)
        return pd.DataFrame({"tok": keys, "n_all": n_all, "n_ref": n_ref})

    cnt = grouped_sums(
        ds.map_batches(count_part, batch_format="pyarrow", zero_copy_batch=True),
        ["tok"], {"n_all": "n_all", "n_ref": "n_ref"},
    ).to_pandas().sort_values("tok", ignore_index=True)
    vocab = len(cnt)
    t_ref = int(cnt["n_ref"].sum())
    denom = float(t_ref + vocab)
    cost = {
        int(tok): int(round(-_math.log((int(c) + 1) / denom) * 1_000_000))
        for tok, c in zip(cnt["tok"], cnt["n_ref"])
    }
    cost_ref = _ray.put(cost)

    def score_part(t: pa.Table) -> pd.DataFrame:
        from ...functions.tokens import _flat_tokens

        cst = _ray.get(cost_ref)
        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        flat = values[offsets[0]:offsets[-1]].astype(np.int64)
        lens = starts[1:] - starts[:-1]
        keys = np.fromiter(cst.keys(), np.int64, len(cst))
        vals = np.fromiter(cst.values(), np.int64, len(cst))
        order = np.argsort(keys)
        costs = vals[order][np.searchsorted(keys[order], flat)]
        nll = np.add.reduceat(costs, np.r_[np.int64(0), np.cumsum(lens)[:-1]]) \
            if len(flat) else np.zeros(len(lens), np.int64)
        keep = lens > 0
        score = (nll[keep] * np.int64(1_000_000)) // lens[keep]
        src = np.asarray(t["source"].to_pylist(), dtype=object)[keep]
        return pd.DataFrame({"source": src, "score": score})

    scored = ds.map_batches(score_part, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    hist = grouped_sums(scored, ["score"], {}, "n", reduce="driver"
                        ).to_pandas().sort_values("score", ignore_index=True)
    n = int(hist["n"].sum())
    cum = hist["n"].cumsum()
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    b1 = int(hist["score"][cum >= k1].iloc[0])
    b2 = int(hist["score"][cum >= k2].iloc[0])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        s = df["score"].to_numpy(np.int64)
        b = np.where(s <= b1, "head", np.where(s <= b2, "middle", "tail"))
        out = pd.DataFrame({"source": df["source"], "bucket": b})
        return out.groupby(["source", "bucket"], as_index=False).size() \
                  .rename(columns={"size": "n_docs"})

    out = grouped_sums(
        scored.map_batches(bucketize, batch_format="pandas"),
        ["source", "bucket"], {"n_docs": "n_docs"}, reduce="driver",
    ).to_pandas().sort_values(["source", "bucket"], ignore_index=True)
    return _i64(out, ["n_docs"])


SQL_CCNET_PERPLEXITY_BUCKETS = f"""
WITH tok AS (
  SELECT doc_id, source, len(tokens) AS nt, UNNEST(tokens) AS t
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
cnt AS (SELECT t, COUNT(*) FILTER (WHERE nt % 2 = 0) AS n_ref FROM tok GROUP BY t),
dims AS (SELECT COUNT(*) AS v, CAST(SUM(n_ref) AS BIGINT) AS tr FROM cnt),
cost AS (
  SELECT t, CAST(ROUND(-LN((n_ref + 1)
             / CAST((SELECT tr + v FROM dims) AS DOUBLE)) * 1000000)
           AS BIGINT) AS u
  FROM cnt),
doc AS (
  SELECT doc_id, source,
         (CAST(SUM(u) AS BIGINT) * 1000000) // COUNT(*) AS score
  FROM tok JOIN cost USING (t) GROUP BY doc_id, source),
dims2 AS (SELECT COUNT(*) AS n FROM doc),
b1 AS (SELECT score AS b FROM doc ORDER BY score
       LIMIT 1 OFFSET (SELECT (n + 2) // 3 - 1 FROM dims2)),
b2 AS (SELECT score AS b FROM doc ORDER BY score
       LIMIT 1 OFFSET (SELECT (2 * n + 2) // 3 - 1 FROM dims2))
SELECT source,
       CASE WHEN score <= (SELECT b FROM b1) THEN 'head'
            WHEN score <= (SELECT b FROM b2) THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs
FROM doc GROUP BY 1, 2 ORDER BY source, bucket
"""


