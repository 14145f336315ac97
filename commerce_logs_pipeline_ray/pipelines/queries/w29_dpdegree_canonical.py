"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, md5_hex, np, pa, pd, topk  # noqa: F401
from .cusum_twap import _copurchase_weighted_edges  # noqa: F401
from .w12_bootstrap_dp import md5_hex_str  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 29: DP degree histogram, quality-aware canonical selection
# ---------------------------------------------------------------------------

_DPG_CLIP = 20


def q_dp_degree_histogram(sf_dir: str) -> pd.DataFrame:
    """Differentially-private graph-degree release with edge clipping (the
    node-DP recipe: clip each node's degree at D so one node's edges move
    any bucket by ≤ 1 after projection, then Laplace(2D/ε)): co-purchase
    degrees clip at 20, histogram over 4 integer buckets, md5-seeded
    deterministic noise (dp_event_counts convention).  Degrees come from one
    bounded grouped count; the release is 4 rows."""
    import math

    edges = _copurchase_weighted_edges(sf_dir)
    deg = grouped_sums(edges, ["src"], {}, "deg").to_pandas()
    d = np.minimum(deg["deg"].to_numpy(np.int64), _DPG_CLIP)
    bucket = np.select(
        [d <= 5, d <= 10, d <= 15],
        ["1-5", "6-10", "11-15"],
        default="16-20",
    )
    g = pd.DataFrame({"bucket": bucket, "n": 1}).groupby(
        "bucket", as_index=False
    ).sum()
    noisy = []
    for b, n in zip(g["bucket"], g["n"].astype(int)):
        u = int(md5_hex_str("deg:" + str(b))[:12], 16) / float(1 << 48)
        noise = math.log(2 * u) if u < 0.5 else -math.log(2 - 2 * u)
        noisy.append(_rd(n + 2 * _DPG_CLIP * noise, 6))
    g["noisy_n"] = noisy
    out = g.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n"])


SQL_DP_DEGREE_HISTOGRAM = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
deg AS (SELECT src, LEAST(COUNT(*), {_DPG_CLIP}) AS d FROM pairs GROUP BY 1),
h AS (SELECT CASE WHEN d <= 5 THEN '1-5' WHEN d <= 10 THEN '6-10'
                  WHEN d <= 15 THEN '11-15' ELSE '16-20' END AS bucket,
             COUNT(*) AS n
      FROM deg GROUP BY 1),
u AS (SELECT bucket, n,
             CAST('0x' || substr(md5('deg:' || bucket), 1, 12) AS BIGINT)
               / 281474976710656.0 AS u
      FROM h)
SELECT bucket, n,
       ROUND(n + 2 * {_DPG_CLIP} * CASE WHEN u < 0.5 THEN LN(2 * u)
                                        ELSE -LN(2 - 2 * u) END, 6) AS noisy_n
FROM u ORDER BY bucket
"""


def q_canonical_selection(sf_dir: str) -> pd.DataFrame:
    """Quality-aware canonical selection for exact-duplicate clusters: keep
    the LONGEST copy (n_chars desc, doc_id asc) instead of the min-id — the
    survivorship policy real dedup ships, because near-identical crawls
    differ by truncation.  One content-fp bucketed exchange carries
    (fp, doc, chars) rows; argmax folds as a combiner; the 15 biggest
    clusters surface through a distributed top-k prune (singletons rank
    last), so the driver never holds the cluster table."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def tag(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {"fp": md5_hex(t["text"]).to_pylist(),
             "doc_id": t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
             "n_chars": t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)}
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def per_fp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["fp", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("fp", as_index=False).agg(
            n_copies=("doc_id", "count"),
            keeper=("doc_id", "first"),
            keeper_chars=("n_chars", "first"),
        )

    clusters = bucketed_group_reduce(tagged, ["fp"], per_fp, num_buckets=32)
    out = topk(clusters, ["n_copies", "fp"], [True, False], 15).to_pandas()
    return _i64(out, ["n_copies", "keeper", "keeper_chars"]).reset_index(drop=True)


SQL_CANONICAL_SELECTION = """
WITH d AS (SELECT doc_id, n_chars, md5(text) AS fp FROM documents),
r AS (SELECT fp, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY fp) AS n_copies
      FROM d)
SELECT fp, n_copies, doc_id AS keeper, n_chars AS keeper_chars
FROM r WHERE rk = 1
ORDER BY n_copies DESC, fp LIMIT 15
"""


