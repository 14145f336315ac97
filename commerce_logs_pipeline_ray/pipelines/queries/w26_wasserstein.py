"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 26: 1-D Wasserstein shift, dictionary id assignment, exact streaming
# moments
# ---------------------------------------------------------------------------


def q_wasserstein_1d(sf_dir: str) -> pd.DataFrame:
    """Exact 1-D Wasserstein (earth-mover) distance between the treatment
    and control purchase-cents distributions — the ordered-data drift metric
    PSI can't give you: W₁ = Σ gap·|F_a−F_b| over the union support,
    computed as Σ gap·|ca·n_b − cb·n_a| in arbitrary-precision INTEGERS
    (HUGEINT on the oracle) with one double division at the very end.  The
    stream collapses to a (cents, group) histogram combiner; the support
    scan is value-bounded, not row-bounded."""
    ds = _t(sf_dir, "events", ["user_id", "event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        if not is_p.any():
            return pd.DataFrame({"cents": pd.Series([], dtype="int64"),
                                 "grp": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[is_p]
        cents = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        df = pd.DataFrame(
            {"cents": cents, "grp": np.where(uid % 2 == 1, "a", "b"), "n": 1}
        )
        return df.groupby(["cents", "grp"], as_index=False).sum()

    hist = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["cents", "grp"],
        {"n": "n"},
    ).to_pandas()
    piv = hist.pivot_table(index="cents", columns="grp", values="n",
                           aggfunc="sum", fill_value=0).sort_index()
    ca = piv.get("a", pd.Series(0, index=piv.index)).to_numpy(np.int64).cumsum()
    cb = piv.get("b", pd.Series(0, index=piv.index)).to_numpy(np.int64).cumsum()
    vals = piv.index.to_numpy(np.int64)
    na, nb = int(ca[-1]), int(cb[-1])
    num = 0
    for k in range(len(vals) - 1):
        gap = int(vals[k + 1]) - int(vals[k])
        num += gap * abs(int(ca[k]) * nb - int(cb[k]) * na)
    w1 = float("nan") if na == 0 or nb == 0 else float(num) / float(na * nb)
    out = pd.DataFrame([{"n_a": na, "n_b": nb, "w1_cents": _rd(w1, 6)}])
    return _i64(out, ["n_a", "n_b"])


SQL_WASSERSTEIN_1D = """
WITH p AS (
  SELECT CASE WHEN user_id % 2 = 1 THEN 'a' ELSE 'b' END AS grp,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
h AS (SELECT cents,
             CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS HUGEINT) AS da,
             CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS HUGEINT) AS db
      FROM p GROUP BY 1),
tot AS (SELECT SUM(da) AS na, SUM(db) AS nb FROM h),
c AS (SELECT cents,
             SUM(da) OVER (ORDER BY cents) AS ca,
             SUM(db) OVER (ORDER BY cents) AS cb,
             LEAD(cents) OVER (ORDER BY cents) AS nxt
      FROM h),
s AS (SELECT SUM((nxt - cents) * ABS(ca * (SELECT nb FROM tot)
                                     - cb * (SELECT na FROM tot))) AS num
      FROM c WHERE nxt IS NOT NULL)
SELECT CAST((SELECT na FROM tot) AS BIGINT) AS n_a,
       CAST((SELECT nb FROM tot) AS BIGINT) AS n_b,
       ROUND(CAST(num AS DOUBLE)
             / CAST((SELECT na FROM tot) * (SELECT nb FROM tot) AS DOUBLE), 6)
         AS w1_cents
FROM s
"""


def q_vocab_id_assignment(sf_dir: str) -> pd.DataFrame:
    """Dictionary-encoding id assignment (tokenizer vocab building / global
    dictionary for columnar encoding): every distinct word gets a dense id
    ordered by (first containing doc_id, word) — deterministic across
    partitionings because first-appearance is a min-combiner, not an
    arrival-order artifact.  One (word → min doc) exchange; the rank runs
    over the vocab-bounded table.  First 30 ids plus the vocab size."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def part(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        w = lst.values.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"w": w, "first_doc": ids})
        return df.groupby("w", as_index=False).min()

    firsts = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("w", as_index=False)["first_doc"]
        .min()
    )
    firsts = firsts.sort_values(["first_doc", "w"], ignore_index=True)
    firsts["vocab_id"] = np.arange(1, len(firsts) + 1, dtype=np.int64)
    firsts["vocab_size"] = len(firsts)
    out = firsts.head(30)[["vocab_id", "w", "first_doc", "vocab_size"]]
    return _i64(out.copy(), ["vocab_id", "first_doc", "vocab_size"])


SQL_VOCAB_ID_ASSIGNMENT = """
WITH w AS (
  SELECT UNNEST(string_split(text, ' ')) AS w, doc_id FROM documents),
f AS (SELECT w, MIN(doc_id) AS first_doc FROM w GROUP BY 1),
r AS (SELECT w, first_doc,
             ROW_NUMBER() OVER (ORDER BY first_doc, w) AS vocab_id,
             COUNT(*) OVER () AS vocab_size
      FROM f)
SELECT vocab_id, w, first_doc, CAST(vocab_size AS BIGINT) AS vocab_size
FROM r ORDER BY vocab_id LIMIT 30
"""


def q_streaming_moments(sf_dir: str) -> pd.DataFrame:
    """Exact mergeable moments (mean/variance/skewness/kurtosis) of purchase
    cents from raw power sums S₁..S₄ — S₄ overflows int64 (cents⁴ × rows ≈
    10²⁶), so per-batch partials carry S₃/S₄ as DECIMAL-free STRINGS of
    arbitrary-precision Python ints and the driver folds them exactly; the
    oracle sums the same powers in HUGEINT.  The classic estimator closes
    from the six exact sums in identical double expressions on both
    engines.  One combiner pass, scalar exchange."""
    import math

    ds = _t(sf_dir, "events", ["event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        is_p = pc.equal(t["event_type"], "purchase").to_numpy(zero_copy_only=False)
        cents = _rd(t["value"].to_numpy(zero_copy_only=False)[is_p] * 100.0, 0).astype(np.int64)
        c = [int(x) for x in cents]
        # s2 rides the same arbitrary-precision string channel as s3/s4:
        # cents² is ~1e14, so a batch of ~9e4 max-value rows would already
        # brush 2^63 in an int64 partial while the oracle sums in HUGEINT.
        return pd.DataFrame(
            {"n": [len(c)], "s1": [str(sum(c))], "s2": [str(sum(x * x for x in c))],
             "s3": [str(sum(x ** 3 for x in c))], "s4": [str(sum(x ** 4 for x in c))]}
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(p["n"].sum())
    s1 = sum(int(x) for x in p["s1"])
    s2 = sum(int(x) for x in p["s2"])
    s3 = sum(int(x) for x in p["s3"])
    s4 = sum(int(x) for x in p["s4"])
    m = float(s1) / float(n)
    ex2 = float(s2) / float(n)
    ex3 = float(s3) / float(n)
    ex4 = float(s4) / float(n)
    var = ex2 - m * m
    skew = (ex3 - 3.0 * m * ex2 + 2.0 * m * m * m) / math.pow(var, 1.5)
    kurt = (ex4 - 4.0 * m * ex3 + 6.0 * m * m * ex2 - 3.0 * m * m * m * m) / (var * var)
    out = pd.DataFrame(
        [{"n": n, "mean_cents": _rd(m, 6), "var_cents": _rd(var, 6),
          "skewness": _rd(skew, 6), "kurtosis": _rd(kurt, 6)}]
    )
    return _i64(out, ["n"])


SQL_STREAMING_MOMENTS = """
WITH p AS (
  SELECT CAST(ROUND(value * 100, 0) AS HUGEINT) AS c
  FROM events WHERE event_type = 'purchase'),
s AS (SELECT COUNT(*) AS n, SUM(c) AS s1, SUM(c * c) AS s2,
             SUM(c * c * c) AS s3, SUM(c * c * c * c) AS s4
      FROM p),
e AS (SELECT n,
             CAST(s1 AS DOUBLE) / n AS m,
             CAST(s2 AS DOUBLE) / n AS ex2,
             CAST(s3 AS DOUBLE) / n AS ex3,
             CAST(s4 AS DOUBLE) / n AS ex4
      FROM s),
v AS (SELECT n, m, ex2, ex3, ex4, ex2 - m * m AS var FROM e)
SELECT n, ROUND(m, 6) AS mean_cents, ROUND(var, 6) AS var_cents,
       ROUND((ex3 - 3.0 * m * ex2 + 2.0 * m * m * m) / POWER(var, 1.5), 6)
         AS skewness,
       ROUND((ex4 - 4.0 * m * ex3 + 6.0 * m * m * ex2 - 3.0 * m * m * m * m)
             / (var * var), 6) AS kurtosis
FROM v
"""


