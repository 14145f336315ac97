"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _t, grouped_sums, np, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 17: sorted-adjacent LCP audit (suffix-array-style dedup prefilter),
# Bradley-Terry preference scoring
# ---------------------------------------------------------------------------


def q_adjacent_lcp_audit(sf_dir: str) -> pd.DataFrame:
    """Sorted-adjacent longest-common-prefix audit — the suffix-array-style
    dedup prefilter: sort the corpus by text (exact distributed ROW_NUMBER,
    rank.py's range-bucket construction), pair every document with its
    lexicographic neighbour, and histogram the word-level LCP.  Near-copies
    and shared boilerplate openings surface as long-LCP pairs without any
    all-pairs work — one rank exchange plus one pair-id exchange where each
    row rides in exactly two pairs.  The per-pair scan is expected O(1):
    random neighbours mismatch at the first word, so total compare work is
    O(pairs + Σ true-LCP), the same bound suffix-array dedup relies on."""
    from ...functions.rank import global_row_number
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    ranked, total = global_row_number(ds, "text", ["doc_id"])

    def fanout(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["rn"].to_numpy(np.int64)
        left = df.assign(pair=rn)
        right = df.assign(pair=rn - 1)
        out = pd.concat([left, right], ignore_index=True)
        out = out[(out["pair"] >= 1) & (out["pair"] <= total - 1)]
        return out[["pair", "rn", "doc_id", "text"]]

    pairs = ranked.map_batches(fanout, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pair", "rn"], ignore_index=True)
        texts = df["text"].to_numpy()
        lcps = np.zeros(len(df) // 2, dtype=np.int64)
        for p in range(0, len(df), 2):
            a = texts[p].split(" ")
            b = texts[p + 1].split(" ")
            m = min(len(a), len(b))
            l = 0
            while l < m and a[l] == b[l]:
                l += 1
            lcps[p // 2] = l
        bucket = np.select(
            [lcps == 0, lcps <= 2, lcps <= 4, lcps <= 8],
            ["0", "1-2", "3-4", "5-8"],
            default="9+",
        )
        out = pd.DataFrame({"bucket": bucket, "n_pairs": 1, "sum_lcp": lcps})
        return out.groupby("bucket", as_index=False).sum()

    hist = grouped_sums(
        bucketed_group_reduce(pairs, ["pair"], per_bucket, num_buckets=32),
        ["bucket"],
        {"n_pairs": "n_pairs", "sum_lcp": "sum_lcp"},
    ).to_pandas()
    out = hist.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n_pairs", "sum_lcp"])


SQL_ADJACENT_LCP_AUDIT = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         LAG(doc_id) OVER (ORDER BY text, doc_id) AS pid,
         LAG(string_split(text, ' ')) OVER (ORDER BY text, doc_id) AS pws
  FROM documents),
p AS (SELECT pid AS doc_a, doc_id AS doc_b, pws, ws FROM s WHERE pid IS NOT NULL),
l AS (
  SELECT doc_a, doc_b,
         COALESCE(MIN(CASE WHEN ws[g.i] IS DISTINCT FROM pws[g.i] THEN g.i END) - 1,
                  MIN(LEAST(len(ws), len(pws)))) AS lcp
  FROM p, unnest(generate_series(1, GREATEST(len(ws), len(pws)))) AS g(i)
  GROUP BY 1, 2)
SELECT CASE WHEN lcp = 0 THEN '0' WHEN lcp <= 2 THEN '1-2'
            WHEN lcp <= 4 THEN '3-4' WHEN lcp <= 8 THEN '5-8'
            ELSE '9+' END AS bucket,
       COUNT(*) AS n_pairs, CAST(SUM(lcp) AS BIGINT) AS sum_lcp
FROM l GROUP BY 1 ORDER BY bucket
"""


_BT_MU = 10**6
_BT_SCALE = 10**12


def q_bradley_terry_step(sf_dir: str) -> pd.DataFrame:
    """Bradley-Terry preference scoring (the RLHF reward-model data
    primitive) with INTEGER-exact fixed-point iterations: within each order,
    every part pair is a match won by the higher total quantity (ties to the
    smaller part id); two minorize-maximize updates
    ``p_i ← W_i / Σ_j N_ij/(p_i+p_j)`` run in µ-quantized integer arithmetic
    (c_ij = N_ij·10¹²//(u_i+u_j), u'_i = W_i·10¹²//Σc — every division is
    integer, so both engines agree bit-for-bit).  Matches reduce via one
    order-bucketed exchange to (i,j,wins,n) combiners; the ≤|parts|²-bounded
    pair table iterates driver-side.  Top-15 parts by strength."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "l_partkey"], as_index=False)["l_quantity"].sum()
        g["q"] = g["l_quantity"].astype(np.int64)
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        if m.empty:
            return pd.DataFrame(
                {"i": pd.Series([], dtype="int64"), "j": pd.Series([], dtype="int64"),
                 "wi": pd.Series([], dtype="int64"), "n": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(
            {"i": m["l_partkey_x"].to_numpy(np.int64),
             "j": m["l_partkey_y"].to_numpy(np.int64),
             "wi": (m["q_x"].to_numpy(np.int64) >= m["q_y"].to_numpy(np.int64)).astype(np.int64),
             "n": 1}
        )
        return out.groupby(["i", "j"], as_index=False).sum()

    pr = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], per_order),
        ["i", "j"],
        {"wi": "wi", "n": "n"},
    ).to_pandas()

    i = pr["i"].to_numpy(np.int64)
    j = pr["j"].to_numpy(np.int64)
    wi = pr["wi"].to_numpy(np.int64)
    n = pr["n"].to_numpy(np.int64)
    parts = np.unique(np.concatenate([i, j]))
    ii = np.searchsorted(parts, i)
    jj = np.searchsorted(parts, j)
    wins = np.zeros(len(parts), np.int64)
    matches = np.zeros(len(parts), np.int64)
    np.add.at(wins, ii, wi)
    np.add.at(wins, jj, n - wi)
    np.add.at(matches, ii, n)
    np.add.at(matches, jj, n)

    # The oracle runs the MM updates in HUGEINT; int64 holds only while
    # max(wins, n)·_BT_SCALE < 2^63 (~9.2M matches per part/pair).  Above that
    # switch to Python-int object arrays — same floor-division semantics,
    # arbitrary precision, bit-equal to the HUGEINT oracle.
    _hi = max(int(wins.max(initial=0)), int(n.max(initial=0)))
    _dt = np.int64 if _hi * _BT_SCALE < 2**63 else object
    wins_w = wins.astype(_dt) if _dt is np.int64 else np.array([int(v) for v in wins], object)
    n_w = n.astype(_dt) if _dt is np.int64 else np.array([int(v) for v in n], object)
    u = np.full(len(parts), _BT_MU, dtype=_dt)
    for _ in range(2):
        c = (n_w * _BT_SCALE) // (u[ii] + u[jj])
        s = np.zeros(len(parts), _dt)
        np.add.at(s, ii, c)
        np.add.at(s, jj, c)
        u = np.maximum((wins_w * _BT_SCALE) // s, 1)
    u = u.astype(np.int64)

    order = np.lexsort((parts, -u))[:15]
    out = pd.DataFrame(
        {"part": parts[order], "wins": wins[order], "matches": matches[order],
         "score": u[order]}
    )
    return _i64(out, ["part", "wins", "matches", "score"])


SQL_BRADLEY_TERRY_STEP = f"""
WITH pq AS (
  SELECT l_orderkey AS ok, l_partkey AS pk, CAST(SUM(l_quantity) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2),
pr AS (
  SELECT a.pk AS i, b.pk AS j,
         SUM(CASE WHEN a.q >= b.q THEN 1 ELSE 0 END) AS wi, COUNT(*) AS n
  FROM pq a JOIN pq b ON b.ok = a.ok AND a.pk < b.pk
  GROUP BY 1, 2),
w AS (
  SELECT pk, CAST(SUM(wv) AS HUGEINT) AS wins, CAST(SUM(n) AS HUGEINT) AS matches
  FROM (SELECT i AS pk, wi AS wv, n FROM pr
        UNION ALL SELECT j, n - wi, n FROM pr)
  GROUP BY 1),
u0 AS (SELECT pk, CAST({_BT_MU} AS HUGEINT) AS u FROM w),
c1 AS (SELECT p.i, p.j, (p.n * CAST({_BT_SCALE} AS HUGEINT)) // (ua.u + ub.u) AS c
       FROM pr p JOIN u0 ua ON ua.pk = p.i JOIN u0 ub ON ub.pk = p.j),
s1 AS (SELECT pk, SUM(c) AS s
       FROM (SELECT i AS pk, c FROM c1 UNION ALL SELECT j, c FROM c1) GROUP BY 1),
u1 AS (SELECT w.pk, GREATEST((w.wins * CAST({_BT_SCALE} AS HUGEINT)) // s1.s,
                             CAST(1 AS HUGEINT)) AS u
       FROM w JOIN s1 ON s1.pk = w.pk),
c2 AS (SELECT p.i, p.j, (p.n * CAST({_BT_SCALE} AS HUGEINT)) // (ua.u + ub.u) AS c
       FROM pr p JOIN u1 ua ON ua.pk = p.i JOIN u1 ub ON ub.pk = p.j),
s2 AS (SELECT pk, SUM(c) AS s
       FROM (SELECT i AS pk, c FROM c2 UNION ALL SELECT j, c FROM c2) GROUP BY 1),
u2 AS (SELECT w.pk, GREATEST((w.wins * CAST({_BT_SCALE} AS HUGEINT)) // s2.s,
                             CAST(1 AS HUGEINT)) AS u
       FROM w JOIN s2 ON s2.pk = w.pk)
SELECT w.pk AS part, CAST(w.wins AS BIGINT) AS wins,
       CAST(w.matches AS BIGINT) AS matches, CAST(u2.u AS BIGINT) AS score
FROM w JOIN u2 ON u2.pk = w.pk
ORDER BY u2.u DESC, w.pk LIMIT 15
"""


