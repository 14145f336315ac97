"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    _i64,
    _rd,
    _t,
    broadcast_join,
    grouped_sums,
    md5_hex,
    np,
    pa,
    pc,
    pd,
    pq,
    rd,
    topk,
)  # noqa: F401
from .neardup_a import ensure_derived_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# Session-5 wave 9: sketch audit, rank statistics, OLAP cube, masking layout,
# decayed counts, HITS, consistent-hash rebalance
# ---------------------------------------------------------------------------

_CMS_W = 256
_CMS_HASHES = [(1103515245, 12345), (214013, 2531011),
               (69069, 362437), (1664525, 1013904223)]
_CMS_P = 2147483647


def q_count_min_audit(sf_dir: str) -> pd.DataFrame:
    """Count-Min sketch overcount audit: a d=4 × w=256 CMS over the event
    user stream (universal hashes ((u·a+b) mod p) mod w, p=2^31−1) vs the
    exact per-user counts for the top-15 users.  The sketch is the textbook
    mergeable partial: every batch emits its own d×w cell counts and the
    exchange moves ≤1024 rows per block regardless of input size — the
    pattern that lets a 100-TB stream keep one KB-sized frequency summary.
    Estimates are deterministic (no randomness at query time), so the audit
    is fully SQL-oracled."""
    ds = _t(sf_dir, "events", ["user_id"])

    def part(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64) % _CMS_P
        flat = np.concatenate([
            np.int64(j * _CMS_W) + ((u * a + b) % _CMS_P) % _CMS_W
            for j, (a, b) in enumerate(_CMS_HASHES)
        ])
        cnt = np.bincount(flat, minlength=4 * _CMS_W)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"cell": nz.astype(np.int64), "n": cnt[nz].astype(np.int64)})

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    table = np.zeros(4 * _CMS_W, np.int64)
    agg = parts.groupby("cell")["n"].sum()
    table[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)

    exact = grouped_sums(ds, ["user_id"], {}, "exact_n")
    top = topk(exact, ["exact_n", "user_id"], [True, False], 15).to_pandas()
    u = top["user_id"].to_numpy(np.int64) % _CMS_P
    est = np.min(np.stack([
        table[j * _CMS_W + ((u * a + b) % _CMS_P) % _CMS_W]
        for j, (a, b) in enumerate(_CMS_HASHES)
    ]), axis=0)
    out = pd.DataFrame({
        "user_id": top["user_id"].to_numpy(np.int64),
        "exact_n": top["exact_n"].to_numpy(np.int64),
        "cms_est": est.astype(np.int64),
    })
    out["overcount"] = out["cms_est"] - out["exact_n"]
    return _i64(out, ["user_id", "exact_n", "cms_est", "overcount"])


SQL_COUNT_MIN_AUDIT = """
WITH hp(j, a, b) AS (VALUES (0, 1103515245, 12345), (1, 214013, 2531011),
                            (2, 69069, 362437), (3, 1664525, 1013904223)),
cells AS (
  SELECT hp.j, (((user_id % 2147483647) * hp.a + hp.b) % 2147483647) % 256 AS cell,
         COUNT(*) AS n
  FROM events CROSS JOIN hp GROUP BY 1, 2),
ex AS (
  SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
  ORDER BY exact_n DESC, user_id LIMIT 15)
SELECT ex.user_id, MAX(ex.exact_n) AS exact_n,
       MIN(c.n) AS cms_est, MIN(c.n) - MAX(ex.exact_n) AS overcount
FROM ex CROSS JOIN hp
JOIN cells c ON c.j = hp.j
  AND c.cell = (((ex.user_id % 2147483647) * hp.a + hp.b) % 2147483647) % 256
GROUP BY ex.user_id ORDER BY exact_n DESC, ex.user_id
"""


def q_spearman_qty_price(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between lineitem quantity and price with
    exact average-rank tie handling: per-column value histograms (one
    combiner exchange each, output bounded by the value grid) build the
    2×avg-rank integer maps, which broadcast into one scan that accumulates
    the five rank sufficient statistics as EXACT big integers (chunked
    int64 partials folded into Python ints so no scale overflows); the
    single float division mirrors the SQL formula term for term."""
    import math as _math

    import ray as _ray

    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def vals(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        p = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))),
                    pa.int64())
        return pa.table({"q": q, "p": p})

    vd = ds.map_batches(vals, batch_format="pyarrow", zero_copy_batch=True
                        ).materialize()  # 3 consumers, 16-byte rows
    qh = grouped_sums(vd.select_columns(["q"]), ["q"], {}, "n").to_pandas()
    ph = grouped_sums(vd.select_columns(["p"]), ["p"], {}, "n").to_pandas()

    def rank2x(h: pd.DataFrame, col: str) -> tuple[np.ndarray, np.ndarray]:
        h = h.sort_values(col, ignore_index=True)
        cnt = h["n"].to_numpy(np.int64)
        lt = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        return h[col].to_numpy(np.int64), 2 * lt + cnt + 1

    qv, qr = rank2x(qh, "q")
    pv, pr = rank2x(ph, "p")
    maps = _ray.put((qv, qr, pv, pr))

    def stats(t: pa.Table) -> pd.DataFrame:
        qv_, qr_, pv_, pr_ = _ray.get(maps)
        ra = qr_[np.searchsorted(qv_, t["q"].to_numpy(zero_copy_only=False))]
        rb = pr_[np.searchsorted(pv_, t["p"].to_numpy(zero_copy_only=False))]
        sx = sy = sxx = syy = sxy = 0
        for lo in range(0, len(ra), 4096):  # chunked: int64-safe partials
            a, b = ra[lo:lo + 4096], rb[lo:lo + 4096]
            sx += int(a.sum()); sy += int(b.sum())
            sxx += int((a * a).sum()); syy += int((b * b).sum())
            sxy += int((a * b).sum())
        return pd.DataFrame({"n": [len(ra)], "sx": [str(sx)], "sy": [str(sy)],
                             "sxx": [str(sxx)], "syy": [str(syy)], "sxy": [str(sxy)]})

    parts = vd.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(parts["n"].sum())
    sx = int(sum(int(v) for v in parts["sx"]))
    sy = int(sum(int(v) for v in parts["sy"]))
    sxx = sum(int(v) for v in parts["sxx"])
    syy = sum(int(v) for v in parts["syy"])
    sxy = sum(int(v) for v in parts["sxy"])
    num = float(n * sxy - sx * sy)
    den = _math.sqrt(float(n * sxx - sx * sx)) * _math.sqrt(float(n * syy - sy * sy))
    return pd.DataFrame({"n_rows": pd.array([n], dtype="int64"),
                         "rho": [_rd(num / den, 9)]})


SQL_SPEARMAN_QTY_PRICE = """
WITH r AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem),
rx AS (
  SELECT 2 * RANK() OVER (ORDER BY q) + COUNT(*) OVER (PARTITION BY q) - 1 AS ra,
         2 * RANK() OVER (ORDER BY p) + COUNT(*) OVER (PARTITION BY p) - 1 AS rb
  FROM r),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(ra AS HUGEINT)) AS sx, SUM(CAST(rb AS HUGEINT)) AS sy,
         SUM(CAST(ra AS HUGEINT) * ra) AS sxx, SUM(CAST(rb AS HUGEINT) * rb) AS syy,
         SUM(CAST(ra AS HUGEINT) * rb) AS sxy
  FROM rx)
SELECT CAST(n AS BIGINT) AS n_rows,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 9) AS rho
FROM s
"""


def q_kendall_tau_qty_disc(sf_dir: str) -> pd.DataFrame:
    """Kendall tau-b between lineitem quantity (1..50) and discount cents
    (0..10) computed EXACTLY from the bounded 2-D value-cell histogram: one
    combiner exchange moves ≤561 cells, then concordant/discordant pair
    masses come from vectorized prefix-sum grids driver-side (numpy int64 on
    cell counts; pair totals folded as Python ints).  The O(n²) pair space
    never materializes — the 100-TB shape for rank correlation over discrete
    grids."""
    import math as _math

    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def vals(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        d = pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))),
                    pa.int64())
        return pa.table({"q": q, "d": d})

    cells = grouped_sums(
        ds.map_batches(vals, batch_format="pyarrow", zero_copy_batch=True),
        ["q", "d"], {}, "n", reduce="driver",
    ).to_pandas()
    qi = cells["q"].to_numpy(np.int64)
    di = cells["d"].to_numpy(np.int64)
    nn = cells["n"].to_numpy(np.int64)
    qu = np.unique(qi); du = np.unique(di)
    grid = np.zeros((len(qu), len(du)), np.int64)
    grid[np.searchsorted(qu, qi), np.searchsorted(du, di)] = nn
    # lt_any[i,j] = mass with q'<q_i at exactly d_j; prefix over d gives
    # lt_lt (strictly-less both dims) and lt_gt (q'<q, d'>d)
    rowcum = grid.cumsum(axis=0)
    lt_any = np.zeros_like(grid)
    lt_any[1:, :] = rowcum[:-1, :]
    le_cols = lt_any.cumsum(axis=1)          # mass with q'<q, d'<=d
    lt_lt = np.zeros_like(grid)
    lt_lt[:, 1:] = le_cols[:, :-1]           # mass with q'<q, d'<d
    lt_gt = le_cols[:, -1:] - le_cols        # mass with q'<q, d'>d
    conc = sum(int(v) for v in (grid * lt_lt).ravel())
    disc = sum(int(v) for v in (grid * lt_gt).ravel())
    n = int(nn.sum())
    n0 = n * (n - 1) // 2
    tq = grid.sum(axis=1)
    td = grid.sum(axis=0)
    n1 = sum(int(t) * (int(t) - 1) // 2 for t in tq)
    n2 = sum(int(t) * (int(t) - 1) // 2 for t in td)
    tau = float(conc - disc) / (_math.sqrt(float(n0 - n1)) * _math.sqrt(float(n0 - n2)))
    return pd.DataFrame({
        "n_rows": pd.array([n], "int64"),
        "concordant": pd.array([conc], "int64"),
        "discordant": pd.array([disc], "int64"),
        "tau_b": [_rd(tau, 9)],
    })


SQL_KENDALL_TAU_QTY_DISC = """
WITH c AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2),
pairs AS (
  SELECT COALESCE(SUM(CAST(a.n AS HUGEINT) * b.n)
                  FILTER (WHERE b.q < a.q AND b.d < a.d), 0) AS conc,
         COALESCE(SUM(CAST(a.n AS HUGEINT) * b.n)
                  FILTER (WHERE b.q < a.q AND b.d > a.d), 0) AS disc
  FROM c a JOIN c b ON b.q < a.q),
tot AS (
  SELECT CAST(SUM(n) AS HUGEINT) AS n,
         SUM(CAST(n AS HUGEINT) * (n - 1) / 2) AS npairs FROM c),
tx AS (SELECT SUM(CAST(s AS HUGEINT) * (s - 1) / 2) AS n1
       FROM (SELECT SUM(n) AS s FROM c GROUP BY q)),
ty AS (SELECT SUM(CAST(s AS HUGEINT) * (s - 1) / 2) AS n2
       FROM (SELECT SUM(n) AS s FROM c GROUP BY d))
SELECT CAST(tot.n AS BIGINT) AS n_rows,
       CAST(pairs.conc AS BIGINT) AS concordant,
       CAST(pairs.disc AS BIGINT) AS discordant,
       ROUND(CAST(pairs.conc - pairs.disc AS DOUBLE)
             / (SQRT(CAST(tot.n * (tot.n - 1) / 2 - tx.n1 AS DOUBLE))
                * SQRT(CAST(tot.n * (tot.n - 1) / 2 - ty.n2 AS DOUBLE))), 9) AS tau_b
FROM pairs, tot, tx, ty
"""


def q_cube_revenue(sf_dir: str) -> pd.DataFrame:
    """OLAP CUBE over (region, order year, priority): the Ray side computes
    ONLY the finest-grain cell aggregate (one combiner exchange over a grid
    bounded by 5 regions × years × 5 priorities — integer cents, never a
    float sum) and expands all 8 cube subsets driver-side from those ≤200
    cells with 'ALL' sentinels.  At 100 TB the cube costs exactly one
    pre-aggregated exchange, not 8 scans — the classic lattice-from-base
    rollup."""
    from ...functions.relational import auto_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()))
    r2n = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    nat_region = pa.table({
        "c_nationkey": pa.array(list(n2r.keys()), pa.int64()),
        "region": pa.array([r2n[v] for v in n2r.values()], pa.string()),
    })
    cust = broadcast_join(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), nat_region, "c_nationkey"
    ).select_columns(["c_custkey", "region"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderpriority",
                                   "o_totalprice"])
    joined = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def keyed(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(t["o_orderdate"]), pa.string())
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
                        pa.int64())
        return pa.table({"region": t["region"], "o_year": yr,
                         "priority": t["o_orderpriority"], "cents": cents})

    base = grouped_sums(
        joined.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        ["region", "o_year", "priority"], {"cents": "cents"}, "n_orders",
        reduce="driver",
    ).to_pandas()
    dims = ["region", "o_year", "priority"]
    outs = []
    for mask in range(8):
        g = base.copy()
        for i, dcol in enumerate(dims):
            if not (mask >> i) & 1:
                g[dcol] = "ALL"
        outs.append(g.groupby(dims, as_index=False)[["cents", "n_orders"]].sum())
    out = pd.concat(outs, ignore_index=True).drop_duplicates(dims)
    out["revenue"] = [float(int(c)) / 100.0 for c in out["cents"]]
    out = out.drop(columns=["cents"]).sort_values(dims, ignore_index=True)
    return _i64(out, ["n_orders"])


SQL_CUBE_REVENUE = """
WITH base AS (
  SELECT r_name AS region,
         CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS o_year,
         o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey)
SELECT COALESCE(region, 'ALL') AS region, COALESCE(o_year, 'ALL') AS o_year,
       COALESCE(priority, 'ALL') AS priority, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue
FROM base GROUP BY CUBE (region, o_year, priority)
ORDER BY 1, 2, 3
"""


def q_mlm_mask_stats(sf_dir: str) -> pd.DataFrame:
    """BERT-style MLM masking layout audit over the derived token corpus:
    each (sequence, position) draws a deterministic integer hash; 15% of
    positions mask, and masked positions split 80/10/10 into [MASK] /
    random / keep via the same hash.  Per-source counters plus the masked
    token-id checksum gate the layout bit-exactly.  One vectorized scan
    (offsets-only position math over the shared token buffer; the per-doc
    key is the sid's trailing 8 md5-hex chars decoded with a byte-LUT, no
    per-row Python), combiner partials, no exchange beyond the bounded
    per-source rows."""
    from ...functions.tokens import _flat_tokens

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir),
                         columns=["doc_id", "tokens", "source"], override_num_blocks=8)

    hex_lut = np.zeros(256, np.int64)
    for i, ch in enumerate("0123456789abcdef"):
        hex_lut[ord(ch)] = i

    def part(t: pa.Table) -> pd.DataFrame:
        values, offsets = _flat_tokens(t)
        starts = (offsets - offsets[0]).astype(np.int64)
        lens = np.diff(starts)
        window = values[offsets[0]:offsets[-1]].astype(np.int64)
        # per-doc 32-bit key: trailing 8 hex chars of the sid, decoded
        # vectorized (reverse → fixed-width slice → packed byte matrix)
        rev8 = pc.utf8_slice_codeunits(
            pc.utf8_reverse(t["doc_id"]), 0, 8).combine_chunks()
        n_docs = len(rev8)
        raw = np.frombuffer(rev8.buffers()[2], np.uint8)[:8 * n_docs].reshape(
            n_docs, 8)
        digits = hex_lut[raw]
        sid = (digits << (4 * np.arange(8, dtype=np.int64))).sum(axis=1)
        sid_rep = np.repeat(sid, lens)
        pos = np.arange(len(window), dtype=np.int64) - np.repeat(starts[:-1], lens) + 1
        k = (sid_rep % 1000003) * 131 + pos
        h = (k * 2654435761) % _CMS_P
        mask = (h % 100) < 15
        r = h % 10
        src_rep = np.repeat(
            np.asarray(t["source"].to_pylist(), dtype=object), lens)
        df = pd.DataFrame({
            "source": src_rep,
            "n_tokens": np.ones(len(window), np.int64),
            "n_masked": mask.astype(np.int64),
            "n_mask_sym": (mask & (r < 8)).astype(np.int64),
            "n_rand": (mask & (r == 8)).astype(np.int64),
            "n_keep": (mask & (r == 9)).astype(np.int64),
            "masked_sum": np.where(mask, window, 0),
        })
        return df.groupby("source", as_index=False).sum()

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values(
        "source", ignore_index=True)
    return _i64(out, ["n_tokens", "n_masked", "n_mask_sym", "n_rand", "n_keep",
                      "masked_sum"])


SQL_MLM_MASK_STATS = f"""
WITH hexd(ch, v) AS (VALUES ('0',0),('1',1),('2',2),('3',3),('4',4),('5',5),
                            ('6',6),('7',7),('8',8),('9',9),('a',10),('b',11),
                            ('c',12),('d',13),('e',14),('f',15)),
base AS (SELECT doc_id, tokens, source
         FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
key AS (
  SELECT doc_id,
         SUM(hexd.v * (CAST(1 AS BIGINT) << (4 * (8 - g.i)))) AS sid32
  FROM base, generate_series(1, 8) g(i)
  JOIN hexd ON hexd.ch = substr(doc_id, length(doc_id) - 8 + g.i, 1)
  GROUP BY doc_id),
tok AS (
  SELECT b.source,
         ((k.sid32 % 1000003) * 131 + g.i) * 2654435761 % 2147483647 AS h,
         b.tokens[g.i] AS token
  FROM base b JOIN key k USING (doc_id),
       unnest(generate_series(1, len(b.tokens))) AS g(i))
SELECT source, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN h % 100 < 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
       CAST(SUM(CASE WHEN h % 100 < 15 AND h % 10 < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_mask_sym,
       CAST(SUM(CASE WHEN h % 100 < 15 AND h % 10 = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_rand,
       CAST(SUM(CASE WHEN h % 100 < 15 AND h % 10 = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN h % 100 < 15 THEN token ELSE 0 END) AS BIGINT) AS masked_sum
FROM tok GROUP BY source ORDER BY source
"""


def q_decayed_topk_users(sf_dir: str) -> pd.DataFrame:
    """Exponentially time-decayed heavy hitters with EXACT integer weights:
    event age is bucketed into weeks behind the corpus max timestamp and
    each event contributes 512 >> min(age_weeks, 9) — a dyadic decay whose
    per-user totals are plain int64 sums, so the freshness-weighted top-20
    is bit-deterministic (no float decay drift).  One scalar max exchange +
    one combiner exchange + distributed top-k."""
    ds = _t(sf_dir, "events", ["user_id", "ts"])

    def mx(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"m": [int(t["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False).max())]})

    m = int(ds.map_batches(mx, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()["m"].max())

    def weigh(t: pa.Table, *, m=m) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = np.minimum((m - ts) // (7 * 86_400_000_000), 9).astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "weight": pa.array(np.int64(512) >> w)})

    weighted = ds.map_batches(weigh, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_sums(weighted, ["user_id"], {"decayed": "weight"}, "n_events")
    out = topk(agg, ["decayed", "user_id"], [True, False], 20).to_pandas()
    return _i64(out[["user_id", "decayed", "n_events"]],
                ["user_id", "decayed", "n_events"])


SQL_DECAYED_TOPK_USERS = """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
w AS (
  SELECT user_id,
         512 >> CAST(LEAST((mx.m - epoch_us(ts)) // 604800000000, 9) AS INTEGER) AS weight
  FROM events CROSS JOIN mx)
SELECT user_id, CAST(SUM(weight) AS BIGINT) AS decayed, COUNT(*) AS n_events
FROM w GROUP BY user_id ORDER BY decayed DESC, user_id LIMIT 20
"""


def q_hits_scores(sf_dir: str) -> pd.DataFrame:
    """HITS hubs/authorities over the bipartite customer↔part purchase graph
    (distinct edges from orders⋈lineitem), one full mutual-reinforcement
    iteration kept in EXACT integers (a₁ = part degree, h₁ = Σ a₁ over a
    customer's parts, a₂ = Σ h₁ over a part's customers — unnormalized
    scores are scale-free for ranking and dodge float-normalization drift).
    The edge set stays a distributed Dataset re-scanned per step; only the
    |V|-bounded score vectors broadcast (same contract as pagerank)."""
    import ray as _ray

    from ...functions.relational import auto_join

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    pairs = auto_join(li, orders, on="l_orderkey", right_on="o_orderkey")
    edges = grouped_sums(
        pairs.select_columns(["o_custkey", "l_partkey"]),
        ["o_custkey", "l_partkey"], {}, "dups",
    ).select_columns(["o_custkey", "l_partkey"]).materialize()

    a1 = grouped_sums(edges, ["l_partkey"], {}, "s").to_pandas()
    a1v = a1.sort_values("l_partkey")
    pk, ps = a1v["l_partkey"].to_numpy(np.int64), a1v["s"].to_numpy(np.int64)
    a1_ref = _ray.put((pk, ps))

    def h_step(t: pa.Table) -> pd.DataFrame:
        k, s = _ray.get(a1_ref)
        vals = s[np.searchsorted(k, t["l_partkey"].to_numpy(zero_copy_only=False))]
        return pd.DataFrame({"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                             "s": vals}).groupby("o_custkey", as_index=False).sum()

    h1 = grouped_sums(
        edges.map_batches(h_step, batch_format="pyarrow", zero_copy_batch=True),
        ["o_custkey"], {"s": "s"},
    ).to_pandas().groupby("o_custkey", as_index=False).sum()
    h1v = h1.sort_values("o_custkey")
    ck, cs = h1v["o_custkey"].to_numpy(np.int64), h1v["s"].to_numpy(np.int64)
    h1_ref = _ray.put((ck, cs))

    def a_step(t: pa.Table) -> pd.DataFrame:
        k, s = _ray.get(h1_ref)
        vals = s[np.searchsorted(k, t["o_custkey"].to_numpy(zero_copy_only=False))]
        return pd.DataFrame({"l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
                             "s": vals}).groupby("l_partkey", as_index=False).sum()

    a2 = grouped_sums(
        edges.map_batches(a_step, batch_format="pyarrow", zero_copy_batch=True),
        ["l_partkey"], {"s": "s"},
    ).to_pandas().groupby("l_partkey", as_index=False).sum()
    hub = h1.rename(columns={"o_custkey": "node"}).sort_values(
        ["s", "node"], ascending=[False, True]).head(10)
    auth = a2.rename(columns={"l_partkey": "node"}).sort_values(
        ["s", "node"], ascending=[False, True]).head(10)
    out = pd.concat([
        pd.DataFrame({"role": "authority", "node": auth["node"], "score": auth["s"]}),
        pd.DataFrame({"role": "hub", "node": hub["node"], "score": hub["s"]}),
    ], ignore_index=True)
    return _i64(out, ["node", "score"])


SQL_HITS_SCORES = """
WITH e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
a1 AS MATERIALIZED (SELECT p, COUNT(*) AS s FROM e GROUP BY 1),
h1 AS MATERIALIZED (
  SELECT c, CAST(SUM(a1.s) AS BIGINT) AS s FROM e JOIN a1 USING (p) GROUP BY 1),
a2 AS (
  SELECT p, CAST(SUM(h1.s) AS BIGINT) AS s FROM e JOIN h1 USING (c) GROUP BY 1),
u AS (
  SELECT 'hub' AS role, c AS node, s FROM h1
  UNION ALL SELECT 'authority' AS role, p AS node, s FROM a2),
rk AS (
  SELECT role, node, s AS score,
         ROW_NUMBER() OVER (PARTITION BY role ORDER BY s DESC, node) AS rn
  FROM u)
SELECT role, node, score FROM rk WHERE rn <= 10
ORDER BY role, score DESC, node
"""


_RING_SHARDS = 8
_RING_VNODES = 16


def q_ring_rebalance(sf_dir: str) -> pd.DataFrame:
    """Consistent-hashing rebalance audit: documents map onto a 128-point
    md5 ring (8 shards × 16 vnodes, doc → first ring point ≥ its hash, wrap
    to the ring minimum); removing shard s0 reassigns ONLY its arc — the
    audit counts per-shard membership before/after plus moved-in docs,
    demonstrating the minimal-movement property that makes ring-sharded
    sinks resumable under membership change.  Ring is driver-built (128
    hashes) and broadcast; docs hash in one vectorized scan."""
    ds = _t(sf_dir, "documents", ["doc_id"])
    ring_labels = [f"s{s}" for s in range(_RING_SHARDS) for _ in range(_RING_VNODES)]
    ring_keys = [f"s{s}:v{v}" for s in range(_RING_SHARDS)
                 for v in range(_RING_VNODES)]
    pts = np.asarray(md5_hex(ring_keys).to_pylist(), dtype=object)
    labels = np.asarray(ring_labels, dtype=object)
    order = np.argsort(pts)
    pts, labels = pts[order], labels[order]
    keep = labels != "s0"
    pts2, labels2 = pts[keep], labels[keep]

    def assign(t: pa.Table) -> pd.DataFrame:
        h = np.asarray(md5_hex(pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()), ":ring", "")).to_pylist(), dtype=object)
        i1 = np.searchsorted(pts, h, side="left")
        i1[i1 == len(pts)] = 0
        i2 = np.searchsorted(pts2, h, side="left")
        i2[i2 == len(pts2)] = 0
        return pd.DataFrame({"before": labels[i1], "after": labels2[i2],
                             "n": np.ones(len(h), np.int64)}).groupby(
            ["before", "after"], as_index=False).sum()

    parts = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True
                           ).to_pandas().groupby(["before", "after"],
                                                 as_index=False).sum()
    shards = [f"s{s}" for s in range(_RING_SHARDS)]
    nb = parts.groupby("before")["n"].sum()
    na = parts.groupby("after")["n"].sum()
    mv = parts[parts["before"] == "s0"].groupby("after")["n"].sum()
    out = pd.DataFrame({
        "shard": shards,
        "n_before": [int(nb.get(s, 0)) for s in shards],
        "n_after": [int(na.get(s, 0)) for s in shards],
        "n_moved_in": [int(mv.get(s, 0)) for s in shards],
    })
    return _i64(out, ["n_before", "n_after", "n_moved_in"])


SQL_RING_REBALANCE = """
WITH ring AS (
  SELECT 's' || CAST(s AS VARCHAR) AS shard,
         md5('s' || CAST(s AS VARCHAR) || ':v' || CAST(v AS VARCHAR)) AS pt
  FROM generate_series(0, 7) g1(s), generate_series(0, 15) g2(v)),
d AS (SELECT md5(CAST(doc_id AS VARCHAR) || ':ring') AS h FROM documents),
asgn AS (
  SELECT COALESCE((SELECT r.shard FROM ring r WHERE r.pt >= d.h
                   ORDER BY r.pt LIMIT 1),
                  (SELECT r.shard FROM ring r ORDER BY r.pt LIMIT 1)) AS before,
         COALESCE((SELECT r.shard FROM ring r WHERE r.shard <> 's0' AND r.pt >= d.h
                   ORDER BY r.pt LIMIT 1),
                  (SELECT r.shard FROM ring r WHERE r.shard <> 's0'
                   ORDER BY r.pt LIMIT 1)) AS after
  FROM d),
shards AS (SELECT DISTINCT shard FROM ring)
SELECT sh.shard,
       COALESCE(b.n, 0) AS n_before, COALESCE(af.n, 0) AS n_after,
       COALESCE(mv.n, 0) AS n_moved_in
FROM shards sh
LEFT JOIN (SELECT before AS shard, COUNT(*) AS n FROM asgn GROUP BY 1) b USING (shard)
LEFT JOIN (SELECT after AS shard, COUNT(*) AS n FROM asgn GROUP BY 1) af USING (shard)
LEFT JOIN (SELECT after AS shard, COUNT(*) AS n FROM asgn
           WHERE before = 's0' GROUP BY 1) mv USING (shard)
ORDER BY sh.shard
"""


