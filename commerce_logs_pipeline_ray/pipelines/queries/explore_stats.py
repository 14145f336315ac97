"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _rd, _t, grouped_sums, pa, pc, pd, pq  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# Exploration stats (A5) and set ops (§2.8)
# ---------------------------------------------------------------------------

def q_lang_counts(sf_dir: str) -> pd.DataFrame:
    from ...functions.explore import group_counts

    return _i64(group_counts(_t(sf_dir, "documents", ["lang"]), "lang", k=10), ["n"])


SQL_LANG_COUNTS = """
SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang ORDER BY n DESC, lang LIMIT 10
"""


def q_distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT key) done scale-correctly: per-batch dedup of
    (type, user) pairs → distributed groupby dedup → per-type count.  The
    shuffle moves distinct pairs, never raw events."""
    ds = _t(sf_dir, "events", ["event_type", "user_id"])

    def batch_distinct(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"], "user_id": t["user_id"]}).group_by(
            ["event_type", "user_id"]
        ).aggregate([])

    pairs = ds.map_batches(batch_distinct, batch_format="pyarrow", zero_copy_batch=True)

    # global pair dedup DISTRIBUTED (pair cardinality is |users|×|types| —
    # can be huge): bucket-exchange on the pair key, per-bucket dedup +
    # partial per-type count; only the tiny (type, n) partials reach the
    # driver for the final sum.
    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["event_type", "user_id"])
        return d.groupby("event_type", as_index=False, dropna=False).size().rename(
            columns={"size": "n_users"}
        )

    from ...functions.relational import bucketed_group_reduce

    part = bucketed_group_reduce(pairs, ["event_type", "user_id"], bucket_count).to_pandas()
    out = part.groupby("event_type", as_index=False, dropna=False)["n_users"].sum()
    return _i64(out, ["n_users"])


SQL_DISTINCT_USERS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


def q_value_median_per_type(sf_dir: str) -> pd.DataFrame:
    """Per-group median via the mergeable fixed-bin histogram sketch
    (``functions/sketch.py``): per-batch sparse histogram partials → bucketed
    merge → quantile from counts.  EXACT here because ``value`` is 2-decimal
    fixed-point, and — unlike ``groupby.map_groups(median)`` — no group's raw
    rows ever co-locate on one worker."""
    from ...functions.sketch import grouped_quantile_fixedpoint

    ds = _t(sf_dir, "events", ["event_type", "value"])
    out = grouped_quantile_fixedpoint(
        ds, "event_type", "value", q=0.5, scale=100, out_name="median_value"
    )
    out["median_value"] = out["median_value"].pipe(_rd)
    return out


SQL_VALUE_MEDIAN = """
SELECT event_type, ROUND(median(value), 6) AS median_value FROM events GROUP BY event_type
"""


def q_kll_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """KLL streaming quantile sketch over l_extendedprice (rows-only: the
    estimate depends on block partitioning; the <1% normalized-rank-error
    contract vs exact quantiles is pytest-gated on this same table).  The
    scale path for quantiles over unbounded value domains: one ~2 KB blob
    per batch moves, never the values."""
    from ...functions.sketch import approx_quantiles

    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    ds = _t(sf_dir, "lineitem", ["l_extendedprice"])
    est = approx_quantiles(ds, "l_extendedprice", qs, k=200)
    return pd.DataFrame({"q": qs, "estimate": [est[q] for q in qs]})


def q_kll_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped KLL: per event_type approximate value quantiles (rows-only;
    per-group <2% rank error pytest-gated).  One blob per (key, batch)
    moves — per-group quantiles without shuffling values."""
    from ...functions.sketch import grouped_approx_quantiles

    ds = _t(sf_dir, "events", ["event_type", "value"])
    return grouped_approx_quantiles(ds, ["event_type"], "value", [0.5, 0.9, 0.99], k=160)


def q_type_overlap_matrix(sf_dir: str) -> pd.DataFrame:
    """EXACT audience-overlap matrix: for every pair of event types, how
    many distinct users did both.  Per-batch combiner collapses to distinct
    (user, type) rows; one bucketed exchange on user co-locates each user's
    type set, pairs explode bucket-locally (bounded: |types|² per user),
    and only (type_a, type_b, count) partials leave.  The exact counterpart
    of kmv_user_overlap's sketch estimates."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([])
        return g

    parts = ds.map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "event_type"])
        m = df.merge(df, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        return m.groupby(["event_type_x", "event_type_y"], as_index=False).agg(
            n_users=("user_id", "nunique"))

    per_bucket = bucketed_group_reduce(parts, ["user_id"], pair_counts).to_pandas()
    out = per_bucket.groupby(["event_type_x", "event_type_y"], as_index=False)[
        "n_users"].sum()
    out = out.rename(columns={"event_type_x": "type_a", "event_type_y": "type_b"})
    out = out.sort_values(["type_a", "type_b"], ignore_index=True)
    return _i64(out, ["n_users"])


SQL_TYPE_OVERLAP_MATRIX = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def ensure_kmv_overlap_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``kmv_user_overlap``: the four estimates
    re-derived by an INDEPENDENT reference — pure-Python scalar FNV +
    fmix64 per distinct user (not the Arrow-buffer vectorized pass),
    Python ``sorted`` bottom-k over set algebra (not the per-batch
    ``np.unique`` blob merge).  A KMV sketch is a pure function of the
    distinct-value set, so both compositions must agree exactly
    (same IEEE estimator divisions on the same k-th minima)."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.hashing import fnv1a64_single

        def fmix64(x: int) -> int:
            m = (1 << 64) - 1
            x ^= x >> 33
            x = (x * 0xFF51AFD7ED558CCD) & m
            x ^= x >> 33
            x = (x * 0xC4CEB9FE1A85EC53) & m
            x ^= x >> 33
            return x

        k = 2048
        ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
        users = {"purchase": set(), "error": set()}
        for uid, et in zip(ev["user_id"].to_pylist(), ev["event_type"].to_pylist()):
            if et in users and uid is not None:
                users[et].add(str(uid))
        bottoms = {
            side: sorted(fmix64(int(fnv1a64_single(u))) for u in vals)[:k]
            for side, vals in users.items()
        }

        def est(vals: list[int]) -> float:
            if len(vals) < k:
                return float(len(vals))
            return (k - 1) / ((float(vals[k - 1]) + 1.0) / 2.0**64)

        sa, sb = bottoms["purchase"], bottoms["error"]
        union_bottom = sorted(set(sa) | set(sb))[:k]
        union_e = est(union_bottom)
        both = set(sa) & set(sb)
        jac = (sum(1 for v in union_bottom if v in both) / len(union_bottom)
               if union_bottom else 0.0)
        return pa.table({
            "purchasers_est": pa.array([int(round(est(sa)))], pa.int64()),
            "error_users_est": pa.array([int(round(est(sb)))], pa.int64()),
            "union_est": pa.array([int(round(union_e))], pa.int64()),
            "both_est": pa.array([int(round(jac * union_e))], pa.int64()),
        })

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "kmv_overlap_ref.parquet"), build
    )


SQL_KMV_USER_OVERLAP = f"""
SELECT CAST(purchasers_est AS BIGINT) AS purchasers_est,
       CAST(error_users_est AS BIGINT) AS error_users_est,
       CAST(union_est AS BIGINT) AS union_est,
       CAST(both_est AS BIGINT) AS both_est
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/kmv_overlap_ref.parquet')
"""


def q_kmv_user_overlap(sf_dir: str) -> pd.DataFrame:
    """KMV (bottom-k) sketch set algebra: distinct purchasers, distinct
    error-users, their union and INTERSECTION — the set operation HLL
    cannot do — from two mergeable per-batch sketch streams.  Oracle: the
    independent pure-Python reference (``ensure_kmv_overlap_parquet``) —
    bottom-k state is order-independent, so the distributed blob merge
    must land on the identical four estimates (error bounds additionally
    pytest-gated)."""
    from ...functions.sketch import kmv_column_sketch

    ensure_kmv_overlap_parquet(sf_dir)

    def side(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind)).select(["user_id"])

        return fn

    base = _t(sf_dir, "events", ["user_id", "event_type"])
    sa = kmv_column_sketch(
        base.map_batches(side("purchase"), batch_format="pyarrow", zero_copy_batch=True),
        "user_id", k=2048)
    sb = kmv_column_sketch(
        base.map_batches(side("error"), batch_format="pyarrow", zero_copy_batch=True),
        "user_id", k=2048)
    return pd.DataFrame(
        {
            "purchasers_est": [int(round(sa.estimate()))],
            "error_users_est": [int(round(sb.estimate()))],
            "union_est": [int(round(sa.merge(sb).estimate()))],
            "both_est": [int(round(sa.intersection_estimate(sb)))],
        }
    )


def q_mg_heavy_users(sf_dir: str) -> pd.DataFrame:
    """One-pass Misra-Gries heavy users by event count (rows-only: kept
    counts are deterministic LOWER bounds, not SQL-equal; the n/(k+1)
    guarantee is pytest-checked on planted zipf data)."""
    from ...functions.sketch import mg_heavy_hitters

    ds = _t(sf_dir, "events", ["user_id"])
    out = mg_heavy_hitters(ds, "user_id", k=64)
    return _i64(out, ["user_id", "count_lb", "err_ub"])


def q_approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog approximate COUNT(DISTINCT user_id) (rows-only: the
    estimate is deterministic — register merge is partition-independent —
    but not SQL-reproducible; accuracy vs exact is pytest-checked)."""
    from ...functions.sketch import approx_distinct

    ds = _t(sf_dir, "events", ["user_id"])
    est = approx_distinct(ds, "user_id", p=12)
    return pd.DataFrame({"n_users_approx": [int(round(est))]})


def q_approx_users_per_type(sf_dir: str) -> pd.DataFrame:
    """Grouped HLL: approximate distinct users PER event type (rows-only:
    deterministic partition-independent register merge, accuracy
    pytest-checked) — ``sketch.py::grouped_approx_distinct``, the
    matrix-register ``np.maximum.at`` path, blobs-only exchange."""
    from ...functions.sketch import grouped_approx_distinct

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    out = grouped_approx_distinct(ds, ["event_type"], "user_id", p=12)
    out["approx_distinct"] = out["approx_distinct"].pipe(_rd, 0).astype("int64")
    return out


def q_docs_matching_regex(sf_dir: str) -> pd.DataFrame:
    """F4 selector-regex filter: any-of regex match over a string column."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def filt(t: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(t["text"], r"vector (join|merge) (stream|batch)")
        return t.filter(pc.fill_null(mask, False)).select(["doc_id"])

    out = ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return _i64(out, ["doc_id"])


SQL_DOCS_MATCHING_REGEX = """
SELECT doc_id FROM documents WHERE regexp_matches(text, 'vector (join|merge) (stream|batch)')
"""


def q_union_counts(sf_dir: str) -> pd.DataFrame:
    """UNION ALL of two filtered streams → per-type counts (ds.union)."""
    purchases = _t(sf_dir, "events", ["event_type", "value"]).map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    big = _t(sf_dir, "events", ["event_type", "value"]).map_batches(
        lambda t: t.filter(pc.greater(t["value"], 150.0)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    both = purchases.union(big)
    out = grouped_sums(both, ["event_type"], {}, "n", reduce="driver").to_pandas()
    return _i64(out, ["n"])


SQL_UNION_COUNTS = """
SELECT event_type, COUNT(*) AS n FROM (
  SELECT event_type, value FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT event_type, value FROM events WHERE value > 150.0
) GROUP BY event_type
"""

