"""Wave 43: aggregation-shape completeness — ordered string aggregation,
LAG-gap analysis, bipartite butterfly counting, and wide→long unpivot.

* string_agg_top_terms — per (lang, source): the 3 most frequent words
  comma-joined in (count DESC, word) order — the STRING_AGG ... ORDER BY
  shape.  Word counts reduce distributed; only ≤3 winners per group reach
  the join.
* order_gap_extremes — per-customer consecutive order-date gaps (the LAG
  window shape) folded inside a customer-keyed bucket exchange; top-20
  customers by (max_gap_days DESC, custkey).
* butterfly_counts — bipartite 2×2-biclique (butterfly) counting over the
  order×part graph (Wang et al. 2019 semantics): butterflies per part =
  Σ_edges C(c, 2) over the SHARED co-purchase edge artifact — the
  rectangle count folds from pair co-support with no further exchange.
* events_unpivot_check — UNPIVOT parity: the engine writes a wide
  day × event-type count grid once (its own pivot), then reads it back
  DISTRIBUTED and melts wide→long; the oracle UNPIVOTs the same artifact.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, grouped_sums, topk  # noqa: F401
from .neardup_a import _ensure_artifact

_TOP_TERMS = 3


def q_string_agg_top_terms(sf_dir: str) -> pd.DataFrame:
    """Per (lang, source): comma-joined top-3 words by (count DESC, word).
    One word-count combiner exchange; the ordered join runs on ≤3 rows per
    group."""
    from ...functions.relational import bucketed_group_reduce

    docs = _t(sf_dir, "documents", ["lang", "source", "text"])

    def words(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ")
        flat = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        n_words = (flat.offsets.to_numpy(zero_copy_only=False)[1:]
                   - flat.offsets.to_numpy(zero_copy_only=False)[:-1])
        idx = np.repeat(np.arange(len(t), dtype=np.int64), n_words)
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False)[idx],
            "source": t["source"].to_numpy(zero_copy_only=False)[idx],
            "word": flat.values.to_numpy(zero_copy_only=False),
            "cnt": 1})
        return df.groupby(["lang", "source", "word"], as_index=False).sum()

    counts = grouped_sums(
        docs.map_batches(words, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "source", "word"], {"cnt": "cnt"})

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cnt", "word"], ascending=[False, True])
        return df.groupby(["lang", "source"], as_index=False).head(_TOP_TERMS)

    win = bucketed_group_reduce(counts, ["lang", "source"], top3).to_pandas()
    win = win.sort_values(["cnt", "word"], ascending=[False, True])
    out = (win.groupby(["lang", "source"], as_index=False)
              .agg(top_terms=("word", ",".join),
                   top_n=("cnt", "size")))
    out = out.sort_values(["lang", "source"], ignore_index=True)
    return _i64(out[["lang", "source", "top_terms", "top_n"]], ["top_n"])


SQL_STRING_AGG_TOP_TERMS = f"""
WITH w AS (
  SELECT lang, source, unnest(string_split(text, ' ')) AS word
  FROM documents),
c AS (
  SELECT lang, source, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2, 3),
r AS (
  SELECT lang, source, word, cnt,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY cnt DESC, word) AS rk
  FROM c)
SELECT lang, source,
       STRING_AGG(word, ',' ORDER BY cnt DESC, word) AS top_terms,
       CAST(COUNT(*) AS BIGINT) AS top_n
FROM r WHERE rk <= {_TOP_TERMS}
GROUP BY 1, 2 ORDER BY 1, 2
"""

_GAP_TOPK = 20


def q_order_gap_extremes(sf_dir: str) -> pd.DataFrame:
    """Per-customer consecutive order-date gaps (LAG shape): max and total
    gap days per customer with ≥2 orders, top-20 by (max_gap DESC,
    custkey).  The sort + diff folds inside a customer-keyed bucket
    exchange; only per-customer summaries leave it."""
    from ...functions.relational import bucketed_group_reduce

    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "day_id": pc.divide(pc.cast(t["o_orderdate"], pa.int64()),
                                pa.scalar(86_400_000_000, pa.int64())),
            "o_orderkey": t["o_orderkey"]})

    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"]).map_batches(
        to_day, batch_format="pyarrow", zero_copy_batch=True)

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "day_id", "o_orderkey"])
        d = df["day_id"].to_numpy(np.int64)
        ck = df["o_custkey"].to_numpy(np.int64)
        same = ck[1:] == ck[:-1]
        g = (d[1:] - d[:-1])[same]
        cust = ck[1:][same]
        if not len(g):
            return pd.DataFrame({"o_custkey": pd.Series([], dtype="int64"),
                                 "n_gaps": pd.Series([], dtype="int64"),
                                 "max_gap_days": pd.Series([], dtype="int64"),
                                 "sum_gap_days": pd.Series([], dtype="int64")})
        out = pd.DataFrame({"o_custkey": cust, "gap": g})
        return (out.groupby("o_custkey")
                   .agg(n_gaps=("gap", "size"), max_gap_days=("gap", "max"),
                        sum_gap_days=("gap", "sum"))
                   .reset_index())

    per_cust = bucketed_group_reduce(orders, ["o_custkey"], gaps)
    out = topk(per_cust, ["max_gap_days", "o_custkey"], [True, False],
               _GAP_TOPK).to_pandas()
    out = out.sort_values(["max_gap_days", "o_custkey"],
                          ascending=[False, True], ignore_index=True).head(_GAP_TOPK)
    return _i64(out[["o_custkey", "n_gaps", "max_gap_days", "sum_gap_days"]],
                ["o_custkey", "n_gaps", "max_gap_days", "sum_gap_days"])


SQL_ORDER_GAP_EXTREMES = f"""
WITH o AS (
  SELECT o_custkey, CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id,
         LAG(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev_day
  FROM orders),
g AS (
  SELECT o_custkey, day_id - prev_day AS gap FROM o WHERE prev_day IS NOT NULL)
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(MAX(gap) AS BIGINT) AS max_gap_days,
       CAST(SUM(gap) AS BIGINT) AS sum_gap_days
FROM g GROUP BY 1
ORDER BY max_gap_days DESC, o_custkey LIMIT {_GAP_TOPK}
"""

_BF_TOPK = 10


def q_butterfly_counts(sf_dir: str) -> pd.DataFrame:
    """Bipartite butterfly (2×2 biclique) participation per part: for each
    co-purchase edge (a, b, c = co-support), the edge carries C(c, 2)
    butterflies; a part's count sums its incident edges.  Reads the SHARED
    edge artifact — no re-exchange — and reports the top-10 parts plus the
    exact global total (each butterfly counted once per incident part pair,
    i.e. total = Σ_edges C(c,2))."""
    from .graph_edges import ensure_copurchase_edges_parquet

    e = rd.read_parquet(ensure_copurchase_edges_parquet(sf_dir),
                        override_num_blocks=4)

    def part(t: pa.Table) -> pd.DataFrame:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        bf = c * (c - 1) // 2
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"part": np.concatenate([a, b]),
                           "bf": np.concatenate([bf, bf])})
        return df.groupby("part", as_index=False).sum()

    per_part = grouped_sums(
        e.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["part"], {"bf": "bf"})
    out = topk(per_part, ["bf", "part"], [True, False], _BF_TOPK).to_pandas()
    out = out[out["bf"] > 0]
    out = out.sort_values(["bf", "part"], ascending=[False, True],
                          ignore_index=True).head(_BF_TOPK)
    return _i64(out[["part", "bf"]], ["part", "bf"])


SQL_BUTTERFLY_COUNTS = f"""
WITH e AS (
  SELECT part_a, part_b, c
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/copurchase_edges.parquet/*.parquet')),
bf AS (
  SELECT part_a AS part, c * (c - 1) // 2 AS b FROM e
  UNION ALL
  SELECT part_b, c * (c - 1) // 2 FROM e),
agg AS (SELECT part, CAST(SUM(b) AS BIGINT) AS bf FROM bf GROUP BY 1)
SELECT part, bf FROM agg WHERE bf > 0
ORDER BY bf DESC, part LIMIT {_BF_TOPK}
"""

_EV_TYPES = ["click", "error", "purchase", "signup", "view"]


def ensure_events_wide_parquet(sf_dir: str) -> str:
    """Wide day × event-type count grid, pivoted by the ENGINE's own
    distributed pipeline and materialized once — the unpivot fixture both
    engines read."""
    import os as _os

    out = _os.path.join(_corpus_dir(sf_dir), "events_wide.parquet")
    if _os.path.exists(out):
        return out

    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({
            "day_id": pc.divide(pc.cast(t["ts"], pa.int64()),
                                pa.scalar(86_400_000_000, pa.int64())),
            "event_type": t["event_type"]})

    daily = grouped_sums(
        _t(sf_dir, "events", ["ts", "event_type"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["day_id", "event_type"], {}, count_name="n",
        reduce="driver").to_pandas()
    wide = daily.pivot_table(index="day_id", columns="event_type", values="n",
                             fill_value=0, aggfunc="sum")
    for c in _EV_TYPES:
        if c not in wide.columns:
            wide[c] = 0
    wide = wide[_EV_TYPES].astype("int64").reset_index()
    wide.columns.name = None

    def build() -> pa.Table:
        return pa.Table.from_pandas(wide.sort_values("day_id"),
                                    preserve_index=False)

    return _ensure_artifact(out, build)


def q_events_unpivot_check(sf_dir: str) -> pd.DataFrame:
    """Wide→long unpivot: read the wide grid DISTRIBUTED, melt the 5 type
    columns back to (day_id, event_type, n) rows, drop the zero fills, and
    aggregate per type — total count and days present must round-trip."""
    wide = rd.read_parquet(ensure_events_wide_parquet(sf_dir),
                           override_num_blocks=2)

    def melt(t: pa.Table) -> pd.DataFrame:
        day = t["day_id"].to_numpy(zero_copy_only=False)
        frames = []
        for ty in _EV_TYPES:
            n = t[ty].to_numpy(zero_copy_only=False)
            nz = n > 0
            frames.append(pd.DataFrame({"event_type": ty, "day_id": day[nz],
                                        "n": n[nz]}))
        return pd.concat(frames, ignore_index=True)

    long = wide.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(long, ["event_type"], {"n_events": "n"},
                       count_name="n_days", reduce="driver").to_pandas()
    out = out.sort_values("event_type", ignore_index=True)
    return _i64(out[["event_type", "n_days", "n_events"]],
                ["n_days", "n_events"])


SQL_EVENTS_UNPIVOT_CHECK = f"""
WITH u AS (
  UNPIVOT (SELECT * FROM read_parquet('{ORACLE_ARTIFACT_DIR}/events_wide.parquet'))
  ON {", ".join(_EV_TYPES)}
  INTO NAME event_type VALUE n)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM u WHERE n > 0
GROUP BY 1 ORDER BY 1
"""
