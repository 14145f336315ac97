"""Wave 49: information-theoretic corpus statistics in the µnat integer
convention (each log term ROUND(LN(·)·10⁶) on BOTH engines, so sums stay
integer-exact; the convention every µnat query in this repo shares).

* conditional_entropy_rate — the bigram entropy rate H(Y|X) of the
  event-type chain (Shannon 1948; the sequence-predictability measure):
  per-user consecutive pairs reduce as (x, y) combiners; H folds as
  Σ c_xy · round(10⁶·ln(c_x / c_xy)) // total over the ≤|types|² table.
* mutual_information_lang_source — MI between the documents' lang and
  source columns: Σ c_xy · round(10⁶·ln(N·c_xy / (c_x·c_y))) // N over the
  bounded contingency table — the column-dependence score a curation
  pipeline uses to detect confounded samplers.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def q_conditional_entropy_rate(sf_dir: str) -> pd.DataFrame:
    """Bigram conditional entropy of event-type chains, µnat: consecutive
    same-user (prev, next) pairs ordered by (ts, event_id) reduce inside a
    user-keyed bucket exchange; the entropy fold runs on the ≤|types|²
    transition table."""
    from ...functions.relational import bucketed_group_reduce

    def to_seq(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "ts_us": pc.cast(t["ts"], pa.int64()),
                         "event_id": t["event_id"],
                         "event_type": t["event_type"]})

    ev = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]).map_batches(
        to_seq, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        u = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        out = pd.DataFrame({"x": et[:-1][same], "y": et[1:][same], "n": 1})
        return out.groupby(["x", "y"], as_index=False).sum()

    trans = grouped_sums(
        bucketed_group_reduce(ev, ["user_id"], pairs),
        ["x", "y"], {"n": "n"}, reduce="driver").to_pandas()
    if trans.empty:
        return pd.DataFrame({"n_transitions": pd.Series([0], dtype="int64"),
                             "h_munat": pd.Series([0], dtype="int64")})
    cx = trans.groupby("x")["n"].sum()
    total = int(trans["n"].sum())
    term = _rd(np.log(cx[trans["x"]].to_numpy(np.float64)
                      / trans["n"].to_numpy(np.float64)) * 1e6, 0).astype(np.int64)
    h = int((trans["n"].to_numpy(np.int64) * term).sum()) // total
    out = pd.DataFrame([{"n_transitions": total, "h_munat": h}])
    return _i64(out, ["n_transitions", "h_munat"])


SQL_CONDITIONAL_ENTROPY_RATE = """
WITH e AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events),
p AS (
  SELECT prev AS x, event_type AS y, COUNT(*) AS n
  FROM e WHERE prev IS NOT NULL GROUP BY 1, 2),
cx AS (SELECT x, SUM(n) AS nx FROM p GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM p),
terms AS (
  SELECT p.n * CAST(ROUND(LN(CAST(cx.nx AS DOUBLE) / CAST(p.n AS DOUBLE))
                          * 1000000) AS BIGINT) AS t
  FROM p JOIN cx USING (x))
SELECT tot.total AS n_transitions,
       CAST(CAST(COALESCE(SUM(t), 0) AS HUGEINT) // tot.total AS BIGINT)
         AS h_munat
FROM terms, tot GROUP BY tot.total
"""


def q_mutual_information_lang_source(sf_dir: str) -> pd.DataFrame:
    """MI(lang; source) over documents, µnat: the contingency table reduces
    as one combiner pass; MI folds as Σ c_xy·round(10⁶·ln(N·c_xy/(c_x·c_y)))
    // N on the bounded table."""
    docs = _t(sf_dir, "documents", ["lang", "source"])

    def cells(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": t["lang"].to_numpy(zero_copy_only=False),
                           "source": t["source"].to_numpy(zero_copy_only=False),
                           "n": 1})
        return df.groupby(["lang", "source"], as_index=False).sum()

    tab = grouped_sums(
        docs.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "source"], {"n": "n"}, reduce="driver").to_pandas()
    cl = tab.groupby("lang")["n"].sum()
    cs = tab.groupby("source")["n"].sum()
    total = int(tab["n"].sum())
    num = float(total) * tab["n"].to_numpy(np.float64)
    den = (cl[tab["lang"]].to_numpy(np.float64)
           * cs[tab["source"]].to_numpy(np.float64))
    term = _rd(np.log(num / den) * 1e6, 0).astype(np.int64)
    s = int((tab["n"].to_numpy(np.int64) * term).sum())
    # quantization can push a near-independent table's sum a few µnat below
    # zero — truncate toward zero to match DuckDB's `//`
    mi = abs(s) // total * (1 if s >= 0 else -1)
    out = pd.DataFrame([{"n_docs": total, "n_cells": len(tab),
                         "mi_munat": mi}])
    return _i64(out, ["n_docs", "n_cells", "mi_munat"])


SQL_MUTUAL_INFORMATION_LANG_SOURCE = """
WITH t AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
cl AS (SELECT lang, SUM(n) AS nl FROM t GROUP BY 1),
cs AS (SELECT source, SUM(n) AS ns FROM t GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_cells FROM t),
terms AS (
  SELECT t.n * CAST(ROUND(LN(CAST(tot.total AS DOUBLE) * CAST(t.n AS DOUBLE)
                             / (CAST(cl.nl AS DOUBLE) * CAST(cs.ns AS DOUBLE)))
                          * 1000000) AS BIGINT) AS v
  FROM t JOIN cl USING (lang) JOIN cs USING (source), tot)
SELECT tot.total AS n_docs, CAST(tot.n_cells AS BIGINT) AS n_cells,
       CAST(CAST(SUM(v) AS HUGEINT) // tot.total AS BIGINT) AS mi_munat
FROM terms, tot GROUP BY tot.total, tot.n_cells
"""
