"""Wave 52: recommender similarity and data-freshness operations.

* item_similarity_topk — item-item collaborative-filtering similarity
  (Sarwar et al. 2001): cosine over order co-occurrence, cos²(a,b) =
  c²/(d_a·d_b) ranked by the 10¹²-quantized integer ratio (squaring keeps
  the ordering and the arithmetic exact).  Co-occurrence counts come from
  the SHARED co-purchase edge artifact; item degrees are one combiner
  pass; top-10 pairs.
* freshness_audit — per-event-type data-vintage: last event day, staleness
  vs the corpus horizon, and the last-day event count — the monitoring
  row a pipeline scheduler alerts on.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, grouped_sums, topk  # noqa: F401

_SIM_TOPK = 10
_SIM_SCALE = 1_000_000_000_000


def q_item_similarity_topk(sf_dir: str) -> pd.DataFrame:
    """Top-10 item pairs by co-occurrence cosine (quantized integer
    cos² = 10¹²·c² // (d_a·d_b), ties by pair): edge counts from the shared
    artifact, per-item degrees (distinct orders containing the item) as one
    combiner reduce, the ranking fold on the edge table."""
    from .graph_edges import ensure_copurchase_edges_parquet

    deg = grouped_sums(
        grouped_sums(_t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
                     ["l_orderkey", "l_partkey"], {}),
        ["l_partkey"], {}, count_name="d", reduce="driver").to_pandas()
    dmap = deg.sort_values("l_partkey")
    keys = dmap["l_partkey"].to_numpy(np.int64)
    dval = dmap["d"].to_numpy(np.int64)

    e = pq.read_table(ensure_copurchase_edges_parquet(sf_dir),
                      columns=["part_a", "part_b", "c"]).to_pandas()
    a = e["part_a"].to_numpy(np.int64)
    b = e["part_b"].to_numpy(np.int64)
    c = e["c"].to_numpy(np.int64)
    da = dval[np.searchsorted(keys, a)]
    db = dval[np.searchsorted(keys, b)]
    q = (_SIM_SCALE * c * c) // (da * db)
    out = pd.DataFrame({"part_a": a, "part_b": b, "c": c, "cos2_q": q})
    out = out.sort_values(["cos2_q", "part_a", "part_b"],
                          ascending=[False, True, True],
                          ignore_index=True).head(_SIM_TOPK)
    return _i64(out, ["part_a", "part_b", "c", "cos2_q"])


SQL_ITEM_SIMILARITY_TOPK = f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
deg AS (SELECT l_partkey, COUNT(*) AS dg FROM d GROUP BY 1),
e AS (SELECT part_a, part_b, c
      FROM read_parquet('{ORACLE_ARTIFACT_DIR}/copurchase_edges.parquet/*.parquet'))
SELECT part_a, part_b, CAST(c AS BIGINT) AS c,
       CAST(({_SIM_SCALE} * CAST(c AS HUGEINT) * c) // (x.dg * y.dg) AS BIGINT)
         AS cos2_q
FROM e JOIN deg x ON x.l_partkey = part_a JOIN deg y ON y.l_partkey = part_b
ORDER BY cos2_q DESC, part_a, part_b LIMIT {_SIM_TOPK}
"""


def q_freshness_audit(sf_dir: str) -> pd.DataFrame:
    """Per-event-type vintage: last day seen, staleness days vs the corpus
    horizon, events on that last day.  Per-(type, day) counts reduce
    distributed; the horizon fold runs on the bounded grid."""
    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "day_id": pc.divide(pc.cast(t["ts"], pa.int64()),
                                             pa.scalar(86_400_000_000, pa.int64()))})

    daily = grouped_sums(
        _t(sf_dir, "events", ["event_type", "ts"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day_id"], {}, count_name="n",
        reduce="driver").to_pandas()
    horizon = int(daily["day_id"].max())
    last = (daily.sort_values("day_id")
                 .groupby("event_type", as_index=False)
                 .last()
                 .rename(columns={"day_id": "last_day", "n": "n_last_day"}))
    last["stale_days"] = horizon - last["last_day"]
    out = last[["event_type", "last_day", "stale_days", "n_last_day"]]
    out = out.sort_values("event_type", ignore_index=True)
    return _i64(out, ["last_day", "stale_days", "n_last_day"])


SQL_FRESHNESS_AUDIT = """
WITH d AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_id,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2),
mx AS (SELECT MAX(day_id) AS horizon FROM d),
last AS (
  SELECT event_type, MAX(day_id) AS last_day FROM d GROUP BY 1)
SELECT last.event_type, last_day,
       CAST(mx.horizon - last_day AS BIGINT) AS stale_days,
       CAST(d.n AS BIGINT) AS n_last_day
FROM last JOIN d ON d.event_type = last.event_type AND d.day_id = last.last_day, mx
ORDER BY last.event_type
"""
