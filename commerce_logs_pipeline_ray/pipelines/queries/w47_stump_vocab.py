"""Wave 47: a decision-stump split finder and the vocabulary-pruning curve.

* decision_stump_split — the CART split-selection primitive (Breiman et
  al. 1984): for each candidate cents threshold, the weighted Gini
  impurity of the (value ≤ t) split predicting event_type = 'purchase',
  in deterministically-quantized integers (each side's 10¹²·2·pos·neg // n
  term quantized separately, so both engines compute the identical
  argmin-able score).  One combiner pass evaluates every threshold.
* vocab_pruning_curve — tokenizer-budget planning: OOV token share (ppm)
  as a function of vocabulary size, for 5 cutoffs from ONE word-count
  exchange — the cumulative-coverage fold needs only the count table,
  never a second corpus pass.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums, topk  # noqa: F401

_STUMP_THRESHOLDS = [100, 500, 1000, 2000, 5000, 10000, 20000]
_STUMP_SCALE = 1_000_000_000_000


def q_decision_stump_split(sf_dir: str) -> pd.DataFrame:
    """Weighted-Gini stump scores for 7 cents thresholds on the
    purchase-vs-rest label: per batch ONE vectorized comparison per
    threshold feeds (n_left, pos_left) combiners; totals close the right
    side for free; the quantized impurity fold runs on 7 rows."""
    ev = _t(sf_dir, "events", ["event_type", "value"])
    ths = np.asarray(_STUMP_THRESHOLDS, np.int64)

    def part(t: pa.Table) -> pd.DataFrame:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)),
                        pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.asarray(pc.equal(t["event_type"], "purchase"))
        left = cents[None, :] <= ths[:, None]
        return pd.DataFrame({
            "threshold": ths,
            "n_left": left.sum(1).astype(np.int64),
            "pos_left": (left & pos[None, :]).sum(1).astype(np.int64),
            "n": len(cents), "pos": int(pos.sum())})

    agg = grouped_sums(
        ev.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["threshold"], {c: c for c in ["n_left", "pos_left", "n", "pos"]},
        reduce="driver").to_pandas()
    rows = []
    for _, r in agg.iterrows():
        n, pos = int(r["n"]), int(r["pos"])
        nl, pl = int(r["n_left"]), int(r["pos_left"])
        nr, pr = n - nl, pos - pl
        ql = (_STUMP_SCALE * 2 * pl * (nl - pl)) // nl if nl else 0
        qr = (_STUMP_SCALE * 2 * pr * (nr - pr)) // nr if nr else 0
        rows.append({"threshold": int(r["threshold"]), "n_left": nl,
                     "pos_left": pl, "impurity_q": ql + qr})
    out = pd.DataFrame(rows).sort_values("threshold", ignore_index=True)
    return _i64(out, ["threshold", "n_left", "pos_left", "impurity_q"])


_STUMP_SQL_LIST = ", ".join(str(t) for t in _STUMP_THRESHOLDS)

SQL_DECISION_STUMP_SPLIT = f"""
WITH e AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
th AS (SELECT UNNEST([{_STUMP_SQL_LIST}]) AS threshold),
s AS (
  SELECT th.threshold,
         CAST(SUM(CASE WHEN e.cents <= th.threshold THEN 1 ELSE 0 END) AS HUGEINT) AS nl,
         CAST(SUM(CASE WHEN e.cents <= th.threshold THEN e.y ELSE 0 END) AS HUGEINT) AS pl,
         CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(e.y) AS HUGEINT) AS pos
  FROM th, e GROUP BY 1)
SELECT CAST(threshold AS BIGINT) AS threshold, CAST(nl AS BIGINT) AS n_left,
       CAST(pl AS BIGINT) AS pos_left,
       CAST(
         (CASE WHEN nl > 0
               THEN ({_STUMP_SCALE} * 2 * pl * (nl - pl)) // nl ELSE 0 END)
         + (CASE WHEN n - nl > 0
                 THEN ({_STUMP_SCALE} * 2 * (pos - pl) * ((n - nl) - (pos - pl)))
                      // (n - nl) ELSE 0 END)
       AS BIGINT) AS impurity_q
FROM s ORDER BY threshold
"""

_VOCAB_SIZES = [10, 20, 50, 100, 200]


def q_vocab_pruning_curve(sf_dir: str) -> pd.DataFrame:
    """OOV token share (ppm) vs vocabulary size: one word-count exchange,
    then the cumulative coverage of the (count DESC, word) ranking read off
    at 5 cutoffs — integer-exact, no second corpus pass."""
    docs = _t(sf_dir, "documents", ["text"])

    def words(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ")
        flat = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        df = pd.DataFrame({"word": flat.values.to_numpy(zero_copy_only=False),
                           "n": 1})
        return df.groupby("word", as_index=False).sum()

    counts = grouped_sums(
        docs.map_batches(words, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], {"n": "n"}, reduce="driver").to_pandas()
    counts = counts.sort_values(["n", "word"], ascending=[False, True],
                                ignore_index=True)
    total = int(counts["n"].sum())
    cum = counts["n"].cumsum().to_numpy(np.int64)
    rows = []
    for v in _VOCAB_SIZES:
        covered = int(cum[min(v, len(cum)) - 1]) if len(cum) else 0
        oov = total - covered
        rows.append({"vocab_size": v, "oov_tokens": oov,
                     "oov_ppm": (1_000_000 * oov) // total if total else 0})
    out = pd.DataFrame(rows)
    return _i64(out, ["vocab_size", "oov_tokens", "oov_ppm"])


SQL_VOCAB_PRUNING_CURVE = f"""
WITH w AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, COUNT(*) AS n FROM w GROUP BY 1),
r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rk FROM c),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
v AS (SELECT UNNEST([{", ".join(str(v) for v in _VOCAB_SIZES)}]) AS vocab_size)
SELECT v.vocab_size AS vocab_size,
       CAST(tot.total - COALESCE(SUM(CASE WHEN r.rk <= v.vocab_size
                                          THEN r.n END), 0) AS BIGINT)
         AS oov_tokens,
       CAST((1000000 * (tot.total
             - COALESCE(SUM(CASE WHEN r.rk <= v.vocab_size THEN r.n END), 0)))
            // tot.total AS BIGINT) AS oov_ppm
FROM v, tot LEFT JOIN r ON TRUE
GROUP BY 1, tot.total ORDER BY 1
"""
