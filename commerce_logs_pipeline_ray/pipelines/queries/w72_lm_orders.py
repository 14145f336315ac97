"""Wave 72: language-model order comparison in the µnat convention.

* ngram_order_compare — corpus cross-entropy of the add-one-smoothed
  unigram vs bigram model over the documents' word stream (per document:
  bigrams do not cross document boundaries): H₁ = Σ_w c_w·term(w) // N
  with term = round(10⁶·ln((N+V)/(c_w+1))), H₂ the bigram analog with
  per-context denominators — the (H₁ − H₂) gain in µnats is what one
  model order buys, the planning number for tokenizer/LM budget choices.
  Counts reduce as one exchange; the entropy folds run on the count
  tables.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def q_ngram_order_compare(sf_dir: str) -> pd.DataFrame:
    """H₁ vs H₂ (add-one smoothing, µnat) and the order gain."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ")
        flat = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = flat.values.to_numpy(zero_copy_only=False)
        n_words = offs[1:] - offs[:-1]
        doc_of = np.repeat(np.arange(len(t), dtype=np.int64), n_words)
        uni = pd.DataFrame({"kind": "u", "a": vals, "b": "", "n": 1})
        if len(vals) > 1:
            same = doc_of[1:] == doc_of[:-1]
            big = pd.DataFrame({"kind": "b", "a": vals[:-1][same],
                                "b": vals[1:][same], "n": 1})
            out = pd.concat([uni, big], ignore_index=True)
        else:
            out = uni
        return out.groupby(["kind", "a", "b"], as_index=False).sum()

    agg = grouped_sums(
        docs.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        ["kind", "a", "b"], {"n": "n"}, reduce="driver").to_pandas()
    uni = agg[agg["kind"] == "u"]
    big = agg[agg["kind"] == "b"]
    N = int(uni["n"].sum())
    V = len(uni)
    cu = uni["n"].to_numpy(np.int64)
    t1 = _rd(np.log((N + V) / (cu + 1.0)) * 1e6, 0).astype(np.int64)
    h1 = int((cu * t1).sum()) // N

    NB = int(big["n"].sum())
    if NB == 0:
        out = pd.DataFrame([{"n_tokens": N, "vocab": V, "h1_munat": h1,
                             "h2_munat": 0, "gain_munat": h1}])
        return _i64(out, ["n_tokens", "vocab", "h1_munat", "h2_munat",
                          "gain_munat"])
    ctx = dict(zip(uni["a"], cu))
    cb = big["n"].to_numpy(np.int64)
    cx = big["a"].map(ctx).to_numpy(np.int64)
    t2 = _rd(np.log((cx + V) / (cb + 1.0)) * 1e6, 0).astype(np.int64)
    h2 = int((cb * t2).sum()) // NB
    out = pd.DataFrame([{"n_tokens": N, "vocab": V, "h1_munat": h1,
                         "h2_munat": h2, "gain_munat": h1 - h2}])
    return _i64(out, ["n_tokens", "vocab", "h1_munat", "h2_munat",
                      "gain_munat"])


SQL_NGRAM_ORDER_COMPARE = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS rn
  FROM documents),
uni AS (SELECT word, COUNT(*) AS c FROM w GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS N, COUNT(*) AS V FROM uni),
h1t AS (
  SELECT uni.c * CAST(ROUND(LN((tot.N + tot.V) / (uni.c + 1.0)) * 1000000)
                      AS BIGINT) AS v
  FROM uni, tot),
big AS (
  SELECT a.word AS x, b.word AS y, COUNT(*) AS c
  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
  GROUP BY 1, 2),
nb AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS NB FROM big),
h2t AS (
  SELECT big.c * CAST(ROUND(LN((uni.c + tot.V) / (big.c + 1.0)) * 1000000)
                      AS BIGINT) AS v
  FROM big JOIN uni ON uni.word = big.x, tot)
SELECT tot.N AS n_tokens, CAST(tot.V AS BIGINT) AS vocab,
       CAST(CAST((SELECT SUM(v) FROM h1t) AS HUGEINT) // tot.N AS BIGINT)
         AS h1_munat,
       CAST(CASE WHEN nb.NB > 0
                 THEN CAST((SELECT SUM(v) FROM h2t) AS HUGEINT) // nb.NB
                 ELSE 0 END AS BIGINT) AS h2_munat,
       CAST(CAST((SELECT SUM(v) FROM h1t) AS HUGEINT) // tot.N
            - CASE WHEN nb.NB > 0
                   THEN CAST((SELECT SUM(v) FROM h2t) AS HUGEINT) // nb.NB
                   ELSE 0 END AS BIGINT) AS gain_munat
FROM tot, nb
"""
