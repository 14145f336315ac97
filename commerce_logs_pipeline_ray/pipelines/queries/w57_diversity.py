"""Wave 57: diversity and inequality statistics, integer-exact.

* vocab_richness_chao1 — the Chao1 (1984) species-richness lower bound per
  source: Ŝ = S_obs + f₁² / (2·f₂) (bias-corrected f₁(f₁−1)/(2(f₂+1))
  when f₂ = 0), in exact ppm-free integers: report S_obs, f₁, f₂ and the
  10³-quantized estimate — all from ONE word-count exchange.
* inverse_simpson_diversity — Hill number of order 2 per source:
  ²D = (Σn)² / Σn², the effective vocabulary size, 10³-quantized by
  truncating division — same count table, no second pass.
* theil_index_supplier_revenue — the Theil (1967) inequality index of
  supplier revenue per nation in the shared µnat convention:
  T = Σᵢ (xᵢ/X)·ln(xᵢ·N/X) folds as Σ xᵢ·round(10⁶·ln(xᵢN/X)) // X over
  the output-bounded supplier revenue table.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401


def _word_counts(sf_dir: str) -> pd.DataFrame:
    docs = _t(sf_dir, "documents", ["source", "text"])

    def words(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ")
        flat = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = offs[1:] - offs[:-1]
        idx = np.repeat(np.arange(len(t), dtype=np.int64), n_words)
        df = pd.DataFrame({"source": t["source"].to_numpy(zero_copy_only=False)[idx],
                           "word": flat.values.to_numpy(zero_copy_only=False),
                           "n": 1})
        return df.groupby(["source", "word"], as_index=False).sum()

    return grouped_sums(
        docs.map_batches(words, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "word"], {"n": "n"}, reduce="driver").to_pandas()


def q_vocab_richness_chao1(sf_dir: str) -> pd.DataFrame:
    """Chao1 per source: S_obs, singleton/doubleton counts and the
    10³-quantized estimate (classic form when f₂ > 0, bias-corrected
    otherwise) — one word-count exchange, the estimator folds per source."""
    counts = _word_counts(sf_dir)
    rows = []
    for src, g in counts.groupby("source"):
        n = g["n"].to_numpy(np.int64)
        s_obs = len(n)
        f1 = int((n == 1).sum())
        f2 = int((n == 2).sum())
        if f2 > 0:
            est_milli = 1000 * s_obs + (1000 * f1 * f1) // (2 * f2)
        else:
            est_milli = 1000 * s_obs + (1000 * f1 * (f1 - 1)) // 2
        rows.append({"source": src, "s_obs": s_obs, "f1": f1, "f2": f2,
                     "chao1_milli": est_milli})
    out = pd.DataFrame(rows).sort_values("source", ignore_index=True)
    return _i64(out, ["s_obs", "f1", "f2", "chao1_milli"])


SQL_VOCAB_RICHNESS_CHAO1 = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT source, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
s AS (
  SELECT source, COUNT(*) AS s_obs,
         CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM c GROUP BY 1)
SELECT source, CAST(s_obs AS BIGINT) AS s_obs, f1, f2,
       CAST(CASE WHEN f2 > 0
                 THEN 1000 * s_obs + (1000 * f1 * f1) // (2 * f2)
                 ELSE 1000 * s_obs + (1000 * f1 * (f1 - 1)) // 2 END
            AS BIGINT) AS chao1_milli
FROM s ORDER BY source
"""


def q_inverse_simpson_diversity(sf_dir: str) -> pd.DataFrame:
    """Hill ²D per source: (Σn)² · 10³ // Σn² — the effective vocabulary
    size under squared-probability weighting, from the same count table."""
    counts = _word_counts(sf_dir)
    rows = []
    for src, g in counts.groupby("source"):
        n = g["n"].to_numpy(np.int64)
        sx, sxx = int(n.sum()), int((n * n).sum())
        rows.append({"source": src, "n_tokens": sx,
                     "inv_simpson_milli": (1000 * sx * sx) // sxx})
    out = pd.DataFrame(rows).sort_values("source", ignore_index=True)
    return _i64(out, ["n_tokens", "inv_simpson_milli"])


SQL_INVERSE_SIMPSON_DIVERSITY = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT source, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
m AS (
  SELECT source, CAST(SUM(n) AS HUGEINT) AS sx,
         CAST(SUM(n * n) AS HUGEINT) AS sxx
  FROM c GROUP BY 1)
SELECT source, CAST(sx AS BIGINT) AS n_tokens,
       CAST((1000 * sx * sx) // sxx AS BIGINT) AS inv_simpson_milli
FROM m ORDER BY source
"""


def q_theil_index_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """Theil T of supplier revenue per nation, µnat: per-supplier revenue
    units reduce distributed; T folds as Σ xᵢ·round(10⁶·ln(xᵢ·N/X)) // X
    in Python ints on the ≤|suppliers| table."""
    import ray as _ray

    s = pq.read_table(f"{sf_dir}/supplier.parquet",
                      columns=["s_suppkey", "s_nationkey"]).to_pandas()
    n = pq.read_table(f"{sf_dir}/nation.parquet",
                      columns=["n_nationkey", "n_name"]).to_pandas()
    names = n.sort_values("n_nationkey")["n_name"].to_numpy()
    s = s.sort_values("s_suppkey")
    smap_ref = _ray.put((s["s_suppkey"].to_numpy(np.int64),
                         s["s_nationkey"].to_numpy(np.int64)))

    li = _t(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])

    def part(t: pa.Table) -> pd.DataFrame:
        keys, nk = _ray.get(smap_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(keys, sk)
        i[i == len(keys)] = 0
        ep = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        dc = np.rint((1.0 - t["l_discount"].to_numpy(zero_copy_only=False)) * 100.0).astype(np.int64)
        df = pd.DataFrame({"nk": nk[i], "sk": sk, "x": ep * dc})
        return df.groupby(["nk", "sk"], as_index=False).sum()

    per_supp = grouped_sums(
        li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["nk", "sk"], {"x": "x"}, reduce="driver").to_pandas()
    rows = []
    for nk, g in per_supp.groupby("nk"):
        x = g["x"].to_numpy(np.int64)
        x = x[x > 0]
        if len(x) < 2:
            continue
        X = int(x.sum())
        N = len(x)
        term = _rd(np.log(x.astype(np.float64) * N / X) * 1e6, 0).astype(np.int64)
        ssum = int((x * term).sum())
        t_munat = abs(ssum) // X * (1 if ssum >= 0 else -1)
        rows.append({"n_name": names[int(nk)], "n_suppliers": N,
                     "theil_munat": t_munat})
    if not rows:  # single-supplier nations everywhere → empty on both sides
        return pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                             "n_suppliers": pd.Series([], dtype="int64"),
                             "theil_munat": pd.Series([], dtype="int64")})
    out = pd.DataFrame(rows).sort_values("n_name", ignore_index=True)
    return _i64(out, ["n_suppliers", "theil_munat"])


SQL_THEIL_INDEX_SUPPLIER_REVENUE = """
WITH rev AS (
  SELECT n_name, l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)) AS HUGEINT) AS x
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  GROUP BY 1, 2),
tot AS (
  SELECT n_name, CAST(SUM(x) AS HUGEINT) AS xtot, COUNT(*) AS N
  FROM rev WHERE x > 0 GROUP BY 1),
terms AS (
  SELECT rev.n_name, rev.x, tot.xtot, tot.N,
         CAST(ROUND(LN(CAST(rev.x AS DOUBLE) * tot.N / CAST(tot.xtot AS DOUBLE))
                    * 1000000) AS BIGINT) AS t
  FROM rev JOIN tot USING (n_name) WHERE rev.x > 0 AND tot.N >= 2)
SELECT n_name, CAST(MAX(N) AS BIGINT) AS n_suppliers,
       CAST(CAST(SUM(x * t) AS HUGEINT) // MAX(xtot) AS BIGINT) AS theil_munat
FROM terms GROUP BY 1 ORDER BY 1
"""
