"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _t, grouped_sums, md5_hex, np, pa, pc, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 21: soft-dedup loss weighting, stratified k-fold assignment
# ---------------------------------------------------------------------------


def q_soft_dedup_weights(sf_dir: str) -> pd.DataFrame:
    """SoftDeDup loss weighting (keep duplicates, downweight them — the
    SlimPajama-style alternative to hard removal): each document's weight is
    1/c where c is its exact content-duplicate count, and a source's
    effective token mass is Σ ⌊10⁶·n_words/c⌋ µtokens — per-document floor
    quantization keeps the sum INTEGER-exact across engines.  Two combiner
    exchanges: content-fp → duplicate counts (md5 oracle convention; the
    curation hot path uses fnv128), then a broadcast-free fp-bucketed join
    of counts back onto docs riding the same exchange."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])

    def tag(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        nw = np.diff(np.asarray(lst.offsets, dtype=np.int64))
        return pd.DataFrame(
            {"fp": md5_hex(t["text"]).to_pylist(),
             "source": t["source"].to_pylist(),
             "n_words": nw}
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def per_fp(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("fp")["source"].transform("size").to_numpy(np.int64)
        nw = df["n_words"].to_numpy(np.int64)
        eff = (nw * 1_000_000) // c
        out = pd.DataFrame(
            {"source": df["source"].to_numpy(),
             "n_docs": 1,
             "raw_words": nw,
             "eff_uwords": eff,
             "dup_docs": (c > 1).astype(np.int64)}
        )
        return out.groupby("source", as_index=False).sum()

    agg = grouped_sums(
        bucketed_group_reduce(tagged, ["fp"], per_fp, num_buckets=32),
        ["source"],
        {"n_docs": "n_docs", "raw_words": "raw_words",
         "eff_uwords": "eff_uwords", "dup_docs": "dup_docs"},
    ).to_pandas()
    out = agg.sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "raw_words", "eff_uwords", "dup_docs"])


SQL_SOFT_DEDUP_WEIGHTS = """
WITH d AS (
  SELECT doc_id, source, md5(text) AS fp,
         LEN(string_split(text, ' ')) AS n_words
  FROM documents),
c AS (SELECT fp, COUNT(*) AS cnt FROM d GROUP BY 1)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(d.n_words) AS BIGINT) AS raw_words,
       CAST(SUM((d.n_words * 1000000) // c.cnt) AS BIGINT) AS eff_uwords,
       CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
FROM d JOIN c ON c.fp = d.fp
GROUP BY 1 ORDER BY d.source
"""


_KFOLD_K = 5


def q_stratified_kfold(sf_dir: str) -> pd.DataFrame:
    """Stratified k-fold assignment (the sklearn StratifiedKFold contract,
    hash-order deterministic): within each source stratum documents rank by
    md5(doc_id) and take fold = (rank-1) mod k, so folds are balanced to
    ±1 per stratum and stable across reruns/partitionings.  The per-stratum
    rank is a bucketed exchange on source moving only (doc_id, hash)
    projections; output is the (fold × source) composition plus an id
    checksum the oracle reproduces."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def add_h(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "source": t["source"],
             "h": md5_hex(pc.cast(t["doc_id"], pa.string()))}
        )

    keyed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)

    def per_stratum(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"], ignore_index=True)
        rk = df.groupby("source", sort=False).cumcount()
        df["fold"] = (rk % _KFOLD_K).astype(np.int64)
        out = pd.DataFrame(
            {"fold": df["fold"], "source": df["source"],
             "n_docs": 1, "id_sum": df["doc_id"].astype("int64")}
        )
        return out.groupby(["fold", "source"], as_index=False).sum()

    agg = grouped_sums(
        bucketed_group_reduce(keyed, ["source"], per_stratum, num_buckets=16),
        ["fold", "source"],
        {"n_docs": "n_docs", "id_sum": "id_sum"},
    ).to_pandas()
    out = agg.sort_values(["fold", "source"], ignore_index=True)
    return _i64(out, ["fold", "n_docs", "id_sum"])


SQL_STRATIFIED_KFOLD = f"""
WITH r AS (
  SELECT doc_id, source,
         (ROW_NUMBER() OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
           % {_KFOLD_K} AS fold
  FROM documents)
SELECT fold, source, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM r GROUP BY 1, 2 ORDER BY fold, source
"""


