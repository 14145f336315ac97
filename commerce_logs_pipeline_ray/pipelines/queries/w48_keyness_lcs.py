"""Wave 48: corpus keyness and sequence alignment.

* keyness_odds_ratio — corpus-comparison keyness (the odds-ratio variant of
  Kilgarriff's keyword statistic): for every word, the Haldane-corrected
  integer-quantized odds ratio between source src0 and the rest of the
  corpus, top-10 by (OR_q DESC, word).  One word×source count exchange;
  the 2×2 algebra runs on the reduced table with 10⁶-quantized integer
  cross-multiplication (2·a+1 numerators make the correction exact in
  integers).
* lcs_event_sequences — longest common subsequence of the two most active
  users' event-type sequences (Wagner-Fischer DP): the Ray side runs the
  prefix-max row-sweep formulation vectorized across each DP row; the
  oracle reads the INDEPENDENT scalar-DP reference artifact — two
  implementations of the same recurrence must agree exactly.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, grouped_sums  # noqa: F401
from .neardup_a import _ensure_artifact

_KEY_TOPK = 10
_KEY_SRC = "src0"


def q_keyness_odds_ratio(sf_dir: str) -> pd.DataFrame:
    """Top-10 keywords of source src0 vs the rest by Haldane-corrected
    odds ratio, quantized: OR_q = 10⁶·(2a+1)·(2d+1) // ((2b+1)·(2c+1))
    where a,b = word counts in/out of src0 and c,d = other-word counts
    in/out.  One (word, in_src) count exchange; the 2×2 fold is driver-side
    on the reduced vocabulary."""
    docs = _t(sf_dir, "documents", ["source", "text"])

    def words(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ")
        flat = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = offs[1:] - offs[:-1]
        idx = np.repeat(np.arange(len(t), dtype=np.int64), n_words)
        in_src = np.asarray(pc.equal(t["source"], _KEY_SRC))[idx]
        df = pd.DataFrame({"word": flat.values.to_numpy(zero_copy_only=False),
                           "in_src": in_src.astype(np.int64), "n": 1})
        return df.groupby(["word", "in_src"], as_index=False).sum()

    counts = grouped_sums(
        docs.map_batches(words, batch_format="pyarrow", zero_copy_batch=True),
        ["word", "in_src"], {"n": "n"}, reduce="driver").to_pandas()
    piv = counts.pivot_table(index="word", columns="in_src", values="n",
                             fill_value=0, aggfunc="sum")
    a = piv[1].to_numpy(np.int64) if 1 in piv.columns else np.zeros(len(piv), np.int64)
    b = piv[0].to_numpy(np.int64) if 0 in piv.columns else np.zeros(len(piv), np.int64)
    ta, tb = int(a.sum()), int(b.sum())
    c, d = ta - a, tb - b
    or_q = ((1_000_000 * (2 * a + 1) * (2 * d + 1))
            // ((2 * b + 1) * (2 * c + 1)))
    out = pd.DataFrame({"word": piv.index.to_numpy(), "n_in": a, "n_out": b,
                        "or_q": or_q})
    out = out.sort_values(["or_q", "word"], ascending=[False, True],
                          ignore_index=True).head(_KEY_TOPK)
    return _i64(out[["word", "n_in", "n_out", "or_q"]],
                ["n_in", "n_out", "or_q"])


SQL_KEYNESS_ODDS_RATIO = f"""
WITH w AS (
  SELECT CASE WHEN source = '{_KEY_SRC}' THEN 1 ELSE 0 END AS in_src,
         unnest(string_split(text, ' ')) AS word
  FROM documents),
c AS (
  SELECT word,
         CAST(SUM(in_src) AS HUGEINT) AS a,
         CAST(SUM(1 - in_src) AS HUGEINT) AS b
  FROM w GROUP BY 1),
tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM c)
SELECT word, CAST(a AS BIGINT) AS n_in, CAST(b AS BIGINT) AS n_out,
       CAST((1000000 * (2 * a + 1) * (2 * (tb - b) + 1))
            // ((2 * b + 1) * (2 * (ta - a) + 1)) AS BIGINT) AS or_q
FROM c, tot
ORDER BY or_q DESC, word LIMIT {_KEY_TOPK}
"""


def _top2_user_seqs(sf_dir: str) -> tuple[int, int, list[str], list[str]]:
    """The two most active users (count DESC, user_id ASC) and their
    event-type sequences ordered by (ts, event_id).  User counts reduce as
    combiners (output-bounded at |users|); only the TWO winners' rows are
    read back, with the predicate pushed to the parquet scan."""
    import pyarrow.dataset as _pads

    counts = grouped_sums(_t(sf_dir, "events", ["user_id"]), ["user_id"], {},
                          count_name="n", reduce="driver").to_pandas()
    top = counts.sort_values(["n", "user_id"], ascending=[False, True])
    u1, u2 = int(top.iloc[0]["user_id"]), int(top.iloc[1]["user_id"])
    expr = _pads.field("user_id").isin([u1, u2])
    df = pq.read_table(f"{sf_dir}/events.parquet",
                       columns=["user_id", "ts", "event_id", "event_type"],
                       filters=expr).to_pandas()
    s1 = df[df["user_id"] == u1].sort_values(["ts", "event_id"])["event_type"].tolist()
    s2 = df[df["user_id"] == u2].sort_values(["ts", "event_id"])["event_type"].tolist()
    return u1, u2, s1, s2


def ensure_lcs_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact: the INDEPENDENT scalar Wagner-Fischer DP (full
    (n+1)×(m+1) table, plain Python loops) on the top-2 users' sequences —
    cross-checks the vectorized prefix-max sweep."""
    import os as _os

    def build() -> pa.Table:
        u1, u2, s1, s2 = _top2_user_seqs(sf_dir)
        n, m = len(s1), len(s2)
        dp = [[0] * (n + 1) for _ in range(m + 1)]
        for j in range(1, m + 1):
            for i in range(1, n + 1):
                if s1[i - 1] == s2[j - 1]:
                    dp[j][i] = dp[j - 1][i - 1] + 1
                else:
                    dp[j][i] = max(dp[j - 1][i], dp[j][i - 1])
        return pa.table({"user_a": pa.array([u1], pa.int64()),
                         "user_b": pa.array([u2], pa.int64()),
                         "len_a": pa.array([n], pa.int64()),
                         "len_b": pa.array([m], pa.int64()),
                         "lcs_len": pa.array([dp[m][n]], pa.int64())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "lcs_ref.parquet"), build)


def q_lcs_event_sequences(sf_dir: str) -> pd.DataFrame:
    """LCS length of the two most active users' event-type sequences via
    the prefix-max row sweep: dp_j(i) = max(dp_{j-1}(i), runmax_i(dp_{j-1}
    (i-1)+1 where s1_i == s2_j)) — each row is O(n) vectorized numpy, so
    the DP is m vector passes, not n·m scalar steps."""
    ensure_lcs_ref_parquet(sf_dir)
    u1, u2, s1, s2 = _top2_user_seqs(sf_dir)
    a = np.asarray(s1, dtype=object)
    prev = np.zeros(len(a) + 1, np.int64)
    for ch in s2:
        cand = np.where(a == ch, prev[:-1] + 1, 0)
        # prefix-max identity: dp_j(i) = max(dp_{j-1}(i), max_{k<=i} cand_k)
        cur = np.maximum(prev[1:], np.maximum.accumulate(cand))
        prev = np.concatenate([[0], cur])
    out = pd.DataFrame([{"user_a": u1, "user_b": u2, "len_a": len(s1),
                         "len_b": len(s2), "lcs_len": int(prev[-1])}])
    return _i64(out, ["user_a", "user_b", "len_a", "len_b", "lcs_len"])


SQL_LCS_EVENT_SEQUENCES = f"""
SELECT user_a, user_b, len_a, len_b, lcs_len
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/lcs_ref.parquet')
"""
