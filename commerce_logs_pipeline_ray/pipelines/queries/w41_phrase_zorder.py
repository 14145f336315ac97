"""Wave 41: positional phrase search and Z-order layout auditing.

* phrase_search — exact multi-word phrase retrieval over the documents
  table with SLIDING (overlapping) occurrence semantics: the Ray side
  builds flat word-position buffers per batch and matches each phrase with
  shifted vectorized equality over the whole buffer (the positional-postings
  intersection, no per-doc Python loop); the oracle re-derives the same
  counts relationally via unnest + generate_subscripts self-joins at rn+1 /
  rn+2.  Top-5 docs per phrase by (count DESC, doc_id).
* zorder_layout_audit — Morton/Z-order clustering audit for the
  (l_partkey, l_suppkey) 2-D predicate workload: interleave the low 16 bits
  of both keys, bucket rows by the top 14 Z bits (fixed-width Z ranges — no
  global rank needed, so the audit is one combiner pass), and report each
  block's row count and per-key spans.  Tight per-block spans are what lets
  parquet zonemaps prune 2-D predicates at 100-TB layouts; the oracle
  rebuilds the interleave with a 16-term bit expression.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums, topk  # noqa: F401

_PHRASES = ["batch batch", "merge data", "sort table scan", "the fast key"]
_PHRASE_TOPK = 5


def q_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Sliding-window phrase occurrence counts for a fixed query-phrase set,
    top-5 docs per phrase.  Per batch: ONE split of every text into a flat
    word buffer + doc offsets, then per phrase a shifted vectorized equality
    over the buffer (w[i]==p0 & w[i+1]==p1 & ...) masked to stay inside one
    document — overlapping matches count, matching the oracle's positional
    self-join."""
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    phrase_words = [p.split() for p in _PHRASES]

    def count_batch(t: pa.Table) -> pd.DataFrame:
        words = pc.split_pattern(t["text"], " ")
        flat = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        offs = flat.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = flat.values
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_words = offs[1:] - offs[:-1]
        doc_of = np.repeat(np.arange(len(doc_ids), dtype=np.int64), n_words)
        uniq = {w for pw in phrase_words for w in pw}
        eq = {w: np.asarray(pc.equal(vals, w)) for w in uniq}
        out_p, out_d, out_c = [], [], []
        n = len(vals)
        for ph, pw in zip(_PHRASES, phrase_words):
            k = len(pw)
            if n < k:
                continue
            m = eq[pw[0]][: n - k + 1].copy()
            for s, w in enumerate(pw[1:], start=1):
                m &= eq[w][s: n - k + 1 + s]
            # the whole window must sit inside one document
            m &= doc_of[: n - k + 1] == doc_of[k - 1:]
            if not m.any():
                continue
            cnt = np.bincount(doc_of[: n - k + 1][m], minlength=len(doc_ids))
            nz = np.nonzero(cnt)[0]
            # docs are partitioned by row, so per-(phrase, doc) counts are
            # complete within the batch — prune to the per-phrase top-5 now
            order = np.lexsort((doc_ids[nz], -cnt[nz]))[:_PHRASE_TOPK]
            out_p.extend([ph] * len(order))
            out_d.append(doc_ids[nz][order])
            out_c.append(cnt[nz][order])
        if not out_p:
            return pd.DataFrame({"phrase": pd.Series([], dtype="object"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "n_occ": pd.Series([], dtype="int64")})
        return pd.DataFrame({"phrase": out_p,
                             "doc_id": np.concatenate(out_d),
                             "n_occ": np.concatenate(out_c).astype(np.int64)})

    counts = docs.map_batches(count_batch, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    out = (counts.sort_values(["phrase", "n_occ", "doc_id"],
                              ascending=[True, False, True])
                 .groupby("phrase", as_index=False)
                 .head(_PHRASE_TOPK)
                 .reset_index(drop=True))
    return _i64(out[["phrase", "doc_id", "n_occ"]], ["doc_id", "n_occ"])


_PHRASE_SQL_LIST = ", ".join(f"'{p}'" for p in _PHRASES)

SQL_PHRASE_SEARCH = f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS rn
  FROM documents),
ph AS (SELECT UNNEST([{_PHRASE_SQL_LIST}]) AS phrase),
pw AS (
  SELECT phrase, string_split(phrase, ' ') AS ws, len(string_split(phrase, ' ')) AS k
  FROM ph),
hits AS (
  SELECT pw.phrase, w1.doc_id, w1.rn
  FROM pw
  JOIN w w1 ON w1.word = pw.ws[1]
  JOIN w w2 ON w2.doc_id = w1.doc_id AND w2.rn = w1.rn + 1 AND w2.word = pw.ws[2]
  WHERE pw.k = 2
  UNION ALL
  SELECT pw.phrase, w1.doc_id, w1.rn
  FROM pw
  JOIN w w1 ON w1.word = pw.ws[1]
  JOIN w w2 ON w2.doc_id = w1.doc_id AND w2.rn = w1.rn + 1 AND w2.word = pw.ws[2]
  JOIN w w3 ON w3.doc_id = w1.doc_id AND w3.rn = w1.rn + 2 AND w3.word = pw.ws[3]
  WHERE pw.k = 3),
cnt AS (
  SELECT phrase, doc_id, COUNT(*) AS n_occ FROM hits GROUP BY 1, 2),
rk AS (
  SELECT phrase, doc_id, n_occ,
         ROW_NUMBER() OVER (PARTITION BY phrase ORDER BY n_occ DESC, doc_id) AS r
  FROM cnt)
SELECT phrase, doc_id, CAST(n_occ AS BIGINT) AS n_occ
FROM rk WHERE r <= {_PHRASE_TOPK}
ORDER BY phrase, n_occ DESC, doc_id
"""

_Z_BITS = 16
_Z_BLOCK_SHIFT = 18  # top 14 bits of the 32-bit Z value → ≤16384 blocks


def _interleave16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton interleave of the low 16 bits: x bits at even positions,
    y bits at odd."""
    z = np.zeros(len(x), np.int64)
    for i in range(_Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def q_zorder_layout_audit(sf_dir: str) -> pd.DataFrame:
    """Z-order clustering audit: per fixed-width Z-range block (top 14 bits
    of the 32-bit Morton code of l_partkey%2^16 × l_suppkey%2^16), the row
    count and the part/supp key spans a zonemap would store.  One combiner
    pass — per-batch partial min/max/count per block — then an
    output-bounded (≤16384-row) reduce."""
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def part(t: pa.Table) -> pd.DataFrame:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = _interleave16(pk % 65536, sk % 65536)
        blk = z >> _Z_BLOCK_SHIFT
        df = pd.DataFrame({"z_block": blk, "pk": pk, "sk": sk})
        g = df.groupby("z_block")
        out = g.agg(n_rows=("pk", "size"), p_min=("pk", "min"),
                    p_max=("pk", "max"), s_min=("sk", "min"),
                    s_max=("sk", "max")).reset_index()
        return out

    parts = li.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)

    def reduce_blocks(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("z_block")
        return g.agg(n_rows=("n_rows", "sum"), p_min=("p_min", "min"),
                     p_max=("p_max", "max"), s_min=("s_min", "min"),
                     s_max=("s_max", "max")).reset_index()

    out = reduce_blocks(parts.to_pandas())
    out["part_span"] = out["p_max"] - out["p_min"]
    out["supp_span"] = out["s_max"] - out["s_min"]
    out = out[["z_block", "n_rows", "part_span", "supp_span"]].sort_values(
        "z_block", ignore_index=True)
    return _i64(out, ["z_block", "n_rows", "part_span", "supp_span"])


_Z_TERMS = " + ".join(
    [f"(((l_partkey % 65536) >> {i}) & 1) * {1 << (2 * i)}" for i in range(_Z_BITS)]
    + [f"(((l_suppkey % 65536) >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(_Z_BITS)])

SQL_ZORDER_LAYOUT_AUDIT = f"""
WITH z AS (
  SELECT l_partkey, l_suppkey, ({_Z_TERMS}) AS zval
  FROM lineitem),
b AS (
  SELECT zval // {1 << _Z_BLOCK_SHIFT} AS z_block, l_partkey, l_suppkey FROM z)
SELECT CAST(z_block AS BIGINT) AS z_block,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(l_partkey) - MIN(l_partkey) AS BIGINT) AS part_span,
       CAST(MAX(l_suppkey) - MIN(l_suppkey) AS BIGINT) AS supp_span
FROM b GROUP BY 1 ORDER BY 1
"""
