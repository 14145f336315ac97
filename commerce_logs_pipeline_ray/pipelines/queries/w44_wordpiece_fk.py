"""Wave 44: tokenizer-training, schema-inference and bitmap-index planning
operators.

* wordpiece_top_merges — the WordPiece merge-selection step (Schuster &
  Nakajima 2012; the likelihood score count(xy) / (count(x)·count(y)) used
  by BERT's tokenizer trainer): adjacent non-space char-pair counts and
  unigram char counts reduce as combiners over the flat text byte buffer
  (one bincount per batch, no per-word loop); the score orders candidates
  by the 10¹²-quantized integer ratio so both engines rank identically.
* fk_inference_audit — schema discovery: for each candidate (child column
  → parent key) pair, the distinct-value containment ratio in exact ppm.
  Child distincts reduce inside a key-bucket exchange; parent key sets are
  broadcast sorted arrays (dimension-sized).
* bitmap_container_plan — Roaring-bitmap container planning (Lemire et al.
  2016 semantics, simplified rule): order keys chunked by high 16 bits;
  per chunk the distinct cardinality and ascending-run count decide
  array / run / bitmap encoding.  Distinct+runs fold inside a chunk-keyed
  bucket exchange with vectorized diffs.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import grouped_sums  # noqa: F401

_WP_TOPK = 10
_WP_SCALE = 1_000_000_000_000


def q_wordpiece_top_merges(sf_dir: str) -> pd.DataFrame:
    """Top-10 WordPiece merge candidates over the documents corpus by the
    integer-quantized likelihood score 10¹²·c(xy) // (c(x)·c(y)), ties by
    pair.  Per batch: one pass over the flat UTF-8 buffer — char bincount
    + adjacent-pair bincount masked to within-word positions."""
    docs = _t(sf_dir, "documents", ["text"])

    def count_batch(t: pa.Table) -> pd.DataFrame:
        col = t["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        arr = arr.cast(pa.large_string())
        buffers = arr.buffers()
        offs = np.frombuffer(buffers[1], np.int64)[arr.offset: arr.offset + len(arr) + 1]
        raw = np.frombuffer(buffers[2], np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
        # slice to this array's byte range (the buffer may be shared/offset)
        data = raw[offs[0]: offs[-1]]
        offs = offs - offs[0]
        sp = np.uint8(32)
        chars = np.bincount(data[(data != sp)], minlength=256)
        # adjacent pairs inside one doc and inside one word
        a, b = data[:-1], data[1:]
        # mask out pairs crossing document boundaries
        cross = np.zeros(len(data) - 1, bool) if len(data) > 1 else np.zeros(0, bool)
        ends = offs[1:-1] - 1  # last byte index of each doc except the final one
        cross[ends[(ends >= 0) & (ends < len(cross))]] = True
        m = (a != sp) & (b != sp) & ~cross
        pair_codes = a[m].astype(np.int64) * 256 + b[m]
        pairs = np.bincount(pair_codes, minlength=65536)
        nz = np.nonzero(pairs)[0]
        cnz = np.nonzero(chars)[0]
        return pd.DataFrame({
            "kind": ["c"] * len(cnz) + ["p"] * len(nz),
            "code": np.concatenate([cnz, nz]).astype(np.int64),
            "n": np.concatenate([chars[cnz], pairs[nz]]).astype(np.int64)})

    agg = grouped_sums(
        docs.map_batches(count_batch, batch_format="pyarrow", zero_copy_batch=True),
        ["kind", "code"], {"n": "n"}, reduce="driver").to_pandas()
    ch = agg[agg["kind"] == "c"].set_index("code")["n"]
    pr = agg[agg["kind"] == "p"]
    rows = []
    for code, cxy in zip(pr["code"], pr["n"]):
        x, y = int(code) // 256, int(code) % 256
        score = (_WP_SCALE * int(cxy)) // (int(ch[x]) * int(ch[y]))
        rows.append({"pair": chr(x) + chr(y), "c_xy": int(cxy),
                     "score_q": score})
    out = (pd.DataFrame(rows)
             .sort_values(["score_q", "pair"], ascending=[False, True],
                          ignore_index=True)
             .head(_WP_TOPK))
    return _i64(out[["pair", "c_xy", "score_q"]], ["c_xy", "score_q"])


SQL_WORDPIECE_TOP_MERGES = f"""
WITH pos AS (
  SELECT text, unnest(generate_series(1, length(text))) AS i FROM documents),
ch AS (
  SELECT substr(text, i, 1) AS c,
         CASE WHEN i < length(text) THEN substr(text, i + 1, 1) ELSE '' END AS d
  FROM pos),
cx AS (SELECT c, COUNT(*) AS n FROM ch WHERE c <> ' ' GROUP BY 1),
cp AS (
  SELECT c, d, COUNT(*) AS n FROM ch
  WHERE c <> ' ' AND d <> ' ' AND d <> '' GROUP BY 1, 2)
SELECT cp.c || cp.d AS pair, CAST(cp.n AS BIGINT) AS c_xy,
       CAST(({_WP_SCALE} * cp.n) // (x.n * y.n) AS BIGINT) AS score_q
FROM cp JOIN cx x ON x.c = cp.c JOIN cx y ON y.c = cp.d
ORDER BY score_q DESC, pair LIMIT {_WP_TOPK}
"""

_FK_CANDIDATES = [
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


def q_fk_inference_audit(sf_dir: str) -> pd.DataFrame:
    """Foreign-key inference: for each candidate (child.col → parent.key),
    the distinct-containment ratio in exact ppm.  Child distincts reduce
    via key combiners (grouped_sums with no aggregates); the parent key
    array broadcasts once per pair."""
    import ray as _ray

    rows = []
    for child_t, child_c, parent_t, parent_c in _FK_CANDIDATES:
        pk = np.sort(pq.read_table(f"{sf_dir}/{parent_t}.parquet",
                                   columns=[parent_c])[parent_c]
                     .to_numpy(zero_copy_only=False).astype(np.int64))
        pk_ref = _ray.put(pk)
        distinct = grouped_sums(_t(sf_dir, child_t, [child_c]), [child_c], {})

        def member(t: pa.Table, _ref=pk_ref, _col=child_c) -> pd.DataFrame:
            keys = _ray.get(_ref)
            v = t[_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(keys):
                i = np.searchsorted(keys, v)
                i[i == len(keys)] = 0
                hit = (keys[i] == v).sum()
            else:
                hit = 0
            return pd.DataFrame({"n_child_distinct": [len(v)],
                                 "n_contained": [int(hit)]})

        part = distinct.map_batches(member, batch_format="pyarrow",
                                    zero_copy_batch=True).to_pandas()
        nd, nc = int(part["n_child_distinct"].sum()), int(part["n_contained"].sum())
        rows.append({"fk": f"{child_t}.{child_c}->{parent_t}.{parent_c}",
                     "n_child_distinct": nd, "n_contained": nc,
                     "containment_ppm": (1_000_000 * nc) // nd if nd else 0})
    out = pd.DataFrame(rows).sort_values("fk", ignore_index=True)
    return _i64(out, ["n_child_distinct", "n_contained", "containment_ppm"])


def _fk_sql_one(child_t: str, child_c: str, parent_t: str, parent_c: str) -> str:
    return f"""
  SELECT '{child_t}.{child_c}->{parent_t}.{parent_c}' AS fk,
         CAST(COUNT(*) AS BIGINT) AS n_child_distinct,
         CAST(SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contained,
         CAST((1000000 * SUM(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END))
              // COUNT(*) AS BIGINT) AS containment_ppm
  FROM (SELECT DISTINCT {child_c} AS v FROM {child_t}) c
  LEFT JOIN (SELECT DISTINCT {parent_c} AS k FROM {parent_t}) p ON p.k = c.v"""


SQL_FK_INFERENCE_AUDIT = (
    "\nUNION ALL\n".join(_fk_sql_one(*cand) for cand in _FK_CANDIDATES)
    + "\nORDER BY fk"
)

_BMP_CHUNK_BITS = 16
_BMP_ARRAY_MAX = 4096


def q_bitmap_container_plan(sf_dir: str) -> pd.DataFrame:
    """Roaring-style container plan for the order-key bitmap: per high-16-
    bit chunk, distinct cardinality and ascending-run count choose the
    container (array when card < 4096; else run when 2·runs < card; else
    bitmap).  Distinct keys reduce in a chunk-keyed bucket exchange; run
    counting is one vectorized diff over each chunk's sorted uniques."""
    from ...functions.relational import bucketed_group_reduce

    def to_chunk(t: pa.Table) -> pd.DataFrame:
        v = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"chunk": v >> _BMP_CHUNK_BITS, "v": v})
        return df.drop_duplicates()

    keys = _t(sf_dir, "orders", ["o_orderkey"]).map_batches(
        to_chunk, batch_format="pyarrow", zero_copy_batch=True)

    def plan(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ch, g in df.groupby("chunk"):
            u = np.unique(g["v"].to_numpy(np.int64))
            runs = int(1 + (np.diff(u) != 1).sum()) if len(u) else 0
            card = len(u)
            if card < _BMP_ARRAY_MAX:
                container = "array"
            elif 2 * runs < card:
                container = "run"
            else:
                container = "bitmap"
            rows.append({"chunk": int(ch), "card": card, "n_runs": runs,
                         "container": container})
        return pd.DataFrame(rows)

    out = bucketed_group_reduce(keys, ["chunk"], plan).to_pandas()
    out = out.sort_values("chunk", ignore_index=True)
    return _i64(out[["chunk", "card", "n_runs", "container"]],
                ["chunk", "card", "n_runs"])


SQL_BITMAP_CONTAINER_PLAN = f"""
WITH d AS (SELECT DISTINCT o_orderkey AS v FROM orders),
r AS (
  SELECT v >> {_BMP_CHUNK_BITS} AS chunk, v,
         CASE WHEN v - LAG(v) OVER (PARTITION BY v >> {_BMP_CHUNK_BITS}
                                    ORDER BY v) = 1
              THEN 0 ELSE 1 END AS run_start
  FROM d),
agg AS (
  SELECT chunk, COUNT(*) AS card, SUM(run_start) AS n_runs FROM r GROUP BY 1)
SELECT CAST(chunk AS BIGINT) AS chunk, CAST(card AS BIGINT) AS card,
       CAST(n_runs AS BIGINT) AS n_runs,
       CASE WHEN card < {_BMP_ARRAY_MAX} THEN 'array'
            WHEN 2 * n_runs < card THEN 'run' ELSE 'bitmap' END AS container
FROM agg ORDER BY chunk
"""
