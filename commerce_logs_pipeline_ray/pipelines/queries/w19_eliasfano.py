"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 19: Elias-Fano posting-size audit, columnar encoding advisor
# ---------------------------------------------------------------------------


def q_elias_fano_audit(sf_dir: str) -> pd.DataFrame:
    """Elias-Fano posting-list compression audit (Vigna 2013's quasi-
    succinct indices): for every vocabulary word with n postings over a
    doc-id universe U, the EF bound is n·l + n + (U >> l) bits with
    l = max(0, ⌊log₂(U/n)⌋) — ALL integer arithmetic (bit lengths, shifts),
    so both engines agree exactly.  Reports EF vs plain-32-bit footprint by
    document-frequency bucket — the index-sizing decision an IR/RAG
    pipeline makes before building postings.  Distinct (word, doc) pairs
    reduce through one word-bucketed exchange; the bit formula runs on the
    vocab-bounded frequency table."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    umax = int(
        ds.map_batches(
            lambda t: pa.table({"m": pa.array([pc.max(t["doc_id"]).as_py()], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).to_pandas()["m"].max()
    ) + 1

    def wd_partial(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        lens = np.diff(off)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        w = lst.values.to_numpy(zero_copy_only=False)
        return pd.DataFrame({"w": w, "doc_id": ids}).drop_duplicates()

    wd = ds.map_batches(wd_partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(df: pd.DataFrame, *, _u=umax) -> pd.DataFrame:
        pw = df.drop_duplicates().groupby("w", as_index=False).size()
        n = pw["size"].to_numpy(np.int64)
        q = _u // n
        l = np.array([int(x).bit_length() - 1 if x >= 1 else 0 for x in q],
                     dtype=np.int64)
        ef_bits = n * l + n + (_u >> l)
        plain_bits = 32 * n
        bucket = np.select(
            [n == 1, n <= 4, n <= 16, n <= 64],
            ["1", "2-4", "5-16", "17-64"],
            default="65+",
        )
        out = pd.DataFrame({"bucket": bucket, "n_tokens": 1,
                            "ef_bits": ef_bits, "plain_bits": plain_bits})
        return out.groupby("bucket", as_index=False).sum()

    hist = grouped_sums(
        bucketed_group_reduce(wd, ["w"], per_bucket, num_buckets=32),
        ["bucket"],
        {"n_tokens": "n_tokens", "ef_bits": "ef_bits", "plain_bits": "plain_bits"},
    ).to_pandas()
    hist["ratio"] = _rd(
        hist["ef_bits"].to_numpy(np.float64) / hist["plain_bits"].to_numpy(np.float64), 6
    )
    out = hist.sort_values("bucket", ignore_index=True)
    return _i64(out, ["n_tokens", "ef_bits", "plain_bits"])


SQL_ELIAS_FANO_AUDIT = """
WITH wd AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
u AS (SELECT MAX(doc_id) + 1 AS uu FROM documents),
pw AS (SELECT w, COUNT(*) AS n FROM wd GROUP BY 1),
ef AS (
  SELECT w, n,
         CASE WHEN (SELECT uu FROM u) // n >= 1
              THEN LENGTH(BIN((SELECT uu FROM u) // n)) - 1 ELSE 0 END AS l
  FROM pw),
b AS (SELECT w, n, n * l + n + ((SELECT uu FROM u) >> l) AS ef_bits,
             32 * n AS plain_bits
      FROM ef),
lab AS (
  SELECT CASE WHEN n = 1 THEN '1' WHEN n <= 4 THEN '2-4'
              WHEN n <= 16 THEN '5-16' WHEN n <= 64 THEN '17-64'
              ELSE '65+' END AS bucket, ef_bits, plain_bits
  FROM b)
SELECT bucket, COUNT(*) AS n_tokens, CAST(SUM(ef_bits) AS BIGINT) AS ef_bits,
       CAST(SUM(plain_bits) AS BIGINT) AS plain_bits,
       ROUND(CAST(SUM(ef_bits) AS DOUBLE) / CAST(SUM(plain_bits) AS DOUBLE), 6) AS ratio
FROM lab GROUP BY 1 ORDER BY bucket
"""


_ENC_COLS = ["event_type", "user_id", "value"]


def q_encoding_advisor(sf_dir: str) -> pd.DataFrame:
    """Columnar encoding advisor (the Parquet/ORC writer decision): per
    column — exact distinct count, run count in event-id order, average run
    length — and an integer-rule recommendation (RLE when avg run ≥ 4, DICT
    when ndv ≤ n/20, else PLAIN).  Run counting is ORDER-dependent, so it
    rides the exact distributed ROW_NUMBER: every row joins its positional
    neighbour through one pair-id exchange (works for gapped ids too, same
    semantics as SQL LAG), and boundaries reduce as combiner partials; ndv
    is one fused (column, value) distinct exchange."""
    from ...functions.rank import global_row_number
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["event_id", "event_type", "user_id", "value"])
    ranked, total = global_row_number(ds, "event_id", [])

    def fanout(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["rn"].to_numpy(np.int64)
        left = df.assign(pair=rn)
        right = df.assign(pair=rn - 1)
        out = pd.concat([left, right], ignore_index=True)
        out = out[(out["pair"] >= 1) & (out["pair"] <= total - 1)]
        return out[["pair", "rn", *_ENC_COLS]]

    pairs = ranked.map_batches(fanout, batch_format="pandas")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pair", "rn"], ignore_index=True)
        a, b = df.iloc[0::2], df.iloc[1::2]
        rows = []
        for col in _ENC_COLS:
            x, y = a[col].to_numpy(), b[col].to_numpy()
            rows.append((col, int((x != y).sum())))
        return pd.DataFrame(rows, columns=["column_name", "boundaries"])

    bounds = (
        grouped_sums(
            bucketed_group_reduce(pairs, ["pair"], per_bucket, num_buckets=32),
            ["column_name"],
            {"boundaries": "boundaries"},
        )
        .to_pandas()
        .set_index("column_name")["boundaries"]
        .to_dict()
    )

    def val_partial(t: pa.Table) -> pd.DataFrame:
        frames = []
        for col in _ENC_COLS:
            v = pc.cast(t[col], pa.string()).to_numpy(zero_copy_only=False)
            frames.append(pd.DataFrame({"column_name": col, "val": np.unique(v)}))
        return pd.concat(frames, ignore_index=True)

    ndv = (
        grouped_sums(
            ds.map_batches(val_partial, batch_format="pyarrow", zero_copy_batch=True),
            ["column_name", "val"],
            {},
            "c",
        )
        .map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame(t.to_pandas().groupby("column_name").size(),
                             columns=["ndv"]).reset_index(),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("column_name")["ndv"]
        .sum()
        .to_dict()
    )

    rows = []
    for col in _ENC_COLS:
        runs = bounds.get(col, 0) + 1
        nd = int(ndv[col])
        if total >= 4 * runs:
            enc = "RLE"
        elif 20 * nd <= total:
            enc = "DICT"
        else:
            enc = "PLAIN"
        rows.append(
            (col, total, nd, runs, _rd(float(total) / float(runs), 6), enc)
        )
    out = pd.DataFrame(
        rows,
        columns=["column_name", "n", "ndv", "n_runs", "avg_run_len", "encoding"],
    )
    return _i64(out, ["n", "ndv", "n_runs"])


SQL_ENCODING_ADVISOR = """
WITH s AS (
  SELECT event_type, user_id, value,
         LAG(event_type) OVER w AS p_type,
         LAG(user_id) OVER w AS p_user,
         LAG(value) OVER w AS p_value
  FROM events WINDOW w AS (ORDER BY event_id)),
per AS (
  SELECT 'event_type' AS column_name, COUNT(*) AS n,
         COUNT(DISTINCT event_type) AS ndv,
         1 + SUM(CASE WHEN p_type IS NOT NULL AND event_type <> p_type
                      THEN 1 ELSE 0 END) AS n_runs
  FROM s
  UNION ALL
  SELECT 'user_id', COUNT(*), COUNT(DISTINCT user_id),
         1 + SUM(CASE WHEN p_user IS NOT NULL AND user_id <> p_user
                      THEN 1 ELSE 0 END)
  FROM s
  UNION ALL
  SELECT 'value', COUNT(*), COUNT(DISTINCT value),
         1 + SUM(CASE WHEN p_value IS NOT NULL AND value <> p_value
                      THEN 1 ELSE 0 END)
  FROM s)
SELECT column_name, n, ndv, CAST(n_runs AS BIGINT) AS n_runs,
       ROUND(CAST(n AS DOUBLE) / CAST(n_runs AS DOUBLE), 6) AS avg_run_len,
       CASE WHEN n >= 4 * n_runs THEN 'RLE'
            WHEN 20 * ndv <= n THEN 'DICT'
            ELSE 'PLAIN' END AS encoding
FROM per ORDER BY column_name
"""


