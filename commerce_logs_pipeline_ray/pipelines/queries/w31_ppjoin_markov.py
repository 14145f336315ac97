"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 31: prefix-filter similarity join, Markov stationary distribution
# ---------------------------------------------------------------------------

_PFJ_T_NUM = 3
_PFJ_T_DEN = 5  # Jaccard threshold 3/5


def q_prefix_filter_join(sf_dir: str) -> pd.DataFrame:
    """Prefix-filtered set-similarity join (PPJoin family, Xiao et al.
    2008): exact Jaccard ≥ 0.6 pairs over 3-word SHINGLE sets, found
    without all pairs — order every set by global df (rarest first), keep
    only the first |d| − ⌈0.6·|d|⌉ + 1 shingles as the PREFIX (any
    qualifying pair must share a prefix shingle), generate candidates via
    one prefix-shingle exchange, verify exactly with integer
    cross-multiplication (5·|A∩B| ≥ 3·|A∪B|).  The oracle is the
    EXHAUSTIVE pairwise join, so a single missed pair breaks the hash —
    the pruning math itself is under test.  Shingles (unlike unigrams on a
    small vocabulary) are globally rare, so prefix groups stay tiny and
    candidates are near-dup-bounded; verification is FULLY DISTRIBUTED:
    candidate pairs pull their two docs' shingle sets through two
    hash-partitioned joins keyed on doc id (duplication bounded by the
    candidate count), and each worker scores its pairs with the integer
    cross-multiplication — no candidate list or shingle set ever
    materializes on the driver."""
    from ...functions.relational import bucketed_group_reduce, hash_join

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def wd_rows(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        off = np.asarray(lst.offsets, dtype=np.int64)
        vals = lst.values
        L = len(vals)
        if L < 3:
            return pd.DataFrame({"w": pd.Series([], dtype=object),
                                 "doc_id": pd.Series([], dtype="int64")})
        # shingle i is internal iff i+2 stays inside the same doc
        internal = np.ones(L - 2, dtype=bool)
        starts = off[1:-1]
        for d in (1, 2):
            hit = starts - d
            internal[hit[(hit >= 0) & (hit < L - 2)]] = False
        lens = np.diff(off)
        ids = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            np.maximum(lens - 2, 0),
        )
        # one Arrow kernel builds all shingle strings (np.char.add chains
        # were ~10× slower on wide batches)
        joined = pc.binary_join_element_wise(
            vals.slice(0, L - 2), vals.slice(1, L - 2), vals.slice(2, L - 2), " "
        )
        sh = joined.filter(pa.array(internal)).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"w": sh, "doc_id": ids}).drop_duplicates()

    # a (shingle, doc) pair originates from exactly one row/batch, so the
    # per-batch dedup in wd_rows is already global-distinct
    wd = ds.map_batches(
        wd_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a shingle are co-located: df is complete in-bucket —
        # no driver-side dictionary ever ships to workers
        df = df.copy()
        df["df"] = df.groupby("w")["doc_id"].transform("size").astype(np.int64)
        return df

    wdf = bucketed_group_reduce(wd, ["w"], attach_df, num_buckets=32)

    def prefixes(df: pd.DataFrame) -> pd.DataFrame:
        # per doc: sort shingles by (df asc, shingle asc), keep the prefix;
        # carry the 1-based position in the sorted FULL set plus the set
        # size so pair generation can apply the length + positional filters
        df = df.sort_values(["doc_id", "df", "w"], kind="stable")
        size = df.groupby("doc_id")["w"].transform("size").to_numpy(np.int64)
        rk = df.groupby("doc_id", sort=False).cumcount().to_numpy()
        ceil_t = (_PFJ_T_NUM * size + _PFJ_T_DEN - 1) // _PFJ_T_DEN
        plen = size - ceil_t + 1
        keep = rk < plen
        out = df[keep][["w", "doc_id"]].copy()
        out["pos"] = (rk[keep] + 1).astype(np.int64)
        out["size"] = size[keep]
        return out

    pref = bucketed_group_reduce(wdf, ["doc_id"], prefixes, num_buckets=32)

    def pairs_per_token(df: pd.DataFrame) -> pd.DataFrame:
        # Xiao et al. 2008 pruning at generation time, both sound (zero
        # false negatives — the exhaustive oracle is the proof):
        #   length filter: Jaccard ≥ 3/5 needs 5·min(|A|,|B|) ≥ 3·max;
        #   positional filter: at the pair's FIRST shared prefix token the
        #     overlap is ≤ 1 + min(|A|−pa, |B|−pb), which must reach
        #     α = ⌈3(|A|+|B|)/8⌉ (8·I ≥ 3(|A|+|B|) ⇔ 5I ≥ 3U); a later
        #     shared token only shrinks the bound, so keeping pairs where
        #     ANY occurrence passes is a sound superset.
        out = []
        for _, g in df.groupby("w", sort=False):
            if len(g) < 2:
                continue
            ids = g["doc_id"].to_numpy(np.int64)
            o = np.argsort(ids)
            ids = ids[o]
            ps = g["pos"].to_numpy(np.int64)[o]
            ns = g["size"].to_numpy(np.int64)[o]
            ii, jj = np.triu_indices(len(ids), k=1)
            na, nb = ns[ii], ns[jj]
            pa, pb = ps[ii], ps[jj]
            alpha = (3 * (na + nb) + 7) // 8
            keep = (
                (5 * np.minimum(na, nb) >= 3 * np.maximum(na, nb))
                & (1 + np.minimum(na - pa, nb - pb) >= alpha)
            )
            if keep.any():
                out.append(pd.DataFrame({"a": ids[ii][keep], "b": ids[jj][keep]}))
        if not out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True).drop_duplicates()

    # Distributed verification in two bucketed exchanges, no Dataset.join
    # aggregator spin-up:
    #   exchange A (key = doc id): union the corpus (shingle, doc) rows with
    #     two half-rows per candidate pair; in-bucket, pack each doc's sorted
    #     shingle set ONCE (vectorized agg) and merge it onto its pair-halves.
    #   exchange B (key = pair): the two packed sets of a pair co-locate;
    #     dedup duplicate candidates (a pair can surface from several prefix
    #     shingles) and score with the integer cross-multiplication.
    pairs_ds = bucketed_group_reduce(pref, ["w"], pairs_per_token, num_buckets=32)

    def halves(t: pa.Table) -> pd.DataFrame:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(a)
        return pd.DataFrame(
            {"k": np.concatenate([a, b]),
             "a": np.concatenate([a, a]),
             "b": np.concatenate([b, b]),
             "ws": np.full(2 * m, "", dtype=object),
             "n": np.full(2 * m, -1, dtype=np.int64)}
        )

    def pack_local(t: pa.Table) -> pd.DataFrame:
        # all (shingle, doc) rows of one doc originate from one batch of
        # wd_rows, so the per-doc set packs LOCALLY — no exchange needed
        df = t.to_pandas().sort_values(["doc_id", "w"], kind="stable")
        g = df.groupby("doc_id", sort=False)["w"]
        packed = g.agg("\x00".join).reset_index()
        n = g.size().to_numpy(np.int64)
        return pd.DataFrame(
            {"k": packed["doc_id"].to_numpy(np.int64),
             "a": np.full(len(packed), -1, dtype=np.int64),
             "b": np.full(len(packed), -1, dtype=np.int64),
             "ws": packed["w"].to_numpy(object),
             "n": n}
        )

    mixed = wd.map_batches(
        pack_local, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        pairs_ds.map_batches(halves, batch_format="pyarrow", zero_copy_batch=True)
    )

    _EMPTY = {"a": "int64", "b": "int64", "s": "int64", "ws": object, "n": "int64"}

    def attach_sets(df: pd.DataFrame) -> pd.DataFrame:
        hv = df[df["n"] < 0]
        if hv.empty:
            return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in _EMPTY.items()})
        packed = df[df["n"] >= 0][["k", "ws", "n"]]
        m = hv[["k", "a", "b"]].merge(packed, on="k")
        m = m.rename(columns={"k": "s"})
        return m[["a", "b", "s", "ws", "n"]]

    att = bucketed_group_reduce(mixed, ["k"], attach_sets, num_buckets=32)

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["a", "b", "s"], kind="stable")
        a2 = df["a"].to_numpy(np.int64)
        b2 = df["b"].to_numpy(np.int64)
        wsv = df["ws"].to_numpy(object)
        nv = df["n"].to_numpy(np.int64)
        da, db, di, du = [], [], [], []
        for i in range(0, len(df), 2):  # exactly two rows (sides) per pair
            inter = len(set(wsv[i].split("\x00")) & set(wsv[i + 1].split("\x00")))
            uni = int(nv[i]) + int(nv[i + 1]) - inter
            if _PFJ_T_DEN * inter >= _PFJ_T_NUM * uni:
                da.append(int(a2[i])); db.append(int(b2[i]))
                di.append(inter); du.append(uni)
        return pd.DataFrame(
            {"doc_a": pd.Series(da, dtype="int64"),
             "doc_b": pd.Series(db, dtype="int64"),
             "inter": pd.Series(di, dtype="int64"),
             "uni": pd.Series(du, dtype="int64")}
        )

    out = bucketed_group_reduce(att, ["a", "b"], score_bucket,
                                num_buckets=32).to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                            "doc_b": pd.Series([], dtype="int64"),
                            "inter": pd.Series([], dtype="int64"),
                            "uni": pd.Series([], dtype="int64")})
    out = out.sort_values(["doc_a", "doc_b"], ignore_index=True)
    return _i64(out, ["doc_a", "doc_b", "inter", "uni"])


SQL_PREFIX_FILTER_JOIN = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
wd AS (
  SELECT DISTINCT doc_id,
         a[g.i] || ' ' || a[g.i + 1] || ' ' || a[g.i + 2] AS w
  FROM ws, unnest(generate_series(1, len(a) - 2)) AS g(i)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM wd GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM wd a JOIN wd b ON b.w = a.w AND b.doc_id > a.doc_id
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS inter,
       CAST(sa.n + sb.n - i.i AS BIGINT) AS uni
FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
WHERE {_PFJ_T_DEN} * i.i >= {_PFJ_T_NUM} * (sa.n + sb.n - i.i)
ORDER BY i.doc_a, i.doc_b
"""


_MKV_ITERS = 20
_MKV_MU = 1_000_000


def q_markov_stationary(sf_dir: str) -> pd.DataFrame:
    """Stationary distribution of the user-behaviour Markov chain by
    µ-quantized integer power iteration: transition counts from one
    bucketed LAG exchange (windows.py::transition_matrix shape), then 20
    iterations of x'[j] = Σ_s x[s]·C[s,j] // R[s] — every step floors to
    integers, so both engines run the identical deterministic recursion
    (the oracle unrolls it as 20 chained CTEs).  Reports the fixed point in
    µ units plus the normalized probabilities."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        keys_arr = df["user_id"].to_numpy()
        types = df["event_type"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = keys_arr[1:] == keys_arr[:-1]
        pairs = pd.DataFrame(
            {"s": np.roll(types, 1)[same], "t": types[same], "n": 1}
        )
        return pairs.groupby(["s", "t"], as_index=False).sum()

    counts = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_bucket),
        ["s", "t"],
        {"n": "n"},
    ).to_pandas()
    states = sorted(set(counts["s"].astype(str)) | set(counts["t"].astype(str)))
    idx = {s: k for k, s in enumerate(states)}
    k = len(states)
    C = np.zeros((k, k), dtype=np.int64)
    for s, t, n in zip(counts["s"].astype(str), counts["t"].astype(str),
                       counts["n"].astype(int)):
        C[idx[s], idx[t]] = n
    R = C.sum(axis=1)
    x = np.full(k, _MKV_MU, dtype=np.int64)
    for _ in range(_MKV_ITERS):
        x = np.array(
            [int(sum(int(x[s]) * int(C[s, j]) // int(R[s])
                     for s in range(k) if R[s] > 0))
             for j in range(k)],
            dtype=np.int64,
        )
    tot = int(x.sum())
    out = pd.DataFrame(
        {"state": states, "x_mu": x,
         "pi": _rd(x.astype(np.float64) / float(tot), 6)}
    )
    return _i64(out, ["x_mu"])


def _mkv_sql() -> str:
    head = """
WITH r AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
c AS MATERIALIZED (SELECT prev AS s, event_type AS t, CAST(COUNT(*) AS BIGINT) AS n
      FROM r WHERE prev IS NOT NULL GROUP BY 1, 2),
rs AS MATERIALIZED (SELECT s, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
states AS MATERIALIZED (SELECT DISTINCT s AS st FROM c UNION SELECT DISTINCT t FROM c),
x0 AS MATERIALIZED (SELECT st, CAST(1000000 AS BIGINT) AS x FROM states)"""
    steps = []
    for i in range(1, _MKV_ITERS + 1):
        steps.append(f""",
x{i} AS MATERIALIZED (
  SELECT st.st,
         CAST(COALESCE(SUM(p.x * c.n // rs.tot), 0) AS BIGINT) AS x
  FROM states st
  LEFT JOIN c ON c.t = st.st
  LEFT JOIN rs ON rs.s = c.s
  LEFT JOIN x{i - 1} p ON p.st = c.s
  GROUP BY 1)""")
    tail = f"""
SELECT st AS state, x AS x_mu,
       ROUND(CAST(x AS DOUBLE) / (SELECT CAST(SUM(x) AS DOUBLE) FROM x{_MKV_ITERS}), 6)
         AS pi
FROM x{_MKV_ITERS} ORDER BY state"""
    return head + "".join(steps) + tail


SQL_MARKOV_STATIONARY = _mkv_sql()


