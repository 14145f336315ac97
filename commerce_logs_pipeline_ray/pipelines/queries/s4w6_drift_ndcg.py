"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from .cusum_twap import _copurchase_weighted_edges  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# Session-4 wave 6: embedding drift, bounded transitive closure, nDCG eval
# ---------------------------------------------------------------------------


def q_embedding_drift_audit(sf_dir: str) -> pd.DataFrame:
    """Embedding drift audit: per label, the cosine between the centroid of
    the even-id half and the odd-id half (self-consistency check a feature
    store runs after re-embedding).  Embeddings are quantized to integer
    µ-units FIRST, so the per-(label, parity, dim) centroid sums are exact
    int64 and the only floats are the final dot/norm expressions — written
    identically in SQL over UNNEST WITH ORDINALITY."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def part(t: pa.Table) -> pd.DataFrame:
        from ...functions.sim import _to_matrix

        mat = _to_matrix(t, "embedding")
        q = _rd(mat * 1e6, 0).astype(np.int64)  # integer µ-units
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        par = (vid % 2).astype(np.int64)
        n, dim = q.shape
        df = pd.DataFrame({
            "label": np.repeat(lab, dim), "parity": np.repeat(par, dim),
            "dim": np.tile(np.arange(dim, dtype=np.int64), n),
            "s": q.ravel(), "cnt": np.repeat(np.int64(1), n * dim)})
        return df.groupby(["label", "parity", "dim"], as_index=False).agg(
            s=("s", "sum"), cnt=("cnt", "sum"))

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    g = p.groupby(["label", "parity", "dim"], as_index=False).agg(
        s=("s", "sum"), cnt=("cnt", "sum"))
    rows = []
    for lab, sub in g.groupby("label"):
        wide = sub.pivot_table(index="dim", columns="parity", values="s",
                               aggfunc="sum", fill_value=0)
        if 0 not in wide.columns or 1 not in wide.columns:
            continue
        a = wide[0].to_numpy(np.float64)
        b = wide[1].to_numpy(np.float64)
        n0 = int(sub.loc[sub["parity"] == 0, "cnt"].sum()) // len(wide)
        n1 = int(sub.loc[sub["parity"] == 1, "cnt"].sum()) // len(wide)
        cos = float((a * b).sum()) / (
            np.sqrt(float((a * a).sum())) * np.sqrt(float((b * b).sum())))
        rows.append((int(lab), n0, n1, _rd(cos, 6)))
    out = pd.DataFrame(rows, columns=["label", "n_even", "n_odd", "cos_drift"]
                       ).sort_values("label", ignore_index=True)
    return _i64(out, ["label", "n_even", "n_odd"])


SQL_EMBEDDING_DRIFT_AUDIT = """
WITH q AS (
  SELECT label, vec_id % 2 AS parity,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(ROUND(UNNEST(CAST(embedding AS DOUBLE[])) * 1000000) AS BIGINT)
           AS qe
  FROM embeddings),
c AS (
  SELECT label, parity, dim, CAST(SUM(qe) AS BIGINT) AS s
  FROM q GROUP BY 1, 2, 3),
n AS (
  SELECT label, vec_id % 2 AS parity, COUNT(*) AS cnt
  FROM embeddings GROUP BY 1, 2),
w AS (
  SELECT a.label, a.dim, a.s AS sa, b.s AS sb
  FROM (SELECT * FROM c WHERE parity = 0) a
  JOIN (SELECT * FROM c WHERE parity = 1) b
    ON b.label = a.label AND b.dim = a.dim),
dot AS (
  SELECT label,
         CAST(SUM(sa * sb) AS DOUBLE) AS ab,
         CAST(SUM(sa * sa) AS DOUBLE) AS aa,
         CAST(SUM(sb * sb) AS DOUBLE) AS bb
  FROM w GROUP BY label)
SELECT d.label,
       (SELECT cnt FROM n WHERE n.label = d.label AND parity = 0) AS n_even,
       (SELECT cnt FROM n WHERE n.label = d.label AND parity = 1) AS n_odd,
       ROUND(ab / (sqrt(aa) * sqrt(bb)), 6) AS cos_drift
FROM dot d ORDER BY d.label
"""


def q_transitive_reach3(sf_dir: str) -> pd.DataFrame:
    """Bounded transitive closure: for every node of the strong-tie
    co-purchase graph, how many nodes sit at min-distance exactly 1, 2 and
    3 (the recommendation-radius audit).  Distributed shape: (root, node)
    frontier PAIR rows expand one hop per round through the bucketed
    exchange with per-round distinct — the all-pairs state never exceeds
    reach×|V| rows; three unrolled self-joins mirror it in SQL."""
    from ...functions.relational import bucketed_group_reduce

    edges = _copurchase_weighted_edges(sf_dir).map_batches(
        lambda t: t.filter(pc.less_equal(t["w"], 8)), batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["root", "node"], ignore_index=True)

    # d1 frontier = the edges themselves
    d1 = edges.map_batches(
        lambda t: pa.table({"root": t["src"], "node": t["dst"]}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    ed = d1.to_pandas()  # |E|-bounded (strong ties): the hop join side
    import ray as _ray

    adj_ref = _ray.put(ed.groupby("root")["node"].apply(list).to_dict())

    def hop(df: pd.DataFrame) -> pd.DataFrame:
        adj = _ray.get(adj_ref)
        roots, nodes = [], []
        for r, nd in zip(df["root"].to_numpy(), df["node"].to_numpy()):
            for nxt in adj.get(int(nd), ()):
                roots.append(r)
                nodes.append(nxt)
        out = pd.DataFrame({"root": roots, "node": nodes})
        return out.drop_duplicates(ignore_index=True)

    seen = {1: bucketed_group_reduce(d1, ["root", "node"], dedup_pairs,
                                     num_buckets=16).to_pandas()}
    for dist in (2, 3):
        prev = rd.from_pandas(seen[dist - 1]).repartition(8)
        nxt = bucketed_group_reduce(
            prev.map_batches(hop, batch_format="pandas"),
            ["root", "node"], dedup_pairs, num_buckets=16).to_pandas()
        seen[dist] = nxt
    # min-dist: subtract closer shells and self
    def key(df):
        return set(zip(df["root"], df["node"]))

    s1, s2, s3 = key(seen[1]), key(seen[2]), key(seen[3])
    roots = sorted({r for r, _ in s1})
    ex2 = {p for p in s2 if p not in s1 and p[0] != p[1]}
    ex3 = {p for p in s3 if p not in s2 and p not in s1 and p[0] != p[1]}
    from collections import Counter

    c1 = Counter(r for r, _ in s1)
    c2 = Counter(r for r, _ in ex2)
    c3 = Counter(r for r, _ in ex3)
    out = pd.DataFrame(
        {"node": roots,
         "n_d1": [c1.get(r, 0) for r in roots],
         "n_d2": [c2.get(r, 0) for r in roots],
         "n_d3": [c3.get(r, 0) for r in roots]})
    return _i64(out.sort_values("node", ignore_index=True),
                ["node", "n_d1", "n_d2", "n_d3"])


SQL_TRANSITIVE_REACH3 = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
   AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
d1 AS (SELECT u AS root, v AS node FROM e),
d2 AS (
  SELECT DISTINCT d1.root, e.v AS node
  FROM d1 JOIN e ON e.u = d1.node),
d3 AS (
  SELECT DISTINCT d2.root, e.v AS node
  FROM d2 JOIN e ON e.u = d2.node),
x2 AS (
  SELECT root, node FROM d2 t
  WHERE NOT EXISTS (SELECT 1 FROM d1 WHERE d1.root = t.root
                      AND d1.node = t.node)
    AND root <> node),
x3 AS (
  SELECT root, node FROM d3 t
  WHERE NOT EXISTS (SELECT 1 FROM d2 WHERE d2.root = t.root
                      AND d2.node = t.node)
    AND NOT EXISTS (SELECT 1 FROM d1 WHERE d1.root = t.root
                      AND d1.node = t.node)
    AND root <> node)
SELECT d1.root AS node,
       COUNT(*) AS n_d1,
       (SELECT COUNT(*) FROM x2 WHERE x2.root = d1.root) AS n_d2,
       (SELECT COUNT(*) FROM x3 WHERE x3.root = d1.root) AS n_d3
FROM d1 GROUP BY d1.root ORDER BY node
"""

_EM_TOP = 30


def q_unigram_em_step(sf_dir: str) -> pd.DataFrame:
    """One EM iteration of unigram-LM vocabulary training (the SentencePiece
    E-step, Kudo 2018): expected piece counts from the forward-backward
    lattice over every word under the current piece costs, then re-estimated
    costs.  Per-word posteriors are exact floats from integer µnat costs
    (identical formula order on both sides); each word's expected counts are
    quantized to µ-counts BEFORE the cross-word sum, so aggregation is an
    order-free int64 fold.  Distributed shape: the word-count exchange
    feeds a driver-side E-step over the BOUNDED unique-word set (the same
    |vocab|-driver contract as the segmentation query); per-word work is
    memoized.  Output: top-30 pieces by expected count."""
    import math as _math

    from ...functions.unigram import select_vocab, substring_counts, word_counts_batch

    ds = _t(sf_dir, "documents", ["text"])

    def wc_part(t: pa.Table) -> pa.Table:
        wc = word_counts_batch(t["text"].to_pylist())
        return pa.Table.from_pandas(wc, preserve_index=False)

    wc = (
        ds.map_batches(wc_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("word", as_index=False)["n"]
        .sum()
    )
    counts = substring_counts(wc)
    costs = select_vocab(counts)
    p = {piece: _math.exp(-u / 1_000_000.0) for piece, u in costs.items()}

    def estep_word(w: str) -> dict[str, int]:
        n = len(w)
        alpha = [0.0] * (n + 1)
        alpha[0] = 1.0
        for i in range(1, n + 1):
            acc = 0.0
            for L in (1, 2, 3):
                j = i - L
                if j < 0:
                    break
                pc_ = p.get(w[j:i])
                if pc_ is not None:
                    acc += alpha[j] * pc_
            alpha[i] = acc
        beta = [0.0] * (n + 1)
        beta[n] = 1.0
        for i in range(n - 1, -1, -1):
            acc = 0.0
            for L in (1, 2, 3):
                j = i + L
                if j > n:
                    break
                pc_ = p.get(w[i:j])
                if pc_ is not None:
                    acc += pc_ * beta[j]
            beta[i] = acc
        z = alpha[n]
        out: dict[str, int] = {}
        if z <= 0.0:
            return out
        for i in range(n):
            for L in (1, 2, 3):
                j = i + L
                if j > n:
                    break
                piece = w[i:j]
                pc_ = p.get(piece)
                if pc_ is None:
                    continue
                e = alpha[i] * pc_ * beta[j] / z
                out[piece] = out.get(piece, 0) + int(round(e * 1_000_000))
        return out

    ecount: dict[str, int] = {}
    for w, mult in zip(wc["word"], wc["n"]):
        for piece, eu in estep_word(w).items():
            ecount[piece] = ecount.get(piece, 0) + eu * int(mult)
    total = sum(ecount.values())
    top = sorted(ecount.items(), key=lambda kv: (-kv[1], kv[0]))[:_EM_TOP]
    rows = [
        (piece, eu, int(round(-_math.log(eu / total) * 1_000_000)))
        for piece, eu in top
    ]
    out = pd.DataFrame(rows, columns=["piece", "ecount_u", "new_cost_u"])
    return _i64(out, ["ecount_u", "new_cost_u"])


def ensure_unigram_em_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``unigram_em_step``: the same documented E-step
    derived by an independent scalar pass — its own counting loops and a
    recursive-free forward-backward written against the formula, reading
    the documents parquet directly."""
    import math as _math
    import os as _os
    from collections import Counter

    from ...functions.unigram import TOP_NGRAMS

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        wcount: Counter = Counter()
        for txt in t["text"].to_pylist():
            for w in (txt or "").split():
                wcount[w] += 1
        occ: Counter = Counter()
        for w, m in wcount.items():
            for L in (1, 2, 3):
                for i in range(len(w) - L + 1):
                    occ[w[i:i + L]] += m
        vocab = {q: c for q, c in occ.items() if len(q) == 1}
        for L in (2, 3):
            pool = sorted(((q, c) for q, c in occ.items() if len(q) == L),
                          key=lambda x: (-x[1], x[0]))[:TOP_NGRAMS]
            vocab.update(dict(pool))
        total_c = sum(vocab.values())
        prob = {q: _math.exp(-int(round(-_math.log(c / total_c) * 1_000_000))
                             / 1_000_000.0) for q, c in vocab.items()}
        ec: Counter = Counter()
        for w, m in wcount.items():
            n = len(w)
            al = [1.0] + [0.0] * n
            for i in range(1, n + 1):
                s = 0.0
                for L in (1, 2, 3):
                    if i - L >= 0 and w[i - L:i] in prob:
                        s += al[i - L] * prob[w[i - L:i]]
                al[i] = s
            be = [0.0] * n + [1.0]
            for i in range(n - 1, -1, -1):
                s = 0.0
                for L in (1, 2, 3):
                    if i + L <= n and w[i:i + L] in prob:
                        s += prob[w[i:i + L]] * be[i + L]
                be[i] = s
            if al[n] <= 0.0:
                continue
            for i in range(n):
                for L in (1, 2, 3):
                    if i + L <= n and w[i:i + L] in prob:
                        e = al[i] * prob[w[i:i + L]] * be[i + L] / al[n]
                        ec[w[i:i + L]] += int(round(e * 1_000_000)) * m
        total = sum(ec.values())
        top = sorted(ec.items(), key=lambda kv: (-kv[1], kv[0]))[:_EM_TOP]
        return pa.table(
            {"piece": pa.array([q for q, _ in top]),
             "ecount_u": pa.array([int(v) for _, v in top], pa.int64()),
             "new_cost_u": pa.array(
                 [int(round(-_math.log(v / total) * 1_000_000)) for _, v in top],
                 pa.int64())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "unigram_em_ref.parquet"), build
    )


def q_unigram_em_step_checked(sf_dir: str) -> pd.DataFrame:
    ensure_unigram_em_parquet(sf_dir)
    return q_unigram_em_step(sf_dir)


SQL_UNIGRAM_EM_STEP = """
SELECT piece, ecount_u, new_cost_u
FROM read_parquet('{AD}/unigram_em_ref.parquet')
ORDER BY ecount_u DESC, piece
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


_UCB_REWARD_C = 500  # reward 1 iff value ≥ $5.00
_UCB_ARMS = ("click", "error", "purchase", "signup", "view")


def _ucb1_episode(types: list[str], rewards: list[int]) -> dict[str, list[int]]:
    """One user's UCB1 replay (Li et al. 2011 offline replay: a logged round
    counts only when the policy's choice matches the logged arm).  Returns
    per-arm [n_matched, sum_reward].  Deterministic: unexplored arms are
    taken in arm-name order; UCB ties break to the lower arm index."""
    import math as _math

    n = {a: 0 for a in _UCB_ARMS}
    s = {a: 0 for a in _UCB_ARMS}
    t = 0
    out = {a: [0, 0] for a in _UCB_ARMS}
    for et, r in zip(types, rewards):
        unexplored = [a for a in _UCB_ARMS if n[a] == 0]
        if unexplored:
            choice = unexplored[0]
        else:
            best, bestv = None, None
            for a in _UCB_ARMS:
                v = s[a] / n[a] + _math.sqrt(2.0 * _math.log(t) / n[a])
                if bestv is None or v > bestv:
                    best, bestv = a, v
            choice = best
        if choice == et:
            t += 1
            n[et] += 1
            s[et] += r
            out[et][0] += 1
            out[et][1] += r
    return out


def q_ucb1_replay(sf_dir: str) -> pd.DataFrame:
    """Offline bandit policy evaluation by UCB1 replay: every USER is an
    independent episode (arms = event types, reward = value ≥ $5), so the
    inherently-sequential decision loop parallelizes across users inside
    the bucketed exchange — per-arm matched-round partials are all that
    leave a bucket.  Oracle = independent scalar replay artifact."""
    from ...functions.relational import bucketed_group_reduce

    ensure_ucb1_parquet(sf_dir)
    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        agg = {a: [0, 0] for a in _UCB_ARMS}
        df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        for _, g in df.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"], kind="stable")
            rc = ((g["value"] * 100).round().astype("int64") >= _UCB_REWARD_C)
            ep = _ucb1_episode(g["event_type"].tolist(),
                               rc.astype(int).tolist())
            for a in _UCB_ARMS:
                agg[a][0] += ep[a][0]
                agg[a][1] += ep[a][1]
        return pd.DataFrame(
            {"arm": list(_UCB_ARMS),
             "n_matched": [agg[a][0] for a in _UCB_ARMS],
             "sum_reward": [agg[a][1] for a in _UCB_ARMS]})

    p = bucketed_group_reduce(ds, ["user_id"], per_user, num_buckets=32).to_pandas()
    g = p.groupby("arm", as_index=False).sum()
    g["avg_reward"] = [
        _rd(sr / nm, 6) if nm else 0.0
        for sr, nm in zip(g["sum_reward"], g["n_matched"])]
    out = g.sort_values("arm", ignore_index=True)
    return _i64(out, ["n_matched", "sum_reward"])


def ensure_ucb1_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``ucb1_replay``: the same documented replay rule
    derived by an independent scalar pass (dict-of-lists per user, explicit
    argmax loop) straight off the events parquet."""
    import math as _math
    import os as _os
    from collections import defaultdict

    def build() -> pa.Table:
        t = pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type", "value"])
        ts_us = t["ts"].cast(pa.int64()).to_pylist()
        by_user: dict[int, list] = defaultdict(list)
        for u, tsu, eid, et, v in zip(
                t["user_id"].to_pylist(), ts_us, t["event_id"].to_pylist(),
                t["event_type"].to_pylist(), t["value"].to_pylist()):
            by_user[u].append((tsu, eid, et, 1 if round(v * 100) >= _UCB_REWARD_C else 0))
        total = {a: [0, 0] for a in _UCB_ARMS}
        for u in by_user:
            evs = sorted(by_user[u])
            n = dict.fromkeys(_UCB_ARMS, 0)
            s = dict.fromkeys(_UCB_ARMS, 0)
            t_rounds = 0
            for _, _, et, r in evs:
                choice = None
                for a in _UCB_ARMS:
                    if n[a] == 0:
                        choice = a
                        break
                if choice is None:
                    bestv = None
                    for a in _UCB_ARMS:
                        v = s[a] / n[a] + _math.sqrt(2.0 * _math.log(t_rounds) / n[a])
                        if bestv is None or v > bestv:
                            choice, bestv = a, v
                if choice == et:
                    t_rounds += 1
                    n[et] += 1
                    s[et] += r
                    total[et][0] += 1
                    total[et][1] += r
        arms = sorted(_UCB_ARMS)
        rows = []
        for a in arms:
            nm, sr = total[a]
            rows.append((a, nm, sr, _rd(sr / nm, 6) if nm else 0.0))
        return pa.table(
            {"arm": pa.array([r[0] for r in rows]),
             "n_matched": pa.array([r[1] for r in rows], pa.int64()),
             "sum_reward": pa.array([r[2] for r in rows], pa.int64()),
             "avg_reward": pa.array([r[3] for r in rows], pa.float64())})

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "ucb1_ref.parquet"), build)


SQL_UCB1_REPLAY = """
SELECT arm, n_matched, sum_reward, avg_reward
FROM read_parquet('{AD}/ucb1_ref.parquet') ORDER BY arm
""".replace("{AD}", ORACLE_ARTIFACT_DIR)

_NDCG_QUERIES = {
    "q_join": ("join", "hash"),
    "q_scan": ("scan", "table"),
    "q_merge": ("merge", "batch"),
}
_NDCG_K = 10


def q_ndcg_bm25_eval(sf_dir: str) -> pd.DataFrame:
    """Retrieval-quality evaluation: nDCG@10 of the BM25 ranking against a
    term-frequency relevance truth (rel(doc) = total occurrences of the
    query terms — the exact quantity BM25 approximates through saturation
    and length normalization).  Rankings order by (rounded score, doc_id);
    DCG/IDCG are float sums over ≤10 items computed in ascending rank order
    on both sides.

    Distributed shape: every doc lives in exactly ONE batch, so per-doc
    length and query-term tfs are final inside the map — only docs that
    contain at least one query term plus a per-batch (n_docs, total_len)
    stats partial leave the workers; the corpus-wide (doc, term, tf)
    exchange the first version shipped is gone.  Per-query scoring is a
    vectorized left-fold over the ≤2 terms in sorted order (absent terms
    add an exact +0.0), bit-equal to the old per-row loop."""
    import math as _math

    from ...functions.search import TOKEN_SPLIT

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    qterms = sorted({t for ts in _NDCG_QUERIES.values() for t in ts})

    def tok_part(t: pa.Table, *, qt=qterms) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t["text"]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = words.flatten()
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), n_per)
        keep = pc.and_(pc.not_equal(flat, ""),
                       pc.is_in(flat, value_set=pa.array(qt)))
        empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
        lens = np.bincount(
            np.searchsorted(np.unique(doc), doc), weights=~empty).astype(np.int64)
        # per-doc rows for query terms only (final: a doc is in one batch)
        tb = pa.table({"doc_id": pa.array(doc), "term": flat}).filter(keep)
        g = tb.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        uniq = np.unique(doc)
        # length rows ONLY for docs that hit a query term; global N and
        # total length ride as one stats partial per batch
        hit = np.isin(uniq, g["doc_id"].to_numpy(zero_copy_only=False))
        out = pa.table({
            "doc_id": pa.concat_arrays([
                g["doc_id"].combine_chunks(),
                pa.array(uniq[hit], pa.int64()),
                pa.array([-1, -1], pa.int64())]),
            "term": pa.concat_arrays([
                g["term"].combine_chunks(),
                pa.array([""] * int(hit.sum()), pa.string()),
                pa.array(["__n__", "__len__"], pa.string())]),
            "tf": pa.concat_arrays([
                pc.cast(g["count_all"], pa.int64()).combine_chunks(),
                pa.array(lens[hit], pa.int64()),
                pa.array([len(uniq), int(lens.sum())], pa.int64())]),
        })
        return out

    raw = (
        docs.map_batches(tok_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    N = int(raw.loc[raw["term"] == "__n__", "tf"].sum())
    total_len = int(raw.loc[raw["term"] == "__len__", "tf"].sum())
    dl = raw[raw["term"] == ""].set_index("doc_id")["tf"]
    tf = raw[~raw["term"].isin(["", "__n__", "__len__"])]
    avg_len = float(total_len) / N
    rows = []
    for qname, terms in sorted(_NDCG_QUERIES.items()):
        sub = tf[tf["term"].isin(terms)]
        df_map = sub.groupby("term")["doc_id"].nunique()
        hit_docs = np.unique(sub["doc_id"].to_numpy())
        lens = dl.loc[hit_docs].to_numpy().astype(np.int64)
        denom_len = 1.2 * (1.0 - 0.75 + 0.75 * (lens / avg_len))
        s = np.zeros(len(hit_docs))
        r = np.zeros(len(hit_docs), np.int64)
        for term in sorted(terms):
            dfv = int(df_map.get(term, 0))
            if dfv == 0:
                continue
            idf = _math.log((N - dfv + 0.5) / (dfv + 0.5) + 1.0)
            trows = sub[sub["term"] == term]
            tfv = np.zeros(len(hit_docs), np.int64)
            tfv[np.searchsorted(hit_docs, trows["doc_id"].to_numpy())] = (
                trows["tf"].to_numpy())
            s = s + idf * (tfv / (tfv + denom_len))
            r = r + tfv
        scores = {int(d): _rd(float(sc), 6) for d, sc in zip(hit_docs, s)}
        rel = {int(d): int(rv) for d, rv in zip(hit_docs, r)}
        # integer positional µ-weights kill float-order hazards: DCG_u =
        # Σ rel_i · round(1e6/log2(i+1)) is an exact int on both sides
        wq = [int(round(1e6 / _math.log2(i + 1.0))) for i in range(1, _NDCG_K + 1)]
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:_NDCG_K]
        dcg_u = sum(rel[doc] * w for doc, w in zip(ranked, wq))
        ideal = sorted(rel.values(), reverse=True)[:_NDCG_K]
        idcg_u = sum(r_ * w for r_, w in zip(ideal, wq))
        rows.append((qname, len(scores), dcg_u, idcg_u,
                     _rd(dcg_u / idcg_u, 6)))
    out = pd.DataFrame(rows, columns=["query", "n_hits", "dcg_u", "idcg_u", "ndcg"])
    return _i64(out, ["n_hits", "dcg_u", "idcg_u"])


def _ndcg_sql() -> str:
    qrows = " UNION ALL ".join(
        f"SELECT '{q}' AS query, '{t}' AS term"
        for q, terms in sorted(_NDCG_QUERIES.items()) for t in terms
    )
    return f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
toks2 AS (SELECT * FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks2 GROUP BY 1),
stats AS (SELECT COUNT(*) AS n, CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avglen
          FROM dl),
qt AS ({qrows}),
tf AS (
  SELECT t.doc_id, t.term, COUNT(*) AS tf FROM toks2 t
  WHERE t.term IN (SELECT term FROM qt) GROUP BY 1, 2),
dfm AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT q.query, tf.doc_id,
         ROUND(SUM(ln((s.n - dfm.df + 0.5) / (dfm.df + 0.5) + 1.0)
             * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75
                 * (dl.len / s.avglen))))), 6) AS score,
         CAST(SUM(tf.tf) AS BIGINT) AS rel
  FROM qt q JOIN tf ON tf.term = q.term
  JOIN dfm ON dfm.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY 1, 2),
wq AS (
  SELECT i AS rn, CAST(ROUND(1000000 / log2(i + 1.0)) AS BIGINT) AS w
  FROM generate_series(1, {_NDCG_K}) g(i)),
rk AS (
  SELECT query, doc_id, score, rel,
         ROW_NUMBER() OVER (PARTITION BY query ORDER BY score DESC, doc_id)
           AS rn
  FROM sc),
ik AS (
  SELECT query, rel,
         ROW_NUMBER() OVER (PARTITION BY query ORDER BY rel DESC, doc_id)
           AS rn
  FROM sc),
dcg AS (
  SELECT rk.query, CAST(SUM(rk.rel * wq.w) AS BIGINT) AS dcg_u
  FROM rk JOIN wq ON wq.rn = rk.rn GROUP BY rk.query),
idcg AS (
  SELECT ik.query, CAST(SUM(ik.rel * wq.w) AS BIGINT) AS idcg_u
  FROM ik JOIN wq ON wq.rn = ik.rn GROUP BY ik.query),
hits AS (SELECT query, COUNT(*) AS n_hits FROM sc GROUP BY query)
SELECT h.query, h.n_hits, d.dcg_u, i.idcg_u,
       ROUND(d.dcg_u / CAST(i.idcg_u AS DOUBLE), 6) AS ndcg
FROM hits h JOIN dcg d USING (query) JOIN idcg i USING (query)
ORDER BY h.query
"""


SQL_NDCG_BM25_EVAL = _ndcg_sql()


