"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, md5_hex, np, pa, pc, pd, topk  # noqa: F401
from .cusum_twap import _copurchase_weighted_edges  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 15: sequential-pattern mining, Neyman stratified allocation,
# positional phrase search, anti-entropy partition digests, label propagation
# ---------------------------------------------------------------------------


def q_sequence_mining_triples(sf_dir: str) -> pd.DataFrame:
    """PrefixSpan-style sequential-pattern support (Pei et al. 2001,
    support counting specialized to length-3 patterns): for each ordered
    event-type triple (t1,t2,t3), how many users' event streams contain the
    subsequence t1..t2..t3 at strictly increasing positions (gaps allowed).
    Users are hash-bucketed ONCE; inside a bucket the exists-check uses the
    min/max-position trick — (t1,t2,t3) occurs iff some position of t2 lies
    strictly between min(pos[t1]) and max(pos[t3]) — so per-user work is two
    small merges over (user,type) extents, never an O(n^3) expansion, and
    only bounded (t1,t2,t3,support) partials leave the bucket exchange."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        df["rn"] = df.groupby("user_id", sort=False).cumcount() + 1
        mm = df.groupby(["user_id", "event_type"], as_index=False).agg(
            mn=("rn", "min"), mx=("rn", "max")
        )
        a = mm.rename(columns={"event_type": "t1"})[["user_id", "t1", "mn"]]
        b = df.rename(columns={"event_type": "t2"})[["user_id", "t2", "rn"]]
        c = mm.rename(columns={"event_type": "t3"})[["user_id", "t3", "mx"]]
        ab = a.merge(b, on="user_id")
        ab = ab[ab["rn"] > ab["mn"]]
        abc = ab.merge(c, on="user_id")
        abc = abc[abc["mx"] > abc["rn"]]
        trip = abc[["user_id", "t1", "t2", "t3"]].drop_duplicates()
        out = trip.groupby(["t1", "t2", "t3"], as_index=False).size()
        return out.rename(columns={"size": "support"})

    counts = grouped_sums(
        bucketed_group_reduce(ds, ["user_id"], per_bucket),
        ["t1", "t2", "t3"],
        {"support": "support"},
    )
    out = topk(
        counts, ["support", "t1", "t2", "t3"], [True, False, False, False], 15
    ).to_pandas()
    return _i64(out, ["support"]).reset_index(drop=True)


SQL_SEQUENCE_MINING_TRIPLES = """
WITH e AS (
  SELECT user_id, event_type AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
mm AS (SELECT user_id, t, MIN(rn) AS mn, MAX(rn) AS mx FROM e GROUP BY 1, 2),
trip AS (
  SELECT DISTINCT b.user_id, a.t AS t1, b.t AS t2, c.t AS t3
  FROM mm a
  JOIN e b ON b.user_id = a.user_id AND b.rn > a.mn
  JOIN mm c ON c.user_id = b.user_id AND c.mx > b.rn)
SELECT t1, t2, t3, COUNT(*) AS support FROM trip
GROUP BY 1, 2, 3 ORDER BY support DESC, t1, t2, t3 LIMIT 15
"""


_NEYMAN_TOTAL = 100


def q_neyman_sample(sf_dir: str) -> pd.DataFrame:
    """Neyman-style stratified sampling with EXACT integer allocation: each
    source stratum gets slots proportional to N_h * scale_h where scale_h
    is a robust integer dispersion (P90-P10+1 of n_chars via exact lower
    order statistics), apportioned by Hamilton largest remainder (ties to
    the lexicographically smaller source); the sample itself is the
    per-stratum md5(doc_id) hash-order prefix — reservoir-equivalent and
    rerun/partitioning-stable.  Stage 1 moves only (source, n_chars) count
    partials (bounded domain); stage 2 is a per-group top-k prune whose
    candidate set never exceeds slots x blocks; the apportionment runs
    driver-side over |sources| rows in arbitrary-precision ints."""
    from ...functions.relational import grouped_topk

    hist = (
        grouped_sums(
            _t(sf_dir, "documents", ["source", "n_chars"]),
            ["source", "n_chars"],
            {},
            "c",
        )
        .to_pandas()
        .sort_values(["source", "n_chars"], ignore_index=True)
    )

    strata: list[tuple[str, int, int, int, int]] = []
    for src, g in hist.groupby("source", sort=True):
        cnt = g["c"].to_numpy(np.int64)
        vals = g["n_chars"].to_numpy(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        q10 = int(vals[np.searchsorted(cum, (n - 1) // 10 + 1)])
        q90 = int(vals[np.searchsorted(cum, 9 * (n - 1) // 10 + 1)])
        strata.append((str(src), n, q10, q90, n * (q90 - q10 + 1)))
    xs = sum(s[4] for s in strata)
    alloc = {s[0]: s[4] * _NEYMAN_TOTAL // xs for s in strata}
    frac = {s[0]: s[4] * _NEYMAN_TOTAL % xs for s in strata}
    rem = _NEYMAN_TOTAL - sum(alloc.values())
    for src, _ in sorted(frac.items(), key=lambda kv: (-kv[1], kv[0]))[:rem]:
        alloc[src] += 1

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def add_h(t: pa.Table) -> pa.Table:
        return t.append_column("h", md5_hex(pc.cast(t["doc_id"], pa.string())))

    keyed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    kmax = max(1, max(alloc.values()))
    cand = (
        grouped_topk(keyed, ["source"], ["h", "doc_id"], [False, False], kmax)
        .to_pandas()
        .sort_values(["source", "h", "doc_id"], ignore_index=True)
    )
    cand["rk"] = cand.groupby("source", sort=False).cumcount()
    cand["cap"] = cand["source"].map(alloc).astype(np.int64)
    sel = cand[cand["rk"] < cand["cap"]]
    samp = sel.groupby("source", as_index=False).agg(
        sampled=("doc_id", "count"), sample_id_sum=("doc_id", "sum")
    )
    out = pd.DataFrame(
        {
            "source": [s[0] for s in strata],
            "n_docs": [s[1] for s in strata],
            "q10": [s[2] for s in strata],
            "q90": [s[3] for s in strata],
            "alloc": [alloc[s[0]] for s in strata],
        }
    )
    out = out.merge(samp, on="source", how="left")
    out[["sampled", "sample_id_sum"]] = out[["sampled", "sample_id_sum"]].fillna(0)
    return _i64(out, ["n_docs", "q10", "q90", "alloc", "sampled", "sample_id_sum"])


SQL_NEYMAN_SAMPLE = f"""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents),
qs AS (
  SELECT source, MAX(n) AS n_docs,
         MAX(CASE WHEN r = (n - 1) // 10 THEN n_chars END) AS q10,
         MAX(CASE WHEN r = (9 * (n - 1)) // 10 THEN n_chars END) AS q90
  FROM ranked GROUP BY source),
m AS (SELECT source, n_docs, q10, q90,
             CAST(n_docs AS HUGEINT) * (q90 - q10 + 1) AS mass FROM qs),
tot AS (SELECT SUM(mass) AS xs FROM m),
h AS (SELECT source, n_docs, q10, q90,
             mass * {_NEYMAN_TOTAL} // (SELECT xs FROM tot) AS base,
             mass * {_NEYMAN_TOTAL} % (SELECT xs FROM tot) AS frac
      FROM m),
rr AS (SELECT {_NEYMAN_TOTAL} - SUM(base) AS rem FROM h),
al AS (SELECT source, n_docs, q10, q90,
              base + CASE WHEN ROW_NUMBER() OVER (ORDER BY frac DESC, source)
                               <= (SELECT rem FROM rr) THEN 1 ELSE 0 END AS alloc
       FROM h),
sel AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents),
samp AS (
  SELECT s.source, COUNT(*) AS sampled, SUM(s.doc_id) AS sample_id_sum
  FROM sel s JOIN al ON al.source = s.source AND s.rk <= al.alloc
  GROUP BY 1)
SELECT al.source, al.n_docs, al.q10, al.q90, CAST(al.alloc AS BIGINT) AS alloc,
       COALESCE(samp.sampled, 0) AS sampled,
       CAST(COALESCE(samp.sample_id_sum, 0) AS BIGINT) AS sample_id_sum
FROM al LEFT JOIN samp ON samp.source = al.source
ORDER BY al.source
"""


def _doc_word_pairs(t: pa.Table):
    """Flat word array + per-doc offsets + the internal-pair mask: pair i is
    (words[i], words[i+1]) and is valid iff it does not cross a document
    boundary.  Whitespace-split convention shared with the gram family."""
    lst = pc.split_pattern(t["text"], " ").combine_chunks()
    vals = lst.values
    off = np.asarray(lst.offsets, dtype=np.int64)
    L = len(vals)
    internal = np.ones(max(0, L - 1), dtype=bool)
    if L >= 2 and len(off) > 2:
        internal[off[1:-1] - 1] = False
    return vals, off, internal


def q_phrase_search(sf_dir: str) -> pd.DataFrame:
    """Positional phrase search, two-pass and self-contained: pass 1 finds
    the corpus's most frequent word bigram (combiner partials, one bounded
    exchange, deterministic tie-break); pass 2 broadcasts that phrase and
    counts EXACT-adjacency occurrences per document — overlapping
    occurrences included, which substring counting would miss — via two
    shifted vectorized equality scans over the shared flat word buffer and
    one np.add.reduceat per batch.  Top-10 matching docs."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def bigram_partial(t: pa.Table) -> pd.DataFrame:
        vals, off, internal = _doc_word_pairs(t)
        L = len(vals)
        if L < 2 or not internal.any():
            return pd.DataFrame(
                {"w1": pd.Series([], dtype=object), "w2": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype="int64")}
            )
        w1 = vals.slice(0, L - 1).to_numpy(zero_copy_only=False)
        w2 = vals.slice(1, L - 1).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"w1": w1[internal], "w2": w2[internal]})
        g = df.groupby(["w1", "w2"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    bg = grouped_sums(
        ds.map_batches(bigram_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w1", "w2"],
        {"c": "c"},
    )
    top = topk(bg, ["c", "w1", "w2"], [True, False, False], 1).to_pandas()
    p1, p2 = str(top["w1"][0]), str(top["w2"][0])

    def occ_per_doc(t: pa.Table, *, _p1=p1, _p2=p2) -> pd.DataFrame:
        vals, off, internal = _doc_word_pairs(t)
        L = len(vals)
        n = len(off) - 1
        hit = np.zeros(L + 1, dtype=np.int64)
        if L >= 2:
            m1 = pc.equal(vals.slice(0, L - 1), _p1).to_numpy(zero_copy_only=False)
            m2 = pc.equal(vals.slice(1, L - 1), _p2).to_numpy(zero_copy_only=False)
            hit[: L - 1] = (m1 & m2 & internal).astype(np.int64)
        cnt = (
            np.add.reduceat(hit, off[:-1])
            if n
            else np.array([], np.int64)
        )
        cnt[off[:-1] == off[1:]] = 0
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pd.DataFrame({"doc_id": ids, "n_occ": cnt})
        return out[out["n_occ"] > 0]

    occ = ds.map_batches(occ_per_doc, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(occ, ["n_occ", "doc_id"], [True, False], 10).to_pandas()
    out["w1"] = p1
    out["w2"] = p2
    return _i64(out, ["doc_id", "n_occ"]).reset_index(drop=True)


SQL_PHRASE_SEARCH = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pairs AS (
  SELECT doc_id, ws[g.i] AS w1, ws[g.i + 1] AS w2
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS g(i)),
bg AS (SELECT w1, w2, COUNT(*) AS c FROM pairs GROUP BY 1, 2),
top AS (SELECT w1, w2 FROM bg ORDER BY c DESC, w1, w2 LIMIT 1),
occ AS (
  SELECT p.doc_id, COUNT(*) AS n_occ
  FROM pairs p JOIN top t ON p.w1 = t.w1 AND p.w2 = t.w2
  GROUP BY 1)
SELECT o.doc_id, o.n_occ, t.w1, t.w2
FROM occ o CROSS JOIN top t
ORDER BY o.n_occ DESC, o.doc_id LIMIT 10
"""


_DIGEST_MOD = 1 << 40  # 10 md5-hex chars; headroom: ~8M partials before int64 overflow


def q_partition_digest(sf_dir: str) -> pd.DataFrame:
    """Anti-entropy partition digests (the Merkle/Cassandra reconciliation
    primitive reduced to its mergeable core): every row canonicalizes to
    user_id|event_id|epoch_us|type|cents, hashes with md5, and each of 16
    user-hash shards keeps (row count, sum of 40-bit md5 prefixes mod 2^40)
    — an order-independent, MERGEABLE digest, so two replicas (or two
    engines) compare tables by exchanging 16 tiny rows instead of data.
    Per-batch combiners fold locally (uint64 wraparound is exact mod 2^40
    because 2^40 | 2^64); only 16-row partials reach the exchange."""
    ds = _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type", "value"])

    def part(t: pa.Table) -> pd.DataFrame:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        micros = pc.cast(t["ts"], pa.int64())
        cents = _rd(t["value"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(
            np.int64
        )
        strs = pc.binary_join_element_wise(
            pc.cast(t["user_id"], pa.string()),
            pc.cast(t["event_id"], pa.string()),
            pc.cast(micros, pa.string()),
            t["event_type"],
            pc.cast(pa.array(cents), pa.string()),
            "|",
        )
        h = np.array(
            [int(x[:10], 16) for x in md5_hex(strs).to_pylist()], dtype=np.uint64
        )
        shard = (uid % 16).astype(np.int64)
        sums = np.zeros(16, np.uint64)
        np.add.at(sums, shard, h)
        cnts = np.bincount(shard, minlength=16)
        keep = cnts > 0
        return pd.DataFrame(
            {
                "shard": np.arange(16, dtype=np.int64)[keep],
                "n": cnts[keep].astype(np.int64),
                "digest": (sums[keep] % np.uint64(_DIGEST_MOD)).astype(np.int64),
            }
        )

    parts = grouped_sums(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        ["shard"],
        {"n": "n", "digest": "digest"},
    ).to_pandas()
    parts["digest"] = parts["digest"] % _DIGEST_MOD
    out = parts.sort_values("shard", ignore_index=True)
    return _i64(out, ["shard", "n", "digest"])


SQL_PARTITION_DIGEST = f"""
WITH hexd(ch, v) AS (VALUES ('0',0),('1',1),('2',2),('3',3),('4',4),('5',5),
                            ('6',6),('7',7),('8',8),('9',9),('a',10),('b',11),
                            ('c',12),('d',13),('e',14),('f',15)),
rows AS (
  SELECT CAST(user_id % 16 AS BIGINT) AS shard, event_id,
         md5(CONCAT(CAST(user_id AS VARCHAR), '|', CAST(event_id AS VARCHAR), '|',
                    CAST(epoch_us(ts) AS VARCHAR), '|', event_type, '|',
                    CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS VARCHAR))) AS hx
  FROM events),
hv AS (
  SELECT shard, event_id,
         SUM(hexd.v * (CAST(1 AS BIGINT) << (4 * (10 - g.i)))) AS h
  FROM rows, generate_series(1, 10) AS g(i)
  JOIN hexd ON hexd.ch = substr(hx, g.i, 1)
  GROUP BY shard, event_id)
SELECT shard, COUNT(*) AS n, CAST(SUM(h) % {_DIGEST_MOD} AS BIGINT) AS digest
FROM hv GROUP BY shard ORDER BY shard
"""


def q_label_propagation(sf_dir: str) -> pd.DataFrame:
    """Community/component seeding by 4 rounds of synchronous min-label
    propagation over the co-purchase graph (functions/graph.py::
    label_propagation_min — broadcast label map, per-batch min combiners);
    after k rounds each part's label is the smallest part id within k hops.
    Reports the 15 largest label groups."""
    from ...functions.graph import label_propagation_min

    edges = _copurchase_weighted_edges(sf_dir).map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    _, per_round = label_propagation_min(edges, rounds=4, trace=True)
    rows = []
    for r, lab in enumerate(per_round, start=1):
        _, csize = np.unique(lab, return_counts=True)
        rows.append(
            (r, len(csize), int(lab.sum()), int(csize.max()))
        )
    out = pd.DataFrame(rows, columns=["round", "n_labels", "lbl_sum", "max_csize"])
    return _i64(out, ["round", "n_labels", "lbl_sum", "max_csize"])


SQL_LABEL_PROPAGATION = """
WITH pairs AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON b.l_orderkey = a.l_orderkey AND a.l_partkey <> b.l_partkey),
n0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM pairs),
r1 AS MATERIALIZED (SELECT e.src AS node, LEAST(MIN(n.lbl), MIN(m.lbl)) AS lbl
       FROM pairs e JOIN n0 n ON n.node = e.src JOIN n0 m ON m.node = e.dst
       GROUP BY e.src),
r2 AS MATERIALIZED (SELECT e.src AS node, LEAST(MIN(n.lbl), MIN(m.lbl)) AS lbl
       FROM pairs e JOIN r1 n ON n.node = e.src JOIN r1 m ON m.node = e.dst
       GROUP BY e.src),
r3 AS MATERIALIZED (SELECT e.src AS node, LEAST(MIN(n.lbl), MIN(m.lbl)) AS lbl
       FROM pairs e JOIN r2 n ON n.node = e.src JOIN r2 m ON m.node = e.dst
       GROUP BY e.src),
r4 AS MATERIALIZED (SELECT e.src AS node, LEAST(MIN(n.lbl), MIN(m.lbl)) AS lbl
       FROM pairs e JOIN r3 n ON n.node = e.src JOIN r3 m ON m.node = e.dst
       GROUP BY e.src),
stats AS (
  SELECT 1 AS round, lbl FROM r1 UNION ALL
  SELECT 2, lbl FROM r2 UNION ALL
  SELECT 3, lbl FROM r3 UNION ALL
  SELECT 4, lbl FROM r4),
grp AS (SELECT round, lbl, COUNT(*) AS csize FROM stats GROUP BY 1, 2)
SELECT round, COUNT(*) AS n_labels, CAST(SUM(lbl * csize) AS BIGINT) AS lbl_sum,
       MAX(csize) AS max_csize
FROM grp GROUP BY round ORDER BY round
"""


