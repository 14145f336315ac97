"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    _corpus_dir,
    _i64,
    _rd,
    _t,
    grouped_sums,
    md5_hex,
    np,
    pa,
    pc,
    pd,
    pq,
    rd,
)  # noqa: F401
from .neardup_a import _ensure_artifact, ensure_derived_parquet  # noqa: F401
from .neardup_b import SEARCH_TERMS  # noqa: F401

# ---------------------------------------------------------------------------
# Scrub / normalize / sampling curation operators
# ---------------------------------------------------------------------------

def ensure_messy_parquet(sf_dir: str) -> str:
    """Materialize the planted-PII messy corpus (sources/messy.py) in the
    shared oracle-artifact dir; both oracle sides read the same file."""
    import os as _os

    from ...sources.messy import build_messy_table

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "messy.parquet"),
        lambda: build_messy_table(
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])
        ),
    )


def q_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII redaction scan over the messy corpus: one vectorized RE2 pass per
    PII class + the rewrite chain inside ``map_batches``; only per-source
    counter partials (≤ |sources| rows per block) reach the reduce.  At
    scale the scrubbed text column streams straight into a partitioned
    writer — it never leaves the map stage here either."""
    from ...functions.scrub import pii_partials

    ds = rd.read_parquet(ensure_messy_parquet(sf_dir), columns=["source", "text"],
                         override_num_blocks=8)
    partials = ds.map_batches(pii_partials, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(
        partials,
        ["source"],
        {c: c for c in ("n_email", "n_ip", "n_phone", "docs_with_pii", "scrubbed_chars", "n_docs")},
        reduce="driver",
    ).to_pandas()
    return _i64(out, ["n_email", "n_ip", "n_phone", "docs_with_pii", "scrubbed_chars", "n_docs"])


SQL_PII_SCRUB = f"""
WITH scanned AS (
  SELECT source,
         len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}')) AS e,
         len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS i,
         len(regexp_extract_all(text, '\\b555-\\d{{4}}\\b')) AS p,
         length(regexp_replace(regexp_replace(regexp_replace(text,
             '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{{2,}}', '<EMAIL>', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
             '\\b555-\\d{{4}}\\b', '<PHONE>', 'g')) AS sc
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/messy.parquet'))
SELECT source, CAST(SUM(e) AS BIGINT) AS n_email, CAST(SUM(i) AS BIGINT) AS n_ip,
       CAST(SUM(p) AS BIGINT) AS n_phone,
       CAST(SUM(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       CAST(SUM(sc) AS BIGINT) AS scrubbed_chars, COUNT(*) AS n_docs
FROM scanned GROUP BY source
"""


def q_text_normalize(sf_dir: str) -> pd.DataFrame:
    """Text canonicalization effect summary (lowercase + whitespace collapse
    + trim) — same single-pass partials shape as the scrub."""
    from ...functions.scrub import normalize_partials

    ds = rd.read_parquet(ensure_messy_parquet(sf_dir), columns=["source", "text"],
                         override_num_blocks=8)
    partials = ds.map_batches(normalize_partials, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(
        partials,
        ["source"],
        {c: c for c in ("n_changed", "raw_chars", "norm_chars", "n_docs")},
        reduce="driver",
    ).to_pandas()
    return _i64(out, ["n_changed", "raw_chars", "norm_chars", "n_docs"])


SQL_TEXT_NORMALIZE = f"""
WITH n AS (
  SELECT source, text,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/messy.parquet'))
SELECT source,
       CAST(SUM(CASE WHEN norm <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(length(text)) AS BIGINT) AS raw_chars,
       CAST(SUM(length(norm)) AS BIGINT) AS norm_chars,
       COUNT(*) AS n_docs
FROM n GROUP BY source
"""


def q_zscore_outliers(sf_dir: str) -> pd.DataFrame:
    """Per-type z-score outlier counts, two streaming passes: (1) moment
    partials (n, Σv, Σv²) per batch → tiny bounded-key reduce → mean/std on
    the driver; (2) broadcast the |types|-row stats and count |z| > 2.5 per
    batch.  No raw-row shuffle in either pass.  The oracle mirrors the SAME
    naive-moment formula (not Welford ``stddev_pop``) so both sides make
    identical float rounding."""
    ds = _t(sf_dir, "events", ["event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        flat = pa.table(
            {
                "event_type": t["event_type"],
                "v": t["value"],
                "v2": pc.multiply(t["value"], t["value"]),
            }
        )
        return flat.group_by(["event_type"]).aggregate(
            [("v", "sum"), ("v2", "sum"), ("event_type", "count")]
        ).rename_columns(["event_type", "s", "ss", "n"])

    stats = (
        grouped_sums(
            ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
            ["event_type"], {"s": "s", "ss": "ss", "n": "n"}, reduce="driver",
        ).to_pandas()
    )
    stats["mean"] = stats["s"] / stats["n"]
    stats["std"] = np.sqrt(stats["ss"] / stats["n"] - stats["mean"] ** 2)
    lookup = {r.event_type: (r.mean, r.std) for r in stats.itertuples()}

    def count_outliers(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(), "v": t["value"].to_pandas()})
        m = df["event_type"].map({k: v[0] for k, v in lookup.items()})
        s = df["event_type"].map({k: v[1] for k, v in lookup.items()})
        df["out"] = (np.abs(df["v"] - m) > 2.5 * s).astype("int64")
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False)["out"].sum().rename(
                columns={"out": "n_outliers"}
            ),
            preserve_index=False,
        )

    out = grouped_sums(
        ds.map_batches(count_outliers, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type"], {"n_outliers": "n_outliers"}, reduce="driver",
    ).to_pandas()
    out = out.merge(stats[["event_type", "mean", "std"]], on="event_type")
    out["mean"] = out["mean"].pipe(_rd)
    out["std"] = out["std"].pipe(_rd)
    return _i64(out, ["n_outliers"])


SQL_ZSCORE_OUTLIERS = """
WITH st AS (
  SELECT event_type, COUNT(*) AS n, SUM(value) AS s, SUM(value * value) AS ss
  FROM events GROUP BY event_type),
m AS (SELECT event_type, s / n AS mean, sqrt(ss / n - (s / n) * (s / n)) AS std FROM st)
SELECT e.event_type,
       CAST(SUM(CASE WHEN ABS(e.value - m.mean) > 2.5 * m.std THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       ROUND(ANY_VALUE(m.mean), 6) AS mean, ROUND(ANY_VALUE(m.std), 6) AS std
FROM events e JOIN m USING (event_type)
GROUP BY e.event_type
"""


def q_stratified_sample_k(sf_dir: str) -> pd.DataFrame:
    """Exact-k-per-group reservoir-equivalent sample: 10 docs per source in
    md5(doc_id) hash order — deterministic across reruns and partitionings,
    and distributed as a per-group top-k (per-block prune to k, candidates
    ≤ k·|groups|·blocks — never the corpus)."""
    from ...functions.relational import grouped_topk

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def add_h(t: pa.Table) -> pa.Table:
        return t.append_column("h", md5_hex(pc.cast(t["doc_id"], pa.string())))

    keyed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topk(keyed, ["source"], ["h", "doc_id"], [False, False], 10).to_pandas()
    return _i64(out, ["doc_id"]).sort_values(["source", "h"]).reset_index(drop=True)


SQL_STRATIFIED_SAMPLE_K = """
SELECT doc_id, source, h FROM (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
         row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents)
WHERE rn <= 10
"""


TOKEN_BUDGET = 20_000


def q_token_budget_sample(sf_dir: str) -> pd.DataFrame:
    """Token-budget sampling: per source, take sequences in md5(sid) hash
    order until the cumulative token count reaches the budget — the standard
    way to cut a fixed-token-mixture from an oversized corpus.  Runs as a
    bucketed exchange on ``source`` moving only (sid, n_tok, hash) triples
    (never text/tokens), with the per-group sort+cumsum vectorized inside
    ``map_groups``."""
    from ...functions.relational import bucketed_group_reduce

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "n_tok", "source"],
        override_num_blocks=8,
    )

    def add_h(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t["source"],
                "doc_id": t["doc_id"],
                "n_tok": pc.cast(t["n_tok"], pa.int64()),
                "h": md5_hex(t["doc_id"]),
            }
        )

    keyed = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)

    def budget_cut(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "h", "doc_id"], kind="stable")
        cum = df.groupby("source", sort=False)["n_tok"].cumsum()
        kept = df[cum <= TOKEN_BUDGET]
        return kept.groupby("source", as_index=False).agg(
            n_docs=("doc_id", "count"), tokens=("n_tok", "sum")
        )

    out = bucketed_group_reduce(keyed, ["source"], budget_cut, num_buckets=16).to_pandas()
    return _i64(out, ["n_docs", "tokens"]).sort_values("source").reset_index(drop=True)


SQL_TOKEN_BUDGET_SAMPLE = f"""
WITH ranked AS (
  SELECT source, doc_id, n_tok, md5(doc_id) AS h
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
c AS (
  SELECT source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM ranked)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens
FROM c WHERE cum <= {TOKEN_BUDGET} GROUP BY source ORDER BY source
"""


def q_bm25_search(sf_dir: str) -> pd.DataFrame:
    """Disjunctive BM25 ranked retrieval (k1=1.2, b=0.75, Lucene idf) over
    the corpus for the standing query terms: candidate postings + corpus
    N/avgdl stats from ONE tokenize scan, tiny driver idf fold, vectorized
    score pass → distributed per-doc sum → deterministic top-20
    (``functions/search.py::bm25_search``)."""
    from ...functions.search import bm25_search

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return bm25_search(ds, SEARCH_TERMS, k=20)


SQL_BM25_SEARCH = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents
), toks2 AS (SELECT * FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks2 GROUP BY 1),
stats AS (SELECT COUNT(*) AS n, SUM(len) AS sumlen FROM dl),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2
       WHERE term IN ('join', 'hash', 'batch') GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id,
  ROUND(SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
      * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 *
          (dl.len / (CAST(stats.sumlen AS DOUBLE) / stats.n)))))), 6) AS score
FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20
"""


def q_mad_outliers(sf_dir: str) -> pd.DataFrame:
    """Robust per-group outlier counts via MEDIAN + MAD (median absolute
    deviation) — the heavy-tail-safe cousin of ``zscore_outliers`` — from a
    SINGLE streaming pass: the mergeable fixed-bin histogram per event_type
    (``sketch.py::grouped_histogram_fixedpoint``) yields the median; the
    deviation histogram is DERIVED from the value histogram by folding bins
    around it (|bin - med| re-bin, no second scan); MAD is its median; the
    tail count sums folded bins beyond 3·MAD.  All threshold compares happen
    in integer half/quarter-cent units — no float-boundary flakes."""
    from ...functions.sketch import grouped_histogram_fixedpoint, quantile_from_counts

    ds = _t(sf_dir, "events", ["event_type", "value"])
    hist = grouped_histogram_fixedpoint(ds, "event_type", "value", scale=100)
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        bins = g["bin"].to_numpy(dtype=np.int64)
        ns = g["n"].to_numpy(dtype=np.int64)
        med_c = quantile_from_counts(bins, ns, 0.5)  # cents, may be x.5
        med_hc = int(round(med_c * 2))  # half-cents, exact
        dev_hc = np.abs(2 * bins - med_hc)  # half-cents, exact ints
        fold = pd.DataFrame({"d": dev_hc, "n": ns}).groupby("d", as_index=False)["n"].sum()
        mad_hc = quantile_from_counts(fold["d"].to_numpy(), fold["n"].to_numpy(), 0.5)
        mad_qc = int(round(mad_hc * 2))  # quarter-cents, exact
        n_out = int(fold["n"][2 * fold["d"] > 3 * mad_qc].sum())
        rows.append((et, _rd(med_hc / 200.0, 6), _rd(mad_qc / 400.0, 6), n_out))
    return pd.DataFrame(rows, columns=["event_type", "median_value", "mad", "n_outliers"])


SQL_MAD_OUTLIERS = """
WITH m AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
d AS (SELECT e.event_type, m.med,
             CAST(ROUND(ABS(e.value - m.med) * 200, 0) AS BIGINT) AS dev_hc
      FROM events e JOIN m USING (event_type)),
s AS (SELECT event_type,
             CAST(ROUND(median(dev_hc) * 2, 0) AS BIGINT) AS mad_qc
      FROM d GROUP BY 1)
SELECT d.event_type,
       ROUND(ANY_VALUE(d.med), 6) AS median_value,
       ROUND(ANY_VALUE(s.mad_qc) / 400.0, 6) AS mad,
       CAST(SUM(CASE WHEN 2 * d.dev_hc > 3 * s.mad_qc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN s USING (event_type) GROUP BY 1 ORDER BY 1
"""


def q_cube_counts(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(source, lang): all four grouping sets re-summed from
    ONE finest-level distributed aggregate (|sources|×|langs| partial rows
    reach the driver; coarser levels are driver arithmetic, the same shape
    as ``revenue_rollup`` but the full lattice).  NULL grouping keys are
    materialized as 'ALL' on both sides for hash-stable compare."""
    ds = _t(sf_dir, "documents", ["source", "lang", "n_chars"])
    fine = grouped_sums(ds, ["source", "lang"], {"chars": "n_chars"}, "n").to_pandas()
    frames = []
    for keys in ([], ["source"], ["lang"], ["source", "lang"]):
        if keys:
            g = fine.groupby(keys, as_index=False)[["n", "chars"]].sum()
        else:
            g = pd.DataFrame({"n": [fine["n"].sum()], "chars": [fine["chars"].sum()]})
        for c in ("source", "lang"):
            if c not in g.columns:
                g[c] = "ALL"
        frames.append(g[["source", "lang", "n", "chars"]])
    out = pd.concat(frames, ignore_index=True).sort_values(
        ["source", "lang"], ignore_index=True
    )
    return _i64(out, ["n", "chars"])


SQL_CUBE_COUNTS = """
SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
       COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY CUBE (source, lang) ORDER BY 1, 2
"""


def q_purchase_view_sets(sf_dir: str) -> pd.DataFrame:
    """INTERSECT / EXCEPT over user sets (frequent purchasers ≥8 vs
    frequent viewers ≥12 — thresholds chosen so all set classes materialize
    at test scale) computed as ONE membership aggregation instead of two
    set-op shuffles: per-user indicator sums in a single bucketed exchange
    → classify → tiny label count.  The classic rewrite that turns N set
    operations over the same keyspace into one pass."""
    ds = _t(sf_dir, "events", ["user_id", "event_type"])

    def flags(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "is_p": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64()),
                "is_v": pc.cast(pc.equal(t["event_type"], "view"), pa.int64()),
            }
        )

    per_user = grouped_sums(
        ds.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {"sp": "is_p", "sv": "is_v"},
    )

    def classify(t: pa.Table) -> pa.Table:
        sp = pc.greater_equal(t["sp"], 8)
        sv = pc.greater_equal(t["sv"], 12)
        label = pc.if_else(
            pc.and_(sp, sv),
            "both",
            pc.if_else(sp, "purchase_only", pc.if_else(sv, "view_only", "neither")),
        )
        return pa.table({"set_op": label})

    labeled = per_user.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        grouped_sums(labeled, ["set_op"], {}, "n", reduce="driver")
        .to_pandas()
        .query("set_op != 'neither'")
        .sort_values("set_op", ignore_index=True)
    )
    return _i64(out, ["n"])


SQL_PURCHASE_VIEW_SETS = """
WITH u AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS sp,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS sv
  FROM events GROUP BY 1)
SELECT CASE WHEN sp >= 8 AND sv >= 12 THEN 'both'
            WHEN sp >= 8 THEN 'purchase_only'
            ELSE 'view_only' END AS set_op,
       COUNT(*) AS n
FROM u WHERE sp >= 8 OR sv >= 12 GROUP BY 1 ORDER BY 1
"""


def q_ewma_user_value(sf_dir: str) -> pd.DataFrame:
    """Per-user exponentially TIME-decayed value (τ = 1 day) evaluated at
    the user's last event — the streaming-state aggregate (EWMA register)
    done batch: the decayed sum is ASSOCIATIVE once each partial carries its
    own anchor ``(max_ts, Σ v·e^{(ts-max_ts)/τ})``, so per-batch combiners
    merge in any tree order by re-anchoring the smaller side.  The exchange
    moves only (user, anchor, sum) partials; top-25 by decayed value."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])
    tau_us = 86_400_000_000.0

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        val = t["value"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        dfm = pd.DataFrame({"u": uid, "ts": us, "v": val})
        mx = dfm.groupby("u")["ts"].transform("max")
        dfm["w"] = dfm["v"] * np.exp((dfm["ts"] - mx) / tau_us)
        g = dfm.groupby("u", as_index=False).agg(anchor=("ts", "max"), s=("w", "sum"))
        return pa.Table.from_pandas(
            g.rename(columns={"u": "user_id"}), preserve_index=False
        )

    from ...functions.relational import bucketed_group_reduce

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        mx = df.groupby("user_id")["anchor"].transform("max")
        w = df["s"] * np.exp((df["anchor"] - mx) / tau_us)
        g = (
            pd.DataFrame({"user_id": df["user_id"], "w": w})
            .groupby("user_id", as_index=False)["w"]
            .sum()
        )
        return g.rename(columns={"w": "decayed_value"})

    merged = bucketed_group_reduce(partials, ["user_id"], merge)
    out = merged.to_pandas()[["user_id", "decayed_value"]]
    out = out.sort_values(
        ["decayed_value", "user_id"], ascending=[False, True], ignore_index=True
    ).head(25)
    out["decayed_value"] = out["decayed_value"].pipe(_rd)
    return _i64(out, ["user_id"])


SQL_EWMA_USER_VALUE = """
WITH m AS (SELECT user_id, MAX(ts) AS mts FROM events GROUP BY 1)
SELECT e.user_id,
       ROUND(SUM(e.value * EXP((EPOCH_US(e.ts) - EPOCH_US(m.mts)) / 86400000000.0)), 6)
         AS decayed_value
FROM events e JOIN m USING (user_id)
GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 25
"""


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE merge training (6 rounds) over the derived tokens
    payload — the canonical iterative token-pipeline job: per-round pair
    counts via packed-int64 bigram combiners → distributed top-1 → vectorized
    merge rewrite → per-round materialize (the checkpoint you want at scale).
    Oracle: the INDEPENDENT driver-side incremental linked-list trainer
    (``bpe_train_flat``) materialized as a Parquet artifact — two different
    algorithms (per-round global recount vs lazy-heap incremental counts)
    must emit the bit-identical merge table."""
    from ...functions.bpe import bpe_train
    from ...schema import VOCAB_SIZE

    ensure_bpe_merges_parquet(sf_dir)
    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8
    )
    return bpe_train(ds, num_merges=6, vocab_base=VOCAB_SIZE)


def ensure_bpe_merges_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``bpe_merges``: the merge table computed by the
    driver-side incremental trainer (`functions/bpe.py::bpe_train_flat`) on
    the full derived corpus — an independent implementation of the same
    public algorithm (Sennrich et al. 2016) the distributed trainer runs."""
    import os as _os

    src = ensure_derived_parquet(sf_dir)

    def build() -> pa.Table:
        from ...functions.bpe import bpe_train_flat
        from ...functions.tokens import _flat_tokens
        from ...schema import VOCAB_SIZE

        t = pq.read_table(src, columns=["tokens"])
        v, o = _flat_tokens(t)
        b = o[0]
        m = bpe_train_flat(v[b : o[-1]], o - b, 6, VOCAB_SIZE)
        return pa.Table.from_pandas(m, preserve_index=False)

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "bpe_merges.parquet"), build)


SQL_BPE_MERGES = f"""
SELECT CAST(merge_idx AS BIGINT) AS merge_idx, CAST("left" AS BIGINT) AS "left",
       CAST("right" AS BIGINT) AS "right", CAST("count" AS BIGINT) AS "count",
       CAST(new_id AS BIGINT) AS new_id
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/bpe_merges.parquet') ORDER BY merge_idx
"""


def ensure_minhash_incremental_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``minhash_incremental``: the full expected match
    set re-derived by an INDEPENDENT per-doc reference implementation —
    scalar FNV word hashes, per-doc gram/signature construction (not the
    flat-stream ``np.minimum.reduceat`` kernel), dict-bucketed greedy band
    matching (not the distributed side-tagged co-group).  MinHash is
    seed-deterministic, so the two compositions must agree row-for-row."""
    import os as _os

    def build() -> pa.Table:
        from collections import defaultdict

        from ...functions.dedup import _PAD_WORD_HASH, MERSENNE_61, _hash_params
        from ...functions.hashing import fnv1a64_single
        from ...functions.rounding import round_like_duckdb

        H, bands, k, seed, thr = 64, 16, 3, 42, 0.6
        rpb = H // bands
        a, b = _hash_params(H, seed)
        mix = np.random.default_rng(seed + 1).integers(1, 1 << 62, size=k, dtype=np.uint64)
        M = np.uint64(MERSENNE_61)
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = [int(x) for x in t["doc_id"].to_pylist()]
        sigs: dict[int, np.ndarray] = {}
        bkeys: dict[int, list[int]] = {}
        for did, s in zip(ids, t["text"].to_pylist()):
            wh = np.array([fnv1a64_single(w) for w in (s or "").split(" ")], dtype=np.uint64)
            n = len(wh)
            with np.errstate(over="ignore"):
                if n >= k:
                    grams = np.zeros(n - k + 1, dtype=np.uint64)
                    for j in range(k):
                        grams += mix[j] * wh[j : j + len(grams)]
                else:
                    padded = np.concatenate([wh, np.full(k - n, _PAD_WORD_HASH, np.uint64)])
                    grams = np.array([np.sum(mix * padded, dtype=np.uint64)])
                sig = ((grams[:, None] * a + b) % M).min(axis=0)  # 2^64-wrap then mod, as spec'd
            sigs[did] = sig
            keys = []
            for band in range(bands):
                h = 0xCBF29CE484222325
                for j in range(rpb):
                    h = ((h ^ int(sig[band * rpb + j])) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
                keys.append(h)
            bkeys[did] = keys
        buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
        for d in ids:
            if d % 2 == 0:
                for band, h in enumerate(bkeys[d]):
                    buckets[(band, h)].append(d)
        rows = []
        for d in ids:
            if d % 2 == 0:
                continue
            cands: set[int] = set()
            for band, h in enumerate(bkeys[d]):
                cands.update(buckets.get((band, h), ()))
            best = None
            for c in sorted(cands):
                est = float(np.count_nonzero(sigs[d] == sigs[c])) / H
                if est >= thr and (best is None or est > best[1]):
                    best = (c, est)
            if best is not None:
                rows.append((d, best[0], best[1]))
        rows.sort()
        df = pd.DataFrame(rows, columns=["doc_id", "matched_prior", "est_jaccard"])
        df["doc_id"] = df["doc_id"].astype("int64")
        df["matched_prior"] = df["matched_prior"].astype("int64")
        df["est_jaccard"] = round_like_duckdb(
            df["est_jaccard"].to_numpy(dtype=np.float64), 6)
        return pa.Table.from_pandas(df, preserve_index=False)

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "minhash_incremental_ref.parquet"), build
    )


SQL_MINHASH_INCREMENTAL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(matched_prior AS BIGINT) AS matched_prior, est_jaccard
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/minhash_incremental_ref.parquet')
ORDER BY doc_id
"""


def q_minhash_incremental(sf_dir: str) -> pd.DataFrame:
    """Incremental near-dup: even-id docs build the LSH band state, odd-id
    docs arrive as the 'new crawl' and match against it without re-reading
    prior text.  Oracle: the independent per-doc reference derivation
    (``ensure_minhash_incremental_parquet``) — MinHash is seed-deterministic,
    so the distributed co-group and the scalar greedy reference must emit
    identical match sets."""
    from ...functions.dedup import minhash_dedup_against_state

    ensure_minhash_incremental_parquet(sf_dir)
    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def half(par: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64())
            return t.filter(pc.equal(pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
                                     pa.scalar(par, pa.int64())))

        return fn

    prior = docs.map_batches(half(0), batch_format="pyarrow", zero_copy_batch=True)
    new = docs.map_batches(half(1), batch_format="pyarrow", zero_copy_batch=True)
    _, state = minhash_dedup_against_state(prior, None)
    matches, _ = minhash_dedup_against_state(new, state, threshold=0.6)
    if len(matches) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "matched_prior": pd.Series(dtype="int64"),
                             "est_jaccard": pd.Series(dtype="float64")})
    out = matches.sort_values("doc_id", ignore_index=True)
    return _i64(out, ["doc_id", "matched_prior"])


def ensure_neardup_pairs_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``minhash_neardup`` / ``neardup_cluster_dedup``:
    the full expected near-dup pair set re-derived by an INDEPENDENT per-doc
    reference implementation — scalar FNV word hashes, per-doc gram and
    signature construction, dict-bucketed candidate enumeration, Python-set
    exact Jaccard — not the flat-stream ``np.minimum.reduceat`` kernel and
    bucketed co-group the distributed path uses.  MinHash is
    seed-deterministic, so both compositions must agree row-for-row, with
    est/jaccard bitwise equal (same IEEE divisions, same round_like_duckdb)."""
    import os as _os
    from itertools import combinations

    def build() -> pa.Table:
        from collections import defaultdict

        from ...functions.dedup import _PAD_WORD_HASH, MERSENNE_61, _hash_params
        from ...functions.hashing import fnv1a64_single
        from ...functions.rounding import round_like_duckdb

        H, bands, k, seed, thr = 64, 16, 3, 42, 0.5
        rpb = H // bands
        a, b = _hash_params(H, seed)
        mix = np.random.default_rng(seed + 1).integers(1, 1 << 62, size=k, dtype=np.uint64)
        M = np.uint64(MERSENNE_61)
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ids = [int(x) for x in t["doc_id"].to_pylist()]
        sigs: dict[int, np.ndarray] = {}
        shingle_sets: dict[int, set[int]] = {}
        buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
        for did, s in zip(ids, t["text"].to_pylist()):
            words = (s or "").split(" ")
            wh = np.array([fnv1a64_single(w) for w in words], dtype=np.uint64)
            n = len(wh)
            with np.errstate(over="ignore"):
                if n >= k:
                    grams = np.zeros(n - k + 1, dtype=np.uint64)
                    for j in range(k):
                        grams += mix[j] * wh[j : j + len(grams)]
                else:
                    padded = np.concatenate([wh, np.full(k - n, _PAD_WORD_HASH, np.uint64)])
                    grams = np.array([np.sum(mix * padded, dtype=np.uint64)])
                sig = ((grams[:, None] * a + b) % M).min(axis=0)
            sigs[did] = sig
            if n < k:
                sgrams = [" ".join(words)]
            else:
                sgrams = [" ".join(words[i : i + k]) for i in range(n - k + 1)]
            shingle_sets[did] = {int(fnv1a64_single(g)) for g in sgrams}
            for band in range(bands):
                h = 0xCBF29CE484222325
                for j in range(rpb):
                    h = ((h ^ int(sig[band * rpb + j])) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
                buckets[(band, h)].append(did)
        cand: set[tuple[int, int]] = set()
        for members in buckets.values():
            if len(members) > 1:
                cand.update(combinations(sorted(set(members)), 2))
        rows = []
        for da, db in sorted(cand):
            est = float(np.count_nonzero(sigs[da] == sigs[db])) / H
            if est < thr:
                continue
            sa, sb = shingle_sets[da], shingle_sets[db]
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 1.0
            rows.append((da, db, est, j))
        df = pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard", "jaccard"])
        for c in ("doc_a", "doc_b"):
            df[c] = df[c].astype("int64")
        for c in ("est_jaccard", "jaccard"):
            df[c] = round_like_duckdb(df[c].to_numpy(dtype=np.float64), 6)
        return pa.Table.from_pandas(df, preserve_index=False)

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "neardup_pairs_ref.parquet"), build
    )


SQL_MINHASH_NEARDUP = f"""
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       est_jaccard, jaccard
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/neardup_pairs_ref.parquet')
ORDER BY doc_a, doc_b
"""


SQL_NEARDUP_CLUSTER_DEDUP = f"""
WITH RECURSIVE pairs AS (
  SELECT CAST(doc_a AS BIGINT) AS a, CAST(doc_b AS BIGINT) AS b
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/neardup_pairs_ref.parquet')
), sym AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
), reach AS (
  SELECT a AS n, b AS r FROM sym
  UNION
  SELECT reach.n, sym.b AS r FROM reach JOIN sym ON reach.r = sym.a
)
SELECT n AS doc_id, LEAST(n, MIN(r)) AS cluster,
       CAST(n = LEAST(n, MIN(r)) AS BIGINT) AS kept
FROM reach GROUP BY n ORDER BY doc_id
"""


def q_neardup_cluster_dedup(sf_dir: str) -> pd.DataFrame:
    """End-to-end near-dup cluster dedup: MinHash LSH pairs → distributed
    connected components (large-star/small-star rounds, graph.py) →
    canonical keep = min doc_id per cluster.  The oracle's recursive-CTE
    min-label transitive closure over the independent reference pair
    artifact verifies BOTH stages: the distributed pair emission and the
    distributed CC must together reproduce a from-scratch closure."""
    from ...functions.dedup import minhash_lsh_pairs
    from ...functions.graph import connected_components

    ensure_neardup_pairs_parquet(sf_dir)
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=0.5, verify=False)
    if pairs.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "cluster": pd.Series(dtype="int64"),
                             "kept": pd.Series(dtype="int64")})
    edges = rd.from_pandas(pd.DataFrame({
        "u": pairs["doc_a"].astype("int64"),
        "v": pairs["doc_b"].astype("int64"),
    }))
    cc = connected_components(edges)
    out = cc.rename(columns={"node": "doc_id", "component": "cluster"})
    out["kept"] = (out["doc_id"] == out["cluster"]).astype("int64")
    return out.sort_values("doc_id", ignore_index=True)


def q_corpus_diff(sf_dir: str) -> pd.DataFrame:
    """Snapshot diff (data versioning): classify every doc across two
    corpus versions as unchanged / modified / removed / added.  v2 derives
    deterministically from v1 (drop id%13, edit id%7, re-add id%11 under
    new ids) so both sides construct it identically.  Distributed shape:
    each side collapses to (doc_id, content-fp) combiner rows — text never
    shuffles — then ONE bucketed exchange on doc_id classifies (the
    full-outer-join pattern without materializing the join)."""
    from ...functions.hashing import fnv1a64
    from ...functions.relational import bucketed_group_reduce

    docs = _t(sf_dir, "documents", ["doc_id", "text"])

    def v1_rows(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "fp": pa.array(fnv1a64(t["text"]), pa.uint64()),
                         "side": pa.nulls(len(t), pa.int8()).fill_null(0)})

    def v2_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        kept = t.filter(pc.not_equal(_mod(ids, 13), 0))
        kid = pc.cast(kept["doc_id"], pa.int64())
        edited = pc.if_else(
            pc.equal(_mod(kid, 7), 0),
            pc.binary_join_element_wise(kept["text"], " edited", ""),
            kept["text"],
        )
        part1 = pa.table({"doc_id": kid,
                          "fp": pa.array(fnv1a64(edited), pa.uint64()),
                          "side": pa.nulls(len(kept), pa.int8()).fill_null(1)})
        add = t.filter(pc.equal(_mod(ids, 11), 0))
        part2 = pa.table({"doc_id": pc.add(pc.cast(add["doc_id"], pa.int64()),
                                           pa.scalar(1_000_000, pa.int64())),
                          "fp": pa.array(fnv1a64(add["text"]), pa.uint64()),
                          "side": pa.nulls(len(add), pa.int8()).fill_null(1)})
        return pa.concat_tables([part1, part2])

    a = docs.map_batches(v1_rows, batch_format="pyarrow", zero_copy_batch=True)
    b = docs.map_batches(v2_rows, batch_format="pyarrow", zero_copy_batch=True)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id")
        sides = g["side"].agg(["min", "max"])
        nfp = g["fp"].nunique()
        status = pd.Series("unchanged", index=sides.index)
        status[(sides["min"] == 0) & (sides["max"] == 0)] = "removed"
        status[(sides["min"] == 1) & (sides["max"] == 1)] = "added"
        status[(sides["min"] == 0) & (sides["max"] == 1) & (nfp > 1)] = "modified"
        return status.value_counts().rename_axis("status").reset_index(name="n")

    per_bucket = bucketed_group_reduce(a.union(b), ["doc_id"], classify).to_pandas()
    out = per_bucket.groupby("status", as_index=False)["n"].sum().sort_values(
        "status", ignore_index=True)
    return _i64(out, ["n"])


def _mod(arr: pa.Array, m: int) -> pa.Array:
    """Integer modulo via subtract(x, multiply(floor_div(x, m), m)) —
    pyarrow.compute has no mod kernel."""
    import pyarrow.compute as _pc

    q = _pc.divide(arr, pa.scalar(m, pa.int64()))  # integer division floors for positives
    return _pc.subtract(arr, _pc.multiply(q, pa.scalar(m, pa.int64())))


SQL_CORPUS_DIFF = """
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 11 = 0
), j AS (
  SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.text = b.text THEN 'unchanged' ELSE 'modified' END AS status
  FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY status ORDER BY status
"""


def ensure_zlib_sizes_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``compression_quality``: per-doc zlib sizes from
    a straight driver-side loop.  SQL cannot deflate, but deflate is
    deterministic stdlib — what the oracle then CHECKS end-to-end is the
    distributed routing, per-source aggregation and the integer
    cross-multiply flag logic against DuckDB's GROUP BY."""
    import os as _os
    import zlib as _zlib

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        raw, comp = [], []
        for s in t["text"].to_pylist():
            b = (s or "").encode("utf-8")
            raw.append(len(b))
            comp.append(len(_zlib.compress(b, 6)))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "raw_bytes": pa.array(raw, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64()),
        })

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "zlib_sizes.parquet"), build)


SQL_COMPRESSION_QUALITY = f"""
WITH z AS (SELECT * FROM read_parquet('{ORACLE_ARTIFACT_DIR}/zlib_sizes.parquet'))
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(z.raw_bytes) AS BIGINT) AS raw_bytes,
       CAST(SUM(z.compressed_bytes) AS BIGINT) AS compressed_bytes,
       CAST(SUM(CASE WHEN z.compressed_bytes * 100 < z.raw_bytes * 45
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
FROM documents d JOIN z USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


def q_compression_quality(sf_dir: str) -> pd.DataFrame:
    """Entropy quality proxy (Gopher/C4-family cleaning stack): per-source
    zlib compression totals and docs flagged as boilerplate-repetitive
    (compressed*100 < raw*45 — integer cross-multiply, no float boundary).
    Oracle: per-doc zlib sizes ride a Parquet artifact (deflate is
    deterministic stdlib); DuckDB replays the per-source aggregation and
    flag logic."""
    from ...functions.text import compression_ratio_batch

    ensure_zlib_sizes_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        r = compression_ratio_batch(t)
        flagged = pc.cast(
            pc.less(pc.multiply(r["compressed_bytes"], 100),
                    pc.multiply(r["raw_bytes"], 45)), pa.int64())
        g = pa.table(
            {"source": t["source"], "n_docs": pa.nulls(len(t), pa.int64()).fill_null(1),
             "raw_bytes": r["raw_bytes"], "compressed_bytes": r["compressed_bytes"],
             "n_flagged": flagged}
        ).group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("raw_bytes", "sum"),
             ("compressed_bytes", "sum"), ("n_flagged", "sum")])
        return g.rename_columns(["source", "n_docs", "raw_bytes",
                                 "compressed_bytes", "n_flagged"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "raw_bytes", "compressed_bytes", "n_flagged"])


def q_padding_waste(sf_dir: str) -> pd.DataFrame:
    """Length-bucketed batching: padding tokens wasted per strategy when
    sequences batch 64 at a time padded to the batch max — arrival(id)
    order vs length-sorted order (the standard bucketing trick).

    BOTH strategies share one machinery pass each: ONE boundary sample
    (both sort keys from the same sampled rows), ONE counting pass (each
    row histogrammed under both strategies' range buckets), and ONE grouped
    exchange on (strategy, range_bucket) — each group sorts locally, assigns
    exact global ranks from the broadcast prefix offsets, folds its
    COMPLETE 64-row batches to a single collapsed row and emits raw
    partials only for the ≤2 batches straddling its edges, so the driver
    combine sees O(strategies × buckets) rows at any corpus size."""
    from ...functions.relational import bucketed_group_reduce

    B = 64
    src = ensure_derived_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["doc_id", "n_tok"], override_num_blocks=8)

    # 1. ONE deterministic sample pass → range boundaries for both keys
    def pick(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t
        idx = np.unique(np.linspace(0, n - 1, min(24, n)).astype(np.int64))
        return t.take(pa.array(idx))

    sample = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).to_pandas()

    def cuts(vals: np.ndarray, nb: int) -> np.ndarray:
        vals = np.sort(vals)
        if len(vals) == 0 or nb <= 1:
            return vals[:0]
        return np.unique(vals[(np.arange(1, nb) * len(vals)) // nb])

    nb = 32
    bounds = {0: cuts(sample["doc_id"].to_numpy(), nb),
              1: cuts(sample["n_tok"].to_numpy().astype(np.int64), nb)}

    # 2. tag every row under BOTH strategies (strat 0 = by_id, 1 = by_length)
    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        toks = pc.cast(t["n_tok"], pa.int64()).to_numpy(zero_copy_only=False)
        b0 = np.searchsorted(bounds[0], ids, side="right").astype(np.int64)
        b1 = np.searchsorted(bounds[1], toks, side="right").astype(np.int64)
        n = len(ids)
        return pa.table({
            "strat": pa.array(np.repeat(np.array([0, 1], np.int64), n)),
            "bucket": pa.array(np.concatenate([b0, b1])),
            "doc_id": pa.array(np.concatenate([ids, ids])),
            "n_tok": pa.array(np.concatenate([toks, toks]), pa.int64()),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    # 3. ONE counting pass → exact per-(strategy, bucket) prefix offsets
    def count_partial(t: pa.Table) -> pa.Table:
        key = t["strat"].to_numpy(zero_copy_only=False) * (nb + 1) + \
            t["bucket"].to_numpy(zero_copy_only=False)
        ids, cnts = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(ids, pa.int64()), "n": pa.array(cnts, pa.int64())})

    counts = (
        tagged.select_columns(["strat", "bucket"])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("k")["n"].sum().sort_index()
    )
    offsets: dict[int, int] = {}
    for strat in (0, 1):
        sel = counts[(counts.index >= strat * (nb + 1)) & (counts.index < (strat + 1) * (nb + 1))]
        for k, o in zip(sel.index, sel.cumsum() - sel):
            offsets[int(k)] = int(o)

    # 4. ONE grouped exchange; per (strat, bucket): local sort → exact global
    # ranks → fold complete batches, emit straddling partials raw
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (strat, bucket), g in df.groupby(["strat", "bucket"], sort=False):
            off = offsets[int(strat) * (nb + 1) + int(bucket)]
            g = g.sort_values(
                "doc_id" if strat == 0 else ["n_tok", "doc_id"], kind="stable")
            toks = g["n_tok"].to_numpy()
            b = (off + np.arange(len(g), dtype=np.int64)) // B
            agg = pd.DataFrame({"b": b, "n_tok": toks}).groupby("b", as_index=False).agg(
                c=("n_tok", "size"), m=("n_tok", "max"), t=("n_tok", "sum"))
            complete = (agg["b"] * B >= off) & ((agg["b"] + 1) * B <= off + len(g))
            comp, inc = agg[complete], agg[~complete]
            rows = pd.DataFrame({
                "strat": int(strat), "b": inc["b"], "c": inc["c"], "m": inc["m"],
                "t": inc["t"], "nb": 0, "pad": 0})
            collapsed = pd.DataFrame({
                "strat": [int(strat)], "b": [-1], "c": [int(comp["c"].sum())],
                "m": [0], "t": [0], "nb": [len(comp)],
                "pad": [int((comp["c"] * comp["m"] - comp["t"]).sum())]})
            outs.append(pd.concat([rows, collapsed], ignore_index=True))
        return pd.concat(outs, ignore_index=True)

    per = bucketed_group_reduce(tagged, ["strat", "bucket"], fold).to_pandas()

    rows = []
    for strat, name in ((0, "by_id"), (1, "by_length")):
        d = per[per["strat"] == strat]
        comp, inc = d[d["b"] < 0], d[d["b"] >= 0]
        n_batches, n_seqs = int(comp["nb"].sum()), int(comp["c"].sum())
        pad = int(comp["pad"].sum())
        if len(inc):
            g = inc.groupby("b").agg(c=("c", "sum"), m=("m", "max"), t=("t", "sum"))
            n_batches += len(g)
            n_seqs += int(g["c"].sum())
            pad += int((g["c"] * g["m"] - g["t"]).sum())
        rows.append((name, n_batches, n_seqs, pad))
    out = pd.DataFrame(rows, columns=["strategy", "n_batches", "n_seqs", "pad_tokens"])
    return _i64(out, ["n_batches", "n_seqs", "pad_tokens"])


SQL_PADDING_WASTE = f"""
WITH s AS (SELECT doc_id, n_tok FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
i AS (SELECT n_tok, (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 64 AS b FROM s),
l AS (SELECT n_tok, (ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) - 1) // 64 AS b FROM s),
ia AS (SELECT b, COUNT(*) c, MAX(n_tok) m, SUM(n_tok) t FROM i GROUP BY b),
la AS (SELECT b, COUNT(*) c, MAX(n_tok) m, SUM(n_tok) t FROM l GROUP BY b)
SELECT 'by_id' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(c) AS BIGINT) AS n_seqs, CAST(SUM(c * m - t) AS BIGINT) AS pad_tokens
FROM ia
UNION ALL
SELECT 'by_length', CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT),
       CAST(SUM(c * m - t) AS BIGINT)
FROM la
ORDER BY strategy
"""


def ensure_bpe_encoded_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``bpe_encode_stats``: per-sequence encoded lengths
    ``(source, n_after)`` computed by the reference one-pass-per-rule kernel
    (`merge_pair_np` in `merge_idx` order) — an independent implementation
    the distributed linked-list priority encoder must match exactly."""
    import os as _os

    src = ensure_derived_parquet(sf_dir)

    def build() -> pa.Table:
        from ...functions.bpe import bpe_train_sampled, merge_pair_np
        from ...functions.tokens import _flat_tokens
        from ...schema import VOCAB_SIZE

        merges = bpe_train_sampled(src, num_merges=512, vocab_base=VOCAB_SIZE)
        t = pq.read_table(src, columns=["tokens", "source"])
        v, o = _flat_tokens(t)
        b = o[0]
        v, o = v[b : o[-1]].copy(), (o - b).copy()
        for r in merges.itertuples():
            v, o = merge_pair_np(v, o, int(r.left), int(r.right), int(r.new_id))
        return pa.table(
            {"source": t["source"], "n_after": pa.array(np.diff(o), pa.int64())}
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "bpe_encoded.parquet"), build
    )


def q_bpe_encode_stats(sf_dir: str) -> pd.DataFrame:
    """Tokenizer INFERENCE at scale: train a REALISTIC 512-merge vocab on a
    deterministic bounded sample (driver-side incremental trainer — vocab is
    a statistic, it never needs the full corpus), broadcast it, and apply it
    to the whole corpus with the linked-list priority encoder (O(tokens) per
    batch regardless of vocab size); report per-source token totals
    before/after — the compression the learned vocab buys.  Oracle: the
    reference pass-per-rule kernel's encoded lengths as a Parquet artifact
    (independent algorithm, identical semantics)."""
    from ...functions.bpe import bpe_encode, bpe_train_sampled
    from ...schema import VOCAB_SIZE

    src = ensure_derived_parquet(sf_dir)
    ensure_bpe_encoded_parquet(sf_dir)
    merges = bpe_train_sampled(src, num_merges=512, vocab_base=VOCAB_SIZE)
    full = rd.read_parquet(src, columns=["tokens", "source"], override_num_blocks=8)
    encoded = bpe_encode(full, merges)

    def counts(t: pa.Table) -> pa.Table:
        n = pc.list_value_length(t["tokens"])
        g = pa.table({"source": t["source"], "n_after": pc.cast(n, pa.int64())}).group_by(
            ["source"]).aggregate([("n_after", "sum")])
        return pa.table({"source": g["source"], "n_after": g["n_after_sum"]})

    after = encoded.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True
                                ).to_pandas().groupby("source", as_index=False).sum()
    before = (
        rd.read_parquet(src, columns=["n_tok", "source"], override_num_blocks=8)
        .map_batches(
            lambda t: pa.table({"source": t["source"],
                                "n_before": pc.cast(t["n_tok"], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("source", as_index=False).sum()
    )
    out = before.merge(after, on="source").sort_values("source", ignore_index=True)
    return _i64(out, ["n_before", "n_after"])


SQL_BPE_ENCODE_STATS = f"""
WITH b AS (SELECT source, SUM(n_tok) AS nb
           FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet') GROUP BY source),
     a AS (SELECT source, SUM(n_after) AS na
           FROM read_parquet('{ORACLE_ARTIFACT_DIR}/bpe_encoded.parquet') GROUP BY source)
SELECT b.source, CAST(b.nb AS BIGINT) AS n_before, CAST(a.na AS BIGINT) AS n_after
FROM b JOIN a USING (source) ORDER BY b.source
"""


def q_naive_bayes_langid(sf_dir: str) -> pd.DataFrame:
    """Multinomial Naive Bayes language classifier — train on the hash-split
    train fold (leakage-safe pure-id membership, same split as
    ``split_counts``), score the val fold, emit the confusion matrix.

    Scale shape: (lang, term) counts are a vocab-bounded distributed reduce;
    the model (per-term per-lang ln(c+1) weights + per-lang constants) is a
    driver fold broadcast into the score stage; scoring is one streaming
    pass using the factored form  score = prior_l + Σ_t tf·ln(c_{t,l}+1)
    − mtf·ln(tot_l + V)  so unseen-in-lang vocab terms cost nothing (their
    ln(0+1)=0 term vanishes) and no lang×vocab dense matrix is ever built.
    Val docs with zero in-vocab tokens are excluded (both sides)."""
    from ...functions.search import tokenize_terms

    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])

    def tag_split(t: pa.Table) -> pa.Table:
        fp = md5_hex(
            pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":split", "")
        )
        return t.append_column("split", pc.if_else(pc.less(fp, "1a"), "val", "train"))

    tagged = docs.map_batches(tag_split, batch_format="pyarrow", zero_copy_batch=True)

    # --- train fold: (lang, term) counts + per-lang doc counts, one pass ---
    def train_partial(t: pa.Table) -> pa.Table:
        tr = t.filter(pc.equal(t["split"], "train"))
        toks = tokenize_terms(tr, "text", "doc_id")
        lang_of = dict(zip(tr["doc_id"].to_pylist(), tr["lang"].to_pylist()))
        df = toks.to_pandas()
        df["lang"] = df["doc_id"].map(lang_of)
        g = df.groupby(["lang", "term"], as_index=False)["tf"].sum()
        g["nd"] = 0
        nd = tr.group_by("lang").aggregate([([], "count_all")]).to_pandas()
        nd = pd.DataFrame(
            {"lang": nd["lang"], "term": "", "tf": 0, "nd": nd["count_all"]}
        )
        return pa.Table.from_pandas(pd.concat([g, nd], ignore_index=True), preserve_index=False)

    from ...functions.relational import bucketed_group_reduce

    parts = tagged.map_batches(train_partial, batch_format="pyarrow", zero_copy_batch=True)
    model_df = bucketed_group_reduce(
        parts,
        ["lang", "term"],
        lambda df: df.groupby(["lang", "term"], as_index=False)[["tf", "nd"]].sum(),
    ).to_pandas()

    doc_counts = model_df[model_df["term"] == ""].set_index("lang")["nd"]
    counts = model_df[model_df["term"] != ""]
    langs = sorted(doc_counts.index)
    lx = {l: i for i, l in enumerate(langs)}
    n_train = int(doc_counts.sum())
    tot = counts.groupby("lang")["tf"].sum().reindex(langs).fillna(0).to_numpy()
    vocab_terms = counts["term"].unique()
    v_size = len(vocab_terms)
    # per-term weight rows: ln(c+1) per lang (sparse → dense per term)
    w = {}
    for term, g in counts.groupby("term"):
        row = np.zeros(len(langs))
        row[[lx[l] for l in g["lang"]]] = np.log(g["tf"].to_numpy() + 1.0)
        w[term] = row
    priors = np.log(doc_counts.reindex(langs).to_numpy() / float(n_train))
    penalty = np.log(tot + float(v_size))  # per-lang ln(tot_l + V)

    # --- val fold: factored-form scoring, confusion pairs pre-counted ---
    def score_partial(t: pa.Table) -> pa.Table:
        va = t.filter(pc.equal(t["split"], "val"))
        if va.num_rows == 0:
            return pa.table({"lang": pa.array([], pa.string()),
                             "predicted": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        toks = tokenize_terms(va, "text", "doc_id").to_pandas()
        toks = toks[toks["term"].isin(w)]
        ids = va["doc_id"].to_pylist()
        di = {d: i for i, d in enumerate(ids)}
        scores = np.tile(priors, (len(ids), 1))
        rows = toks["doc_id"].map(di).to_numpy()
        tfv = toks["tf"].to_numpy(dtype=np.float64)
        wmat = np.vstack([w[x] for x in toks["term"]]) if len(toks) else np.zeros((0, len(langs)))
        np.add.at(scores, rows, tfv[:, None] * wmat)
        mtf = np.zeros(len(ids))
        np.add.at(mtf, rows, tfv)
        scores -= mtf[:, None] * penalty[None, :]
        keep = mtf > 0  # zero-in-vocab docs excluded (matches the oracle)
        pred = np.asarray(langs)[scores.argmax(axis=1)]  # argmax → first (lang asc)
        truth = np.asarray(va["lang"].to_pylist())
        df = (
            pd.DataFrame({"lang": truth[keep], "predicted": pred[keep]})
            .groupby(["lang", "predicted"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = tagged.map_batches(score_partial, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        grouped_sums(pairs, ["lang", "predicted"], {"n2": "n"}, reduce="driver")
        .to_pandas()
        .rename(columns={"n2": "n"})
        .sort_values(["lang", "predicted"], ignore_index=True)
    )
    return _i64(out, ["n"])


SQL_NAIVE_BAYES_LANGID = """
WITH split AS (
  SELECT doc_id, lang,
         CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':split') < '1a'
              THEN 'val' ELSE 'train' END AS sp
  FROM documents),
toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tr  AS (SELECT t.doc_id, s.lang, t.term FROM toks2 t JOIN split s USING (doc_id)
        WHERE s.sp = 'train'),
c   AS (SELECT lang, term, COUNT(*) AS c FROM tr GROUP BY 1, 2),
tot AS (SELECT lang, COUNT(*) AS tot FROM tr GROUP BY 1),
pri AS (SELECT lang, COUNT(*) AS nd FROM split WHERE sp = 'train' GROUP BY 1),
nt  AS (SELECT COUNT(*) AS n FROM split WHERE sp = 'train'),
voc AS (SELECT COUNT(DISTINCT term) AS v FROM tr),
tf  AS (SELECT t.doc_id, t.term, COUNT(*) AS tf FROM toks2 t
        JOIN split s USING (doc_id) WHERE s.sp = 'val' GROUP BY 1, 2),
tfv AS (SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM tr) vt USING (term)),
mtf AS (SELECT doc_id, SUM(tf) AS mtf FROM tfv GROUP BY 1),
sc AS (
  SELECT m.doc_id, p.lang,
         LN(p.nd / CAST(nt.n AS DOUBLE))
           + COALESCE(x.sumln, 0)
           - m.mtf * LN(t.tot + voc.v) AS score
  FROM mtf m CROSS JOIN pri p CROSS JOIN nt CROSS JOIN voc
  JOIN tot t ON t.lang = p.lang
  LEFT JOIN (SELECT tfv.doc_id, c.lang, SUM(tfv.tf * LN(c.c + 1)) AS sumln
             FROM tfv JOIN c USING (term) GROUP BY 1, 2) x
    ON x.doc_id = m.doc_id AND x.lang = p.lang),
pred AS (
  SELECT doc_id, lang AS predicted,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
  FROM sc)
SELECT s.lang, p.predicted, COUNT(*) AS n
FROM pred p JOIN split s USING (doc_id)
WHERE p.rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_rrf_fusion(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-Rank Fusion (Cormack et al. 2009) of two retrieval systems
    over the same query — BM25 and raw disjunctive term-frequency — the
    standard hybrid-search combiner: each system produces its DISTRIBUTED
    top-100 ranking (per-block prune top-k, driver sees ≤100 rows per
    system), then the fuse Σ 1/(60+rank) is driver arithmetic over ≤200
    rows.  Ranks are assigned on scores re-quantized to 6 decimals (both
    engines) so cross-engine 1-ulp sum-order noise cannot flip a rank
    boundary; quantization ties break by doc_id identically."""
    from ...functions.relational import grouped_sums as _gs, topk as _topk
    from ...functions.search import bm25_postings, bm25_search

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    post = bm25_postings(ds, SEARCH_TERMS).materialize()  # ONE corpus scan
    bm = bm25_search(ds, SEARCH_TERMS, k=100, post=post)  # scores 6-dec rounded
    bm = bm.sort_values(["score", "doc_id"], ascending=[False, True], ignore_index=True)
    bm["r"] = np.arange(1, len(bm) + 1)

    cands = post.filter(expr="doc_id >= 0")
    kw = _topk(
        _gs(cands, ["doc_id"], {"s": "tf"}), ["s", "doc_id"], [True, False], 100
    ).to_pandas()
    kw = kw.sort_values(["s", "doc_id"], ascending=[False, True], ignore_index=True)
    kw["r"] = np.arange(1, len(kw) + 1)

    both = pd.concat([bm[["doc_id", "r"]], kw[["doc_id", "r"]]], ignore_index=True)
    both["w"] = 1.0 / (60.0 + both["r"])
    out = both.groupby("doc_id", as_index=False)["w"].sum().rename(columns={"w": "rrf"})
    out = out.sort_values(["rrf", "doc_id"], ascending=[False, True], ignore_index=True).head(20)
    out["rrf"] = out["rrf"].pipe(_rd)
    return _i64(out, ["doc_id"])


SQL_RRF_FUSION = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term FROM documents
), toks2 AS (SELECT * FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS len FROM toks2 GROUP BY 1),
stats AS (SELECT COUNT(*) AS n, SUM(len) AS sumlen FROM dl),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2
       WHERE term IN ('join', 'hash', 'batch') GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
bm AS (SELECT tf.doc_id,
         ROUND(SUM(ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 *
                 (dl.len / (CAST(stats.sumlen AS DOUBLE) / stats.n)))))), 6) AS s
       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
       GROUP BY 1),
bmr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r FROM bm
        QUALIFY r <= 100),
kw AS (SELECT doc_id, SUM(tf) AS s FROM tf GROUP BY 1),
kwr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r FROM kw
        QUALIFY r <= 100)
SELECT doc_id, ROUND(SUM(1.0 / (60.0 + r)), 6) AS rrf
FROM (SELECT * FROM bmr UNION ALL SELECT * FROM kwr)
GROUP BY 1 ORDER BY rrf DESC, doc_id LIMIT 20
"""


def q_type_hour_grid(sf_dir: str) -> pd.DataFrame:
    """Dense dimension-grid fill (event_type × all 24 hours, zeros kept) —
    the CROSS JOIN + LEFT JOIN COALESCE pattern: the fact side is ONE
    distributed (type, hour) aggregate; the grid completion is a reindex
    over the schema-bounded dimension product on the driver."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def add_h(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        hour_id = pc.divide(micros, pa.scalar(3_600_000_000, pa.int64()))
        hour = pc.subtract(hour_id, pc.multiply(pc.divide(hour_id, 24), 24))
        return pa.table({"event_type": t["event_type"], "hour": hour})

    agg = grouped_sums(
        ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour"],
        {},
        "n",
        reduce="driver",
    ).to_pandas()
    types = sorted(agg["event_type"].unique())
    grid = pd.MultiIndex.from_product([types, range(24)], names=["event_type", "hour"])
    out = (
        agg.set_index(["event_type", "hour"])
        .reindex(grid, fill_value=0)
        .reset_index()
        .sort_values(["event_type", "hour"], ignore_index=True)
    )
    return _i64(out, ["hour", "n"])


SQL_TYPE_HOUR_GRID = """
WITH dims AS (
  SELECT t.event_type, h.range AS hour
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN range(24) h),
c AS (
  SELECT event_type, (EPOCH_US(ts) // 3600000000) % 24 AS hour, COUNT(*) AS n
  FROM events GROUP BY 1, 2)
SELECT dims.event_type, dims.hour, COALESCE(c.n, 0) AS n
FROM dims LEFT JOIN c USING (event_type, hour)
ORDER BY 1, 2
"""


def q_fk_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity / coverage audit across table relationships —
    the data-quality gate every multi-table ingest runs before training:
    for each (child.key → parent.key) relation, count child rows and keys
    with no parent.  Distributed shape per relation: BOTH sides collapse to
    key-level partials first (per-batch distinct+count combiner →
    ``grouped_sums``), so only (key, rows) rows — never raw child rows —
    reach the anti exchange; the anti itself is one ``bucketed_group_reduce``
    over the tagged union of the two key tables.  Includes a coverage
    relation (customer → events.user_id) that is genuinely non-empty, so a
    bug that yields constant zeros cannot pass the oracle."""
    from ...functions.relational import bucketed_group_reduce

    rels = [
        ("orders.o_custkey->customer", ("orders", "o_custkey"), ("customer", "c_custkey")),
        ("lineitem.l_orderkey->orders", ("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
        ("events.user_id->customer", ("events", "user_id"), ("customer", "c_custkey")),
        ("customer->events.user_id", ("customer", "c_custkey"), ("events", "user_id")),
    ]

    def tagged(table: str, key: str, rid: int, par: int) -> rd.Dataset:
        # per-BATCH key partials tagged with (relation id, side): child keys
        # carry their row counts, parent keys carry 0 — the tagged union then
        # needs exactly ONE (rel, k) exchange for all relations together,
        # which yields orphans AND child totals in the same reduce
        def part(t: pa.Table, *, k=key, r=rid, p=par) -> pa.Table:
            g = pa.table({"k": pc.cast(t[k], pa.int64())}).group_by(["k"]).aggregate(
                [([], "count_all")])
            n = g.num_rows
            rows = (pc.cast(g["count_all"], pa.int64()) if p == 0
                    else pa.nulls(n, pa.int64()).fill_null(0))
            return pa.table(
                {"rel": pa.nulls(n, pa.int64()).fill_null(r), "k": g["k"],
                 "rows": rows, "par": pa.nulls(n, pa.int64()).fill_null(p)})

        return _t(sf_dir, table, [key]).map_batches(
            part, batch_format="pyarrow", zero_copy_batch=True)

    parts = [
        tagged(tbl, key, rid, side)
        for rid, (_, child, parent) in enumerate(rels)
        for side, (tbl, key) in enumerate((child, parent))
    ]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["rel", "k"], as_index=False).agg(rows=("rows", "sum"), par=("par", "sum"))
        g["orph"] = g["par"] == 0
        g["orows"] = g["rows"] * g["orph"]
        return g.groupby("rel", as_index=False).agg(
            child_rows=("rows", "sum"), orphan_keys=("orph", "sum"), orphan_rows=("orows", "sum"))

    per_bucket = bucketed_group_reduce(parts[0].union(*parts[1:]), ["rel", "k"], fold).to_pandas()
    agg = per_bucket.groupby("rel", as_index=False).sum()
    agg["relation"] = agg["rel"].map({i: name for i, (name, _, _) in enumerate(rels)})
    out = agg[["relation", "child_rows", "orphan_keys", "orphan_rows"]].sort_values(
        "relation", ignore_index=True)
    return _i64(out, ["child_rows", "orphan_keys", "orphan_rows"])


SQL_FK_INTEGRITY_AUDIT = """
SELECT 'orders.o_custkey->customer' AS relation,
       (SELECT COUNT(*) FROM orders) AS child_rows,
       COUNT(DISTINCT o.o_custkey) AS orphan_keys, COUNT(*) AS orphan_rows
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       (SELECT COUNT(*) FROM lineitem),
       COUNT(DISTINCT l.l_orderkey), COUNT(*)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'events.user_id->customer',
       (SELECT COUNT(*) FROM events),
       COUNT(DISTINCT e.user_id), COUNT(*)
FROM events e WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
UNION ALL
SELECT 'customer->events.user_id',
       (SELECT COUNT(*) FROM customer),
       COUNT(DISTINCT c.c_custkey), COUNT(*)
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
"""


def q_hourly_autocorr(sf_dir: str) -> pd.DataFrame:
    """Lag-1 autocorrelation of the hourly event-count series per type —
    the burstiness/seasonality drift signal.  The heavy half is ONE
    distributed (type, hour) count; the series itself is schema-bounded
    (|types| × |hours|), so the lag-pair Pearson corr is driver numpy over
    the tiny aggregate, matching SQL ``corr(n, LAG(n))`` exactly (pairs are
    consecutive PRESENT rows in hour order, as in the window oracle)."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def add_hour(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {"hour_id": pc.divide(micros, pa.scalar(3_600_000_000, pa.int64())),
             "event_type": t["event_type"]}
        )

    agg = grouped_sums(
        ds.map_batches(add_hour, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour_id"],
        {},
        "n",
    ).to_pandas()
    rows = []
    for etype, g in agg.sort_values(["event_type", "hour_id"]).groupby("event_type"):
        x = g["n"].to_numpy(dtype=np.float64)
        cur, prev = x[1:], x[:-1]
        if len(cur) >= 2 and cur.std() > 0 and prev.std() > 0:
            r = float(np.corrcoef(cur, prev)[0, 1])
        else:
            r = np.nan
        rows.append((etype, _rd(r, 6), len(cur)))
    out = pd.DataFrame(rows, columns=["event_type", "autocorr", "n_pairs"])
    return _i64(out, ["n_pairs"])


SQL_HOURLY_AUTOCORR = """
WITH h AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_id, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
l AS (
  SELECT event_type, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY hour_id) AS pn
  FROM h)
SELECT event_type, ROUND(corr(n, pn), 6) AS autocorr, COUNT(pn) AS n_pairs
FROM l GROUP BY event_type ORDER BY event_type
"""


def q_source_vocab_jaccard(sf_dir: str) -> pd.DataFrame:
    """Pairwise vocabulary Jaccard similarity between document sources —
    the corpus-mixture redundancy check.  Never materializes a vocabulary:
    (source, term) distinct via one grouped exchange, each term's source
    SET packed into an int bitmask by summing per-source bit values (each
    (source, term) appears exactly once post-distinct, so SUM ≡ OR), then a
    histogram over realized masks — the driver sees only (mask, count)
    rows (≤ distinct masks, ≤ |terms|), from which every pairwise
    intersection and union is popcount arithmetic."""
    from ...functions.search import tokenize_terms

    docs = _t(sf_dir, "documents", ["source", "text"])
    srcs = sorted(grouped_sums(_t(sf_dir, "documents", ["source"]), ["source"], {}, "n")
                  .to_pandas()["source"])
    bit_of = {s: 1 << i for i, s in enumerate(srcs)}

    pairs = docs.map_batches(
        lambda t: tokenize_terms(t, "text", "source"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    distinct = grouped_sums(pairs, ["source", "term"], {}, "c")

    def to_bits(t: pa.Table, *, bits=bit_of) -> pa.Table:
        src = t["source"].to_pandas().map(bits).to_numpy(dtype=np.int64)
        return pa.table({"term": t["term"], "bit": pa.array(src, pa.int64())})

    masks = grouped_sums(
        distinct.map_batches(to_bits, batch_format="pyarrow"), ["term"], {"mask": "bit"}, "c"
    )
    hist = grouped_sums(
        masks.select_columns(["mask"]), ["mask"], {}, "cnt"
    ).to_pandas()
    mask_vals = hist["mask"].to_numpy(dtype=np.int64)
    cnts = hist["cnt"].to_numpy(dtype=np.int64)
    size = {s: int(cnts[(mask_vals & b) != 0].sum()) for s, b in bit_of.items()}
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = int(cnts[((mask_vals & bit_of[a]) != 0) & ((mask_vals & bit_of[b]) != 0)].sum())
            uni = size[a] + size[b] - inter
            rows.append((a, b, inter, _rd(inter / uni, 6) if uni else np.nan))
    out = pd.DataFrame(rows, columns=["source_a", "source_b", "inter", "jaccard"])
    return _i64(out, ["inter"])


SQL_SOURCE_VOCAB_JACCARD = """
WITH toks AS (
  SELECT DISTINCT source, UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
t AS (SELECT * FROM toks WHERE term <> ''),
sizes AS (SELECT source, COUNT(*) AS n FROM t GROUP BY 1),
grid AS (
  SELECT a.source AS source_a, a.n AS na, b.source AS source_b, b.n AS nb
  FROM sizes a JOIN sizes b ON a.source < b.source),
i AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS inter
  FROM t a JOIN t b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2)
SELECT g.source_a, g.source_b, COALESCE(i.inter, 0) AS inter,
       ROUND(COALESCE(i.inter, 0) / (g.na + g.nb - COALESCE(i.inter, 0)), 6) AS jaccard
FROM grid g LEFT JOIN i ON g.source_a = i.source_a AND g.source_b = i.source_b
ORDER BY 1, 2
"""


def q_orders_vs_ships_daily(sf_dir: str) -> pd.DataFrame:
    """Daily order volume vs daily shipment volume via a native FULL OUTER
    hash join — the reconciliation-report shape where either side may have
    days the other lacks (ship dates extend past the last order date).
    Both sides are pre-aggregated to (day, n) BEFORE the join, so the
    exchange moves day-level partials, not raw rows; Ray's full-outer
    ``Dataset.join`` coalesces the key across sides."""
    from ...functions.relational import hash_join

    def to_day(col: str, out: str):
        def f(t: pa.Table) -> pa.Table:
            micros = pc.cast(t[col], pa.int64())
            return pa.table({"day_id": pc.divide(micros, pa.scalar(86_400_000_000, pa.int64()))})
        return f

    o = grouped_sums(
        _t(sf_dir, "orders", ["o_orderdate"]).map_batches(
            to_day("o_orderdate", "day_id"), batch_format="pyarrow", zero_copy_batch=True),
        ["day_id"], {}, "o_n",
    )
    l = grouped_sums(
        _t(sf_dir, "lineitem", ["l_shipdate"]).map_batches(
            to_day("l_shipdate", "day_id"), batch_format="pyarrow", zero_copy_batch=True),
        ["day_id"], {}, "l_n",
    )
    j = hash_join(o, l, on="day_id", how="full_outer").to_pandas()
    j["o_n"] = j["o_n"].fillna(0)
    j["l_n"] = j["l_n"].fillna(0)
    return _i64(j, ["day_id", "o_n", "l_n"])


SQL_ORDERS_VS_SHIPS_DAILY = """
WITH o AS (
  SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day_id, COUNT(*) AS o_n
  FROM orders GROUP BY 1),
l AS (
  SELECT CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS day_id, COUNT(*) AS l_n
  FROM lineitem GROUP BY 1)
SELECT COALESCE(o.day_id, l.day_id) AS day_id,
       COALESCE(o.o_n, 0) AS o_n, COALESCE(l.l_n, 0) AS l_n
FROM o FULL OUTER JOIN l ON o.day_id = l.day_id
ORDER BY 1
"""


