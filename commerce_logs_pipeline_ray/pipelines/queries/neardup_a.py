"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    _corpus_dir,
    _i64,
    _rd,
    _t,
    broadcast_join,
    grouped_sums,
    md5_hex,
    np,
    pa,
    pc,
    pd,
    pq,
    rd,
    topk,
)  # noqa: F401

# ---------------------------------------------------------------------------
# Near-duplicate detection (training-data ops; SURVEY §2.6 J4 generalized)
# ---------------------------------------------------------------------------

def q_embedding_neardup(sf_dir: str) -> pd.DataFrame:
    from ...functions.dedup import embedding_neardup_pairs

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_neardup_pairs(ds, threshold=0.4)
    return _i64(out, ["vec_a", "vec_b"])


SQL_EMBEDDING_NEARDUP = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.emb, b.emb), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
"""


def q_embedding_neardup_lsh(sf_dir: str) -> pd.DataFrame:
    """Hyperplane-LSH-bucketed near-dup pairs (approximate, deterministic
    seed; rows-only — recall vs the exact tiling is measured in
    tests/test_dedup.py).  The scale path for high-threshold near-dup."""
    from ...functions.dedup import embedding_neardup_lsh

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = embedding_neardup_lsh(ds, threshold=0.4, bits_per_band=4, n_bands=16, dim=64)
    return _i64(out, ["vec_a", "vec_b"])


def q_jaccard_neardup(sf_dir: str) -> pd.DataFrame:
    """EXACT word-3-gram-shingle Jaccard pairs ≥ 0.5 via the distributed
    shingle inverted-index self-join — the ground-truth counterpart of
    `minhash_neardup`'s LSH estimates, and the one dedup family checkable
    against a full SQL reimplementation (DuckDB gram explode + self-join)."""
    from ...functions.dedup import ngram_jaccard_pairs

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, threshold=0.5, shingle_k=3)
    return _i64(out, ["doc_a", "doc_b"])


# Gram semantics mirror functions/dedup.py::gram_hash_stream for docs with
# >= k words (every sf's documents table: min 10 words): gram i = words
# [i, i+k).  DuckDB list slicing is 1-based inclusive, so w[i:i+2] is the
# 3-gram starting at i, for i in 1 .. len(w)-2.
SQL_JACCARD_NEARDUP = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
"""


# Shared gram/pair CTE prefix (identical to SQL_JACCARD_NEARDUP's pair
# derivation) + transitive closure: near-dup PAIRS contracted into CLUSTERS
# labeled by their min doc_id — the SQL mirror of star-contraction CC.
_SQL_CLUSTER_CTE = """
WITH RECURSIVE words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
), gsizes AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN gsizes sa ON sa.doc_id = doc_a
  JOIN gsizes sb ON sb.doc_id = doc_b
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
), sym AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
), comp AS (
  SELECT u AS node, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
)
"""


_NEARDUP_COMPONENTS_CACHE: dict = {}


def _neardup_components(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """(node, component) over the exact-Jaccard near-dup pair graph.

    Memoized per (sf_dir, threshold): `dedup_clusters` and
    `dedup_survivors` both consume the same component map, so within one
    process the pair exchange + star contraction runs ONCE — the same
    shared-intermediate pattern as the co-purchase edge artifact."""
    key = (sf_dir, threshold)
    hit = _NEARDUP_COMPONENTS_CACHE.get(key)
    if hit is not None:
        return hit.copy()
    from ...functions.dedup import ngram_jaccard_pairs
    from ...functions.graph import connected_components

    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, threshold=threshold, shingle_k=3)
    edges = rd.from_pandas(
        pairs.rename(columns={"doc_a": "u", "doc_b": "v"})[["u", "v"]].astype("int64")
    )
    comp = connected_components(edges)
    _NEARDUP_COMPONENTS_CACHE.clear()  # bound memory: one corpus at a time
    _NEARDUP_COMPONENTS_CACHE[key] = comp
    return comp.copy()


def q_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs → connected components (distributed star contraction,
    `functions/graph.py`) → per-cluster sizes.  a~b and b~c must land in ONE
    cluster even when (a,c) is itself below threshold — the property pair
    queries can't express."""
    comp = _neardup_components(sf_dir)
    out = (
        comp.groupby("component", as_index=False)
        .agg(size=("node", "count"))
        .rename(columns={"component": "cluster_id"})
    )
    return _i64(out, ["cluster_id", "size"])


SQL_DEDUP_CLUSTERS = (
    _SQL_CLUSTER_CTE
    + "SELECT cluster_id, COUNT(*) AS size FROM comp GROUP BY cluster_id"
)


def q_dedup_survivors(sf_dir: str) -> pd.DataFrame:
    """Keep-one-per-cluster over the FULL corpus: broadcast the (output-sized)
    drop set into a map_batches filter, count kept docs per source — the
    materialized endgame of the dedup family (no corpus shuffle; the corpus
    streams once)."""
    import ray as _ray

    comp = _neardup_components(sf_dir)
    drops = pa.array(
        comp.loc[comp["node"] != comp["component"], "node"].to_numpy(), type=pa.int64()
    )
    drop_ref = _ray.put(drops)

    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def partial(t: pa.Table) -> pa.Table:
        dset = _ray.get(drop_ref)
        dropped = pc.fill_null(pc.is_in(t["doc_id"], value_set=dset), False)
        flat = pa.table(
            {"source": t["source"],
             "kept": pc.cast(pc.invert(dropped), pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate([("kept", "sum"), ([], "count_all")])
        return pa.table(
            {"source": g["source"], "n_kept": g["kept_sum"],
             "n_docs": pc.cast(g["count_all"], pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = partials.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_kept=("n_kept", "sum")
    )
    return _i64(out, ["n_docs", "n_kept"])


SQL_DEDUP_SURVIVORS = (
    _SQL_CLUSTER_CTE
    + """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id IN (SELECT node FROM comp WHERE node <> cluster_id)
                THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source
"""
)


def q_minhash_neardup(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup pairs.  Oracle: the independent per-doc
    reference derivation (``ensure_neardup_pairs_parquet``) — MinHash is
    seed-deterministic, so the distributed flat-stream/co-group pipeline
    and the scalar dict-bucketed reference must emit identical pair sets
    with bitwise-equal est/exact Jaccard (also planted-truth-tested in
    tests/test_dedup.py)."""
    from ...functions.dedup import minhash_lsh_pairs

    ensure_neardup_pairs_parquet(sf_dir)
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_lsh_pairs(ds, threshold=0.5)
    return _i64(out, ["doc_a", "doc_b"])


_DERIVED_CACHE: dict[str, pa.Table] = {}


def _derived_sequences(sf_dir: str) -> pa.Table:
    from ...sources.sequences import derive_sequences

    if sf_dir not in _DERIVED_CACHE:
        docs = pq.read_table(f"{sf_dir}/documents.parquet")
        _DERIVED_CACHE[sf_dir] = derive_sequences(docs)
    return _DERIVED_CACHE[sf_dir]


def _ensure_artifact(path: str, build) -> str:
    """Idempotent atomic Parquet artifact: build() is called only when the
    (version-keyed) path is missing; written tmp+rename."""
    import os as _os
    import uuid as _uuid

    if not _os.path.exists(path):
        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{_uuid.uuid4().hex}"
        pq.write_table(build(), tmp)
        _os.replace(tmp, path)
    return path


def ensure_derived_parquet(sf_dir: str) -> str:
    """Materialize the derived sequences table (sid, tokens, n_tok, source)
    as Parquet in the shared oracle-artifact dir — the Ray queries read it
    DISTRIBUTED and the DuckDB oracles ``read_parquet``+``UNNEST`` the same
    file."""
    import os as _os

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "derived.parquet"),
        lambda: _derived_sequences(sf_dir),
    )


def q_token_frequency_topk(sf_dir: str) -> pd.DataFrame:
    """Vocab histogram over the derived tokens payload: per-batch
    value_counts partials → bucketed reduce → top-50.  Oracle:
    ``UNNEST(tokens)`` + GROUP BY over the same materialized Parquet."""
    from ...functions.tokens import token_frequency

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8)
    return token_frequency(ds, topk=50)


SQL_TOKEN_FREQUENCY = f"""
SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS "count"
FROM (SELECT UNNEST(tokens) AS token
      FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet'))
GROUP BY 1 ORDER BY "count" DESC, token LIMIT 50
"""


def q_bigram_topk(sf_dir: str) -> pd.DataFrame:
    """Top-20 adjacent token pairs (within sequences) — packed-int64 bigram
    keys, value_counts partials, bucketed reduce.  Oracle: lateral
    generate_series over the token lists."""
    from ...functions.tokens import bigram_topk

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8)
    return bigram_topk(ds, k=20)


SQL_BIGRAM_TOPK = f"""
WITH seq AS (SELECT tokens FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')),
z AS (
  SELECT UNNEST(list_zip(tokens[1:len(tokens) - 1], tokens[2:len(tokens)])) AS p
  FROM seq WHERE len(tokens) >= 2
)
SELECT CAST(p[1] AS BIGINT) AS token_a, CAST(p[2] AS BIGINT) AS token_b, COUNT(*) AS "count"
FROM z GROUP BY 1, 2 ORDER BY "count" DESC, token_a, token_b LIMIT 20
"""


def q_training_chunks(sf_dir: str) -> pd.DataFrame:
    """GPT-style concat-and-chunk training layout: docs ordered by doc_id
    concatenate into one token stream (EOS after each doc) cut into exact
    1024-token blocks spanning doc boundaries.  Per-chunk stats gate the
    whole distributed composition — offset prefix-sum exchange, local piece
    slicing, chunk assembly — against a window-function SQL mirror."""
    from ...functions.tokens import concat_chunk_tokens

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "tokens", "n_tok"],
        override_num_blocks=8,
    )
    out = concat_chunk_tokens(ds, seq_len=1024).to_pandas()
    out = out.sort_values("chunk_id", ignore_index=True)
    return _i64(out, ["chunk_id", "n_tokens", "n_doc_starts", "token_sum"])


SQL_TRAINING_CHUNKS = f"""
WITH seq AS (
  SELECT doc_id, tokens, n_tok,
         COALESCE(SUM(CAST(n_tok AS BIGINT) + 1) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS base
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
),
flat AS (
  SELECT base + gs.i - 1 AS pos,
         CASE WHEN gs.i <= n_tok THEN tokens[gs.i] ELSE 2147483647 END AS tok,
         CASE WHEN gs.i = 1 THEN 1 ELSE 0 END AS is_start
  FROM seq, unnest(generate_series(1, CAST(n_tok AS BIGINT) + 1)) AS gs(i)
)
SELECT CAST(pos // 1024 AS BIGINT) AS chunk_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(is_start) AS BIGINT) AS n_doc_starts,
       CAST(SUM(CAST(tok AS HUGEINT)) AS BIGINT) AS token_sum
FROM flat GROUP BY 1 ORDER BY 1
"""


def q_length_histogram(sf_dir: str) -> pd.DataFrame:
    """Sequence-length buckets (width 16) over the derived corpus."""
    from ...functions.tokens import length_histogram

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["n_tok"], override_num_blocks=8)
    return length_histogram(ds, bucket_width=16)


SQL_LENGTH_HISTOGRAM = f"""
SELECT CAST(n_tok // 16 AS BIGINT) AS bucket,
       COUNT(*) AS n_sequences,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
GROUP BY 1 ORDER BY 1
"""


def _pack_source_stats(sub: pa.Table, max_len: int = 512) -> tuple[int, int, int]:
    """Deterministic FFD packing of ONE source's rows: sort by doc_id first
    so first-fit-decreasing tie-breaks are partition-independent.  Returns
    (n_packs, total_tokens, total_docs)."""
    from ...functions.tokens import pack_batch

    sub = sub.sort_by("doc_id")
    p = pack_batch(sub, max_len=max_len)
    return (
        p.num_rows,
        int(pc.sum(p["n_tok"]).as_py() or 0),
        int(pc.sum(p["n_docs"]).as_py() or 0),
    )


def _pack_stats_table(t: pa.Table, max_len: int = 512) -> pa.Table:
    """(source, n_packs, total_tokens, total_docs) for every source present
    in ``t`` — the one per-source packing loop shared by the distributed
    query and the driver-side reference artifact."""
    col = t["source"].combine_chunks() if isinstance(t["source"], pa.ChunkedArray) else t["source"]
    rows = []
    for src in sorted(pc.unique(col).to_pylist()):
        n_packs, tt, td = _pack_source_stats(t.filter(pc.equal(t["source"], src)), max_len)
        rows.append({"source": src, "n_packs": n_packs, "total_tokens": tt, "total_docs": td})
    return pa.Table.from_pylist(rows)


def ensure_packing_artifact(sf_dir: str, max_len: int = 512) -> str:
    """Driver-side REFERENCE packing (per-source, deterministic) written as
    (source, n_packs, total_tokens, total_docs) Parquet — the oracle's
    n_packs source.  The distributed query must reproduce it exactly."""
    import os as _os

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "packed_stats.parquet"),
        lambda: _pack_stats_table(_derived_sequences(sf_dir), max_len),
    )


def q_packing_stats(sf_dir: str) -> pd.DataFrame:
    """Greedy FFD sequence packing into 512-token rows, co-grouped by source
    (deterministic: packing order is doc_id within source, independent of
    block layout).  Oracle cross-checks total_tokens/total_docs straight
    from the derived table (conservation) and n_packs against the
    driver-side reference packing.  ``pack_sequences`` (block-local, no
    shuffle) remains the max-throughput API for when bit-stable layout
    across reruns is not required."""
    ensure_packing_artifact(sf_dir)

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "tokens", "n_tok", "source"]
    )

    # one group per source (bounded key space — the co-group ships each
    # source's rows to one worker; length-bucket pre-split for skewed
    # sources is the documented escape hatch)
    per_source = ds.groupby("source").map_groups(_pack_stats_table, batch_format="pyarrow").to_pandas()
    n_packs = int(per_source["n_packs"].sum())
    tt = int(per_source["total_tokens"].sum())
    td = int(per_source["total_docs"].sum())
    out = pd.DataFrame(
        {
            "n_packs": [n_packs],
            "total_tokens": [tt],
            "total_docs": [td],
            "mean_fill": [_rd(tt / n_packs / 512, 6)],
        }
    )
    return _i64(out, ["n_packs", "total_tokens", "total_docs"])


SQL_PACKING_STATS = f"""
WITH ref AS (SELECT CAST(SUM(n_packs) AS BIGINT) AS n_packs
             FROM read_parquet('{ORACLE_ARTIFACT_DIR}/packed_stats.parquet')),
tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tokens, COUNT(*) AS total_docs
        FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet'))
SELECT n_packs, total_tokens, total_docs,
       ROUND(CAST(total_tokens AS DOUBLE) / n_packs / 512, 6) AS mean_fill
FROM ref, tot
"""


def q_dedup_sequences(sf_dir: str) -> pd.DataFrame:
    """Sequence-level EXACT dedup on the tokens payload: per-source counts of
    distinct token arrays (bit-exact list equality) via vectorized dual-64-bit
    fingerprints + bucketed distinct reduce — the corpus never ships whole
    token arrays, only 24-byte fingerprint rows."""
    from ...functions.tokens import sequence_dedup_stats

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens", "source"], override_num_blocks=8
    )
    return sequence_dedup_stats(ds, group_col="source")


SQL_DEDUP_SEQUENCES = f"""
SELECT source, COUNT(*) AS n_seqs, COUNT(DISTINCT tokens) AS n_unique
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
GROUP BY source ORDER BY source
"""


def q_epoch_shuffle(sf_dir: str) -> pd.DataFrame:
    """Deterministic seeded global shuffle for training epochs: order by
    md5(doc_id ‖ epoch-seed), take the first 100.  Hash-ordering IS the
    shuffle — reproducible across reruns/partitionings, no RNG state, and it
    runs as a distributed top-k (per-block prune to k, tiny final sort), not
    a full all-to-all sort."""
    ds = _t(sf_dir, "documents", ["doc_id"])

    def add_key(t: pa.Table) -> pa.Table:
        key = md5_hex(
            pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":epoch1", "")
        )
        return t.append_column("shuffle_key", key)

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(keyed, ["shuffle_key"], [False], 100).to_pandas()
    return _i64(out, ["doc_id"])


SQL_EPOCH_SHUFFLE = """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':epoch1') AS shuffle_key
FROM documents ORDER BY shuffle_key LIMIT 100
"""


def q_split_counts(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val split: a doc is 'val' iff md5(doc_id ‖ salt)
    sorts below the hex prefix '1a' (0x1a/0x100 ≈ 10.2% — hash-fraction
    splitting, the leakage-safe way to split at 100 TB: membership is a pure
    function of the id, never of partitioning or sampling state)."""
    ds = _t(sf_dir, "documents", ["doc_id", "source"])

    def tag(t: pa.Table) -> pa.Table:
        fp = md5_hex(
            pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":split", "")
        )
        split = pc.if_else(pc.less(fp, "1a"), "val", "train")
        return pa.table({"source": t["source"], "split": split})

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(tagged, ["source", "split"], {}, "n", reduce="driver").to_pandas()
    return _i64(out, ["n"])


SQL_SPLIT_COUNTS = """
SELECT source,
       CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':split') < '1a'
            THEN 'val' ELSE 'train' END AS split,
       COUNT(*) AS n
FROM documents GROUP BY 1, 2
"""


def q_oov_rate(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage: build the top-100 vocab from the corpus itself
    (distributed histogram, deterministic count-desc/token-asc ties),
    broadcast it, then one streaming pass counts in/out-of-vocab tokens per
    source.  The classic two-phase aggregate→broadcast→scan pipeline."""
    from ...functions.tokens import _flat_tokens, token_frequency

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens", "source"])
    vocab = np.sort(token_frequency(ds, topk=100)["token"].to_numpy().astype(np.int32))
    import ray as _ray

    vocab_ref = _ray.put(vocab)

    def partial(t: pa.Table) -> pa.Table:
        v = _ray.get(vocab_ref)
        values, offsets = _flat_tokens(t)
        lens = np.diff(offsets - offsets[0])
        window = values[offsets[0] : offsets[-1]]
        oov = np.ones(len(window), dtype=np.int64)
        idx = np.searchsorted(v, window)
        idx[idx == len(v)] = 0
        oov[v[idx] == window] = 0
        csum = np.concatenate([[0], np.cumsum(oov)])
        starts = (offsets - offsets[0]).astype(np.int64)
        per_row_oov = csum[starts[1:]] - csum[starts[:-1]]
        flat = pa.table(
            {"source": t["source"],
             "n_tokens": pa.array(lens, type=pa.int64()),
             "n_oov": pa.array(per_row_oov, type=pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate([("n_tokens", "sum"), ("n_oov", "sum")])
        return pa.table(
            {"source": g["source"], "n_tokens": g["n_tokens_sum"], "n_oov": g["n_oov_sum"]}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        n_tokens=("n_tokens", "sum"), n_oov=("n_oov", "sum")
    )
    out["oov_rate"] = (out["n_oov"] / out["n_tokens"]).pipe(_rd)
    return _i64(out, ["n_tokens", "n_oov"])


SQL_OOV_RATE = f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
), vocab AS (
  SELECT token FROM tok GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT 100
)
SELECT source, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN token IN (SELECT token FROM vocab) THEN 0 ELSE 1 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM tok GROUP BY source
"""


def q_unigram_surprisal(sf_dir: str) -> pd.DataFrame:
    """Perplexity-style quality signal: corpus unigram LM (distributed
    histogram) → broadcast dense −ln p table → one scan scores every
    sequence; per-source mean surprisal.  Two-phase aggregate → broadcast →
    scan, like ``oov_rate`` but with a real LM score."""
    from ...functions.tokens import surprisal_stats
    from ...schema import VOCAB_SIZE

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens", "source"], override_num_blocks=8
    )
    return surprisal_stats(ds, VOCAB_SIZE, group_col="source")


SQL_UNIGRAM_SURPRISAL = f"""
WITH tok AS (
  SELECT doc_id, source, UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
), cnt AS (
  SELECT token, COUNT(*) AS c FROM tok GROUP BY token
), tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS s FROM cnt
), seq AS (
  SELECT doc_id, source, AVG(-LN(c / (SELECT s FROM tot))) AS surp
  FROM tok JOIN cnt USING (token) GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_seqs, ROUND(AVG(surp), 6) AS avg_surprisal
FROM seq GROUP BY source
"""


def q_chunk_stats(sf_dir: str) -> pd.DataFrame:
    """Context-window chunking: split every sequence into ≤128-token chunks
    (offsets-only rewrite, token buffer shared) and aggregate per-source
    chunk counts FROM THE CHUNK OUTPUT — the oracle recomputes the expected
    counts arithmetically from n_tok, so any kernel slip (lost/duplicated
    token, off-by-one boundary) breaks equality."""
    from ...functions.tokens import chunk_sequences

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "tokens", "source"],
        override_num_blocks=8,
    )
    chunks = chunk_sequences(ds, max_len=128, id_col="doc_id")

    def partial(t: pa.Table) -> pa.Table:
        full = pc.cast(pc.equal(t["n_tok"], 128), pa.int64())
        first = pc.cast(pc.equal(t["chunk_id"], 0), pa.int64())
        flat = pa.table(
            {"source": t["source"], "n_seqs": first, "n_chunks": pa.array([1] * len(t), pa.int64()),
             "n_full": full, "tokens_out": pc.cast(t["n_tok"], pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate(
            [("n_seqs", "sum"), ("n_chunks", "sum"), ("n_full", "sum"), ("tokens_out", "sum")]
        )
        return pa.table(
            {"source": g["source"], "n_seqs": g["n_seqs_sum"], "n_chunks": g["n_chunks_sum"],
             "n_full": g["n_full_sum"], "tokens_out": g["tokens_out_sum"]}
        )

    parts = chunks.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_seqs", "n_chunks", "n_full", "tokens_out"])


SQL_CHUNK_STATS = f"""
SELECT source, COUNT(*) AS n_seqs,
       CAST(SUM(GREATEST((n_tok + 127) // 128, 1)) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tok // 128) AS BIGINT) AS n_full,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_out
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
GROUP BY source
"""


def q_contamination_check(sf_dir: str) -> pd.DataFrame:
    """Benchmark-contamination scan: distinct word-3-grams of the held-out
    subset (doc_id % 29 == 0) are built distributed, unioned on the driver
    (benchmark-sized), broadcast once, then one streaming pass counts each
    remaining doc's overlapping gram occurrences."""
    from ...functions.grams import contamination_counts

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])
    return contamination_counts(ds, bench_mod=29, k=3)


SQL_CONTAMINATION = """
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, source, array_to_string(w[i:i+2], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0
), hits AS (
  SELECT doc_id, source, SUM(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END) AS n_hit
  FROM grams WHERE doc_id % 29 <> 0 GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_hit > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(SUM(n_hit) AS BIGINT) AS total_hits
FROM hits GROUP BY source
"""


def q_cross_doc_dup_windows(sf_dir: str) -> pd.DataFrame:
    """Cross-document exact substring duplication at word-5-gram window
    granularity (Lee et al. ACL 2022 span dedup): per doc, windows whose
    gram occurs in >=2 distinct docs.  One bucketed gram-hash exchange of
    (gram, doc, multiplicity) combiner rows."""
    from ...functions.grams import cross_doc_dup_windows

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return cross_doc_dup_windows(ds, k=5)


SQL_CROSS_DOC_DUP_WINDOWS = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 4)) AS t(i)
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
FROM grams JOIN dup USING (g)
GROUP BY doc_id ORDER BY doc_id
"""


def q_substring_dedup_stats(sf_dir: str) -> pd.DataFrame:
    """Lee et al. span dedup DECISION: cut every occurrence of a >=2x gram
    except the globally first (min doc,pos); per-doc words removed =
    interval-union of cut windows.  Two-pass: collapsed gram counts →
    broadcast dup set → position rows for dup grams only."""
    from ...functions.grams import substring_dedup_cuts

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return substring_dedup_cuts(ds, k=5)


SQL_SUBSTRING_DEDUP_STATS = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 4)) AS t(i)
), ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS cnt
  FROM grams
), cut AS (
  SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rn > 1
)
SELECT doc_id, CAST(COUNT(DISTINCT idx) AS BIGINT) AS n_removed_words
FROM cut, unnest(generate_series(pos, pos + 4)) AS t(idx)
GROUP BY doc_id ORDER BY doc_id
"""


def q_substring_dedup_rewrite(sf_dir: str) -> pd.DataFrame:
    """Span dedup REWRITE: every doc with its cut-window words removed —
    the actual deduplicated corpus, text-level oracle-checked (the SQL
    mirror reassembles each doc from its surviving word positions)."""
    from ...functions.grams import substring_dedup_rewrite

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = substring_dedup_rewrite(ds, k=5).to_pandas()
    out = out[["doc_id", "text_dedup"]].sort_values("doc_id", ignore_index=True)
    return _i64(out, ["doc_id"])


SQL_SUBSTRING_DEDUP_REWRITE = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 4)) AS t(i)
), ranked AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS cnt
  FROM grams
), cov AS (
  SELECT DISTINCT doc_id, idx
  FROM ranked, unnest(generate_series(pos, pos + 4)) AS t(idx)
  WHERE cnt >= 2 AND rn > 1
), toks AS (
  SELECT doc_id, i, w[i] AS word FROM words, unnest(generate_series(1, len(w))) AS t(i)
), kept AS (
  SELECT k.doc_id, string_agg(k.word, ' ' ORDER BY k.i) AS text_dedup
  FROM toks k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.idx = k.i
  WHERE c.idx IS NULL
  GROUP BY k.doc_id
)
SELECT d.doc_id, COALESCE(kept.text_dedup, '') AS text_dedup
FROM documents d LEFT JOIN kept ON kept.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def q_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Intra-document repetition detector: per-source total vs DISTINCT
    3-gram counts (zero-shuffle — per-doc stats are block-local, only
    per-source partials reduce)."""
    from ...functions.grams import repetition_stats

    ds = _t(sf_dir, "documents", ["doc_id", "text", "source"])
    return repetition_stats(ds, k=3)


SQL_REPETITION = """
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, source, array_to_string(w[i:i+2], ' ') AS g
  FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
), per_doc AS (
  SELECT doc_id, source, COUNT(*) AS tot, COUNT(DISTINCT g) AS dst
  FROM grams GROUP BY doc_id, source
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN tot > dst THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       CAST(SUM(tot) AS BIGINT) AS total_grams, CAST(SUM(dst) AS BIGINT) AS distinct_grams
FROM per_doc GROUP BY source
"""


def q_domain_mix_sample(sf_dir: str) -> pd.DataFrame:
    """Mixture resampling: each source carries a target keep-rate
    (deterministic {.25,.5,.75,1.0} from the source id); membership is a
    pure hash function of doc_id (md5-fraction, like ``split_counts``) so
    the sample is reproducible across runs/partitionings and never requires
    a shuffle — one streaming tag+count pass."""
    ds = _t(sf_dir, "documents", ["doc_id", "source"])
    thresholds = pa.array(["40000000", "80000000", "c0000000", None], type=pa.string())

    def tag(t: pa.Table) -> pa.Table:
        # % 4 as bit_wise_and(x, 3): pyarrow.compute has no mod kernel
        m = pc.cast(
            pc.bit_wise_and(pc.cast(pc.utf8_slice_codeunits(t["source"], 3, 10), pa.int64()), 3),
            pa.int32(),
        )
        thr = pc.take(thresholds, m)
        h8 = pc.utf8_slice_codeunits(
            md5_hex(pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":mix", "")),
            0, 8,
        )
        keep = pc.fill_null(pc.less(h8, thr), True)  # rate 1.0 → keep all
        flat = pa.table(
            {"source": t["source"],
             "n_docs": pa.array(np.ones(len(t), dtype=np.int64)),
             "n_kept": pc.cast(keep, pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate([("n_docs", "sum"), ("n_kept", "sum")])
        return pa.table(
            {"source": g["source"], "n_docs": g["n_docs_sum"], "n_kept": g["n_kept_sum"]}
        )

    parts = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "n_kept"])


SQL_DOMAIN_MIX = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN CAST(substr(source, 4) AS INT) % 4 = 3 THEN 1
                WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) <
                     CASE CAST(substr(source, 4) AS INT) % 4
                          WHEN 0 THEN '40000000' WHEN 1 THEN '80000000'
                          ELSE 'c0000000' END
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents GROUP BY source
"""


def q_temperature_resample(sf_dir: str) -> pd.DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-LLM recipe:
    sample source s with probability ∝ share^(1/T); T=0.5 → weight =
    count², integer-exact): per-source keep-rates derived from OBSERVED
    counts (one tiny grouped count), then one streaming md5-fraction tag
    pass — membership compares 8 hex digits against a per-source integer
    threshold, so the sample is reproducible and float-boundary-free.
    Down-weights oversampled sources toward the tempered share; rate ≥ 1
    keeps all (no repetition here)."""
    docs = _t(sf_dir, "documents", ["doc_id", "source"])
    sizes = grouped_sums(docs.select_columns(["source"]), ["source"], {}, "n").to_pandas()
    sizes = sizes.sort_values("source", ignore_index=True)
    n = sizes["n"].to_numpy().astype(np.float64)
    N, W = n.sum(), (n * n).sum()
    rate = n * n / W * N / n  # left-assoc, mirrored verbatim in SQL
    thr = np.floor(np.minimum(1.0, rate) * 4294967296.0)
    src_list = pa.array(sizes["source"].tolist(), pa.string())
    thr_list = pa.array(
        [format(int(x), "08x") if x < 4294967296.0 else None for x in thr], pa.string()
    )

    def tag(t: pa.Table) -> pa.Table:
        m = pc.index_in(t["source"], src_list)
        th = pc.take(thr_list, m)
        h8 = pc.utf8_slice_codeunits(
            md5_hex(pc.binary_join_element_wise(pc.cast(t["doc_id"], pa.string()), ":temp", "")),
            0, 8,
        )
        keep = pc.fill_null(pc.less(h8, th), True)  # rate >= 1 → keep all
        flat = pa.table(
            {"source": t["source"],
             "n_docs": pa.array(np.ones(len(t), dtype=np.int64)),
             "n_kept": pc.cast(keep, pa.int64())}
        )
        g = flat.group_by(["source"]).aggregate([("n_docs", "sum"), ("n_kept", "sum")])
        return pa.table(
            {"source": g["source"], "n_docs": g["n_docs_sum"], "n_kept": g["n_kept_sum"]}
        )

    parts = docs.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "n_kept"])


SQL_TEMPERATURE_RESAMPLE = """
WITH c AS (
  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY source
), tot AS (
  SELECT SUM(n) AS nt, SUM(n * n) AS wt FROM c
), th AS (
  SELECT source,
         CAST(FLOOR(LEAST(1.0, n * n / wt * nt / n) * 4294967296) AS BIGINT) AS thr
  FROM c, tot
)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN t.thr >= 4294967296 THEN 1
                     WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':temp'), 1, 8)
                          < printf('%08x', t.thr) THEN 1
                     ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN th t USING (source)
GROUP BY d.source ORDER BY d.source
"""


def q_embedding_centroids(sf_dir: str) -> pd.DataFrame:
    """Vector AGGREGATE over the embedding column: per-label centroid
    (dimension-wise mean).  Per-batch partials are (label, sum-vector, n)
    — one ``np.add.at`` scatter per batch over the zero-copy matrix view —
    and only |labels|·d floats ever reduce; rows never shuffle."""
    ds = _t(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sums": pa.array([], pa.list_(pa.float64()))})
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        labels = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=np.int64)
        uniq, codes = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, codes, mat)
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"label": pa.array(uniq), "n": pa.array(n),
             "sums": pa.array(list(sums), type=pa.list_(pa.float64()))}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    rows = []
    for label, g in parts.groupby("label"):
        n = int(g["n"].sum())
        s = np.sum(np.stack([np.asarray(x) for x in g["sums"]]), axis=0)
        cent = _rd(s / n, 6)
        rows.extend(
            {"label": int(label), "dim": d, "n": n, "centroid": float(v)}
            for d, v in enumerate(cent)
        )
    return pd.DataFrame(rows).sort_values(["label", "dim"], ignore_index=True)


SQL_EMBEDDING_CENTROIDS = """
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), ex AS (
  SELECT label, i - 1 AS dim, emb[i] AS v
  FROM e, unnest(generate_series(1, len(emb))) AS t(i)
)
SELECT CAST(label AS BIGINT) AS label, dim, COUNT(*) AS n, ROUND(AVG(v), 6) AS centroid
FROM ex GROUP BY label, dim
"""


def q_embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """SECOND-order vector aggregate: the d×d sample covariance of the
    embedding column from mergeable moment partials — each batch emits one
    (n, Σx, ΣxxT) row (one BLAS gemm per batch, d² floats, rows never
    shuffle); the driver folds the handful of partials and closes the form
    ``(G − s·sT/n)/(n−1)``, the same algebra as SQL ``covar_samp``.  This is
    the PCA/whitening front half at corpus scale — only O(d²) state moves."""
    ds = _t(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "g": pa.array([], pa.list_(pa.float64()))})
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        return pa.table(
            {"n": pa.array([len(t)]),
             "s": pa.array([mat.sum(axis=0)], type=pa.list_(pa.float64())),
             "g": pa.array([(mat.T @ mat).ravel()], type=pa.list_(pa.float64()))}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack([np.asarray(x) for x in parts["s"]]), axis=0)
    g = np.sum(np.stack([np.asarray(x) for x in parts["g"]]), axis=0)
    d = len(s)
    cov = (g.reshape(d, d) - np.outer(s, s) / n) / (n - 1)
    ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij")
    out = pd.DataFrame(
        {"i": ii.ravel(), "j": jj.ravel(), "cov": _rd(cov.ravel(), 8)}
    )
    return _i64(out, ["i", "j"])


SQL_EMBEDDING_COVARIANCE = """
WITH x AS (
  SELECT vec_id, UNNEST(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, ROUND(covar_samp(a.v, b.v), 8) AS cov
FROM x a JOIN x b ON a.vec_id = b.vec_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join through Ray's native hash-partitioned ``Dataset.join``
    (``relational.py::hash_join`` how=left_outer): every customer row
    survives, unmatched order side is NULL → 0. The fact side is
    pre-aggregated to per-custkey counts BEFORE the join (house rule:
    combiner before shuffle), so the join's right input is |custkeys|
    rows, not |orders| — ``COUNT(o_orderkey)`` over a left join equals
    ``COALESCE(pre_count, 0)`` because o_orderkey is never null."""
    from ...functions.relational import hash_join

    cust = _t(sf_dir, "customer", ["c_custkey"])
    orders = _t(sf_dir, "orders", ["o_custkey"])
    per_cust = grouped_sums(orders, ["o_custkey"], {}, "__n")
    j = hash_join(cust, per_cust, on="c_custkey", right_on="o_custkey", how="left_outer")
    out = j.map_batches(
        lambda t: pa.table(
            {"c_custkey": t["c_custkey"],
             "n_orders": pc.fill_null(pc.cast(t["__n"], pa.int64()), 0)}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    return _i64(out.sort_values("c_custkey", ignore_index=True), ["c_custkey", "n_orders"])


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY 1 ORDER BY 1
"""


def q_dominant_user_per_type(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE (argmax-count row per group, deterministic tie-break):
    distributed pair counts → ``grouped_topk`` k=1 — the candidate prune
    means only per-batch leaders ever reach the exchange."""
    from ...functions.relational import grouped_topk

    ds = _t(sf_dir, "events", ["event_type", "user_id"])
    pairs = grouped_sums(ds, ["event_type", "user_id"], {}, "n")
    top = grouped_topk(pairs, ["event_type"], ["n", "user_id"], [True, False], 1).to_pandas()
    out = top.sort_values("event_type", ignore_index=True)[["event_type", "user_id", "n"]]
    return _i64(out, ["user_id", "n"])


SQL_DOMINANT_USER_PER_TYPE = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rn FROM c
)
SELECT event_type, user_id, n FROM r WHERE rn = 1 ORDER BY 1
"""


def q_nation_hhi(sf_dir: str) -> pd.DataFrame:
    """Revenue concentration per nation (Herfindahl-Hirschman index over
    customer shares): broadcast dim hop → distributed (nation, customer)
    revenue reduce → tiny per-nation moment fold (Σr², Σr) — shares are
    never materialized row-wise."""
    from ...functions.relational import auto_join

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")
    cr = grouped_sums(j, ["c_nationkey", "o_custkey"], {"r": "o_totalprice"})

    def moments(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": t["c_nationkey"].to_pandas(), "r": t["r"].to_pandas()})
        g = df.groupby("k")["r"]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"k": g.sum().index, "sr": g.sum().to_numpy(),
                 "sr2": g.apply(lambda x: float((x.to_numpy() ** 2).sum())).to_numpy(),
                 "nc": g.size().to_numpy()}
            ),
            preserve_index=False,
        )

    m = grouped_sums(
        cr.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True),
        ["k"], {"sr": "sr", "sr2": "sr2", "nc": "nc"}, reduce="driver"
    ).to_pandas()
    m["hhi"] = (m["sr2"] / (m["sr"] * m["sr"])).pipe(_rd, 9)
    out = m.rename(columns={"k": "c_nationkey", "nc": "n_customers"})
    out = out[["c_nationkey", "hhi", "n_customers"]].sort_values("c_nationkey", ignore_index=True)
    return _i64(out, ["c_nationkey", "n_customers"])


SQL_NATION_HHI = """
WITH cr AS (
  SELECT c_nationkey, o_custkey, SUM(o_totalprice) AS r
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT c_nationkey, ROUND(SUM(r * r) / (SUM(r) * SUM(r)), 9) AS hhi,
       COUNT(*) AS n_customers
FROM cr GROUP BY 1 ORDER BY 1
"""


def q_user_paths(sf_dir: str) -> pd.DataFrame:
    """Ordered LISTAGG: each user's first-8 event-type path joined with
    '>' — the collect-ordered-per-group shape.  One hash exchange on
    user_id; within the bucket a single sort + per-user head(8) bounds
    every group before strings are assembled, so no unbounded row
    gathering."""
    from ...functions.relational import bucketed_group_reduce

    ds = _t(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        head = df.groupby("user_id", sort=False).head(8)
        out = head.groupby("user_id", sort=False)["event_type"].agg(">".join)
        return out.reset_index().rename(columns={"event_type": "path"})

    out = bucketed_group_reduce(ds, ["user_id"], per_bucket).to_pandas()
    return _i64(out.sort_values("user_id", ignore_index=True), ["user_id"])


SQL_USER_PATHS = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
FROM r WHERE rn <= 8 GROUP BY 1 ORDER BY 1
"""


def q_type_hour_chi2(sf_dir: str) -> pd.DataFrame:
    """χ² independence test of event_type × hour-of-day: distributed
    contingency counts (the only corpus-sized pass), then the full-grid
    statistic — INCLUDING zero-observed cells — folds on the driver from
    the |types|×24 matrix."""
    ds = _t(sf_dir, "events", ["event_type", "ts"])

    def bucketize(t: pa.Table) -> pa.Table:
        hr = pc.cast(
            pc.divide(pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()), 3_600_000_000),
            pa.int64(),
        )
        return pa.table({"event_type": t["event_type"], "hr": pc.subtract(hr, pc.multiply(pc.divide(hr, 24), 24))})

    counts = grouped_sums(
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hr"], {}, "o",
    ).to_pandas()
    # grid spans observed rows × observed columns (empty rows/cols carry no
    # χ² mass and would 0/0 the expected counts — both sides drop them)
    grid = counts.pivot_table(index="event_type", columns="hr", values="o", fill_value=0)
    o = grid.to_numpy(dtype="float64")
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = float(((o - e) ** 2 / e).sum())
    return pd.DataFrame(
        {"chi2": [_rd(chi2, 6)],
         "n_cells": np.array([o.size], dtype="int64"),
         "dof": np.array([(o.shape[0] - 1) * (o.shape[1] - 1)], dtype="int64")}
    )


SQL_TYPE_HOUR_CHI2 = """
WITH o AS (
  SELECT event_type, hour(ts) AS hr, COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT event_type, SUM(o) AS r FROM o GROUP BY 1),
ct AS (SELECT hr, SUM(o) AS c FROM o GROUP BY 1),
tot AS (SELECT SUM(o) AS n FROM o),
cells AS (
  SELECT rt.r * ct.c / (SELECT n FROM tot) AS e, COALESCE(o.o, 0) AS obs
  FROM rt CROSS JOIN ct
  LEFT JOIN o ON o.event_type = rt.event_type AND o.hr = ct.hr
)
SELECT ROUND(SUM((obs - e) * (obs - e) / e), 6) AS chi2,
       COUNT(*) AS n_cells,
       ((SELECT COUNT(*) FROM rt) - 1) * ((SELECT COUNT(*) FROM ct) - 1) AS dof
FROM cells
"""


ANALYZE_COLS = ["event_id", "user_id", "value"]


def q_analyze_events(sf_dir: str) -> pd.DataFrame:
    """Catalog statistics (ANALYZE) over the events table —
    ``explore.py::analyze_columns``: one streaming pass for
    n/nulls/min/max of all columns, exact NDV per column via unique
    partials + bucketed distinct reduce."""
    from ...functions.explore import analyze_columns

    ds = _t(sf_dir, "events", ANALYZE_COLS)
    return analyze_columns(ds, ANALYZE_COLS)


SQL_ANALYZE_EVENTS = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls, COUNT(DISTINCT {c}) AS n_distinct,
       ROUND(CAST(MIN({c}) AS DOUBLE), 6) AS min_v,
       ROUND(CAST(MAX({c}) AS DOUBLE), 6) AS max_v
FROM events"""
    for c in ["event_id", "user_id", "value"]
)


def q_source_kl(sf_dir: str) -> pd.DataFrame:
    """Domain-drift detector: KL(P(token|source) ‖ P(token)) per source over
    the tokens payload.  Per-batch (source, token) count partials →
    distributed bucketed reduce → the ≤|sources|·|vocab| count rows (vocab
    is bounded, not corpus-sized) finish on the driver."""
    st = _source_token_counts(sf_dir)
    ns = st.groupby("source")["c"].transform("sum")
    ct = st.groupby("token")["c"].transform("sum")
    n = float(st["c"].sum())
    p_ts = st["c"] / ns
    term = p_ts * np.log(p_ts / (ct / n))
    out = (
        pd.DataFrame({"source": st["source"], "term": term})
        .groupby("source", as_index=False)["term"].sum()
        .rename(columns={"term": "kl"})
    )
    out["kl"] = out["kl"].pipe(_rd)
    return out.sort_values("source", ignore_index=True)


SQL_SOURCE_KL = f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
), st AS (
  SELECT source, token, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY source, token
), s AS (
  SELECT source, SUM(c) AS ns FROM st GROUP BY source
), t AS (
  SELECT token, SUM(c) AS ct FROM st GROUP BY token
), tot AS (
  SELECT SUM(c) AS n FROM st
)
SELECT st.source, ROUND(SUM((c / ns) * LN((c / ns) / (ct / (SELECT n FROM tot)))), 6) AS kl
FROM st JOIN s USING (source) JOIN t USING (token)
GROUP BY st.source
"""


def _source_token_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed (source, token, c) reduce shared by source_kl/tfidf —
    bounded by |sources|·|vocab| rows, never corpus-sized."""
    from ...functions.relational import bucketed_group_reduce
    from ...functions.tokens import _flat_tokens

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens", "source"], override_num_blocks=8
    )

    def partial(t: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0] : offsets[-1]].astype(np.int64)
        lens = np.diff(offsets - offsets[0])
        src = pc.take(
            t["source"].combine_chunks() if isinstance(t["source"], pa.ChunkedArray) else t["source"],
            pa.array(np.repeat(np.arange(len(t)), lens), type=pa.int64()),
        )
        flat = pa.table(
            {"source": src, "token": pa.array(window),
             "c": pa.array(np.ones(len(window), np.int64))}
        )
        g = flat.group_by(["source", "token"]).aggregate([("c", "sum")])
        return pa.table({"source": g["source"], "token": g["token"], "c": g["c_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_reduce(
        partials, ["source", "token"],
        lambda df: df.groupby(["source", "token"], as_index=False)["c"].sum(),
    ).to_pandas()


def q_tfidf_topk(sf_dir: str) -> pd.DataFrame:
    """Distinctive tokens per source: tf-idf = (c/ns)·ln(S/df) with df =
    #sources containing the token; top-3 per source, ties broken by token id.
    Same distributed (source, token) reduce as ``source_kl``; the ranking
    runs on the bounded |sources|·|vocab| stats table."""
    st = _source_token_counts(sf_dir)
    ns = st.groupby("source")["c"].transform("sum")
    df_t = st.groupby("token")["source"].transform("size")
    S = st["source"].nunique()
    st = st.assign(tfidf=_rd((st["c"] / ns) * np.log(S / df_t), 6))
    out = (
        st.sort_values(["source", "tfidf", "token"], ascending=[True, False, True])
        .groupby("source", sort=False)
        .head(3)
        .loc[:, ["source", "token", "tfidf"]]
        .reset_index(drop=True)
    )
    return _i64(out, ["token"])


SQL_TFIDF_TOPK = f"""
WITH tok AS (
  SELECT source, UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
), st AS (
  SELECT source, token, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY source, token
), s AS (
  SELECT source, SUM(c) AS ns FROM st GROUP BY source
), d AS (
  SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM st GROUP BY token
), n AS (
  SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) AS S FROM st
), scored AS (
  SELECT st.source, st.token,
         ROUND((c / ns) * LN((SELECT S FROM n) / df), 6) AS tfidf
  FROM st JOIN s USING (source) JOIN d USING (token)
)
SELECT source, token, tfidf FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY tfidf DESC, token) AS rn
  FROM scored
) WHERE rn <= 3
"""


def q_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """EXACT top-20 tokens via the two-pass heavy-hitter pattern (pigeonhole
    candidate pass → broadcast exact-count verify) — zero shuffles, vs
    ``token_frequency_topk``'s grouped exchange.  Same oracle shape."""
    from ...functions.tokens import heavy_hitters_topk

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8
    )
    return heavy_hitters_topk(ds, k=20, capacity=256)


SQL_HEAVY_HITTERS = f"""
WITH tok AS (
  SELECT UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
)
SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS count
FROM tok GROUP BY token ORDER BY count DESC, token LIMIT 20
"""


def q_cms_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """EXACT top-25 tokens via Count-Min-sketch candidate pruning: pigeonhole
    candidate pass + mergeable 256 KB CMS partials in ONE scan → tree merge
    → ε-margin prune over candidate ids (survivor set is O(k), independent
    of block count — the 10^12-row-safe variant of ``heavy_hitters``) →
    broadcast exact recount.  Exact result, same oracle shape."""
    from ...functions.tokens import cms_heavy_hitters

    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8
    )
    return cms_heavy_hitters(ds, k=25, capacity=256)


SQL_CMS_HEAVY_HITTERS = f"""
WITH tok AS (
  SELECT UNNEST(tokens) AS token
  FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
)
SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS count
FROM tok GROUP BY token ORDER BY count DESC, token LIMIT 25
"""


def q_curriculum_order(sf_dir: str) -> pd.DataFrame:
    """Curriculum ordering: GLOBAL distributed sort (``Dataset.sort`` — the
    real range-partitioned exchange, not the top-k prune) of the corpus by
    difficulty proxy (n_tok asc, doc_id tiebreak); first 50 rows of the
    sorted stream.  At scale the sorted dataset would stream straight into
    a partitioned writer; the limit keeps the oracle comparable."""
    ds = rd.read_parquet(
        ensure_derived_parquet(sf_dir), columns=["doc_id", "n_tok", "source"],
        override_num_blocks=8,
    )
    out = ds.sort(["n_tok", "doc_id"]).limit(50).to_pandas()
    return _i64(out, ["n_tok"])


SQL_CURRICULUM_ORDER = f"""
SELECT doc_id, n_tok, source
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet')
ORDER BY n_tok, doc_id LIMIT 50
"""


def q_order_price_deciles(sf_dir: str) -> pd.DataFrame:
    """SQL ``NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)`` — exact
    distributed global row-number (``functions/rank.py``: sampled range
    buckets + prefix-offset broadcast, the MPP window construction Ray Data
    lacks natively), then the NTILE formula per batch and a tiny grouped
    reduce.  The only all-to-all moves the two projected columns once."""
    from ...functions.rank import global_row_number, ntile_of

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    ranked, total = global_row_number(ds, "o_totalprice", ["o_orderkey"])

    def add_decile(t: pa.Table) -> pa.Table:
        dec = ntile_of(t["rn"].to_numpy(zero_copy_only=False), total, 10)
        return pa.table({"decile": pa.array(dec), "o_totalprice": t["o_totalprice"]})

    dec = ranked.map_batches(add_decile, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sums(dec, ["decile"], {"sum_price": "o_totalprice"}, "n", reduce="driver").to_pandas()
    out["avg_price"] = (out["sum_price"] / out["n"]).pipe(_rd, 2)
    out = out.drop(columns=["sum_price"])
    return _i64(out, ["decile", "n"])


SQL_ORDER_PRICE_DECILES = """
WITH r AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
FROM r GROUP BY decile
"""


def q_revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(r_name, n_name): ONE distributed groupby at the
    finest level (region, nation) — the coarser levels are derived by
    re-summing that already-tiny aggregate on the driver (the partials are
    reused upward, never a second scan).  NULL rollup slots materialized as
    'ALL' for oracle parity."""
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    nr = nat.to_pandas().merge(reg.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")
    dim = pa.Table.from_pandas(
        nr[["n_nationkey", "n_name", "r_name"]].rename(columns={"n_nationkey": "c_nationkey"}),
        preserve_index=False,
    )
    cust = broadcast_join(
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]), dim, "c_nationkey"
    ).select_columns(["c_custkey", "n_name", "r_name"])
    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    from ...functions.relational import auto_join

    joined = auto_join(orders, cust, on="o_custkey", right_on="c_custkey")
    finest = grouped_sums(
        joined, ["r_name", "n_name"], {"revenue": "o_totalprice"}, "n_orders", reduce="driver"
    ).to_pandas()
    lvl1 = finest.groupby("r_name", as_index=False)[["revenue", "n_orders"]].sum()
    lvl1["n_name"] = "ALL"
    lvl0 = pd.DataFrame(
        {"r_name": ["ALL"], "n_name": ["ALL"],
         "revenue": [finest["revenue"].sum()], "n_orders": [finest["n_orders"].sum()]}
    )
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)[
        ["r_name", "n_name", "revenue", "n_orders"]
    ]
    out["revenue"] = out["revenue"].pipe(_rd, 2)
    return _i64(out, ["n_orders"])


SQL_REVENUE_ROLLUP = """
SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
       ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot_hourly(sf_dir: str) -> pd.DataFrame:
    """Pivot/crosstab: hour-of-day × event_type count matrix, wide format.
    The distributed part is the (hod, type) grouped count with per-batch
    combiner; the wide reshape runs on the ≤ 24×|types| aggregate."""
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def add_hod(t: pa.Table) -> pa.Table:
        return pa.table(
            {"hod": pc.cast(pc.hour(t["ts"]), pa.int64()), "event_type": t["event_type"]}
        )

    ds = ds.map_batches(add_hod, batch_format="pyarrow", zero_copy_batch=True)
    long = grouped_sums(ds, ["hod", "event_type"], {}, "n", reduce="driver").to_pandas()
    wide = long.pivot_table(index="hod", columns="event_type", values="n", fill_value=0)
    wide = wide.reindex(columns=EVENT_TYPES, fill_value=0).reset_index()
    wide.columns = ["hod"] + [f"n_{t}" for t in EVENT_TYPES]
    return _i64(wide, list(wide.columns))


SQL_EVENTS_PIVOT_HOURLY = """
SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY 1
"""


def q_lang_entropy_per_source(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy of the language mix per source (corpus-diversity
    signal): distributed (source, lang) count with combiner, entropy folded
    on the ≤ |sources|×|langs| aggregate."""
    ds = _t(sf_dir, "documents", ["source", "lang"])
    counts = grouped_sums(ds, ["source", "lang"], {}, "n", reduce="driver").to_pandas()
    tot = counts.groupby("source")["n"].transform("sum")
    p = counts["n"] / tot
    counts["h"] = -p * np.log(p)
    out = counts.groupby("source", as_index=False).agg(n_docs=("n", "sum"), entropy=("h", "sum"))
    out["entropy"] = out["entropy"].pipe(_rd)
    return _i64(out, ["n_docs"])


SQL_LANG_ENTROPY_PER_SOURCE = """
WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
     t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY 1)
SELECT c.source AS source, CAST(MAX(t.tot) AS BIGINT) AS n_docs,
       ROUND(-SUM((c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot)), 6) AS entropy
FROM c JOIN t ON c.source = t.source GROUP BY 1
"""


def ensure_token_edges_parquet(sf_dir: str) -> str:
    """Materialize the token-transition graph (bigram counts as weighted
    edges src→dst) once per sf — Ray reads it distributed, the DuckDB
    PageRank oracle reads the same file."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.tokens import _bigram_partial

        part = _bigram_partial(_derived_sequences(sf_dir)).to_pandas()
        agg = part.groupby("bigram", as_index=False)["count"].sum()
        key = agg["bigram"].to_numpy()
        return pa.table(
            {
                "src": pa.array((key >> 32).astype("int64")),
                "dst": pa.array((key & 0xFFFFFFFF).astype("int64")),
                "w": pa.array(agg["count"].to_numpy().astype("float64")),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "token_edges.parquet"), build)


PAGERANK_ITERS = 10
PAGERANK_DAMPING = 0.85


def q_token_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the token-transition graph (10 fixed power iterations,
    d=0.85, uniform dangling redistribution) — ``graph.py::pagerank``: the
    edge Dataset stays distributed and is re-scanned per iteration; only the
    |V|-bounded rank vector crosses the driver.  The oracle is the SAME
    iteration unrolled as a generated 10-step SQL CTE chain."""
    from ...functions.graph import pagerank

    ds = rd.read_parquet(ensure_token_edges_parquet(sf_dir), override_num_blocks=4)
    pr = pagerank(ds, iters=PAGERANK_ITERS, damping=PAGERANK_DAMPING)
    pr["rank"] = pr["rank"].pipe(_rd, 9)
    out = pr.sort_values(["rank", "node"], ascending=[False, True]).head(20)
    out = out.rename(columns={"node": "token"}).reset_index(drop=True)
    return _i64(out, ["token"])


def _pagerank_sql(path: str, iters: int, d: float, k: int) -> str:
    """Unroll the power iteration as a CTE chain mirroring pagerank()'s
    float expression term for term (same literal, same op order).

    Every r{{i}} is referenced twice by iteration i+1 (dangling mass + the
    contrib join), so each CTE MUST be ``AS MATERIALIZED`` — inlined CTEs
    make the plan double per iteration (2^iters blowup)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM read_parquet('{path}'))",
        "ow AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM e GROUP BY 1)",
        "nodes AS MATERIALIZED (SELECT node FROM (SELECT src AS node FROM e UNION SELECT dst AS node FROM e) GROUP BY 1)",
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM nodes)",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT cnt FROM nn) AS rank FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT COALESCE(SUM(r{i}.rank), 0.0) AS m FROM r{i} "
            f"LEFT JOIN ow ON r{i}.node = ow.src WHERE ow.src IS NULL)"
        )
        parts.append(
            f"""r{i + 1} AS MATERIALIZED (
  SELECT nodes.node,
         (1.0 - {d}) / (SELECT cnt FROM nn)
         + {d} * (COALESCE(c.contrib, 0.0) + (SELECT m FROM d{i}) / (SELECT cnt FROM nn)) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, SUM(e.w * (r{i}.rank / ow.ow)) AS contrib
    FROM e JOIN ow ON e.src = ow.src JOIN r{i} ON r{i}.node = e.src GROUP BY 1
  ) c ON nodes.node = c.node)"""
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT node AS token, ROUND(rank, 9) AS rank FROM r{iters} "
        f"ORDER BY ROUND(rank, 9) DESC, token LIMIT {k}"
    )


SQL_TOKEN_PAGERANK = _pagerank_sql(
    f"{ORACLE_ARTIFACT_DIR}/token_edges.parquet", PAGERANK_ITERS, PAGERANK_DAMPING, 20
)


BFS_MAX_HOPS = 6


def q_token_bfs(sf_dir: str) -> pd.DataFrame:
    """Directed BFS hop levels over the token-transition graph from its
    minimum token id — ``graph.py::bfs_levels``: one filtered scan of the
    distributed edge set per hop, |V|-bounded frontier broadcast.  Oracle:
    recursive CTE with UNION dedup (path-free state, Σ work = |E|·hops)."""
    from ...functions.graph import bfs_levels

    path = ensure_token_edges_parquet(sf_dir)
    src_min = int(pq.read_table(path, columns=["src"])["src"].to_pandas().min())
    ds = rd.read_parquet(path, override_num_blocks=4)
    out = bfs_levels(ds, src_min, max_hops=BFS_MAX_HOPS)
    return out.rename(columns={"node": "token"})


