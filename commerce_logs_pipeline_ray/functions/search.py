"""Corpus keyword search: distributed inverted-index build + conjunctive
term search over the documents table.

Index layout is the classic sharded posting-list shape: the build stage
tokenizes per batch (RE2 kernels on Arrow buffers, no Python per row),
emits (term, doc_id, tf) postings, and a grouped exchange on the term
co-locates each term's postings — at scale the index Dataset is written as
term-hash-partitioned Parquet and queried by pruning partitions.

Search is a scan-side semi-join: broadcast the query terms, keep matching
postings, per-doc grouped reduce with a HAVING count == |terms| conjunctive
gate, deterministic top-k.  (The reference has no text search; this backs
the training-data corpus-search operators, SURVEY.md §2 extension.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from .rounding import round_like_duckdb as _rd

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize_terms(t: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-batch (id, term, tf) postings — vectorized: utf8_lower +
    split_pattern_regex produce one list array, the flatten carries parent
    doc ids via list_parent_indices, tf via one pandas groupby over the
    flattened frame (thousands of rows, not per-row Python)."""
    words = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), TOKEN_SPLIT)
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(words)
    flat = pa.table(
        {
            id_col: pc.take(t[id_col], parents),
            "term": words.flatten() if isinstance(words, pa.ListArray) else words.combine_chunks().flatten(),
        }
    )
    flat = flat.filter(pc.not_equal(flat["term"], ""))
    df = flat.to_pandas().groupby([id_col, "term"], as_index=False).size()
    out = pa.Table.from_pandas(df.rename(columns={"size": "tf"}), preserve_index=False)
    return out.set_column(out.schema.get_field_index("tf"), "tf", pc.cast(out["tf"], pa.int64()))


def postings(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    return ds.map_batches(
        lambda t: tokenize_terms(t, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def index_term_stats(post: Dataset, k: int = 20) -> pd.DataFrame:
    """The index-build reduce observed as per-term stats: document frequency
    and total term frequency, top-k by df — one grouped exchange on the
    term, count+sum folded inside it."""
    from .relational import grouped_sums, topk

    agg = grouped_sums(post, ["term"], {"total_tf": "tf"}, "df")
    out = topk(agg, ["df", "term"], [True, False], k).to_pandas()
    return out[["term", "df", "total_tf"]].astype({"df": "int64", "total_tf": "int64"})


def conjunctive_search(
    post: Dataset, terms: list[str], k: int = 20, id_col: str = "doc_id"
) -> pd.DataFrame:
    """Docs containing ALL query terms, scored by summed tf: broadcast term
    filter at the scan, per-doc reduce, HAVING n_terms == len(terms)."""
    from .relational import grouped_sums, topk

    want = pa.array(terms)
    hits = post.map_batches(
        lambda t: t.filter(pc.is_in(t["term"], value_set=want)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    per_doc = grouped_sums(hits, [id_col], {"score": "tf"}, "n_terms")
    full = per_doc.filter(expr=f"n_terms == {len(terms)}")
    out = topk(full, ["score", id_col], [True, False], k).to_pandas()
    return out[[id_col, "score"]].astype({"score": "int64"})


def bm25_postings(
    ds: Dataset, terms: list[str], text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """One tokenize pass emitting query-term candidate postings
    ``(doc_id, term, tf, doclen)`` plus ONE per-batch corpus-stats sentinel
    row (``doc_id = -1, tf = n_docs_in_batch, doclen = sum_len_in_batch``) —
    the global N / avgdl fold rides the same scan instead of re-tokenizing
    the corpus.  Docs whose text yields zero tokens carry no length mass
    (mirrors the SQL oracle's per-doc-length CTE)."""

    want = pa.array(terms)

    def emit(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), TOKEN_SPLIT)
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        parents = pc.list_parent_indices(words)
        flat_terms = words.flatten() if isinstance(words, pa.ListArray) else words.combine_chunks().flatten()
        keep = pc.not_equal(flat_terms, "")
        parents_np = parents.to_numpy(zero_copy_only=False)[keep.to_numpy(zero_copy_only=False)]
        # per-doc token counts (doclen) over ALL kept tokens
        doclen = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(doclen, parents_np, 1)
        flat = pa.table({id_col: pc.take(t[id_col], pa.array(parents_np)), "term": flat_terms.filter(keep)})
        cand = flat.filter(pc.is_in(flat["term"], value_set=want))
        df = cand.to_pandas().groupby([id_col, "term"], as_index=False).size()
        ids = df[id_col].to_numpy()
        id_np = t[id_col].to_numpy(zero_copy_only=False)
        lens = doclen[np.searchsorted(id_np, ids)] if len(ids) and np.all(np.diff(id_np) > 0) else (
            pd.Series(doclen, index=id_np).loc[ids].to_numpy() if len(ids) else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(np.concatenate([ids, [-1]]), type=pa.int64()),
                "term": pa.array(list(df["term"]) + [""]),
                "tf": pa.array(np.concatenate([df["size"].to_numpy(), [int((doclen > 0).sum())]]), type=pa.int64()),
                "doclen": pa.array(np.concatenate([lens, [int(doclen.sum())]]), type=pa.int64()),
            }
        )

    return ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def bm25_search(
    ds: Dataset,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    post: Dataset | None = None,
) -> pd.DataFrame:
    """Disjunctive BM25 top-k (Robertson/Sparck-Jones idf in the Lucene
    ``ln(1 + (N-df+.5)/(df+.5))`` form): candidate postings + corpus stats
    from ONE scan (:func:`bm25_postings`, materialized — bounded by the
    query terms' posting lists, the standard search-engine working set),
    df/N/avgdl folded driver-side from tiny frames, then a vectorized
    score pass → distributed per-doc sum → deterministic top-k.

    ``post``: a pre-materialized :func:`bm25_postings` Dataset to reuse
    (rank-fusion callers score several systems off one scan).
    """
    from .relational import grouped_sums, topk

    if post is None:
        post = bm25_postings(ds, terms, text_col, id_col).materialize()
    sent = post.filter(expr=f"{id_col} == -1").to_pandas()
    n_docs = int(sent["tf"].sum())
    avgdl = float(sent["doclen"].sum()) / n_docs  # exact: int sums, one divide
    cands = post.filter(expr=f"{id_col} >= 0")
    dfreq = grouped_sums(cands, ["term"], {}, "df").to_pandas()
    idf = {
        t: float(np.log((n_docs - d + 0.5) / (d + 0.5) + 1.0))
        for t, d in zip(dfreq["term"], dfreq["df"])
    }

    def contrib(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["doclen"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.array([idf[x] for x in t["term"].to_pylist()])
        score = w * (tf / (tf + k1 * (1.0 - b + b * (dl / avgdl))))
        return pa.table({id_col: t[id_col], "c": pa.array(score)})

    scored = cands.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True)
    per_doc = grouped_sums(scored, [id_col], {"score": "c"})
    out = topk(per_doc, ["score", id_col], [True, False], k).to_pandas()
    out["score"] = out["score"].pipe(_rd)
    return out[[id_col, "score"]]


def word_bigrams(t: pa.Table, text_col: str = "text", group_col: str | None = None) -> pa.Table:
    """Per-batch ordered word-bigram stream: lower + regex split (one RE2
    pass over the Arrow buffer), empty tokens dropped BEFORE pairing (so
    punctuation does not break adjacency, matching ``list_filter`` +
    consecutive-index SQL semantics), then consecutive pairs within each
    row via one vectorized parent-index comparison — no per-row Python."""
    words = pc.split_pattern_regex(pc.utf8_lower(t[text_col]), TOKEN_SPLIT)
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    parents = pc.list_parent_indices(words)
    flat = words.flatten()
    mask = pc.not_equal(flat, "")
    w = flat.filter(mask)
    p = parents.filter(mask).to_numpy(zero_copy_only=False)
    idx = np.nonzero(p[:-1] == p[1:])[0] if len(p) else np.empty(0, np.int64)
    cols = {"w1": w.take(pa.array(idx)), "w2": w.take(pa.array(idx + 1))}
    if group_col is not None:
        cols[group_col] = pc.take(t[group_col], pa.array(p[idx] if len(idx) else idx))
    return pa.table(cols)


def bm25_topk(
    ds: Dataset,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009) with ZERO shuffle:

    pass 1 — per-batch scalar partials (doc count, total length, per-term
    document frequency: a few ints per batch);
    pass 2 — per-doc scores from vectorized exact-word-count kernels
    (``\\b...\\b`` RE2 counts == DuckDB ``list_filter`` counts on the
    single-spaced corpus) + the distributed top-k merge.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1); per-term gate tf > 0; terms
    summed in the given order so the float path matches the SQL oracle
    term-for-term."""
    import re as _re

    from .relational import topk as _topk

    pats = [rf"\b{_re.escape(t)}\b" for t in terms]

    def _tf_dl(t: pa.Table):
        text = pc.fill_null(t[text_col], "")
        dl = pc.add(pc.count_substring(text, " "), 1).to_numpy(zero_copy_only=False).astype(np.int64)
        tfs = [
            pc.count_substring_regex(text, p).to_numpy(zero_copy_only=False).astype(np.int64)
            for p in pats
        ]
        return dl, tfs

    def partial(t: pa.Table) -> pa.Table:
        dl, tfs = _tf_dl(t)
        row = {"n": [np.int64(len(t))], "total_dl": [dl.sum()]}
        for i, tf in enumerate(tfs):
            row[f"df{i}"] = [np.int64((tf > 0).sum())]
        return pa.table(row)

    g = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas().sum()
    n, total_dl = np.float64(g["n"]), np.float64(g["total_dl"])
    idf = [float(np.log((n - g[f"df{i}"] + 0.5) / (g[f"df{i}"] + 0.5) + 1)) for i in range(len(terms))]

    def score(t: pa.Table) -> pa.Table:
        dl, tfs = _tf_dl(t)
        norm = (1.0 - b) + b * dl * n / total_dl
        s = np.zeros(len(t), dtype=np.float64)
        for i, tf in enumerate(tfs):
            s = s + np.where(tf > 0, idf[i] * (tf * (k1 + 1.0)) / (tf + k1 * norm), 0.0)
        return pa.table({id_col: t[id_col], "score": pa.array(s)})

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return _topk(scored, ["score", id_col], [True, False], k).to_pandas()


def mmr_rerank(
    ds: Dataset,
    terms: list[str],
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    BM25 retrieves a ``pool``-sized candidate set DISTRIBUTED (zero-shuffle
    two-pass ranker + top-k merge); the greedy diversity re-rank — pick
    argmax λ·rel − (1−λ)·max-sim-to-selected — runs driver-side over the
    bounded pool with exact word-set Jaccard similarities.

    Determinism: rel and sim are rounded to 6 before the greedy compare;
    ties → smaller doc id.  Returns (rank, doc_id, score round-6)."""
    from .rounding import round_like_duckdb as _rd6

    # over-fetch then cut on the ROUNDED score so the pool boundary is a
    # deterministic (round-6, id) decision, not a raw-float one
    cand = bm25_topk(ds, terms, k=2 * pool, id_col=id_col)
    cand = cand.assign(score=_rd6(cand["score"].to_numpy(np.float64), 6))
    cand = cand.sort_values(
        ["score", id_col], ascending=[False, True], ignore_index=True
    ).head(pool)
    ids = cand[id_col].to_numpy()
    rel = cand["score"].to_numpy(np.float64)

    # fetch the candidate texts (bounded pool) for pairwise word Jaccard
    want = pa.array([int(i) for i in ids], pa.int64())
    texts_df = (
        ds.map_batches(
            lambda t: t.filter(pc.is_in(t[id_col], value_set=want)).select(
                [id_col, text_col]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
        .set_index(id_col)[text_col]
    )
    sets = {int(i): set(str(texts_df.loc[int(i)]).split(" ")) for i in ids}

    def jac(a: int, b: int) -> float:
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        return inter / (len(sa) + len(sb) - inter)

    selected: list[tuple[int, int, float]] = []
    remaining = list(range(len(ids)))
    while remaining and len(selected) < k:
        best_j, best_score = None, None
        for j in remaining:
            if selected:
                max_sim = max(
                    float(_rd6(np.array([jac(int(ids[j]), s[1])]), 6)[0])
                    for s in selected
                )
            else:
                max_sim = 0.0
            score = round(lam * rel[j] - (1.0 - lam) * max_sim, 6)
            if (
                best_score is None
                or score > best_score
                or (score == best_score and int(ids[j]) < int(ids[best_j]))
            ):
                best_j, best_score = j, score
        selected.append((len(selected) + 1, int(ids[best_j]), float(best_score)))
        remaining.remove(best_j)
    out = pd.DataFrame(selected, columns=["rank", id_col, "mmr_score"])
    return out.astype({"rank": "int64", id_col: "int64"})
