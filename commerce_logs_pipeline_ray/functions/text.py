"""Text-analysis operators for training-data pipelines.

Vectorized per-batch kernels over a ``text`` column: token counting,
stopword-based quality scoring, content fingerprinting, and a simple
language-ID heuristic.  All are pure functions usable inside
``map_batches(batch_format="pyarrow")``; regexes are RE2-compatible so the
DuckDB oracles (``regexp_extract_all``) agree exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from .rounding import round_like_duckdb as _rd

# RE2-safe; identical semantics in Python re and DuckDB regexp_extract_all
STOPWORD_PATTERN = r"\b(?:the|a|of|and|to)\b"


def n_words(text: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Whitespace token count == len(string_split(text, ' ')) in DuckDB.

    Counts single-space separators + 1 (documents are single-spaced)."""
    return pc.add(pc.count_substring(text, " "), 1)


def stopword_hits(text) -> pa.Array | pa.ChunkedArray:
    """Count of stopword matches per row — one vectorized RE2 pass over the
    Arrow buffer (``pc.count_substring_regex``), no per-row Python."""
    if not isinstance(text, (pa.Array, pa.ChunkedArray)):
        text = pa.array(list(text), type=pa.string())
    return pc.cast(pc.count_substring_regex(pc.fill_null(text, ""), STOPWORD_PATTERN), pa.int64())


def md5_hex(text) -> pa.Array:
    """Per-row md5 hex digest (content fingerprint; DuckDB ``md5()`` parity)."""
    vals = text.to_pylist() if isinstance(text, (pa.Array, pa.ChunkedArray)) else list(text)
    return pa.array([hashlib.md5((s or "").encode()).hexdigest() for s in vals], type=pa.string())


def quality_batch(t: pa.Table) -> pa.Table:
    """doc_id, n_words, stop_hits, stop_ratio (rounded 6)."""
    nw = pc.cast(n_words(t["text"]), pa.int64())
    hits = stopword_hits(t["text"])
    ratio = pa.array(_rd(pc.divide(pc.cast(hits, pa.float64()), pc.cast(nw, pa.float64())).to_numpy(zero_copy_only=False), 6))
    return pa.table(
        {"doc_id": t["doc_id"], "n_words": nw, "stop_hits": hits, "stop_ratio": ratio}
    )


# crude n-gram language-ID heuristic: score marker-token hit-rates per
# language; deterministic, vectorizable, and SQL-expressible for the oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "code": ["spark", "query", "vector"],
}


def langid_batch(t: pa.Table) -> pa.Table:
    """doc_id + lang_guess: 'code' if code-marker hits >= en-marker hits else
    'en'.  Two vectorized regex-count kernels + one if_else — zero per-row
    Python."""
    text = pc.fill_null(t["text"], "")
    en = pc.count_substring_regex(text, r"\b(?:the|a|of)\b")
    code = pc.count_substring_regex(text, r"\b(?:spark|query|vector)\b")
    guess = pc.if_else(pc.greater_equal(code, en), "code", "en")
    return pa.table({"doc_id": t["doc_id"], "lang_guess": pc.cast(guess, pa.string())})


def compression_ratio_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc zlib compression ratio — the classic entropy quality proxy
    (highly repetitive/boilerplate text compresses far below ~0.4;
    high-entropy noise stays near 1.0; used by Gopher/C4-family cleaning
    stacks).  stdlib zlib per doc (CPU-bound loop, the actor-pool batch
    shape); ratio = compressed_len / max(raw_len, 1) over UTF-8 bytes."""
    import zlib

    texts = t[text_col].to_pylist()
    raw = np.empty(len(texts), dtype=np.int64)
    comp = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        b = (s or "").encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, 6))
    ratio = comp / np.maximum(raw, 1)
    return pa.table(
        {"doc_id": t["doc_id"],
         "raw_bytes": pa.array(raw),
         "compressed_bytes": pa.array(comp),
         "compression_ratio": pa.array(ratio)}
    )


def ngram_diversity(ds, ns=(1, 2, 3), group_col: str = "source"):
    """N-gram diversity per group (self-repetition audit): distinct word
    n-grams / total n-grams for each n — the type/token curve the corpus
    diversity dashboards plot.  One tagged (group, n, gram) combiner
    exchange carries ALL sizes at once (per-batch distinct rows with
    counts); a second KB-sized pass counts distinct and total per (group,
    n).  Returns one row per group with total_n / distinct_n / div_n."""
    import pandas as pd

    from .rounding import round_like_duckdb as _rd6

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(words), dtype=np.int64), counts)
        flat = words.flatten()
        grp = (
            t[group_col].combine_chunks()
            if isinstance(t[group_col], pa.ChunkedArray)
            else t[group_col]
        ).to_numpy(zero_copy_only=False)
        frames = []
        cur = flat
        for n in ns:
            if n > 1:
                m = len(flat) - (n - 1)
                if m <= 0:
                    continue
                parts = [flat.slice(k, m) for k in range(n)]
                cur = pc.binary_join_element_wise(*parts, " ")
                same = doc_idx[: m] == doc_idx[n - 1 :]
            else:
                same = np.ones(len(flat), dtype=bool)
            sub = pa.table(
                {
                    group_col: pa.array(grp[doc_idx[: len(cur)]][same]),
                    "n": pa.array(np.full(int(same.sum()), n, dtype=np.int64)),
                    "gram": pa.array(
                        cur.to_numpy(zero_copy_only=False)[same], pa.string()
                    ),
                }
            )
            df = sub.to_pandas().groupby([group_col, "n", "gram"], as_index=False).size()
            frames.append(df.rename(columns={"size": "cnt"}))
        out = pd.concat(frames, ignore_index=True)
        out["cnt"] = out["cnt"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    from .relational import grouped_sums

    per_gram = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "n", "gram"],
        {"cnt": "cnt"},
    )

    def fold(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby([group_col, "n"], as_index=False).agg(
            distinct=("gram", "size"), total=("cnt", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        per_gram.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby([group_col, "n"], as_index=False)
        .sum()
    )
    rows = {}
    for _, r in agg.iterrows():
        rows.setdefault(r[group_col], {})[int(r["n"])] = (int(r["total"]), int(r["distinct"]))
    recs = []
    for grp in sorted(rows):
        rec = {group_col: grp}
        for n in ns:
            total, distinct = rows[grp].get(n, (0, 0))
            rec[f"total_{n}"] = total
            rec[f"distinct_{n}"] = distinct
            rec[f"div_{n}"] = float(_rd6(np.array([distinct / total if total else 0.0]), 6)[0])
        recs.append(rec)
    return pd.DataFrame(recs)
