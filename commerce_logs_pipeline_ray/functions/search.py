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
