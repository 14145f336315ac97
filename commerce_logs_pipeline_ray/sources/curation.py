"""Deterministic curation corpus: documents plus planted duplicates,
normalize-collapsible variants, and quality-failing fragments.

The clean synthetic ``documents`` table has zero duplicate texts (every
``md5(text)`` is distinct), so a dedup stage over it proves nothing.  This
builder derives a corpus with KNOWN planted redundancy from
``documents.parquet`` — deterministic in ``doc_id`` alone, so the Ray
pipeline and the DuckDB oracle read the same materialized Parquet and every
per-stage count is exactly predictable (planted-truth tests in
tests/test_curate.py).

Plant schedule (by base doc_id; planted rows get offset ids so keep-min
dedup always keeps the base row):
  id % 9 == 0  → EXACT duplicate            (id + 10_000_000)
  id % 11 == 0 → case/whitespace variant    (id + 20_000_000) — differs as
                 bytes, collapses to the base text under normalization
  id % 13 == 0 → 3-word fragment            (id + 30_000_000) — fails the
                 min-words quality gate (base docs are ≥ ~15 words)
"""

from __future__ import annotations

import pyarrow as pa

EXACT_DUP_MOD = 9
VARIANT_MOD = 11
FRAGMENT_MOD = 13
EXACT_DUP_OFFSET = 10_000_000
VARIANT_OFFSET = 20_000_000
FRAGMENT_OFFSET = 30_000_000


def build_curation_table(documents: pa.Table) -> pa.Table:
    """documents (doc_id, source, text) → curation corpus, same columns."""
    ids = documents["doc_id"].to_pylist()
    sources = documents["source"].to_pylist()
    texts = documents["text"].to_pylist()
    out_id, out_src, out_text = list(ids), list(sources), [t or "" for t in texts]
    for i, src, text in zip(ids, sources, texts):
        text = text or ""
        if i % EXACT_DUP_MOD == 0:
            out_id.append(i + EXACT_DUP_OFFSET)
            out_src.append(src)
            out_text.append(text)
        if i % VARIANT_MOD == 0:
            out_id.append(i + VARIANT_OFFSET)
            out_src.append(src)
            out_text.append("  " + text.upper().replace(" ", "  ", 2) + " ")
        if i % FRAGMENT_MOD == 0:
            out_id.append(i + FRAGMENT_OFFSET)
            out_src.append(src)
            out_text.append(" ".join(text.split()[:3]))
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "source": pa.array(out_src, type=pa.string()),
            "text": pa.array(out_text, type=pa.string()),
        }
    )
