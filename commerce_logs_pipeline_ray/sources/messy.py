"""Deterministic "messy" corpus: documents with planted PII + formatting noise.

The clean synthetic ``documents`` table contains no PII and no case /
whitespace variation, so scrub/normalize operators would trivially no-op on
it.  This builder derives a corpus with KNOWN planted artifacts from
``documents.parquet`` — deterministic in ``doc_id`` alone, so the Ray
queries and the DuckDB oracles read the same materialized Parquet and every
count is exactly predictable (planted-truth tests in tests/test_scrub.py).

Plant schedule (by doc_id):
  id % 2 == 0 → text uppercased          (normalization: case)
  id % 4 == 0 → first 3 spaces doubled   (normalization: whitespace runs)
  id % 6 == 0 → leading/trailing blanks  (normalization: trim)
  id % 3 == 0 → append an email address
  id % 5 == 0 → append an IPv4 address
  id % 7 == 0 → append a 555-phone
PII is appended AFTER the case flip, so planted emails stay lowercase and
match the scrub regexes on both oracle sides.
"""

from __future__ import annotations

import pyarrow as pa


def build_messy_table(documents: pa.Table) -> pa.Table:
    """documents (doc_id, source, text) → messy (doc_id, source, text)."""
    ids = documents["doc_id"].to_pylist()
    texts = documents["text"].to_pylist()
    out = []
    for i, s in zip(ids, texts):
        s = s or ""
        if i % 2 == 0:
            s = s.upper()
        if i % 4 == 0:
            s = s.replace(" ", "  ", 3)
        if i % 6 == 0:
            s = "  " + s + " "
        if i % 3 == 0:
            s += f" contact user{i}@example.com"
        if i % 5 == 0:
            s += f" from 10.{i % 256}.{(i // 7) % 256}.{(i // 11) % 200 + 1}"
        if i % 7 == 0:
            s += f" call 555-{i % 10000:04d}"
        out.append(s)
    return pa.table(
        {
            "doc_id": documents["doc_id"],
            "source": documents["source"],
            "text": pa.array(out, type=pa.string()),
        }
    )
