"""Deterministic "web corpus": multi-line documents with planted structure
for the canonical public web-curation filters (Gopher repetition + quality
rules, C4 line cleaning — Rae et al. 2021 §A1.1, Raffel et al. 2020 §2.2).

The base synthetic ``documents`` table is a flat single-space word stream —
no newlines, bullets, or terminal punctuation — so line-granularity cleaning
operators over it prove nothing.  This builder derives a corpus with KNOWN
line structure and planted rule violations, deterministic in ``doc_id``
alone: the Ray pipeline and the DuckDB oracle read the same materialized
Parquet and every per-rule failure count is exactly predictable
(planted-truth tests in tests/test_webclean.py).

Line synthesis (per base doc, words chunked into 3–8-word lines):
  (doc_id + line_idx) % 7 picks the line shape —
    0 → terminal '.'   1 → terminal '!'   2 → trailing '...'
    3 → '- ' bullet    4 → terminal '?'   5,6 → bare (no terminal punct)

Plant schedule (by base doc_id; one corpus row per base doc):
  id % 3  == 0 → first line repeated at the end   (duplicate-line mass)
  id % 17 == 0 → trailing 'lorem ipsum dolor sit amet.'   (C4 doc kill)
  id % 19 == 0 → trailing '{ "config": 1 }'               (C4 doc kill)
  id % 23 == 0 → trailing 'please enable javascript to continue viewing.'
                 (C4 line kill: ends in '.', ≥5 words — only the word rule
                 removes it)
  id % 29 == 0 → every 3rd word replaced by '###'    (Gopher symbol ratio)
  id % 31 == 0 → trailing all-digit line, ~n/4+3 words (Gopher alpha frac)
  id % 37 == 0 → EVERY line bulleted '- '            (Gopher bullet frac)
  id % 41 == 0 → EVERY line suffixed '...'           (Gopher ellipsis frac)
"""

from __future__ import annotations

import pyarrow as pa

DUP_LINE_MOD = 3
LOREM_MOD = 17
BRACE_MOD = 19
JAVASCRIPT_MOD = 23
SYMBOL_MOD = 29
DIGIT_MOD = 31
BULLET_MOD = 37
ELLIPSIS_MOD = 41

LOREM_LINE = "lorem ipsum dolor sit amet."
BRACE_LINE = '{ "config": 1 }'
JAVASCRIPT_LINE = "please enable javascript to continue viewing."


def _digit_line(doc_id: int, n: int) -> str:
    return " ".join(str((doc_id * 7 + 3 * k + 1) % 9973) for k in range(n))


def build_web_docs(documents: pa.Table) -> pa.Table:
    """documents (doc_id, source, text) → web corpus, same columns, text
    newline-joined."""
    ids = documents["doc_id"].to_pylist()
    sources = documents["source"].to_pylist()
    texts = documents["text"].to_pylist()
    out_text: list[str] = []
    for doc_id, text in zip(ids, texts):
        words = [w for w in (text or "").split(" ") if w]
        if doc_id % SYMBOL_MOD == 0:
            words = [("###" if k % 3 == 2 else w) for k, w in enumerate(words)]
        lines: list[str] = []
        i = 0
        li = 0
        while i < len(words):
            n = 3 + (doc_id + 2 * li) % 6
            line = " ".join(words[i : i + n])
            i += n
            m = (doc_id + li) % 7
            if m == 0:
                line += "."
            elif m == 1:
                line += "!"
            elif m == 2:
                line += "..."
            elif m == 3:
                line = "- " + line
            elif m == 4:
                line += "?"
            lines.append(line)
            li += 1
        if doc_id % DUP_LINE_MOD == 0 and lines:
            lines.append(lines[0])
        if doc_id % DIGIT_MOD == 0:
            lines.append(_digit_line(doc_id, len(words) // 4 + 3))
        if doc_id % JAVASCRIPT_MOD == 0:
            lines.append(JAVASCRIPT_LINE)
        if doc_id % LOREM_MOD == 0:
            lines.append(LOREM_LINE)
        if doc_id % BRACE_MOD == 0:
            lines.append(BRACE_LINE)
        if doc_id % BULLET_MOD == 0:
            lines = [ln if ln.startswith("- ") else "- " + ln for ln in lines]
        if doc_id % ELLIPSIS_MOD == 0:
            lines = [ln if ln.endswith("...") else ln + "..." for ln in lines]
        out_text.append("\n".join(lines))
    return pa.table(
        {
            "doc_id": documents["doc_id"],
            "source": documents["source"],
            "text": pa.array(out_text, type=pa.string()),
        }
    )
