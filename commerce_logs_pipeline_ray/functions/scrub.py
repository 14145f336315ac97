"""PII scrubbing and text-normalization kernels (curation stage family).

Large-scale training-data pipelines scrub personally-identifiable
information and canonicalize text before tokenization.  Both kernels here
are single-pass, fully vectorized Arrow stages (``pc.count_substring_regex``
/ ``pc.replace_substring_regex`` — RE2, precompiled in C++), emitting tiny
per-(source) partial rows so the only exchange is a bounded-key reduce:
the scrubbed/normalized text itself never leaves the map stage except as a
rewritten column (at scale it streams straight into a partitioned writer).

Reference analog: the extraction service's field-level rewrite passes
(`pipeline/extraction/internal/extractor/extractor.go` coercion/skip
rewrites) — same shape: per-batch regex rewrite + counters, no state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2 syntax on BOTH sides of the oracle (pyarrow.compute and DuckDB use
# RE2): keep to the common subset — character classes, \b, bounded repeats.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"

# replacement order matters and is part of the contract (mirrored in the
# SQL oracle): email → ip → phone.  The sentinels contain no digits or '@',
# so later passes never match inside an earlier replacement.
_PASSES = ((EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>"))


def scrub_text(text: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Redact all three PII classes; returns the rewritten string column."""
    out = text
    for pattern, repl in _PASSES:
        out = pc.replace_substring_regex(out, pattern=pattern, replacement=repl)
    return out


def pii_partials(t: pa.Table) -> pa.Table:
    """Per-batch combiner: (source) → PII counters + scrubbed-length sum.

    One vectorized regex-count pass per PII class plus one rewrite chain;
    the returned partial table is |sources present in batch| rows.
    """
    text = t["text"]
    n_email = pc.count_substring_regex(text, pattern=EMAIL_RE)
    n_ip = pc.count_substring_regex(text, pattern=IPV4_RE)
    n_phone = pc.count_substring_regex(text, pattern=PHONE_RE)
    any_pii = pc.cast(
        pc.greater(pc.add(pc.add(n_email, n_ip), n_phone), 0), pa.int64()
    )
    scrubbed_chars = pc.cast(pc.utf8_length(scrub_text(text)), pa.int64())
    flat = pa.table(
        {
            "source": t["source"],
            "n_email": pc.cast(n_email, pa.int64()),
            "n_ip": pc.cast(n_ip, pa.int64()),
            "n_phone": pc.cast(n_phone, pa.int64()),
            "docs_with_pii": any_pii,
            "scrubbed_chars": scrubbed_chars,
        }
    )
    return flat.group_by(["source"]).aggregate(
        [
            ("n_email", "sum"),
            ("n_ip", "sum"),
            ("n_phone", "sum"),
            ("docs_with_pii", "sum"),
            ("scrubbed_chars", "sum"),
            ("source", "count"),
        ]
    ).rename_columns(
        ["source", "n_email", "n_ip", "n_phone", "docs_with_pii", "scrubbed_chars", "n_docs"]
    )


def normalize_text(text: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Canonical form: lowercase, collapse whitespace runs, trim ends."""
    out = pc.utf8_lower(text)
    out = pc.replace_substring_regex(out, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(out)


def normalize_partials(t: pa.Table) -> pa.Table:
    """Per-batch combiner: (source) → normalization effect counters."""
    text = t["text"]
    norm = normalize_text(text)
    changed = pc.cast(pc.invert(pc.equal(norm, text)), pa.int64())
    flat = pa.table(
        {
            "source": t["source"],
            "n_changed": changed,
            "raw_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "norm_chars": pc.cast(pc.utf8_length(norm), pa.int64()),
        }
    )
    return flat.group_by(["source"]).aggregate(
        [
            ("n_changed", "sum"),
            ("raw_chars", "sum"),
            ("norm_chars", "sum"),
            ("source", "count"),
        ]
    ).rename_columns(["source", "n_changed", "raw_chars", "norm_chars", "n_docs"])
