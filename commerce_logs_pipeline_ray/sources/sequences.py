"""Derive a sequences-shaped table from the shared ``documents`` table.

Bridges the provided test corpus (``/root/testdata/sf*/documents.parquet``:
doc_id:int64, text, lang, source, n_chars) to the engine's canonical input
shape ``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``.

The structured id (``sid``) construction is DETERMINISTIC and mirrored
exactly by the DuckDB oracle SQL in ``pipelines/queries.py`` (printf + md5
substrings), so the flagship parse/enrich/route/aggregate semantics are
SQL-checkable end-to-end.  A fixed fraction (``doc_id % 41 == 7``) is
malformed (underscores stripped) to exercise the error sink — the analogue
of the reference's unparseable-line channel
(``pipeline/events/extraction.go:136-151``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a64_single
from ..schema import SEQUENCES_SCHEMA, VOCAB_SIZE

MALFORM_MOD = 41
MALFORM_REM = 7


def build_sid(doc_id: int, source: str, lang: str) -> str:
    """Scalar sid builder (oracle-parity reference implementation)."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    d8 = f"2024{1 + doc_id % 12:02d}{1 + doc_id % 28:02d}"
    ns = ["default", "apps", "system"][doc_id % 3]
    container = "proxy" if lang == "en" else "app"
    sid = f"{d8}.svc-{source}-{h[:8]}-{h[8:13]}_{ns}_{container}-{h[13:21]}"
    if doc_id % MALFORM_MOD == MALFORM_REM:
        sid = sid.replace("_", "")
    return sid


def sid_column(t: pa.Table) -> pa.Array:
    ids = t["doc_id"].to_pylist()
    sources = t["source"].to_pylist()
    langs = t["lang"].to_pylist()
    return pa.array([build_sid(i, s, l) for i, s, l in zip(ids, sources, langs)], type=pa.string())


def docs_tenant(source: str) -> str:
    """SQL-expressible tenant formula for srcN sources: cp{(N % 3) + 1}."""
    return f"cp{int(source[3:]) % 3 + 1}"


def derive_sequences(documents: pa.Table) -> pa.Table:
    """documents → sequences (sid, word-hash tokens, n_tok, source).

    Tokens are per-word FNV64 % VOCAB_SIZE int32 ids — a deterministic
    whitespace 'tokenizer' standing in for a real BPE; used by the flagship
    smoke path (``entry()``), not by the SQL-parity queries.
    """
    sid = sid_column(documents)
    texts = documents["text"].to_pylist()
    vocab = np.uint64(VOCAB_SIZE)
    token_lists = []
    for s in texts:
        words = (s or "").split(" ")
        token_lists.append([int(fnv1a64_single(w) % vocab) for w in words])
    n_tok = pa.array([len(x) for x in token_lists], type=pa.int32())
    tokens = pa.array(token_lists, type=pa.list_(pa.int32()))
    return pa.Table.from_arrays(
        [sid, tokens, n_tok, documents["source"].combine_chunks()], schema=SEQUENCES_SCHEMA
    )
