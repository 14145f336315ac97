"""Content-defined chunking (CDC) — the storage-dedup primitive (Gear
hashing: Xia et al. FAST'16 "FastCDC"; rolling-hash chunking back to
Muthitacharoen et al. SOSP'01 LBFS).  A boundary is declared wherever the
Gear rolling hash of the last ``k`` bytes has its low ``MASK_BITS`` bits
zero, so identical content produces identical chunk boundaries regardless
of how the surrounding bytes shifted — insertions only perturb one chunk.

The kernel here is fully vectorized over an Arrow string column's flat
UTF-8 buffer: because the boundary test only reads the low ``MASK_BITS``
bits and the Gear update is ``h = (h << 1) + g[byte]``, a byte older than
``MASK_BITS`` positions cannot influence the test — the rolling hash is
exactly a ``k``-tap shifted sum, computed as k shifted adds over the whole
batch at once.  Chunk identity is a position-weighted polynomial hash
(odd multiplier, wrap-around uint64), one ``np.add.reduceat`` per batch.

No min/max chunk-size clamps: clamps reintroduce a sequential scan
dependency; the pure-hash rule keeps the kernel embarrassingly parallel
(the documented trade-off is a geometric chunk-length tail).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MASK_BITS = 6          # boundary prob 2^-6 → ~64-byte mean chunks
WINDOW = MASK_BITS     # older bytes can't reach the low MASK_BITS bits
_MASK = np.uint64((1 << MASK_BITS) - 1)
_POLY_P = np.uint64(1099511628211)  # FNV prime, odd → bijective step mod 2^64


def _gear_table() -> np.ndarray:
    """Deterministic 256-entry gear table via the repo's mix64 finalizer."""
    from .hashing import mix64

    return mix64(np.arange(256, dtype=np.uint64))


_GEAR = _gear_table()


def chunk_column(text: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, ...]:
    """CDC over every row of a string column at once.

    Returns ``(doc_idx, chunk_hash, chunk_len)`` — one entry per chunk,
    in document order.  Empty strings produce no chunks.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    # zero-copy flat UTF-8 buffer + row offsets
    offs = np.frombuffer(text.buffers()[1], dtype=np.int32,
                         count=len(text) + 1).astype(np.int64)
    buf = text.buffers()[2]
    if buf is None or offs[-1] == offs[0]:
        z = np.array([], dtype=np.int64)
        return z, z.astype(np.uint64), z
    flat = np.frombuffer(buf, dtype=np.uint8, count=int(offs[-1]))[offs[0]:]
    offs = offs - offs[0]
    n_bytes = len(flat)
    lens = np.diff(offs)
    doc_of = np.repeat(np.arange(len(text), dtype=np.int64), lens)
    pos_in_doc = np.arange(n_bytes, dtype=np.int64) - offs[:-1][doc_of]

    # k-tap shifted gear sum, low MASK_BITS bits only
    gv = _GEAR[flat] & np.uint64((1 << 63) - 1)
    h = np.zeros(n_bytes, dtype=np.uint64)
    for t in range(WINDOW):
        # contribution of the byte t positions back, shifted left t
        h[t:] += gv[: n_bytes - t] << np.uint64(t)
    is_boundary = ((h & _MASK) == 0) & (pos_in_doc >= WINDOW - 1)
    # every doc's last byte always closes a chunk
    is_boundary[offs[1:] - 1] = True

    ends = np.flatnonzero(is_boundary)          # inclusive chunk-end bytes
    starts = np.r_[np.int64(0), ends[:-1] + 1]
    # a chunk starting at a doc head must not inherit the previous doc's end
    doc_heads = offs[:-1][lens > 0]
    starts = np.maximum(starts, offs[:-1][doc_of[ends]])
    chunk_doc = doc_of[ends]
    chunk_len = ends - starts + 1

    # polynomial chunk hash: Σ byte_j · P^j (wrap mod 2^64), j = offset
    pos_in_chunk = np.arange(n_bytes, dtype=np.int64) - np.repeat(starts, chunk_len)
    max_len = int(chunk_len.max())
    powers = np.ones(max_len, dtype=np.uint64)
    if max_len > 1:
        powers[1:] = _POLY_P
        powers = np.cumprod(powers)             # uint64 wrap-around
    terms = flat.astype(np.uint64) * powers[pos_in_chunk]
    chash = np.add.reduceat(terms, starts)
    # reduceat on a single-element tail segment is fine; mix in length so
    # ("ab","") and ("a","b") style splits can't alias across lengths
    chash = chash ^ (chunk_len.astype(np.uint64) << np.uint64(48))
    _ = doc_heads
    return chunk_doc, chash, chunk_len


def chunk_text_scalar(s: str) -> list[tuple[int, int]]:
    """Independent SCALAR reference of the same documented rule (python
    ints only — used by the oracle artifact builder, never by the Ray
    path).  Returns [(chunk_hash, chunk_len)] per chunk."""
    from .hashing import mix64

    b = s.encode()
    if not b:
        return []
    gear = [int(x) & ((1 << 63) - 1) for x in mix64(np.arange(256, dtype=np.uint64))]
    mask = (1 << MASK_BITS) - 1
    out = []
    start = 0
    for i in range(len(b)):
        h = 0
        if i >= WINDOW - 1:
            for t in range(WINDOW):
                h += gear[b[i - t]] << t
        boundary = (i >= WINDOW - 1 and (h & mask) == 0) or i == len(b) - 1
        if boundary:
            ch = 0
            p = 1
            for j in range(start, i + 1):
                ch = (ch + b[j] * p) % (1 << 64)
                p = (p * int(_POLY_P)) % (1 << 64)
            ln = i + 1 - start
            out.append(((ch ^ (ln << 48)) % (1 << 64), ln))
            start = i + 1
    return out
