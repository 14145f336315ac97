"""Vectorized string hashing.

The reference partitions every phase with ``FNV32a(blobName) % partitions``
(``pipeline/ingest/internal/ingestion/processor.go:29-33``; replicated at
``pipeline/extraction/internal/service/service.go:477-482`` so a key lands on
the same partition across phases).  We reproduce FNV-1a 32-bit exactly, but
vectorized: the Arrow string column's data buffer and offsets are viewed
zero-copy as numpy arrays and the hash runs one vectorized gather per byte
position — no per-row Python in the hot path.

Also used for: salting hot keys in aggregation (``salt = h(doc_id) % S``),
shard assignment (reference MD5-byte-sum shard filter,
``pipeline/ingest/internal/filters/filters.go:160-189``), and content
fingerprints in the dedup operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FNV_OFFSET_32 = np.uint32(0x811C9DC5)
FNV_PRIME_32 = np.uint32(0x01000193)

FNV_OFFSET_64 = np.uint64(0xCBF29CE484222325)
FNV_PRIME_64 = np.uint64(0x100000001B3)


def _flat_bytes(strings) -> tuple[np.ndarray, np.ndarray]:
    """View a string/binary array-like as (data: uint8[], offsets: int64[n+1]).

    Zero-copy for Arrow string/binary arrays (nulls become empty first).
    """
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        strings = pa.array(["" if s is None else s for s in strings], type=pa.string())
    if pa.types.is_binary(strings.type) or pa.types.is_large_binary(
        strings.type
    ) or pa.types.is_fixed_size_binary(strings.type):
        strings = strings.cast(pa.large_binary())  # same layout as large_string
        if strings.null_count:
            strings = pc.fill_null(strings, b"")
    else:
        if strings.null_count:
            strings = pc.fill_null(strings, "")
        strings = strings.cast(pa.large_string())  # int64 offsets, uniform view
    buffers = strings.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        strings.offset : strings.offset + len(strings) + 1
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    return data, offsets


def _fnv1a(strings, offset_basis, prime, dtype) -> np.ndarray:
    data, offsets = _flat_bytes(strings)
    starts = offsets[:-1]
    ends = offsets[1:]
    n = len(starts)
    h = np.full(n, offset_basis, dtype=dtype)
    lens = ends - starts
    maxlen = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = np.nonzero(lens > j)[0]
            if active.size == 0:
                break
            hj = h[active]
            hj ^= data[starts[active] + j].astype(dtype)
            hj *= prime
            h[active] = hj
    return h


def fnv1a32(strings) -> np.ndarray:
    """FNV-1a 32-bit over each string; returns uint32 ndarray.

    Matches the scalar algorithm used by Go's hash/fnv New32a()
    (reference partitioner semantics, processor.go:29-33).
    """
    return _fnv1a(strings, FNV_OFFSET_32, FNV_PRIME_32, np.uint32)


def fnv1a64(strings) -> np.ndarray:
    """FNV-1a 64-bit per string (uint64 ndarray) — content fingerprints."""
    return _fnv1a(strings, FNV_OFFSET_64, FNV_PRIME_64, np.uint64)


def fnv1a32_single(s: str) -> int:
    """Scalar FNV-1a 32 (oracle / driver-side use)."""
    h = 0x811C9DC5
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x01000193) & 0xFFFFFFFF
    return h


def fnv1a64_single(s: str) -> int:
    """Scalar FNV-1a 64 (oracle / driver-side use)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def partition_of(strings, num_partitions: int) -> np.ndarray:
    """``FNV32a(key) % P`` — the reference's partitioner, vectorized."""
    return (fnv1a32(strings) % np.uint32(num_partitions)).astype(np.int32)


def mix64(h: np.ndarray) -> np.ndarray:
    """Murmur3 fmix64 finalizer (public domain): FNV's upper bits avalanche
    poorly for short similar keys — apply this before any use that needs
    uniform HIGH bits (HLL register selection, bit-sampling LSH)."""
    h = np.asarray(h, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


def bucket_indices(t: "pa.Table", keys: list[str], num_buckets: int) -> np.ndarray:
    """Composite hash bucket per row over arbitrary key columns (strings →
    FNV64, integers → Knuth multiplicative), vectorized.  The coarse bucket
    is the exchange key for high-cardinality reduces: shuffling B buckets
    instead of millions of raw keys keeps the per-group overhead of the
    sort-based exchange negligible while per-bucket aggregation stays
    vectorized."""
    h = np.zeros(len(t), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = t[k]
            typ = col.type
            if (
                pa.types.is_string(typ)
                or pa.types.is_large_string(typ)
                or pa.types.is_binary(typ)
                or pa.types.is_large_binary(typ)
                or pa.types.is_fixed_size_binary(typ)
            ):
                hk = fnv1a64(col)
            elif pa.types.is_integer(typ):
                vals = col.to_numpy(zero_copy_only=False)
                hk = vals.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            elif pa.types.is_boolean(typ):
                hk = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            else:  # fallback: hash the string form
                hk = fnv1a64(pc.cast(col, pa.string()))
            h = h * np.uint64(31) + hk
    return (h % np.uint64(num_buckets)).astype(np.int32)


# second-basis seed for the 128-bit content fingerprint.  Both lanes run
# FNV-1a with the same prime over the same bytes (the byte gather dominates
# cost, a second multiply chain would not), differing only in offset basis,
# so the raw streams are CORRELATED — lane 2 therefore gets an independent
# mix64 finalizer (distinct multiply chain) to decorrelate the pair.  The
# joint collision bound is a heuristic far stronger than a single 64-bit
# FNV and ample for non-adversarial dedup; it is NOT a proven 2^-128.
FNV_OFFSET_64B = np.uint64(0xCBF29CE484222325 ^ 0x9E3779B97F4A7C15)


def content_fp128(strings) -> pa.Array:
    """128-bit vectorized content fingerprint as ``fixed_size_binary(16)``.

    One pass over the flattened byte buffer carrying TWO FNV-1a 64
    accumulators with different offset bases (same bandwidth as one hash —
    the byte gather dominates).  This is the scale-default fingerprint for
    exact dedup (VERDICT r2 #2: the per-row ``hashlib.md5`` loop was the
    slowest kernel on the curation hot path); ``md5_hex`` remains available
    where DuckDB ``md5()`` oracle parity is required.
    """
    data, offsets = _flat_bytes(strings)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    n = len(starts)
    h1 = np.full(n, FNV_OFFSET_64, dtype=np.uint64)
    h2 = np.full(n, FNV_OFFSET_64B, dtype=np.uint64)
    maxlen = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = np.nonzero(lens > j)[0]
            if active.size == 0:
                break
            b = data[starts[active] + j].astype(np.uint64)
            a1 = h1[active]
            a1 ^= b
            a1 *= FNV_PRIME_64
            h1[active] = a1
            a2 = h2[active]
            a2 ^= b
            a2 *= FNV_PRIME_64
            h2[active] = a2
    raw = np.empty((n, 2), dtype=np.uint64)
    raw[:, 0] = h1
    raw[:, 1] = mix64(h2)  # bijective, so equality semantics are unchanged
    return pa.Array.from_buffers(
        pa.binary(16), n, [None, pa.py_buffer(raw.tobytes())]
    )
