"""Deterministic format-preserving shuffle: a balanced Feistel network over
a power-of-4 domain gives a seekable, stateless bijection — the scale
answer to "shuffle 10^12 training rows reproducibly and resume mid-epoch".

Unlike ``random_shuffle`` (a full materializing exchange whose order is not
recoverable after a crash), a Feistel permutation is a pure function of
(row index, seed): any worker can compute its own slice of epoch order
without coordination, a resumed run continues at the exact position, and
epoch k is just seed+k.  This is the standard trick from format-preserving
encryption (Black & Rogaway 2002, "Ciphers with Arbitrary Finite Domains")
used by large training-data loaders.

All arithmetic is bounded so the identical computation is expressible in
DuckDB BIGINT SQL (no 64-bit wraparound: half-width ≤ 16 bits keeps every
product under 2^48).
"""

from __future__ import annotations

import numpy as np

# round constants: odd multipliers (Knuth-style), one per Feistel round
_MULT = (40503, 30091, 48649, 39769)


def _half_bits(n: int) -> int:
    """Smallest k with 4^k ≥ n (domain 2^(2k), halves of k bits)."""
    k = 1
    while (1 << (2 * k)) < n:
        k += 1
    if k > 16:
        raise ValueError("domain above 2^32 needs wider round math")
    return k


def feistel_permute(
    x: np.ndarray, n: int, seed: int = 0, rounds: int = 4, k: int | None = None
) -> np.ndarray:
    """Permuted value for each x in [0, 4^k): 4-round balanced Feistel.

    Round function F(r) = ((r + seed*rounds + i) * MULT_i + 12345) mod 2^k
    — every intermediate < 2^48, safe in int64 (and in DuckDB BIGINT).
    Returns values in [0, 4^k); callers rank the images of their live ids
    to collapse the padded domain back to [0, n) (rank-among-images is the
    set-level equivalent of cycle-walking, and is one distributed rank
    instead of a data-dependent loop).  Pass a fixed ``k`` to make the
    permutation independent of n (so one closed form covers every scale).
    """
    k = _half_bits(n) if k is None else k
    mask = (1 << k) - 1
    x = x.astype(np.int64)
    left = (x >> k) & mask
    right = x & mask
    for i in range(rounds):
        f = ((right + seed * rounds + i) * _MULT[i] + 12345) & mask
        left, right = right, left ^ f
    return (left << k) | right


def feistel_sql_expr(
    col: str, n: int, seed: int = 0, rounds: int = 4, k: int | None = None
) -> str:
    """The SAME permutation as :func:`feistel_permute`, unrolled as a DuckDB
    scalar SQL expression over ``col`` — the oracle computes the bijection
    independently from this closed form."""
    k = _half_bits(n) if k is None else k
    mask = (1 << k) - 1
    left = f"(({col} // {1 << k}) & {mask})"
    right = f"({col} & {mask})"
    for i in range(rounds):
        f = f"((({right} + {seed * rounds + i}) * {_MULT[i]} + 12345) & {mask})"
        left, right = right, f"xor({left}, {f})"
    return f"(({left}) * {1 << k} + ({right}))"
