"""Mergeable sketches — approximate aggregates for unbounded key spaces.

The guide pattern for sketches under Ray Data: emit ONE serialized sketch
per batch from ``map_batches`` (a combiner), then merge the tiny sketch
stream in a second stage — sketches are designed to be mergeable, so the
all-to-all only ever moves ``num_batches`` fixed-size registers, regardless
of input cardinality.  (The reference has no sketches — SURVEY §2.7 — this
is part of the training-data toolkit.)

HyperLogLog here is a plain-numpy implementation (public algorithm,
Flajolet et al. 2007, with the standard small-range correction): ``p``-bit
register index, ``max(rho)`` per register, harmonic-mean estimate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .hashing import fnv1a64, mix64


class HyperLogLog:
    """Fixed 2^p registers; ``add_hashes`` consumes uint64 hashes."""

    def __init__(self, p: int = 12):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def hash_parts(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
        """(register index, rho) per uint64 hash — shared by the global and
        the grouped sketch paths."""
        h = mix64(h)  # FNV upper bits are non-uniform; finalize first
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        # rho = leading zeros of the remaining 64-p bits, +1
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        found = np.zeros(len(h), dtype=bool)
        for i in range(64 - p + 1):
            hit = ~found & ((rest_work & mask) != 0)
            lz[hit] = i + 1
            found |= hit
            rest_work = rest_work << np.uint64(1)
        lz[~found] = 64 - p + 1
        return idx, lz

    def add_hashes(self, h: np.ndarray) -> None:
        idx, lz = self.hash_parts(h, self.p)
        np.maximum.at(self.registers, idx, lz)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        z = 1.0 / np.sum(np.exp2(-self.registers.astype(np.float64)))
        e = alpha * m * m * z
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # small-range correction
        return float(e)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def approx_distinct(ds: Dataset, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): one HLL per batch → merge.

    The shuffle-free sketch path: per-batch combiners emit 4 KB register
    blobs; the driver merges them.  Standard error ≈ 1.04/√(2^p) ≈ 1.6%
    at p=12."""

    def sketch_batch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        col = t[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # NULLs are not distinct values (SQL COUNT(DISTINCT) semantics) and
        # must not collide with a genuine '' — drop before hashing
        col = col.drop_null()
        if len(col) == 0:
            return pa.table({"sketch": pa.array([h.serialize()], type=pa.binary())})
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            hashes = fnv1a64(col)
        else:
            import pyarrow.compute as pc

            hashes = fnv1a64(pc.cast(col, pa.string()))
        h.add_hashes(hashes)
        return pa.table({"sketch": pa.array([h.serialize()], type=pa.binary())})

    merged = HyperLogLog(p)
    for batch in ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch["sketch"].to_pylist():
            merged = merged.merge(HyperLogLog.deserialize(blob, p))
    return merged.estimate()


def grouped_approx_distinct(
    ds: Dataset,
    keys: list[str],
    column: str,
    p: int = 12,
    out_name: str = "approx_distinct",
) -> "pd.DataFrame":
    """Approximate COUNT(DISTINCT column) PER GROUP — one mergeable HLL per
    key, built fully vectorized: a batch's rows update a (groups × 2^p)
    register MATRIX with a single ``np.maximum.at`` (no per-group Python),
    each batch emits one 2^p-byte blob per key it saw, and the blobs merge
    in a bucketed grouped reduce (register-wise max per key).  The exchange
    moves ``|keys seen in batch| × num_batches`` fixed-size rows — never
    the raw values — which is the point at unbounded value cardinality.

    Key-cardinality contract: per-batch state is |keys-in-batch| × 4 KB
    (p=12); for key spaces beyond ~10⁵ lower ``p`` or pre-partition by key.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from .relational import bucketed_group_reduce

    m = 1 << p

    def sketch_batch(t: pa.Table) -> pa.Table:
        mask = pc.is_valid(t[column])
        t = t.filter(mask)
        if len(t) == 0:
            return pa.table(
                {**{k: pa.array([], t.schema.field(k).type) for k in keys},
                 "sketch": pa.array([], type=pa.binary())}
            )
        col = t[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        typ = col.type
        if not (pa.types.is_string(typ) or pa.types.is_large_string(typ)):
            col = pc.cast(col, pa.string())
        hashes = fnv1a64(col)
        idx, lz = HyperLogLog.hash_parts(hashes, p)
        kdf = pd.DataFrame({k: t[k].to_pandas() for k in keys})
        codes, uniq = pd.factorize(pd.MultiIndex.from_frame(kdf) if len(keys) > 1 else kdf[keys[0]])
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), lz)
        if len(keys) > 1:
            key_cols = {k: pa.array([u[i] for u in uniq]) for i, k in enumerate(keys)}
        else:
            key_cols = {keys[0]: pa.array(uniq)}
        return pa.table(
            {**key_cols, "sketch": pa.array([r.tobytes() for r in regs], type=pa.binary())}
        )

    partials = ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)

    def merge_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        def est(blobs) -> float:
            regs = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(-1, m)
            h = HyperLogLog(p)
            h.registers = regs.max(axis=0)
            return h.estimate()

        out = df.groupby(keys, as_index=False, dropna=False)["sketch"].agg(est)
        return out.rename(columns={"sketch": out_name})

    out = bucketed_group_reduce(partials, keys, merge_bucket).to_pandas()
    return out.sort_values(keys, ignore_index=True)


def grouped_quantile_fixedpoint(
    ds: Dataset,
    key: str,
    value_col: str,
    q: float = 0.5,
    scale: int = 100,
    out_name: str = "quantile_value",
) -> "pd.DataFrame":
    """Per-group quantile via a mergeable FIXED-BIN HISTOGRAM sketch — the
    scale-safe replacement for ``groupby(key).map_groups(median)``, which
    ships every raw row of a group to one worker.

    Shape (same as the HLL sketch): per-batch combiners emit sparse
    ``(key, bin, n)`` histogram partials; a bucketed exchange merges them
    (the shuffle moves ≤ |keys|×|bins| partial rows, never raw values); the
    driver folds the tiny merged histogram into quantiles.

    EXACT — including SQL ``median()``'s mid-pair average for even counts —
    whenever values live on the 1/``scale`` grid (e.g. 2-decimal money
    amounts with scale=100).  For truly continuous values the result is a
    quantile approximation with error ≤ 1/(2·scale); raise ``scale`` or swap
    in a t-digest for that regime.  NULL values are ignored (SQL aggregate
    semantics).
    """
    import numpy as np
    import pandas as pd

    hist = grouped_histogram_fixedpoint(ds, key, value_col, scale)
    out_keys, out_vals = [], []
    for k, g in hist.groupby(key, sort=True, dropna=False):
        v = quantile_from_counts(g["bin"].to_numpy(), g["n"].to_numpy(), q)
        out_keys.append(k)
        out_vals.append(np.nan if v is None else v / scale)
    return pd.DataFrame({key: out_keys, out_name: out_vals})


def grouped_histogram_fixedpoint(
    ds: Dataset, key: str, value_col: str, scale: int = 100
) -> "pd.DataFrame":
    """The mergeable fixed-bin histogram underlying
    :func:`grouped_quantile_fixedpoint`, returned as a tiny driver frame of
    ``(key, bin, n)`` sorted by bin within key — ``bin = round(value*scale)``.
    One streaming pass; the exchange moves only ``(key, bin)`` partials.
    Callers derive medians, MADs, tail counts etc. from the counts without
    re-scanning.  NULL values land in a NULL bin (kept, so all-NULL groups
    still appear); callers drop it for quantile mass."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        vals = t[value_col]
        bins = pc.cast(pc.round(pc.multiply(vals, float(scale)), ndigits=0, round_mode="half_towards_infinity"), pa.int64())
        flat = pa.table({key: t[key], "bin": bins})
        g = flat.group_by([key, "bin"]).aggregate([([], "count_all")])
        return pa.table(
            {key: g[key], "bin": g["bin"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    from .relational import bucketed_group_reduce

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    hist = bucketed_group_reduce(
        partials,
        [key, "bin"],
        lambda df: df.groupby([key, "bin"], as_index=False, dropna=False)["n"].sum(),
    ).to_pandas()
    return hist.sort_values(["bin"], kind="stable").reset_index(drop=True)


def quantile_from_counts(bins, counts, q: float):
    """SQL ``quantile_cont`` (median's mid-pair average at q=0.5) from a
    sorted-by-bin histogram, in BIN units (caller divides by scale).
    Returns None when the histogram carries no non-null mass."""
    import numpy as np
    import pandas as pd

    mask = pd.notna(bins)
    bins = np.asarray(bins)[mask]
    counts = np.asarray(counts)[mask]
    total = int(counts.sum()) if len(counts) else 0
    if total == 0:
        return None
    cum = np.cumsum(counts)
    # 1-indexed rank positions; SQL median/quantile_cont interpolation
    pos = q * (total - 1) + 1
    lo_rank, hi_rank = int(np.floor(pos)), int(np.ceil(pos))
    lo_v = float(bins[np.searchsorted(cum, lo_rank)])
    hi_v = float(bins[np.searchsorted(cum, hi_rank)])
    return lo_v + (hi_v - lo_v) * (pos - lo_rank)


def quantile_disc_from_counts(bins, counts, q: float):
    """SQL ``quantile_disc`` (Postgres ``percentile_disc``: the first value
    whose cumulative fraction ≥ q, i.e. the 1-based rank ``ceil(q·n)``
    order statistic) from a sorted-by-bin histogram, in BIN units.
    Returns None when the histogram carries no non-null mass."""
    import numpy as np
    import pandas as pd

    mask = pd.notna(bins)
    bins = np.asarray(bins)[mask]
    counts = np.asarray(counts)[mask]
    total = int(counts.sum()) if len(counts) else 0
    if total == 0:
        return None
    rank = max(1, int(np.ceil(q * total)))
    cum = np.cumsum(counts)
    return int(bins[np.searchsorted(cum, rank)])


class CountMinSketch:
    """Mergeable ``depth × width`` counter matrix (Cormode & Muthukrishnan
    2005): point-query estimates NEVER underestimate, overestimate by
    ≤ εn with probability 1-δ where ε = e/width, δ = e^-depth.  Merging is
    elementwise addition, so per-batch partials combine in any tree shape.

    Hash family: one fixed salt per row, mixed through the murmur fmix64
    finalizer — pairwise-independent enough in practice, fully vectorized,
    and deterministic across processes (no seeding at runtime)."""

    def __init__(self, width: int = 8192, depth: int = 4):
        assert width > 0 and 1 <= depth <= 8
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), dtype=np.int64)

    _SALTS = np.uint64(0x9E3779B97F4A7C15) * np.arange(1, 9, dtype=np.uint64)

    def _rows(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices for uint64 key hashes."""
        h = np.asarray(h, dtype=np.uint64)
        idx = np.empty((self.depth, len(h)), dtype=np.int64)
        for d in range(self.depth):
            idx[d] = (mix64(h ^ self._SALTS[d]) % np.uint64(self.width)).astype(np.int64)
        return idx

    def add_hashes(self, h: np.ndarray, n: np.ndarray | None = None) -> None:
        idx = self._rows(h)
        weights = np.ones(len(np.asarray(h)), dtype=np.int64) if n is None else np.asarray(n, np.int64)
        for d in range(self.depth):
            np.add.at(self.counts[d], idx[d], weights)

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        """Upper-bound count per key (min over rows)."""
        if len(np.asarray(h)) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._rows(h)
        est = self.counts[0][idx[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.counts[d][idx[d]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        out = CountMinSketch(self.width, self.depth)
        out.counts = self.counts + other.counts
        return out

    def serialize(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, width: int = 8192, depth: int = 4) -> "CountMinSketch":
        s = cls(width, depth)
        s.counts = np.frombuffer(data, dtype=np.int64).reshape(depth, width).copy()
        return s


class BloomFilter:
    """Mergeable bitset membership sketch: NO false negatives, tunable false
    -positive rate ≈ (1 - e^(-kn/m))^k.  ``add_hashes``/``contains_hashes``
    consume uint64 key hashes; the k probe positions come from standard
    double hashing (Kirsch & Mitzenmacher 2006): ``(h1 + i·h2) mod m``.
    Merging is bitwise OR, so per-batch partials combine in any tree shape.

    At 10 bits/key the FP rate is ~1% with k=7 — a 10^10-key blocklist is a
    ~12 GB broadcast vs 80+ GB for the exact key set."""

    def __init__(self, n_bits: int, k: int = 7):
        assert n_bits >= 64 and 1 <= k <= 16
        self.n_bits = int(n_bits)
        self.k = k
        self.words = np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    @classmethod
    def for_capacity(cls, n_keys: int, bits_per_key: int = 10) -> "BloomFilter":
        k = max(1, int(round(bits_per_key * 0.6931)))  # ln2 · m/n minimizes FP
        return cls(max(64, n_keys * bits_per_key), k=min(16, k))

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing."""
        h = np.asarray(h, dtype=np.uint64)
        h1 = mix64(h)
        h2 = mix64(h ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)  # odd → full period
        pos = np.empty((self.k, len(h)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                pos[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
        return pos

    def add_hashes(self, h: np.ndarray) -> None:
        pos = self._positions(h)
        word = (pos >> np.uint64(6)).astype(np.int64).ravel()
        bit = np.uint64(1) << (pos & np.uint64(63)).ravel()
        np.bitwise_or.at(self.words, word, bit)

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Boolean mask; True may be a false positive, False never wrong."""
        if len(np.asarray(h)) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hit = (self.words[word] & bit) != 0
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        out = BloomFilter(self.n_bits, self.k)
        out.words = self.words | other.words
        return out

    def serialize(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, n_bits: int, k: int = 7) -> "BloomFilter":
        b = cls(n_bits, k)
        b.words = np.frombuffer(data, dtype=np.uint64).copy()
        return b


class KLLSketch:
    """KLL streaming quantile sketch (public algorithm: Karnin, Lang &
    Liberty, "Optimal Quantile Approximation in Streams", FOCS 2016; layout
    follows the Apache DataSketches description).

    Levels of float64 buffers; an item at level ``h`` represents ``2**h``
    originals.  When total size exceeds the capacity budget, the lowest
    over-full level is sorted and every other item (random start offset)
    promotes to the next level.  Mergeable: concatenate levels pairwise,
    re-compact — so per-batch sketches combine associatively regardless of
    Ray's block arrival order.  Normalized rank error ~ 1/k with small
    constants (pytest-checked empirically at < 0.025 for k=200).

    The compaction coin uses a deterministic per-sketch counter-seeded RNG —
    reproducible for a fixed partitioning; the ACCURACY contract, not
    bitwise output, is the cross-run invariant (same as HLL's estimate).
    """

    C = 2.0 / 3.0

    def __init__(self, k: int = 200, seed: int = 0xC0FFEE):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0  # total weight (count of originals)
        self._rng = np.random.default_rng(seed)

    # -- capacity rule: level h (0 = raw) in a sketch with H levels holds
    # up to ceil(k * C**(H-1-h)), floored at 2
    def _cap(self, h: int) -> int:
        depth = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (self.C ** depth))))

    def _budget(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(b) for b in self.levels)

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._budget():
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._cap(h):
                    self._compact_level(h)
                    break
            else:  # within per-level caps but over total — compact level 0
                self._compact_level(0)

    def _compact_level(self, h: int) -> None:
        buf = np.sort(self.levels[h])
        if len(buf) < 2:
            return
        if len(buf) % 2 == 1:  # odd item stays behind (keeps weight exact)
            keep_odd = buf[-1:]
            buf = buf[:-1]
        else:
            keep_odd = np.empty(0, dtype=np.float64)
        off = int(self._rng.integers(0, 2))
        promoted = buf[off::2]
        self.levels[h] = keep_odd
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        out = KLLSketch(self.k)
        out._rng = self._rng
        H = max(len(self.levels), len(other.levels))
        out.levels = [
            np.concatenate(
                [
                    (self.levels[h] if h < len(self.levels) else np.empty(0)),
                    (other.levels[h] if h < len(other.levels) else np.empty(0)),
                ]
            ).astype(np.float64)
            for h in range(H)
        ]
        out.n = self.n + other.n
        out._compress()
        return out

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items = np.concatenate(self.levels)
        weights = np.concatenate(
            [np.full(len(b), 1 << h, dtype=np.int64) for h, b in enumerate(self.levels)]
        )
        order = np.argsort(items, kind="stable")
        return items[order], weights[order]

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        items, weights = self._weighted()
        cum = np.cumsum(weights)
        target = q * self.n
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(items[min(idx, len(items) - 1)])

    def quantiles(self, qs: list[float]) -> list[float]:
        if self.n == 0:
            return [float("nan")] * len(qs)
        items, weights = self._weighted()
        cum = np.cumsum(weights)
        idxs = np.searchsorted(cum, np.asarray(qs) * self.n, side="left")
        return [float(items[min(int(i), len(items) - 1)]) for i in idxs]

    def rank(self, value: float) -> float:
        """Estimated normalized rank of ``value`` (fraction of items <= it)."""
        if self.n == 0:
            return float("nan")
        items, weights = self._weighted()
        cum = np.cumsum(weights)
        idx = int(np.searchsorted(items, value, side="right"))
        return float(cum[idx - 1] / self.n) if idx > 0 else 0.0

    def serialize(self) -> bytes:
        import struct

        head = struct.pack("<qqq", self.k, self.n, len(self.levels))
        parts = [head]
        for b in self.levels:
            parts.append(struct.pack("<q", len(b)))
            parts.append(np.ascontiguousarray(b).tobytes())
        return b"".join(parts)

    @classmethod
    def deserialize(cls, data: bytes) -> "KLLSketch":
        import struct

        k, n, n_levels = struct.unpack_from("<qqq", data, 0)
        off = 24
        s = cls(k)
        s.n = n
        s.levels = []
        for _ in range(n_levels):
            (cnt,) = struct.unpack_from("<q", data, off)
            off += 8
            s.levels.append(np.frombuffer(data, dtype=np.float64, count=cnt, offset=off).copy())
            off += 8 * cnt
        return s


def approx_quantiles(
    ds: Dataset, column: str, qs: list[float], k: int = 200
) -> dict[float, float]:
    """Approximate quantiles of ``column`` via per-batch KLL sketches merged
    on the driver (same shuffle-free shape as :func:`approx_distinct`): the
    exchange moves one ~``8*k``-byte blob per batch, never the values —
    the scale path where the exact fixed-point histogram
    (:func:`grouped_quantile_fixedpoint`) would need unbounded bins."""
    import pyarrow.compute as pc

    def sketch_batch(t: pa.Table) -> pa.Table:
        s = KLLSketch(k)
        col = t[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        if len(col) > 0:
            s.update_many(pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([s.serialize()], type=pa.binary())})

    merged = KLLSketch(k)
    for batch in ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch["sketch"].to_pylist():
            merged = merged.merge(KLLSketch.deserialize(blob))
    vals = merged.quantiles(list(qs))
    return dict(zip(qs, vals))


def grouped_approx_quantiles(
    ds: Dataset,
    keys: list[str],
    column: str,
    qs: list[float],
    k: int = 160,
    prefix: str = "q",
) -> "pd.DataFrame":
    """Approximate quantiles of ``column`` PER GROUP — one mergeable KLL per
    key: each batch sorts rows by factorized key code once, slices the value
    array per key (the only per-key Python is one ``update_many`` call per
    key-in-batch), and emits one ~``8*k``-byte blob per key; blobs merge per
    key in a bucketed grouped reduce.  Same exchange shape (and same
    key-cardinality contract) as :func:`grouped_approx_distinct`: the
    shuffle moves |keys-in-batch| x num_batches fixed-size rows, never the
    values."""
    import pandas as pd
    import pyarrow.compute as pc

    from .relational import bucketed_group_reduce

    def sketch_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[column]))
        if len(t) == 0:
            return pa.table(
                {**{kk: pa.array([], t.schema.field(kk).type) for kk in keys},
                 "sketch": pa.array([], type=pa.binary())}
            )
        vals = pc.cast(t[column], pa.float64()).to_numpy(zero_copy_only=False)
        kdf = pd.DataFrame({kk: t[kk].to_pandas() for kk in keys})
        codes, uniq = pd.factorize(
            pd.MultiIndex.from_frame(kdf) if len(keys) > 1 else kdf[keys[0]]
        )
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniq) + 1))
        blobs = []
        for i in range(len(uniq)):
            s = KLLSketch(k)
            s.update_many(vals[order[bounds[i]:bounds[i + 1]]])
            blobs.append(s.serialize())
        if len(keys) > 1:
            key_cols = {kk: pa.array([u[i] for u in uniq]) for i, kk in enumerate(keys)}
        else:
            key_cols = {keys[0]: pa.array(uniq)}
        return pa.table({**key_cols, "sketch": pa.array(blobs, type=pa.binary())})

    partials = ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True)

    def merge_bucket(df: "pd.DataFrame") -> "pd.DataFrame":
        def est(blobs) -> list[float]:
            it = iter(blobs)
            m = KLLSketch.deserialize(next(it))
            for b in it:
                m = m.merge(KLLSketch.deserialize(b))
            return m.quantiles(list(qs))

        out = df.groupby(keys, as_index=False, dropna=False)["sketch"].agg(est)
        names = [f"{prefix}{str(q).replace('0.', '')}" for q in qs]
        out[names] = pd.DataFrame(out["sketch"].tolist(), index=out.index)
        return out.drop(columns=["sketch"])

    out = bucketed_group_reduce(partials, keys, merge_bucket).to_pandas()
    return out.sort_values(keys, ignore_index=True)


class MisraGries:
    """Misra-Gries heavy-hitter summary (public algorithm: Misra & Gries
    1982; merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012).

    Keeps at most ``k`` counters; any item with true frequency
    ``> n/(k+1)`` is guaranteed present, and each kept count underestimates
    the truth by at most ``n/(k+1)``.  Unlike CMS this bound is
    DETERMINISTIC (no hash collisions), and unlike the exact two-pass
    heavy hitters it needs one pass.  Merge: sum counters, subtract the
    (k+1)-th largest count, drop non-positive — error bounds add."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.counts: dict = {}
        self.n = 0  # total stream weight

    def update_counts(self, values, counts) -> None:
        """Bulk update from pre-aggregated (value, count) pairs — the
        per-batch path: callers np.unique the batch first so this loop is
        over DISTINCT batch values only."""
        c = self.counts
        for v, w in zip(values, counts):
            w = int(w)
            self.n += w
            c[v] = c.get(v, 0) + w
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = sorted(self.counts.values(), reverse=True)
        cut = vals[self.k]  # (k+1)-th largest
        self.counts = {v: c - cut for v, c in self.counts.items() if c > cut}

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k)
        out.n = self.n + other.n
        out.counts = dict(self.counts)
        for v, c in other.counts.items():
            out.counts[v] = out.counts.get(v, 0) + c
        out._shrink()
        return out

    def items(self) -> list[tuple]:
        """(value, lower-bound count) sorted by count desc, then value."""
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))

    def error_bound(self) -> float:
        return self.n / (self.k + 1)


def mg_heavy_hitters(ds: Dataset, column: str, k: int = 256) -> "pd.DataFrame":
    """One-pass deterministic heavy hitters over ``column``: per-batch
    ``value_counts`` (vectorized) feed per-batch Misra-Gries summaries that
    merge on the driver — the exchange carries <= k (value,count) pairs per
    batch.  Complements the exact two-pass ``tokens.heavy_hitters`` (needs
    two reads) and the randomized ``CountMinSketch`` (probabilistic)."""
    import pandas as pd
    import pyarrow.compute as pc

    def sketch_batch(t: pa.Table) -> pa.Table:
        mg = MisraGries(k)
        col = t[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        if len(col) > 0:
            vc = pc.value_counts(col)
            mg.update_counts(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
        import pickle

        return pa.table({"sketch": pa.array([pickle.dumps((mg.n, mg.counts))],
                                            type=pa.binary())})

    import pickle

    merged = MisraGries(k)
    for batch in ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch["sketch"].to_pylist():
            o = MisraGries(k)
            o.n, o.counts = pickle.loads(blob)
            merged = merged.merge(o)
    rows = merged.items()
    return pd.DataFrame(
        {column: [v for v, _ in rows], "count_lb": [c for _, c in rows],
         "err_ub": [int(np.ceil(merged.error_bound()))] * len(rows)}
    )


class KMVSketch:
    """KMV / bottom-k distinct sketch (public algorithm: Bar-Yossef et al.
    2002; Beyer et al. SIGMOD 2007 for the unbiased estimator; same family
    as the Theta sketch).  Keeps the k smallest 64-bit value hashes —
    supports the SET OPERATIONS HyperLogLog cannot: Jaccard between two
    sketches is estimated on the bottom-k of their union, giving
    intersection cardinalities (distinct users in A AND B) from mergeable
    per-batch state."""

    def __init__(self, k: int = 1024):
        self.k = int(k)
        self.values = np.empty(0, dtype=np.uint64)  # sorted, unique

    def add_hashes(self, hashes: np.ndarray) -> None:
        # fmix64 first: KMV's estimator keys off order statistics of the
        # hash VALUES — raw FNV of short similar keys is not uniform enough
        # in the low tail (same reason HLL finalizes before register pick)
        h = mix64(np.asarray(hashes, dtype=np.uint64))
        self.values = np.unique(np.concatenate([self.values, h]))[: self.k]

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        assert self.k == other.k
        out = KMVSketch(self.k)
        out.values = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        return out

    def estimate(self) -> float:
        n = len(self.values)
        if n < self.k:
            return float(n)  # below capacity the sketch is exact
        # unbiased: (k-1) / normalized k-th minimum
        kth = float(self.values[self.k - 1]) + 1.0
        return (self.k - 1) / (kth / 2.0**64)

    def jaccard(self, other: "KMVSketch") -> float:
        u = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        if len(u) == 0:
            return 0.0
        both = np.isin(u, self.values, assume_unique=True) & np.isin(
            u, other.values, assume_unique=True
        )
        return float(both.sum()) / len(u)

    def intersection_estimate(self, other: "KMVSketch") -> float:
        union = self.merge(other).estimate()
        return self.jaccard(other) * union

    def serialize(self) -> bytes:
        return self.values.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, k: int) -> "KMVSketch":
        s = cls(k)
        s.values = np.frombuffer(data, dtype=np.uint64).copy()
        return s


def kmv_column_sketch(ds: Dataset, column: str, k: int = 1024) -> KMVSketch:
    """One KMV over ``column``: per-batch bottom-k blobs (<= 8k bytes each)
    merged on the driver — the same shuffle-free shape as
    :func:`approx_distinct`, but the result supports union/intersection/
    Jaccard against other sketches."""
    import pyarrow.compute as pc

    def sketch_batch(t: pa.Table) -> pa.Table:
        s = KMVSketch(k)
        col = t[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        if len(col) > 0:
            typ = col.type
            if not (pa.types.is_string(typ) or pa.types.is_large_string(typ)):
                col = pc.cast(col, pa.string())
            s.add_hashes(fnv1a64(col))
        return pa.table({"sketch": pa.array([s.serialize()], type=pa.binary())})

    merged = KMVSketch(k)
    for batch in ds.map_batches(
        sketch_batch, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch["sketch"].to_pylist():
            merged = merged.merge(KMVSketch.deserialize(blob, k))
    return merged
