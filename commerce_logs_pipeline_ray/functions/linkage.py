"""Blocked record linkage (entity resolution) over a dirty-string column.

The all-pairs edit-distance join is O(N²); the standard scale shape is
**multi-pass blocking**: emit each record under K cheap block keys (here:
first-3-chars and last-3-chars of the name), generate candidate pairs only
WITHIN a block, verify candidates with exact Levenshtein, and de-duplicate
pairs that matched under several keys.  Recall is exactly "the union of the
blocking passes" — a pair that differs in both its prefix and its suffix is
out of scope by construction (documented operator semantics, mirrored 1:1
by the SQL oracle's identical block keys).

Ray shape: one map_batches fans each record out to its K block-key rows; a
single hash exchange on the block key co-locates candidates; the per-block
verify is a vectorized batch Levenshtein — numpy DP column sweeps applied
across ALL pairs of the block at once, never a per-pair Python loop; pair
dedup is a distributed grouped min over the (id_a, id_b) key, so the pair
set never materializes on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .relational import bucketed_group_reduce


def levenshtein_batch(a, b) -> np.ndarray:
    """Exact unit-cost Levenshtein (insert/delete/substitute) for N string
    pairs at once.

    The vectorization axis is the PAIR: the DP table is swept column by
    column over b; substitution/insertion terms are one vector min, and the
    within-column deletion chain — the usually-sequential part — resolves in
    one ``np.minimum.accumulate`` over ``D - row_index`` (delete steps cost
    exactly 1, so the prefix-min transform is exact).  Each pair's answer is
    snapshotted when the sweep passes its own length ``len(b_i)``.  Same
    O(N·La·Lb) cells as the scalar DP, at numpy throughput.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype="int64")
    la = np.fromiter((len(s) for s in a), dtype="int64", count=n)
    lb = np.fromiter((len(s) for s in b), dtype="int64", count=n)
    ma, mb = int(la.max(initial=0)), int(lb.max(initial=0))
    out = np.where(lb == 0, la, np.int64(0))
    if ma == 0:
        return np.where(la == 0, lb, la)
    # char-code matrices padded with two DISTINCT sentinels: a padding cell
    # can never equal a real char or the other side's padding
    ca = np.full((n, ma), -1, dtype="int64")
    for i, s in enumerate(a):
        if s:
            ca[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype="uint32")
    cb = np.full((n, max(mb, 1)), -2, dtype="int64")
    for i, s in enumerate(b):
        if s:
            cb[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype="uint32")

    rows = np.arange(ma + 1, dtype="int64")
    prev = np.broadcast_to(rows, (n, ma + 1)).copy()  # column j=0: D[i][0]=i
    for j in range(1, mb + 1):
        t = np.empty_like(prev)
        t[:, 0] = j
        sub_cost = (ca != cb[:, j - 1 : j]).astype("int64")
        np.minimum(prev[:, :-1] + sub_cost, prev[:, 1:] + 1, out=t[:, 1:])
        t -= rows
        np.minimum.accumulate(t, axis=1, out=t)
        t += rows
        hit = lb == j
        if hit.any():
            out[hit] = t[hit, la[hit]]
        prev = t
    return out


LINKAGE_WINDOW = 8


def link_records(
    records: Dataset,
    id_col: str = "rec_id",
    name_col: str = "name",
    max_dist: int = 2,
    window: int = LINKAGE_WINDOW,
    num_buckets: int = 64,
    metric: str = "levenshtein",
) -> Dataset:
    """Multi-pass SORTED-NEIGHBORHOOD linkage (Hernández & Stolfo 1995,
    public method): two passes — block on the first-3-chars sorted by name,
    and on the last-3-chars sorted by the reversed name — and compare each
    record only to its ``window`` successors in the block's sort order;
    survivors have Levenshtein ≤ ``max_dist``.  Candidate count is
    O(n·window) PER BLOCK regardless of block density (a shared-prefix
    corpus would make all-pairs blocking quadratic in both compute and
    output), which is the property that holds at 100-TB record counts.
    Returns the distributed pair Dataset (id_a < id_b, dist).
    """

    def block_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        names = t[name_col].combine_chunks()
        # suffix key = first 3 chars of the REVERSED name (slice takes only
        # scalar offsets; reversal is a bijection so key equality is the
        # same as comparing true suffixes) — the SQL oracle mirrors it as
        # substr(reverse(name), 1, 3); the pass sorts by the reversed name
        # so suffix-sharing records are window-adjacent
        def _arr(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

        rev = _arr(pc.utf8_reverse(names))
        pre = _arr(pc.binary_join_element_wise("p", pc.utf8_slice_codeunits(names, 0, 3), ""))
        suf = _arr(pc.binary_join_element_wise("s", pc.utf8_slice_codeunits(rev, 0, 3), ""))
        return pa.table(
            {
                "bk": pa.concat_arrays([pre, suf]),
                "skey": pa.concat_arrays([names, rev]),
                id_col: pa.concat_arrays([t[id_col].combine_chunks()] * 2),
                name_col: pa.concat_arrays([names] * 2),
            }
        )

    blocked = records.map_batches(block_rows, batch_format="pyarrow", zero_copy_batch=True)

    def verify_block(df: pd.DataFrame) -> pd.DataFrame:
        # gather every block's window candidates first, then ONE batched DP
        # over the whole bucket — the kernel vectorizes across pairs, so
        # per-block-per-offset calls would waste its throughput
        na_all, nb_all, ida_all, idb_all = [], [], [], []
        for _, g in df.groupby("bk", sort=False):
            n = len(g)
            if n < 2:
                continue
            g = g.sort_values(["skey", id_col], kind="stable")
            ids = g[id_col].to_numpy(np.int64)
            names = g[name_col].to_numpy()
            lens = np.fromiter((len(s) for s in names), np.int64, n)
            # char-multiset L1 bound: every unit edit (incl. a transposition,
            # which leaves the multiset unchanged) moves the histogram by at
            # most 2 in L1 — SOUND for Levenshtein AND Damerau verify
            hist = np.zeros((n, 128), np.int16)
            for i, s in enumerate(names):
                bb = np.frombuffer(s.encode("ascii", "replace"), np.uint8)
                np.add.at(hist[i], bb & 127, 1)
            for off in range(1, min(window, n - 1) + 1):
                ci = np.arange(n - off)
                cj = ci + off
                band = np.abs(lens[ci] - lens[cj]) <= max_dist
                ci, cj = ci[band], cj[band]
                if not len(ci):
                    continue
                l1 = np.abs(hist[ci].astype(np.int32) - hist[cj]).sum(1)
                near = l1 <= 2 * max_dist
                ci, cj = ci[near], cj[near]
                if not len(ci):
                    continue
                na_all.append(names[ci])
                nb_all.append(names[cj])
                ida_all.append(ids[ci])
                idb_all.append(ids[cj])
        if not na_all:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "dist": pd.Series(dtype="int64")}
            )
        na = np.concatenate(na_all)
        nb = np.concatenate(nb_all)
        kernel = damerau_levenshtein_batch if metric == "damerau" else levenshtein_batch
        d = kernel(list(na), list(nb))
        keep = d <= max_dist
        a = np.concatenate(ida_all)[keep]
        b = np.concatenate(idb_all)[keep]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b), "dist": d[keep]})

    pairs = bucketed_group_reduce(blocked, ["bk"], verify_block, num_buckets=num_buckets)

    # a pair seen in both the prefix and the suffix block dedups here (dist
    # is a function of the pair, so this grouped pass is a pure DISTINCT)
    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"], ignore_index=True)

    return bucketed_group_reduce(pairs, ["id_a", "id_b"], dedup_bucket)


def symspell_edit1_join(
    records: Dataset,
    id_col: str = "rec_id",
    name_col: str = "name",
    num_buckets: int = 64,
) -> Dataset:
    """Edit-distance-≤1 self-join with EXACT recall via SymSpell deletion
    neighborhoods (Garbe's symmetric-delete blocking, public algorithm):
    two strings are within one edit iff they share a key in
    ``{s} ∪ del1(s)`` (delete one char).  Unlike :func:`link_records`'s
    prefix/suffix blocks — whose recall is the documented union of the
    passes — the deletion-key block loses NO true pair at d ≤ 1; the
    Levenshtein verify only prunes false candidates (two different
    deletions can meet at the same key, e.g. "ab"/"ba" → "a"/"b", which
    are distance 2).

    Ray shape: one map_batches fans each record to its 1 + len(name) keys,
    one hash exchange on the key, per-key vectorized verify
    (:func:`levenshtein_batch`), then a distributed pair-distinct — the
    same exchange discipline as the blocked linkage, with a key count
    linear in the string length instead of a fixed 2.
    """

    def fan_keys(t: pa.Table) -> pa.Table:
        ids_out, names_out, keys_out = [], [], []
        for rid, nm in zip(t[id_col].to_pylist(), t[name_col].to_pylist()):
            ids_out.append(rid)
            names_out.append(nm)
            keys_out.append(nm)
            for i in range(len(nm)):
                ids_out.append(rid)
                names_out.append(nm)
                keys_out.append(nm[:i] + nm[i + 1 :])
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                name_col: pa.array(names_out),
                "bk": pa.array(keys_out),
            }
        )

    _EMPTY = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "dist": pd.Series(dtype="int64"),
        }
    )

    def verify_key(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized candidate enumeration — no per-group pandas work:
        # drop singleton keys, dedup (key, record), then expand intra-key
        # pairs by SIZE CLASS (all groups of size s reshape to a (k, s)
        # matrix and share one triu_indices), dedup candidate pairs, and run
        # ONE batched Levenshtein over the survivors.
        df = df.drop_duplicates(["bk", id_col])
        counts = df["bk"].value_counts()
        df = df[df["bk"].map(counts) >= 2]
        if df.empty:
            return _EMPTY.copy()
        df = df.sort_values(["bk", id_col], kind="stable")
        ids = df[id_col].to_numpy(np.int64)
        names = df[name_col].to_numpy()
        bk_codes, _ = pd.factorize(df["bk"], sort=False)
        sizes = np.bincount(bk_codes)
        starts = np.cumsum(sizes) - sizes
        pa_idx, pb_idx = [], []
        for s in np.unique(sizes):
            grp_starts = starts[sizes == s]
            mat = grp_starts[:, None] + np.arange(s)[None, :]
            ia, ib = np.triu_indices(int(s), k=1)
            pa_idx.append(mat[:, ia].ravel())
            pb_idx.append(mat[:, ib].ravel())
        ia = np.concatenate(pa_idx)
        ib = np.concatenate(pb_idx)
        id_a, id_b = ids[ia], ids[ib]
        lo = np.minimum(id_a, id_b)
        hi = np.maximum(id_a, id_b)
        # dedup candidates shared by several deletion keys BEFORE the DP
        # (np.unique(axis=0) — id-width-safe pair identity)
        uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
        lo_u, hi_u = uniq[:, 0], uniq[:, 1]
        pos = dict(zip(ids.tolist(), range(len(ids))))
        na = [names[pos[int(a)]] for a in lo_u]
        nb = [names[pos[int(b)]] for b in hi_u]
        d = levenshtein_batch(na, nb)
        keep = d <= 1
        if not keep.any():
            return _EMPTY.copy()
        return pd.DataFrame(
            {"id_a": lo_u[keep], "id_b": hi_u[keep], "dist": d[keep]}
        )

    fanned = records.map_batches(fan_keys, batch_format="pyarrow")
    pairs = bucketed_group_reduce(fanned, ["bk"], verify_key, num_buckets=num_buckets)

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"], ignore_index=True)

    return bucketed_group_reduce(pairs, ["id_a", "id_b"], dedup_bucket)


def _char_matrix(names) -> tuple[np.ndarray, np.ndarray]:
    """(N, L) uint8 char-code matrix (zero-padded) + int64 lengths for a
    list of ASCII strings."""
    lens = np.fromiter((len(s) for s in names), np.int64, len(names))
    L = int(lens.max()) if len(lens) else 1
    mat = np.zeros((len(names), max(L, 1)), np.uint8)
    for i, s in enumerate(names):
        b = s.encode("ascii")
        mat[i, : len(b)] = np.frombuffer(b, np.uint8)
    return mat, lens


def jaro_winkler_batch(a_names, b_names) -> np.ndarray:
    """Classic Jaro-Winkler similarity (Winkler 1990: p=0.1, prefix ≤ 4,
    boost only when jaro > 0.7; transpositions = mismatched-position count
    // 2, matching DuckDB's ``jaro_winkler_similarity``) for N ASCII string
    pairs at once.

    Vectorization axis is the PAIR: the greedy smallest-available-window
    match resolves with an O(L²) double loop whose body is one vectorized
    mask over all pairs — L is the max name length (short identifiers), so
    the work is L² fused numpy passes, never a per-pair Python loop."""
    A, la = _char_matrix(list(a_names))
    B, lb = _char_matrix(list(b_names))
    P = len(la)
    if P == 0:
        return np.zeros(0, np.float64)
    L = max(A.shape[1], B.shape[1])
    if A.shape[1] < L:
        A = np.pad(A, ((0, 0), (0, L - A.shape[1])))
    if B.shape[1] < L:
        B = np.pad(B, ((0, 0), (0, L - B.shape[1])))
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    found = np.full((P, L), -1, np.int64)
    used = np.zeros((P, L), bool)
    cols = np.arange(L, dtype=np.int64)
    for i in range(L):
        f = np.full(P, -1, np.int64)
        ai = A[:, i]
        in_s1 = (i < la) & (ai != 0)
        for j in range(L):
            ok = ((f < 0) & in_s1 & (j < lb) & ~used[:, j]
                  & (ai == B[:, j]) & (abs(i - j) <= w))
            f[ok] = j
        rows = np.nonzero(f >= 0)[0]
        used[rows, f[rows]] = True
        found[:, i] = f

    mk = found >= 0
    m = mk.sum(1).astype(np.int64)
    # matched chars of s1 in i-order and of s2 in j-order, rank-scattered
    s1m = np.zeros((P, L), np.uint8)
    r1 = np.cumsum(mk, 1) - 1
    rows, cc = np.nonzero(mk)
    s1m[rows, r1[rows, cc]] = A[rows, cc]
    s2m = np.zeros((P, L), np.uint8)
    r2 = np.cumsum(used, 1) - 1
    rows2, cc2 = np.nonzero(used)
    s2m[rows2, r2[rows2, cc2]] = B[rows2, cc2]
    t_full = ((s1m != s2m) & (cols[None, :] < m[:, None])).sum(1)
    t = t_full // 2

    safe_m = np.maximum(m, 1).astype(np.float64)
    sla = np.maximum(la, 1).astype(np.float64)
    slb = np.maximum(lb, 1).astype(np.float64)
    jaro = np.where(
        m > 0,
        (m / sla + m / slb + (m - t) / safe_m) / 3.0,
        0.0)
    pref_w = min(4, L)
    eq = (A[:, :pref_w] == B[:, :pref_w]) & (cols[:pref_w][None, :] < np.minimum(la, lb)[:, None])
    pref = np.cumprod(eq, 1).sum(1)
    return np.where(jaro > 0.7, jaro + 0.1 * pref * (1.0 - jaro), jaro)


def damerau_levenshtein_batch(a, b, chunk: int = 100_000) -> np.ndarray:
    """TRUE Damerau-Levenshtein (unrestricted adjacent transpositions,
    Damerau 1964 / Lowrance-Wagner 1975) for N ASCII string pairs at once —
    pinned bitwise against DuckDB's ``damerau_levenshtein`` by fuzz tests.

    Vectorization axis is the PAIR: the full (la+2)×(lb+2) matrix algorithm
    (the ``da``/``db`` last-occurrence bookkeeping needs random access into
    earlier rows, so no rolling-column trick) runs as L² fused numpy steps
    over all pairs of a chunk; memory is bounded by ``chunk``·(L+2)²."""
    a = list(a)
    b = list(b)
    out = np.zeros(len(a), np.int64)
    for lo in range(0, len(a), chunk):
        out[lo: lo + chunk] = _dl_chunk(a[lo: lo + chunk], b[lo: lo + chunk])
    return out


def _dl_chunk(a: list, b: list) -> np.ndarray:
    P = len(a)
    if P == 0:
        return np.zeros(0, np.int64)
    A, la = _char_matrix(a)
    B, lb = _char_matrix(b)
    La, Lb = A.shape[1], B.shape[1]
    maxd = (la + lb).astype(np.int32)
    H = np.zeros((P, La + 2, Lb + 2), np.int32)
    H[:, 0, :] = maxd[:, None]
    H[:, :, 0] = maxd[:, None]
    # H[1, j+1] = j where j <= lb, else maxd (out-of-range guard)
    js = np.arange(Lb + 1, dtype=np.int32)
    H[:, 1, 1:] = np.where(js[None, :] <= lb[:, None], js[None, :], maxd[:, None])
    iss = np.arange(La + 1, dtype=np.int32)
    H[:, 1:, 1] = np.where(iss[None, :] <= la[:, None], iss[None, :], maxd[:, None])
    da = np.zeros((P, 128), np.int32)
    rows = np.arange(P)
    Hf = H.reshape(P, -1)
    W = Lb + 2
    for i in range(1, La + 1):
        ai = A[:, i - 1].astype(np.int64)
        in_a = i <= la
        db = np.zeros(P, np.int32)
        for j in range(1, Lb + 1):
            bj = B[:, j - 1].astype(np.int64)
            k = da[rows, bj & 127]
            l = db
            eq = (ai == bj) & in_a & (j <= lb)
            cost = np.where(eq, 0, 1).astype(np.int32)
            db = np.where(eq, j, db)
            trans = Hf[rows, k * W + l] + (i - k - 1) + 1 + (j - l - 1)
            v = np.minimum(
                np.minimum(H[:, i, j] + cost, H[:, i + 1, j] + 1),
                np.minimum(H[:, i, j + 1] + 1, trans))
            H[:, i + 1, j + 1] = v
        da[rows[in_a], ai[in_a] & 127] = i
    return Hf[rows, (la + 1) * W + (lb + 1)].astype(np.int64)
