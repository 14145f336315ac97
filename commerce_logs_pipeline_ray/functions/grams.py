"""Corpus-level word-k-gram analyses for training-data curation.

Built on the same vectorized gram-hash kernel as the dedup family
(:func:`functions.dedup.gram_hash_stream` — one Arrow-buffer FNV pass per
batch, k-grams by shifted-array mixing, no per-gram strings):

* **contamination_counts** — benchmark/test-set contamination check: the
  distinct grams of a (small) benchmark subset are collected once and
  broadcast (``ray.put``); one streaming pass over the corpus counts, per
  document, how many of its gram OCCURRENCES appear in the benchmark set.
  The classic aggregate → broadcast → scan shape: the corpus is never
  shuffled, and only tiny per-source partial rows leave each task.
* **repetition_stats** — intra-document repetition: per-doc total vs
  DISTINCT gram counts (boilerplate / degenerate-generation detector).
  Entirely block-local — no shuffle at all; per-source partials are the
  only thing reduced.

Both are SQL-expressible over the same gram semantics (DuckDB
``string_split`` + list-slice explode, see ``pipelines/queries.py``), so the
driver's DuckDB oracle checks them end-to-end.  Gram semantics are defined
for docs with ≥ k words (all provided corpora; shorter docs hash as one
padded gram, see ``gram_hash_stream``).

Scale notes (100 TB): the benchmark gram set is Θ(|benchmark| · grams/doc)
— a held-out eval set, orders of magnitude smaller than the corpus; it is
``ray.put`` once and read zero-copy by every task.  If the benchmark itself
were huge, swap the broadcast for a bucketed semi-join on gram hash (same
exchange as functions/dedup.py::ngram_jaccard_pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .dedup import gram_hash_stream


def _gram_mix(k: int, seed: int) -> np.ndarray:
    # identical parameter derivation to ShingleExploder/MinHasher (seed+1) so
    # every gram-based operator in the engine shares one gram-hash space
    rng = np.random.default_rng(seed + 1)
    return rng.integers(1, 1 << 62, size=k, dtype=np.uint64)


def benchmark_gram_set(
    docs: Dataset, bench_mod: int = 29, k: int = 3, seed: int = 42
) -> np.ndarray:
    """Sorted distinct gram hashes of the benchmark subset
    (``doc_id % bench_mod == 0``).  Distinct-per-batch partials are unioned
    on the driver — the set is benchmark-sized, not corpus-sized."""
    mix = _gram_mix(k, seed)

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sub = t.filter(pa.array(ids % bench_mod == 0))
        if len(sub) == 0:
            return pa.table({"gram": pa.array([], type=pa.uint64())})
        grams, _ = gram_hash_stream(sub["text"].to_pylist(), k, mix)
        return pa.table({"gram": pa.array(np.unique(grams))})

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return np.unique(parts["gram"].to_numpy().astype(np.uint64))


def contamination_counts(
    docs: Dataset,
    bench_mod: int = 29,
    k: int = 3,
    seed: int = 42,
    group_col: str = "source",
) -> pd.DataFrame:
    """Per-``group_col``: how many non-benchmark docs share ≥1 word k-gram
    with the benchmark subset, and the total count of overlapping gram
    occurrences.  Returns (group, n_docs, n_contaminated, total_hits)."""
    bench = benchmark_gram_set(docs, bench_mod=bench_mod, k=k, seed=seed)
    bench_ref = ray.put(bench)
    mix = _gram_mix(k, seed)

    def partial(t: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        sub = t.filter(pa.array(ids % bench_mod != 0))
        n = len(sub)
        if n == 0:
            return pa.table(
                {group_col: pa.array([], type=pa.string()),
                 "n_docs": pa.array([], type=pa.int64()),
                 "n_contaminated": pa.array([], type=pa.int64()),
                 "total_hits": pa.array([], type=pa.int64())}
            )
        grams, g_starts = gram_hash_stream(sub["text"].to_pylist(), k, mix)
        # sorted-array membership: searchsorted beats np.isin's internal sort
        # because bench is pre-sorted once
        idx = np.searchsorted(bset, grams)
        idx[idx == len(bset)] = 0
        hit = (bset[idx] == grams).astype(np.int64) if len(bset) else np.zeros(len(grams), np.int64)
        csum = np.concatenate([[0], np.cumsum(hit)])
        per_doc = csum[g_starts[1:]] - csum[g_starts[:-1]]
        flat = pa.table(
            {group_col: sub[group_col],
             "n_docs": pa.array(np.ones(n, dtype=np.int64)),
             "n_contaminated": pa.array((per_doc > 0).astype(np.int64)),
             "total_hits": pa.array(per_doc)}
        )
        g = flat.group_by([group_col]).aggregate(
            [("n_docs", "sum"), ("n_contaminated", "sum"), ("total_hits", "sum")]
        )
        return pa.table(
            {group_col: g[group_col], "n_docs": g["n_docs_sum"],
             "n_contaminated": g["n_contaminated_sum"], "total_hits": g["total_hits_sum"]}
        )

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby(group_col, as_index=False).sum()
    for c in ("n_docs", "n_contaminated", "total_hits"):
        out[c] = out[c].astype("int64")
    return out.sort_values(group_col, ignore_index=True)


def repetition_stats(
    docs: Dataset, k: int = 3, seed: int = 42, group_col: str = "source"
) -> pd.DataFrame:
    """Per-``group_col`` intra-document repetition: total vs distinct gram
    counts and how many docs repeat at least one gram.  Returns
    (group, n_docs, n_repetitive, total_grams, distinct_grams)."""
    mix = _gram_mix(k, seed)

    def partial(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {group_col: pa.array([], type=pa.string()),
                 "n_docs": pa.array([], type=pa.int64()),
                 "n_repetitive": pa.array([], type=pa.int64()),
                 "total_grams": pa.array([], type=pa.int64()),
                 "distinct_grams": pa.array([], type=pa.int64())}
            )
        grams, g_starts = gram_hash_stream(t["text"].to_pylist(), k, mix)
        totals = np.diff(g_starts)
        doc_idx = np.repeat(np.arange(n), totals)
        order = np.lexsort((grams, doc_idx))
        di, gr = doc_idx[order], grams[order]
        keep = np.r_[True, (di[1:] != di[:-1]) | (gr[1:] != gr[:-1])] if len(di) else np.zeros(0, bool)
        distinct = np.bincount(di[keep], minlength=n) if len(di) else np.zeros(n, np.int64)
        flat = pa.table(
            {group_col: t[group_col],
             "n_docs": pa.array(np.ones(n, dtype=np.int64)),
             "n_repetitive": pa.array((totals > distinct).astype(np.int64)),
             "total_grams": pa.array(totals.astype(np.int64)),
             "distinct_grams": pa.array(distinct.astype(np.int64))}
        )
        g = flat.group_by([group_col]).aggregate(
            [("n_docs", "sum"), ("n_repetitive", "sum"),
             ("total_grams", "sum"), ("distinct_grams", "sum")]
        )
        return pa.table(
            {group_col: g[group_col], "n_docs": g["n_docs_sum"],
             "n_repetitive": g["n_repetitive_sum"], "total_grams": g["total_grams_sum"],
             "distinct_grams": g["distinct_grams_sum"]}
        )

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = parts.groupby(group_col, as_index=False).sum()
    for c in ("n_docs", "n_repetitive", "total_grams", "distinct_grams"):
        out[c] = out[c].astype("int64")
    return out.sort_values(group_col, ignore_index=True)


def cross_doc_dup_windows(
    docs: Dataset, k: int = 5, seed: int = 42, id_col: str = "doc_id"
) -> pd.DataFrame:
    """CROSS-document exact substring duplication (the span-level dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022 — here at word-k-gram window granularity): for each document,
    how many of its k-gram windows also occur in at least one OTHER
    document.  Returns (doc_id, n_dup_windows) for docs with any.

    Distributed shape: the per-batch combiner collapses windows to
    (gram_hash, doc, multiplicity) rows — within-doc repeats never reach
    the wire individually — then ONE bucketed exchange on gram hash finds
    grams spanning >1 doc and folds per-doc counts; a final tiny reduce
    sums per-doc partials across buckets.  The exchange volume is bounded
    by distinct (gram, doc) pairs, the same order as every published
    exact-substring dedup (suffix-array or shingle based) must touch.
    Equality is 64-bit gram-hash equality (shared gram-hash space with the
    dedup/contamination family): collisions need ~2^32 distinct grams per
    bucket to matter and would only ever OVERcount by one window pair.
    """
    from .relational import bucketed_group_reduce

    mix = _gram_mix(k, seed)

    def partial(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table(
                {"g": pa.array([], type=pa.uint64()),
                 id_col: pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        grams, g_starts = gram_hash_stream(t["text"].to_pylist(), k, mix, pad_short=False)
        totals = np.diff(g_starts)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n), totals)
        order = np.lexsort((grams, doc_idx))
        di, gr = doc_idx[order], grams[order]
        new = np.r_[True, (di[1:] != di[:-1]) | (gr[1:] != gr[:-1])]
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(di)])
        return pa.table(
            {"g": pa.array(gr[starts], type=pa.uint64()),
             id_col: pa.array(ids[di[starts]].astype(np.int64)),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    pairs = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # a doc's windows can be split across input batches: first re-collapse
        # (g, doc), then keep grams with >1 DISTINCT doc, then per-doc sums
        df = df.groupby(["g", id_col], as_index=False)["cnt"].sum()
        ndocs = df.groupby("g")[id_col].transform("nunique")
        dup = df[ndocs > 1]
        return dup.groupby(id_col, as_index=False)["cnt"].sum()

    per_bucket = bucketed_group_reduce(pairs, ["g"], fold).to_pandas()
    if len(per_bucket) == 0:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "n_dup_windows": pd.Series(dtype="int64")})
    out = per_bucket.groupby(id_col, as_index=False)["cnt"].sum()
    out = out.rename(columns={"cnt": "n_dup_windows"}).sort_values(id_col, ignore_index=True)
    out[id_col] = out[id_col].astype("int64")
    out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
    return out


def substring_dedup_cuts(
    docs: Dataset, k: int = 5, seed: int = 42, id_col: str = "doc_id"
) -> pd.DataFrame:
    """Full span-level exact-substring dedup decision (Lee et al. ACL 2022:
    keep ONE occurrence of every duplicated substring, cut the rest) at
    word-k-gram window granularity: every occurrence of a gram that appears
    >= 2 times in the corpus (across OR within docs) is cut except the
    globally first one (min ``(doc_id, pos)``).  Returns per-doc
    ``n_removed_words`` = words covered by the union of cut windows.

    Two-pass shape (the scale path — position rows for NON-duplicated
    grams, the overwhelming majority, never reach the wire):

    1. collapsed ``(gram, multiplicity)`` combiner rows → one bucketed
       exchange → the duplicated-gram set, broadcast once via ``ray.put``
       (a sorted uint64 array; swap for a Bloom above ~10^8 grams — same
       contract as ``curate``'s survivor path);
    2. a second streaming pass emits ``(gram, doc, pos)`` ONLY for windows
       whose gram is in the set; per-gram reduce sorts by ``(doc, pos)``
       and drops the first occurrence → the cut list;
    3. cut windows fold per doc into interval-union coverage counts.
    """
    cuts = _substring_cut_list(docs, k, seed, id_col)

    # ---- pass 3: per-doc interval-union coverage
    if len(cuts) == 0:
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "n_removed_words": pd.Series(dtype="int64")})

    def coverage(sub: pd.DataFrame) -> int:
        p = np.sort(sub["pos"].to_numpy())
        starts, ends = p, p + k  # [pos, pos+k)
        new_run = np.r_[True, starts[1:] > np.maximum.accumulate(ends[:-1])]
        run_id = np.cumsum(new_run) - 1
        run_start = starts[new_run]
        run_end = np.zeros(run_id.max() + 1, dtype=np.int64)
        np.maximum.at(run_end, run_id, ends)
        return int((run_end - run_start).sum())

    out = (
        cuts.groupby(id_col)
        .apply(coverage, include_groups=False)
        .rename("n_removed_words")
        .reset_index()
        .sort_values(id_col, ignore_index=True)
    )
    out[id_col] = out[id_col].astype("int64")
    out["n_removed_words"] = out["n_removed_words"].astype("int64")
    return out


def _gram_count_parts(docs: Dataset, k: int, mix: np.ndarray) -> Dataset:
    """Per-batch collapsed (gram, multiplicity) combiner rows."""

    def gram_counts(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"g": pa.array([], type=pa.uint64()),
                             "cnt": pa.array([], type=pa.int64())})
        grams, _ = gram_hash_stream(t["text"].to_pylist(), k, mix, pad_short=False)
        g, c = np.unique(grams, return_counts=True)
        return pa.table({"g": pa.array(g, type=pa.uint64()),
                         "cnt": pa.array(c.astype(np.int64))})

    return docs.map_batches(gram_counts, batch_format="pyarrow", zero_copy_batch=True)


def gram_counts_ds(docs: Dataset, k: int, seed: int) -> Dataset:
    """Collapsed (gram, multiplicity) rows for the whole corpus — the
    persistable incremental span-dedup state (one bucketed exchange)."""
    from .relational import bucketed_group_reduce

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("g", as_index=False)["cnt"].sum()

    return bucketed_group_reduce(_gram_count_parts(docs, k, _gram_mix(k, seed)), ["g"], collapse)


def _substring_cut_list(
    docs: Dataset,
    k: int,
    seed: int,
    id_col: str,
    prior_grams: "np.ndarray | Dataset | None" = None,
) -> pd.DataFrame:
    """Passes 1+2 of the span-dedup decision: the (doc, pos) list of cut
    windows.  Without ``prior_grams``: every occurrence of a >=2x gram
    except the global first.  With ``prior_grams`` (grams already present
    in previously-processed corpus state): occurrences of a prior gram are
    ALL cut (their owner was written in an earlier run), new >=2x grams
    keep their in-run first occurrence as before.  Pass a uint64 ndarray
    for a driver-sized state (broadcast membership) or a Dataset of ``g``
    rows for arbitrarily large state (membership resolved on the gram-hash
    exchange itself — no driver array ever exists)."""
    mix = _gram_mix(k, seed)
    from .relational import bucketed_group_reduce

    new_parts = _gram_count_parts(docs, k, mix)
    if prior_grams is not None and isinstance(prior_grams, Dataset):
        # LARGE prior state: membership resolved on the SAME gram-hash
        # exchange pass 1 already pays — prior grams ride as tagged
        # (g, cnt=0, prior=1) rows, so no driver array exists at any state
        # size (the exact dual of curate's bloom_anti_join large path,
        # without the Bloom false-positive asymmetry a lossy cut could not
        # tolerate)
        def tag_new(t: pa.Table) -> pa.Table:
            return t.append_column("prior", pa.nulls(len(t), pa.int64()).fill_null(0))

        def tag_prior(t: pa.Table) -> pa.Table:
            return pa.table(
                {"g": pc.cast(t["g"], pa.uint64()),
                 "cnt": pa.nulls(len(t), pa.int64()).fill_null(0),
                 "prior": pa.nulls(len(t), pa.int64()).fill_null(1)}
            )

        both = new_parts.map_batches(
            tag_new, batch_format="pyarrow", zero_copy_batch=True
        ).union(
            prior_grams.map_batches(tag_prior, batch_format="pyarrow", zero_copy_batch=True)
        )

        def dup_or_prior_union(df: pd.DataFrame) -> pd.DataFrame:
            s = df.groupby("g", as_index=False).agg(cnt=("cnt", "sum"), p=("prior", "max"))
            # prior-only grams absent from the new corpus are irrelevant
            keep = (s["cnt"] >= 2) | ((s["p"] > 0) & (s["cnt"] >= 1))
            s = s[keep]
            return pd.DataFrame(
                {"g": s["g"].to_numpy().astype(np.uint64), "prior": s["p"].to_numpy() > 0}
            )

        flagged = bucketed_group_reduce(both, ["g"], dup_or_prior_union).to_pandas()
    else:
        prior = (
            np.sort(np.asarray(prior_grams, dtype=np.uint64))
            if prior_grams is not None and len(prior_grams)
            else np.empty(0, dtype=np.uint64)
        )
        prior_bcast = ray.put(prior)

        # ---- pass 1 reduce keeps only dup-or-prior grams: NON-duplicated
        # new grams (the overwhelming majority) never reach the driver
        def dup_or_prior(df: pd.DataFrame) -> pd.DataFrame:
            po = ray.get(prior_bcast)
            s = df.groupby("g", as_index=False)["cnt"].sum()
            g = s["g"].to_numpy().astype(np.uint64)
            if len(po):
                idx = np.searchsorted(po, g)
                idx[idx == len(po)] = 0
                inp = po[idx] == g
            else:
                inp = np.zeros(len(g), dtype=bool)
            keep = (s["cnt"].to_numpy() >= 2) | inp
            return pd.DataFrame({"g": g[keep], "prior": inp[keep]})

        flagged = bucketed_group_reduce(new_parts, ["g"], dup_or_prior).to_pandas()
    g_all = flagged["g"].to_numpy().astype(np.uint64) if len(flagged) else np.empty(
        0, dtype=np.uint64)
    order = np.argsort(g_all)
    dup_grams = g_all[order]
    # grams whose owner lives in PRIOR state: cut every in-run occurrence
    prior_owned = np.sort(g_all[flagged["prior"].to_numpy(dtype=bool)]) if len(
        flagged) else np.empty(0, dtype=np.uint64)

    dup_ref = ray.put(dup_grams)
    prior_ref = ray.put(prior_owned)

    # ---- pass 2: position rows for duplicated grams only → cut list
    def dup_windows(t: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        if len(t) == 0 or len(dup) == 0:
            return pa.table({"g": pa.array([], type=pa.uint64()),
                             id_col: pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64())})
        grams, g_starts = gram_hash_stream(t["text"].to_pylist(), k, mix, pad_short=False)
        totals = np.diff(g_starts)
        doc_idx = np.repeat(np.arange(len(t)), totals)
        pos = np.arange(len(grams)) - np.repeat(g_starts[:-1], totals) + 1  # 1-based
        idx = np.searchsorted(dup, grams)
        idx[idx == len(dup)] = 0
        hit = dup[idx] == grams
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {"g": pa.array(grams[hit], type=pa.uint64()),
             id_col: pa.array(ids[doc_idx[hit]].astype(np.int64)),
             "pos": pa.array(pos[hit].astype(np.int64))}
        )

    def drop_owner(df: pd.DataFrame) -> pd.DataFrame:
        po = ray.get(prior_ref)
        df = df.sort_values(["g", id_col, "pos"], kind="stable")
        first = ~df.duplicated("g", keep="first")
        if len(po):
            g = df["g"].to_numpy().astype(np.uint64)
            idx = np.searchsorted(po, g)
            idx[idx == len(po)] = 0
            first &= ~(po[idx] == g)  # prior-owned: no in-run survivor
        return df[~first][[id_col, "pos"]]

    return bucketed_group_reduce(
        docs.map_batches(dup_windows, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], drop_owner,
    ).to_pandas()


def substring_dedup_rewrite(
    docs: Dataset,
    k: int = 5,
    seed: int = 42,
    id_col: str = "doc_id",
    prior_grams: "np.ndarray | Dataset | None" = None,
) -> Dataset:
    """REWRITE form of the span dedup: every doc re-emitted with the words
    covered by its cut windows removed (fully-cut docs become '').  Same cut
    decision as :func:`substring_dedup_cuts`.  ``prior_grams`` makes the run
    INCREMENTAL: spans already present in previously-processed corpus state
    lose every in-run occurrence (their survivor was written earlier).

    The cut list (bounded by duplicated-window count, orders of magnitude
    below corpus size) is grouped per doc and broadcast once via
    ``ray.put``; the rewrite itself is one streaming ``map_batches`` pass —
    document text never shuffles.  If the duplication rate ever made the
    cut list driver-sized, swap the broadcast for a bucketed LEFT join of
    cuts onto docs by ``id_col`` (same exchange as ``hash_join``)."""
    cuts = _substring_cut_list(docs, k, seed, id_col, prior_grams=prior_grams)
    cut_map = (
        {int(d): np.sort(g["pos"].to_numpy()) for d, g in cuts.groupby(id_col, sort=False)}
        if len(cuts) and id_col in cuts.columns  # empty reduce → schema-less df
        else {}
    )
    cuts_ref = ray.put(cut_map)

    def rewrite(t: pa.Table) -> pa.Table:
        cm = ray.get(cuts_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        removed = np.zeros(len(t), dtype=np.int64)
        hit = (
            np.isin(ids, np.fromiter(cm.keys(), dtype=np.int64, count=len(cm)))
            if cm else np.zeros(len(t), dtype=bool)
        )
        if hit.any():  # Python rewrite only for the (rare) cut docs
            idxs = np.flatnonzero(hit)
            subs = col.take(pa.array(idxs)).to_pylist()
            rewritten = []
            for j, (did, text) in enumerate(zip(ids[idxs], subs)):
                words = (text or "").split(" ")
                keep = np.ones(len(words), dtype=bool)
                for s in cm[int(did)]:  # 1-based window start, covers [s, s+k)
                    keep[s - 1 : s - 1 + k] = False
                removed[idxs[j]] = len(words) - int(keep.sum())
                rewritten.append(" ".join(w for w, m in zip(words, keep) if m))
            vals = col.to_pandas()
            vals.iloc[idxs] = rewritten
            col = pa.array(vals, type=pa.string())
        cols = {c: t[c] for c in t.column_names if c != "text"}
        cols["text_dedup"] = col
        cols["n_removed_words"] = pa.array(removed)
        return pa.table(cols)

    return docs.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)


def ngram_jaccard_pairs(
    docs: Dataset,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int = 100,
    seed: int = 42,
    id_col: str = "doc_id",
    metric: str = "jaccard",
) -> pd.DataFrame:
    """EXACT n-gram-set Jaccard near-dup pairs (the brief's third dedup
    family next to MinHash-estimated and SimHash-banded): every doc pair
    whose distinct-word-k-gram sets satisfy |A∩B| / |A∪B| >= threshold.

    Grams with document frequency > ``max_df`` are excluded from BOTH the
    intersections and the set sizes (boilerplate grams carry no
    discriminative signal and would otherwise make pair generation
    Σ C(df,2) on stop-gram buckets — the standard df-cap of exact all-pairs
    similarity search, e.g. Bayardo et al. WWW'07 prefix filtering).

    Distributed shape, everything collected is OUTPUT-bounded:
    1. per-batch distinct ``(gram_hash, doc)`` combiner rows — ONE gram
       exchange puts every gram's full posting in one bucket, so df is
       exact in-bucket; each bucket emits pair-intersection partials and
       per-doc filtered-size partials;
    2. pair partials reduce on ``(a, b)`` (bounded by candidate pairs);
    3. size partials reduce on ``doc``, then only CANDIDATE docs' sizes
       (broadcast id set from step 2) are collected.
    Gram identity is 64-bit hash equality, same contract as the rest of the
    gram family (collisions ~2^-64 per pair would only ever overcount).

    ``metric="containment"`` scores |A∩B| / |A| instead (Broder's
    containment — "is doc a's content subsumed by doc b") and emits ORDERED
    (doc_a ⊂ doc_b) pairs, both directions of each candidate judged
    independently; everything upstream of the final score is shared."""
    import ray

    from .relational import bucketed_group_reduce

    mix = _gram_mix(k, seed)

    def distinct_rows(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"g": pa.array([], pa.uint64()),
                             "doc": pa.array([], pa.int64())})
        grams, g_starts = gram_hash_stream(t["text"].to_pylist(), k, mix, pad_short=False)
        totals = np.diff(g_starts)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t)), totals)
        order = np.lexsort((grams, doc_idx))
        di, gr = doc_idx[order], grams[order]
        keep = np.r_[True, (di[1:] != di[:-1]) | (gr[1:] != gr[:-1])] if len(di) else np.zeros(0, bool)
        return pa.table({"g": pa.array(gr[keep], pa.uint64()),
                         "doc": pa.array(ids[di[keep]].astype(np.int64))})

    rows = docs.map_batches(distinct_rows, batch_format="pyarrow", zero_copy_batch=True)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["g", "doc"]).sort_values(["g", "doc"], kind="stable")
        gs = df["g"].to_numpy()
        docs_arr = df["doc"].to_numpy()
        new = np.r_[True, gs[1:] != gs[:-1]] if len(gs) else np.zeros(0, bool)
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(gs)])
        keep_grp = sizes <= max_df
        keep_row = np.repeat(keep_grp, sizes)
        outs = []
        sz = pd.DataFrame({"doc": docs_arr[keep_row]}).groupby(
            "doc", as_index=False).size()
        outs.append(pd.DataFrame({"a": sz["doc"].to_numpy(),
                                  "b": np.int64(-1), "n": sz["size"].to_numpy()}))
        # pair expansion vectorized PER DISTINCT GROUP SIZE (≤ max_df numpy
        # rounds total, never a Python loop over grams): docs are sorted
        # within each group, so a < b falls out of triu indices
        psizes, pstarts = sizes[keep_grp & (sizes > 1)], starts[keep_grp & (sizes > 1)]
        for s in np.unique(psizes):
            heads = pstarts[psizes == s]
            ii, jj = np.triu_indices(int(s), 1)
            a = docs_arr[(heads[:, None] + ii[None, :]).ravel()]
            b = docs_arr[(heads[:, None] + jj[None, :]).ravel()]
            outs.append(pd.DataFrame({"a": a, "b": b, "n": np.int64(1)}))
        out = pd.concat(outs, ignore_index=True)
        return out.groupby(["a", "b"], as_index=False)["n"].sum()

    mixed = bucketed_group_reduce(rows, ["g"], fold).materialize()

    pair_rows = mixed.filter(expr="b >= 0")
    pairs = bucketed_group_reduce(
        pair_rows, ["a", "b"],
        lambda df: df.groupby(["a", "b"], as_index=False)["n"].sum(),
    ).to_pandas()
    score_col = "containment" if metric == "containment" else "jaccard"
    empty = pd.DataFrame({
        "doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64"),
        "n_shared": pd.Series(dtype="int64"), score_col: pd.Series(dtype="float64")})
    if len(pairs) == 0 or "a" not in pairs.columns:
        return empty
    cand_docs = np.unique(np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()]))
    cand_ref = ray.put(cand_docs)

    def cand_sizes(t: pa.Table) -> pa.Table:
        cd = ray.get(cand_ref)
        keep = np.isin(t["a"].to_numpy(zero_copy_only=False), cd)
        return t.filter(pa.array(keep))

    sizes = (
        mixed.filter(expr="b < 0")
        .map_batches(cand_sizes, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas().groupby("a", as_index=False)["n"].sum()
        .set_index("a")["n"]
    )
    inter = pairs["n"].to_numpy()
    sa = sizes.loc[pairs["a"]].to_numpy()
    sb = sizes.loc[pairs["b"]].to_numpy()
    if metric == "containment":
        # ordered pairs: doc_a's gram set is (near-)contained in doc_b's —
        # both directions of each unordered candidate, judged independently
        out = pd.DataFrame({
            "doc_a": np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()]),
            "doc_b": np.concatenate([pairs["b"].to_numpy(), pairs["a"].to_numpy()]),
            "n_shared": np.concatenate([inter, inter]).astype("int64"),
            "containment": np.concatenate([inter / sa, inter / sb]),
        })
        out = out[out["containment"] >= threshold]
        out["containment"] = _round6(out["containment"].to_numpy())
        out["doc_a"] = out["doc_a"].astype("int64")
        out["doc_b"] = out["doc_b"].astype("int64")
        return out.sort_values(["doc_a", "doc_b"], ignore_index=True)
    jac = inter / (sa + sb - inter)
    out = pd.DataFrame({
        "doc_a": pairs["a"].astype("int64"), "doc_b": pairs["b"].astype("int64"),
        "n_shared": pairs["n"].astype("int64"), "jaccard": jac})
    out = out[out["jaccard"] >= threshold]
    out["jaccard"] = _round6(out["jaccard"].to_numpy())
    return out.sort_values(["doc_a", "doc_b"], ignore_index=True)


def _round6(x: np.ndarray) -> np.ndarray:
    from .rounding import round_like_duckdb

    return round_like_duckdb(x, 6)


def winnowing_stats(
    docs: Dataset,
    k: int = 3,
    w: int = 4,
    seed: int = 42,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): over each doc's
    word-k-gram rolling-hash sequence, every window of ``w`` consecutive
    hashes selects its RIGHTMOST minimum; the distinct selected positions
    are the doc's fingerprints (guarantee: any shared substring of
    ``w + k - 1`` words is caught by at least one shared fingerprint).

    Fully streaming — fingerprints are per-doc local state, so the only
    exchange is the tiny per-``group_col`` stat fold.  Docs with fewer than
    ``w`` grams emit no fingerprints (and are excluded from ``n_docs``),
    mirroring the SQL oracle's window arithmetic.  Returns per-group
    ``(n_docs, n_selected, n_distinct)`` where n_selected counts distinct
    selected POSITIONS and n_distinct distinct selected HASHES per doc."""
    mix = _gram_mix(k, seed)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "n_selected": pa.array([], pa.int64()),
                          "n_distinct": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        grams, g_starts = gram_hash_stream(t["text"].to_pylist(), k, mix, pad_short=False)
        totals = np.diff(g_starts)
        n = len(grams)
        if n < w:
            return empty
        sw = np.lib.stride_tricks.sliding_window_view(grams, w)
        right_off = (w - 1) - sw[:, ::-1].argmin(axis=1)  # rightmost min per window
        cnts = np.maximum(totals - w + 1, 0)  # windows fully inside each doc
        doc_idx = np.repeat(np.arange(len(totals)), cnts)
        base = np.repeat(g_starts[:-1], cnts)
        head = np.repeat(np.cumsum(np.r_[0, cnts[:-1]]), cnts)
        starts = base + (np.arange(int(cnts.sum())) - head)
        sel = starts + right_off[starts]
        # distinct selected positions per doc
        key = np.unique(doc_idx.astype(np.int64) * np.int64(n) + sel)
        d_sel, p_sel = key // n, key % n
        n_selected = np.bincount(d_sel, minlength=len(totals))
        # distinct selected hashes per doc
        order = np.lexsort((grams[p_sel], d_sel))
        ds, hs = d_sel[order], grams[p_sel][order]
        uniq = np.r_[True, (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])] if len(ds) else np.zeros(0, bool)
        n_distinct = np.bincount(ds[uniq], minlength=len(totals))
        has = (n_selected > 0).astype(np.int64)
        g = pa.table({
            group_col: t[group_col],
            "n_docs": pa.array(has),
            "n_selected": pa.array(n_selected.astype(np.int64)),
            "n_distinct": pa.array(n_distinct.astype(np.int64)),
        }).group_by([group_col]).aggregate(
            [("n_docs", "sum"), ("n_selected", "sum"), ("n_distinct", "sum")])
        return g.rename_columns([group_col, "n_docs", "n_selected", "n_distinct"])

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({group_col: pd.Series(dtype="object"),
                             "n_docs": pd.Series(dtype="int64"),
                             "n_selected": pd.Series(dtype="int64"),
                             "n_distinct": pd.Series(dtype="int64")})
    out = parts.groupby(group_col, as_index=False).sum().sort_values(group_col, ignore_index=True)
    # a group whose docs are all too short to fingerprint is absent, matching
    # the SQL oracle's inner join on fingerprinting docs
    out = out[out["n_docs"] > 0].reset_index(drop=True)
    for c in ("n_docs", "n_selected", "n_distinct"):
        out[c] = out[c].astype("int64")
    return out
