"""Canonical public web-curation filters over a line-structured corpus:
Gopher repetition signals and quality rules (Rae et al. 2021, appendix A1),
and C4 line-level cleaning (Raffel et al. 2020 §2.2).

All kernels are vectorized per-batch functions over ``(doc_id, source,
text)`` where ``text`` is newline-joined lines: Arrow split/regex kernels to
flatten lines/words, ``pandas.factorize`` + ``np.unique(axis=0)`` for exact
per-doc gram identity (no hashing, no collision risk), ``np.bincount`` for
per-doc sums.  Every emitted partial is an integer, so per-source reductions
are order-insensitive and bitwise stable; ratios are taken once, driver-side,
from integer sums (the repo-wide oracle-parity convention).

Reference parity: the reference pipeline has no web-cleaning stage (its
corpus is machine logs); these operators are part of the training-data
suite the brief adds on top (cf. quality_batch in text.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import STOPWORD_PATTERN

# Gopher-style gates, expressed as exact integer comparisons (never float):
#   words in [MIN_WORDS, MAX_WORDS]; mean word length in [3, 10];
#   symbol-word ratio <= 0.1; bullet-line ratio <= 0.9; ellipsis-line
#   ratio <= 0.3; alpha-word ratio >= 0.8; stopword hits >= 2.
MIN_WORDS, MAX_WORDS = 20, 100_000
TERMINAL_CHARS = (".", "!", "?", '"')


def _flatten_list(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """list<string> column → (flat python-str numpy array, doc_idx per item)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    counts = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(col), dtype=np.int64), counts)
    flat = col.flatten()
    return flat, doc_idx


def _split_lines(text: pa.ChunkedArray) -> pa.Array:
    return pc.split_pattern(pc.fill_null(text, ""), "\n")


def _split_words(text: pa.ChunkedArray) -> pa.Array:
    flat = pc.replace_substring(pc.fill_null(text, ""), "\n", " ")
    return pc.split_pattern(flat, " ")


# ---------------------------------------------------------------------------
# Gopher repetition signals
# ---------------------------------------------------------------------------

def gopher_repetition_partial(t: pa.Table) -> pa.Table:
    """Per-source integer partials for the four Gopher repetition fractions:

    * duplicate-line fraction         (lines - distinct lines) / lines
    * duplicate-line CHAR fraction    chars in occurrences beyond the first
    * top-2-gram char fraction        chars covered by the most frequent
                                      word bigram (ties: lexicographically
                                      smallest bigram)
    * duplicated-5-gram char fraction chars at positions covered by any
                                      5-gram occurring more than once

    plus ``flagged`` = docs tripping any of the integer-exact gates
    dup-line > 0.3, top-2-gram chars > 0.2, dup-5-gram chars > 0.15.
    Ratios are computed corpus-level from these sums (never per-doc floats).
    """
    n_docs = len(t)
    # ---- lines ----
    lines_col = _split_lines(t["text"])
    lflat, ldoc = _flatten_list(lines_col)
    llen = pc.utf8_length(lflat).to_numpy(zero_copy_only=False).astype(np.int64)
    lcode, _ = pd.factorize(lflat.to_numpy(zero_copy_only=False))
    key = np.stack([ldoc, lcode], axis=1)
    uniq, uidx, ucnt = np.unique(key, axis=0, return_index=True, return_counts=True)
    n_lines = np.bincount(ldoc, minlength=n_docs).astype(np.int64)
    n_distinct = np.bincount(uniq[:, 0], minlength=n_docs).astype(np.int64)
    line_chars = np.bincount(ldoc, weights=llen, minlength=n_docs).astype(np.int64)
    dup_line_chars = np.bincount(
        uniq[:, 0], weights=(ucnt - 1) * llen[uidx], minlength=n_docs
    ).astype(np.int64)

    # ---- words ----
    words_col = _split_words(t["text"])
    wflat, wdoc = _flatten_list(words_col)
    wlen = pc.utf8_length(wflat).to_numpy(zero_copy_only=False).astype(np.int64)
    wstr = wflat.to_numpy(zero_copy_only=False)
    vocab, wrank = np.unique(wstr, return_inverse=True)  # rank == sorted order
    word_chars = np.bincount(wdoc, weights=wlen, minlength=n_docs).astype(np.int64)

    # ---- top 2-gram chars per doc ----
    top2_chars = np.zeros(n_docs, dtype=np.int64)
    if len(wstr) >= 2:
        same2 = wdoc[:-1] == wdoc[1:]
        g2 = np.stack([wdoc[:-1][same2], wrank[:-1][same2], wrank[1:][same2]], axis=1)
        g2chars = (wlen[:-1][same2] + wlen[1:][same2]).astype(np.int64)
        if len(g2):
            u2, i2, c2 = np.unique(g2, axis=0, return_index=True, return_counts=True)
            # order by (doc, -count, rank1, rank2): first row per doc wins;
            # word-tuple rank order == 'w1 w2' string order (space < alnum)
            order = np.lexsort((u2[:, 2], u2[:, 1], -c2, u2[:, 0]))
            u2o, c2o, ch2o = u2[order], c2[order], g2chars[i2][order]
            first = np.ones(len(u2o), dtype=bool)
            first[1:] = u2o[1:, 0] != u2o[:-1, 0]
            top2_chars[u2o[first, 0]] = c2o[first] * ch2o[first]

    # ---- duplicated-5-gram coverage per doc ----
    dup5_chars = np.zeros(n_docs, dtype=np.int64)
    if len(wstr) >= 5:
        same5 = wdoc[:-4] == wdoc[4:]
        starts = np.nonzero(same5)[0]
        if len(starts):
            g5 = np.stack(
                [wdoc[starts]] + [wrank[starts + k] for k in range(5)], axis=1
            )
            _, inv5, c5 = np.unique(g5, axis=0, return_inverse=True, return_counts=True)
            dup_starts = starts[c5[inv5] > 1]
            covered = np.zeros(len(wstr), dtype=bool)
            for k in range(5):
                covered[dup_starts + k] = True
            dup5_chars = np.bincount(
                wdoc, weights=np.where(covered, wlen, 0), minlength=n_docs
            ).astype(np.int64)

    flagged = (
        (10 * (n_lines - n_distinct) > 3 * n_lines)
        | (5 * top2_chars > word_chars)
        | (20 * dup5_chars > 3 * word_chars)
    )
    part = pa.table(
        {
            "source": t["source"],
            "n_docs": pa.array(np.ones(n_docs, dtype=np.int64)),
            "n_lines": pa.array(n_lines),
            "n_distinct_lines": pa.array(n_distinct),
            "line_chars": pa.array(line_chars),
            "dup_line_chars": pa.array(dup_line_chars),
            "word_chars": pa.array(word_chars),
            "top2_chars": pa.array(top2_chars),
            "dup5_chars": pa.array(dup5_chars),
            "flagged": pa.array(flagged.astype(np.int64)),
        }
    )
    cols = [c for c in part.column_names if c != "source"]
    g = part.group_by(["source"]).aggregate([(c, "sum") for c in cols])
    return g.rename_columns(["source"] + cols)


# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------

def gopher_quality_partial(t: pa.Table) -> pa.Table:
    """Per-source counts of docs failing each Gopher-style quality rule and
    docs passing all, from integer-exact per-doc gates."""
    n_docs = len(t)
    text = pc.fill_null(t["text"], "")
    lines_col = _split_lines(text)
    lflat, ldoc = _flatten_list(lines_col)
    n_lines = np.bincount(ldoc, minlength=n_docs).astype(np.int64)
    bullet = pc.starts_with(lflat, "- ").to_numpy(zero_copy_only=False)
    ellip = pc.ends_with(lflat, "...").to_numpy(zero_copy_only=False)
    n_bullet = np.bincount(ldoc, weights=bullet, minlength=n_docs).astype(np.int64)
    n_ellip = np.bincount(ldoc, weights=ellip, minlength=n_docs).astype(np.int64)

    words_col = _split_words(text)
    wflat, wdoc = _flatten_list(words_col)
    wlen = pc.utf8_length(wflat).to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.bincount(wdoc, minlength=n_docs).astype(np.int64)
    sum_len = np.bincount(wdoc, weights=wlen, minlength=n_docs).astype(np.int64)
    sym = pc.or_(
        pc.match_substring(wflat, "#"), pc.match_substring(wflat, "...")
    ).to_numpy(zero_copy_only=False)
    alpha = pc.match_substring_regex(wflat, "[a-zA-Z]").to_numpy(zero_copy_only=False)
    n_sym = np.bincount(wdoc, weights=sym, minlength=n_docs).astype(np.int64)
    n_alpha = np.bincount(wdoc, weights=alpha, minlength=n_docs).astype(np.int64)
    stop_hits = (
        pc.count_substring_regex(text, STOPWORD_PATTERN)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )

    fail_words = (n_words < MIN_WORDS) | (n_words > MAX_WORDS)
    fail_wordlen = (sum_len < 3 * n_words) | (sum_len > 10 * n_words)
    fail_symbol = 10 * n_sym > n_words
    fail_bullet = 10 * n_bullet > 9 * n_lines
    fail_ellipsis = 10 * n_ellip > 3 * n_lines
    fail_alpha = 5 * n_alpha < 4 * n_words
    fail_stop = stop_hits < 2
    n_pass = ~(
        fail_words | fail_wordlen | fail_symbol | fail_bullet | fail_ellipsis
        | fail_alpha | fail_stop
    )
    part = pa.table(
        {
            "source": t["source"],
            "n_docs": pa.array(np.ones(n_docs, dtype=np.int64)),
            "fail_words": pa.array(fail_words.astype(np.int64)),
            "fail_wordlen": pa.array(fail_wordlen.astype(np.int64)),
            "fail_symbol": pa.array(fail_symbol.astype(np.int64)),
            "fail_bullet": pa.array(fail_bullet.astype(np.int64)),
            "fail_ellipsis": pa.array(fail_ellipsis.astype(np.int64)),
            "fail_alpha": pa.array(fail_alpha.astype(np.int64)),
            "fail_stop": pa.array(fail_stop.astype(np.int64)),
            "n_pass": pa.array(n_pass.astype(np.int64)),
        }
    )
    cols = [c for c in part.column_names if c != "source"]
    g = part.group_by(["source"]).aggregate([(c, "sum") for c in cols])
    return g.rename_columns(["source"] + cols)


# ---------------------------------------------------------------------------
# C4 line-level cleaning
# ---------------------------------------------------------------------------

def c4_line_filter_partial(t: pa.Table) -> pa.Table:
    """C4-style cleaning stats per source: docs dropped outright (lorem
    ipsum / curly brace), and over surviving docs the line-level keep rule
    (terminal punctuation AND >= 5 words AND no 'javascript'), chars kept,
    and docs retaining >= 3 kept lines."""
    n_docs = len(t)
    text = pc.fill_null(t["text"], "")
    low = pc.utf8_lower(text)
    dropped = pc.or_(
        pc.match_substring(low, "lorem ipsum"), pc.match_substring(text, "{")
    ).to_numpy(zero_copy_only=False)

    lines_col = _split_lines(text)
    lflat, ldoc = _flatten_list(lines_col)
    llen = pc.utf8_length(lflat).to_numpy(zero_copy_only=False).astype(np.int64)
    terminal = np.zeros(len(lflat), dtype=bool)
    for ch in TERMINAL_CHARS:
        terminal |= pc.ends_with(lflat, ch).to_numpy(zero_copy_only=False)
    wc = pc.add(pc.count_substring(lflat, " "), 1).to_numpy(zero_copy_only=False)
    no_js = pc.invert(
        pc.match_substring(pc.utf8_lower(lflat), "javascript")
    ).to_numpy(zero_copy_only=False)
    kept = terminal & (wc >= 5) & no_js & ~dropped[ldoc]

    surviving = ~dropped
    lines_total = np.bincount(ldoc, weights=surviving[ldoc], minlength=n_docs).astype(np.int64)
    lines_kept = np.bincount(ldoc, weights=kept, minlength=n_docs).astype(np.int64)
    chars_kept = np.bincount(ldoc, weights=np.where(kept, llen, 0), minlength=n_docs).astype(np.int64)

    part = pa.table(
        {
            "source": t["source"],
            "docs_in": pa.array(np.ones(n_docs, dtype=np.int64)),
            "docs_dropped": pa.array(dropped.astype(np.int64)),
            "lines_total": pa.array(lines_total),
            "lines_kept": pa.array(lines_kept),
            "chars_kept": pa.array(chars_kept),
            "docs_kept3": pa.array((lines_kept >= 3).astype(np.int64)),
        }
    )
    cols = [c for c in part.column_names if c != "source"]
    g = part.group_by(["source"]).aggregate([(c, "sum") for c in cols])
    return g.rename_columns(["source"] + cols)


# ---------------------------------------------------------------------------
# Cross-document line dedup (RefinedWeb-style: drop lines that recur across
# >= threshold distinct documents corpus-wide, then rewrite)
# ---------------------------------------------------------------------------

def dup_lines_dataset(ds, threshold: int = 3):
    """One exchange: per-batch (line, distinct-doc-count) combiners (a line
    counts once per doc however often it repeats inside it) → grouped sum →
    filter >= threshold.  Returns a Dataset[(line, docs)]."""
    from .relational import grouped_sums

    def partial(t: pa.Table) -> pa.Table:
        lflat, ldoc = _flatten_list(_split_lines(pc.fill_null(t["text"], "")))
        lcode, uniq_lines = pd.factorize(lflat.to_numpy(zero_copy_only=False))
        pairs = np.unique(np.stack([ldoc, lcode], axis=1), axis=0)
        counts = np.bincount(pairs[:, 1], minlength=len(uniq_lines)).astype(np.int64)
        return pa.table({"line": pa.array(uniq_lines, pa.string()), "docs": pa.array(counts)})

    agg = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["line"], {"docs": "docs"},
    )
    # vectorized batch filter (a row-lambda filter would fall back to Python)
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["docs"], threshold)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def line_dedup_rewrite_stats(ds, threshold: int = 3) -> pd.DataFrame:
    """Rewrite every doc with corpus-duplicated lines removed; per-source
    stats (docs, lines/chars removed, docs emptied).  The dup-line set is
    broadcast once (``ray.put``); above broadcast scale the same set rides
    a tagged exchange like the substring-dedup prior (functions/grams.py)."""
    import ray as _ray

    dup = dup_lines_dataset(ds, threshold).to_pandas()
    # empty filtered Datasets come back schema-less — guard the column
    dup_set = set(dup["line"].tolist()) if len(dup) and "line" in dup.columns else set()
    dup_ref = _ray.put(dup_set)

    def rewrite(t: pa.Table) -> pa.Table:
        dup_set = _ray.get(dup_ref)
        n = len(t)
        lflat, ldoc = _flatten_list(_split_lines(pc.fill_null(t["text"], "")))
        lstr = lflat.to_numpy(zero_copy_only=False)
        llen = pc.utf8_length(lflat).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(dup_set):
            is_dup = pc.is_in(
                lflat, value_set=pa.array(sorted(dup_set), pa.string())
            ).to_numpy(zero_copy_only=False)
        else:
            is_dup = np.zeros(len(lstr), dtype=bool)
        n_lines = np.bincount(ldoc, minlength=n).astype(np.int64)
        removed = np.bincount(ldoc, weights=is_dup, minlength=n).astype(np.int64)
        chars_rm = np.bincount(ldoc, weights=np.where(is_dup, llen, 0), minlength=n).astype(np.int64)
        part = pa.table(
            {
                "source": t["source"],
                "n_docs": pa.array(np.ones(n, dtype=np.int64)),
                "lines_removed": pa.array(removed),
                "chars_removed": pa.array(chars_rm),
                "docs_emptied": pa.array((removed == n_lines).astype(np.int64)),
            }
        )
        cols = [c for c in part.column_names if c != "source"]
        g = part.group_by(["source"]).aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["source"] + cols)

    agg = ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return agg.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)


# ---------------------------------------------------------------------------
# Composed end-to-end web-cleaning pipeline:
#   C4 doc kill → C4 line filter (+ >= 3 kept lines) → Gopher quality gates
#   → cross-doc line dedup (>= 3 docs) rewrite → cleaned corpus + funnel
# ---------------------------------------------------------------------------

def _c4_keep_mask(lflat: pa.Array) -> np.ndarray:
    terminal = np.zeros(len(lflat), dtype=bool)
    for ch in TERMINAL_CHARS:
        terminal |= pc.ends_with(lflat, ch).to_numpy(zero_copy_only=False)
    wc = pc.add(pc.count_substring(lflat, " "), 1).to_numpy(zero_copy_only=False)
    no_js = pc.invert(
        pc.match_substring(pc.utf8_lower(lflat), "javascript")
    ).to_numpy(zero_copy_only=False)
    return terminal & (wc >= 5) & no_js


def _rebuild_text(lflat: pa.Array, ldoc: np.ndarray, keep: np.ndarray, n_docs: int):
    """Filter flat lines by mask (order preserved) and re-join per doc with
    newlines — one arrow filter + offsets rebuild + binary_join."""
    kept_counts = np.bincount(ldoc, weights=keep, minlength=n_docs).astype(np.int64)
    kept_lines = lflat.filter(pa.array(keep))
    offsets = np.concatenate([[0], np.cumsum(kept_counts)])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_lines)
    return pc.binary_join(lists, "\n"), kept_counts


def _gopher_pass_mask(text: pa.Array) -> np.ndarray:
    """Per-doc boolean: passes ALL Gopher gates (same integer-exact rules as
    gopher_quality_partial, over the supplied text)."""
    n_docs = len(text)
    lflat, ldoc = _flatten_list(_split_lines(text))
    n_lines = np.bincount(ldoc, minlength=n_docs).astype(np.int64)
    bullet = pc.starts_with(lflat, "- ").to_numpy(zero_copy_only=False)
    ellip = pc.ends_with(lflat, "...").to_numpy(zero_copy_only=False)
    n_bullet = np.bincount(ldoc, weights=bullet, minlength=n_docs).astype(np.int64)
    n_ellip = np.bincount(ldoc, weights=ellip, minlength=n_docs).astype(np.int64)
    wflat, wdoc = _flatten_list(_split_words(text))
    wlen = pc.utf8_length(wflat).to_numpy(zero_copy_only=False).astype(np.int64)
    n_words = np.bincount(wdoc, minlength=n_docs).astype(np.int64)
    sum_len = np.bincount(wdoc, weights=wlen, minlength=n_docs).astype(np.int64)
    sym = pc.or_(
        pc.match_substring(wflat, "#"), pc.match_substring(wflat, "...")
    ).to_numpy(zero_copy_only=False)
    alpha = pc.match_substring_regex(wflat, "[a-zA-Z]").to_numpy(zero_copy_only=False)
    n_sym = np.bincount(wdoc, weights=sym, minlength=n_docs).astype(np.int64)
    n_alpha = np.bincount(wdoc, weights=alpha, minlength=n_docs).astype(np.int64)
    stop_hits = (
        pc.count_substring_regex(text, STOPWORD_PATTERN)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return ~(
        (n_words < MIN_WORDS) | (n_words > MAX_WORDS)
        | (sum_len < 3 * n_words) | (sum_len > 10 * n_words)
        | (10 * n_sym > n_words)
        | (10 * n_bullet > 9 * n_lines)
        | (10 * n_ellip > 3 * n_lines)
        | (5 * n_alpha < 4 * n_words)
        | (stop_hits < 2)
    )


def webclean_pipeline(ds, dedup_threshold: int = 3, out_dir: str | None = None):
    """The composed cleaning flow every web-scale curation run performs,
    streaming end to end (each stage a map_batches rewrite; the only
    exchange is the dedup line-count combiner):

    1. C4 doc kill (lorem-ipsum / curly brace);
    2. C4 line filter + require >= 3 kept lines (the "3 sentences" rule);
    3. Gopher quality gates over the CLEANED text;
    4. cross-doc line dedup (>= threshold surviving docs) rewrite.

    Returns (per-source funnel DataFrame, cleaned Dataset); with
    ``out_dir`` the cleaned corpus is also written Hive-partitioned by
    source.  Per-stage counts ride each batch as integer partials.
    """
    import pandas as pd

    def stage_a(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        low = pc.utf8_lower(text)
        killed = pc.or_(
            pc.match_substring(low, "lorem ipsum"), pc.match_substring(text, "{")
        ).to_numpy(zero_copy_only=False)
        n = len(t)
        lflat, ldoc = _flatten_list(_split_lines(text))
        keep_line = _c4_keep_mask(lflat) & ~killed[ldoc]
        cleaned, kept_counts = _rebuild_text(lflat, ldoc, keep_line, n)
        doc_ok = ~killed & (kept_counts >= 3)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "text": cleaned,
                "__killed": pa.array(killed),
                "__short": pa.array(~killed & (kept_counts < 3)),
                "__ok": pa.array(doc_ok),
            }
        )
        return out

    def stage_c(t: pa.Table) -> pa.Table:
        ok = t["__ok"].to_numpy(zero_copy_only=False)
        gp = _gopher_pass_mask(pc.fill_null(t["text"], "")) & ok
        return t.set_column(
            t.schema.get_field_index("__ok"), "__ok", pa.array(gp)
        ).append_column("__qfail", pa.array(ok & ~gp))

    tagged = ds.map_batches(stage_a, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        stage_c, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    survivors = tagged.map_batches(
        lambda t: t.filter(t["__ok"]).select(["doc_id", "source", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    dup = dup_lines_dataset(survivors, dedup_threshold).to_pandas()
    dup_set = set(dup["line"].tolist()) if len(dup) and "line" in dup.columns else set()
    import ray as _ray

    dup_ref = _ray.put(dup_set)

    def stage_d(t: pa.Table) -> pa.Table:
        dset = _ray.get(dup_ref)
        n = len(t)
        text = pc.fill_null(t["text"], "")
        lflat, ldoc = _flatten_list(_split_lines(text))
        if len(dset):
            is_dup = pc.is_in(
                lflat, value_set=pa.array(sorted(dset), pa.string())
            ).to_numpy(zero_copy_only=False)
        else:
            is_dup = np.zeros(len(lflat), dtype=bool)
        cleaned, kept_counts = _rebuild_text(lflat, ldoc, ~is_dup, n)
        removed = np.bincount(ldoc, weights=is_dup, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "text": cleaned,
                "__dedup_removed": pa.array(removed),
            }
        )

    final = survivors.map_batches(stage_d, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # funnel partials
    def funnel_a(t: pa.Table) -> pa.Table:
        part = pa.table(
            {
                "source": t["source"],
                "docs_in": pa.array(np.ones(len(t), dtype=np.int64)),
                "docs_killed": pc.cast(t["__killed"], pa.int64()),
                "docs_short": pc.cast(t["__short"], pa.int64()),
                "docs_quality_fail": pc.cast(t["__qfail"], pa.int64()),
            }
        )
        cols = [c for c in part.column_names if c != "source"]
        g = part.group_by(["source"]).aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["source"] + cols)

    def funnel_d(t: pa.Table) -> pa.Table:
        part = pa.table(
            {
                "source": t["source"],
                "docs_out": pa.array(np.ones(len(t), dtype=np.int64)),
                "lines_dedup_removed": t["__dedup_removed"],
                "chars_out": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )
        cols = [c for c in part.column_names if c != "source"]
        g = part.group_by(["source"]).aggregate([(c, "sum") for c in cols])
        return g.rename_columns(["source"] + cols)

    fa = tagged.map_batches(funnel_a, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    fd = final.map_batches(funnel_d, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    stats = (
        fa.groupby("source", as_index=False).sum()
        .merge(fd.groupby("source", as_index=False).sum(), on="source", how="left")
        .fillna(0)
        .sort_values("source", ignore_index=True)
    )
    for c in stats.columns:
        if c != "source":
            stats[c] = stats[c].astype("int64")
    if out_dir:
        final.drop_columns(["__dedup_removed"]).write_parquet(
            out_dir, partition_cols=["source"], mode="overwrite"
        )
    return stats, final
