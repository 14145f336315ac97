"""Unigram-LM subword segmentation (the SentencePiece-unigram inference
step, Kudo 2018 — public method): segment every word into vocabulary pieces
by Viterbi over piece log-probs.

Determinism contract (mirrored by the independent scalar oracle):
* vocabulary = ALL single chars + the top-``TOP_NGRAMS`` bigrams and top-
  ``TOP_NGRAMS`` trigrams by substring-occurrence count (ties → piece ASC);
* piece cost = round(-ln(count/total)·1e6) in integer µnats, so every total
  is an order-free int64 sum — no float accumulation anywhere;
* DP tie-break: minimize (cost, n_pieces), remaining ties prefer the longer
  final piece.

Shape: piece counting is a per-batch combiner (counts per unique word ×
occurrence weight) folded over one small exchange — the vocabulary is
bounded (≤ |charset| + 2·TOP_NGRAMS) so the cost table broadcasts; the
segmentation pass memoizes per unique word within a batch (the word pool is
Zipfian — a batch of 10⁶ tokens has ~10⁴ uniques)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

TOP_NGRAMS = 40
_SCALE = 1_000_000


def word_counts_batch(texts: list[str]) -> pd.DataFrame:
    """(word, n) occurrence counts for one batch."""
    words: dict[str, int] = {}
    for t in texts:
        for w in (t or "").split():
            words[w] = words.get(w, 0) + 1
    return pd.DataFrame({"word": list(words), "n": list(words.values())})


def substring_counts(word_counts: pd.DataFrame) -> dict[str, int]:
    """Substring-occurrence counts (lengths 1–3) over weighted words."""
    out: dict[str, int] = {}
    for w, n in zip(word_counts["word"], word_counts["n"]):
        n = int(n)
        for L in (1, 2, 3):
            for i in range(len(w) - L + 1):
                p = w[i : i + L]
                out[p] = out.get(p, 0) + n
    return out


def select_vocab(counts: dict[str, int]) -> dict[str, int]:
    """Documented vocabulary rule: all single chars + top-N bigrams +
    top-N trigrams by (count DESC, piece ASC); returns integer µnat costs."""
    import math

    chars = {p: c for p, c in counts.items() if len(p) == 1}
    vocab = dict(chars)
    for L in (2, 3):
        cand = sorted(
            ((p, c) for p, c in counts.items() if len(p) == L),
            key=lambda pc_: (-pc_[1], pc_[0]),
        )[:TOP_NGRAMS]
        vocab.update(dict(cand))
    total = sum(vocab.values())
    return {
        p: int(round(-math.log(c / total) * _SCALE)) for p, c in vocab.items()
    }


def viterbi_segment(word: str, costs: dict[str, int]) -> tuple[int, int]:
    """(n_pieces, total_cost_µnats) for one word under the tie-break
    contract: minimize (cost, n_pieces); equal → longer final piece."""
    n = len(word)
    INF = (1 << 62, 1 << 62)
    dp: list[tuple[int, int]] = [INF] * (n + 1)
    dp[0] = (0, 0)
    for i in range(1, n + 1):
        best = INF
        for L in (3, 2, 1):  # longer final piece checked first → wins ties
            j = i - L
            if j < 0 or dp[j] is INF:
                continue
            c = costs.get(word[j:i])
            if c is None:
                continue
            cand = (dp[j][0] + c, dp[j][1] + 1)
            if cand < best:
                best = cand
        dp[i] = best
    cost, pieces = dp[n]
    return pieces, cost


def unigram_segment_stats(docs: Dataset, text_col: str = "text",
                          group_col: str = "source") -> pd.DataFrame:
    """Per-group (n_words, n_pieces, nll_unats) through the two-pass plan
    described in the module docstring."""

    def count_part(t: pa.Table) -> pa.Table:
        wc = word_counts_batch(t[text_col].to_pylist())
        sc = substring_counts(wc)
        return pa.table({"piece": pa.array(list(sc)),
                         "n": pa.array(list(sc.values()), pa.int64())})

    folded = (
        docs.map_batches(count_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("piece")["n"]
        .sum()
    )
    costs = select_vocab({p: int(c) for p, c in folded.items()})

    import ray as _ray

    cost_ref = _ray.put(costs)

    def seg_part(t: pa.Table) -> pa.Table:
        cst = _ray.get(cost_ref)
        cache: dict[str, tuple[int, int]] = {}
        groups: dict[str, list[int]] = {}
        for g, txt in zip(t[group_col].to_pylist(), t[text_col].to_pylist()):
            acc = groups.setdefault(g, [0, 0, 0])
            for w in (txt or "").split():
                r = cache.get(w)
                if r is None:
                    r = cache[w] = viterbi_segment(w, cst)
                acc[0] += 1
                acc[1] += r[0]
                acc[2] += r[1]
        return pa.table(
            {group_col: pa.array(list(groups)),
             "n_words": pa.array([v[0] for v in groups.values()], pa.int64()),
             "n_pieces": pa.array([v[1] for v in groups.values()], pa.int64()),
             "nll_unats": pa.array([v[2] for v in groups.values()], pa.int64())}
        )

    p = docs.map_batches(seg_part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out = p.groupby(group_col, as_index=False).sum()
    return out.sort_values(group_col, ignore_index=True)
