"""Planted-truth tests for the web-curation filters (Gopher repetition /
quality rules, C4 line cleaning) over the deterministic web corpus
(sources/webdocs.py plant schedule)."""

import numpy as np
import pyarrow as pa
import pytest

from commerce_logs_pipeline_ray.functions.webclean import (
    c4_line_filter_partial,
    gopher_quality_partial,
    gopher_repetition_partial,
)
from commerce_logs_pipeline_ray.sources.webdocs import (
    BRACE_LINE,
    JAVASCRIPT_LINE,
    LOREM_LINE,
    build_web_docs,
)


def _docs(n=60):
    # base docs: >= 24 words, no newlines, single-spaced (corpus contract)
    words = ["table", "scan", "the", "hash", "join", "a", "sort", "of",
             "merge", "to", "batch", "and", "value", "row"]
    texts = [" ".join(words[(i + k) % len(words)] for k in range(24 + i % 9))
             for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "source": pa.array([f"s{i % 4}" for i in range(n)]),
            "text": pa.array(texts),
        }
    )


@pytest.fixture(scope="module")
def web():
    return build_web_docs(_docs())


def test_plants_present(web):
    texts = web["text"].to_pylist()
    assert "lorem ipsum" in texts[17].lower() and LOREM_LINE.rstrip(".") in LOREM_LINE
    assert BRACE_LINE in texts[19]
    assert JAVASCRIPT_LINE in texts[23]
    assert "###" in texts[29]
    # dup-line plant: first line == last line for id % 3 == 0
    for i in (0, 3, 6):
        lines = texts[i].split("\n")
        assert lines.count(lines[0]) >= 2
    # bullet plant: every line bulleted for id 37
    assert all(ln.startswith("- ") for ln in texts[37].split("\n"))
    # ellipsis plant
    assert all(ln.endswith("...") for ln in texts[41].split("\n"))


def test_gopher_repetition_planted_dup_lines(web):
    out = gopher_repetition_partial(web).to_pandas().groupby("source").sum()
    # every doc with id % 3 == 0 contributes exactly one repeated line
    n_dup_docs = sum(1 for i in range(60) if i % 3 == 0)
    assert int((out["n_lines"] - out["n_distinct_lines"]).sum()) == n_dup_docs
    # char mass of dup lines == sum of len(first line) over planted docs
    texts = web["text"].to_pylist()
    expect = sum(len(texts[i].split("\n")[0]) for i in range(60) if i % 3 == 0)
    assert int(out["dup_line_chars"].sum()) == expect


def test_gopher_repetition_dup5_covers_planted(web):
    out = gopher_repetition_partial(web).to_pandas()
    # the repeated first line (>= 3 words) plus its preceding context yields
    # duplicated 5-grams only in planted docs; non-planted docs built from a
    # rotating 14-word vocab can still repeat grams, so just sanity-bound it
    assert (out["dup5_chars"] >= 0).all()
    assert int(out["dup5_chars"].sum()) > 0


def test_gopher_repetition_scalar_reference(web):
    """Cross-check one doc's metrics against a direct scalar computation."""
    texts = web["text"].to_pylist()
    i = 3  # dup-line planted
    t = web.slice(i, 1)
    row = gopher_repetition_partial(t).to_pandas().iloc[0]
    lines = texts[i].split("\n")
    words = texts[i].replace("\n", " ").split(" ")
    assert row["n_lines"] == len(lines)
    assert row["n_distinct_lines"] == len(set(lines))
    assert row["word_chars"] == sum(len(w) for w in words)
    # scalar top-2-gram
    from collections import Counter

    c = Counter(zip(words, words[1:]))
    best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert row["top2_chars"] == best[1] * (len(best[0][0]) + len(best[0][1]))
    # scalar dup-5-gram coverage
    g5 = list(zip(words, words[1:], words[2:], words[3:], words[4:]))
    cnt = Counter(g5)
    covered = set()
    for p, g in enumerate(g5):
        if cnt[g] > 1:
            covered.update(range(p, p + 5))
    assert row["dup5_chars"] == sum(len(words[p]) for p in covered)


def test_gopher_quality_planted_fails(web):
    out = gopher_quality_partial(web).to_pandas()
    tot = out.drop(columns=["source"]).sum()
    # symbol plant (id 0 and 29 → wait: % 29 fires at 0, 29, 58)
    sym_ids = [i for i in range(60) if i % 29 == 0]
    assert tot["fail_symbol"] >= len(sym_ids)
    bullet_ids = [i for i in range(60) if i % 37 == 0]
    assert tot["fail_bullet"] >= len(bullet_ids)
    ellip_ids = [i for i in range(60) if i % 41 == 0]
    assert tot["fail_ellipsis"] >= len(ellip_ids)
    assert tot["n_pass"] + 1 <= tot["n_docs"]  # something failed somewhere
    assert tot["n_docs"] == 60


def test_c4_planted_kills(web):
    out = c4_line_filter_partial(web).to_pandas()
    tot = out.drop(columns=["source"]).sum()
    drop_ids = {i for i in range(60) if i % 17 == 0 or i % 19 == 0}
    assert tot["docs_dropped"] == len(drop_ids)
    assert tot["docs_in"] == 60
    # javascript line never kept in surviving docs
    texts = web["text"].to_pylist()
    for i in range(60):
        if i % 23 == 0 and i not in drop_ids:
            lines = texts[i].split("\n")
            assert any("javascript" in ln for ln in lines)
    assert tot["lines_kept"] < tot["lines_total"]


def test_c4_scalar_reference(web):
    """One surviving doc: line rule replicated scalar-side."""
    texts = web["text"].to_pylist()
    i = 23  # javascript plant, not dropped (23 % 17, % 19 != 0)
    t = web.slice(i, 1)
    row = c4_line_filter_partial(t).to_pandas().iloc[0]
    lines = texts[i].split("\n")
    kept = [
        ln for ln in lines
        if ln[-1:] in (".", "!", "?", '"')
        and len(ln.split(" ")) >= 5
        and "javascript" not in ln.lower()
    ]
    assert row["docs_dropped"] == 0
    assert row["lines_total"] == len(lines)
    assert row["lines_kept"] == len(kept)
    assert row["chars_kept"] == sum(len(ln) for ln in kept)


def test_batch_invariance(web):
    """Partials are per-doc: one batch vs per-row batches give equal sums."""
    whole = gopher_repetition_partial(web).to_pandas().groupby("source").sum()
    parts = [gopher_repetition_partial(web.slice(i, 1)).to_pandas() for i in range(len(web))]
    import pandas as pd

    split = pd.concat(parts).groupby("source").sum()
    assert (whole.sort_index() == split.sort_index()).all().all()


def test_line_dedup_rewrite_planted():
    """Plant a boilerplate line in many docs; the rewrite removes exactly
    its occurrences and nothing from below-threshold lines."""
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.webclean import (
        dup_lines_dataset,
        line_dedup_rewrite_stats,
    )

    rows = []
    boiler = "subscribe to our newsletter"
    for i in range(24):
        lines = [f"unique line {i} alpha", f"unique line {i} beta"]
        if i % 2 == 0:
            lines.append(boiler)
        if i in (0, 6):
            lines.append(boiler)  # repeated within the doc too
        if i < 2:
            lines.append("rare pair line")  # only 2 docs — below threshold
        rows.append({"doc_id": i, "source": f"s{i % 3}", "text": "\n".join(lines)})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    dup = dup_lines_dataset(ds, threshold=3).to_pandas()
    assert dup["line"].tolist() == [boiler]
    assert int(dup["docs"].iloc[0]) == 12  # distinct docs, not occurrences

    out = line_dedup_rewrite_stats(ds, threshold=3)
    tot = out.drop(columns=["source"]).sum()
    assert tot["n_docs"] == 24
    assert tot["lines_removed"] == 14  # 12 docs + 2 in-doc repeats
    assert tot["chars_removed"] == 14 * len(boiler)
    assert tot["docs_emptied"] == 0


def test_line_dedup_no_dups_is_noop():
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.webclean import line_dedup_rewrite_stats

    rows = [{"doc_id": i, "source": "s0", "text": f"only line {i}"} for i in range(5)]
    out = line_dedup_rewrite_stats(rd.from_arrow(pa.Table.from_pylist(rows)), threshold=3)
    assert out["lines_removed"].sum() == 0 and out["docs_emptied"].sum() == 0


def test_webclean_pipeline_funnel_and_write(tmp_path):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.webclean import webclean_pipeline
    from commerce_logs_pipeline_ray.sources.webdocs import build_web_docs

    web = build_web_docs(_docs())
    ds = rd.from_arrow(web).repartition(4)
    out_dir = str(tmp_path / "cleaned")
    stats, final = webclean_pipeline(ds, out_dir=out_dir)
    tot = stats.drop(columns=["source"]).sum()
    kill_ids = {i for i in range(60) if i % 17 == 0 or i % 19 == 0}
    assert tot["docs_in"] == 60
    assert tot["docs_killed"] == len(kill_ids)
    # funnel is conservative: every doc lands in exactly one bucket or survives
    assert (tot["docs_killed"] + tot["docs_short"] + tot["docs_quality_fail"]
            + tot["docs_out"]) == 60
    # written corpus row count matches the funnel
    import pyarrow.dataset as pads2

    written = pads2.dataset(out_dir, partitioning="hive").to_table()
    assert written.num_rows == tot["docs_out"]
    # cleaned text has no javascript lines and no lorem docs
    for txt in written["text"].to_pylist():
        assert "javascript" not in txt.lower()
        assert "lorem ipsum" not in txt.lower()
