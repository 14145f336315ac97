"""Planted-truth tests for PII scrub + text normalization (functions/scrub.py)
over the deterministic messy corpus (sources/messy.py)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from commerce_logs_pipeline_ray.functions.scrub import (
    normalize_partials,
    normalize_text,
    pii_partials,
    scrub_text,
)
from commerce_logs_pipeline_ray.sources.messy import build_messy_table

SF_DIR = "/root/testdata/sf0.001"


def _messy():
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"])
    return docs, build_messy_table(docs)


def test_planted_pii_counts_exact():
    docs, messy = _messy()
    ids = docs["doc_id"].to_pylist()
    part = pii_partials(messy)
    total = {
        "n_email": sum(1 for i in ids if i % 3 == 0),
        "n_ip": sum(1 for i in ids if i % 5 == 0),
        "n_phone": sum(1 for i in ids if i % 7 == 0),
        "docs_with_pii": sum(1 for i in ids if i % 3 == 0 or i % 5 == 0 or i % 7 == 0),
    }
    for col, want in total.items():
        assert pc.sum(part[col]).as_py() == want, col


def test_scrub_removes_all_planted_pii():
    _, messy = _messy()
    scrubbed = scrub_text(messy["text"])
    # no '@' and no digit sequences survive (the word-salad corpus itself has
    # neither, so any leftover would be a missed redaction)
    assert pc.sum(pc.count_substring(scrubbed, "@")).as_py() == 0
    assert pc.sum(pc.count_substring_regex(scrubbed, pattern=r"\d")).as_py() == 0
    # sentinels present exactly where planted
    ids = messy["doc_id"].to_pylist()
    n_email_docs = sum(1 for i in ids if i % 3 == 0)
    has_email = pc.sum(
        pc.cast(pc.match_substring(scrubbed, "<EMAIL>"), pa.int64())
    ).as_py()
    assert has_email == n_email_docs


def test_normalize_changed_docs_are_exactly_the_even_ids():
    """Odd ids get only lowercase single-space appends — normalization is a
    no-op on them; every even id was uppercased, so it must change."""
    _, messy = _messy()
    ids = messy["doc_id"].to_pylist()
    norm = normalize_text(messy["text"])
    changed = pc.invert(pc.equal(norm, messy["text"])).to_pylist()
    for i, ch in zip(ids, changed):
        assert ch == (i % 2 == 0), i


def test_normalize_idempotent():
    _, messy = _messy()
    once = normalize_text(messy["text"])
    twice = normalize_text(once)
    assert pc.all(pc.equal(once, twice)).as_py()


def test_partials_are_mergeable():
    """Splitting the corpus into chunks and summing partials equals the
    single-pass totals (the combiner contract grouped_sums relies on)."""
    _, messy = _messy()
    whole = pii_partials(messy).to_pandas().set_index("source").sort_index()
    a = pii_partials(messy.slice(0, len(messy) // 2)).to_pandas()
    b = pii_partials(messy.slice(len(messy) // 2)).to_pandas()
    import pandas as pd

    merged = (
        pd.concat([a, b]).groupby("source").sum().sort_index()
    )
    assert merged.equals(whole)

    whole_n = normalize_partials(messy).to_pandas().set_index("source").sort_index()
    an = normalize_partials(messy.slice(0, len(messy) // 2)).to_pandas()
    bn = normalize_partials(messy.slice(len(messy) // 2)).to_pandas()
    merged_n = pd.concat([an, bn]).groupby("source").sum().sort_index()
    assert merged_n.equals(whole_n)


def test_messy_builder_deterministic():
    docs, m1 = _messy()
    m2 = build_messy_table(docs)
    assert m1.equals(m2)
