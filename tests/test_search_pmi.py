"""Inverted-index search + PMI collocations vs driver-side references."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from commerce_logs_pipeline_ray.functions.search import conjunctive_search, postings
from commerce_logs_pipeline_ray.functions.tokens import pmi_topk


def test_conjunctive_search_planted(ray_session):
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma alpha",   # both terms, tf(alpha)=2
                "alpha alpha alpha",        # missing beta → excluded
                "Beta ALPHA!",              # case/punct robustness, score 2
                "gamma delta",              # neither
            ],
        }
    )
    for blocks in (1, 3):
        ds = rd.from_arrow(docs).repartition(blocks)
        out = conjunctive_search(postings(ds), ["alpha", "beta"], k=10)
        assert out["doc_id"].tolist() == [1, 3]
        assert out["score"].tolist() == [3, 2]


def test_pmi_matches_counter_reference(ray_session):
    rng = np.random.default_rng(19)
    seqs = [rng.integers(0, 12, size=rng.integers(2, 30)).astype(np.int32) for _ in range(300)]
    t = pa.table({"tokens": pa.array([s.tolist() for s in seqs], pa.list_(pa.int32()))})

    uni = Counter(int(x) for s in seqs for x in s)
    bi = Counter((int(s[i]), int(s[i + 1])) for s in seqs for i in range(len(s) - 1))
    t_uni, t_bi = sum(uni.values()), sum(bi.values())
    ref = []
    for (a, b), c in bi.items():
        if c >= 5:
            pmi = math.log((c / t_bi) / ((uni[a] / t_uni) * (uni[b] / t_uni)))
            ref.append((pmi, a, b, c))
    ref.sort(key=lambda r: (-r[0], r[1], r[2]))
    ref = ref[:15]

    for blocks in (1, 4):
        ds = rd.from_arrow(t).repartition(blocks)
        out = pmi_topk(ds, k=15, min_count=5)
        assert list(zip(out["token_a"], out["token_b"], out["count"])) == [
            (a, b, c) for _, a, b, c in ref
        ]
        np.testing.assert_allclose(
            out["pmi"].to_numpy(), np.round([p for p, *_ in ref], 6), atol=1e-9
        )


def test_bm25_ranks_rarer_terms_higher():
    """BM25: a doc matching a rare term outranks one matching a common term
    with equal tf; idf/df arithmetic checked against a scalar reference."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.search import bm25_topk

    rows = []
    # 'common' appears in every doc; 'rare' only in doc 0
    for i in range(20):
        words = ["common"] * 3 + ["filler"] * 5
        if i == 0:
            words = ["rare"] * 3 + ["filler"] * 5
        rows.append({"doc_id": i, "text": " ".join(words)})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = bm25_topk(ds, ["rare", "common"], k=20).set_index("doc_id")
    assert out.index[0] == 0  # rare-term doc wins
    # scalar reference for doc 0: N=20, df_rare=1, dl=8, avgdl=8
    idf = math.log((20 - 1 + 0.5) / (1 + 0.5) + 1)
    expect = idf * (3 * 2.2) / (3 + 1.2 * (0.25 + 0.75 * 1.0))
    assert abs(out.loc[0, "score"] - expect) < 1e-9
    # every other doc shares one identical 'common' score
    others = out.drop(index=0)["score"]
    assert others.nunique() == 1


def test_bm25_batching_invariance():
    import pyarrow as pa
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.search import bm25_topk

    rows = [{"doc_id": i, "text": " ".join(["alpha"] * (i % 4 + 1) + ["beta"] * 3)}
            for i in range(30)]
    t = pa.Table.from_pylist(rows)
    a = bm25_topk(rd.from_arrow(t), ["alpha", "beta"], k=30)
    b = bm25_topk(rd.from_arrow(t).repartition(7), ["alpha", "beta"], k=30)
    assert a.equals(b)


def test_mmr_prefers_diverse_over_duplicate(ray_session):
    """A near-duplicate of the top hit must be pushed below a less-relevant
    but different doc."""
    import pyarrow as pa
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.search import mmr_rerank

    rows = [
        {"doc_id": 0, "text": "query term rich doc about topic alpha beta gamma"},
        # near-duplicate of doc 0 (same word set + one extra)
        {"doc_id": 1, "text": "query term rich doc about topic alpha beta gamma extra"},
        # relevant but lexically different
        {"doc_id": 2, "text": "query term appears here with wholly different words indeed"},
    ] + [
        {"doc_id": 10 + i, "text": f"filler text number {i} nothing relevant"}
        for i in range(10)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = mmr_rerank(ds, ["query", "term"], k=3, pool=10, lam=0.5)
    picked = out["doc_id"].tolist()
    assert picked[0] in (0, 1)          # pure relevance first
    assert picked[1] == 2               # diversity beats the near-dup
    assert set(picked[:3]) != {0, 1, 2} or picked[2] in (0, 1)
