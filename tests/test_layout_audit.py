"""Tests for the training-layout / corpus-audit operators: stride chunking,
FIM reorder, n-gram diversity, kNN label consistency."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from commerce_logs_pipeline_ray.functions.sim import knn_label_consistency
from commerce_logs_pipeline_ray.functions.text import ngram_diversity
from commerce_logs_pipeline_ray.functions.tokens import (
    fim_layout_stats,
    stride_window_stats,
)


def _tok_table():
    rows = []
    for i in range(40):
        n = 12 + (i * 7) % 50
        toks = [(i * 31 + k * 3) % 97 for k in range(n)]
        rows.append({"doc_id": f"d{i}", "tokens": toks, "n_tok": n, "source": f"s{i % 3}"})
    return pa.Table.from_pylist(rows)


def test_stride_chunks_scalar_reference():
    t = _tok_table()
    out = stride_window_stats(rd.from_arrow(t).repartition(5), window=16, stride=12)
    # scalar replay
    import collections

    ref = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in t.to_pylist():
        toks, n = r["tokens"], r["n_tok"]
        k = 0
        while k * 12 < n:
            clen = min(16, n - k * 12)
            ref[r["source"]][0] += 1
            ref[r["source"]][1] += clen
            ref[r["source"]][2] += clen == 16
            ref[r["source"]][3] += toks[k * 12] + toks[k * 12 + clen - 1]
            k += 1
    for _, row in out.iterrows():
        e = ref[row["source"]]
        assert [row["n_chunks"], row["chunk_tokens"], row["full_chunks"],
                row["edge_checksum"]] == e


def test_stride_overlap_counts_tokens_twice():
    t = pa.Table.from_pylist(
        [{"doc_id": "a", "tokens": list(range(20)), "n_tok": 20, "source": "s"}]
    )
    out = stride_window_stats(rd.from_arrow(t), window=16, stride=8)
    # chunks: [0:16], [8:20], [16:20] → 16 + 12 + 4 = 32 tokens counted
    assert int(out["n_chunks"].iloc[0]) == 3
    assert int(out["chunk_tokens"].iloc[0]) == 32


def test_fim_reorder_checksum_scalar():
    t = _tok_table()
    out = fim_layout_stats(rd.from_arrow(t).repartition(4), min_len=12).set_index("source")
    import collections

    ref = collections.defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in t.to_pylist():
        toks, n = r["tokens"], r["n_tok"]
        if n < 12:
            continue
        c1 = n // 4 + toks[0] % 5
        c2 = min(c1 + n // 2 - toks[1] % 3, n - 1)
        assert 0 < c1 < c2 < n
        reordered = toks[:c1] + toks[c2:] + toks[c1:c2]
        ref[r["source"]][0] += 1
        ref[r["source"]][1] += c1
        ref[r["source"]][2] += c2 - c1
        ref[r["source"]][3] += n - c2
        ref[r["source"]][4] += sum((p + 1) * v for p, v in enumerate(reordered))
    for src, e in ref.items():
        row = out.loc[src]
        assert [row["n_docs_fim"], row["prefix_tokens"], row["middle_tokens"],
                row["suffix_tokens"], row["fim_checksum"]] == e


def test_fim_short_docs_excluded():
    t = pa.Table.from_pylist(
        [{"doc_id": "a", "tokens": list(range(5)), "n_tok": 5, "source": "s"},
         {"doc_id": "b", "tokens": list(range(20)), "n_tok": 20, "source": "s"}]
    )
    out = fim_layout_stats(rd.from_arrow(t), min_len=12)
    assert int(out["n_docs_fim"].iloc[0]) == 1
    assert int(out["prefix_tokens"].iloc[0] + out["middle_tokens"].iloc[0]
               + out["suffix_tokens"].iloc[0]) == 20


def test_ngram_diversity_planted():
    rows = [
        {"source": "rep", "text": "a a a a a a"},          # 1 distinct unigram
        {"source": "div", "text": "q w e r t y"},          # all distinct
    ]
    out = ngram_diversity(rd.from_arrow(pa.Table.from_pylist(rows)), ns=(1, 2)).set_index("source")
    assert out.loc["rep", "total_1"] == 6 and out.loc["rep", "distinct_1"] == 1
    assert out.loc["div", "distinct_1"] == 6 and out.loc["div", "div_1"] == 1.0
    assert out.loc["rep", "distinct_2"] == 1  # "a a" only
    # distinct counting must dedup ACROSS batches too
    many = [{"source": "x", "text": "p q"} for _ in range(50)]
    out2 = ngram_diversity(
        rd.from_arrow(pa.Table.from_pylist(many)).repartition(8), ns=(1, 2)
    ).set_index("source")
    assert out2.loc["x", "distinct_1"] == 2 and out2.loc["x", "total_1"] == 100
    assert out2.loc["x", "distinct_2"] == 1


def test_knn_label_consistency_blobs():
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(3, 16)) * 10
    rows = []
    for i in range(90):
        lab = i % 3
        rows.append(
            {"vec_id": i, "label": lab,
             "embedding": (centers[lab] + rng.normal(size=16) * 0.1).tolist()}
        )
    # one mislabeled point sitting in cluster 0's blob
    rows.append({"vec_id": 900, "label": 2,
                 "embedding": (centers[0] + rng.normal(size=16) * 0.1).tolist()})
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = knn_label_consistency(ds, tile=17).set_index("label")
    # pure blobs are self-consistent (the impostor inside blob 0 may claim
    # at most a few blob-0 points' NN slots)
    assert out.loc[1, "nn_same"] == 30
    assert out.loc[0, "nn_same"] >= 29
    # the planted point's NN is a cluster-0 member → inconsistent
    assert out.loc[2, "n"] == 31 and out.loc[2, "nn_same"] == 30
    assert out.loc[2, "acc"] < 1.0


def test_image_phash_groups_scaled_and_bright():
    from commerce_logs_pipeline_ray.sources.media import (
        _gray_grid_dhash,
        build_image_scale_dup_table,
    )
    from commerce_logs_pipeline_ray.stages.multimodal import ImagePHash

    t = build_image_scale_dup_table(12)
    out = ImagePHash()(t.select(["media_id", "payload"])).to_pandas()
    out = out.merge(t.select(["media_id", "dup_of"]).to_pandas(), on="media_id")
    # engine phash grouping must equal the scalar-truth grouping exactly
    by_hash = out.groupby("phash")["media_id"].min()
    out["engine_dup"] = out["phash"].map(by_hash)
    assert (out["engine_dup"] == out["dup_of"]).all()
    # the 2x copy is pixel- AND byte-different yet hash-equal
    a = out.set_index("media_id")
    assert a.loc["simg00000", "phash"] == a.loc["simg00000s2", "phash"]
    assert a.loc["simg00000", "phash"] == a.loc["simg00000b1", "phash"]
    # scalar reference agrees with the vectorized kernel bit-for-bit
    from commerce_logs_pipeline_ray.functions.media_codecs import decode_png

    for mid in ("simg00001", "simg00002s2"):
        img = decode_png(t.to_pandas().set_index("media_id").loc[mid, "payload"])
        assert _gray_grid_dhash(img) == int(a.loc[mid, "phash"])


def test_contrastive_pairs_planted(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sim import contrastive_pairs

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(2, 8)) * 10
    rows = []
    for i in range(40):
        lab = i % 2
        rows.append({"vec_id": i, "label": lab,
                     "embedding": (centers[lab] + rng.normal(size=8) * 0.05).tolist()})
    out = contrastive_pairs(
        rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3), tile=13
    ).set_index("vec_id")
    assert len(out) == 40
    # positives share the anchor's label parity, negatives the other
    assert ((out.index % 2) == (out["pos_id"] % 2)).all()
    assert ((out.index % 2) != (out["neg_id"] % 2)).all()
    # well-separated blobs → every margin strongly positive
    assert (out["margin"] > 0).all()
    assert (out["pos_id"] != out.index).all()
