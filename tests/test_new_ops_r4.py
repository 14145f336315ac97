"""Round-4 operators: exact n-gram Jaccard pairs, winnowing fingerprints,
greedy k-center coreset — planted-truth tests (the DuckDB/artifact oracles
cover the real corpus; these pin the semantics on hand-checkable inputs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_ngram_jaccard_pairs_planted(ray_session):
    from commerce_logs_pipeline_ray.functions.grams import ngram_jaccard_pairs

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c d e",        # grams: abc bcd cde
            "a b c d x",        # grams: abc bcd cdx  → inter 2, union 4 → 0.5
            "q r s t u",        # disjoint
            "a b c d e",        # identical to 1 → 1.0 with both
        ],
    })
    got = ngram_jaccard_pairs(rd.from_pandas(docs), k=3, threshold=0.5, max_df=100)
    want = {(1, 2): 0.5, (1, 4): 1.0, (2, 4): 0.5}
    assert {(a, b): j for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])} == want
    assert list(got["n_shared"]) == [2, 3, 2]
    # df-cap: with max_df=2 the shared 'a b c'/'b c d' grams (df=3) vanish,
    # only the pair of identical docs keeps 'c d e' (df=2)
    capped = ngram_jaccard_pairs(rd.from_pandas(docs), k=3, threshold=0.5, max_df=2)
    assert {(a, b) for a, b in zip(capped["doc_a"], capped["doc_b"])} == {(1, 4)}
    # short docs (<k words) have no gram set and never pair
    short = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b"]})
    assert len(ngram_jaccard_pairs(rd.from_pandas(short), k=3, threshold=0.1)) == 0


def test_winnowing_stats_hand_checked(ray_session):
    from commerce_logs_pipeline_ray.functions.dedup import gram_hash_stream
    from commerce_logs_pipeline_ray.functions.grams import _gram_mix, winnowing_stats

    texts = ["w0 w1 w2 w3 w4 w5 w6 w7", "a b c d e f", "tiny doc"]
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts,
                         "source": ["s1", "s1", "s2"]})
    k, w = 3, 4
    mix = _gram_mix(k, 42)
    got = winnowing_stats(rd.from_pandas(docs), k=k, w=w)

    # reference: per doc, windows of w gram hashes, rightmost min each
    grams, offs = gram_hash_stream(texts, k, mix, pad_short=False)
    exp = {}
    for d in range(3):
        g = grams[offs[d]:offs[d + 1]]
        sel = set()
        for s in range(len(g) - w + 1):
            win = g[s:s + w]
            m = win.min()
            sel.add(s + max(np.flatnonzero(win == m)))
        if sel:
            exp[d] = (len(sel), len({int(g[p]) for p in sel}))
    s1 = got[got["source"] == "s1"].iloc[0]
    assert int(s1["n_docs"]) == 2
    assert int(s1["n_selected"]) == exp[0][0] + exp[1][0]
    assert int(s1["n_distinct"]) == exp[0][1] + exp[1][1]
    # 2-word doc: no grams, no fingerprints, source absent entirely
    assert "s2" not in set(got["source"])


def test_kcenter_coreset_planted_geometry(ray_session):
    from commerce_logs_pipeline_ray.functions.sim import kcenter_coreset

    # three tight clusters far apart + noise: the first three picks must
    # come from three DIFFERENT clusters (farthest-point property)
    rng = np.random.default_rng(5)
    centers = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    pts, labels = [], []
    for ci, c in enumerate(centers):
        pts.append(c + rng.normal(0, 0.5, size=(20, 2)))
        labels += [ci] * 20
    X = np.vstack(pts)
    ids = np.arange(60)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in X],
                                        pa.list_(pa.float32()))})
    got = kcenter_coreset(rd.from_arrow(t).repartition(4), k=3)
    assert list(got["sel_order"]) == [0, 1, 2]
    assert int(got["vec_id"].iloc[0]) == 0  # seed = smallest id
    picked_clusters = [labels[int(v)] for v in got["vec_id"]]
    assert len(set(picked_clusters)) == 3
    # dist column is the selection-time farthest distance: decreasing-ish
    assert got["dist"].iloc[1] >= got["dist"].iloc[2] >= 0


def test_concat_chunk_tokens_planted(ray_session):
    """3 docs, seq_len=4, EOS=99: stream = d0(3)+EOS, d1(6)+EOS, d2(1)+EOS
    = [1,2,3,99,10,11,12,13,14,15,99,20,99] -> chunks
    [1,2,3,99] [10,11,12,13] [14,15,99,20] [99]."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.tokens import concat_chunk_tokens

    docs = pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "tokens": [[1, 2, 3], [10, 11, 12, 13, 14, 15], [20]],
        "n_tok": [3, 6, 1],
    })
    out = (
        concat_chunk_tokens(rd.from_pandas(docs), seq_len=4, eos_id=99,
                            emit_tokens=True)
        .to_pandas().sort_values("chunk_id", ignore_index=True)
    )
    want = [[1, 2, 3, 99], [10, 11, 12, 13], [14, 15, 99, 20], [99]]
    assert out["chunk_id"].tolist() == [0, 1, 2, 3]
    assert [list(x) for x in out["tokens"]] == want
    assert out["n_tokens"].tolist() == [4, 4, 4, 1]
    assert out["n_doc_starts"].tolist() == [1, 1, 1, 0]
    assert out["token_sum"].tolist() == [sum(c) for c in want]
    # conservation: every token + one EOS per doc, each exactly once
    assert out["n_tokens"].sum() == 3 + 6 + 1 + 3


def test_concat_chunk_tokens_block_invariance(ray_session):
    """Chunk stats must not depend on input block slicing."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.tokens import concat_chunk_tokens

    rng = np.random.default_rng(5)
    docs = pd.DataFrame({
        "doc_id": [f"d{i:03d}" for i in range(60)],
        "tokens": [rng.integers(0, 1000, size=rng.integers(1, 40)).tolist()
                   for _ in range(60)],
    })
    docs["n_tok"] = docs["tokens"].map(len)
    outs = []
    for blocks in (1, 7):
        ds = rd.from_pandas(docs).repartition(blocks)
        o = (concat_chunk_tokens(ds, seq_len=64, eos_id=-1)
             .to_pandas().sort_values("chunk_id", ignore_index=True))
        outs.append(o[["chunk_id", "n_tokens", "n_doc_starts", "token_sum"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])
