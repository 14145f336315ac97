"""Product-quantization tests: determinism, batching invariance, and
measured ADC recall vs exact L2."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from commerce_logs_pipeline_ray.functions.sim import (
    pq_adc_topk,
    pq_encode_batch,
    train_pq_codebooks,
)


def _emb_table(n=300, d=32, seed=7):
    rng = np.random.default_rng(seed)
    # clustered data (PQ shines on structure): 6 gaussian blobs
    centers = rng.normal(size=(6, d)) * 3
    X = centers[np.arange(n) % 6] + rng.normal(size=(n, d))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([row for row in X.astype(np.float64)],
                                  type=pa.list_(pa.float64())),
        }
    ), X


def test_codebook_shapes_and_determinism():
    t, _ = _emb_table()
    b1 = train_pq_codebooks(rd.from_arrow(t), m=4, kc=8, iters=5)
    b2 = train_pq_codebooks(rd.from_arrow(t).repartition(5), m=4, kc=8, iters=5)
    assert b1.shape == (4, 8, 8)
    assert np.array_equal(b1, b2)  # training is batching-independent


def test_encode_batch_invariance():
    t, _ = _emb_table()
    books = train_pq_codebooks(rd.from_arrow(t), m=4, kc=8, iters=5)
    whole = pq_encode_batch(t, books)
    parts = np.concatenate([pq_encode_batch(t.slice(i, 50), books) for i in range(0, 300, 50)])
    assert np.array_equal(whole, parts)
    assert whole.min() >= 0 and whole.max() < 8


def test_adc_recall_vs_exact():
    t, X = _emb_table()
    ds = rd.from_arrow(t).repartition(4)
    books = train_pq_codebooks(ds, m=8, kc=16, iters=10)
    q = X[0]
    got = pq_adc_topk(ds, books, q, k=10)["vec_id"].tolist()
    exact = np.argsort(((X - q) ** 2).sum(axis=1), kind="stable")[:10].tolist()
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.6, f"ADC recall@10 {recall}"
    assert got[0] == 0  # self-match survives quantization on blobbed data


def test_adc_is_true_lower_dim_distance():
    """ADC of a vector equals the LUT-sum of its own codes (scalar check)."""
    t, X = _emb_table(n=40)
    ds = rd.from_arrow(t)
    books = train_pq_codebooks(ds, m=4, kc=8, iters=5)
    q = X[3]
    out = pq_adc_topk(ds, books, q, k=40).set_index("vec_id")
    m, kc, sub = books.shape
    codes = pq_encode_batch(t, books)
    for i in (0, 7, 21):
        s = sum(
            float(((q[j * sub : (j + 1) * sub] - books[j][codes[i, j]]) ** 2).sum())
            for j in range(m)
        )
        assert abs(out.loc[i, "adc"] - s) < 1e-9
