"""Similarity search: brute-force exactness + LSH recall/latency trade."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from commerce_logs_pipeline_ray.functions.sim import (
    HyperplaneLSH,
    brute_force_topk,
    build_lsh_index,
    lsh_topk,
)


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n, dim = 2000, 32
    mat = rng.normal(size=(n, dim))
    rows = [{"vec_id": i, "embedding": mat[i].astype(np.float32).tolist()} for i in range(n)]
    return rd.from_pandas(pd.DataFrame(rows)), mat


def test_brute_force_matches_numpy(corpus):
    ds, mat = corpus
    q = mat[7]
    got = brute_force_topk(ds, q, k=10)
    # ground truth
    m = mat.astype(np.float64)
    cos = (m @ q) / (np.sqrt((m * m).sum(1)) * np.sqrt((q * q).sum()))
    want = np.argsort(-cos)[:10]
    assert got["vec_id"].tolist() == want.tolist()
    assert got["cos"].iloc[0] == pytest.approx(1.0)


def test_lsh_recall_reasonable(corpus):
    ds, mat = corpus
    indexed, lsh = build_lsh_index(ds, dim=32, bits=6, seed=42)
    recalls = []
    searched_frac = []
    for qi in (1, 42, 77, 500, 999):
        q = mat[qi]
        exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
        approx = lsh_topk(indexed, lsh, q, k=10, multiprobe=2)
        recalls.append(len(exact & set(approx["vec_id"])) / 10)
        qsig = int(lsh.signature(q.reshape(1, -1))[0])
        searched_frac.append((indexed["bucket"] == qsig).mean())
    assert np.mean(recalls) >= 0.5  # multiprobe=2 on 6 bits searches ~1/3 of corpus
    assert np.mean(searched_frac) < 0.1  # single bucket is a small fraction


def test_lsh_deterministic(corpus):
    ds, mat = corpus
    i1, l1 = build_lsh_index(ds, dim=32, bits=6, seed=42)
    i2, l2 = build_lsh_index(ds, dim=32, bits=6, seed=42)
    assert (i1["bucket"].to_numpy() == i2["bucket"].to_numpy()).all()
    q = mat[5]
    assert lsh_topk(i1, l1, q, 5).equals(lsh_topk(i2, l2, q, 5))


def test_partitioned_lsh_index_prunes_and_agrees(ray_session, tmp_path):
    """Bucket-partitioned index on disk: a query reads only its probe
    buckets' dirs and returns the same rows as the in-memory index path."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sim import (
        _probe_buckets,
        build_lsh_index,
        build_lsh_index_partitioned,
        lsh_topk,
        lsh_topk_partitioned,
    )

    ds = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    d = str(tmp_path / "idx")
    lsh = build_lsh_index_partitioned(ds, d, dim=64, bits=6, seed=9)
    # every vector landed in exactly one bucket dir
    total = sum(
        sum(pq.read_table(f).num_rows for f in glob.glob(os.path.join(bd, "*.parquet")))
        for bd in glob.glob(os.path.join(d, "bucket=*"))
    )
    assert total == 500
    q = np.asarray(pq.read_table(
        "/root/testdata/sf0.01/embeddings.parquet").to_pandas().iloc[3]["embedding"], dtype=np.float64)
    got = lsh_topk_partitioned(d, lsh, q, k=5, multiprobe=1)
    indexed, lsh2 = build_lsh_index(ds, dim=64, bits=6, seed=9)
    want = lsh_topk(indexed, lsh2, q, k=5, multiprobe=1)
    assert list(got["vec_id"]) == list(want["vec_id"])
    # pruning: probe set < all buckets on disk
    probed = _probe_buckets(lsh, q, 1)
    on_disk = {int(os.path.basename(p).split("=")[1]) for p in glob.glob(os.path.join(d, "bucket=*"))}
    assert len(on_disk - probed) > 0


def test_ivf_exact_at_full_probe_and_recall_at_nprobe(ray_session, tmp_path):
    """IVF: nprobe==nlist scans every list → exactly the brute-force top-k;
    nprobe=4/16 keeps high recall while provably pruning on-disk reads."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sim import (
        brute_force_topk,
        build_ivf_index_partitioned,
        ivf_topk,
        train_ivf_centroids,
    )

    ds = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    cent = train_ivf_centroids(ds, nlist=16, dim=64, seed=5)
    assert cent.shape == (16, 64)
    assert np.allclose(np.sqrt((cent * cent).sum(axis=1)), 1.0)
    d = str(tmp_path / "ivf")
    build_ivf_index_partitioned(ds, d, cent)
    # every vector landed in exactly one list dir
    total = sum(
        sum(pq.read_table(f).num_rows for f in glob.glob(os.path.join(ld, "*.parquet")))
        for ld in glob.glob(os.path.join(d, "list_id=*"))
    )
    assert total == 500
    q = np.asarray(pq.read_table(
        "/root/testdata/sf0.01/embeddings.parquet").to_pandas().iloc[3]["embedding"], dtype=np.float64)
    exact = brute_force_topk(ds, q, k=10)
    full = ivf_topk(d, cent, q, k=10, nprobe=16)
    assert list(full["vec_id"]) == list(exact["vec_id"])
    approx = ivf_topk(d, cent, q, k=10, nprobe=4)
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.5, f"IVF recall {recall} below floor"


def test_ivf_centroids_deterministic(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sim import train_ivf_centroids

    ds = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    c1 = train_ivf_centroids(ds, nlist=8, dim=64, seed=3)
    c2 = train_ivf_centroids(ds.repartition(7), nlist=8, dim=64, seed=3)
    assert np.array_equal(c1, c2), "centroids must not depend on partitioning"


# ------------------------------------------------------------ Lloyd k-means

def test_lloyd_kmeans_recovers_planted_clusters(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sim import lloyd_kmeans

    rng = np.random.default_rng(13)
    centers = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 10.0]])
    pts = np.concatenate([c + rng.normal(0, 0.5, (40, 2)) for c in centers])
    # interleave so the deterministic init (k smallest ids) spans all three
    # planted clusters — Lloyd from co-located seeds correctly converges to
    # a split-cluster local optimum, which is not what this test probes
    pts = pts.reshape(3, 40, 2).transpose(1, 0, 2).reshape(-1, 2)
    t = pa.table(
        {"vec_id": pa.array(np.arange(len(pts))),
         "embedding": pa.array([p.tolist() for p in pts], type=pa.list_(pa.float32()))}
    )
    C, counts = lloyd_kmeans(rd.from_arrow(t), k=3, iters=8)
    # each recovered centroid sits within 0.5 of one planted center
    d = np.linalg.norm(C[:, None, :] - centers[None, :, :], axis=2)
    assert (d.min(axis=1) < 0.5).all()
    assert sorted(counts["n"]) == [40, 40, 40]


def test_lloyd_kmeans_deterministic_across_partitionings(ray_session):
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sim import lloyd_kmeans

    rng = np.random.default_rng(3)
    pts = rng.normal(0, 1, (200, 4))
    t = pa.table(
        {"vec_id": pa.array(np.arange(200)),
         "embedding": pa.array([p.tolist() for p in pts], type=pa.list_(pa.float32()))}
    )
    C1, n1 = lloyd_kmeans(rd.from_arrow(t).repartition(1), k=4, iters=4)
    C2, n2 = lloyd_kmeans(rd.from_arrow(t).repartition(7), k=4, iters=4)
    assert np.allclose(C1, C2, atol=1e-9)
    pd.testing.assert_frame_equal(
        n1.sort_values("cluster", ignore_index=True), n2.sort_values("cluster", ignore_index=True)
    )


def test_semantic_dedup_planted_truth(ray_session, tmp_path):
    """SemDeDup composition on a planted corpus: two tight clusters, each
    holding exact near-duplicate groups — in-cluster keep-min must drop
    exactly the planted copies and never a cross-cluster neighbor."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY

    rng = np.random.default_rng(5)
    dim = 64
    vecs, ids = [], []
    vid = 0
    for c in range(2):
        for g in range(5):
            # each group rides its own basis axis (+ a small shared cluster
            # component): same-group copies have cos ≈ 1, different groups
            # cos ≈ 0.2 — far below τ on both sides of the boundary
            proto = np.zeros(dim)
            proto[c] = 0.5
            proto[10 + c * 5 + g] = 1.0
            for copy in range(3):  # 3 EXACT copies per group (cos = 1.0,
                # identical vectors always co-assign — split-proof)
                vecs.append(proto.copy())
                ids.append(vid); vid += 1
    t = pa.table({
        "vec_id": pa.array(np.array(ids, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    d = tmp_path / "sd"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))
    out = REGISTRY["semantic_dedup"].fn(str(d))
    # every group keeps exactly its min-id member: 30 vectors, 10 groups
    assert int(out["n"].sum()) == 30
    assert int(out["n_dropped"].sum()) == 20


def test_als_user_step_solves_ridge(ray_session):
    """The per-user solution satisfies its normal equations and shrinks
    with lambda (ridge sanity), and bucketing doesn't change results."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from commerce_logs_pipeline_ray.functions.sim import als_user_step

    rows = []
    for u in range(12):
        for it in range(1 + u % 5):
            rows.append({"user_id": u, "item_id": 10 + 7 * it + u})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = als_user_step(ds).set_index("user_id")
    assert len(out) == 12
    # scalar replay for one user
    u = 4
    items = np.unique([r["item_id"] for r in rows if r["user_id"] == u])
    primes = np.array([3, 5, 7, 11])
    V = ((items[:, None] * primes[None, :]) % 1000) / 1000.0 - 0.5
    x = np.linalg.solve(V.T @ V + 0.1 * np.eye(4), V.T @ np.ones(len(items)))
    assert abs(out.loc[u, "norm2"] - float((x * x).sum())) < 1e-6
    # repartitioned input → identical output
    out2 = als_user_step(rd.from_pandas(pd.DataFrame(rows)).repartition(5)).set_index("user_id")
    assert out.equals(out2)
