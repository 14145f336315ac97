"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _corpus_dir, _i64, _rd, _t, np, pa, pads, pd, pq, topk  # noqa: F401

# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k against a broadcast query vector
# ---------------------------------------------------------------------------

def q_cosine_topk(sf_dir: str) -> pd.DataFrame:
    # row-group-predicate read: only the query row reaches the driver
    emb0 = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=pads.field("vec_id") == 0,
    )
    assert emb0.num_rows == 1
    qvec = np.asarray(emb0["embedding"].to_pylist()[0], dtype=np.float64)
    qnorm = np.sqrt((qvec * qvec).sum())

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def cos(t: pa.Table) -> pa.Table:
        arr = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        mat = flat.reshape(len(t), -1)
        dots = mat @ qvec
        norms = np.sqrt((mat * mat).sum(axis=1))
        c = dots / (norms * qnorm)
        return pa.table({"vec_id": t["vec_id"], "cos": pa.array(c)})

    scored = ds.map_batches(cos, batch_format="pyarrow", zero_copy_batch=True)
    out = topk(scored, ["cos", "vec_id"], [True, False], 10).to_pandas()
    out["cos"] = out["cos"].pipe(_rd)
    return _i64(out, ["vec_id"])


def q_ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """Top-10 by cosine THROUGH the IVF index machinery: train the spherical
    k-means coarse quantizer, build the list-partitioned on-disk index
    (idempotent versioned /tmp artifact), query it.  Registered with
    ``nprobe == nlist`` so every list is scanned — exact by construction,
    sharing `cosine_topk`'s SQL oracle while exercising centroid training,
    the partitioned build, and the dir-pruned read path end-to-end.  The
    approximate scale path (``nprobe < nlist``) is recall-measured in
    tests/test_sim.py."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from ...functions.sim import build_ivf_index_partitioned, ivf_topk, train_ivf_centroids

    emb0 = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=pads.field("vec_id") == 0,
    )
    qvec = np.asarray(emb0["embedding"].to_pylist()[0], dtype=np.float64)

    nlist = 16
    index_dir = _os.path.join(_corpus_dir(sf_dir), "ivf_index_v1")
    cent_path = _os.path.join(index_dir, "centroids.npy")
    if not _os.path.exists(cent_path):
        ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
        cent = train_ivf_centroids(ds, nlist=nlist, dim=len(qvec), seed=42)
        tmp = index_dir + f".tmp-{_uuid.uuid4().hex}"
        build_ivf_index_partitioned(ds, tmp, cent)
        np.save(_os.path.join(tmp, "centroids.npy"), cent)
        try:
            _os.rename(tmp, index_dir)  # atomic publish; loser cleans up
        except OSError:
            _shutil.rmtree(tmp, ignore_errors=True)
    cent = np.load(cent_path)
    out = ivf_topk(index_dir, cent, qvec, k=10, nprobe=nlist)
    return _i64(out, ["vec_id"])


# CAST to DOUBLE[]: DuckDB computes list_cosine_similarity on FLOAT[] in
# float32; the Ray side (numpy) computes in float64 — force float64 on both.
SQL_COSINE_TOPK = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)), 6) AS cos
FROM embeddings
ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)) DESC, vec_id
LIMIT 10
"""

