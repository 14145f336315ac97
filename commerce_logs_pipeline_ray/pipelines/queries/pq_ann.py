"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _i64, _rd, _t, np, pa, pads, pd, pq  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# Product-quantization ANN (ADC scan over per-subspace codebooks)
# ---------------------------------------------------------------------------

def ensure_pq_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``pq_ann_topk``: the expected ADC top-10 derived
    by an INDEPENDENT replay of the PQ determinism contract — per-CENTROID
    column loops (``((X - C[c])**2).sum(1)``) instead of the engine's
    3-tensor broadcast, explicit first-min tie-breaks, plain argsort top-k.
    Bit-equal because both formulations square elementwise and sum the same
    8 contiguous float64 lanes (functions/sim.py)."""
    import os as _os

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        order = np.argsort(np.asarray(t["vec_id"].to_numpy(zero_copy_only=False)), kind="stable")
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False))[order]
        X = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])[order]
        m, kc, iters = 8, 16, 10
        sub = X.shape[1] // m
        books = []
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            C = Xj[:kc].copy()
            for _ in range(iters):
                d2 = np.empty((len(Xj), kc))
                for c in range(kc):
                    d2[:, c] = ((Xj - C[c]) ** 2).sum(axis=1)
                a = d2.argmin(axis=1)  # first min == lowest code on ties
                for c in range(kc):
                    if (a == c).any():
                        C[c] = Xj[a == c].mean(axis=0)
            books.append(C)
        qv = X[int(np.nonzero(ids == 0)[0][0])]
        dists = np.zeros(len(X))
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            d2 = np.empty((len(Xj), kc))
            lut = np.empty(kc)
            for c in range(kc):
                d2[:, c] = ((Xj - books[j][c]) ** 2).sum(axis=1)
                lut[c] = ((qv[j * sub : (j + 1) * sub] - books[j][c]) ** 2).sum()
            dists = dists + lut[d2.argmin(axis=1)]
        top = np.lexsort((ids, dists))[:10]
        return pa.table(
            {
                "vec_id": pa.array(ids[top], pa.int64()),
                "adc": pa.array(_rd(dists[top], 6)),
            }
        )

    return _ensure_artifact(_os.path.join(_corpus_dir(sf_dir), "pq_ref.parquet"), build)


def q_pq_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Top-10 by PQ Asymmetric Distance Computation (Jégou et al. 2011):
    8 subspace codebooks × 16 codes trained deterministically, per-batch
    encode + LUT-gather scan, distributed top-k merge
    (functions/sim.py::train_pq_codebooks / pq_adc_topk)."""
    from ...functions.sim import pq_adc_topk, train_pq_codebooks

    ensure_pq_ref_parquet(sf_dir)
    emb0 = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=pads.field("vec_id") == 0,
    )
    qvec = np.asarray(emb0["embedding"].to_pylist()[0], dtype=np.float64)
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = train_pq_codebooks(ds, m=8, kc=16, iters=10)
    out = pq_adc_topk(ds, books, qvec, k=10)
    out["adc"] = out["adc"].pipe(_rd)
    return _i64(out, ["vec_id"])


SQL_PQ_ANN_TOPK = """
SELECT CAST(vec_id AS BIGINT) AS vec_id, adc
FROM read_parquet('{AD}/pq_ref.parquet') ORDER BY adc, vec_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


