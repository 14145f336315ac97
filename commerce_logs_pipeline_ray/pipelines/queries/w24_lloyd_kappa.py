"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import _i64, _rd, _t, grouped_sums, np, pa, pc, pd  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 24: quantized Lloyd assignment step, Cohen's kappa annotator agreement
# ---------------------------------------------------------------------------

_LLOYD_K = 8


def q_lloyd_step_quantized(sf_dir: str) -> pd.DataFrame:
    """One exact Lloyd (k-means) assignment step on µ-int-quantized
    embeddings — the PQ/IVF training inner loop made bit-deterministic:
    centers are the 8 smallest vec-ids' quantized vectors, every vector
    assigns to the center minimizing INTEGER squared distance (ties to the
    smaller center), and the step reports per-center counts plus the exact
    integer sums the centroid update would use.  Centers broadcast once;
    each batch is one int64 matmul + argmin; only k-row partials reduce."""
    import ray as _ray

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        arr = t["embedding"].combine_chunks()
        mat = np.asarray(arr.flatten(), dtype=np.float64).reshape(len(t), -1)
        q = np.floor(mat * 1000.0).astype(np.int64)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return vid, q

    first = (
        ds.map_batches(
            lambda t: pd.DataFrame({"vec_id": t["vec_id"].to_numpy(zero_copy_only=False)}),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        .to_pandas()["vec_id"]
        .to_numpy(np.int64)
    )
    center_ids = np.sort(first)[:_LLOYD_K]

    def pick_centers(t: pa.Table, *, _ids=center_ids) -> pd.DataFrame:
        vid, q = quant(t)
        keep = np.isin(vid, _ids)
        return pd.DataFrame({"vec_id": vid[keep], "q": list(q[keep])})

    cdf = (
        ds.map_batches(pick_centers, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    centers = np.stack(cdf["q"].to_numpy()).astype(np.int64)
    ref = _ray.put((center_ids, centers))

    def assign(t: pa.Table, *, _ref=ref) -> pd.DataFrame:
        ids, cm = _ray.get(_ref)
        vid, q = quant(t)
        # |q - c|² = |q|² - 2 q·c + |c|²; argmin over centers
        d = (
            (q * q).sum(axis=1)[:, None]
            - 2 * (q @ cm.T)
            + (cm * cm).sum(axis=1)[None, :]
        )
        a = np.argmin(d, axis=1)  # np.argmin takes the FIRST min → smaller center
        out = pd.DataFrame(
            {"center_id": ids[a], "n_assigned": 1,
             "sum_dim0": q[:, 0], "mass": q.sum(axis=1)}
        )
        return out.groupby("center_id", as_index=False).sum()

    agg = grouped_sums(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        ["center_id"],
        {"n_assigned": "n_assigned", "sum_dim0": "sum_dim0", "mass": "mass"},
    ).to_pandas()
    out = agg.sort_values("center_id", ignore_index=True)
    return _i64(out, ["center_id", "n_assigned", "sum_dim0", "mass"])


SQL_LLOYD_STEP_QUANTIZED = f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qv
  FROM embeddings),
cid AS (SELECT vec_id AS center_id,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS c
        FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id LIMIT {_LLOYD_K})),
cvec AS (SELECT cid.center_id, q.i, q.qv FROM cid JOIN q ON q.vec_id = cid.center_id),
dist AS (
  SELECT q.vec_id, cv.center_id,
         SUM((q.qv - cv.qv) * (q.qv - cv.qv)) AS d
  FROM q JOIN cvec cv ON cv.i = q.i
  GROUP BY 1, 2),
best AS (
  SELECT vec_id, center_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, center_id) AS rk
  FROM dist),
asg AS (SELECT vec_id, center_id FROM best WHERE rk = 1),
feat AS (
  SELECT vec_id, MAX(CASE WHEN i = 1 THEN qv END) AS dim0,
         CAST(SUM(qv) AS BIGINT) AS mass
  FROM q GROUP BY 1)
SELECT a.center_id, COUNT(*) AS n_assigned,
       CAST(SUM(f.dim0) AS BIGINT) AS sum_dim0, CAST(SUM(f.mass) AS BIGINT) AS mass
FROM asg a JOIN feat f ON f.vec_id = a.vec_id
GROUP BY 1 ORDER BY a.center_id
"""


_KAPPA_A_WORDS = 20
_KAPPA_B_CHARS = 120


def q_cohens_kappa(sf_dir: str) -> pd.DataFrame:
    """Cohen's kappa inter-annotator agreement between two deterministic
    labeling rules (A: ≥20 words, B: ≥120 chars) — the annotation-quality
    gate an eval-data pipeline runs before trusting labels.  The confusion
    matrix is four integer counters from one combiner pass; kappa closes
    driver-side in the oracle's exact double expressions, rounded 6."""
    ds = _t(sf_dir, "documents", ["text", "n_chars"])

    def part(t: pa.Table) -> pd.DataFrame:
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        nw = np.diff(np.asarray(lst.offsets, dtype=np.int64))
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = nw >= _KAPPA_A_WORDS
        b = nc >= _KAPPA_B_CHARS
        return pd.DataFrame(
            {"yy": [int((a & b).sum())], "yn": [int((a & ~b).sum())],
             "ny": [int((~a & b).sum())], "nn": [int((~a & ~b).sum())]}
        )

    p = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    yy, yn = int(p["yy"].sum()), int(p["yn"].sum())
    ny, nn = int(p["ny"].sum()), int(p["nn"].sum())
    n = yy + yn + ny + nn
    po = float(yy + nn) / float(n)
    pe = (
        float(yy + yn) * float(yy + ny) + float(ny + nn) * float(yn + nn)
    ) / (float(n) * float(n))
    kappa = float("nan") if pe == 1.0 else (po - pe) / (1.0 - pe)
    out = pd.DataFrame(
        [{"yy": yy, "yn": yn, "ny": ny, "nn": nn,
          "po": _rd(po, 6), "pe": _rd(pe, 6), "kappa": _rd(kappa, 6)}]
    )
    return _i64(out, ["yy", "yn", "ny", "nn"])


SQL_COHENS_KAPPA = f"""
WITH lab AS (
  SELECT CASE WHEN LEN(string_split(text, ' ')) >= {_KAPPA_A_WORDS} THEN 1 ELSE 0 END AS a,
         CASE WHEN n_chars >= {_KAPPA_B_CHARS} THEN 1 ELSE 0 END AS b
  FROM documents),
c AS (SELECT
        CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS yy,
        CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS yn,
        CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ny,
        CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nn,
        COUNT(*) AS n
      FROM lab),
m AS (SELECT yy, yn, ny, nn,
             CAST(yy + nn AS DOUBLE) / CAST(n AS DOUBLE) AS po,
             (CAST(yy + yn AS DOUBLE) * CAST(yy + ny AS DOUBLE)
              + CAST(ny + nn AS DOUBLE) * CAST(yn + nn AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
      FROM c)
SELECT yy, yn, ny, nn, ROUND(po, 6) AS po, ROUND(pe, 6) AS pe,
       CASE WHEN pe = 1.0 THEN CAST('nan' AS DOUBLE)
            ELSE ROUND((po - pe) / (1.0 - pe), 6) END AS kappa
FROM m
"""


