"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, _t, pd, rd  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401
from .neardup_b import _sf_of  # noqa: F401

# ---------------------------------------------------------------------------
# Perceptual image dedup + contrastive pair mining (session-3 batch 5)
# ---------------------------------------------------------------------------

def ensure_scale_dups_parquet(sf_dir: str) -> str:
    import os as _os

    from ...sources.media import build_image_scale_dup_table

    sf = _sf_of(sf_dir)
    n = max(30, min(3000, int(3000 * sf)))
    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "scale_dups.parquet"),
        lambda: build_image_scale_dup_table(n),
    )


def q_image_phash_dedup(sf_dir: str) -> pd.DataFrame:
    """Perceptual dedup: 2×-rescaled and +1-brightness re-encodes (different
    bytes AND different pixels — exact content dedup provably cannot group
    them) collapse under the 64-bit dHash (ImagePHash actor pool); oracle =
    scalar-reference-dHash truth persisted at synthesis."""
    from ...functions.relational import bucketed_group_reduce
    from ...stages.multimodal import ImagePHash

    src = ensure_scale_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    hashes = ds.map_batches(
        ImagePHash, batch_format="pyarrow", batch_size=64, concurrency=2,
        zero_copy_batch=True,
    )

    def rep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dup_of"] = df.groupby("phash")["media_id"].transform("min")
        return df[["media_id", "dup_of"]]

    out = bucketed_group_reduce(hashes, ["phash"], rep).to_pandas()
    return out.sort_values("media_id", ignore_index=True)


SQL_IMAGE_PHASH_DEDUP = """
SELECT media_id, dup_of
FROM read_parquet('{AD}/scale_dups.parquet') ORDER BY media_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def q_contrastive_pairs(sf_dir: str) -> pd.DataFrame:
    """Contrastive pair mining over the embeddings: per anchor the nearest
    same-label positive and nearest different-label hard negative (round-9
    squared L2, ties → min id), margin = neg − pos
    (functions/sim.py::contrastive_pairs)."""
    from ...functions.sim import contrastive_pairs

    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return contrastive_pairs(ds)


SQL_CONTRASTIVE_PAIRS = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
),
p AS (
  SELECT a.vec_id, a.label, b.vec_id AS nid, b.label AS nlabel,
         ROUND(list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
               - 2 * list_dot_product(a.v, b.v), 9) AS d2
  FROM e a JOIN e b ON b.vec_id <> a.vec_id
),
pos AS (
  SELECT vec_id, label, nid, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, nid) AS rn
  FROM p WHERE nlabel = label
),
neg AS (
  SELECT vec_id, nid, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, nid) AS rn
  FROM p WHERE nlabel <> label
)
SELECT pos.vec_id, CAST(pos.label AS BIGINT) AS label,
       CAST(pos.nid AS BIGINT) AS pos_id, CAST(neg.nid AS BIGINT) AS neg_id,
       ROUND(neg.d2 - pos.d2, 6) AS margin
FROM pos JOIN neg ON neg.vec_id = pos.vec_id AND neg.rn = 1
WHERE pos.rn = 1 ORDER BY pos.vec_id
"""


