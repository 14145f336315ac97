"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import (
    ORACLE_ARTIFACT_DIR,
    _corpus_dir,
    _i64,
    _t,
    grouped_sums,
    np,
    pa,
    pc,
    pd,
    pq,
    rd,
)  # noqa: F401
from .neardup_a import _ensure_artifact, ensure_derived_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# Attribution, vocab coverage, partition-skew audit (session-3 batch 4)
# ---------------------------------------------------------------------------

def q_linear_attribution(sf_dir: str) -> pd.DataFrame:
    """Multi-touch linear attribution: each purchase's cents split equally
    across the user's views in the preceding 24 h, remainder to the earliest
    view (integer-exact — no float credit drift); attributed mass by view
    hour-of-day (functions/windows.py::linear_attribution)."""
    from ...functions.windows import linear_attribution

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    return linear_attribution(ds)


SQL_LINEAR_ATTRIBUTION = """
WITH p AS (
  SELECT user_id, ts AS pts, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts AS vts, event_id AS vid FROM events WHERE event_type = 'view'
),
j AS (
  SELECT p.cents, v.vid,
         CAST(floor(epoch(v.vts) / 3600) AS BIGINT) % 24 AS hr,
         COUNT(*) OVER (PARTITION BY p.user_id, p.pts, p.cents) AS n,
         ROW_NUMBER() OVER (PARTITION BY p.user_id, p.pts, p.cents
                            ORDER BY v.vts, v.vid) AS rn
  FROM p JOIN v ON v.user_id = p.user_id
              AND v.vts < p.pts AND v.vts >= p.pts - INTERVAL 24 HOUR
)
SELECT CAST(hr AS BIGINT) AS hour, CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END) AS BIGINT)
         AS attributed_cents
FROM j GROUP BY 1 ORDER BY 1
"""


def q_vocab_coverage(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage curve (tokenizer-sizing signal): smallest k such
    that the top-k token types cover ≥50/90/99% of token mass (ties by token
    id; integer cross-multiplied thresholds).  Distributed frequency reduce,
    bounded-vocab driver cumsum."""
    from ...functions.tokens import token_frequency

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"], override_num_blocks=8)
    freq = token_frequency(ds, topk=None)
    freq = freq.sort_values(["count", "token"], ascending=[False, True], ignore_index=True)
    n = freq["count"].to_numpy(np.int64)
    total = int(n.sum())
    cum = np.cumsum(n)
    ks = {}
    for pct in (50, 90, 99):
        ks[pct] = int(np.searchsorted(cum * 100, pct * total, side="left")) + 1
    return pd.DataFrame(
        [
            {
                "total_tokens": total,
                "vocab_size": len(freq),
                "k50": ks[50],
                "k90": ks[90],
                "k99": ks[99],
            }
        ]
    ).astype("int64")


SQL_VOCAB_COVERAGE = """
WITH f AS (
  SELECT tok AS token, COUNT(*) AS n
  FROM (SELECT UNNEST(tokens) AS tok FROM read_parquet('{AD}/derived.parquet'))
  GROUP BY 1
),
c AS (
  SELECT n, SUM(n) OVER (ORDER BY n DESC, token ASC
                         ROWS UNBOUNDED PRECEDING) AS cum,
         ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS k,
         SUM(n) OVER () AS total
  FROM f
)
SELECT CAST(MAX(total) AS BIGINT) AS total_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(MIN(CASE WHEN cum * 100 >= 50 * total THEN k END) AS BIGINT) AS k50,
       CAST(MIN(CASE WHEN cum * 100 >= 90 * total THEN k END) AS BIGINT) AS k90,
       CAST(MIN(CASE WHEN cum * 100 >= 99 * total THEN k END) AS BIGINT) AS k99
FROM c
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


def ensure_user_partition_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``partition_skew_audit``: (user_id → partition)
    computed with the INDEPENDENT scalar FNV-1a-32 loop — cross-checks the
    vectorized partitioner (hashing.fnv1a32, the flagship's lineage hash)."""
    import os as _os

    def build() -> pa.Table:
        from ...functions.hashing import fnv1a32_single

        t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
        users = sorted(set(t["user_id"].to_pylist()))
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "partition_id": pa.array(
                    [fnv1a32_single(str(u)) % 64 for u in users], pa.int64()
                ),
            }
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "user_partitions.parquet"), build
    )


def q_partition_skew_audit(sf_dir: str) -> pd.DataFrame:
    """Partition-skew audit of the engine's own FNV-1a-32 keyed partitioner
    (the flagship lineage hash, stages/parse.py): rows and distinct users
    per partition for P=64 over the events stream — the pre-flight a
    100-TB run does before committing to a partitioning key."""
    from ...functions.hashing import fnv1a32

    ensure_user_partition_parquet(sf_dir)
    ds = _t(sf_dir, "events", ["user_id"])

    # rows per partition: cheap per-batch bincount partials
    def rows_part(t: pa.Table) -> pa.Table:
        users = t["user_id"].combine_chunks() if isinstance(t["user_id"], pa.ChunkedArray) else t["user_id"]
        pid = (fnv1a32(pc.cast(users, pa.string())) % np.uint32(64)).astype(np.int64)
        n = np.bincount(pid, minlength=64).astype(np.int64)
        return pa.table(
            {"partition_id": pa.array(np.arange(64, dtype=np.int64)), "n_rows": pa.array(n)}
        )

    rows = (
        ds.map_batches(rows_part, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .groupby("partition_id", as_index=False)
        .sum()
    )

    # distinct users per partition: distinct (pid, user) combiner exchange
    def dpairs(t: pa.Table) -> pa.Table:
        users = t["user_id"].combine_chunks() if isinstance(t["user_id"], pa.ChunkedArray) else t["user_id"]
        pid = (fnv1a32(pc.cast(users, pa.string())) % np.uint32(64)).astype(np.int64)
        uid = users.to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack([pid, uid], axis=1), axis=0)
        return pa.table(
            {"partition_id": pa.array(pairs[:, 0]), "user_id": pa.array(pairs[:, 1])}
        )

    dd = grouped_sums(
        ds.map_batches(dpairs, batch_format="pyarrow", zero_copy_batch=True),
        ["partition_id", "user_id"], {},
        "dups",
    ).to_pandas()
    dusers = dd.groupby("partition_id", as_index=False).size().rename(columns={"size": "n_users"})
    out = rows.merge(dusers, on="partition_id", how="left").fillna({"n_users": 0})
    out = out[out["n_rows"] > 0]  # SQL only emits populated partitions
    out = out.sort_values("partition_id", ignore_index=True)
    return _i64(out, ["partition_id", "n_rows", "n_users"])


SQL_PARTITION_SKEW_AUDIT = """
WITH m AS (SELECT user_id, partition_id FROM read_parquet('{AD}/user_partitions.parquet')),
e AS (SELECT e.user_id, m.partition_id FROM events e JOIN m USING (user_id))
SELECT partition_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM e GROUP BY 1 ORDER BY 1
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


