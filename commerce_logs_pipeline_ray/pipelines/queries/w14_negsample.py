"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _i64, _rd, grouped_sums, np, pa, pd, rd  # noqa: F401
from .neardup_a import ensure_derived_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# Wave 14: word2vec negative-sampling table
# ---------------------------------------------------------------------------

_NS_TABLE = 1 << 20
_NS_POW = 0.75


def q_negative_sampling_table(sf_dir: str) -> pd.DataFrame:
    """word2vec/NCE negative-sampling table (Mikolov et al. 2013): token
    frequencies tempered by the classic unigram^0.75, then a table of 2^20
    slots apportioned EXACTLY by Hamilton largest-remainder over integer
    µ-quantized tempered masses — bit-deterministic slot counts (the float
    pow appears only inside a floor-to-integer).  One token-count combiner
    exchange; the apportionment runs over the VOCAB_SIZE-bounded frequency
    table.  Reports the 20 most-sampled tokens."""
    from ...functions.tokens import _flat_tokens

    ds = rd.read_parquet(ensure_derived_parquet(sf_dir), columns=["tokens"],
                         override_num_blocks=8)

    def tf_partial(t: pa.Table) -> pd.DataFrame:
        values, offsets = _flat_tokens(t)
        window = values[offsets[0]:offsets[-1]].astype(np.int64)
        keys, cnt = np.unique(window, return_counts=True)
        return pd.DataFrame({"token": keys, "c": cnt.astype(np.int64)})

    tf = grouped_sums(
        ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["token"], {"c": "c"},
    ).to_pandas().sort_values("token", ignore_index=True)
    c = tf["c"].to_numpy(np.int64).astype(np.float64)
    x = np.floor(c ** _NS_POW * 1_000_000.0).astype(np.int64)
    xs = int(x.sum())
    base = x * np.int64(_NS_TABLE) // xs
    frac = x * np.int64(_NS_TABLE) % xs
    rem = _NS_TABLE - int(base.sum())
    # largest remainder, ties to the smaller token id
    order = np.lexsort((tf["token"].to_numpy(np.int64), -frac))
    slots = base.copy()
    slots[order[:rem]] += 1
    out = pd.DataFrame({"token": tf["token"].astype("int64"),
                        "c": tf["c"].astype("int64"), "slots": slots})
    out["p_sample"] = [_rd(float(s) / _NS_TABLE, 6) for s in slots]
    out = out.sort_values(["slots", "token"], ascending=[False, True],
                          ignore_index=True).head(20)
    return _i64(out, ["token", "c", "slots"])


SQL_NEGATIVE_SAMPLING_TABLE = f"""
WITH tf AS (
  SELECT CAST(token AS BIGINT) AS token, COUNT(*) AS c
  FROM (SELECT UNNEST(tokens) AS token
        FROM read_parquet('{ORACLE_ARTIFACT_DIR}/derived.parquet'))
  GROUP BY 1),
m AS (SELECT token, c,
             CAST(FLOOR(POW(c, {_NS_POW}) * 1000000.0) AS BIGINT) AS x
      FROM tf),
tot AS (SELECT CAST(SUM(x) AS BIGINT) AS xs FROM m),
h AS (SELECT token, c, (x * {_NS_TABLE}) // (SELECT xs FROM tot) AS base,
             (x * {_NS_TABLE}) % (SELECT xs FROM tot) AS frac
      FROM m),
r AS (SELECT {_NS_TABLE} - CAST(SUM(base) AS BIGINT) AS rem FROM h),
s AS (SELECT token, c,
             base + CASE WHEN ROW_NUMBER() OVER (ORDER BY frac DESC, token)
                              <= (SELECT rem FROM r) THEN 1 ELSE 0 END AS slots
      FROM h)
SELECT token, c, slots,
       ROUND(CAST(slots AS DOUBLE) / {_NS_TABLE}, 6) AS p_sample
FROM s ORDER BY slots DESC, token LIMIT 20
"""


