"""Wave 40: fuzzy-string record linkage and linear-trend smoothing.

* jaro_winkler_linkage — blocked entity resolution scored with classic
  Jaro-Winkler (Winkler 1990; p=0.1, prefix ≤ 4, boost above 0.7,
  transpositions = mismatches // 2 — pinned BITWISE against DuckDB's
  ``jaro_winkler_similarity`` on 3000 fuzz pairs): candidates block on the
  2-char name prefix with a ±2 length band, the within-block scorer is the
  pair-vectorized kernel ``functions/linkage.py::jaro_winkler_batch``.  The
  name corpus is hash-generated (high-entropy prefixes → 256-way blocking),
  so block sizes stay bounded as the part table grows — the partitioning
  assumption this operator documents.
* holt_linear_forecast — Holt double exponential smoothing (Holt 1957,
  α=β=1/4) per event_type over the daily cents series, in EXACT truncating
  integer arithmetic: level/trend updates are integer expressions DuckDB's
  recursive CTE replays verbatim, so two independent engines must agree
  bitwise on level, trend, one-step forecast, and the integer SSE of the
  one-step-ahead errors.
"""
from __future__ import annotations

from ._base import _i64, _rd, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, grouped_sums  # noqa: F401
from .neardup_a import _ensure_artifact

_JW_THRESHOLD = 0.88
_JW_LEN_BAND = 2


def ensure_jw_names_parquet(sf_dir: str) -> str:
    """Hash-generated dirty-identifier corpus for Jaro-Winkler linkage:
    per part key a 10-hex-char base id, a substitution variant for every
    part and a deletion variant for every third part (rec_id = key·10 +
    variant).  Hex prefixes distribute uniformly → 2-char blocking is
    256-way regardless of scale."""
    import hashlib as _hashlib
    import os as _os

    def build() -> pa.Table:
        t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        ids, names = [], []
        hexd = "0123456789abcdef"
        for k in t["p_partkey"].to_pylist():
            h = _hashlib.md5(str(k).encode()).hexdigest()
            base = h[:10]
            ids.append(k * 10)
            names.append(base)
            pos = int(h[10], 16) % 10
            repl = h[11]
            if repl == base[pos]:
                repl = hexd[(int(h[11], 16) + 1) % 16]
            ids.append(k * 10 + 1)
            names.append(base[:pos] + repl + base[pos + 1:])
            if k % 3 == 0:
                pos2 = int(h[12], 16) % 9 + 1
                ids.append(k * 10 + 2)
                names.append(base[:pos2] + base[pos2 + 1:])
        return pa.table({"rec_id": pa.array(ids, pa.int64()),
                         "name": pa.array(names)})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "jw_names.parquet"), build)


def q_jaro_winkler_linkage(sf_dir: str) -> pd.DataFrame:
    """Blocked Jaro-Winkler linkage: pairs sharing a 2-char name prefix
    within a ±2 length band, kept when ROUND(jw, 6) ≥ 0.88.  One block-key
    exchange; the scorer is vectorized across every candidate pair of a
    block at once."""
    from ...functions.linkage import jaro_winkler_batch
    from ...functions.relational import bucketed_group_reduce

    ds = rd.read_parquet(ensure_jw_names_parquet(sf_dir), override_num_blocks=4)

    def add_block(t: pa.Table) -> pa.Table:
        return t.append_column("bk", pc.utf8_slice_codeunits(t["name"], 0, 2))

    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64"),
                          "jw": pd.Series([], dtype="float64")})

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        # collect every block's banded pairs, then ONE pair-vectorized
        # kernel call per bucket (the O(L²) sweep amortizes across pairs).
        # SOUND prune before the kernel: jw ≥ 0.88 needs jaro ≥ 0.8 (the
        # Winkler boost adds at most 0.4·(1−jaro)), and jaro ≤
        # (m/l1 + m/l2 + 1)/3 with m ≤ common-char-multiset count c — so
        # survivors must satisfy 5·c·(l1+l2) ≥ 7·l1·l2 (c ≥ 1.4·l1l2/(l1+l2))
        na_all, nb_all, ida_all, idb_all = [], [], [], []
        for _, g in df.groupby("bk"):
            n = len(g)
            if n < 2:
                continue
            ids = g["rec_id"].to_numpy(np.int64)
            names = g["name"].to_numpy()
            lens = np.fromiter((len(s) for s in names), np.int64, n)
            hist = np.zeros((n, 128), np.int16)
            for i, s in enumerate(names):
                b = np.frombuffer(s.encode("ascii", "replace"), np.uint8)
                np.add.at(hist[i], b & 127, 1)
            ii, jj = np.triu_indices(n, k=1)
            band = np.abs(lens[ii] - lens[jj]) <= _JW_LEN_BAND
            ii, jj = ii[band], jj[band]
            if not len(ii):
                continue
            c = np.minimum(hist[ii], hist[jj]).sum(1).astype(np.int64)
            l1, l2 = lens[ii], lens[jj]
            near = 5 * c * (l1 + l2) >= 7 * l1 * l2
            ii, jj = ii[near], jj[near]
            if not len(ii):
                continue
            na_all.append(names[ii])
            nb_all.append(names[jj])
            ida_all.append(ids[ii])
            idb_all.append(ids[jj])
        if not na_all:
            return empty.copy()
        jw = _rd(jaro_winkler_batch(np.concatenate(na_all),
                                    np.concatenate(nb_all)), 6)
        keep = jw >= _JW_THRESHOLD
        if not keep.any():
            return empty.copy()
        a = np.concatenate(ida_all)[keep]
        b = np.concatenate(idb_all)[keep]
        return pd.DataFrame({"id_a": np.minimum(a, b), "id_b": np.maximum(a, b),
                             "jw": jw[keep]})

    fanned = ds.map_batches(add_block, batch_format="pyarrow", zero_copy_batch=True)
    out = bucketed_group_reduce(fanned, ["bk"], score_block).to_pandas()
    out = out.sort_values(["id_a", "id_b"], ignore_index=True)
    return _i64(out, ["id_a", "id_b"])


SQL_JARO_WINKLER_LINKAGE = f"""
WITH r AS (SELECT rec_id, name FROM read_parquet('{ORACLE_ARTIFACT_DIR}/jw_names.parquet')),
c AS (
  SELECT a.rec_id AS id_a, b.rec_id AS id_b,
         ROUND(jaro_winkler_similarity(a.name, b.name), 6) AS jw
  FROM r a JOIN r b
    ON substr(a.name, 1, 2) = substr(b.name, 1, 2)
   AND a.rec_id < b.rec_id
   AND abs(length(a.name) - length(b.name)) <= {_JW_LEN_BAND})
SELECT id_a, id_b, jw FROM c WHERE jw >= {_JW_THRESHOLD}
ORDER BY id_a, id_b
"""


def _tdiv(a: int, d: int) -> int:
    """Truncating integer division (DuckDB ``//`` sign semantics)."""
    q = abs(a) // d
    return q if a >= 0 else -q


def q_holt_linear_forecast(sf_dir: str) -> pd.DataFrame:
    """Holt double exponential smoothing per event_type (α=β=1/4) over the
    daily cents series: lvl_t = (x_t + 3·(lvl+trd)) ÷ 4, trd_t = (lvl_t −
    lvl + 3·trd) ÷ 4 (truncating ÷), forecast = lvl+trd, plus the integer
    SSE of one-step-ahead errors.  Daily partials reduce distributed; the
    genuinely-sequential recursion folds inside a type-keyed bucket
    exchange over |days| items per series."""
    from ...functions.relational import bucketed_group_reduce

    def to_day(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["ts"], pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "day_id": pc.divide(micros, pa.scalar(86_400_000_000, pa.int64())),
                         "cents": cents})

    daily = grouped_sums(
        _t(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day_id"], {"cents": "cents"})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            x = g.sort_values("day_id")["cents"].to_numpy(np.int64)
            lvl, trd, sse = int(x[0]), 0, 0
            for v in x[1:].tolist():
                err = v - (lvl + trd)
                sse += err * err
                new_lvl = _tdiv(v + 3 * (lvl + trd), 4)
                trd = _tdiv(new_lvl - lvl + 3 * trd, 4)
                lvl = new_lvl
            rows.append({"event_type": et, "n_days": len(x), "lvl": lvl,
                         "trd": trd, "forecast": lvl + trd, "sse": sse})
        return pd.DataFrame(rows)

    out = bucketed_group_reduce(daily, ["event_type"], fold).to_pandas()
    out = out.sort_values("event_type", ignore_index=True)
    return _i64(out, ["n_days", "lvl", "trd", "forecast", "sse"])


SQL_HOLT_LINEAR_FORECAST = """
WITH RECURSIVE d AS MATERIALIZED (
  SELECT event_type,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS rn
  FROM events
  GROUP BY event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT)),
h AS (
  SELECT event_type, rn, x, CAST(x AS BIGINT) AS lvl, CAST(0 AS BIGINT) AS trd,
         CAST(0 AS BIGINT) AS sse
  FROM d WHERE rn = 1
  UNION ALL
  SELECT n.event_type, n.rn, n.x,
         (n.x + 3 * (p.lvl + p.trd)) // 4,
         (((n.x + 3 * (p.lvl + p.trd)) // 4) - p.lvl + 3 * p.trd) // 4,
         p.sse + (n.x - (p.lvl + p.trd)) * (n.x - (p.lvl + p.trd))
  FROM h p JOIN d n ON n.event_type = p.event_type AND n.rn = p.rn + 1)
SELECT event_type,
       CAST(MAX(rn) AS BIGINT) AS n_days,
       CAST(MAX_BY(lvl, rn) AS BIGINT) AS lvl,
       CAST(MAX_BY(trd, rn) AS BIGINT) AS trd,
       CAST(MAX_BY(lvl, rn) + MAX_BY(trd, rn) AS BIGINT) AS forecast,
       CAST(MAX_BY(sse, rn) AS BIGINT) AS sse
FROM h GROUP BY 1 ORDER BY 1
"""
