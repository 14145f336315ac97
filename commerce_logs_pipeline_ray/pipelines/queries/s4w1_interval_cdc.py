"""Split from the flat queries.py (mechanical, order-preserving).  See __init__.py."""
from __future__ import annotations

from ._base import ORACLE_ARTIFACT_DIR, _i64, _t, md5_hex, np, pa, pc, pd, rd  # noqa: F401
from .neardup_b import ensure_dirty_names_parquet  # noqa: F401

# ---------------------------------------------------------------------------
# Session-4 wave 1: interval-overlap join, CDC upsert-merge, SymSpell edit-1
# join, Feistel format-preserving shuffle
# ---------------------------------------------------------------------------


def q_interval_overlap_join(sf_dir: str) -> pd.DataFrame:
    """Range/interval self-join — ``functions/intervals.py``: user-day
    activity intervals [first event, last event) paired when they overlap
    (concurrent activity).  Grid-bucketed plan: intervals fan out to hour
    cells, one hash exchange on (day, cell), per-cell vectorized pair scan,
    each pair counted exactly once in the cell holding max(start_a,
    start_b).  Oracle: the naive inequality self-join."""
    from ...functions.intervals import interval_overlap_join

    ds = _t(sf_dir, "events", ["ts", "user_id"])
    DAY_US = 86_400_000_000
    # cell width tuning: user-day activity spans most of the day, so hour
    # cells would fan every interval out ~12× and re-enumerate the same
    # dense pairs in every cell; day-sized cells minimize duplication here
    # (the grid machinery is unchanged — sparse/short intervals pick finer
    # cells)

    def to_partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()  # µs (parquet ts[us])
        user = t["user_id"].to_numpy()
        df = pd.DataFrame({"item": user, "day": ts // DAY_US, "s": ts, "e": ts})
        g = df.groupby(["item", "day"], as_index=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(to_partial, batch_format="pyarrow", zero_copy_batch=True)

    def fold_iv(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["item", "day"], as_index=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        return g[g["s"] < g["e"]]

    from ...functions.relational import bucketed_group_reduce

    intervals = bucketed_group_reduce(partials, ["item", "day"], fold_iv, num_buckets=32)
    out = interval_overlap_join(intervals, "day", cell_us=DAY_US)
    out["day"] = pd.to_datetime(out["day"].astype("int64") * 86400, unit="s").dt.strftime(
        "%Y-%m-%d"
    )
    out = out.sort_values("day", ignore_index=True)
    return _i64(out, ["n_pairs", "total_overlap_us", "max_overlap_us"])


SQL_INTERVAL_OVERLAP_JOIN = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
  FROM events GROUP BY 1, 2 HAVING MIN(epoch_us(ts)) < MAX(epoch_us(ts))
),
p AS (
  SELECT a.day, LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS ov
  FROM iv a JOIN iv b
    ON a.day = b.day AND a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
)
SELECT strftime(make_timestamp(day * 86400000000), '%Y-%m-%d') AS day,
       COUNT(*) AS n_pairs,
       CAST(SUM(ov) AS BIGINT) AS total_overlap_us,
       CAST(MAX(ov) AS BIGINT) AS max_overlap_us
FROM p GROUP BY day ORDER BY day
"""

_MERGE_CUTOFF_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00Z


def q_upsert_merge(sf_dir: str) -> pd.DataFrame:
    """CDC MERGE — ``functions/merge_cdc.py``: per-user snapshot state from
    events before the cutoff, then ONE change batch (events ≥ cutoff) is
    merged in: additive accumulators, last-writer-wins (ts, type), and a
    tombstone erasure feed (users whose md5(user ‖ ':erase') hex starts
    '0' AND who appear in the batch) deleting the key outright.  Both
    sides pre-combine per key per block before the single hash exchange.
    Oracle: recompute the post-merge state from scratch in SQL."""
    from ...functions.merge_cdc import combine_events, merge_state

    ds = _t(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def both_partials(df: pd.DataFrame) -> pd.DataFrame:
        # ONE scan splits snapshot/batch by the cutoff and emits both
        # sides' combiner partials; the fold is associative, so snapshot
        # partials are valid MERGE inputs and everything rides one hash
        # exchange (the incremental_agg discipline)
        df = df.assign(ts=df["ts"].astype("datetime64[us]"))
        tsu = df["ts"].astype("int64")
        old = df[tsu < _MERGE_CUTOFF_US]
        new = df[tsu >= _MERGE_CUTOFF_US]
        parts = []
        if len(old):
            parts.append(combine_events(old, "user_id", "ts", "event_type", "value"))
        if len(new):
            hexes = md5_hex((new["user_id"].astype(str) + ":erase").tolist()).to_pylist()
            new = new.assign(
                __tomb=np.fromiter((h[0] == "0" for h in hexes), bool, len(hexes))
            )
            parts.append(
                combine_events(new, "user_id", "ts", "event_type", "value", "__tomb")
            )
        from ...functions.merge_cdc import STATE_COLS

        if not parts:
            return pd.DataFrame(columns=STATE_COLS)
        return pd.concat(parts, ignore_index=True)

    merged = merge_state(
        None, ds.map_batches(both_partials, batch_format="pandas")
    ).to_pandas()
    out = pd.DataFrame(
        {
            "user_id": merged["key"].astype("int64"),
            "last_ts_us": merged["last_ts_us"].astype("int64"),
            "last_type": merged["last_type"],
            "total_value": (merged["total_value_c"] / 100.0).round(2),
            "n_events": merged["n_events"].astype("int64"),
        }
    ).sort_values("user_id", ignore_index=True)
    return out


SQL_UPSERT_MERGE = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS tsu, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
),
tomb AS (
  SELECT DISTINCT user_id FROM ev
  WHERE tsu >= {_MERGE_CUTOFF_US}
    AND substr(md5(CAST(user_id AS VARCHAR) || ':erase'), 1, 1) = '0'
),
live AS (SELECT * FROM ev WHERE user_id NOT IN (SELECT user_id FROM tomb)),
agg AS (
  SELECT user_id, CAST(SUM(vc) AS BIGINT) AS vc, COUNT(*) AS n_events,
         MAX(tsu) AS last_ts_us
  FROM live GROUP BY user_id
),
last AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tsu DESC) AS rn
  FROM live
)
SELECT a.user_id, a.last_ts_us, l.event_type AS last_type,
       ROUND(a.vc / 100.0, 2) AS total_value, a.n_events
FROM agg a JOIN last l ON l.user_id = a.user_id AND l.rn = 1
ORDER BY a.user_id
"""


def q_symspell_edit1_join(sf_dir: str) -> pd.DataFrame:
    """SymSpell symmetric-delete edit-1 join — ``functions/linkage.py::
    symspell_edit1_join``: EXACT-recall d≤1 blocking via single-deletion
    neighborhoods (vs ``record_linkage``'s partial-recall prefix/suffix
    blocks) over the same dirty-name corpus.  SymSpell's dictionary is the
    DISTINCT term set (canonical id = min rec_id per name): repeated names
    would otherwise blow the pair count up quadratically — identical-string
    duplicates are exact-dedup territory (``dedup_exact``), not fuzzy-join
    output.  Oracle: brute-force length-blocked Levenshtein join over the
    same distinct dictionary (independent of the blocking)."""
    from ...functions.linkage import symspell_edit1_join
    from ...functions.relational import bucketed_group_reduce

    ds = rd.read_parquet(ensure_dirty_names_parquet(sf_dir), override_num_blocks=4)

    def dict_fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("name", as_index=False).agg(rec_id=("rec_id", "min"))

    vocab = bucketed_group_reduce(ds, ["name"], dict_fold, num_buckets=16)
    out = symspell_edit1_join(vocab).to_pandas()
    out = out.sort_values(["id_a", "id_b"], ignore_index=True)
    return _i64(out, ["id_a", "id_b", "dist"])


SQL_SYMSPELL_EDIT1_JOIN = """
WITH r AS (SELECT MIN(rec_id) AS rec_id, name, LENGTH(name) AS ln
           FROM read_parquet('{AD}/dirty_names_v2.parquet') GROUP BY name)
SELECT a.rec_id AS id_a, b.rec_id AS id_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
FROM r a JOIN r b
  ON a.rec_id < b.rec_id AND b.ln BETWEEN a.ln - 1 AND a.ln + 1
WHERE levenshtein(a.name, b.name) <= 1
ORDER BY id_a, id_b
""".replace("{AD}", ORACLE_ARTIFACT_DIR)

_FEISTEL_K = 16  # fixed half-width: one closed form at every sf
_FEISTEL_SAMPLE_MOD = 499


def q_feistel_permutation(sf_dir: str) -> pd.DataFrame:
    """Format-preserving epoch shuffle — ``functions/permute.py``: a
    4-round Feistel bijection over a fixed 2^32 domain maps every event id
    to a unique image; one distributed rank over the images collapses the
    padded domain to a dense permutation of [0, N).  Seekable (any worker
    computes its slice statelessly) and resumable (position is a pure
    function of id + seed) — the scale alternative to ``random_shuffle``.
    Oracle: the identical closed form unrolled in SQL + window rank."""
    from ...functions.permute import feistel_permute
    from ...functions.rank import global_row_number

    ds = _t(sf_dir, "events", ["event_id"])

    def image(t: pa.Table) -> pa.Table:
        x = t["event_id"].to_numpy()
        y = feistel_permute(x, 0, seed=7, k=_FEISTEL_K)
        return pa.table({"event_id": x, "y": y})

    imaged = ds.map_batches(image, batch_format="pyarrow", zero_copy_batch=True)
    ranked, total = global_row_number(imaged, "y", [], out_col="pos")

    def sample(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % _FEISTEL_SAMPLE_MOD == 0))

    out = ranked.map_batches(sample, batch_format="pyarrow").to_pandas()
    out["pos"] = out["pos"].astype("int64") - 1  # 0-based
    out = out[["event_id", "pos"]].sort_values("event_id", ignore_index=True)
    return _i64(out, ["event_id", "pos"])


def _feistel_sql() -> str:
    from ...functions.permute import feistel_sql_expr

    expr = feistel_sql_expr("event_id", 0, seed=7, k=_FEISTEL_K)
    return f"""
WITH p AS (SELECT event_id, {expr} AS y FROM events),
r AS (SELECT event_id, ROW_NUMBER() OVER (ORDER BY y) - 1 AS pos FROM p)
SELECT event_id, pos FROM r WHERE event_id % {_FEISTEL_SAMPLE_MOD} = 0
ORDER BY event_id
"""


SQL_FEISTEL_PERMUTATION = _feistel_sql()


