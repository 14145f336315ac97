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
from .curation_d import ensure_audio_dups_parquet  # noqa: F401
from .neardup_a import _ensure_artifact  # noqa: F401

# ---------------------------------------------------------------------------
# Blocklist scan, budget apportionment, audio downsample (session-3 batch 3)
# ---------------------------------------------------------------------------

BLOCKLIST_PHRASES = ["slow", "window sort", "stream batch"]


def q_blocklist_scan(sf_dir: str) -> pd.DataFrame:
    """C4-style blocklist scan as an ACTOR-POOL stage: the phrase list is
    bound once per actor (``__init__``), each batch runs one vectorized
    substring-count kernel per phrase — per source: docs flagged by any
    phrase + per-phrase occurrence totals (non-overlapping counts, matching
    DuckDB's replace-length arithmetic)."""

    class Scanner:
        def __init__(self):
            self.phrases = list(BLOCKLIST_PHRASES)

        def __call__(self, t: pa.Table) -> pa.Table:
            text = pc.fill_null(t["text"], "")
            occ = [
                pc.cast(pc.count_substring(text, p), pa.int64()) for p in self.phrases
            ]
            flagged = None
            for o in occ:
                hit = pc.greater(o, 0)
                flagged = hit if flagged is None else pc.or_(flagged, hit)
            cols = {
                "source": t["source"],
                "n_docs": pa.array(np.ones(len(t), dtype=np.int64)),
                "flagged": pc.cast(flagged, pa.int64()),
            }
            for i, o in enumerate(occ):
                cols[f"occ_{i + 1}"] = o
            part = pa.table(cols)
            names = [c for c in part.column_names if c != "source"]
            g = part.group_by(["source"]).aggregate([(c, "sum") for c in names])
            return g.rename_columns(["source"] + names)

    ds = _t(sf_dir, "documents", ["source", "text"])
    agg = ds.map_batches(
        Scanner, batch_format="pyarrow", zero_copy_batch=True, concurrency=2
    ).to_pandas()
    out = agg.groupby("source", as_index=False).sum().sort_values("source", ignore_index=True)
    return _i64(out, ["n_docs", "flagged", "occ_1", "occ_2", "occ_3"])


SQL_BLOCKLIST_SCAN = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN contains(text, 'slow') OR contains(text, 'window sort')
                       OR contains(text, 'stream batch') THEN 1 ELSE 0 END) AS BIGINT)
         AS flagged,
       CAST(SUM((length(text) - length(replace(text, 'slow', ''))) / 4) AS BIGINT) AS occ_1,
       CAST(SUM((length(text) - length(replace(text, 'window sort', ''))) / 11) AS BIGINT)
         AS occ_2,
       CAST(SUM((length(text) - length(replace(text, 'stream batch', ''))) / 12) AS BIGINT)
         AS occ_3
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_budget_apportionment(sf_dir: str) -> pd.DataFrame:
    """Largest-remainder (Hamilton) apportionment of a 1000-doc training
    budget across sources proportional to character mass — all-integer
    arithmetic (base = B·chars // total, remainder-ranked extras), one
    per-source char-sum exchange then driver math on 20 rows."""
    B = 1000
    docs = _t(sf_dir, "documents", ["source", "n_chars"])
    sums = grouped_sums(docs, ["source"], {"chars": "n_chars"}, "n_docs").to_pandas()
    sums = sums.sort_values("source", ignore_index=True)
    total = int(sums["chars"].sum())
    sums["base"] = (B * sums["chars"]) // total
    sums["rem"] = (B * sums["chars"]) % total
    seats_left = B - int(sums["base"].sum())
    order = sums.sort_values(["rem", "source"], ascending=[False, True]).index
    extra = pd.Series(0, index=sums.index)
    extra.loc[order[:seats_left]] = 1
    sums["extra"] = extra
    sums["alloc"] = sums["base"] + sums["extra"]
    out = sums[["source", "n_docs", "chars", "base", "extra", "alloc"]]
    return _i64(out.copy(), ["n_docs", "chars", "base", "extra", "alloc"])


SQL_BUDGET_APPORTIONMENT = """
WITH s AS (
  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS chars
  FROM documents GROUP BY 1
),
q AS (
  SELECT source, n_docs, chars,
         (1000 * chars) // (SELECT SUM(chars) FROM s) AS base,
         (1000 * chars) % (SELECT SUM(chars) FROM s) AS rem
  FROM s
),
r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk,
         (SELECT 1000 - SUM(base) FROM q) AS seats_left
  FROM q
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, CAST(chars AS BIGINT) AS chars,
       CAST(base AS BIGINT) AS base,
       CAST(CASE WHEN rk <= seats_left THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base + CASE WHEN rk <= seats_left THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r ORDER BY source
"""


def ensure_audio_resample_parquet(sf_dir: str) -> str:
    """Oracle artifact for ``audio_downsample``: expected per-clip decimation
    results derived with the INDEPENDENT stdlib ``wave`` decoder and pure
    Python integer loops — cross-validates functions/media_codecs.decode_wav
    and the vectorized decimation against a second decoder implementation."""
    import io as _io
    import os as _os
    import wave as _wave

    def build() -> pa.Table:
        src = ensure_audio_dups_parquet(sf_dir)
        t = pq.read_table(src, columns=["media_id", "payload"])
        ids, in_n, out_n, out_rate, checksum = [], [], [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            with _wave.open(_io.BytesIO(payload)) as w:
                assert w.getsampwidth() == 2 and w.getnchannels() == 1
                rate = w.getframerate()
                raw = w.readframes(w.getnframes())
            pcm = [
                int.from_bytes(raw[2 * i : 2 * i + 2], "little", signed=True)
                for i in range(len(raw) // 2)
            ]
            m = len(pcm) // 2
            down = [(pcm[2 * i] + pcm[2 * i + 1]) // 2 for i in range(m)]
            ids.append(mid)
            in_n.append(len(pcm))
            out_n.append(m)
            out_rate.append(rate // 2)
            checksum.append(sum(down))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "in_samples": pa.array(in_n, pa.int64()),
                "out_samples": pa.array(out_n, pa.int64()),
                "out_rate": pa.array(out_rate, pa.int64()),
                "checksum": pa.array(checksum, pa.int64()),
            }
        )

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "audio_resample_ref.parquet"), build
    )


def q_audio_downsample(sf_dir: str) -> pd.DataFrame:
    """2:1 audio decimation over the real-WAV corpus via the AudioDownsample
    actor pool — per-clip sample counts, output rate and integer checksum vs
    the stdlib-``wave`` reference artifact."""
    from ...stages.multimodal import AudioDownsample

    ensure_audio_resample_parquet(sf_dir)
    src = ensure_audio_dups_parquet(sf_dir)
    ds = rd.read_parquet(src, columns=["media_id", "payload"])
    out = (
        ds.map_batches(
            AudioDownsample,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
            zero_copy_batch=True,
        )
        .to_pandas()
        .sort_values("media_id", ignore_index=True)
    )
    return _i64(out, ["in_samples", "out_samples", "out_rate", "checksum"])


SQL_AUDIO_DOWNSAMPLE = """
SELECT media_id, in_samples, out_samples, out_rate, checksum
FROM read_parquet('{AD}/audio_resample_ref.parquet') ORDER BY media_id
""".replace("{AD}", ORACLE_ARTIFACT_DIR)


