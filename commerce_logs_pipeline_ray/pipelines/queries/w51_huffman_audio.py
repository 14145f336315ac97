"""Wave 51: compression planning and audio QA.

* huffman_code_lengths — canonical Huffman code lengths (Huffman 1952)
  over the documents' character frequencies with a FULLY DETERMINISTIC
  merge rule (pop two smallest by (freq, min-symbol); the merged node
  carries (freq sum, min symbol)), so two independent implementations
  must produce identical lengths: the Ray side folds distributed char
  counts then runs the heap on ≤128 symbols; the oracle reads the
  INDEPENDENT scalar artifact built from a second count + tree pass.
* audio_clipping_audit — per-clip clipping ratio over the WAV corpus
  (|sample| ≥ 32700 counts as clipped), ppm-exact: the stdlib WAV decoder
  runs per batch inside the actor pool; the oracle reads the independent
  scalar-decoder artifact.
"""
from __future__ import annotations

from ._base import _i64, _t, np, pa, pc, pd, pq, rd  # noqa: F401
from ._base import ORACLE_ARTIFACT_DIR, _corpus_dir, grouped_sums  # noqa: F401
from .neardup_a import _ensure_artifact


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code length per symbol under the deterministic merge rule."""
    import heapq

    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, s, (s,)) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, m1, s1 = heapq.heappop(heap)
        f2, m2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(m1, m2), s1 + s2))
    return depth


def q_huffman_code_lengths(sf_dir: str) -> pd.DataFrame:
    """Per-character Huffman code lengths + frequencies over the documents
    corpus: char counts reduce as one bincount combiner per batch; the
    ≤128-leaf tree build is O(alphabet log alphabet) on the reduced
    table."""
    ensure_huffman_ref_parquet(sf_dir)
    docs = _t(sf_dir, "documents", ["text"])

    def counts(t: pa.Table) -> pd.DataFrame:
        col = t["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        arr = arr.cast(pa.large_string())
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], np.int64)[arr.offset: arr.offset + len(arr) + 1]
        raw = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
        data = raw[offs[0]: offs[-1]]
        c = np.bincount(data & 127, minlength=128)
        nz = np.nonzero(c)[0]
        return pd.DataFrame({"symbol": nz.astype(np.int64),
                             "freq": c[nz].astype(np.int64)})

    agg = grouped_sums(
        docs.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True),
        ["symbol"], {"freq": "freq"}, reduce="driver").to_pandas()
    freqs = dict(zip(agg["symbol"].astype(int), agg["freq"].astype(int)))
    depth = _huffman_lengths(freqs)
    out = pd.DataFrame({"symbol": list(depth), "freq": [freqs[s] for s in depth],
                        "code_len": [depth[s] for s in depth]})
    out = out.sort_values("symbol", ignore_index=True)
    return _i64(out, ["symbol", "freq", "code_len"])


def ensure_huffman_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact: char counts + Huffman lengths via an INDEPENDENT
    scalar pass (Python Counter over the raw strings, same deterministic
    merge rule) — cross-checks the distributed bincount fold AND the
    driver tree."""
    import os as _os

    def build() -> pa.Table:
        from collections import Counter

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        cnt: Counter = Counter()
        for s in t["text"].to_pylist():
            cnt.update(ord(ch) & 127 for ch in s)
        freqs = dict(cnt)
        depth = _huffman_lengths(freqs)
        syms = sorted(depth)
        return pa.table({"symbol": pa.array(syms, pa.int64()),
                         "freq": pa.array([freqs[s] for s in syms], pa.int64()),
                         "code_len": pa.array([depth[s] for s in syms], pa.int64())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "huffman_ref.parquet"), build)


SQL_HUFFMAN_CODE_LENGTHS = f"""
SELECT symbol, freq, code_len
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/huffman_ref.parquet')
ORDER BY symbol
"""

_CLIP_ABS = 32700


def ensure_audio_clip_ref_parquet(sf_dir: str) -> str:
    """Oracle artifact: per-clip clipping counts via a scalar struct-unpack
    WAV walk (independent of the vectorized decoder)."""
    import os as _os
    import struct as _struct

    from .curation_d import ensure_media_parquet

    def build() -> pa.Table:
        t = pq.read_table(ensure_media_parquet(sf_dir))
        ids, n_samp, n_clip = [], [], []
        for mid, mtype, payload in zip(t["media_id"].to_pylist(),
                                       t["media_type"].to_pylist(),
                                       t["payload"].to_pylist()):
            if mtype != "audio":
                continue
            # WAV: data chunk after the 44-byte canonical header
            body = payload[44:]
            n = len(body) // 2
            vals = _struct.unpack(f"<{n}h", body[: 2 * n])
            ids.append(mid)
            n_samp.append(n)
            n_clip.append(sum(1 for v in vals if abs(v) >= _CLIP_ABS))
        return pa.table({"media_id": pa.array(ids),
                         "n_samples": pa.array(n_samp, pa.int64()),
                         "n_clipped": pa.array(n_clip, pa.int64())})

    return _ensure_artifact(
        _os.path.join(_corpus_dir(sf_dir), "audio_clip_ref.parquet"), build)


def q_audio_clipping_audit(sf_dir: str) -> pd.DataFrame:
    """Clipping ratio ppm per audio clip (|sample| ≥ 32700): the stdlib
    WAV decoder runs inside the batch transform (decode state per task);
    output is one row per clip, sorted by media_id."""
    from ...functions.media_codecs import decode_wav
    from .curation_d import ensure_media_parquet

    ensure_audio_clip_ref_parquet(sf_dir)
    ds = rd.read_parquet(ensure_media_parquet(sf_dir),
                         columns=["media_id", "media_type", "payload"],
                         override_num_blocks=4)

    def audit(t: pa.Table) -> pd.DataFrame:
        rows = []
        for mid, mtype, payload in zip(t["media_id"].to_pylist(),
                                       t["media_type"].to_pylist(),
                                       t["payload"].to_pylist()):
            if mtype != "audio":
                continue
            _rate, samples = decode_wav(payload)
            n = int(samples.size)  # flat sample count (matches the scalar walk)
            c = int((np.abs(samples.astype(np.int64)) >= _CLIP_ABS).sum())
            rows.append({"media_id": mid, "n_samples": n, "n_clipped": c,
                         "clip_ppm": (1_000_000 * c) // n if n else 0})
        if not rows:
            return pd.DataFrame({"media_id": pd.Series([], dtype="object"),
                                 "n_samples": pd.Series([], dtype="int64"),
                                 "n_clipped": pd.Series([], dtype="int64"),
                                 "clip_ppm": pd.Series([], dtype="int64")})
        return pd.DataFrame(rows)

    out = ds.map_batches(audit, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    out = out[out["n_samples"] > 0].sort_values("media_id", ignore_index=True)
    return _i64(out, ["n_samples", "n_clipped", "clip_ppm"])


SQL_AUDIO_CLIPPING_AUDIT = f"""
SELECT media_id, n_samples, n_clipped,
       CAST((1000000 * n_clipped) // n_samples AS BIGINT) AS clip_ppm
FROM read_parquet('{ORACLE_ARTIFACT_DIR}/audio_clip_ref.parquet')
WHERE n_samples > 0
ORDER BY media_id
"""
