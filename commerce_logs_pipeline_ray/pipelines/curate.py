"""Corpus curation pipeline — the training-data counterpart of the
flagship: one streaming composition of the curation operators this repo
implements individually, ending in a partitioned Parquet sink.

    read → normalize (case/whitespace canonicalize)
         → quality gate (min words, max stopword ratio)
         → exact dedup on the normalized fingerprint (hash-partition,
           keep-min-id — SURVEY §2.6 J4 semantics over CONTENT, not id)
         → language annotate (langid heuristic)
         → Hive-partitioned sink (lang=…/part-*.parquet) + run summary

Scale shape: normalize/quality/langid are stateless Arrow kernels fused
into the read stage; the ONLY exchange is the dedup's fingerprint-keyed
reduce, and it moves (fp, doc_id) partials pre-collapsed per batch — never
document text.  The content fingerprint is a one-pass vectorized 128-bit
FNV pair by default (``hashing.content_fp128``); md5 is available for
DuckDB-``md5()`` oracle parity.  Survivor filtering is size-aware: a small
keeper set broadcasts back as an exact id array (``ray.put`` once,
vectorized ``isin``); past ``dedup_broadcast_max`` the keeper ids never
touch the driver — a Bloom prefilter + hash-partitioned exact verify
(``relational.bloom_semi_join``) bounds memory at any corpus size.  Text
crosses the wire zero times on the broadcast path and only for the ~1%
Bloom false positives on the large path.

Every stage is SQL-expressible, so the whole pipeline is oracle-checked
end-to-end by the ``curation_pipeline`` registry query (same parquet in,
same summary out).
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..functions.hashing import content_fp128
from ..functions.scrub import normalize_text
from ..functions.text import langid_batch, md5_hex, n_words, stopword_hits


@dataclass
class CurateConfig:
    input_path: str  # parquet with (doc_id, source, text)
    output_dir: str
    min_words: int = 5
    # stopword gate as an exact integer ratio: keep iff
    # stop_hits * ratio_den <= n_words * ratio_num
    max_stop_ratio_num: int = 1
    max_stop_ratio_den: int = 2
    override_num_blocks: int | None = None
    # content fingerprint for exact dedup: "fnv128" (vectorized one-pass
    # 128-bit FNV pair — the scale default) or "md5" (per-row hashlib; only
    # for DuckDB md5() oracle parity)
    fingerprint: str = "fnv128"
    # survivor filtering: below this keeper count the exact id array
    # broadcasts (ray.put once, vectorized isin per batch); above it the
    # keeper ids never materialize on the driver — a Bloom prefilter +
    # hash-partitioned exact verify (relational.bloom_semi_join) runs
    # instead, bounding driver memory at any corpus size
    dedup_broadcast_max: int = 2_000_000
    # cross-run incremental dedup: when set, fingerprints of every kept doc
    # persist under state_dir/<fingerprint>/run-*/; subsequent runs ANTI-join
    # new keepers against the accumulated state (broadcast below
    # dedup_broadcast_max prior fps, Bloom-prefiltered exact anti join above
    # it — relational.bloom_anti_join), so a re-ingested document is never
    # curated twice.  The reference analogue is the compacted blob-state
    # skip (worker.go:354-364) applied to CONTENT identity.
    state_dir: str | None = None


@dataclass
class CurateResult:
    rows_in: int = 0
    rows_after_quality: int = 0
    rows_out: int = 0
    dropped_quality: int = 0
    dropped_duplicate: int = 0
    keepers_dropped_prior: int = 0  # content seen in an earlier run's state
    per_lang: dict = field(default_factory=dict)
    output_files: list = field(default_factory=list)


def _annotate(t: pa.Table, fingerprint: str = "fnv128") -> pa.Table:
    """Fused normalize + quality + fingerprint kernel (one pass, no Python
    rows): emits the columns every later stage needs."""
    norm = normalize_text(t["text"])
    nw = pc.cast(n_words(norm), pa.int64())
    hits = stopword_hits(norm)
    fp = md5_hex(norm) if fingerprint == "md5" else content_fp128(norm)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "source": t["source"],
            "text": norm,
            "n_words": nw,
            "stop_hits": hits,
            "fp": fp,
        }
    )


def run_curate(cfg: CurateConfig) -> CurateResult:
    res = CurateResult()
    os.makedirs(cfg.output_dir, exist_ok=True)

    kw = {}
    if cfg.override_num_blocks:
        kw["override_num_blocks"] = cfg.override_num_blocks
    ds = rd.read_parquet(cfg.input_path, columns=["doc_id", "source", "text"], **kw)
    res.rows_in = ds.count()

    annotated = ds.map_batches(
        _annotate,
        fn_kwargs={"fingerprint": cfg.fingerprint},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def gate(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(t["n_words"], pa.scalar(cfg.min_words, pa.int64())),
            pc.less_equal(
                pc.multiply(t["stop_hits"], pa.scalar(cfg.max_stop_ratio_den, pa.int64())),
                pc.multiply(t["n_words"], pa.scalar(cfg.max_stop_ratio_num, pa.int64())),
            ),
        )
        return t.filter(pc.fill_null(ok, False))

    passed = annotated.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True).materialize()
    res.rows_after_quality = passed.count()
    res.dropped_quality = res.rows_in - res.rows_after_quality

    # dedup reduce: per-batch (fp → min doc_id) partials, one fp exchange
    from ..functions.relational import bucketed_group_reduce

    def fp_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"fp": t["fp"], "doc_id": t["doc_id"]}).group_by(["fp"]).aggregate(
            [("doc_id", "min")])
        return pa.table({"fp": g["fp"], "keeper": g["doc_id_min"]})

    keepers_ds = bucketed_group_reduce(
        passed.map_batches(fp_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"],
        lambda df: df.groupby("fp", as_index=False)["keeper"].min(),
    ).materialize()
    n_keepers = keepers_ds.count()

    # cross-run dedup: drop keepers whose CONTENT was already curated by an
    # earlier run (state is fingerprint-convention-specific).  This run's
    # OWN state dir (deterministic id from input identity) is excluded so an
    # idempotent re-run never anti-joins against itself.
    import hashlib

    state_base = (
        os.path.join(cfg.state_dir, cfg.fingerprint) if cfg.state_dir else None
    )
    run_id = hashlib.sha256(
        f"{os.path.abspath(cfg.input_path)}|{cfg.min_words}|"
        f"{cfg.max_stop_ratio_num}/{cfg.max_stop_ratio_den}".encode()
    ).hexdigest()[:16]
    prior_files = [
        f for f in (
            sorted(glob.glob(os.path.join(state_base, "run-*", "*.parquet")))
            if state_base else []
        )
        if f"run-{run_id}" not in f
    ]
    if prior_files:
        from ..functions.relational import bloom_anti_join, semi_join_broadcast

        prior = rd.read_parquet(prior_files, columns=["fp"])
        n_prior = prior.count()
        if n_prior <= cfg.dedup_broadcast_max:
            prior_fps = pa.Table.from_pandas(prior.to_pandas(), preserve_index=False)
            keepers_ds = semi_join_broadcast(keepers_ds, prior_fps, "fp", anti=True)
        else:
            keepers_ds = bloom_anti_join(keepers_ds, prior, on="fp")
        keepers_ds = keepers_ds.materialize()
        n_new = keepers_ds.count()
        res.keepers_dropped_prior = n_keepers - n_new
        n_keepers = n_new

    if state_base:
        # persist THIS run's new keeper fingerprints (deterministic run dir
        # keyed by input identity — an idempotent re-run overwrites itself
        # instead of double-registering)
        run_dir = os.path.join(state_base, f"run-{run_id}")
        shutil.rmtree(run_dir, ignore_errors=True)
        if n_keepers:
            keepers_ds.select_columns(["fp"]).write_parquet(run_dir)

    if n_keepers <= cfg.dedup_broadcast_max:
        # small keeper set: exact id array broadcasts once, vectorized isin
        keep_ids = np.sort(keepers_ds.to_pandas()["keeper"].to_numpy(dtype=np.int64))
        keep_ref = ray.put(keep_ids)

        def keep_only(t: pa.Table, *, ref=keep_ref) -> pa.Table:
            ids = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
            mask = np.isin(t["doc_id"].to_numpy(zero_copy_only=False), ids, assume_unique=False)
            return t.filter(pa.array(mask))

        survivors = passed.map_batches(keep_only, batch_format="pyarrow", zero_copy_batch=True)
    else:
        # large keeper set: never materialize ids on the driver — Bloom
        # prefilter (blobs OR-merge, ships once) + hash-partitioned exact
        # verify against the keeper Dataset
        from ..functions.relational import bloom_semi_join

        survivors = bloom_semi_join(
            passed, keepers_ds.select_columns(["keeper"]), on="doc_id", right_on="keeper"
        ).map_batches(
            lambda t: t.drop_columns([c for c in ("keeper",) if c in t.column_names]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    tagged = survivors.map_batches(
        lambda t: t.append_column("lang_guess", langid_batch(t)["lang_guess"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # Hive-partitioned sink: one directory per language, tmp+rename files
    def write_part(t: pa.Table) -> pa.Table:
        out_rows = []
        for lang in pc.unique(t["lang_guess"]).to_pylist():
            sub = t.filter(pc.equal(t["lang_guess"], lang))
            d = os.path.join(cfg.output_dir, "curated", f"lang={lang}")
            os.makedirs(d, exist_ok=True)
            import hashlib

            digest = hashlib.md5(
                b"|".join(str(x).encode() for x in sorted(sub["doc_id"].to_pylist()))
            ).hexdigest()[:16]
            path = os.path.join(d, f"part-{digest}.parquet")
            if not os.path.exists(path):
                tmp = path + f".tmp-{uuid.uuid4().hex}"
                import pyarrow.parquet as pq

                pq.write_table(sub, tmp)
                os.replace(tmp, path)
            out_rows.append((lang, sub.num_rows, int(pc.sum(sub["n_words"]).as_py()), path))
        return pa.table(
            {"lang_guess": [r[0] for r in out_rows],
             "n_docs": pa.array([r[1] for r in out_rows], pa.int64()),
             "total_words": pa.array([r[2] for r in out_rows], pa.int64()),
             "path": [r[3] for r in out_rows]}
        )

    written = tagged.map_batches(write_part, batch_format="pyarrow").to_pandas()
    summary = written.groupby("lang_guess", as_index=False).agg(
        n_docs=("n_docs", "sum"), total_words=("total_words", "sum"))
    res.per_lang = {
        r["lang_guess"]: (int(r["n_docs"]), int(r["total_words"]))
        for _, r in summary.iterrows()
    }
    res.rows_out = int(summary["n_docs"].sum())
    res.dropped_duplicate = res.rows_after_quality - res.rows_out
    res.output_files = sorted(written["path"].unique())
    return res
