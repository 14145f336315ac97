"""Flagship pipeline: read → parse → enrich → route → fan-out write →
salted aggregate, with per-shard checkpoint/resume, lineage and metrics.

This is the end-to-end rebuild of the reference's ingest+extraction path
(SURVEY.md §3.4 lifecycle): one streaming ``ray.data`` pass per shard —

    read_parquet(shard files)                # S1/S2: discovery + columnar read
      → map_batches(parse_batch)             # M1-M13 vectorized grok parse
      → map_batches(Enricher, concurrency=N) # ST2/J1 broadcast dict join
      → map_batches(route_batch)             # F6/R1/R2 predicate fan-out
      → map_batches(write_routed_batch)      # per-sink Parquet + combiner
      → groupby(keys).aggregate(Sum, Sum)    # A2/A5 over tiny partials

The write stage is fused with the aggregation combiner: each task writes its
batch's per-sink files and emits only partial count rows downstream, so the
only shuffle in the whole pipeline moves pre-aggregated partials
(SURVEY §7.4).  ``tokens`` flows zero-copy from read to sink files.

Checkpointing: input files are grouped into shards; each completed shard
commits one manifest row (atomic rename) with lineage id + metrics; a rerun
skips complete shards and wipes+redoes incomplete ones, making resume
exactly-once at shard granularity (reference analogue: byte-offset resume +
compacted blob state, ``processor.go:91-103``, ``worker.go:354-385``).
Granularity trade-off: shards_per_run=1 → maximum pipelining, no mid-run
resume; more shards → finer resume, one streaming execution per shard.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field, asdict
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..schema import (
    AGG_KEYS,
    AGG_SCHEMA,
    N_TOK_BUCKET_WIDTH,
    NUM_LOGICAL_PARTITIONS,
    ROUTED_COLUMNS,
    SEQUENCES_SCHEMA,
)
from ..stages.aggregate import add_bucket, detect_hot_keys, final_agg, partial_agg
from ..stages.enrich import Enricher, build_source_dict
from ..stages.parse import parse_batch
from ..stages.route import route_batch
from ..state import manifest as mstate


@dataclass
class PipelineConfig:
    input_dir: str
    output_dir: str
    sources: list[str] | None = None          # None → schema.SOURCES
    bucket_width: int = N_TOK_BUCKET_WIDTH
    num_logical_partitions: int = NUM_LOGICAL_PARTITIONS
    batch_size: int = 32768
    write_batch_size: int = 32768             # balances file size vs write-stage task parallelism
    write_num_cpus: float = 1.0               # >1 throttles concurrent writers (disk contention)
    write_compression: str = "snappy"         # "none" trades bytes for cpu on high-entropy payloads
    validate: bool = False                    # semantic validation after parse (R2 error channel)
    enrich_mode: str = "tasks"                # "tasks" (broadcast ref) | "actors" (pool)
    enrich_concurrency: int = 4               # actor-pool size when enrich_mode="actors"
    salt_mod: int = 8                         # >1 → salted two-stage reduce
    # final-reduce plan.  The per-sink aggregate's key space is BOUNDED
    # (|sinks|×|sources|×|buckets| — hundreds of rows) and the write stage's
    # fused combiner already collapsed raw rows, so the right plan is to
    # merge the KB-sized partial stream on the driver: the job then has NO
    # all-to-all operator at all, and the streaming executor's AllToAll
    # resource reservation stops starving the fused map stage (measured
    # 2.4×-at-8-CPUs / see stages/aggregate.py::final_agg).  "shuffle"
    # keeps the explicit salted hash-exchange for UNBOUNDED key spaces;
    # "tree" is the in-graph middle ground.  All modes bit-equal
    # (tests/test_flagship.py).
    agg_mode: str = "driver"                  # "driver" | "tree" | "shuffle"
    num_shards: int = 1                       # checkpoint granularity
    # >1 overlaps that many shard executions (one streaming execution per
    # thread; Ray schedules their tasks on one shared pool).  Sequential
    # shards pay per-execution spin-up with zero overlap — at hundreds of
    # shards that serial tax dominates.  Each shard stays an independent
    # checkpoint unit: manifest records are per-shard atomic writes and sink
    # dirs are per-shard, so crash-resume semantics are unchanged (tested).
    shard_parallelism: int = 1
    write_routed: bool = True                 # False → aggregate-only (bench tail)
    # Hive-style layout under each sink: routed/{sink}/shard=N/col=val/…
    # (e.g. ["date"] or ["tenant"]) — the reference's daily-index sink layout
    # (docs/trace-model.md:130-145, traces-{sub}-{env}-yyyy.MM.dd) expressed
    # as partition dirs, so downstream reads prune whole directories.
    partition_by: list[str] | None = None
    # Checkpoint granularity INSIDE a shard.  "shard" (default): an
    # incomplete shard is wiped and redone whole.  "rowgroup": the shard is
    # planned as row-group-range units (state/units.py) and an interrupted
    # run resumes from its last COMMITTED unit — the reference's byte-offset
    # mid-blob resume (processor.go:91-116, worker.go:376-385): a 100-GB hot
    # file no longer re-runs from zero.  Routed files gain a trailing
    # unit=<id> directory level (below partition dirs, so pruned reads are
    # unaffected — routed_files globs recursively).
    resume_granularity: str = "shard"          # "shard" | "rowgroup"
    unit_target_bytes: int = 128 << 20         # unit packing size (compressed bytes)

    # config fields that change WHAT is computed (outputs), as opposed to
    # execution tuning (batch sizes, concurrency, agg strategy) which only
    # changes HOW.  Only semantic fields participate in checkpoint lineage,
    # so re-tuning a job — or appending new input files, which only adds new
    # shard ids — never invalidates completed shards.  partition_by is
    # semantic: it is the on-disk layout contract readers prune against.
    SEMANTIC_FIELDS = (
        "sources", "bucket_width", "num_logical_partitions", "validate", "write_routed",
        "partition_by", "resume_granularity",
    )

    def lineage_repr(self) -> str:
        d = asdict(self)
        return json.dumps({k: d[k] for k in self.SEMANTIC_FIELDS}, sort_keys=True)


@dataclass
class RunResult:
    aggregates: pa.Table
    manifest: dict[int, dict[str, Any]]
    output_dir: str
    rows_in: int = 0
    shards_run: int = 0
    shards_skipped: int = 0
    wall_seconds: float = 0.0
    metrics: dict[str, Any] = field(default_factory=dict)


def _enrich_task(t: pa.Table, *, ref) -> pa.Table:
    import ray as _ray

    lookup = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
    return Enricher(lookup)(t)


def _chunk(items: list, n_chunks: int) -> list[list]:
    n_chunks = max(1, min(n_chunks, len(items)))
    per = [len(items) // n_chunks + (1 if i < len(items) % n_chunks else 0) for i in range(n_chunks)]
    out, it = [], iter(items)
    for p in per:
        out.append([next(it) for _ in range(p)])
    return out


def partition_segment(col: str, val) -> str:
    """One Hive dir segment, sanitized: path separators and '=' in values
    would otherwise corrupt the layout or defeat routed_files' dir matching.
    Writer and readers MUST share this encoding."""
    sval = "__null__" if val is None else str(val).replace(os.sep, "_").replace("=", "_")
    return f"{col}={sval}"


def write_routed_batch(
    t: pa.Table,
    *,
    out_dir: str,
    shard_id: int,
    lineage: str,
    bucket_width: int,
    salt_mod: int,
    write_routed: bool,
    compression: str = "snappy",
    partition_by: list[str] | None = None,
    unit_tag: str | None = None,
) -> pa.Table:
    """Fused sink-writer + aggregation combiner (runs inside map_batches).

    Splits the batch by ``sink``, writes one Parquet file per present sink
    under ``routed/{sink}/shard={shard_id}/`` (cleaned before reprocessing, so
    rewrites are idempotent), and returns ONLY the partial aggregate rows.
    """
    t = add_bucket(t, bucket_width=bucket_width)
    is_err = pc.equal(t["sink"], "errors")
    # NB: the else-branch must be an ARRAY, not a null scalar — pyarrow 16's
    # if_else(cond, <sliced string array>, <null scalar>) mis-reads the slice
    # offset and emits corrupted values (Ray hands map_batches sliced blocks
    # whenever batch_size doesn't align with block boundaries); regression
    # test: tests/test_stages.py::test_sliced_batch_write_raw_integrity
    raw = pc.if_else(is_err, t["doc_id"], pa.nulls(len(t), pa.string()))
    t = t.append_column("raw", raw)
    n = len(t)
    lineage_col = pa.DictionaryArray.from_arrays(
        pa.array([0] * n, type=pa.int32()), pa.array([lineage])
    )
    t = t.append_column("lineage_id", lineage_col)

    if write_routed and n:
        out_cols = [c for c in ROUTED_COLUMNS if c in t.column_names]
        projected = t.select(out_cols + ["n_tok_bucket"])
        # deterministic per-batch file name: an order-insensitive digest of
        # the batch's doc_ids.  A Ray task retry re-produces the same batches
        # from the same block, so the retry OVERWRITES (tmp+rename, atomic)
        # instead of adding a second uuid-named copy — keeps routed output
        # exactly-once even across mid-write worker deaths.
        from ..functions.hashing import fnv1a64

        batch_digest = np.bitwise_xor.reduce(fnv1a64(t["doc_id"])) ^ np.uint64(len(t))
        # iterate the sinks PRESENT in the batch, not the static schema list:
        # rows routed by a user-extended registry to a non-schema sink must be
        # written too, or aggregates and routed files diverge silently
        sinks_col = projected["sink"]
        present = pc.unique(
            sinks_col.combine_chunks() if isinstance(sinks_col, pa.ChunkedArray) else sinks_col
        ).to_pylist()
        def _write_one(sub: pa.Table, rel_dir: str) -> None:
            if unit_tag is not None:
                # unit level sits BELOW the partition dirs so partition-pruned
                # globs (routed_files, recursive **) are unaffected
                rel_dir = os.path.join(rel_dir, f"unit={unit_tag}")
            os.makedirs(rel_dir, exist_ok=True)
            path = os.path.join(rel_dir, f"part-{int(batch_digest):016x}.parquet")
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            # dictionary-encode the low-cardinality columns only: dictionary
            # attempts on the high-entropy tokens list double the encode cost
            pq.write_table(
                sub,
                tmp,
                use_dictionary=[c for c in sub.column_names if c not in ("tokens", "doc_id")],
                compression=compression,
            )
            os.replace(tmp, path)

        for sink in sorted(s for s in present if s is not None):
            sub = projected.filter(pc.equal(projected["sink"], sink))
            if len(sub) == 0:
                continue
            sink_dir = os.path.join(out_dir, "routed", sink, f"shard={shard_id:05d}")
            if not partition_by:
                _write_one(sub, sink_dir)
                continue
            # Hive-style split: one file per distinct partition-key combo
            # present in this batch (partition cols are bounded-cardinality:
            # date/tenant).  Values are encoded into dir names; nulls get an
            # explicit sentinel dir.
            combos = sub.group_by(partition_by).aggregate([])
            for row in combos.to_pylist():
                mask = None
                parts = []
                for col in partition_by:
                    v = row[col]
                    m = pc.is_null(sub[col]) if v is None else pc.equal(sub[col], v)
                    parts.append(partition_segment(col, v))
                    mask = m if mask is None else pc.and_(mask, m)
                _write_one(
                    sub.filter(pc.fill_null(mask, False)),
                    os.path.join(sink_dir, *parts),
                )

    return partial_agg(t, keys=AGG_KEYS, bucket_width=bucket_width, salt_mod=salt_mod)


def _process_unit_batch(
    batch: pa.Table,
    *,
    cfg: "PipelineConfig",
    lookup_ref,
    shard_id: int,
    lineage: str,
    udir: str,
    uagg_dir: str,
) -> pa.Table:
    """One sub-shard checkpoint UNIT end-to-end, inside a Ray task: read its
    row-group range (column-pruned), run the full parse→enrich→route→write
    chain per read batch, persist the unit's aggregate partial, then COMMIT
    the unit marker (the write order is the exactly-once argument: marker
    last, everything before it deterministic and overwrite-idempotent).

    Reference analogue: one blob segment produce + BlobCompletionEvent
    (processor.go:263-306) at row-group-range granularity."""
    from ..state import units as ustate

    out: list[pa.Table] = []
    for row in batch.to_pylist():
        pf = pq.ParquetFile(row["file"])
        parts: list[pa.Table] = []
        for rb in pf.iter_batches(
            batch_size=cfg.batch_size,
            row_groups=list(range(row["rg_lo"], row["rg_hi"] + 1)),
            columns=list(SEQUENCES_SCHEMA.names),
        ):
            t = pa.Table.from_batches([rb])
            t = parse_batch(t, num_partitions=cfg.num_logical_partitions)
            if cfg.validate:
                from ..stages.validate import validate_batch

                t = validate_batch(t)
            t = _enrich_task(t, ref=lookup_ref)
            t = route_batch(t)
            parts.append(
                write_routed_batch(
                    t,
                    out_dir=cfg.output_dir,
                    shard_id=shard_id,
                    lineage=lineage,
                    bucket_width=cfg.bucket_width,
                    salt_mod=0,  # unit partial collapses in-task; no exchange
                    write_routed=cfg.write_routed,
                    compression=cfg.write_compression,
                    partition_by=cfg.partition_by,
                    unit_tag=row["unit_id"],
                )
            )
        from ..stages.aggregate import _combine_partials

        upart = _combine_partials(pa.concat_tables(parts), group_keys=list(AGG_KEYS))
        upath = os.path.join(uagg_dir, f"unit-{row['unit_id']}.parquet")
        tmp = upath + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(upart, tmp)
        os.replace(tmp, upath)
        ustate.write_unit_marker(
            udir,
            {
                "unit_id": row["unit_id"],
                "lineage_id": lineage,
                "file": row["file"],
                "rg_lo": row["rg_lo"],
                "rg_hi": row["rg_hi"],
                "rows_in": row["n_rows"],
                "bytes": row["bytes"],
            },
        )
        out.append(upart)
    return pa.concat_tables(out)


def preflight(cfg: PipelineConfig, files: list[str] | None = None) -> list[str]:
    """Fail-fast checks before launching work (reference Kafka connectivity
    probe analog, README.md:429-453 / cmd/ingest/main.go:220-245): input
    exists, schema matches the payload contract, output is writable."""
    if files is None:
        files = sorted(glob.glob(os.path.join(cfg.input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {cfg.input_dir}")
    if cfg.partition_by:
        bad = [c for c in cfg.partition_by if c not in ROUTED_COLUMNS]
        if bad:
            raise ValueError(
                f"partition_by columns {bad} are not routed output columns "
                f"(choose from {ROUTED_COLUMNS})"
            )
    # every file's footer, not just the first — a mixed-schema directory must
    # fail BEFORE side-effect writes begin (metadata-only reads, cheap)
    for f in files:
        schema = pq.read_schema(f)
        for field in SEQUENCES_SCHEMA:
            if field.name not in schema.names:
                raise ValueError(f"{f}: input schema missing column {field.name!r}")
            if not schema.field(field.name).type.equals(field.type):
                raise ValueError(
                    f"{f}: input schema mismatch for {field.name!r}: "
                    f"expected {field.type}, found {schema.field(field.name).type}"
                )
    os.makedirs(cfg.output_dir, exist_ok=True)
    return files


def _stats_summary(stats: str) -> dict[str, float]:
    """Condense ds.stats() into per-operator total wall seconds (ST5)."""
    import re as _re

    out: dict[str, float] = {}
    for block in stats.split("Operator ")[1:]:
        name = block.split(":", 1)[0].strip()
        name = _re.sub(r"^\d+ ", "", name)[:60]
        m = _re.search(r"\* Remote wall time:.*?, (\S+?)(s|ms|us) total", block)
        if m:
            v = float(m.group(1))
            unit = m.group(2)
            v = v / 1000 if unit == "ms" else v / 1e6 if unit == "us" else v
            out[name] = round(out.get(name, 0.0) + v, 4)
    return out


def run_flagship(
    cfg: PipelineConfig,
    shard_files: list[list[str]] | None = None,
    shard_ids: list[int] | None = None,
    retain_shard_ids: list[int] | None = None,
) -> RunResult:
    """Run (or resume) the full pipeline.  Ray must already be initialised.

    ``shard_files``: explicit shard layout (list of file lists) overriding
    the default sorted-glob + ``num_shards`` chunking — used by
    :func:`watch_flagship` to keep shard ids stable by ARRIVAL order so
    late-arriving files that sort early never shift completed shards.

    ``shard_ids``: explicit shard id per ``shard_files`` entry (defaults to
    positions) — lets the watcher key shards by FILE IDENTITY in its
    persisted order, so deleting a mid-list input file never renumbers the
    shards after it.

    ``retain_shard_ids``: completed shards whose input files are GONE this
    cycle (mid-watch deletion): they are not re-run, but their manifest
    rows, routed outputs and aggregate partials are KEPT and merged into
    the final aggregate — already-ingested data stays ingested (reference
    semantics: a deleted blob's completion event survives in the compacted
    state topic)."""
    t0 = time.perf_counter()
    files = preflight(cfg, [f for s in shard_files for f in s] if shard_files else None)

    manifest_dir = os.path.join(cfg.output_dir, "manifest")
    agg_dir = os.path.join(cfg.output_dir, "agg")
    os.makedirs(agg_dir, exist_ok=True)
    manifest = mstate.load_manifest(manifest_dir)

    # broadcast the dimension table ONCE (J1/ST2): every enrich actor reads it
    # from the local object store, it is never re-shipped per batch.
    lookup_ref = ray.put(build_source_dict(cfg.sources))

    shards = shard_files if shard_files is not None else _chunk(files, cfg.num_shards)
    ids = list(shard_ids) if shard_ids is not None else list(range(len(shards)))
    if len(ids) != len(shards):
        raise ValueError(f"shard_ids length {len(ids)} != shard count {len(shards)}")
    retained = [
        sid for sid in (retain_shard_ids or [])
        if sid in manifest and manifest[sid].get("status") == mstate.STATUS_COMPLETE
    ]
    keep_ids = set(ids) | set(retained)

    # drop leftovers from a previous run with a DIFFERENT shard layout:
    # stale manifest rows, agg partials and routed dirs outside the current
    # shard-id set would otherwise be merged into the final aggregate
    # (double-counting) or linger as duplicate routed rows.
    for rec_name in os.listdir(manifest_dir) if os.path.isdir(manifest_dir) else []:
        if rec_name.startswith("shard-") and rec_name.endswith(".json"):
            sid = int(rec_name[6:11])
            if sid not in keep_ids:
                os.remove(os.path.join(manifest_dir, rec_name))
                manifest.pop(sid, None)
    for stale in glob.glob(os.path.join(agg_dir, "shard-*.parquet")):
        sid = int(os.path.basename(stale)[6:11])
        if sid not in keep_ids:
            os.remove(stale)
    for sink_dir in glob.glob(os.path.join(cfg.output_dir, "routed", "*", "shard=*")):
        sid = int(os.path.basename(sink_dir).split("=")[1])
        if sid not in keep_ids:
            shutil.rmtree(sink_dir, ignore_errors=True)

    rows_in_total, shards_run, shards_skipped = 0, 0, 0
    for sid in retained:
        rows_in_total += int(manifest[sid]["rows_in"])

    pending: list[tuple[int, list[str], str]] = []
    for shard_id, sfiles in zip(ids, shards):
        lineage = mstate.lineage_id(sfiles, cfg.lineage_repr())
        if mstate.is_complete(manifest, shard_id, lineage):
            shards_skipped += 1
            rows_in_total += int(manifest[shard_id]["rows_in"])
            continue
        pending.append((shard_id, sfiles, lineage))

    def _process_shard(shard_id: int, shard_files: list[str], lineage: str) -> dict:
        # wipe any partial outputs of a previously failed attempt → idempotent
        # (glob over ALL sink dirs present on disk, not just schema.SINKS —
        # user-extended registries route to extra sinks)
        for stale_dir in glob.glob(
            os.path.join(cfg.output_dir, "routed", "*", f"shard={shard_id:05d}")
        ):
            shutil.rmtree(stale_dir, ignore_errors=True)
        agg_path = os.path.join(agg_dir, f"shard-{shard_id:05d}.parquet")
        if os.path.exists(agg_path):
            os.remove(agg_path)

        t_shard = time.perf_counter()
        ds = rd.read_parquet(shard_files, columns=list(SEQUENCES_SCHEMA.names))
        ds = ds.map_batches(
            parse_batch,
            fn_kwargs={"num_partitions": cfg.num_logical_partitions},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
        )
        if cfg.validate:
            from ..stages.validate import validate_batch

            ds = ds.map_batches(
                validate_batch, batch_format="pyarrow", batch_size=cfg.batch_size,
                zero_copy_batch=True,
            )
        # ST2/J1 enrichment.  Two equivalent broadcast expressions:
        #  - "actors": callable-class pool, dict dereferenced once per actor in
        #    __init__ — right when per-worker state is heavy (models, indexes);
        #  - "tasks" (default): stateless tasks, dict dereferenced via a
        #    worker-local zero-copy ray.get — same broadcast semantics without
        #    paying an actor-pool spin-up per execution (~2 s measured).
        if cfg.enrich_mode == "actors":
            ds = ds.map_batches(
                Enricher,
                fn_constructor_kwargs={"lookup": lookup_ref},
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=cfg.enrich_concurrency,
                zero_copy_batch=True,
            )
        else:
            ds = ds.map_batches(
                _enrich_task,
                fn_kwargs={"ref": lookup_ref},
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                zero_copy_batch=True,
            )
        ds = ds.map_batches(
            route_batch, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
        )
        partials = ds.map_batches(
            write_routed_batch,
            fn_kwargs={
                "out_dir": cfg.output_dir,
                "shard_id": shard_id,
                "lineage": lineage,
                "bucket_width": cfg.bucket_width,
                "salt_mod": cfg.salt_mod,
                "write_routed": cfg.write_routed,
                "compression": cfg.write_compression,
                "partition_by": cfg.partition_by,
            },
            batch_format="pyarrow",
            batch_size=cfg.write_batch_size,
            zero_copy_batch=True,
            num_cpus=cfg.write_num_cpus,
        )
        shard_agg = final_agg(partials, keys=AGG_KEYS, salted=cfg.salt_mod > 1, mode=cfg.agg_mode)
        if hasattr(shard_agg, "to_pandas"):  # Dataset (shuffle/tree modes)
            stats_src, agg_pdf = shard_agg, shard_agg.to_pandas()
        else:  # driver mode returns the merged pandas frame; stats live on
            # the consumed partial stream's plan
            stats_src, agg_pdf = partials, shard_agg
        agg_table = pa.Table.from_pandas(agg_pdf, preserve_index=False)
        agg_table = agg_table.select(AGG_SCHEMA.names).cast(AGG_SCHEMA)
        pq.write_table(agg_table, agg_path)

        rows_in = int(pc.sum(agg_table["row_count"]).as_py() or 0)
        per_sink: dict[str, int] = {}
        sink_counts = agg_table.group_by("sink").aggregate([("row_count", "sum")])
        for sink, cnt in zip(
            sink_counts["sink"].to_pylist(), sink_counts["row_count_sum"].to_pylist()
        ):
            per_sink[sink] = int(cnt)
        wall = time.perf_counter() - t_shard
        try:
            op_walls = _stats_summary(stats_src.stats())
        except Exception:  # stats formatting is best-effort telemetry
            op_walls = {}
        record = {
            "partition_id": shard_id,
            "lineage_id": lineage,
            "input_files": shard_files,
            "rows_in": rows_in,
            "rows_out_per_sink": per_sink,
            "agg_partial_path": agg_path,
            "metrics": {
                "wall_s": round(wall, 4),
                "rows_per_s": round(rows_in / wall, 2) if wall > 0 else 0.0,
                "operator_wall_s": op_walls,
                "hot_sources": detect_hot_keys(agg_table),
            },
            "status": mstate.STATUS_COMPLETE,
        }
        mstate.write_shard_record(manifest_dir, record)
        return record

    def _process_shard_rowgroup(shard_id: int, shard_files: list[str], lineage: str) -> dict:
        """Row-group-granular variant of ``_process_shard``: plan units, skip
        committed ones, run the rest as one streaming task pool (each unit is
        a single fused read→parse→enrich→route→write task), then merge unit
        aggregate partials into the shard partial + manifest record."""
        from ..state import units as ustate

        udir = ustate.unit_dir(manifest_dir, shard_id)
        uagg_dir = os.path.join(agg_dir, f"shard-{shard_id:05d}-units")
        units = ustate.plan_units(shard_files, cfg.unit_target_bytes)
        done = ustate.load_complete_units(udir, lineage)
        done = {uid: m for uid, m in done.items() if uid in {u["unit_id"] for u in units}}

        if not done:
            # no resumable progress (fresh shard or semantic change): same
            # wipe as shard mode so foreign-layout leftovers can't linger
            for stale_dir in glob.glob(
                os.path.join(cfg.output_dir, "routed", "*", f"shard={shard_id:05d}")
            ):
                shutil.rmtree(stale_dir, ignore_errors=True)
            shutil.rmtree(udir, ignore_errors=True)
            shutil.rmtree(uagg_dir, ignore_errors=True)
        agg_path = os.path.join(agg_dir, f"shard-{shard_id:05d}.parquet")
        if os.path.exists(agg_path):
            os.remove(agg_path)
        os.makedirs(uagg_dir, exist_ok=True)

        pending_units = [u for u in units if u["unit_id"] not in done]
        # reconcile on-disk unit outputs against THIS plan: an interrupted
        # attempt under a different unit packing (unit_target_bytes is
        # non-semantic, so the lineage is unchanged) leaves unit dirs whose
        # ids are neither in `done` nor in this plan's pending set — they
        # must not survive to double-count in recursive routed globs
        plan_ids = {u["unit_id"] for u in units}
        for d in glob.glob(
            os.path.join(
                cfg.output_dir, "routed", "*", f"shard={shard_id:05d}", "**", "unit=*"
            ),
            recursive=True,
        ):
            if os.path.basename(d).split("=", 1)[1] not in plan_ids:
                shutil.rmtree(d, ignore_errors=True)
        for p in glob.glob(os.path.join(uagg_dir, "unit-*.parquet")):
            if os.path.basename(p)[len("unit-"):-len(".parquet")] not in plan_ids:
                os.remove(p)
        # wipe PENDING units' previous partial output (an interrupted attempt
        # may have used different batch boundaries — non-semantic config — so
        # its file digests need not match this run's; completed units are
        # untouched, which is the whole point)
        for u in pending_units:
            for d in glob.glob(
                os.path.join(
                    cfg.output_dir, "routed", "*", f"shard={shard_id:05d}",
                    "**", f"unit={u['unit_id']}",
                ),
                recursive=True,
            ):
                shutil.rmtree(d, ignore_errors=True)
            p = os.path.join(uagg_dir, f"unit-{u['unit_id']}.parquet")
            if os.path.exists(p):
                os.remove(p)

        t_shard = time.perf_counter()
        op_walls: dict[str, float] = {}
        if pending_units:
            partial_stream = rd.from_items(pending_units).map_batches(
                _process_unit_batch,
                fn_kwargs={
                    "cfg": cfg,
                    "lookup_ref": lookup_ref,
                    "shard_id": shard_id,
                    "lineage": lineage,
                    "udir": udir,
                    "uagg_dir": uagg_dir,
                },
                batch_size=1,
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()  # drives the execution; partial rows are KBs
            try:
                op_walls = _stats_summary(partial_stream.stats())
            except Exception:
                op_walls = {}

        # shard partial = merge of ALL unit partials (resumed + fresh)
        unit_tables = [
            pq.read_table(os.path.join(uagg_dir, f"unit-{u['unit_id']}.parquet"))
            for u in units
        ]
        from ..stages.aggregate import _combine_partials

        agg_table = _combine_partials(
            pa.concat_tables(unit_tables) if unit_tables else AGG_SCHEMA.empty_table(),
            group_keys=list(AGG_KEYS),
        )
        agg_table = agg_table.select(AGG_SCHEMA.names).cast(AGG_SCHEMA)
        pq.write_table(agg_table, agg_path)

        rows_in = int(pc.sum(agg_table["row_count"]).as_py() or 0)
        per_sink: dict[str, int] = {}
        sink_counts = agg_table.group_by("sink").aggregate([("row_count", "sum")])
        for sink, cnt in zip(
            sink_counts["sink"].to_pylist(), sink_counts["row_count_sum"].to_pylist()
        ):
            per_sink[sink] = int(cnt)
        wall = time.perf_counter() - t_shard
        bytes_skipped = sum(int(m.get("bytes", 0)) for m in done.values())
        bytes_read = sum(int(u["bytes"]) for u in pending_units)
        record = {
            "partition_id": shard_id,
            "lineage_id": lineage,
            "input_files": shard_files,
            "rows_in": rows_in,
            "rows_out_per_sink": per_sink,
            "agg_partial_path": agg_path,
            "metrics": {
                "wall_s": round(wall, 4),
                "rows_per_s": round(rows_in / wall, 2) if wall > 0 else 0.0,
                "operator_wall_s": op_walls,
                "hot_sources": detect_hot_keys(agg_table),
                "units_total": len(units),
                "units_resumed": len(done),
                "units_run": len(pending_units),
                "bytes_read": bytes_read,
                "bytes_skipped": bytes_skipped,
            },
            "status": mstate.STATUS_COMPLETE,
        }
        mstate.write_shard_record(manifest_dir, record)
        return record

    if cfg.resume_granularity == "rowgroup":
        _process_shard = _process_shard_rowgroup  # noqa: F811 — same contract

    # run the pending shards — sequentially, or overlapped via a bounded
    # thread pool (each thread drives its own streaming execution; per-shard
    # checkpoint/idempotence semantics are identical — manifest writes are
    # per-shard atomic files, sink dirs are per-shard)
    if cfg.shard_parallelism > 1 and len(pending) > 1:
        from concurrent.futures import ThreadPoolExecutor

        # Ray Data's path resolution imports fsspec.implementations.http per
        # read to probe for HTTP filesystems.  Without aiohttp installed that
        # import FAILS every time (failed imports are not cached), so
        # concurrent shard threads race on the module's teardown in
        # sys.modules and one can see "cannot import name 'HTTPFileSystem'"
        # instead of ModuleNotFoundError — which Ray does not catch.  Make
        # the import succeed deterministically by registering a stub whose
        # HTTPFileSystem is never instantiated (isinstance checks are False).
        try:
            import fsspec.implementations.http  # noqa: F401
        except ModuleNotFoundError:
            import sys as _sys
            import types as _types

            _stub = _types.ModuleType("fsspec.implementations.http")
            _stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
            _sys.modules["fsspec.implementations.http"] = _stub
            try:
                import fsspec.implementations as _impl

                _impl.http = _stub
            except Exception:
                pass
        except Exception:  # optional dep shape varies; absence is fine
            pass

        with ThreadPoolExecutor(max_workers=cfg.shard_parallelism) as pool:
            records = list(pool.map(lambda args: _process_shard(*args), pending))
    else:
        records = [_process_shard(*args) for args in pending]
    for record in records:
        manifest[record["partition_id"]] = record
        rows_in_total += int(record["rows_in"])
        shards_run += 1

    # final combine across shard partials (tiny, driver-side) — exactly the
    # current run's shard set, never whatever else is lying in the directory
    # retained (deleted-input) shards keep contributing their partials; a
    # retained partial missing on disk (output pruned by hand) is skipped,
    # but a CURRENT shard's missing partial is a real error — fail loudly
    tables = []
    retained_set = set(retained)
    for sid in sorted(keep_ids):
        p = os.path.join(agg_dir, f"shard-{sid:05d}.parquet")
        if sid in retained_set and not os.path.exists(p):
            continue
        tables.append(pq.read_table(p))
    merged = pa.concat_tables(tables) if tables else AGG_SCHEMA.empty_table()
    final = merged.group_by(AGG_KEYS).aggregate([("row_count", "sum"), ("token_count", "sum")])
    final = pa.table(
        {
            **{k: final[k] for k in AGG_KEYS},
            "row_count": final["row_count_sum"],
            "token_count": final["token_count_sum"],
        }
    ).cast(AGG_SCHEMA)
    pq.write_table(final, os.path.join(cfg.output_dir, "aggregates.parquet"))

    wall = time.perf_counter() - t0
    return RunResult(
        aggregates=final,
        manifest=manifest,
        output_dir=cfg.output_dir,
        rows_in=rows_in_total,
        shards_run=shards_run,
        shards_skipped=shards_skipped,
        wall_seconds=wall,
        metrics={"rows_per_s": round(rows_in_total / wall, 2) if wall else 0.0},
    )


def watch_flagship(
    cfg: PipelineConfig,
    poll_interval_s: float = 5.0,
    max_cycles: int | None = None,
    idle_cycles_to_stop: int | None = None,
    clock=time.sleep,
    max_consecutive_errors: int = 5,
) -> list[RunResult]:
    """Polling ingestion loop — the reference blob-monitor's per-environment
    poll + incremental pickup (``blob-monitor/internal/service/service.go:
    266-328``) rebuilt on the manifest: each cycle re-lists the input dir and
    runs the pipeline with ONE SHARD PER FILE in FIRST-SEEN order.  The
    arrival order is persisted (``manifest/watch_order.json``, atomic), so a
    late-arriving file that sorts lexicographically before existing ones is
    appended as a NEW shard — completed shard ids never shift, nothing
    completed is reprocessed, and the registry survives watcher restarts.
    Shards are keyed by FILE IDENTITY (the file's position in the persisted
    order is its shard id forever), so deleting an input file mid-watch
    never renumbers or re-runs the shards after it: the deleted file's
    completed shard is RETAINED (outputs + manifest row + aggregate
    contribution — already-ingested data stays ingested), an incomplete
    deleted shard is simply dropped from the cycle, and if the file
    reappears its old shard id and checkpoint still apply.

    A failed cycle (e.g. a producer's partially-copied file racing the poll)
    is logged and retried next cycle; ``max_consecutive_errors`` in a row
    aborts with the last error instead of crash-looping forever.

    Stops after ``max_cycles`` polls, or after ``idle_cycles_to_stop``
    consecutive cycles that found no new work.  ``clock`` is injectable for
    tests.  Returns one RunResult per successful cycle that had input.
    """
    from dataclasses import replace as _replace

    order_path = os.path.join(cfg.output_dir, "manifest", "watch_order.json")
    order: list[str] = []
    if os.path.exists(order_path):
        with open(order_path) as f:
            order = json.load(f)
    known = set(order)

    results: list[RunResult] = []
    idle = 0
    cycle = 0
    errors = 0
    while True:
        on_disk = set(glob.glob(os.path.join(cfg.input_dir, "*.parquet")))
        new = sorted(f for f in on_disk if f not in known)
        if new:
            order.extend(new)
            known.update(new)
            os.makedirs(os.path.dirname(order_path), exist_ok=True)
            tmp = order_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(order, f)
            os.replace(tmp, order_path)
        present, ids, gone_complete = [], [], []
        manifest_now = mstate.load_manifest(os.path.join(cfg.output_dir, "manifest"))
        for idx, f in enumerate(order):
            if f in on_disk:
                present.append([f])
                ids.append(idx)
            elif mstate.is_complete(manifest_now, idx, mstate.lineage_id([f], cfg.lineage_repr())):
                gone_complete.append(idx)
        if present:
            try:
                res = run_flagship(_replace(cfg, num_shards=len(present)),
                                   shard_files=present,
                                   shard_ids=ids,
                                   retain_shard_ids=gone_complete)
                errors = 0
                results.append(res)
                idle = idle + 1 if res.shards_run == 0 else 0
            except Exception:
                # transient by assumption (mid-copy file, racing writer) —
                # retry next poll; persistent failure aborts loudly
                errors += 1
                if errors >= max_consecutive_errors:
                    raise
        else:
            idle += 1
        cycle += 1
        if max_cycles is not None and cycle >= max_cycles:
            break
        if idle_cycles_to_stop is not None and idle >= idle_cycles_to_stop:
            break
        clock(poll_interval_s)
    return results


def routed_files(
    output_dir: str, sink: str, partition_filters: dict[str, str] | None = None
) -> list[str]:
    """Files of one routed sink, PRUNED by partition-dir values: a filter on
    a partition column selects whole directories by name — no file footer of
    a non-matching partition is ever opened (the point of the Hive layout at
    100 TB)."""
    parts = "".join(
        "/" + partition_segment(col, val) for col, val in (partition_filters or {}).items()
    )
    # filters must follow the layout's partition_by order (prefix allowed);
    # '**' absorbs any deeper partition levels and the flat layout alike
    pattern = os.path.join(output_dir, "routed", sink, "shard=*") + parts + "/**/part-*.parquet"
    hits = sorted(glob.glob(pattern, recursive=True))
    if not hits:
        hits = sorted(
            glob.glob(os.path.join(output_dir, "routed", sink, "shard=*") + parts + "/part-*.parquet")
        )
    return hits


def read_routed(
    output_dir: str,
    sink: str,
    partition_filters: dict[str, str] | None = None,
    columns: list[str] | None = None,
) -> "rd.Dataset":
    """Pruned Dataset read over a routed sink (see :func:`routed_files`)."""
    files = routed_files(output_dir, sink, partition_filters)
    if not files:
        raise FileNotFoundError(
            f"no routed files for sink={sink!r} filters={partition_filters!r} under {output_dir}"
        )
    return rd.read_parquet(files, columns=columns)
