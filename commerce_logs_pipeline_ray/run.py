"""CLI entry point — the ``ray job submit`` surface (SURVEY §2.10, §7.2-8).

Examples:

    # generate a corpus, run the flagship pipeline on it, resume-safe
    python -m commerce_logs_pipeline_ray.run gen --out /tmp/seq --rows 1000000
    python -m commerce_logs_pipeline_ray.run flagship --input /tmp/seq --output /tmp/out \
        --shards 8 --salt 8 --enrich-mode tasks
    # rerun after a crash: completed shards are skipped via the manifest
    python -m commerce_logs_pipeline_ray.run flagship --input /tmp/seq --output /tmp/out --shards 8

    # run a registered query against a table directory
    python -m commerce_logs_pipeline_ray.run query pipeline_docs --sf-dir /root/testdata/sf0.01

This module OWNS the Ray session (init guarded, shutdown on exit); library
code never initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="commerce_logs_pipeline_ray")
    p.add_argument("--num-cpus", type=int, default=None, help="ray.init num_cpus (default: all)")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a deterministic sequences corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, default=100_000)
    g.add_argument("--files", type=int, default=64)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--p-malformed", type=float, default=0.02)

    f = sub.add_parser("flagship", help="run the parse→enrich→route→aggregate pipeline")
    f.add_argument("--input", required=True)
    f.add_argument("--output", required=True)
    f.add_argument("--shards", type=int, default=1, help="checkpoint granularity")
    f.add_argument("--shard-parallelism", type=int, default=1,
                   help=">1 overlaps that many shard executions")
    f.add_argument("--salt", type=int, default=8, help="aggregation salt modulus (0=off)")
    f.add_argument("--batch-size", type=int, default=32768)
    f.add_argument("--enrich-mode", choices=["tasks", "actors"], default="tasks")
    f.add_argument("--enrich-concurrency", type=int, default=4)
    f.add_argument("--agg-mode", choices=["driver", "tree", "shuffle"], default="driver")
    f.add_argument("--validate", action="store_true", help="semantic validation stage")
    f.add_argument("--no-write-routed", action="store_true")
    f.add_argument("--partition-by", default=None,
                   help="comma-separated Hive partition cols under each sink (e.g. date,tenant)")
    f.add_argument("--resume-granularity", choices=["shard", "rowgroup"], default="shard",
                   help="rowgroup: mid-shard resume from the last committed row-group unit")
    f.add_argument("--unit-target-bytes", type=int, default=128 << 20,
                   help="rowgroup-mode unit packing size (compressed bytes)")

    w = sub.add_parser("watch", help="polling ingestion loop (blob-monitor analogue)")
    w.add_argument("--input", required=True)
    w.add_argument("--output", required=True)
    w.add_argument("--poll-interval", type=float, default=5.0)
    w.add_argument("--max-cycles", type=int, default=None)
    w.add_argument("--idle-stop", type=int, default=None,
                   help="stop after N consecutive cycles with no new work")
    w.add_argument("--partition-by", default=None)

    c = sub.add_parser("curate", help="normalize → quality gate → dedup → langid → partitioned sink")
    c.add_argument("--input", required=True, help="parquet with (doc_id, source, text)")
    c.add_argument("--output", required=True)
    c.add_argument("--min-words", type=int, default=5)
    c.add_argument("--fingerprint", choices=["fnv128", "md5"], default="fnv128",
                   help="content fingerprint (fnv128 = one-pass vectorized scale default)")
    c.add_argument("--dedup-broadcast-max", type=int, default=2_000_000,
                   help="keeper-id count above which the Bloom survivor path runs")
    c.add_argument("--state-dir", default=None,
                   help="cross-run dedup state: kept-content fingerprints persist here; "
                        "later runs skip already-curated content")

    sd = sub.add_parser(
        "span-dedup",
        help="exact substring dedup rewrite: cut all but the globally first "
             "occurrence of every repeated word-k-gram span (Lee et al.)",
    )
    sd.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    sd.add_argument("--output", required=True)
    sd.add_argument("--k", type=int, default=5, help="window size in words")
    sd.add_argument("--state-dir", default=None,
                    help="incremental cross-run state: gram sets persist here; later "
                         "runs cut every occurrence of a span already in the state")

    nd = sub.add_parser(
        "near-dedup",
        help="match a new batch against the persisted LSH band state "
             "(incremental near-dup); writes matches and appends state",
    )
    nd.add_argument("--input", required=True, help="parquet with (doc_id, text)")
    nd.add_argument("--output", required=True, help="matches parquet dir")
    nd.add_argument("--state-dir", required=True, help="band-row state root")
    nd.add_argument("--threshold", type=float, default=0.7)

    wc = sub.add_parser(
        "webclean",
        help="C4 doc/line cleaning + Gopher gates + cross-doc line dedup; "
             "writes the cleaned corpus Hive-partitioned by source",
    )
    wc.add_argument("--input", required=True, help="parquet with (doc_id, source, text)")
    wc.add_argument("--output", required=True, help="cleaned corpus dir")
    wc.add_argument("--dedup-threshold", type=int, default=3,
                    help="drop lines recurring in >= this many surviving docs")

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)

    lst = sub.add_parser("list-queries", help="list registered queries")

    c = sub.add_parser("compact", help="compact a sink dir's small parquet files")
    c.add_argument("path")
    c.add_argument("--target-mb", type=int, default=128)
    c.add_argument("--num-cpus", type=int, default=8)

    args = p.parse_args(argv)

    if args.cmd == "gen":
        from .datagen import generate_sequences

        paths = generate_sequences(
            args.out, rows=args.rows, num_files=args.files, seed=args.seed,
            p_malformed=args.p_malformed, overwrite=True,
        )
        print(json.dumps({"files": len(paths), "rows": args.rows, "dir": args.out}))
        return 0

    if args.cmd == "list-queries":
        from .pipelines.queries import REGISTRY

        for name, spec in REGISTRY.items():
            oracle = "sql-checked" if spec.sql else "rows-only"
            print(f"{name:28s} [{oracle}] {spec.description}")
        return 0

    ray = _ray_session(args.num_cpus)
    try:
        if args.cmd == "flagship":
            from .pipelines.flagship import PipelineConfig, run_flagship

            cfg = PipelineConfig(
                input_dir=args.input,
                output_dir=args.output,
                num_shards=args.shards,
                shard_parallelism=args.shard_parallelism,
                salt_mod=args.salt,
                batch_size=args.batch_size,
                enrich_mode=args.enrich_mode,
                enrich_concurrency=args.enrich_concurrency,
                agg_mode=args.agg_mode,
                validate=args.validate,
                write_routed=not args.no_write_routed,
                partition_by=args.partition_by.split(",") if args.partition_by else None,
                resume_granularity=args.resume_granularity,
                unit_target_bytes=args.unit_target_bytes,
            )
            res = run_flagship(cfg)
            print(
                json.dumps(
                    {
                        "rows_in": res.rows_in,
                        "shards_run": res.shards_run,
                        "shards_skipped": res.shards_skipped,
                        "agg_rows": res.aggregates.num_rows,
                        "wall_s": round(res.wall_seconds, 3),
                        "rows_per_s": res.metrics.get("rows_per_s"),
                        "output_dir": res.output_dir,
                    }
                )
            )
            return 0

        if args.cmd == "curate":
            from .pipelines.curate import CurateConfig, run_curate

            res = run_curate(CurateConfig(
                input_path=args.input, output_dir=args.output, min_words=args.min_words,
                fingerprint=args.fingerprint, dedup_broadcast_max=args.dedup_broadcast_max,
                state_dir=args.state_dir))
            print(
                json.dumps(
                    {
                        "rows_in": res.rows_in,
                        "dropped_quality": res.dropped_quality,
                        "dropped_duplicate": res.dropped_duplicate,
                        "rows_out": res.rows_out,
                        "keepers_dropped_prior": res.keepers_dropped_prior,
                        "per_lang": {k: list(v) for k, v in res.per_lang.items()},
                        "n_files": len(res.output_files),
                    }
                )
            )
            return 0

        if args.cmd == "watch":
            from .pipelines.flagship import PipelineConfig, watch_flagship

            cfg = PipelineConfig(
                input_dir=args.input,
                output_dir=args.output,
                partition_by=args.partition_by.split(",") if args.partition_by else None,
            )
            results = watch_flagship(
                cfg,
                poll_interval_s=args.poll_interval,
                max_cycles=args.max_cycles,
                idle_cycles_to_stop=args.idle_stop,
            )
            print(
                json.dumps(
                    {
                        "cycles": len(results),
                        "rows_in": results[-1].rows_in if results else 0,
                        "shards_total": (results[-1].shards_run + results[-1].shards_skipped)
                        if results else 0,
                    }
                )
            )
            return 0

        if args.cmd == "span-dedup":
            import glob as _glob
            import hashlib as _hashlib

            import numpy as _np
            import ray.data as rd

            from .functions.grams import gram_counts_ds, substring_dedup_rewrite

            ds = rd.read_parquet(args.input)
            prior = None
            state_base = run_dir = None
            if args.state_dir:
                # same cross-run contract as `curate --state-dir`: runs are
                # keyed by input identity so an idempotent re-run overwrites
                # its own state instead of double-registering; prior-gram
                # load is a driver array here — swap for a Bloom / bucketed
                # anti join above ~10^8 grams (relational.bloom_anti_join)
                state_base = os.path.join(args.state_dir, f"k{args.k}")
                run_id = _hashlib.sha256(
                    f"{os.path.abspath(args.input)}|{args.k}".encode()
                ).hexdigest()[:16]
                run_dir = os.path.join(state_base, f"run-{run_id}")
                prior_files = [
                    f for f in sorted(_glob.glob(
                        os.path.join(state_base, "run-*", "*.parquet")))
                    if f"run-{run_id}" not in f
                ]
                if prior_files:
                    prior_ds = rd.read_parquet(prior_files, columns=["g"])
                    if prior_ds.count() <= 2_000_000:
                        prior = _np.unique(
                            prior_ds.to_pandas()["g"].to_numpy().astype(_np.uint64)
                        )
                    else:  # large state: membership rides the exchange
                        prior = prior_ds
            out = substring_dedup_rewrite(ds, k=args.k, prior_grams=prior)
            os.makedirs(args.output, exist_ok=True)
            out.write_parquet(args.output)
            if run_dir is not None:
                import shutil as _shutil

                _shutil.rmtree(run_dir, ignore_errors=True)
                gram_counts_ds(rd.read_parquet(args.input), args.k, 42).select_columns(
                    ["g"]).write_parquet(run_dir)
            written = rd.read_parquet(args.output, columns=["n_removed_words"])
            import pyarrow.compute as _pc

            tot = docs_cut = removed = 0
            for b in written.iter_batches(batch_format="pyarrow"):
                tot += len(b)
                docs_cut += int(_pc.sum(_pc.cast(
                    _pc.greater(b["n_removed_words"], 0), "int64")).as_py() or 0)
                removed += int(_pc.sum(b["n_removed_words"]).as_py() or 0)
            print(json.dumps({
                "docs": tot, "docs_cut": docs_cut, "words_removed": removed,
                "k": args.k, "output_dir": args.output,
            }))
            return 0

        if args.cmd == "webclean":
            import ray.data as rd

            from .functions.webclean import webclean_pipeline

            ds = rd.read_parquet(args.input)
            stats, _final = webclean_pipeline(
                ds, dedup_threshold=args.dedup_threshold, out_dir=args.output
            )
            print(stats.to_json(orient="records"))
            return 0

        if args.cmd == "near-dedup":
            import glob as _glob
            import hashlib as _hashlib
            import shutil as _shutil

            import pyarrow as _pa
            import pyarrow.parquet as _pq
            import ray.data as rd

            from .functions.dedup import minhash_dedup_against_state

            run_id = _hashlib.sha256(os.path.abspath(args.input).encode()).hexdigest()[:16]
            prior_files = [
                f for f in sorted(_glob.glob(os.path.join(args.state_dir, "run-*", "*.parquet")))
                if f"run-{run_id}" not in f
            ]
            prior = rd.read_parquet(prior_files) if prior_files else None
            ds = rd.read_parquet(args.input)
            matches, new_rows = minhash_dedup_against_state(
                ds, prior, threshold=args.threshold)
            os.makedirs(args.output, exist_ok=True)
            _pq.write_table(_pa.Table.from_pandas(matches, preserve_index=False),
                            os.path.join(args.output, "matches.parquet"))
            run_dir = os.path.join(args.state_dir, f"run-{run_id}")
            _shutil.rmtree(run_dir, ignore_errors=True)
            new_rows.write_parquet(run_dir)
            print(json.dumps({
                "docs_matched_prior": int(len(matches)),
                "state_runs": len(set(os.path.dirname(f) for f in prior_files)) + 1,
                "output": os.path.join(args.output, "matches.parquet"),
            }))
            return 0

        if args.cmd == "compact":
            from .sources.compact import compact_dir

            print(json.dumps(compact_dir(args.path, target_mb=args.target_mb)))
            return 0

        if args.cmd == "query":
            from .pipelines.queries import REGISTRY

            if args.name not in REGISTRY:
                print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
                return 2
            result = REGISTRY[args.name].fn(args.sf_dir)
            import pandas as pd

            if not isinstance(result, pd.DataFrame):
                result = result.to_pandas()
            print(result.head(args.limit).to_string(index=False))
            print(f"... {len(result)} rows")
            return 0
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
