"""End-to-end flagship pipeline vs the row-at-a-time oracle.

Asserts the three BASELINE.json invariants: per-sink aggregate-count
equality, routed-row-set equality, and per-row token-array bit-exactness;
plus checkpoint/resume semantics (FIXTURES.md §3-4)."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.oracle import run_oracle
from commerce_logs_pipeline_ray.pipelines.flagship import PipelineConfig, run_flagship
from commerce_logs_pipeline_ray.schema import AGG_SCHEMA, SINKS


@pytest.fixture(scope="module")
def flagship_run(small_sequences, tmp_path_factory, ray_session):
    paths, table = small_sequences
    out = tmp_path_factory.mktemp("flagship") / "out"
    cfg = PipelineConfig(
        input_dir=os.path.dirname(paths[0]),
        output_dir=str(out),
        num_shards=2,
        salt_mod=8,
        batch_size=1024,
        enrich_concurrency=2,
    )
    res = run_flagship(cfg)
    orc = run_oracle(table.to_pylist())
    return cfg, res, orc, table


def _routed_files(out_dir, sink):
    return sorted(glob.glob(os.path.join(out_dir, "routed", sink, "**", "*.parquet"), recursive=True))


def test_aggregate_equality(flagship_run):
    _, res, orc, _ = flagship_run
    assert res.aggregates.schema.equals(AGG_SCHEMA)
    got = {
        (r["sink"], r["source"], r["tenant"], r["n_tok_bucket"]): (r["row_count"], r["token_count"])
        for r in res.aggregates.to_pylist()
    }
    want = {k: tuple(v) for k, v in orc.agg.items()}
    assert got == want


def test_routed_row_set_equality(flagship_run):
    cfg, res, orc, _ = flagship_run
    want = orc.doc_ids_by_sink()
    for sink in SINKS:
        got = set()
        for f in _routed_files(cfg.output_dir, sink):
            got |= set(pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist())
        assert got == want.get(sink, set()), sink


def test_counts_close_nothing_dropped(flagship_run):
    _, res, orc, table = flagship_run
    assert res.rows_in == table.num_rows
    assert sum(r[0] for r in orc.agg.values()) == table.num_rows


def test_tokens_bit_exact_roundtrip(flagship_run):
    """tokens must survive read→parse→enrich→route→write bit-exactly int32."""
    cfg, _, _, table = flagship_run
    want = {
        d: t
        for d, t in zip(table.column("doc_id").to_pylist(), table.column("tokens").to_pylist())
        if d  # empty doc_id is not unique; checked separately below
    }
    seen = 0
    for sink in SINKS:
        for f in _routed_files(cfg.output_dir, sink):
            t = pq.read_table(f, columns=["doc_id", "tokens"])
            assert t.schema.field("tokens").type == pa.list_(pa.int32())
            for d, toks in zip(t.column("doc_id").to_pylist(), t.column("tokens").to_pylist()):
                if d:
                    assert toks == want[d], f"token mismatch for {d}"
                    seen += 1
    assert seen == len(want)


def test_error_rows_carry_error_type_and_raw(flagship_run):
    cfg, _, orc, _ = flagship_run
    files = _routed_files(cfg.output_dir, "errors")
    assert files
    t = pa.concat_tables([pq.read_table(f) for f in files])
    assert t.column("error_type").null_count == 0
    assert t.column("raw").to_pylist() == t.column("doc_id").to_pylist()
    assert set(t.column("error_type").to_pylist()) <= {"empty_doc_id", "malformed_doc_id"}


def test_manifest_rows(flagship_run):
    cfg, res, _, table = flagship_run
    mdir = os.path.join(cfg.output_dir, "manifest")
    recs = sorted(os.listdir(mdir))
    assert len(recs) == 2
    total = 0
    for name in recs:
        with open(os.path.join(mdir, name)) as f:
            rec = json.load(f)
        assert rec["status"] == "complete"
        assert rec["lineage_id"]
        assert rec["input_files"]
        assert rec["metrics"]["wall_s"] > 0
        assert sum(rec["rows_out_per_sink"].values()) == rec["rows_in"]
        total += rec["rows_in"]
    assert total == table.num_rows


def test_resume_skips_complete_and_redoes_incomplete(small_sequences, tmp_path_factory, ray_session):
    paths, table = small_sequences
    out = tmp_path_factory.mktemp("resume") / "out"
    cfg = PipelineConfig(
        input_dir=os.path.dirname(paths[0]),
        output_dir=str(out),
        num_shards=4,
        batch_size=1024,
        enrich_concurrency=2,
    )
    first = run_flagship(cfg)
    agg_first = {tuple(r.values()) for r in first.aggregates.to_pylist()}

    # simulate a crash after 2 of 4 shards: drop manifest rows 2,3 and leave
    # their (now-stale) outputs on disk — resume must wipe and redo them.
    for sid in (2, 3):
        os.remove(os.path.join(str(out), "manifest", f"shard-{sid:05d}.json"))
    second = run_flagship(cfg)
    assert second.shards_skipped == 2
    assert second.shards_run == 2
    agg_second = {tuple(r.values()) for r in second.aggregates.to_pylist()}
    assert agg_first == agg_second

    # no duplicate rows in routed outputs
    n = 0
    for sink in SINKS:
        for f in _routed_files(str(out), sink):
            n += pq.read_table(f, columns=["doc_id"]).num_rows
    assert n == table.num_rows

    # a third run with nothing missing skips everything
    third = run_flagship(cfg)
    assert third.shards_skipped == 4 and third.shards_run == 0
    assert {tuple(r.values()) for r in third.aggregates.to_pylist()} == agg_first


def test_lineage_invalidation_on_config_change(small_sequences, tmp_path_factory, ray_session):
    paths, _ = small_sequences
    out = tmp_path_factory.mktemp("lineage") / "out"
    cfg = PipelineConfig(
        input_dir=os.path.dirname(paths[0]), output_dir=str(out), num_shards=2,
        batch_size=1024, enrich_concurrency=2,
    )
    run_flagship(cfg)
    cfg2 = PipelineConfig(
        input_dir=os.path.dirname(paths[0]), output_dir=str(out), num_shards=2,
        batch_size=1024, enrich_concurrency=2, bucket_width=64,
    )
    res2 = run_flagship(cfg2)  # config change → old checkpoints invalid
    assert res2.shards_run == 2 and res2.shards_skipped == 0


def test_enrich_actor_mode_equals_task_mode(small_sequences, tmp_path_factory, ray_session):
    """enrich_mode='actors' (ST2 actor pool) and 'tasks' (broadcast ref)
    must produce identical aggregates."""
    paths, _ = small_sequences
    results = []
    for mode in ("tasks", "actors"):
        out = tmp_path_factory.mktemp(f"emode_{mode}") / "out"
        cfg = PipelineConfig(
            input_dir=os.path.dirname(paths[0]), output_dir=str(out),
            enrich_mode=mode, enrich_concurrency=2, batch_size=1024,
            write_routed=False,
        )
        res = run_flagship(cfg)
        results.append(sorted(tuple(r.values()) for r in res.aggregates.to_pylist()))
    assert results[0] == results[1]


def test_all_malformed_input(tmp_path, ray_session):
    """Corpus where every row is malformed → everything lands in errors,
    counts still close."""
    rows = [
        {"doc_id": "", "tokens": [1], "n_tok": 1, "source": "api"},
        {"doc_id": "garbage", "tokens": [2, 2], "n_tok": 2, "source": "api"},
        {"doc_id": "2025.nope", "tokens": [3], "n_tok": 1, "source": "jsapps"},
    ]
    t = pa.Table.from_pylist(rows, schema=__import__(
        "commerce_logs_pipeline_ray.schema", fromlist=["SEQUENCES_SCHEMA"]).SEQUENCES_SCHEMA)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(t, str(in_dir / "p.parquet"))
    res = run_flagship(PipelineConfig(input_dir=str(in_dir), output_dir=str(tmp_path / "out")))
    agg = res.aggregates.to_pylist()
    assert all(r["sink"] == "errors" for r in agg)
    assert sum(r["row_count"] for r in agg) == 3


def test_empty_files_in_input(tmp_path, ray_session):
    """Zero-row parquet files flow through without errors."""
    from commerce_logs_pipeline_ray.datagen import generate_file
    from commerce_logs_pipeline_ray.schema import SEQUENCES_SCHEMA

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pq.write_table(generate_file(0, 100, seed=42), str(in_dir / "a.parquet"))
    pq.write_table(SEQUENCES_SCHEMA.empty_table(), str(in_dir / "empty.parquet"))
    res = run_flagship(PipelineConfig(input_dir=str(in_dir), output_dir=str(tmp_path / "out")))
    assert res.rows_in == 100


def test_shard_layout_change_no_double_count(small_sequences, tmp_path_factory, ray_session):
    """Regression (review finding): rerunning the same output dir with a
    DIFFERENT num_shards must not merge stale shard partials/routed dirs."""
    paths, table = small_sequences
    out = tmp_path_factory.mktemp("layout") / "out"
    base = dict(input_dir=os.path.dirname(paths[0]), output_dir=str(out),
                batch_size=1024, enrich_concurrency=2)
    run_flagship(PipelineConfig(num_shards=4, **base))
    res = run_flagship(PipelineConfig(num_shards=1, **base))
    assert sum(r["row_count"] for r in res.aggregates.to_pylist()) == table.num_rows
    # routed rows not duplicated either
    n = 0
    for sink in SINKS:
        for f in _routed_files(str(out), sink):
            n += pq.read_table(f, columns=["doc_id"]).num_rows
    assert n == table.num_rows


def test_write_names_deterministic_for_retry_idempotence(small_sequences):
    """A retried task re-writes the SAME file names (overwrite, not
    duplicate): running the writer twice on one batch yields one file set."""
    import glob as _glob

    import tempfile

    from commerce_logs_pipeline_ray.pipelines.flagship import write_routed_batch
    from commerce_logs_pipeline_ray.stages.enrich import Enricher
    from commerce_logs_pipeline_ray.stages.parse import parse_batch
    from commerce_logs_pipeline_ray.stages.route import route_batch

    _, table = small_sequences
    routed = route_batch(Enricher()(parse_batch(table)))
    with tempfile.TemporaryDirectory() as d:
        for _ in range(2):  # simulate original attempt + retry
            write_routed_batch(routed, out_dir=d, shard_id=0, lineage="x",
                               bucket_width=128, salt_mod=8, write_routed=True)
        files = _glob.glob(f"{d}/routed/**/*.parquet", recursive=True)
        n = sum(pq.read_table(f, columns=["doc_id"]).num_rows for f in files)
        assert n == table.num_rows  # no duplicates
        assert not _glob.glob(f"{d}/routed/**/*.tmp-*", recursive=True)


def test_incremental_ingestion_appends_only_new_shards(tmp_path, ray_session):
    """Reference blob-monitor semantics: new blobs appear, completed ones
    are not reprocessed.  Appending input files (per-file shards) must leave
    completed shards untouched and process only the new ones."""
    from commerce_logs_pipeline_ray.datagen import generate_file

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(4):
        pq.write_table(generate_file(i, 500, seed=42), str(in_dir / f"part-{i:05d}.parquet"))
    out = str(tmp_path / "out")
    first = run_flagship(PipelineConfig(input_dir=str(in_dir), output_dir=out, num_shards=4))
    assert first.shards_run == 4

    # two new files arrive (sorted after the old ones)
    for i in (4, 5):
        pq.write_table(generate_file(i, 500, seed=42), str(in_dir / f"part-{i:05d}.parquet"))
    second = run_flagship(PipelineConfig(input_dir=str(in_dir), output_dir=out, num_shards=6))
    assert second.shards_skipped == 4
    assert second.shards_run == 2
    assert second.rows_in == 3000
    assert sum(r["row_count"] for r in second.aggregates.to_pylist()) == 3000


def test_execution_tuning_does_not_invalidate_checkpoints(small_sequences, tmp_path_factory, ray_session):
    paths, _ = small_sequences
    out = tmp_path_factory.mktemp("tuning") / "out"
    base = dict(input_dir=os.path.dirname(paths[0]), output_dir=str(out), num_shards=2)
    run_flagship(PipelineConfig(batch_size=1024, enrich_concurrency=2, **base))
    res = run_flagship(PipelineConfig(batch_size=4096, salt_mod=4, agg_mode="tree", **base))
    assert res.shards_skipped == 2 and res.shards_run == 0


def test_partitioned_sink_layout_and_pruned_read(small_sequences, tmp_path_factory, ray_session):
    """partition_by=["tenant"] lays files out Hive-style under each sink and
    a filtered read touches ONLY the matching partition's directories."""
    import pyarrow.compute as pc

    from commerce_logs_pipeline_ray.pipelines.flagship import read_routed, routed_files

    paths, table = small_sequences
    out = tmp_path_factory.mktemp("flagship_part") / "out"
    cfg = PipelineConfig(
        input_dir=os.path.dirname(paths[0]),
        output_dir=str(out),
        num_shards=2,
        batch_size=1024,
        partition_by=["date"],
    )
    run_flagship(cfg)

    all_files = routed_files(str(out), "application")
    dates = sorted({f.split("/date=")[1].split("/")[0] for f in all_files})
    assert len(dates) >= 2, dates
    pick = dates[0]
    picked_files = routed_files(str(out), "application", {"date": pick})
    assert all_files and picked_files
    assert len(picked_files) < len(all_files)
    assert all(f"/date={pick}/" in f for f in picked_files)

    pruned = read_routed(str(out), "application", {"date": pick}).to_pandas()
    full = read_routed(str(out), "application").to_pandas()
    assert set(pruned["date"]) == {pick}
    assert len(pruned) == int((full["date"] == pick).sum())

    # partitioned layout preserves the routed ROW SET exactly
    flat_out = tmp_path_factory.mktemp("flagship_flat") / "out"
    run_flagship(PipelineConfig(
        input_dir=os.path.dirname(paths[0]), output_dir=str(flat_out),
        num_shards=2, batch_size=1024,
    ))
    flat = read_routed(str(flat_out), "application").to_pandas()
    assert sorted(full["doc_id"]) == sorted(flat["doc_id"])


def test_watch_flagship_polling_ingestion(tmp_path, ray_session):
    """Streaming-arrival simulation: the poll loop picks up files appearing
    between cycles, reprocesses nothing, and stops when idle."""
    from commerce_logs_pipeline_ray.datagen import generate_file
    from commerce_logs_pipeline_ray.pipelines.flagship import watch_flagship

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(2):
        pq.write_table(generate_file(i, 400, seed=42), str(in_dir / f"part-{i:05d}.parquet"))

    arrivals = {1: [2, 3]}  # after the first sleep, two new files arrive
    calls = {"n": 0}

    def fake_clock(_s):
        calls["n"] += 1
        for i in arrivals.pop(calls["n"], []):
            pq.write_table(generate_file(i, 400, seed=42), str(in_dir / f"part-{i:05d}.parquet"))

    cfg = PipelineConfig(input_dir=str(in_dir), output_dir=str(tmp_path / "out"))
    results = watch_flagship(
        cfg, poll_interval_s=0, idle_cycles_to_stop=2, max_cycles=10, clock=fake_clock
    )
    runs = [(r.shards_run, r.shards_skipped) for r in results]
    assert runs[0] == (2, 0)          # initial files
    assert (2, 2) in runs             # the two arrivals, old shards skipped
    assert runs[-1] == (0, 4)         # idle cycles at the end
    total = sum(r["row_count"] for r in results[-1].aggregates.to_pylist())
    assert total == 1600              # every row counted exactly once


def test_partition_by_validated_in_preflight(small_sequences, tmp_path, ray_session):
    paths, _ = small_sequences
    cfg = PipelineConfig(
        input_dir=os.path.dirname(paths[0]), output_dir=str(tmp_path / "out"),
        partition_by=["not_a_column"],
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not routed output columns"):
        run_flagship(cfg)


def test_watch_out_of_order_arrival_does_not_reprocess(tmp_path, ray_session):
    """A late file that sorts BEFORE existing ones becomes a NEW shard
    (arrival-order registry) — completed shards keep their ids and are
    skipped, not wiped."""
    from commerce_logs_pipeline_ray.datagen import generate_file
    from commerce_logs_pipeline_ray.pipelines.flagship import watch_flagship

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # initial files sort LATE (part-0009x); the straggler sorts first
    for i in (8, 9):
        pq.write_table(generate_file(i, 400, seed=42), str(in_dir / f"part-0009{i}.parquet"))

    calls = {"n": 0}

    def fake_clock(_s):
        calls["n"] += 1
        if calls["n"] == 1:
            pq.write_table(generate_file(1, 400, seed=42), str(in_dir / "part-00001.parquet"))

    cfg = PipelineConfig(input_dir=str(in_dir), output_dir=str(tmp_path / "out"))
    results = watch_flagship(cfg, poll_interval_s=0, idle_cycles_to_stop=2,
                             max_cycles=10, clock=fake_clock)
    runs = [(r.shards_run, r.shards_skipped) for r in results]
    assert runs[0] == (2, 0)
    # the early-sorting straggler is shard 2 — the two completed shards are
    # SKIPPED, never re-run
    assert (1, 2) in runs
    assert all(skipped + ran <= 3 for ran, skipped in runs)
    total = sum(r["row_count"] for r in results[-1].aggregates.to_pylist())
    assert total == 1200


def test_watch_mid_list_deletion_no_reprocess_no_loss(tmp_path, ray_session):
    """Deleting a MID-LIST input file between cycles must not renumber or
    re-run any completed shard; the deleted file's already-ingested data is
    retained in the aggregate (file-identity shard keying)."""
    from commerce_logs_pipeline_ray.datagen import generate_file
    from commerce_logs_pipeline_ray.pipelines.flagship import watch_flagship

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(3):
        pq.write_table(generate_file(i, 400, seed=42), str(in_dir / f"part-{i:05d}.parquet"))

    calls = {"n": 0}

    def fake_clock(_s):
        calls["n"] += 1
        if calls["n"] == 1:
            os.remove(str(in_dir / "part-00001.parquet"))  # delete the MIDDLE file
            pq.write_table(generate_file(7, 400, seed=42), str(in_dir / "part-00007.parquet"))

    cfg = PipelineConfig(input_dir=str(in_dir), output_dir=str(tmp_path / "out"))
    results = watch_flagship(cfg, poll_interval_s=0, idle_cycles_to_stop=2,
                             max_cycles=10, clock=fake_clock)
    runs = [(r.shards_run, r.shards_skipped) for r in results]
    assert runs[0] == (3, 0)
    # after the deletion + one arrival: ONLY the new file runs; the two
    # surviving completed shards are skipped (ids unshifted, no wipe)
    assert (1, 2) in runs
    # the deleted file's 400 rows remain ingested: every aggregate still
    # counts all 1600 rows exactly once
    total = sum(r["row_count"] for r in results[-1].aggregates.to_pylist())
    assert total == 1600
    assert results[-1].rows_in == 1600
    # shard ids 0..3 all have manifest rows; id 1 belongs to the deleted
    # file (retained), id 3 to the late arrival
    recs = results[-1].manifest
    assert sorted(recs) == [0, 1, 2, 3]
    assert recs[1]["input_files"] == [str(in_dir / "part-00001.parquet")]
    assert recs[3]["input_files"] == [str(in_dir / "part-00007.parquet")]
    # routed rows = input rows exactly once (multiset: the corpus plants
    # duplicate doc_ids by design, so compare counts per id, not a set)
    import glob as _glob
    from collections import Counter

    got = Counter()
    for f in _glob.glob(os.path.join(str(tmp_path / "out"), "routed", "*", "**", "*.parquet"),
                        recursive=True):
        got.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
    want = Counter()
    for i in range(3):
        want.update(generate_file(i, 400, seed=42)["doc_id"].to_pylist())
    want.update(generate_file(7, 400, seed=42)["doc_id"].to_pylist())
    assert got == want
    assert sum(got.values()) == 1600


def test_agg_modes_bit_equal(small_sequences, tmp_path_factory, ray_session):
    """driver (partials merged driver-side, default), tree (coalesce) and
    shuffle (salted hash-exchange) final reduces produce identical tables."""
    paths, _ = small_sequences
    base = dict(input_dir=os.path.dirname(paths[0]), num_shards=1)
    results = {}
    for mode in ("driver", "tree", "shuffle"):
        out = tmp_path_factory.mktemp(f"agg_{mode}") / "out"
        res = run_flagship(PipelineConfig(output_dir=str(out), agg_mode=mode, salt_mod=8, **base))
        results[mode] = (
            res.aggregates.to_pandas()
            .sort_values(["sink", "source", "n_tok_bucket"])
            .reset_index(drop=True)
        )
    assert results["driver"].equals(results["shuffle"])
    assert results["tree"].equals(results["shuffle"])


def test_shard_parallelism_matches_sequential(small_sequences, tmp_path_factory, ray_session):
    """Overlapped shard executions (thread pool) produce byte-identical
    aggregates and the same routed row-set as the sequential path, and the
    manifest still has one complete record per shard."""
    import pandas as pd

    paths, _ = small_sequences
    base = dict(input_dir=os.path.dirname(paths[0]), num_shards=4, salt_mod=8)
    outs = {}
    for par in (1, 3):
        out = tmp_path_factory.mktemp(f"par_{par}") / "out"
        res = run_flagship(
            PipelineConfig(output_dir=str(out), shard_parallelism=par, **base)
        )
        agg = (
            res.aggregates.to_pandas()
            .sort_values(["sink", "source", "tenant", "n_tok_bucket"])
            .reset_index(drop=True)
        )
        routed = []
        for sink in SINKS:
            for f in _routed_files(str(out), sink):
                routed.append(pq.read_table(f, columns=["doc_id"]).to_pandas())
        ids = pd.concat(routed)["doc_id"].sort_values().reset_index(drop=True) if routed else pd.Series([])
        outs[par] = (agg, ids, res)
        assert res.shards_run == 4
        assert len(res.manifest) == 4
    assert outs[1][0].equals(outs[3][0])
    assert outs[1][1].equals(outs[3][1])


def test_shard_parallelism_resume(small_sequences, tmp_path_factory, ray_session):
    """A parallel run over a half-completed manifest only reruns the
    incomplete shards and the final aggregate equals a from-scratch run."""
    paths, _ = small_sequences
    base = dict(input_dir=os.path.dirname(paths[0]), num_shards=4, salt_mod=8)
    out = tmp_path_factory.mktemp("par_resume") / "out"
    first = run_flagship(PipelineConfig(output_dir=str(out), **base))
    # drop two manifest records → those shards look incomplete
    for sid in (1, 3):
        os.remove(os.path.join(str(out), "manifest", f"shard-{sid:05d}.json"))
    second = run_flagship(
        PipelineConfig(output_dir=str(out), shard_parallelism=2, **base)
    )
    assert second.shards_skipped == 2 and second.shards_run == 2
    a = first.aggregates.to_pandas().sort_values(["sink", "source", "tenant", "n_tok_bucket"]).reset_index(drop=True)
    b = second.aggregates.to_pandas().sort_values(["sink", "source", "tenant", "n_tok_bucket"]).reset_index(drop=True)
    assert a.equals(b)
