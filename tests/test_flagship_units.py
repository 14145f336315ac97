"""Row-group-granular (mid-shard) resume — state/units.py + the flagship's
``resume_granularity="rowgroup"`` path.

Reference semantics being matched: byte-offset mid-blob resume
(processor.go:91-116, worker.go:376-385) — an interrupted shard continues
from its last COMMITTED unit instead of re-running from zero; fewer bytes
re-read, zero duplicate routed rows."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from commerce_logs_pipeline_ray.pipelines.flagship import (
    PipelineConfig,
    read_routed,
    run_flagship,
)
from commerce_logs_pipeline_ray.state import units as ustate


@pytest.fixture(scope="module")
def rg_input(small_sequences, tmp_path_factory):
    """The small_sequences corpus rewritten with tiny row groups so one file
    spans many checkpoint units (the 100-GB-hot-file shape, miniaturized)."""
    paths, table = small_sequences
    d = tmp_path_factory.mktemp("rg") / "in"
    os.makedirs(d, exist_ok=True)
    out = []
    for p in paths:
        q = str(d / os.path.basename(p))
        pq.write_table(pq.read_table(p), q, row_group_size=250)
        out.append(q)
    return sorted(out), table


def _cfg(rg_input, out_dir, **kw):
    files, _ = rg_input
    kw.setdefault("num_shards", 2)
    kw.setdefault("batch_size", 512)
    return PipelineConfig(
        input_dir=os.path.dirname(files[0]),
        output_dir=str(out_dir),
        resume_granularity="rowgroup",
        unit_target_bytes=1,  # → one unit per row group
        **kw,
    )


def test_plan_units_packing(rg_input):
    files, table = rg_input
    # target=1 byte → one unit per row group, ids deterministic, rows add up
    units = ustate.plan_units(files, target_bytes=1)
    assert sum(u["n_rows"] for u in units) == table.num_rows
    assert len(units) == sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
    assert len({u["unit_id"] for u in units}) == len(units)
    # huge target → one unit per file covering all its row groups
    whole = ustate.plan_units(files, target_bytes=1 << 40)
    assert len(whole) == len(files)
    assert sum(u["n_rows"] for u in whole) == table.num_rows


def test_rowgroup_matches_shard_mode(rg_input, tmp_path_factory, ray_session):
    files, table = rg_input
    a = run_flagship(_cfg(rg_input, tmp_path_factory.mktemp("rga") / "out"))
    b = run_flagship(
        PipelineConfig(
            input_dir=os.path.dirname(files[0]),
            output_dir=str(tmp_path_factory.mktemp("rgb") / "out"),
            num_shards=2,
            batch_size=512,
        )
    )
    key = lambda t: t.sort_by([(c, "ascending") for c in t.column_names])
    assert key(a.aggregates).equals(key(b.aggregates))
    assert a.rows_in == b.rows_in == table.num_rows


def test_midshard_resume_skips_committed_units(rg_input, tmp_path_factory, ray_session):
    files, table = rg_input
    out = tmp_path_factory.mktemp("rgresume") / "out"
    cfg = _cfg(rg_input, out)
    first = run_flagship(cfg)
    total_units = first.manifest[0]["metrics"]["units_total"]
    assert total_units > 3

    # simulate a crash mid-shard-0: the shard record never committed, but K
    # units had; also plant a stale partial file in one now-pending unit's
    # routed dir (an interrupted attempt's leftovers) — resume must remove it
    os.remove(os.path.join(out, "manifest", "shard-00000.json"))
    udir = ustate.unit_dir(os.path.join(out, "manifest"), 0)
    markers = sorted(glob.glob(os.path.join(udir, "*.json")))
    killed = markers[-2:]  # 2 units "in flight" at crash time
    killed_ids = []
    for m in killed:
        with open(m) as f:
            killed_ids.append(json.load(f)["unit_id"])
        os.remove(m)
    stale_dirs = [
        d
        for uid in killed_ids
        for d in glob.glob(
            os.path.join(out, "routed", "*", "shard=00000", "**", f"unit={uid}"),
            recursive=True,
        )
    ]
    assert stale_dirs  # the "crash" left partial output behind
    stale_file = os.path.join(stale_dirs[0], "part-deadbeefdeadbeef.parquet")
    pq.write_table(pq.read_table(glob.glob(os.path.join(stale_dirs[0], "*.parquet"))[0]), stale_file)

    second = run_flagship(cfg)
    m = second.manifest[0]["metrics"]
    assert m["units_total"] == total_units
    assert m["units_resumed"] == total_units - 2
    assert m["units_run"] == 2
    assert m["bytes_skipped"] > 0
    # fewer re-read bytes: only the 2 killed units' bytes were re-read
    all_bytes = sum(u["bytes"] for u in ustate.plan_units(files, cfg.unit_target_bytes)
                    if u["file"] in second.manifest[0]["input_files"])
    assert m["bytes_read"] < all_bytes
    assert m["bytes_read"] + m["bytes_skipped"] == all_bytes
    assert not os.path.exists(stale_file)  # stale partial wiped

    # zero duplicate routed rows; totals match a from-scratch run
    ids = read_routed(str(out), "application", columns=["doc_id"]).to_pandas()["doc_id"]
    assert ids.duplicated().sum() == 0
    key = lambda t: t.sort_by([(c, "ascending") for c in t.column_names])
    assert key(second.aggregates).equals(key(first.aggregates))
    assert second.rows_in == table.num_rows
    assert second.shards_skipped == 1  # shard 1's record survived untouched


def test_completed_shard_skips_whole(rg_input, tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("rgskip") / "out"
    cfg = _cfg(rg_input, out)
    run_flagship(cfg)
    again = run_flagship(cfg)
    assert again.shards_run == 0
    assert again.shards_skipped == 2


def test_rowgroup_with_partition_by_pruned_reads(rg_input, tmp_path_factory, ray_session):
    """unit=<id> dirs sit BELOW the partition dirs, so Hive-filtered reads
    keep pruning whole date directories in rowgroup mode."""
    from commerce_logs_pipeline_ray.pipelines.flagship import read_routed, routed_files

    files, _ = rg_input
    out = tmp_path_factory.mktemp("rgpart") / "out"
    cfg = _cfg(rg_input, out, partition_by=["date"])
    run_flagship(cfg)

    all_files = routed_files(str(out), "application")
    assert all_files and all("/unit=" in f for f in all_files)
    dates = sorted({f.split("/date=")[1].split("/")[0] for f in all_files})
    assert len(dates) >= 2
    pick = dates[0]
    picked = routed_files(str(out), "application", {"date": pick})
    assert picked and all(f"/date={pick}/" in f for f in picked)
    assert len(picked) < len(all_files)

    pruned = read_routed(str(out), "application", {"date": pick}).to_pandas()
    full = read_routed(str(out), "application").to_pandas()
    assert set(pruned["date"]) == {pick}
    assert len(pruned) == int((full["date"] == pick).sum())

    # row set equals the shard-mode layout's
    flat_out = tmp_path_factory.mktemp("rgflat") / "out"
    run_flagship(PipelineConfig(
        input_dir=os.path.dirname(files[0]), output_dir=str(flat_out),
        num_shards=2, batch_size=512, partition_by=["date"],
    ))
    flat = read_routed(str(flat_out), "application").to_pandas()
    assert sorted(full["doc_id"]) == sorted(flat["doc_id"])


def test_resume_reconciles_unit_dirs_after_packing_change(
    rg_input, tmp_path_factory, ray_session
):
    """ADVICE scenario: a crash under one unit packing, resume under another
    (unit_target_bytes is non-semantic so the lineage is unchanged).  Old-plan
    unit dirs whose ids PARTIALLY overlap the new plan are neither in `done`
    nor in `pending_units`; resume must reconcile them against the plan or
    their routed parquet double-counts in recursive globs."""
    import pandas as pd
    import pyarrow as pa

    files, _ = rg_input
    # one single-row-group file (same unit id under EVERY packing) + one
    # many-row-group file (ids differ across packings) in one shard
    d = tmp_path_factory.mktemp("repack") / "in"
    os.makedirs(d, exist_ok=True)
    t0 = pq.read_table(files[0])
    pq.write_table(t0, str(d / "seq-00000.parquet"))  # 1 row group
    t1 = pq.read_table(files[1])
    pq.write_table(t1, str(d / "seq-00001.parquet"), row_group_size=250)  # many
    rows_total = t0.num_rows + t1.num_rows

    out = tmp_path_factory.mktemp("repack") / "out"

    def cfg(target):
        return PipelineConfig(
            input_dir=str(d), output_dir=str(out), num_shards=1, batch_size=512,
            resume_granularity="rowgroup", unit_target_bytes=target,
        )

    run_flagship(cfg(1))  # one unit per row group
    # crash AFTER all unit commits, BEFORE the shard record
    os.remove(os.path.join(out, "manifest", "shard-00000.json"))

    res = run_flagship(cfg(1 << 40))  # repacked: one unit per file
    m = res.manifest[0]["metrics"]
    # the single-row-group file's unit id is identical under both packings →
    # resumed; the many-row-group file re-runs as one merged unit
    assert m["units_total"] == 2 and m["units_resumed"] == 1 and m["units_run"] == 1
    # no stale old-plan unit dirs survive anywhere under this shard
    plan_ids = {
        f"unit={u['unit_id']}"
        for u in ustate.plan_units(sorted(glob.glob(str(d / "*.parquet"))), 1 << 40)
    }
    leftover = {
        os.path.basename(p)
        for p in glob.glob(
            os.path.join(out, "routed", "*", "shard=00000", "**", "unit=*"),
            recursive=True,
        )
    }
    assert leftover <= plan_ids, (leftover, plan_ids)
    # zero duplicate routed rows; totals match the input exactly
    assert res.rows_in == rows_total
    parts = []
    for sink in sorted(os.listdir(os.path.join(out, "routed"))):
        try:
            parts.append(read_routed(str(out), sink, columns=["doc_id"]).to_pandas()["doc_id"])
        except FileNotFoundError:  # sink got no rows from this tiny corpus
            continue
    routed_ids = pd.concat(parts, ignore_index=True)
    assert len(routed_ids) == rows_total
    # multiset equality vs the input (the corpus itself contains a few
    # duplicate doc_ids, so compare counts, not uniqueness)
    from collections import Counter

    input_ids = pa.concat_tables([t0, t1])["doc_id"].to_pylist()
    assert Counter(routed_ids) == Counter(input_ids)
