"""sf1-scale row-group-resume proof (VERDICT r3 #8).

Runs the flagship over the 9.6M-row / 1.42B-token corpus in rowgroup
resume mode, kills a fresh run mid-shard at ~55% committed units, resumes,
and reports: per-phase walls, bytes_read/bytes_skipped from the manifest,
resume overhead vs a cold run, and output-equality of the aggregates.

Usage: python tools/resume_proof.py            # full experiment
       python tools/resume_proof.py --phase X  # internal subprocess entry
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT = "/tmp/clp_bench/seq_sf0.1_r9600000"
UNITS_TOTAL = 192  # 64 files x 3 row groups at unit_target_bytes=20MB
KILL_AT = 106      # mid-shard 4 (shards are 24 units each)
# routed output goes to tmpfs: each run writes ~6 GB and consecutive runs
# on the shared disk are write-back-contention-dominated (measured cold
# walls 12.7 -> 17.9 s across one experiment on /tmp; the wall comparison
# must isolate resume logic, not the box's dirty-page flusher)
OUT_BASE = "/dev/shm/clp_resume_proof"
COLD_DIR = OUT_BASE + "/sf1_cold"
RES_DIR = OUT_BASE + "/sf1_res"


def run_phase(out_dir: str) -> dict:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from commerce_logs_pipeline_ray.datagen import generate_sequences
    from commerce_logs_pipeline_ray.pipelines.flagship import PipelineConfig, run_flagship

    generate_sequences(INPUT, rows=9_600_000, num_files=64, seed=42)
    # warm the Ray worker pool (same discipline as bench.py): process spawn +
    # imports are a fixed per-SESSION cost a long-lived production job pays
    # once — the walls here must compare pipeline work, not fork latency
    import shutil as _sh

    warm_dir = "/tmp/clp_bench/warmup_r262144"
    generate_sequences(warm_dir, rows=262_144, num_files=64, seed=7)
    _sh.rmtree(out_dir + ".warm", ignore_errors=True)
    run_flagship(PipelineConfig(input_dir=warm_dir, output_dir=out_dir + ".warm",
                                num_shards=1))
    _sh.rmtree(out_dir + ".warm", ignore_errors=True)
    cfg = PipelineConfig(input_dir=INPUT, output_dir=out_dir, num_shards=8,
                         resume_granularity="rowgroup", unit_target_bytes=20 << 20)
    t0 = time.time()
    res = run_flagship(cfg)
    fresh = [r for r in res.manifest.values()]
    out = {
        "wall": round(time.time() - t0, 2), "rows_in": res.rows_in,
        "shards_run": res.shards_run, "shards_skipped": res.shards_skipped,
        "units_resumed": sum(r["metrics"].get("units_resumed", 0) for r in fresh),
        "bytes_read": sum(r["metrics"].get("bytes_read", 0) for r in fresh),
        "bytes_skipped": sum(r["metrics"].get("bytes_skipped", 0) for r in fresh),
    }
    ray.shutdown()
    return out


def spawn(out_dir: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--phase", out_dir],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def timed(out_dir: str) -> dict:
    p = spawn(out_dir)
    out, _ = p.communicate()
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    import shutil

    from bench import cpu_probe

    probe = cpu_probe(8, 32)
    # page-cache warm
    for f in sorted(glob.glob(os.path.join(INPUT, "*.parquet"))):
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass
    colds = []
    for _ in (0, 1):  # min over reps; wipe between them (a completed dir resumes)
        shutil.rmtree(COLD_DIR, ignore_errors=True)
        colds.append(timed(COLD_DIR))
    cold = min(colds, key=lambda r: r["wall"])
    shutil.rmtree(COLD_DIR, ignore_errors=True)

    shutil.rmtree(RES_DIR, ignore_errors=True)
    p = spawn(RES_DIR)
    t0 = time.time()
    committed = 0
    while True:
        committed = len(glob.glob(RES_DIR + "/manifest/shard-*-units/*.json"))
        if committed >= KILL_AT or p.poll() is not None:
            break
        time.sleep(0.15)
    t_kill = round(time.time() - t0, 2)
    p.send_signal(signal.SIGKILL)
    p.wait()

    resume = timed(RES_DIR)
    remaining_frac = 1 - resume["units_resumed"] / UNITS_TOTAL - resume["shards_skipped"] * 24 / UNITS_TOTAL
    overhead = (resume["wall"] - cold["wall"] * remaining_frac) / cold["wall"]

    # output equality: resumed aggregates == cold aggregates
    import pyarrow.parquet as pq

    shutil.rmtree(COLD_DIR, ignore_errors=True)
    cold2 = timed(COLD_DIR)
    a = pq.read_table(COLD_DIR + "/aggregates.parquet")
    b = pq.read_table(RES_DIR + "/aggregates.parquet")
    key = lambda t: t.sort_by([(c, "ascending") for c in t.column_names])
    agg_equal = key(a).equals(key(b))

    print(json.dumps({
        "metric": "rowgroup_resume_proof",
        "cpu_probe": probe,
        "cold_wall": cold["wall"],
        "kill_after_s": t_kill,
        "units_committed_at_kill": committed,
        "resume_wall": resume["wall"],
        "resume_units_resumed": resume["units_resumed"],
        "resume_shards_skipped": resume["shards_skipped"],
        # manifest sums include records retained from the interrupted run;
        # fresh re-read = resume-run manifest total - the retained complete
        # shards' reads (cold total / 8 each) -- skipped units read nothing
        "resume_bytes_reread": resume["bytes_read"]
        - resume["shards_skipped"] * cold["bytes_read"] // 8,
        "resume_bytes_skipped": resume["bytes_skipped"],
        "input_bytes_total": cold["bytes_read"],
        "remaining_frac": round(remaining_frac, 3),
        "resume_overhead_vs_cold": round(overhead, 3),
        "aggregates_equal": agg_equal,
        "rows_in": resume["rows_in"],
        "cold_walls": [c["wall"] for c in colds],
        "cold2_wall": cold2["wall"],
    }))
    shutil.rmtree(COLD_DIR, ignore_errors=True)
    shutil.rmtree(RES_DIR, ignore_errors=True)


if __name__ == "__main__":
    if "--phase" in sys.argv:
        print(json.dumps(run_phase(sys.argv[sys.argv.index("--phase") + 1])))
    else:
        main()
