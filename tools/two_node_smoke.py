"""Two-process local Ray cluster smoke (VERDICT r4 next-round item #5).

Starts a head node plus a SECOND `ray start` worker process on this box,
runs the flagship pipeline across both, and asserts:

* both nodes are alive and tasks actually executed on BOTH node ids
  (cross-node scheduling + object transfer exercised, which single-process
  ``ray.init(num_cpus=N)`` cannot);
* the routed row total and the aggregates table are exactly equal to a
  single-node run on the same input.

Exit code 0 = pass; prints one JSON line.  Exits 3 with "SKIP" if the
sandbox refuses the second process (the pytest wrapper skips then).
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = int(os.environ.get("TWO_NODE_PORT", "63790"))
ADDR = f"127.0.0.1:{PORT}"


def sh(cmd: list[str]) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, timeout=120)


def other_ray_alive() -> bool:
    """True when another Ray session (e.g. a pytest session fixture) is live
    on this box.  The cleanup below must `ray stop --force`, which kills
    EVERY Ray process on the machine — running then would nuke the other
    session, so we skip instead (run this tool standalone for the real
    measurement)."""
    p = subprocess.run(["pgrep", "-f", "gcs_server"], capture_output=True, text=True)
    return bool(p.stdout.strip())


def start_cluster() -> None:
    if other_ray_alive():
        print("SKIP: another Ray session is live on this machine; "
              "run tools/two_node_smoke.py standalone")
        sys.exit(3)
    head = sh(["ray", "start", "--head", f"--port={PORT}", "--num-cpus=4",
               "--include-dashboard=false", "--disable-usage-stats"])
    if head.returncode != 0:
        print("SKIP: ray start --head failed:", head.stderr[-400:])
        sys.exit(3)
    worker = sh(["ray", "start", f"--address={ADDR}", "--num-cpus=4",
                 "--disable-usage-stats"])
    if worker.returncode != 0:
        sh(["ray", "stop", "--force"])
        print("SKIP: ray start worker failed:", worker.stderr[-400:])
        sys.exit(3)


def main() -> int:
    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.datagen import generate_sequences

    if other_ray_alive():
        print("SKIP: another Ray session is live on this machine; "
              "run tools/two_node_smoke.py standalone")
        return 3

    indir, out1, out2 = "/tmp/twonode/in", "/tmp/twonode/single", "/tmp/twonode/cluster"
    shutil.rmtree("/tmp/twonode", ignore_errors=True)

    # --- single-node reference run in a subprocess (clean session) ---
    ref = subprocess.run(
        [sys.executable, "-c", f"""
import ray, sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
from commerce_logs_pipeline_ray.datagen import generate_sequences
from commerce_logs_pipeline_ray.pipelines.flagship import PipelineConfig, run_flagship
generate_sequences({indir!r}, rows=40000, num_files=16)
res = run_flagship(PipelineConfig(input_dir={indir!r}, output_dir={out1!r}, num_shards=4))
print("REF", res.rows_in)
ray.shutdown()
"""],
        capture_output=True, text=True, timeout=300)
    assert ref.returncode == 0, ref.stderr[-2000:]

    # --- two-node cluster run ---
    start_cluster()
    try:
        import ray
        ray.init(address=ADDR, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        alive = [n for n in ray.nodes() if n["Alive"]]
        assert len(alive) == 2, f"expected 2 nodes, got {len(alive)}"

        # prove tasks land on both nodes (cross-node scheduling)
        import ray.data as rd

        def node_of(batch):
            import ray as _ray
            return {"node": [_ray.get_runtime_context().get_node_id()]}

        nodes_seen = set(
            r["node"] for r in rd.range(64, override_num_blocks=64)
            .map_batches(node_of).take_all())
        assert len(nodes_seen) == 2, f"tasks ran on {len(nodes_seen)} node(s)"

        from commerce_logs_pipeline_ray.pipelines.flagship import PipelineConfig, run_flagship
        res = run_flagship(PipelineConfig(input_dir=indir, output_dir=out2, num_shards=4))
        ray.shutdown()
    finally:
        sh(["ray", "stop", "--force"])

    # --- compare: aggregates bit-equal, routed row totals equal ---
    import pandas as pd

    def agg(path):
        df = pq.read_table(f"{path}/aggregates.parquet").to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    a1, a2 = agg(out1), agg(out2)
    pd.testing.assert_frame_equal(a1, a2)

    def routed_rows(path):
        import glob
        return sum(pq.ParquetFile(f).metadata.num_rows
                   for f in glob.glob(f"{path}/routed/*/*/*.parquet"))

    r1, r2 = routed_rows(out1), routed_rows(out2)
    assert r1 == r2, (r1, r2)
    print(json.dumps({"two_node_smoke": "pass", "nodes": 2,
                      "rows_in": res.rows_in, "routed_rows": r2,
                      "aggregate_rows": int(len(a2))}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
