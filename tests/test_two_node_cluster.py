"""Two-process local Ray cluster smoke (VERDICT r4 item #5).

Runs tools/two_node_smoke.py in a SUBPROCESS (it owns its own head+worker
`ray start` processes and its own ray.init sessions, so it must not share
this test session's local Ray).  Skips if the sandbox refuses the second
process.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_node_flagship_matches_single_node():
    env = dict(os.environ, TWO_NODE_PORT="63791", PYTHONPATH=REPO)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "two_node_smoke.py")],
        capture_output=True, text=True, timeout=580, env=env, cwd=REPO)
    if p.returncode == 3:
        pytest.skip(f"sandbox refused second ray process: {p.stdout[-200:]}")
    assert p.returncode == 0, (p.stdout[-2000:], p.stderr[-2000:])
    line = [ln for ln in p.stdout.splitlines() if ln.startswith('{"two_node_smoke"')][-1]
    rec = json.loads(line)
    assert rec["nodes"] == 2
    assert rec["routed_rows"] == rec["rows_in"] == 40000
