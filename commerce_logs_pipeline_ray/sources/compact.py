"""Small-file compaction for partitioned Parquet sink directories.

Every retried / per-batch-idempotent writer (``pipelines/flagship.py``
digest-named sink files) trades file granularity for exactly-once
semantics — after enough incremental runs a sink directory accumulates
many small files, and small files are the classic read-amplification
killer at scale (one task + one metadata fetch per file).  Compaction is
the standard maintenance pass: rewrite a directory's row multiset into
~target-size files, atomically, without changing any reader-visible
content.

Shape: file GROUPS are planned driver-side from file sizes only (no data
reads), each group is rewritten by one Ray task (read N small files →
write 1 file), and the swap is tmp-dir + rename so a crash mid-compaction
leaves the original directory untouched.  Row ORDER within the directory
is not preserved (the sink contract everywhere in this repo is row-SET
equality — SURVEY §2.9 batch semantics).
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

import ray


def plan_groups(files: list[str], target_bytes: int) -> list[list[str]]:
    """First-fit by cumulative size over name-sorted files (deterministic).
    A file already ≥ target stays its own group (never split)."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_sz = 0
    for f in sorted(files):
        sz = os.path.getsize(f)
        if cur and cur_sz + sz > target_bytes:
            groups.append(cur)
            cur, cur_sz = [], 0
        cur.append(f)
        cur_sz += sz
        if cur_sz >= target_bytes:
            groups.append(cur)
            cur, cur_sz = [], 0
    if cur:
        groups.append(cur)
    return groups


@ray.remote
def _rewrite_group(files: list[str], out_path: str) -> int:
    t = pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")
    pq.write_table(t, out_path)
    return t.num_rows


def compact_dir(
    path: str,
    target_mb: int = 128,
    suffix: str = ".parquet",
) -> dict:
    """Compact every ``*.parquet`` under ``path`` (non-recursive) into
    ~``target_mb`` files.  Returns {files_before, files_after, rows}.

    Atomic: output lands in ``<path>.compact-tmp-*`` first; the original
    dir is replaced only after every group has committed.  Idempotent to
    re-run (a compacted dir just re-plans into itself)."""
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(suffix) and os.path.isfile(os.path.join(path, f))
    ]
    if not files:
        return {"files_before": 0, "files_after": 0, "rows": 0}
    groups = plan_groups(files, target_mb * (1 << 20))
    tmp = f"{path}.compact-tmp-{uuid.uuid4().hex}"
    os.makedirs(tmp)
    try:
        futs = [
            _rewrite_group.remote(g, os.path.join(tmp, f"compacted-{i:05d}{suffix}"))
            for i, g in enumerate(groups)
        ]
        rows = sum(ray.get(futs))
        # keep non-parquet payload (manifests etc.) alongside the new files
        for f in os.listdir(path):
            if not f.endswith(suffix):
                src = os.path.join(path, f)
                if os.path.isfile(src):
                    shutil.copy2(src, os.path.join(tmp, f))
                else:
                    shutil.copytree(src, os.path.join(tmp, f))
        old = f"{path}.compact-old-{uuid.uuid4().hex}"
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return {"files_before": len(files), "files_after": len(groups), "rows": rows}
