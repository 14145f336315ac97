"""Zone-map (data-skipping) sink and pruned reader — the lakehouse
min/max-statistics pattern (Iceberg/Delta file skipping, Parquet row-group
zone maps lifted to the file manifest level).

``write_with_zonemaps`` writes a Dataset as N files plus ONE manifest JSON
recording each file's (min, max) for the clustering column; files are
range-partitioned first (``Dataset.sort``) so zones are disjoint and a
point/range predicate overlaps O(1) of them.  ``pruned_read`` consults only
the manifest (a KB), opens only overlapping files, and reports exactly how
many files and bytes it skipped — at 100 TB this is the difference between
reading one file and reading a corpus.

Write is atomic-ish for resume: files land under their final names, the
manifest is written LAST (tmp + rename) — a crashed write leaves no
manifest and the directory reads as absent.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

MANIFEST = "zonemap.json"


def write_with_zonemaps(
    ds: Dataset, out_dir: str, col: str, num_files: int = 16
) -> dict:
    """Range-sort on ``col``, write one parquet per range, record zones."""
    import ray as _ray

    os.makedirs(out_dir, exist_ok=True)
    parts = ds.sort(col).repartition(num_files)

    @_ray.remote
    def write_one(t: pa.Table, i: int) -> dict | None:
        if t.num_rows == 0:
            return None
        vals = t[col].to_numpy(zero_copy_only=False)
        path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(t, path)
        return {
            "file": os.path.basename(path),
            "rows": int(t.num_rows),
            "bytes": int(os.path.getsize(path)),
            "min": int(vals.min()),
            "max": int(vals.max()),
        }

    # distributed file writes; the driver only gathers KB-sized zone rows
    futs = [write_one.remote(ref, i) for i, ref in enumerate(parts.to_arrow_refs())]
    zones = [z for z in _ray.get(futs) if z is not None]
    man = {"column": col, "zones": zones}
    tmp = os.path.join(out_dir, f".{MANIFEST}.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return man


def pruned_read(out_dir: str, lo: int, hi: int) -> tuple[pa.Table, dict]:
    """Read rows with ``lo <= col <= hi`` opening ONLY overlapping zones.

    Returns (table, stats) with stats = files/bytes scanned vs skipped —
    the data-skipping receipt a 100-TB range query lives on."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        man = json.load(f)
    col = man["column"]
    hit, skip_files, skip_bytes, scan_bytes = [], 0, 0, 0
    for z in man["zones"]:
        if z["max"] < lo or z["min"] > hi:
            skip_files += 1
            skip_bytes += z["bytes"]
        else:
            hit.append(z)
            scan_bytes += z["bytes"]
    tables = []
    for z in hit:
        t = pq.read_table(os.path.join(out_dir, z["file"]))
        vals = t[col].to_numpy(zero_copy_only=False)
        mask = (vals >= lo) & (vals <= hi)
        tables.append(t.filter(pa.array(mask)))
    out = (
        pa.concat_tables(tables)
        if tables
        else pq.read_table(
            os.path.join(out_dir, man["zones"][0]["file"])
        ).slice(0, 0)
    )
    stats = {
        "files_total": len(man["zones"]),
        "files_scanned": len(hit),
        "files_skipped": skip_files,
        "bytes_scanned": scan_bytes,
        "bytes_skipped": skip_bytes,
    }
    return out, stats
