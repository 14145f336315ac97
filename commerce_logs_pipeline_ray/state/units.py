"""Sub-shard (row-group) checkpoint units — mid-file resume.

The reference resumes INSIDE a blob from a persisted byte offset
(``pipeline/ingest/internal/ingestion/processor.go:91-116``,
``worker.go:376-385``): an interrupted 100-GB blob continues from its last
committed segment instead of restarting.  The Ray-native analogue of a byte
range in a parquet world is a ROW-GROUP RANGE: this module plans each shard
as a list of units (contiguous row groups of one file, packed to a target
byte size from footer metadata only) and tracks per-unit completion markers
next to the shard manifest.  A re-run of an interrupted shard skips
completed units — fewer re-read bytes, zero duplicate routed rows (unit
outputs are deterministic, so redoing an incomplete unit overwrites its own
partial files).

Marker = one small JSON per completed unit, atomic tmp+rename (same
discipline as the shard manifest; the marker IS the commit point, written
only after the unit's routed files and aggregate partial are durable).
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow.parquet as pq


def plan_units(
    files: list[str], target_bytes: int = 128 << 20
) -> list[dict[str, Any]]:
    """Split a shard's files into row-group-range units of ~``target_bytes``
    (compressed), from footer metadata only — no data pages are read.

    Unit ids are deterministic for a fixed file list: ``{file_idx}.{rg_lo}-{rg_hi}``.
    """
    units: list[dict[str, Any]] = []
    for fi, path in enumerate(files):
        meta = pq.ParquetFile(path).metadata
        n_rg = meta.num_row_groups
        rg_lo = 0
        acc_bytes = 0
        acc_rows = 0
        for rg in range(n_rg):
            g = meta.row_group(rg)
            # COMPRESSED bytes (sum of column-chunk compressed sizes):
            # RowGroupMetaData.total_byte_size is the UNCOMPRESSED size,
            # which would under-fill units and misstate the manifest's
            # bytes_read/bytes_skipped resume metrics
            acc_bytes += sum(
                g.column(ci).total_compressed_size for ci in range(g.num_columns)
            )
            acc_rows += g.num_rows
            last = rg == n_rg - 1
            if acc_bytes >= target_bytes or last:
                units.append(
                    {
                        "unit_id": f"{fi:03d}.{rg_lo:04d}-{rg:04d}",
                        "file": path,
                        "rg_lo": rg_lo,
                        "rg_hi": rg,  # inclusive
                        "n_rows": acc_rows,
                        "bytes": acc_bytes,
                    }
                )
                rg_lo = rg + 1
                acc_bytes = 0
                acc_rows = 0
    return units


def unit_dir(manifest_dir: str, shard_id: int) -> str:
    return os.path.join(manifest_dir, f"shard-{shard_id:05d}-units")


def load_complete_units(udir: str, expect_lineage: str) -> dict[str, dict[str, Any]]:
    """Markers whose lineage matches; torn/foreign files are ignored."""
    out: dict[str, dict[str, Any]] = {}
    if not os.path.isdir(udir):
        return out
    for name in sorted(os.listdir(udir)):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(udir, name)) as f:
                rec = json.load(f)
            if rec.get("lineage_id") == expect_lineage:
                out[rec["unit_id"]] = rec
        except (json.JSONDecodeError, KeyError, ValueError):
            continue
    return out


def write_unit_marker(udir: str, marker: dict[str, Any]) -> None:
    """Atomic commit of one completed unit (tmp + rename)."""
    os.makedirs(udir, exist_ok=True)
    path = os.path.join(udir, marker["unit_id"].replace("/", "_") + ".json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(marker, f, indent=0, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
