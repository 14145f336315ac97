"""Per-partition checkpoint manifest — the Ray-native analogue of the
reference's offset/compacted-state resume machinery.

Reference semantics being reproduced (SURVEY.md §2.1 S4/S5, §2.5 ST3/ST4):

* ``BlobCompletionEvent{fromOffset, toOffset, linesSent}`` emitted after a
  blob segment is fully produced (``processor.go:263-306``) → one manifest
  row per completed input shard with rows_in / rows_out_per_sink / metrics;
* the compacted ``Ingestion.BlobState`` topic — canonical fold, last writer
  wins, reloaded at startup (``blob_state_processor.go:107-375``) → a
  directory of small JSON files, one per shard, atomically replaced
  (tmp + rename), re-read at startup; the newest write IS the fold;
* fully-ingested skip ``closed ∧ lastOffset ≥ size`` (``worker.go:354-364``)
  → shards whose manifest row says ``complete`` with the current
  ``lineage_id`` are skipped on resume.

``lineage_id`` is a deterministic hash of (input files, pipeline config), so
a config or input change invalidates old checkpoints automatically.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

STATUS_COMPLETE = "complete"


def lineage_id(input_files: list[str], config_repr: str) -> str:
    h = hashlib.sha256()
    for f in sorted(input_files):
        h.update(f.encode())
        h.update(b"\x00")
    h.update(config_repr.encode())
    return h.hexdigest()[:16]


def _shard_path(manifest_dir: str, shard_id: int) -> str:
    return os.path.join(manifest_dir, f"shard-{shard_id:05d}.json")


def load_manifest(manifest_dir: str) -> dict[int, dict[str, Any]]:
    """Read all shard rows; ignores torn/partial files (crash-safe)."""
    out: dict[int, dict[str, Any]] = {}
    if not os.path.isdir(manifest_dir):
        return out
    for name in sorted(os.listdir(manifest_dir)):
        if not (name.startswith("shard-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(manifest_dir, name)) as f:
                rec = json.load(f)
            out[int(rec["partition_id"])] = rec
        except (json.JSONDecodeError, KeyError, ValueError):
            continue  # torn write — treated as incomplete
    return out


def write_shard_record(manifest_dir: str, record: dict[str, Any]) -> None:
    """Atomic per-shard write: tmp file + rename (last writer wins)."""
    os.makedirs(manifest_dir, exist_ok=True)
    path = _shard_path(manifest_dir, int(record["partition_id"]))
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=0, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def is_complete(manifest: dict[int, dict], shard_id: int, expect_lineage: str) -> bool:
    rec = manifest.get(shard_id)
    return bool(
        rec
        and rec.get("status") == STATUS_COMPLETE
        and rec.get("lineage_id") == expect_lineage
    )
