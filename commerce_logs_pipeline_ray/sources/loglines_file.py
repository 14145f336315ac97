"""Raw line-file ingestion source — the reference's actual input shape.

The reference's primary input is gzipped newline-JSON blobs scanned line by
line (``pipeline/ingest/internal/ingestion/processor.go:106-177``: ranged
download → gunzip → 1 MB line scanner).  This module provides that shape for
the Ray engine:

* :func:`write_logline_corpus` — deterministic synthetic corpus written as
  BOTH gzipped JSON-lines shards (``shard-N.jsonl.gz``, what the engine
  ingests) and one ``lines.parquet`` mirror with identical content (what the
  DuckDB oracle reads — SQL and Ray consume the same bytes);
* :func:`read_logline_corpus` — ``ray.data.read_text`` over the gz shards
  (streaming decompression per shard; a shard is the parallelism unit, like
  the reference's one-consumer-per-blob).

Corpus invariant: no fully-empty lines are written (blank-ish lines are a
single space) so text readers that drop empty lines and the parquet mirror
agree row-for-row.
"""

from __future__ import annotations

import gzip
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..stages.loglines import synth_log_lines

GZ_PATTERN = "shard-{shard:04d}.jsonl.gz"
PARQUET_NAME = "lines.parquet"


def write_logline_corpus(
    out_dir: str, n: int, seed: int = 42, num_shards: int = 8
) -> tuple[list[str], str]:
    """Write the synthetic corpus as gz JSON-line shards + a parquet mirror.

    Idempotent and atomic (tmp+rename per file); re-invocations with the
    same (n, seed, num_shards) are no-ops.  Returns (gz_paths, parquet_path).
    """
    os.makedirs(out_dir, exist_ok=True)
    # text readers drop whitespace-only lines — represent the "blank line"
    # skip sentinel as a blank CONTAINER log instead (same 'skip' outcome)
    blank = '{"log": " "}'
    lines = [ln if ln.strip() else blank for ln in synth_log_lines(n, seed=seed)]
    shard_size = (len(lines) + num_shards - 1) // num_shards
    gz_paths = []
    for s in range(num_shards):
        chunk = lines[s * shard_size : (s + 1) * shard_size]
        if not chunk:
            break
        path = os.path.join(out_dir, GZ_PATTERN.format(shard=s))
        gz_paths.append(path)
        if os.path.exists(path):
            continue
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        # mtime=0 → byte-stable gzip output across runs
        with open(tmp, "wb") as raw, gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as gz:
            gz.write(("\n".join(chunk) + "\n").encode())
        os.replace(tmp, path)
    pq_path = os.path.join(out_dir, PARQUET_NAME)
    if not os.path.exists(pq_path):
        tmp = pq_path + f".tmp-{uuid.uuid4().hex}"
        pq.write_table(pa.table({"line": pa.array(lines, type=pa.string())}), tmp)
        os.replace(tmp, pq_path)
    return gz_paths, pq_path


def read_logline_corpus(out_dir: str, **read_kwargs) -> rd.Dataset:
    """Dataset of raw lines from the gz shards (column name: ``line``).

    One gz shard decompresses as one stream (gzip is not splittable — the
    shard count, not byte ranges, is the parallelism dial, exactly like the
    reference's blob-per-consumer layout)."""
    import glob as _glob

    paths = sorted(_glob.glob(os.path.join(out_dir, "shard-*.jsonl.gz")))
    if not paths:
        raise FileNotFoundError(f"no gz line shards under {out_dir}")
    ds = rd.read_text(
        paths,
        arrow_open_stream_args={"compression": "gzip"},
        **read_kwargs,
    )
    return ds.rename_columns({"text": "line"})


# bump whenever ANY artifact generator changes semantics (synth_log_lines,
# derive_sequences, pack_batch, SimHasher) — a stale /tmp surviving across
# builds must never be compared against newer code
ARTIFACT_VERSION = 5


def corpus_dir(sf_dir: str, base: str = "/tmp/cpr_oracle") -> str:
    """Deterministic per-sf artifact directory shared by the Ray queries and
    the DuckDB oracles (both sides read the same materialized inputs).
    Versioned: generator changes move to a fresh directory."""
    return os.path.join(base, f"v{ARTIFACT_VERSION}", os.path.basename(sf_dir.rstrip("/")))
