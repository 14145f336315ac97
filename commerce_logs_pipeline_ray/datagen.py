"""Deterministic synthetic generator for the sequences input table.

Produces the exact BASELINE.json ``input_hint`` shape —
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)`` — at
parameterized row / file counts with a fixed seed (FIXTURES.md §1):

* ``doc_id`` follows the kubernetes blob-name grammar of the reference
  (``docs/blob-structure.md:4-33``, parser
  ``pipeline/blob-monitor/internal/selectors/selectors.go:20-71``):
  ``{YYYYMMDD}.{service}-{rs8hex}-{suffix5}_{namespace}_{container}-{blob8hex}``.
  A seeded fraction ``p_malformed`` are malformed (underscores stripped,
  truncated date, or empty) to exercise the error sink (the reference's
  malformed-line skip semantics, ``extractor.go:287-311`` — except we route
  skips to an explicit ``errors`` sink so row counts close).
* ``source`` is Zipf-skewed over the 7 reference selector names (hot key
  ``apache-proxy``) to exercise skew-aware salting.
* ``tokens`` are uniform int32 in ``[0, VOCAB_SIZE)`` with log-normal-ish
  lengths clipped to ``[1, MAX_TOKENS]``.

Each output file is generated independently from ``(seed, file_index)`` so
generation parallelizes trivially and any file is reproducible in isolation.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import (
    CONTAINER_BY_SOURCE,
    DEFAULT_CONTAINER,
    MAX_TOKENS,
    SEQUENCES_SCHEMA,
    SERVICE_BY_SOURCE,
    SOURCES,
    VOCAB_SIZE,
)

ZIPF_EXPONENT = 1.5

_HEX = np.array(list("0123456789abcdef"))
_ALNUM = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))


def source_weights(sources: list[str] = SOURCES, exponent: float = ZIPF_EXPONENT) -> np.ndarray:
    w = 1.0 / np.arange(1, len(sources) + 1) ** exponent
    return w / w.sum()


def _rand_fixed_strings(rng: np.random.Generator, n: int, length: int, alphabet: np.ndarray) -> np.ndarray:
    """n random fixed-length strings — vectorized via a char matrix."""
    idx = rng.integers(0, len(alphabet), size=(n, length))
    chars = alphabet[idx].astype("U1")
    return np.frombuffer(chars.tobytes(), dtype=f"U{length}").copy()


def generate_file(file_index: int, rows: int, seed: int = 42, p_malformed: float = 0.02) -> pa.Table:
    """Generate one deterministic Parquet-file-worth of sequences."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, file_index]))

    weights = source_weights()
    src_idx = rng.choice(len(SOURCES), size=rows, p=weights)
    sources = np.array(SOURCES, dtype=object)[src_idx]

    # dates across one month of 2025-06 (string-comparable YYYYMMDD,
    # reference date filter filters.go:78-106 compares strings too)
    days = rng.integers(1, 31, size=rows)
    dates = np.char.add("202506", np.char.zfill(days.astype("U2"), 2))

    rs = _rand_fixed_strings(rng, rows, 8, _HEX)
    suffix = _rand_fixed_strings(rng, rows, 5, _ALNUM)
    blob = _rand_fixed_strings(rng, rows, 8, _HEX)

    services = np.array([SERVICE_BY_SOURCE[s] for s in SOURCES], dtype=object)[src_idx]
    containers = np.array(
        [CONTAINER_BY_SOURCE.get(s, DEFAULT_CONTAINER) for s in SOURCES], dtype=object
    )[src_idx]
    # mostly `default`, ~8% `apps`; zookeeper lives in `system`
    ns_roll = rng.random(rows)
    namespaces = np.where(ns_roll < 0.92, "default", "apps").astype(object)
    namespaces[sources == "zookeeper"] = "system"

    doc_id = (
        dates.astype(object)
        + "."
        + services
        + "-"
        + rs.astype(object)
        + "-"
        + suffix.astype(object)
        + "_"
        + namespaces
        + "_"
        + containers
        + "-"
        + blob.astype(object)
    )

    # malformed fraction: 40% underscores stripped, 40% truncated date, 20% empty
    bad_roll = rng.random(rows)
    bad = bad_roll < p_malformed
    kind = rng.random(rows)
    strip_mask = bad & (kind < 0.4)
    trunc_mask = bad & (kind >= 0.4) & (kind < 0.8)
    empty_mask = bad & (kind >= 0.8)
    if strip_mask.any():
        doc_id[strip_mask] = np.char.replace(doc_id[strip_mask].astype("U128"), "_", "").astype(object)
    if trunc_mask.any():
        doc_id[trunc_mask] = np.array(
            ["2025." + s[9:] for s in doc_id[trunc_mask]], dtype=object
        )
    if empty_mask.any():
        doc_id[empty_mask] = ""

    # log-normal token lengths in [1, MAX_TOKENS]
    n_tok = np.clip(rng.lognormal(mean=4.6, sigma=0.9, size=rows), 1, MAX_TOKENS).astype(np.int32)
    total = int(n_tok.astype(np.int64).sum())
    if total > np.iinfo(np.int32).max:
        raise ValueError(
            f"file {file_index}: {total} tokens exceed int32 list offsets — "
            "increase num_files so each file stays under 2^31 tokens"
        )
    values = rng.integers(0, VOCAB_SIZE, size=total, dtype=np.int32)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32)), pa.array(values))

    return pa.Table.from_arrays(
        [
            pa.array(doc_id.tolist(), type=pa.string()),
            tokens,
            pa.array(n_tok),
            pa.array(sources.tolist(), type=pa.string()),
        ],
        schema=SEQUENCES_SCHEMA,
    )


def generate_sequences(
    out_dir: str,
    rows: int,
    num_files: int = 8,
    seed: int = 42,
    p_malformed: float = 0.02,
    overwrite: bool = False,
) -> list[str]:
    """Write ``num_files`` Parquet files under ``out_dir``; returns paths.

    Idempotent: if the directory already holds the expected files (and
    ``overwrite`` is False) it is reused — generated inputs are cached per
    (rows, num_files, seed) by the callers.
    """
    import json

    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"part-{i:05d}.parquet") for i in range(num_files)]
    params = {"rows": rows, "num_files": num_files, "seed": seed, "p_malformed": p_malformed}
    params_path = os.path.join(out_dir, "_params.json")
    if not overwrite and all(os.path.exists(p) for p in paths):
        # cache hit only when the corpus was generated with the SAME params
        try:
            with open(params_path) as f:
                if json.load(f) == params:
                    return paths
        except (OSError, json.JSONDecodeError):
            pass
    per_file = [rows // num_files + (1 if i < rows % num_files else 0) for i in range(num_files)]
    for stale in os.listdir(out_dir):  # drop leftovers from a different layout
        if stale.endswith(".parquet") and os.path.join(out_dir, stale) not in paths:
            os.remove(os.path.join(out_dir, stale))
    for i, (path, n) in enumerate(zip(paths, per_file)):
        table = generate_file(i, n, seed=seed, p_malformed=p_malformed)
        pq.write_table(table, path, row_group_size=65536)
    with open(params_path, "w") as f:
        json.dump(params, f)
    return paths
