"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001.

    Derives the canonical sequences payload (doc_id/tokens/n_tok/source)
    from the documents table, runs the full checkpointed
    parse → enrich → route → aggregate pipeline, and returns the final
    per-sink aggregate table.
    """
    import pyarrow.parquet as pq

    from commerce_logs_pipeline_ray.pipelines.flagship import PipelineConfig, run_flagship
    from commerce_logs_pipeline_ray.sources.sequences import derive_sequences

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    seq = derive_sequences(docs)
    workdir = tempfile.mkdtemp(prefix="clp_entry_")
    in_dir = os.path.join(workdir, "in")
    os.makedirs(in_dir, exist_ok=True)
    pq.write_table(seq, os.path.join(in_dir, "part-00000.parquet"))
    sources = sorted(set(docs.column("source").to_pylist()))
    res = run_flagship(
        PipelineConfig(
            input_dir=in_dir,
            output_dir=os.path.join(workdir, "out"),
            sources=sources,
            enrich_concurrency=2,
        )
    )
    return res.aggregates.to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY

    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check).

    Some oracles read materialized /tmp artifacts (shared line corpus,
    derived-sequences parquet, reference packing/fingerprints); those are
    written here so they exist whichever side the driver runs first."""
    from commerce_logs_pipeline_ray.pipelines.queries import (
        REGISTRY,
        prematerialize_oracle_artifacts,
    )

    prematerialize_oracle_artifacts()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}
