"""Enrich stage — broadcast dimension lookup in a stateful actor pool.

The reference attaches ``LogSource{service, environment, subscription}``
metadata to every output record from message headers
(``pipeline/extraction/internal/service/service.go:284-309``; headers set at
``pipeline/ingest/internal/ingestion/processor.go:193-202``) — effectively a
hash join of every row against a tiny dimension table keyed on the source
(SURVEY.md §2.6 J1/ST2).

Ray-Data expression: the dimension table is ``ray.put`` once on the driver;
``Enricher`` is a callable CLASS passed to ``map_batches(Enricher,
concurrency=N)`` so each actor dereferences the broadcast object exactly once
in ``__init__`` (zero-copy out of the object store) and every batch does a
vectorized Arrow ``index_in`` + ``take`` — never a shuffle, never a re-ship
per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fnv1a32_single
from ..schema import SOURCES

ENRICH_COLUMNS = ["tenant", "environment", "service_display", "raw_topic"]

_TENANTS = ["cp1", "cp2", "cp3"]
_ENVIRONMENTS = ["P1", "D1", "S1"]


def build_source_dict(sources: list[str] | None = None) -> dict[str, list[str]]:
    """Deterministic dimension table keyed on ``source`` (FIXTURES.md §2).

    tenant/environment assignment is a stable function of the source name so
    the DuckDB oracle can reproduce it; ``raw_topic`` follows the reference's
    raw-routing rule — selector name containing "proxy" → ``Raw.ProxyLogs``,
    else ``Raw.ApplicationLogs`` (``processor.go:36-41``).
    """
    sources = list(sources) if sources is not None else list(SOURCES)
    rows: dict[str, list[str]] = {c: [] for c in ["source", *ENRICH_COLUMNS]}
    for s in sources:
        h = fnv1a32_single(s)
        rows["source"].append(s)
        rows["tenant"].append(_TENANTS[h % 3])
        rows["environment"].append(_ENVIRONMENTS[(h >> 8) % 3])
        rows["service_display"].append(s.replace("-", " ").title())
        rows["raw_topic"].append("Raw.ProxyLogs" if "proxy" in s else "Raw.ApplicationLogs")
    return rows


class Enricher:
    """Actor-pool stage: dictionary join on ``source``.

    ``lookup`` may be a plain dict-of-lists or a ``ray.ObjectRef`` to one
    (the broadcast path); dereferenced once per actor.
    """

    def __init__(self, lookup=None):
        import ray

        if lookup is None:
            lookup = build_source_dict()
        if isinstance(lookup, ray.ObjectRef):
            lookup = ray.get(lookup)
        self.keys = pa.array(lookup["source"], type=pa.string())
        self.columns = {c: pa.array(lookup[c], type=pa.string()) for c in ENRICH_COLUMNS}

    def __call__(self, t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["source"], value_set=self.keys)  # null for unknown source
        out = t
        for name, values in self.columns.items():
            out = out.append_column(name, pc.take(values, idx))
        return out
