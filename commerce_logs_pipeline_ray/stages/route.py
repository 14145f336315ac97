"""Route stage — predicate fan-out to named sinks.

Rebuilds the reference's two routing layers as one vectorized sink-assignment
over parsed/enriched columns:

* raw routing: selector containing "proxy" → ``Raw.ProxyLogs`` else
  ``Raw.ApplicationLogs`` (``processor.go:36-41``, SURVEY §2.4 R1);
* extracted-type routing incl. the error channel ``Extraction.Errors``
  (``service.go:312-344,405-444``, SURVEY §2.4 R2);
* the selector predicate registry — named predicates referenced by
  configuration (``selectors.go:84-186``, SURVEY §2.10).

Predicates are ordered first-match-wins, mirroring the reference's explicit
if/else dispatch.  The registry is data (name → predicate fn), so user code
can register additional sinks without touching the engine.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

SinkPredicate = Callable[[pa.Table], pa.ChunkedArray]


def _p_errors(t: pa.Table):
    return pc.invert(t["parse_ok"])


def _p_proxy(t: pa.Table):
    return pc.equal(t["container"], "proxy")


def _p_infra(t: pa.Table):
    return pc.or_kleene(pc.equal(t["namespace"], "system"), pc.equal(t["source"], "zookeeper"))


def _p_background(t: pa.Table):
    return pc.is_in(
        t["source"], value_set=pa.array(["background-processing", "imageprocessing"])
    )


def _p_frontend(t: pa.Table):
    return pc.equal(t["source"], "jsapps")


def _p_application(t: pa.Table):
    return pa.array([True] * len(t))


# first-match-wins, like the reference's selector dispatch (selectors.go:84-186)
SINK_REGISTRY: list[tuple[str, SinkPredicate]] = [
    ("errors", _p_errors),
    ("proxy", _p_proxy),
    ("infra", _p_infra),
    ("background", _p_background),
    ("frontend", _p_frontend),
    ("application", _p_application),
]


def route_batch(t: pa.Table, *, registry: list[tuple[str, SinkPredicate]] | None = None) -> pa.Table:
    """Append a ``sink`` column (first matching predicate wins)."""
    registry = registry if registry is not None else SINK_REGISTRY
    sink = pa.nulls(len(t), pa.string())
    unassigned = pa.array([True] * len(t))
    for name, predicate in registry:
        mask = pc.fill_null(predicate(t), False)
        assign = pc.and_(unassigned, mask)
        sink = pc.if_else(assign, pa.scalar(name, pa.string()), sink)
        unassigned = pc.and_(unassigned, pc.invert(assign))
    return t.append_column("sink", sink)
