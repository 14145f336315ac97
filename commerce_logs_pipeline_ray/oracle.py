"""Row-at-a-time pure-Python oracle for parse → enrich → route → aggregate.

Deliberately simple and sequential — a faithful stand-in for the Go
reference's per-message semantics (SURVEY.md §5: extractor dispatch
``extractor.go:42-66``, header enrichment ``service.go:284-309``, selector
routing ``selectors.go:84-186`` / ``processor.go:36-41``, per-key counts
``blob_state_processor.go:231-260``).  Every Ray pipeline result is asserted
against this oracle in pytest: per-sink aggregate-count equality,
routed-row-set equality, per-row token-array bit-exactness (BASELINE.json
invariants).
"""

from __future__ import annotations

import re
from collections import defaultdict
from dataclasses import dataclass, field

from .functions.hashing import fnv1a32_single
from .schema import (
    DOC_ID_PATTERN,
    ERROR_TYPE_EMPTY,
    ERROR_TYPE_MALFORMED,
    N_TOK_BUCKET_WIDTH,
    NUM_LOGICAL_PARTITIONS,
    POD_PATTERN,
)
from .stages.enrich import build_source_dict

_DOC_RE = re.compile(DOC_ID_PATTERN)
_POD_RE = re.compile(POD_PATTERN)


@dataclass
class OracleResult:
    rows_by_sink: dict[str, list[dict]] = field(default_factory=lambda: defaultdict(list))
    # (sink, source, tenant, n_tok_bucket) -> [row_count, token_count]
    agg: dict[tuple, list[int]] = field(default_factory=lambda: defaultdict(lambda: [0, 0]))

    def doc_ids_by_sink(self) -> dict[str, set]:
        return {s: {r["doc_id"] for r in rows} for s, rows in self.rows_by_sink.items()}


def run_oracle(
    rows: list[dict],
    sources: list[str] | None = None,
    bucket_width: int = N_TOK_BUCKET_WIDTH,
    num_partitions: int = NUM_LOGICAL_PARTITIONS,
    validate: bool = False,
) -> OracleResult:
    """rows: dicts with doc_id/tokens/n_tok/source (e.g. ``table.to_pylist()``)."""
    dim = build_source_dict(sources)
    lookup = {
        s: {
            "tenant": dim["tenant"][i],
            "environment": dim["environment"][i],
            "service_display": dim["service_display"][i],
            "raw_topic": dim["raw_topic"][i],
        }
        for i, s in enumerate(dim["source"])
    }

    out = OracleResult()
    for row in rows:
        doc_id = row["doc_id"] or ""
        source = row["source"]
        r = dict(row)

        # --- parse (extractor.go:42-66 dispatch; selectors.go:20-71 grammar)
        m = _DOC_RE.match(doc_id)
        pod_m = _POD_RE.match(m.group("pod")) if m else None
        ok = bool(m and pod_m)
        if ok:
            r.update(
                date=m.group("date"),
                pod=m.group("pod"),
                namespace=m.group("namespace"),
                container=m.group("container"),
                blob=m.group("blob"),
                service=pod_m.group("service"),
                error_type=None,
            )
        else:
            r.update(
                date=None, pod=None, namespace=None, container=None, blob=None,
                service=None,
                error_type=ERROR_TYPE_EMPTY if doc_id == "" else ERROR_TYPE_MALFORMED,
            )
        # --- optional semantic validation (extractor.go:503-561)
        if validate and ok:
            date = r["date"]
            month, day = date[4:6], date[6:8]
            v = (
                "01" <= month <= "12"
                and "01" <= day <= "31"
                and int(row["n_tok"]) >= 1
                and len(row["tokens"]) == int(row["n_tok"])
            )
            if not v:
                ok = False
                r["parse_ok"] = False
                r["error_type"] = "validation_error"
        r["parse_ok"] = ok
        r["partition_id"] = fnv1a32_single(doc_id) % num_partitions

        # --- enrich (service.go:284-309)
        meta = lookup.get(source)
        for k in ("tenant", "environment", "service_display", "raw_topic"):
            r[k] = meta[k] if meta else None

        # --- route (first match wins; selectors.go:84-186, processor.go:36-41)
        if not ok:
            sink = "errors"
        elif r["container"] == "proxy":
            sink = "proxy"
        elif r["namespace"] == "system" or source == "zookeeper":
            sink = "infra"
        elif source in ("background-processing", "imageprocessing"):
            sink = "background"
        elif source == "jsapps":
            sink = "frontend"
        else:
            sink = "application"
        r["sink"] = sink
        r["raw"] = doc_id if sink == "errors" else None

        out.rows_by_sink[sink].append(r)

        # --- aggregate (A2/A5 per-sink counts)
        key = (sink, source, r["tenant"], int(row["n_tok"]) // bucket_width)
        acc = out.agg[key]
        acc[0] += 1
        acc[1] += int(row["n_tok"])
    return out
