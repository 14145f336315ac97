"""Parse stage — vectorized grok/regex parse of the structured ``doc_id``.

Rebuilds the reference's classify-then-parse front end as ONE stateless
``map_batches(batch_format="pyarrow")`` stage:

* blob-name grammar split (`selectors.go:20-71` — date / pod / namespace /
  container / hash via last-dash & underscore splitting) →
  ``pc.extract_regex`` with the RE2 grammar in ``schema.DOC_ID_PATTERN``;
* service-name-from-pod normalizer (`extractor.go:24,176-184`, regex
  ``^([a-z-]+?)(?:-[a-f0-9]+)?-[a-z0-9]+$``) → second ``extract_regex``;
* the nil-sentinel skip channel (`extractor.go:151-154,287-311` returns
  ``(nil, nil)`` to silently drop) → an explicit ``parse_ok`` mask +
  ``error_type`` column, so failed rows flow to the ``errors`` sink instead
  of vanishing (counts close; FIXTURES.md §3b invariant);
* FNV32a(key) % P partition lineage (`processor.go:29-33`) → ``partition_id``.

``tokens`` is untouched: the output table reuses the input column buffers
(zero-copy append of derived columns only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import fnv1a32
from ..schema import (
    DOC_ID_PATTERN,
    ERROR_TYPE_EMPTY,
    ERROR_TYPE_MALFORMED,
    NUM_LOGICAL_PARTITIONS,
    POD_PATTERN,
)

PARSE_FIELDS = ["date", "pod", "namespace", "container", "blob"]


def parse_batch(
    t: pa.Table,
    *,
    num_partitions: int = NUM_LOGICAL_PARTITIONS,
) -> pa.Table:
    doc = t["doc_id"]

    ex = pc.extract_regex(doc, DOC_ID_PATTERN)  # null struct on non-match
    ok = pc.is_valid(ex)

    pod = pc.struct_field(ex, "pod")
    ex2 = pc.extract_regex(pod, POD_PATTERN)
    ok = pc.and_kleene(ok, pc.is_valid(ex2))
    ok = pc.fill_null(ok, False)

    def _field(struct_arr, name):
        v = pc.struct_field(struct_arr, name)
        return pc.if_else(ok, v, pa.scalar(None, pa.string()))

    date = _field(ex, "date")
    namespace = _field(ex, "namespace")
    container = _field(ex, "container")
    blob = _field(ex, "blob")
    pod_col = _field(ex, "pod")
    service = _field(ex2, "service")

    empty = pc.equal(pc.fill_null(doc, ""), "")
    error_type = pc.if_else(
        ok,
        pa.scalar(None, pa.string()),
        pc.if_else(empty, ERROR_TYPE_EMPTY, ERROR_TYPE_MALFORMED),
    )

    # one FNV pass reused for partition lineage AND aggregation salting
    key_hash = fnv1a32(doc).astype(np.int64)
    partition_id = pa.array((key_hash % num_partitions).astype(np.int32))

    out = t
    for name, col in [
        ("key_hash", pa.array(key_hash)),
        ("date", date),
        ("service", service),
        ("pod", pod_col),
        ("namespace", namespace),
        ("container", container),
        ("blob", blob),
        ("parse_ok", ok),
        ("error_type", error_type),
        ("partition_id", partition_id),
    ]:
        out = out.append_column(name, col)
    return out
