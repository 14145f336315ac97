"""Optional record validation — reference ``extractor.go:503-561`` /
``service.go:253-269`` ("validate after extract; failures to the error
channel unless skip_invalid is set").

Validation is semantic (the regex grammar already passed): implausible
dates, token-count inconsistencies, unknown blank fields.  Failing rows get
``parse_ok=False`` + ``error_type="validation_error"`` so the existing
route/error machinery carries them — no special-case downstream.

All checks are vectorized Arrow kernels on already-parsed columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

ERROR_TYPE_VALIDATION = "validation_error"


def validate_batch(t: pa.Table) -> pa.Table:
    ok = t["parse_ok"]

    date = t["date"]
    month = pc.utf8_slice_codeunits(date, 4, 6)
    day = pc.utf8_slice_codeunits(date, 6, 8)
    date_ok = pc.and_kleene(
        pc.and_kleene(pc.greater_equal(month, "01"), pc.less_equal(month, "12")),
        pc.and_kleene(pc.greater_equal(day, "01"), pc.less_equal(day, "31")),
    )

    n_tok_ok = pc.greater_equal(t["n_tok"], pa.scalar(1, pa.int32()))
    # n_tok must equal the physical token-list length
    lens = pc.list_value_length(t["tokens"])
    len_ok = pc.equal(pc.cast(lens, pa.int32()), t["n_tok"])

    valid = pc.and_kleene(pc.and_kleene(date_ok, n_tok_ok), len_ok)
    valid = pc.fill_null(valid, False)

    # only previously-OK rows can fail validation; keep original error_type
    newly_bad = pc.and_(pc.fill_null(ok, False), pc.invert(valid))
    new_ok = pc.and_(pc.fill_null(ok, False), valid)
    error_type = pc.if_else(
        newly_bad, pa.scalar(ERROR_TYPE_VALIDATION, pa.string()), t["error_type"]
    )

    t = t.set_column(t.column_names.index("parse_ok"), "parse_ok", new_ok)
    t = t.set_column(t.column_names.index("error_type"), "error_type", error_type)
    return t
