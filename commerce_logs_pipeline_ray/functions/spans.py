"""Span/trace assembly — merge partial span documents into one span per
(trace_id, span_id) with field-wise last-writer-wins.

Rebuilds the reference's designed trace-assembly semantics
(``pipeline/traces/model.go:30-49`` span document keyed trace_id+span_id;
``docs/pipeline_design.md:84-116`` merge of partial span docs: dedup on
``_id = trace_id+span_id``, latest non-null update wins PER FIELD).

Ray-Data-first shape: bucketed exchange on the span key (all updates of a
span co-locate in one coarse bucket), one vectorized pandas merge per
bucket.  Field-wise LWW is NOT order-insensitively combinable from plain
value rows — a per-batch combiner would need (value, order) pairs per field
to stay associative — so the exchange moves the update rows themselves;
buckets bound the per-task working set.  For extreme per-span fan-in, the
documented optimization is a per-batch combiner emitting per-field
(value, order) candidates.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset

from .relational import bucketed_group_reduce


def merge_spans(
    updates: Dataset,
    key_cols: list[str],
    order_cols: list[str],
    field_cols: list[str],
    count_name: str = "n_updates",
) -> Dataset:
    """Field-wise last-writer-wins merge of partial span updates.

    For each key group (``key_cols``, e.g. [trace_id, span_id]) the output
    row carries, per field in ``field_cols``, the value of the LATEST update
    (by ``order_cols``) in which that field was non-null — updates touch
    disjoint field subsets, so a later partial update must not null out a
    field it did not carry.  Adds ``count_name`` (updates merged) and the
    max of each order column.

    Equivalent SQL: ``last(f ORDER BY order) FILTER (WHERE f IS NOT NULL)``.
    """

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*key_cols, *order_cols], kind="stable")
        g = df.groupby(key_cols, sort=False, dropna=False)
        # pandas groupby.last() takes the last non-NA per column — exactly
        # the field-wise LWW rule over the time-sorted updates
        merged = g[field_cols].last()
        merged[count_name] = g.size()
        for oc in order_cols:
            merged[oc] = g[oc].max()
        return merged.reset_index()

    return bucketed_group_reduce(updates, key_cols, combine)
