"""Query registry: every implemented operator/pipeline exposed as a
``(sf_dir) -> result`` callable plus (where expressible) an equivalent
DuckDB oracle SQL string.

This is the correctness surface the driver checks at sf=0.01
(row-count + schema + order-insensitive value-hash), covering SURVEY.md §2:
aggregations (A1/A2/A5), filters (F1-F4), regex parse (M4/M11), broadcast
enrichment joins (J1/ST2), routing fan-out (R1/R2/F6), last-state-per-key
compaction (A6/S5), top-k (§2.8), plus the training-data operators (dedup,
text analysis, similarity search).

Conventions for oracle parity:
* aggregate / computed columns carry the SAME name in Ray and SQL;
* double aggregates are rounded identically on both sides (ROUND(x, 2|6));
* int results normalized to int64;
* deterministic tie-breaks on every top-k (secondary unique keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from datetime import datetime
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd

from ...functions.relational import broadcast_join, grouped_sums, last_by_key, topk
from ...functions.text import STOPWORD_PATTERN, md5_hex, n_words, quality_batch
from ...sources.sequences import MALFORM_MOD, MALFORM_REM, docs_tenant, sid_column
from ...sources.loglines_file import corpus_dir as _corpus_dir

# versioned /tmp dir whose artifacts the static oracle SQL reads (the
# driver's correctness checks run at sf0.01)
ORACLE_ARTIFACT_DIR = _corpus_dir("/root/testdata/sf0.01")
from ...stages.aggregate import final_agg, partial_agg
from ...stages.parse import parse_batch
from ...stages.route import route_batch


@dataclass
class QuerySpec:
    fn: Callable[[str], Any]
    sql: str | None
    description: str = ""


def _t(sf_dir: str, name: str, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """Column-pruned read with block count sized to the file, not Ray's
    default fan-out: ~32 MB/block for byte-heavy tables, but with a floor of
    ~8 blocks when there are enough rows — CPU-heavy per-row stages (minhash,
    extraction) serialize badly on a single block, while Ray's default
    64-way split of tiny files drowns cheap aggregates in task overhead."""
    import os as _os

    import pyarrow.parquet as _pq
    import ray as _ray

    path = f"{sf_dir}/{name}.parquet"
    if "override_num_blocks" not in kw:
        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        rows = _pq.ParquetFile(path).metadata.num_rows
        by_bytes = _os.path.getsize(path) // (32 << 20) + 1
        floor = min(8, max(1, rows // 500))
        blocks = max(1, min(max(by_bytes, floor), 4 * cpus))
        kw["override_num_blocks"] = int(blocks)
    return rd.read_parquet(path, columns=columns, **kw)


def _i64(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].astype("int64")
    return df


from ...functions.rounding import round_like_duckdb as _rd


