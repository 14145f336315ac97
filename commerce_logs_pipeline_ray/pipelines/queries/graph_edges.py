"""Shared co-purchase edge artifact for the graph query family.

Every graph query over the item co-purchase graph (degree histogram, pair
mining, triangles, clustering coefficient, k-core, SSSP, link prediction,
random walks, assortativity) needs the same edge list: distinct part pairs
bought together in one order, weighted by how many orders contain the pair.
Before round 5 each query re-ran the identical per-order pair exchange;
now the exchange runs ONCE per sf-dir and everything reads the Parquet
artifact (VERDICT r4, next-round item #3).
"""
from __future__ import annotations

import os as _os
import shutil as _shutil
import uuid as _uuid

import pandas as pd

import ray.data as rd

from ...functions.relational import bucketed_group_reduce, grouped_sums
from ...sources.loglines_file import corpus_dir as _corpus_dir
from ._base import _t


def _pair_counts_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Per-order pair combiner: distinct parts per order self-merged into
    canonical (a < b) pairs with in-bucket order multiplicity.  Pair blow-up
    is bounded by order width² — never corpus-quadratic."""
    df = df.drop_duplicates()
    m = df.merge(df, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    g = m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()
    return g.rename(columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b", "size": "c"})


def ensure_copurchase_edges_parquet(sf_dir: str) -> str:
    """Materialize (part_a < part_b, c = #orders containing the pair) once.

    Built by the engine's own distributed pipeline — per-order pair
    combiners inside a bucketed exchange, then the global pair reduce — and
    streamed to Parquet with ``Dataset.write_parquet`` (no driver
    materialization).  At 100-TB scale this is the shared-intermediate
    pattern: materialize the graph once, partitioned, and fan every
    per-algorithm pass off the artifact instead of re-running the same
    all-to-all exchange N times."""
    out = _os.path.join(_corpus_dir(sf_dir), "copurchase_edges.parquet")
    if _os.path.exists(out):
        return out
    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    edges = grouped_sums(
        bucketed_group_reduce(ds, ["l_orderkey"], _pair_counts_per_bucket),
        ["part_a", "part_b"], {"c": "c"},
    )
    tmp = out + f".tmp-{_uuid.uuid4().hex}"
    edges.write_parquet(tmp)
    try:
        _os.replace(tmp, out)
    except OSError:
        # lost a concurrent build race — the winner's artifact is equivalent
        if not _os.path.exists(out):
            raise
        _shutil.rmtree(tmp, ignore_errors=True)
    return out


def copurchase_edges_ds(sf_dir: str, with_count: bool = True) -> rd.Dataset:
    """Dataset view of the shared edge artifact (column-pruned read)."""
    cols = ["part_a", "part_b"] + (["c"] if with_count else [])
    return rd.read_parquet(ensure_copurchase_edges_parquet(sf_dir), columns=cols)
