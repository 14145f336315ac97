"""Local stand-in for the driver's correctness check: run every REGISTRY
query against its DuckDB oracle on a given sf dir and compare
(row count, column names/dtypes, order-insensitive values).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differ: ray={len(a)} sql={len(b)}")
        return problems
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        for c in bad_cols[:3]:
            i = int(np.nonzero(neq[c].values)[0][0])
            problems.append(f"value mismatch col={c} row={i}: ray={a[c].iloc[i]!r} sql={b[c].iloc[i]!r}")
    return problems


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    only = set(sys.argv[2:])
    failures = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            ray_res = spec.fn(sf_dir)
            if not isinstance(ray_res, pd.DataFrame):
                import pyarrow as pa

                from ray.data import Dataset

                if isinstance(ray_res, Dataset):
                    ray_res = ray_res.to_pandas()
                elif isinstance(ray_res, pa.Table):
                    ray_res = ray_res.to_pandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        if spec.sql is None:
            print(f"ok   {name}: rows={len(ray_res)} (rows-only, no SQL oracle)")
            continue
        # artifact-backed oracles hardcode the driver's sf0.01 artifact dir
        # (oracle SQL strings are static) — retarget them to THIS sf's
        # artifacts so the whole registry is checkable at any scale factor
        from commerce_logs_pipeline_ray.pipelines.queries import ORACLE_ARTIFACT_DIR
        from commerce_logs_pipeline_ray.sources.loglines_file import corpus_dir

        sql = spec.sql.replace(ORACLE_ARTIFACT_DIR, corpus_dir(sf_dir))
        try:
            sql_res = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: sql error {e}")
            failures += 1
            continue
        problems = compare(name, ray_res, sql_res)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: rows={len(ray_res)}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
