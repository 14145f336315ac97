"""Local stand-in for the driver's correctness check: run every REGISTRY
query against its DuckDB oracle on a given sf dir and compare
(row count, column names, per-column dtype STRICTLY, order-insensitive
values).

Dtype strictness matters: DuckDB returns SUM(<integer>) as HUGEINT which
pandas converts to float64 — if the Ray side emits int64 the values compare
equal but a dtype-sensitive hash (the driver's) diverges.  This checker
treats any int-vs-float (or other kind) dtype disagreement as a failure so
the whole registry meets the driver's bar, not a softer local one.

Usage: python tools/check_queries.py [--exact] [sf_dir] [query ...]

  --exact   compare float64 columns bitwise (uint64 views; NaN==NaN) instead
            of round-to-9-decimals.  This is the strongest possible value
            check: it fails on any last-bit divergence (sum ordering,
            rounding-convention mismatches) the driver's value hash would
            also fail on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame, exact: bool) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
            if not exact:
                df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _kind(dt) -> str:
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return str(dt)


def compare(
    name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame, exact: bool = False
) -> list[str]:
    problems = []
    a, b = normalize(ray_df, exact), normalize(sql_df, exact)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns differ: ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differ: ray={len(a)} sql={len(b)}")
        return problems
    # strict per-column dtype check — int64 vs float64 is a FAILURE even if
    # every value compares numerically equal (a dtype-sensitive hash differs)
    for c in a.columns:
        ka, kb = _kind(a[c].dtype), _kind(b[c].dtype)
        if ka != kb:
            problems.append(f"dtype mismatch col={c}: ray={a[c].dtype} sql={b[c].dtype}")
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if _kind(av.dtype) == "float":
            x = av.to_numpy(dtype=np.float64)
            y = bv.to_numpy(dtype=np.float64)
            if exact:
                eq = x.view(np.uint64) == y.view(np.uint64)
                eq |= np.isnan(x) & np.isnan(y)  # tolerate NaN payload diffs
            else:
                eq = (x == y) | (np.isnan(x) & np.isnan(y))
            if not eq.all():
                i = int(np.nonzero(~eq)[0][0])
                problems.append(
                    f"value mismatch col={c} row={i}: "
                    f"ray={x[i]!r} ({x[i].hex()}) sql={y[i]!r} ({y[i].hex()})"
                )
        else:
            neq = (av != bv) & ~(av.isna() & bv.isna())
            if neq.any():
                i = int(np.nonzero(neq.values)[0][0])
                problems.append(
                    f"value mismatch col={c} row={i}: ray={av.iloc[i]!r} sql={bv.iloc[i]!r}"
                )
    return problems[:4]


def main() -> int:
    import ray

    args = [x for x in sys.argv[1:] if x != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("CHECK_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from commerce_logs_pipeline_ray.pipelines.queries import REGISTRY

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    only = set(args[1:])
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
        problems = compare(name, ray_res, sql_res, exact=exact)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: rows={len(ray_res)}")
    ray.shutdown()
    print(f"-- {failures} failures --")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
