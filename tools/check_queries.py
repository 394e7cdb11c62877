"""Local driver-mimic: run each registry query AND its DuckDB oracle SQL on
the same sf dir, compare row count + schema + values (order-insensitive,
columns sorted by name) — a stand-in for the driver's CORRECTNESS check.

Usage: python tools/check_queries.py [--strict] [sf_dir] [query ...]

--strict additionally requires IDENTICAL pandas dtypes and a dtype-sensitive
value hash between the engine result (``Dataset.to_pandas()``) and the
oracle (``duckdb .df()``) — the representation-level equality the driver's
hash_match evidently checks (CORRECTNESS_r01 ``gaps``: values equal, hash
differed on Int64/pd.NA vs float64/NaN).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res):
    import ray.data
    import pyarrow as pa
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            continue
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("Float64")
        else:
            df[c] = df[c].astype("string")
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort",
                        na_position="last", ignore_index=True)
    return df


def strict_norm(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-mimic canonicalization: sort columns by name + rows by value,
    but keep dtypes exactly as fetched (no numeric coercion)."""
    df = df[sorted(df.columns)].copy()
    key = df.astype(str)
    order = key.sort_values(list(key.columns), kind="mergesort",
                            na_position="last").index
    return df.loc[order].reset_index(drop=True)


def main():
    argv = [a for a in sys.argv[1:]]
    strict = "--strict" in argv
    if strict:
        argv.remove("--strict")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from abslog_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            raw_got = to_pandas(fn(sf_dir))
            got = norm(raw_got)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            continue
        t_ray = time.time() - t0
        if sql is None:
            print(f"ok   {name}: rows-only, {len(got)} rows "
                  f"({t_ray:.1f}s ray)")
            continue
        t0 = time.time()
        try:
            raw_want = con.execute(sql).df()
            want = norm(raw_want)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: sql error: {e}")
            continue
        t_sql = time.time() - t0
        status = "ok  "
        if len(got) != len(want):
            status = "FAIL"
            detail = f"rows {len(got)} vs {len(want)}"
        elif sorted(got.columns) != sorted(want.columns):
            status = "FAIL"
            detail = f"cols {sorted(got.columns)} vs {sorted(want.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False)
                detail = f"{len(got)} rows"
                if strict:
                    sg, sw = strict_norm(raw_got), strict_norm(raw_want)
                    if [str(t) for t in sg.dtypes] != \
                            [str(t) for t in sw.dtypes]:
                        status = "FAIL"
                        detail = (f"strict dtypes {list(map(str, sg.dtypes))}"
                                  f" vs {list(map(str, sw.dtypes))}")
                    else:
                        try:
                            pd.testing.assert_frame_equal(
                                sg, sw, check_dtype=True, check_exact=True)
                            detail += " [strict]"
                        except AssertionError as e:
                            status = "FAIL"
                            detail = ("strict values differ: "
                                      + str(e).split("\n")[0])
            except AssertionError as e:
                status = "FAIL"
                detail = "values differ: " + str(e).split("\n")[0]
                # show a few mismatching rows
                neq = (got.fillna("<NA>").astype(str)
                       != want.fillna("<NA>").astype(str)).any(axis=1)
                print(got[neq].head(3).to_string())
                print(want[neq].head(3).to_string())
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: {detail} ({t_ray:.1f}s ray, {t_sql:.1f}s sql)")

    print("\nFAILURES:", failures or "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
