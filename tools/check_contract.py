"""Local emulation of the driver's correctness gate.

Runs each ``__ray_entry__.queries()[name](sf_dir)`` and the matching
``oracle_sql()[name]`` in DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, float tolerance).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    issues = []
    if sorted(got.columns) != sorted(want.columns):
        issues.append(f"columns differ: ray={sorted(got.columns)} sql={sorted(want.columns)}")
        return issues
    if len(got) != len(want):
        issues.append(f"row count differs: ray={len(got)} sql={len(want)}")
        return issues
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            if not np.allclose(g[c].to_numpy(), w[c].to_numpy(), atol=1e-9, equal_nan=True):
                issues.append(f"float column {c} differs (max abs diff "
                              f"{np.abs(g[c].to_numpy() - w[c].to_numpy()).max()})")
        else:
            if not g[c].equals(w[c]):
                bad = (g[c] != w[c]).to_numpy().nonzero()[0][:3]
                issues.append(f"column {c} differs at rows {bad}: "
                              f"ray={g[c].iloc[bad].tolist()} sql={w[c].iloc[bad].tolist()}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: ray pipeline raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        want = con.sql(oracles[name]).df()
        issues = compare(name, got, want)
        if issues:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s):")
            for i in issues:
                print(f"     - {i}")
        else:
            print(f"PASS {name}: {len(got)} rows match oracle ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
