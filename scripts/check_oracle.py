"""Local stand-in for the driver's correctness gate: run every queries()
entry at the given sf and compare to oracle_sql() via DuckDB
(row count + columns + order-insensitive value comparison).

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df):
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    # a typo'd entry name must not green-light a run with zero checks
    unknown = sorted(set(only) - set(qs)) if only else []
    for u in unknown:
        failures.append(u)
        print(f"FAIL  {u}: no such queries() entry")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(got)} rows, cols={list(got.columns)})")
            continue
        try:
            want = normalize(con.execute(oracles[name]).fetchdf())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: oracle SQL raised {ex}")
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"columns {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        else:
            for c in got.columns:
                a, b = got[c].to_numpy(), want[c].to_numpy()
                import numpy as np

                # a dtype clash (e.g. str vs float) must FAIL the entry, not
                # crash the gate with an uncaught astype ValueError
                try:
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        eq = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9)
                    else:
                        eq = (a == b).all()
                except (ValueError, TypeError) as ex:
                    problems.append(f"col {c} incomparable dtypes {a.dtype}/{b.dtype}: {ex}")
                    continue
                if not eq:
                    bad = int((~(a == b)).sum()) if a.dtype == b.dtype else -1
                    problems.append(f"col {c} mismatch ({bad} rows) e.g. {a[:3]} vs {b[:3]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"PASS  {name} ({len(got)} rows)")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
