"""Standalone full-surface mirror of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB
oracle at an arbitrary scale factor / cpu count, with the SAME
dtype-strict comparison as tests/test_queries.py (the driver's value
hash is type-sensitive).  Rows-only queries (no oracle) are executed
and row-counted.

Usage:
    python scripts/mirror.py [sf_dir] [num_cpus]
    # defaults: /root/testdata/sf0.01  32
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )

    n_green = n_rows_only = n_fail = 0
    t_all = time.perf_counter()
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            got = normalize(to_pandas(queries[name](sf_dir)))
            if name not in oracles:
                n_rows_only += 1
                print(f"  {name:40s} rows_only  {len(got):>8d} rows   "
                      f"{time.perf_counter() - t0:6.1f}s")
                continue
            want = normalize(con.execute(oracles[name]).fetchdf())
            problems = []
            if len(got) != len(want):
                problems.append(f"rows {len(got)} vs {len(want)}")
            else:
                for col in want.columns:
                    if col not in got.columns:
                        problems.append(f"missing col {col}")
                        continue
                    gd, wd = got[col].dtype, want[col].dtype
                    if gd != wd:
                        problems.append(f"{col}: dtype {gd} vs {wd}")
                    elif got[col].tolist() != want[col].tolist():
                        problems.append(f"{col}: values differ")
            if problems:
                n_fail += 1
                print(f"  {name:40s} FAIL  {'; '.join(problems)}")
            else:
                n_green += 1
                print(f"  {name:40s} green      {len(got):>8d} rows   "
                      f"{time.perf_counter() - t0:6.1f}s")
        except Exception as exc:  # noqa: BLE001 - report and continue
            n_fail += 1
            print(f"  {name:40s} ERROR {type(exc).__name__}: {exc}")
    total = time.perf_counter() - t_all
    print(f"\n{sf_dir} @ {num_cpus} cpus: {n_green} green, "
          f"{n_rows_only} rows_only, {n_fail} FAIL "
          f"of {len(queries)}  ({total:.0f}s)")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
