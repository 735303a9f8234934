"""Gate ONE named query against its DuckDB oracle (mirror's comparator).

Usage:
    python scripts/gate_one.py <query_name> [sf_dir] [num_cpus]
    # defaults: /root/testdata/sf0.001  8
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from scripts.mirror import TABLES, normalize, to_pandas  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    t0 = time.perf_counter()
    got = normalize(to_pandas(queries[name](sf_dir)))
    t_ray = time.perf_counter() - t0
    if name not in oracles:
        print(f"{name}: rows_only, {len(got)} rows ({t_ray:.1f}s)")
        print(got.head(8))
        ray.shutdown()
        return 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    t0 = time.perf_counter()
    want = normalize(con.execute(oracles[name]).fetchdf())
    t_sql = time.perf_counter() - t0

    problems = []
    if len(got) != len(want):
        problems.append(f"rows {len(got)} vs {len(want)}")
    else:
        for col in want.columns:
            if col not in got.columns:
                problems.append(f"missing col {col}")
                continue
            if got[col].dtype != want[col].dtype:
                problems.append(f"{col}: dtype {got[col].dtype} vs {want[col].dtype}")
            elif got[col].tolist() != want[col].tolist():
                bad = (got[col] != want[col])
                problems.append(f"{col}: values differ ({int(bad.sum())} rows)")
    if problems:
        print(f"{name}: FAIL  {'; '.join(problems)}  "
              f"(ray {t_ray:.1f}s, sql {t_sql:.1f}s)")
        print("got:", got.head(5), sep="\n")
        print("want:", want.head(5), sep="\n")
        ray.shutdown()
        return 1
    print(f"{name}: green, {len(got)} rows (ray {t_ray:.1f}s, sql {t_sql:.1f}s)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
