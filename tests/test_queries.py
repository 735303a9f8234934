"""Mirror of the driver's correctness gate: each queries() entry with an
oracle must match DuckDB on row count + sorted values (sf0.001)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )
    return c


def to_pandas(result):
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def oracle_names():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    return sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", oracle_names())
def test_query_matches_oracle(ray_session, con, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    got = normalize(to_pandas(entrymod.queries()[name](SF_DIR)))
    want = normalize(con.execute(entrymod.oracle_sql()[name]).fetchdf())
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    got_r, want_r = got.reset_index(drop=True), want.reset_index(drop=True)
    for col in want_r.columns:
        gl, wl = got_r[col].tolist(), want_r[col].tolist()
        assert gl == wl, f"{name}: column {col} differs: {gl[:5]} vs {wl[:5]}"


def test_rows_only_queries(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    rows_only = sorted(set(q) - set(entrymod.oracle_sql()))
    for name in rows_only:
        df = to_pandas(q[name](SF_DIR))
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    out = to_pandas(entrymod.entry())
    assert len(out) >= 1
