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
    # width-canonicalize numerics the way the driver does (int32 vs
    # int64 hashed equal in r04: q13) but do NOT coerce object/Decimal
    # columns (DuckDB DECIMAL(38,0) vs int64 hashed DIFFERENT: q12/q21)
    # — so the dtype-strict assert below predicts the driver's gate.
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
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
        # dtype-STRICT: the driver's value hash is type-sensitive
        # (DuckDB windowed sum(BIGINT) -> DECIMAL(38,0)/HUGEINT bit the
        # q12/q21 gates while a tolist() compare stayed green), so the
        # mirror must reject dtype divergence too
        gd, wd = got_r[col].dtype, want_r[col].dtype
        assert gd == wd, f"{name}: column {col} dtype {gd} vs oracle {wd}"
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


def test_q8_missing_custkey_drops(ray_session, tmp_path):
    """An order whose custkey is absent from customer must DROP (inner
    semantics, matching the SQL oracle) — the broadcast searchsorted
    lookup must not silently read a neighboring customer's nation."""
    import numpy as np
    import pyarrow.parquet as pq

    from osm2geojson_ray.queries import Q8_SQL, q8_nation_revenue

    d = tmp_path
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 70.0, 30.0]),
        "l_discount": pa.array([0.0, 0.1, 0.0, 0.0]),
    }), str(d / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        # custkey 99 is missing from customer; 11 sorts right after 10
        "o_custkey": pa.array([10, 99, 11], pa.int64()),
    }), str(d / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int64()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
    }), str(d / "nation.parquet"))

    got = q8_nation_revenue(str(d)).to_pandas().sort_values("n_name")
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d / t}.parquet')")
    want = c.execute(Q8_SQL).fetchdf().sort_values("n_name")
    assert got["n_name"].tolist() == want["n_name"].tolist() == ["ALPHA", "BETA"]
    assert got["revenue_cents"].tolist() == want["revenue_cents"].tolist()
    assert got["n_rows"].tolist() == want["n_rows"].tolist()
