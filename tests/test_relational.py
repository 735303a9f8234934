"""Unit tests for the relational primitives: the hash-exchange shuffle,
the partitioned hash join, distinct/count, and block coalescing."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa

import ray.data

from osm2geojson_ray.relational import (
    coalesce_blocks,
    distinct_on,
    grouped_count,
    hash_exchange_map,
    hash_join,
)


def _ds(tbl: pa.Table, blocks: int = 4):
    return ray.data.from_arrow(tbl, override_num_blocks=blocks)


def test_hash_exchange_partitions_by_key(ray_session):
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 1000, 5000).astype(np.int64)
    vals = rng.randint(0, 10, 5000).astype(np.int64)
    ds = _ds(pa.table({"k": keys, "v": vals}), blocks=7)

    def check(t: pa.Table) -> pa.Table:
        ks = t["k"].to_numpy(zero_copy_only=False)
        parts = set((ks % 8).tolist())
        assert len(parts) <= 1  # every row in a partition shares k % P
        return pa.table({"k": ks, "v": t["v"]})

    out = hash_exchange_map(ds, "k", 8, check)
    rows = out.take_all()
    got = sorted((r["k"], r["v"]) for r in rows)
    want = sorted(zip(keys.tolist(), vals.tolist()))
    assert got == want  # exchange is a permutation, nothing lost


def test_hash_exchange_pandas_format_and_part_column(ray_session):
    ds = _ds(pa.table({"k": pa.array([1, 2, 3, 9, 10], pa.int64())}), blocks=2)

    def fn(df):
        assert "__part" in df.columns
        assert (df["k"] % 4 == df["__part"]).all()
        return df[["k"]]

    out = hash_exchange_map(ds, "k", 4, fn, fn_format="pandas")
    assert sorted(r["k"] for r in out.take_all()) == [1, 2, 3, 9, 10]


def test_hash_exchange_empty_input(ray_session):
    ds = ray.data.from_arrow(pa.schema([("k", pa.int64())]).empty_table())
    assert hash_exchange_map(ds, "k", 4, lambda t: t) is None


def test_hash_join_matches_pandas(ray_session):
    rng = np.random.RandomState(3)
    lk = rng.randint(0, 50, 300).astype(np.int64)
    rk = rng.randint(25, 75, 200).astype(np.int64)
    left = pa.table({"k": lk, "lv": np.arange(300, dtype=np.int64)})
    right = pa.table({"k": rk, "rv": np.arange(200, dtype=np.int64)})
    l_schema = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
    r_schema = pa.schema([("k", pa.int64()), ("rv", pa.int64())])

    ldf = left.to_pandas()
    rdf = right.to_pandas()

    for how, pandas_how in (("inner", "inner"), ("left_outer", "left")):
        got = hash_join(_ds(left), _ds(right), on="k", l_schema=l_schema,
                        r_schema=r_schema, how=how, num_partitions=8).take_all()
        want = ldf.merge(rdf, on="k", how=pandas_how)
        got_sorted = sorted(
            (r["k"], r["lv"], r["rv"] if r["rv"] is not None else -1) for r in got
        )
        want_sorted = sorted(
            (int(k), int(lv), int(rv) if pd.notna(rv) else -1)
            for k, lv, rv in want[["k", "lv", "rv"]].itertuples(index=False)
        )
        assert got_sorted == want_sorted, how

    anti = hash_join(_ds(left), _ds(right), on="k", l_schema=l_schema,
                     r_schema=r_schema, how="left_anti", num_partitions=8).take_all()
    want_anti = ldf[~ldf["k"].isin(rdf["k"])]
    assert sorted((r["k"], r["lv"]) for r in anti) == sorted(
        (int(k), int(v)) for k, v in want_anti[["k", "lv"]].itertuples(index=False)
    )


def test_distinct_and_count(ray_session):
    keys = np.array([5, 5, 7, 9, 9, 9, 11], dtype=np.int64)
    ds = _ds(pa.table({"k": keys, "v": np.arange(7, dtype=np.int64)}), blocks=3)
    kept = distinct_on(ds, "k", num_partitions=4, sort_by=["v"]).take_all()
    assert sorted((r["k"], r["v"]) for r in kept) == [(5, 0), (7, 2), (9, 3), (11, 6)]
    counts = {r["k"]: r["n"] for r in grouped_count(ds, "k", num_partitions=4).take_all()}
    assert counts == {5: 2, 7: 1, 9: 3, 11: 1}


def test_coalesce_blocks(ray_session):
    tbl = pa.table({"x": np.arange(1000, dtype=np.int64)})
    ds = ray.data.from_arrow(tbl, override_num_blocks=97).materialize()
    out = coalesce_blocks(ds, 8).materialize()
    assert out.num_blocks() <= 8
    assert sorted(r["x"] for r in out.take_all()) == list(range(1000))

def test_exchange_null_keys_survive(ray_session):
    """Null keys route to a deterministic partition instead of being
    dropped (previously NaN%P -> INT64_MIN fell outside every shard)."""
    tbl = pa.table({"k": pa.array([1, None, 3, None], pa.int64()),
                    "v": pa.array([10, 20, 30, 40], pa.int64())})
    out = hash_exchange_map(_ds(tbl, blocks=2), "k", 4, lambda t: t)
    rows = out.take_all()
    assert len(rows) == 4
    assert sorted(r["v"] for r in rows) == [10, 20, 30, 40]


def test_hash_join_left_outer_null_left_key(ray_session):
    """A left row with a null key survives a left_outer join unmatched."""
    left = pa.table({"k": pa.array([1, None], pa.int64()),
                     "lv": pa.array([100, 200], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "rv": pa.array([7], pa.int64())})
    got = hash_join(
        _ds(left, blocks=1), _ds(right, blocks=1), on="k",
        l_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        r_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
        how="left_outer", num_partitions=4,
    ).take_all()
    assert sorted((r["lv"], r["rv"]) for r in got) == [(100, 7), (200, None)]


def test_string_key_exchange_vectorized_crc32(ray_session):
    """String-keyed exchange: vectorized crc32 routes identically to
    per-row zlib.crc32, including nulls and non-ASCII."""
    import zlib
    from osm2geojson_ray.relational import _crc32_vectorized, _part_of

    strs = [f"key-{i}-é{i % 13}" for i in range(2000)] + [""]
    arr = pa.array(strs, pa.string())
    got = _crc32_vectorized(arr)
    want = np.array([zlib.crc32(s.encode()) for s in strs], dtype=np.int64)
    assert (got == want).all()

    tbl = pa.table({"k": pa.array(strs + [None]), "v": np.arange(len(strs) + 1, dtype=np.int64)})
    out = hash_exchange_map(_ds(tbl, blocks=3), "k", 8, lambda t: t)
    rows = out.take_all()
    assert len(rows) == len(strs) + 1  # nulls retained
    # routing: every row landed in the partition its crc32 dictates
    def check(t: pa.Table) -> pa.Table:
        parts = set(_part_of(t["k"], 8).tolist())
        assert len(parts) <= 1
        return t.select(["v"])
    hash_exchange_map(_ds(tbl, blocks=3), "k", 8, check).materialize()


def test_distinct_on_subset_no_hash_merge(ray_session):
    """distinct_on with a derived routing key and subset= identity
    columns never merges distinct rows even if the routing key collides."""
    a = pa.array([1, 1, 2, 2], pa.int64())
    b = pa.array([5, 5, 6, 7], pa.int64())
    collide = pa.array([9, 9, 9, 9], pa.int64())  # all rows same routing key
    ds = _ds(pa.table({"rk": collide, "a": a, "b": b}), blocks=2)
    kept = distinct_on(ds, "rk", num_partitions=4, sort_by=["a", "b"],
                       subset=["a", "b"]).take_all()
    assert sorted((r["a"], r["b"]) for r in kept) == [(1, 5), (2, 6), (2, 7)]


def test_emit_split_on_fused_exchange(ray_session):
    """A join whose reduce pre-splits by the next key (ShardedRefs) must
    produce the same result as the two-hop Dataset path, for any
    partition-count combination."""
    import pandas as pd

    from osm2geojson_ray.relational import ShardedRefs, hash_join

    rng = np.random.RandomState(5)
    n = 500
    left = pa.table({
        "k": rng.randint(0, 40, n).astype(np.int64),
        "g": rng.randint(0, 7, n).astype(np.int64),
        "x": rng.rand(n),
    })
    right = pa.table({
        "k": np.arange(40, dtype=np.int64),
        "w": rng.rand(40),
    })
    l_schema = left.schema
    r_schema = right.schema

    def group_sum(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby("g", sort=False)["x"].sum().reset_index(name="sx")
        return pa.Table.from_pandas(out, preserve_index=False)

    def run(emit: bool, p1: int, p2: int):
        j = hash_join(
            _ds(left, blocks=3), _ds(right, blocks=2),
            on="k", l_schema=l_schema, r_schema=r_schema, how="inner",
            num_partitions=p1,
            emit_split_on=("g", p2) if emit else None,
        )
        if emit:
            assert isinstance(j, ShardedRefs) and j.num_partitions == p2
        out = hash_exchange_map(j, "g", p2, group_sum)
        df = out.to_pandas()
        return df.sort_values("g").reset_index(drop=True)

    want = run(False, 4, 3)
    for p1, p2 in ((4, 3), (1, 5), (6, 1)):
        got = run(True, p1, p2)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_topk_matches_full_sort(ray_session):
    from osm2geojson_ray.relational import topk

    rng = np.random.RandomState(11)
    n = 5000
    tbl = pa.table({
        "id": np.arange(n, dtype=np.int64),
        "price": rng.randint(0, 800, n).astype(np.int64),  # many ties
        "score": rng.rand(n),
    })
    df = tbl.to_pandas()
    for keys, k in (
        ([("price", True), ("id", False)], 10),
        ([("score", False), ("id", False)], 7),
        ([("price", False), ("score", True), ("id", False)], 25),
    ):
        got = topk(_ds(tbl, blocks=9), keys, k=k).to_pandas()
        want = df.sort_values(
            [c for c, _ in keys], ascending=[not d for _, d in keys], kind="stable"
        ).head(k).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True)[want.columns], want, check_dtype=False
        )


def test_topk_smaller_than_k(ray_session):
    from osm2geojson_ray.relational import topk

    tbl = pa.table({"v": pa.array([3, 1, 2], pa.int64())})
    got = topk(_ds(tbl, blocks=2), [("v", True)], k=10).to_pandas()
    assert got["v"].tolist() == [3, 2, 1]


def test_from_arrow_refs_lazy_matches_blocking(ray_session):
    """Lazy known-schema dataset view == blocking from_arrow_refs for
    map/filter consumers, constructs without waiting on pending refs."""
    import time

    import ray

    from osm2geojson_ray.relational import from_arrow_refs_lazy

    @ray.remote
    def slow(i):
        time.sleep(1.0)
        return pa.table({"x": pa.array([i, i + 10], pa.int64())})

    # warm the constructor's lazy imports so the timing below measures
    # only (absence of) blocking on the pending refs
    from_arrow_refs_lazy(
        [ray.put(pa.table({"x": pa.array([], pa.int64())}))],
        pa.schema([("x", pa.int64())]),
    )
    refs = [slow.remote(i) for i in range(3)]
    t0 = time.time()
    ds = from_arrow_refs_lazy(refs, pa.schema([("x", pa.int64())]))
    construct = time.time() - t0
    assert construct < 0.5, f"constructor blocked {construct:.2f}s"
    got = sorted(
        r["x"] for r in ds.map_batches(lambda t: t, batch_format="pyarrow").take_all()
    )
    assert got == [0, 1, 2, 10, 11, 12]
    assert ds.filter(expr="x >= 10").count() == 3


def test_from_arrow_refs_lazy_with_meta_counts(ray_session):
    """meta=(rows, bytes) per ref makes the view metadata-complete:
    count() answers from metadata (no map hop required) and take/schema
    still read the real blocks — the task-mode consume contract."""
    import ray

    from osm2geojson_ray.relational import from_arrow_refs_lazy

    tables = [
        pa.table({"x": pa.array([1, 2, 3], pa.int64())}),
        pa.table({"x": pa.array([4], pa.int64())}),
    ]
    refs = [ray.put(t) for t in tables]
    ds = from_arrow_refs_lazy(
        refs,
        pa.schema([("x", pa.int64())]),
        meta=[(len(t), t.nbytes) for t in tables],
    )
    assert ds.count() == 4
    assert sorted(r["x"] for r in ds.take_all()) == [1, 2, 3, 4]
    assert ds.schema().names == ["x"]


def test_grouped_quantiles_matches_duckdb(ray_session):
    """Property: grouped_quantiles reproduces DuckDB quantile_disc
    exactly across awkward group sizes (1, 2, primes) and tie-heavy
    value distributions."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from osm2geojson_ray.relational import grouped_quantiles

    rng = np.random.RandomState(11)
    sizes = [1, 2, 3, 7, 9, 10, 20, 100]
    frames = []
    for g, n in enumerate(sizes):
        frames.append(pd.DataFrame({
            "g": np.full(n, g, np.int64),
            "v": rng.randint(0, 6, n).astype(np.int64),  # heavy ties
        }))
    df = pd.concat(frames, ignore_index=True)
    qs = {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p100": 1.0}
    got = (
        grouped_quantiles(
            ray.data.from_pandas(df).repartition(6), "g", "v", qs, n_col="n"
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT g, quantile_disc(v,0.1) p10, quantile_disc(v,0.5) p50, "
        "quantile_disc(v,0.9) p90, quantile_disc(v,1.0) p100, count(*) n "
        "FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    for c in ["g", "p10", "p50", "p90", "p100", "n"]:
        assert got[c].tolist() == want[c].tolist(), c


def test_hash_sample_deterministic_and_unbiased(ray_session):
    from osm2geojson_ray.images.synth import splitmix64
    from osm2geojson_ray.relational import hash_sample

    ids = np.arange(20000, dtype=np.int64)
    ds = _ds(pa.table({"id": ids, "v": ids * 3}), blocks=6)
    out = hash_sample(ds, "id", 10, 100).to_pandas().sort_values("id")
    # exact per-row oracle: the same splitmix64 threshold
    want = ids[splitmix64(ids.astype(np.uint64)) % np.uint64(100) < np.uint64(10)]
    assert out["id"].tolist() == want.tolist()
    # passthrough columns survive; rate lands near 10%
    assert (out["v"].to_numpy() == out["id"].to_numpy() * 3).all()
    assert 0.08 < len(out) / len(ids) < 0.12
    # identical on a different block layout (no RNG/partition coupling)
    out2 = hash_sample(_ds(pa.table({"id": ids, "v": ids * 3}), blocks=13),
                       "id", 10, 100).to_pandas().sort_values("id")
    assert out2["id"].tolist() == want.tolist()


def test_stratified_hash_sample_rates_and_default(ray_session):
    from osm2geojson_ray.images.synth import splitmix64
    from osm2geojson_ray.relational import stratified_hash_sample

    ids = np.arange(9000, dtype=np.int64)
    strata = np.array(["a", "b", "c"])[ids % 3]
    tbl = pa.table({"id": ids, "s": pa.array(strata.tolist(), pa.string())})
    out = (
        stratified_hash_sample(_ds(tbl, blocks=5), "id", "s",
                               rates={"a": 50}, default_num=5, keep_den=100)
        .to_pandas().sort_values("id")
    )
    h = splitmix64(ids.astype(np.uint64)) % np.uint64(100)
    thresh = np.where(strata == "a", 50, 5).astype(np.uint64)
    want = ids[h < thresh]
    assert out["id"].tolist() == want.tolist()
    # stratum 'a' kept ~10x more than unlisted strata
    counts = out["s"].value_counts()
    assert counts["a"] > 5 * max(counts.get("b", 0), counts.get("c", 0))


def test_weighted_hash_sample_proportional_and_clamped(ray_session):
    from osm2geojson_ray.images.synth import splitmix64
    from osm2geojson_ray.relational import weighted_hash_sample

    ids = np.arange(20000, dtype=np.int64)
    # weights spanning negative (drop always), 0, mid, and above-den
    w = (ids % 250 - 10) * 20  # in [-200, 4780]
    tbl = pa.table({"id": ids, "w": w})
    out = (
        weighted_hash_sample(_ds(tbl, blocks=7), "id", "w", 4000)
        .to_pandas().sort_values("id")
    )
    h = splitmix64(ids.astype(np.uint64)) % np.uint64(4000)
    want = ids[h < np.clip(w, 0, 4000).astype(np.uint64)]
    assert out["id"].tolist() == want.tolist()
    # w <= 0 never kept; w >= den always kept
    kept = set(out["id"].tolist())
    assert not (kept & set(ids[w <= 0].tolist()))
    assert set(ids[w >= 4000].tolist()) <= kept
    # inclusion tracks weight: high-weight band kept far more often
    hi = (w >= 3000) & (w < 4000)
    lo = (w > 0) & (w <= 1000)
    rate_hi = np.isin(ids[hi], out["id"]).mean()
    rate_lo = np.isin(ids[lo], out["id"]).mean()
    assert rate_hi > 2.5 * rate_lo


def test_grouped_centroid_matches_numpy(ray_session):
    from osm2geojson_ray.vectors import grouped_centroid

    rng = np.random.RandomState(11)
    n, dim = 4000, 8
    labels = rng.randint(0, 5, n).astype(np.int64)
    M = rng.randn(n, dim).astype(np.float32)
    tbl = pa.table({
        "label": pa.array(labels),
        "embedding": pa.array(M.tolist(), pa.list_(pa.float32())),
    })
    out = (
        grouped_centroid(_ds(tbl, blocks=7), "label", "embedding",
                         scale=10000, out_col="m")
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    assert len(out) == 5 * dim
    for lab in range(5):
        rows = out[out["label"] == lab]
        assert (rows["n_vecs"] == (labels == lab).sum()).all()
        mean = M[labels == lab].astype(np.float64).mean(axis=0) * 10000
        want = (np.sign(mean) * np.floor(np.abs(mean) + 0.5)).astype(np.int64)
        np.testing.assert_array_equal(rows["m"].to_numpy(), want)


def test_heavy_hitters_exact_above_threshold(ray_session):
    """Skewed stream: items with weight > num/den of total come back
    with EXACT counts; everything else is pruned.  Tiny capacity forces
    real Misra-Gries compression in every batch."""
    from osm2geojson_ray.relational import heavy_hitters

    rng = np.random.RandomState(3)
    # 2 heavy items (~30% / ~10%), 500 light items sharing the rest
    items = np.concatenate([
        np.repeat("hot", 3000),
        np.repeat("warm", 1000),
        np.array([f"cold{i}" for i in rng.randint(0, 500, 6000)]),
    ])
    rng.shuffle(items)
    ds = _ds(pa.table({"item": pa.array(items.tolist(), pa.string())}), blocks=8)
    out = (
        heavy_hitters(ds, "item", threshold_num=5, threshold_den=100,
                      capacity=20, out_col="n")
        .to_pandas().sort_values("item").reset_index(drop=True)
    )
    import collections
    true = collections.Counter(items.tolist())
    want = sorted((k, v) for k, v in true.items() if v * 100 > 5 * len(items))
    assert list(map(tuple, out[["item", "n"]].to_numpy())) == want
    # weighted variant agrees with pre-aggregated rows
    uniq, counts = np.unique(items, return_counts=True)
    wds = _ds(pa.table({"item": pa.array(uniq.tolist(), pa.string()),
                        "w": pa.array(counts.astype(np.int64))}), blocks=5)
    wout = (
        heavy_hitters(wds, "item", weight_col="w", threshold_num=5,
                      threshold_den=100, capacity=20, out_col="n")
        .to_pandas().sort_values("item").reset_index(drop=True)
    )
    assert list(map(tuple, wout[["item", "n"]].to_numpy())) == want


def test_partitioned_window_matches_pandas(ray_session):
    from osm2geojson_ray.relational import partitioned_window

    rng = np.random.RandomState(5)
    n = 5000
    tbl = pa.table({
        "k": pa.array(rng.randint(0, 40, n).astype(np.int64)),
        "t": pa.array(rng.randint(0, 10**6, n).astype(np.int64)),
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.randint(-100, 100, n).astype(np.int64)),
    })
    out = (
        partitioned_window(
            _ds(tbl, blocks=9), "k", [("t", False), ("id", False)],
            {"cs": ("v", "cumsum"), "rn": (None, "row_number"), "pv": ("v", "lag")},
            num_partitions=7,
        )
        .to_pandas().sort_values(["k", "t", "id"]).reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values(["k", "t", "id"]).reset_index(drop=True)
    g = df.groupby("k", sort=False)
    assert (out["cs"].to_numpy() == g["v"].cumsum().to_numpy()).all()
    assert (out["rn"].to_numpy() == g.cumcount().to_numpy() + 1).all()
    want_pv = g["v"].shift(1)
    got_pv = out["pv"]
    assert got_pv.isna().equals(want_pv.isna())
    assert (got_pv.dropna().to_numpy() == want_pv.dropna().to_numpy()).all()


def test_partitioned_window_descending_order(ray_session):
    from osm2geojson_ray.relational import partitioned_window

    tbl = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "t": pa.array([10, 20, 30, 5, 7], pa.int64()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = (
        partitioned_window(_ds(tbl, blocks=2), "k", [("t", True), ("v", False)],
                           {"rn": (None, "row_number")}, num_partitions=3)
        .to_pandas().sort_values(["k", "rn"]).reset_index(drop=True)
    )
    # rank 1 = latest t within each k
    assert out[out.k == 1]["t"].tolist() == [30, 20, 10]
    assert out[out.k == 2]["t"].tolist() == [7, 5]


def test_grouped_quantiles_interpolated_matches_numpy(ray_session):
    from osm2geojson_ray.relational import grouped_quantiles

    rng = np.random.RandomState(9)
    g = rng.randint(0, 4, 3000).astype(np.int64)
    v = rng.randint(0, 500, 3000).astype(np.int64)
    out = (
        grouped_quantiles(_ds(pa.table({"g": g, "v": v}), blocks=6), "g", "v",
                          {"p25": 0.25, "p50": 0.5, "p99": 0.99}, interpolate=True)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    for gi in range(4):
        vals = v[g == gi]
        row = out[out.g == gi].iloc[0]
        for name, q in [("p25", 0.25), ("p50", 0.5), ("p99", 0.99)]:
            # numpy 'linear' == R-7 == DuckDB quantile_cont
            assert abs(row[name] - np.quantile(vals, q, method="linear")) < 1e-9


def test_rollup_agg_matches_pandas(ray_session):
    from osm2geojson_ray.relational import rollup_agg

    rng = np.random.RandomState(21)
    a = np.array(["x", "y", "z"])[rng.randint(0, 3, 4000)]
    b = np.array(["p", "q"])[rng.randint(0, 2, 4000)]
    v = rng.randint(0, 50, 4000).astype(np.int64)
    tbl = pa.table({"a": pa.array(a.tolist()), "b": pa.array(b.tolist()),
                    "v": pa.array(v)})
    out = rollup_agg(_ds(tbl, blocks=7), ["a", "b"],
                     {"s": ("v", "sum"), "n": (None, "count")}).to_pandas()
    # 3x2 full + 3 subtotal + 1 grand = 10 rows
    assert len(out) == 10
    df = tbl.to_pandas()
    full = out.dropna(subset=["a", "b"])
    for (ga, gb), sub in df.groupby(["a", "b"]):
        row = full[(full.a == ga) & (full.b == gb)].iloc[0]
        assert row["s"] == sub["v"].sum() and row["n"] == len(sub)
    subtot = out[out.a.notna() & out.b.isna()]
    for ga, sub in df.groupby("a"):
        row = subtot[subtot.a == ga].iloc[0]
        assert row["s"] == sub["v"].sum() and row["n"] == len(sub)
    grand = out[out.a.isna() & out.b.isna()].iloc[0]
    assert grand["s"] == v.sum() and grand["n"] == 4000


def test_hash_join_left_semi(ray_session):
    from osm2geojson_ray.relational import hash_join

    left = _ds(pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                         "v": pa.array(list("abcde"))}), blocks=3)
    # duplicate right keys: semi must not duplicate left rows
    right = _ds(pa.table({"k": pa.array([2, 2, 4, 9], pa.int64())}), blocks=2)
    out = hash_join(
        left, right, on="k",
        l_schema=pa.schema([("k", pa.int64()), ("v", pa.string())]),
        r_schema=pa.schema([("k", pa.int64())]),
        how="left_semi", num_partitions=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(map(tuple, out.to_numpy())) == [(2, "b"), (4, "d")]


def test_cube_agg_matches_duckdb(ray_session):
    import duckdb

    from osm2geojson_ray.relational import cube_sets, rollup_agg

    rng = np.random.RandomState(33)
    a = np.array(["x", "y", "z"])[rng.randint(0, 3, 3000)]
    b = np.array(["p", "q"])[rng.randint(0, 2, 3000)]
    v = rng.randint(0, 50, 3000).astype(np.int64)
    tbl = pa.table({"a": pa.array(a.tolist()), "b": pa.array(b.tolist()),
                    "v": pa.array(v)})
    out = (
        rollup_agg(_ds(tbl, blocks=5), ["a", "b"],
                   {"s": ("v", "sum"), "n": (None, "count")},
                   grouping_sets=cube_sets(["a", "b"]))
        .to_pandas().sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    want = (
        con.execute("SELECT a, b, sum(v) AS s, count(*) AS n FROM t "
                    "GROUP BY CUBE(a, b)")
        .fetchdf().sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    # 3x2 full + 3 a-subtotals + 2 b-subtotals + 1 grand = 12 rows
    assert len(out) == 12 and len(want) == 12
    for col in ["a", "b"]:
        assert out[col].fillna("&null").tolist() == want[col].fillna("&null").tolist()
    for col in ["s", "n"]:
        assert out[col].astype("int64").tolist() == want[col].astype("int64").tolist()


def test_hll_estimate_accuracy_and_merge(ray_session):
    """HLL registers merge across arbitrary block layouts (idempotent
    max), and the estimate lands within the standard error envelope
    (sigma ~ 1.04/sqrt(m), m=4096 -> ~1.6%) for both the
    linear-counting and raw regimes."""
    from osm2geojson_ray.relational import hll_estimate, hll_registers

    for n_true, blocks in [(800, 4), (50000, 9)]:
        keys = np.arange(n_true, dtype=np.int64) * 7919 + 13  # distinct
        dup = np.concatenate([keys, keys[: n_true // 2]])     # duplicates
        ds = _ds(pa.table({"k": pa.array(dup)}), blocks=blocks)
        regs = hll_registers(ds, "k", p=12).to_pandas()
        tbl = pa.table({"register_idx": pa.array(regs["register_idx"].to_numpy()),
                        "register": pa.array(regs["register"].to_numpy())})
        est = hll_estimate(tbl, p=12)
        assert abs(est - n_true) / n_true < 0.05, (n_true, est)
        # different block layout -> identical registers (merge = max)
        regs2 = (
            hll_registers(_ds(pa.table({"k": pa.array(dup)}), blocks=2), "k", p=12)
            .to_pandas().sort_values("register_idx").reset_index(drop=True)
        )
        assert regs.sort_values("register_idx").reset_index(drop=True).equals(regs2)


def test_rank_windows_match_duckdb(ray_session):
    """rank/dense_rank/ntile vs DuckDB on a table with heavy ties and
    groups smaller than the ntile bucket count."""
    import duckdb
    import ray.data

    from osm2geojson_ray.relational import partitioned_window

    rng = np.random.default_rng(3)
    n = 500
    tbl = pa.table(
        {
            "grp": rng.integers(0, 12, n, dtype=np.int64),  # some groups < 4 rows
            "val": rng.integers(0, 5, n, dtype=np.int64),  # heavy ties
            "uid": np.arange(n, dtype=np.int64),
        }
    )
    out = (
        partitioned_window(
            ray.data.from_arrow(tbl).repartition(3),
            "grp",
            [("val", False), ("uid", False)],
            {
                "rnk": ("val", "rank"),
                "drnk": ("val", "dense_rank"),
                "t3": (None, "ntile:3"),
                "t7": (None, "ntile:7"),
            },
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        """
        SELECT uid,
               rank() OVER (PARTITION BY grp ORDER BY val) AS rnk,
               dense_rank() OVER (PARTITION BY grp ORDER BY val) AS drnk,
               ntile(3) OVER (PARTITION BY grp ORDER BY val, uid) AS t3,
               ntile(7) OVER (PARTITION BY grp ORDER BY val, uid) AS t7
        FROM t ORDER BY uid
        """
    ).fetchdf()
    for col in ("rnk", "drnk", "t3", "t7"):
        assert out[col].tolist() == want[col].tolist(), col


def test_connected_components_matches_union_find(ray_session):
    import ray.data

    from osm2geojson_ray.relational import connected_components

    rng = np.random.default_rng(21)
    # several chains + cliques + isolated pairs over sparse ids
    nodes = rng.choice(10_000, size=120, replace=False).astype(np.int64)
    edges = []
    i = 0
    while i + 1 < len(nodes):
        run = int(rng.integers(2, 6))
        chunk = nodes[i : i + run]
        for a, b in zip(chunk[:-1], chunk[1:]):
            edges.append((a, b))
        if run >= 4:  # make some components cliques, not just paths
            edges.append((chunk[0], chunk[-1]))
        i += run
    a = np.array([e[0] for e in edges], dtype=np.int64)
    b = np.array([e[1] for e in edges], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b})).repartition(4)

    got = (
        connected_components(ds, a_col="a", b_col="b")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    # oracle: classic union-find
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(int(u))] = find(int(v))
    comp = {}
    for u, v in edges:
        for x in (int(u), int(v)):
            comp.setdefault(find(x), []).append(x)
    want = {}
    for members in comp.values():
        lbl = min(members)
        for m in members:
            want[m] = lbl

    assert got["node"].tolist() == sorted(want)
    assert got["label"].tolist() == [want[n] for n in sorted(want)]


def test_connected_components_empty(ray_session):
    import ray.data

    from osm2geojson_ray.relational import connected_components

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    )
    assert connected_components(ds).count() == 0


def test_connected_components_nonconvergence_raises(ray_session):
    import ray.data

    from osm2geojson_ray.relational import connected_components

    # a 12-node path needs ~11 rounds; cap at 3 must raise, not return
    a = np.arange(11, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"a": a, "b": a + 1}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ds, max_iters=3)
    # and with enough rounds the same input resolves to label 0
    out = connected_components(ds, max_iters=20).to_pandas()
    assert set(out["label"]) == {0}


def test_grouped_concat_matches_pandas(ray_session):
    from osm2geojson_ray.relational import grouped_concat

    rng = np.random.default_rng(31)
    n = 300
    tbl = pa.table(
        {
            "k": rng.integers(0, 20, n, dtype=np.int64),
            "v": pa.array([f"t{int(x)}" for x in rng.integers(0, 9, n)]),
            "o": np.random.default_rng(32).permutation(n).astype(np.int64),
        }
    )
    got = (
        grouped_concat(
            ray.data.from_arrow(tbl).repartition(4), "k", "v", "o", sep="|"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    df = tbl.to_pandas().sort_values(["k", "o"])
    want = df.groupby("k")["v"].agg(lambda s: "|".join(s)).reset_index()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["joined"].tolist() == want["v"].tolist()


def test_bloom_semi_join_exact_and_prefilter_effective(ray_session):
    from osm2geojson_ray.relational import (
        _bloom_positions,
        bloom_semi_join,
    )

    rng = np.random.default_rng(41)
    left_keys = rng.integers(0, 100_000, 5000, dtype=np.int64)
    right = np.unique(rng.integers(0, 100_000, 200, dtype=np.int64))
    lds = ray.data.from_arrow(pa.table({"k": left_keys})).repartition(4)
    rds = ray.data.from_arrow(pa.table({"k": right})).repartition(2)

    got = (
        bloom_semi_join(lds, rds, on="k", l_schema=pa.schema([("k", pa.int64())]),
                        m_bits=1 << 14)
        .to_pandas()["k"]
        .to_numpy()
    )
    want = left_keys[np.isin(left_keys, right)]
    assert sorted(got.tolist()) == sorted(want.tolist())

    # no false negatives by construction: every member passes the probe
    bits = np.zeros(1 << 14, dtype=bool)
    bits[_bloom_positions(right, 1 << 14, 4).ravel()] = True
    assert bits[_bloom_positions(want, 1 << 14, 4)].all()


def test_intersect_except_distinct(ray_session):
    from osm2geojson_ray.relational import except_distinct, intersect_distinct

    a = ray.data.from_arrow(
        pa.table({"k": np.array([1, 2, 2, 3, 5, 5, 7], dtype=np.int64)})
    ).repartition(3)
    b = ray.data.from_arrow(
        pa.table({"k": np.array([2, 3, 3, 4, 8], dtype=np.int64)})
    ).repartition(2)
    inter = sorted(intersect_distinct(a, b, on="k").to_pandas()["k"].tolist())
    assert inter == [2, 3]
    exc = sorted(except_distinct(a, b, on="k").to_pandas()["k"].tolist())
    assert exc == [1, 5, 7]


def test_snapshot_diff_matches_bruteforce(ray_session):
    from osm2geojson_ray.relational import snapshot_diff

    rng = np.random.default_rng(61)
    old_k = np.sort(rng.choice(10_000, 500, replace=False)).astype(np.int64)
    old_f = rng.integers(0, 1 << 40, 500, dtype=np.int64)
    # new: drop 50, change 60, add 40
    keep = np.ones(500, bool)
    keep[rng.choice(500, 50, replace=False)] = False
    new_k = old_k[keep].copy()
    new_f = old_f[keep].copy()
    ch = rng.choice(len(new_k), 60, replace=False)
    new_f[ch] = new_f[ch] + 1
    add_k = np.arange(20_000, 20_040, dtype=np.int64)
    add_f = rng.integers(0, 1 << 40, 40, dtype=np.int64)
    nk = np.concatenate([new_k, add_k])
    nf = np.concatenate([new_f, add_f])

    ods = ray.data.from_arrow(pa.table({"doc_id": old_k, "fp": old_f})).repartition(3)
    nds = ray.data.from_arrow(pa.table({"doc_id": nk, "fp": nf})).repartition(4)
    got = snapshot_diff(ods, nds, key="doc_id", fp_col="fp").to_pandas()
    got_set = set(zip(got["key"], got["change"]))

    want = {(int(k), "added") for k in add_k}
    want |= {(int(k), "removed") for k in old_k[~keep]}
    want |= {(int(k), "changed") for k in new_k[ch]}
    assert got_set == want and len(got) == len(want)


def test_bloom_semi_join_multi_row_partial_blocks(ray_session):
    # A right side whose set_bits partials COALESCE into one multi-row
    # block (one task, many batches): with the row-0-only OR reducer
    # every key hashed only in later batches was silently dropped
    # (false negatives).  Single-block 5000-row right side -> ~5
    # batches -> one partials block with ~5 rows.
    from osm2geojson_ray.relational import bloom_semi_join

    right = np.arange(5000, dtype=np.int64)
    left = np.arange(3900, 6000, dtype=np.int64)  # matches live in LAST batches
    lds = ray.data.from_arrow(pa.table({"k": left})).repartition(2)
    rds = ray.data.from_arrow(pa.table({"k": right}))  # ONE block
    got = (
        bloom_semi_join(
            lds, rds, on="k", l_schema=pa.schema([("k", pa.int64())]), m_bits=1 << 14
        )
        .to_pandas()["k"]
        .to_numpy()
    )
    want = left[left < 5000]
    assert sorted(got.tolist()) == sorted(want.tolist())


def test_grouped_mode_ties_and_strings(ray_session):
    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.relational import grouped_mode

    t = pa.table({
        "g": [1, 1, 1, 1, 2, 2, 3],
        "v": ["b", "a", "b", "a", "x", "x", "solo"],
    })
    out = (
        grouped_mode(ray.data.from_arrow(t), "g", "v")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    # g=1: a and b tie at 2 -> smaller value wins
    assert out["v"].tolist() == ["a", "x", "solo"]
    assert out["mode_count"].tolist() == [2, 2, 1]
    # one row per group, columns preserved
    assert list(out.columns) == ["g", "v", "mode_count"]


def test_grouped_mode_cross_block_counts(ray_session):
    """Counts must combine ACROSS blocks: the winner in the merged
    counts differs from any single block's local winner."""
    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.relational import grouped_mode

    # block 1: z appears twice, m once; block 2: m twice, z once
    # merged: m=3 > z=3? make m=3, z=2 -> m wins only after merge
    b1 = pa.table({"g": [7, 7, 7], "v": ["z", "z", "m"]})
    b2 = pa.table({"g": [7, 7, 7], "v": ["m", "m", "q"]})
    ds = ray.data.from_arrow([b1, b2])
    out = grouped_mode(ds, "g", "v").to_pandas()
    assert out["v"].tolist() == ["m"]
    assert out["mode_count"].tolist() == [3]


def test_partial_grouped_agg_xor_cross_block(ray_session):
    """bit_xor partials must combine by xor ACROSS blocks, including
    negative int64 (two's-complement, matching DuckDB bit_xor)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.relational import partial_grouped_agg

    b1 = pa.table({"g": pa.array([1, 1, 2], pa.int64()),
                   "v": pa.array([-5, 9, 7], pa.int64())})
    b2 = pa.table({"g": pa.array([1, 2], pa.int64()),
                   "v": pa.array([3, -7], pa.int64())})
    out = (
        partial_grouped_agg(ray.data.from_arrow([b1, b2]), ["g"],
                            {"x": ("v", "xor"), "n": (None, "count")})
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert out["x"].tolist() == [(-5) ^ 9 ^ 3, 7 ^ (-7)]
    assert out["n"].tolist() == [3, 2]


def test_validate_expectations_counts_across_blocks(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from osm2geojson_ray.relational import validate_expectations

    b1 = pa.table({"v": pa.array([1, -2, 3], pa.int64())})
    b2 = pa.table({"v": pa.array([-4, 5], pa.int64())})
    out = (
        validate_expectations(ray.data.from_arrow([b1, b2]), {
            "negative": lambda t: pc.less(t["v"], 0),
            "huge": lambda t: pc.greater(t["v"], 100),
        })
        .to_pandas().sort_values("rule").reset_index(drop=True)
    )
    assert out["rule"].tolist() == ["huge", "negative"]
    assert out["n_rows"].tolist() == [5, 5]
    assert out["n_violations"].tolist() == [0, 2]


def test_hash_join_full_outer(ray_session):
    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.relational import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array([10, 20, 30], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 3, 4], pa.int64()),
        "rv": pa.array([200, 300, 301, 400], pa.int64()),
    }))
    out = hash_join(
        left, right, on="k",
        l_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        r_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
        how="full_outer", num_partitions=3,
    ).to_pandas().sort_values(["k", "rv"]).reset_index(drop=True)
    # left-only k=1, inner k=2, many-match k=3 (x2), right-only k=4
    assert out["k"].tolist() == [1, 2, 3, 3, 4]
    assert out["lv"].fillna(-1).astype(int).tolist() == [10, 20, 30, 30, -1]
    assert out["rv"].fillna(-1).astype(int).tolist() == [-1, 200, 300, 301, 400]


def test_user_funnel_branches(ray_session, tmp_path):
    """q33 semantics on planted users covering every branch: converter,
    purchase-before-view, view-only, purchase-only, tie timestamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm2geojson_ray.queries import q33_user_funnel

    us = pa.timestamp("us")
    rows = [
        # u1: view @10, purchase @20 -> converted
        (1, 10, "view"), (1, 20, "purchase"),
        # u2: purchase @10, view @20 -> NOT converted
        (2, 10, "purchase"), (2, 20, "view"),
        # u3: views only
        (3, 5, "view"), (3, 6, "view"),
        # u4: purchases only
        (4, 7, "purchase"),
        # u5: same-instant view and purchase -> strict < fails
        (5, 30, "view"), (5, 30, "purchase"),
        # u6: noise types only
        (6, 1, "click"), (6, 2, "error"),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows], us),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = (
        q33_user_funnel(str(tmp_path))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2, 3, 4, 5, 6]
    assert out["converted"].tolist() == [1, 0, 0, 0, 0, 0]
    assert out["n_views"].tolist() == [1, 1, 2, 0, 1, 0]
    assert out["n_purchases"].tolist() == [1, 1, 0, 1, 1, 0]


def test_retention_cohorts_multi_month(ray_session, tmp_path):
    """q36 on a planted multi-month log (the testdata spans one month,
    so the real cohort/offset matrix only exercises here): two
    cohorts, gaps, a user active twice in one month (dedup to one
    pair), and a user seen only once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm2geojson_ray.queries import q36_retention_cohorts

    us = pa.timestamp("us")
    M = 2_678_400 * 1_000_000  # ~31 days in us: safely distinct months
    rows = [
        # u1: cohort m0, active m0, m1, m3 (skips m2)
        (1, 0), (1, 1 * M), (1, 3 * M),
        # u2: cohort m0, active m0 twice (dedups), m1
        (2, 1000), (2, 2000), (2, 1 * M + 5),
        # u3: cohort m1 only
        (3, 1 * M + 10),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], us),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = (
        q36_retention_cohorts(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_month", "month_offset"])
        .reset_index(drop=True)
    )
    got = list(map(tuple, out.itertuples(index=False)))
    # months since 1970: m0 = 648 (2024-01 in the testdata; here epoch
    # month 0 and 1 and 3 by construction of M)
    assert got == [(0, 0, 2), (0, 1, 2), (0, 3, 1), (1, 0, 1)]


def test_neighborhood_rollup_edges_and_radius(ray_session):
    """Scatter-sum equals the brute-force box sum, including grid-edge
    clipping (corner cell) and radius=2; output is sparse (only cells
    within radius of an occupied cell)."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.spatial.tiles import neighborhood_rollup

    level = 3  # 8x8 grid
    occ = {(0, 0): 5, (1, 1): 7, (4, 4): 1, (7, 7): 9}  # corners + middle

    def cid(x, y):
        return (level << 58) | (x << 29) | y

    t = pa.table({
        "cell_id": pa.array([cid(x, y) for x, y in occ], pa.int64()),
        "n": pa.array(list(occ.values()), pa.int64()),
    })
    for radius in (1, 2):
        out = neighborhood_rollup(
            ray.data.from_arrow(t), value_col="n", radius=radius
        ).to_pandas()
        got = {int(r.cell_id): int(r.n_smooth) for r in out.itertuples()}
        want = {}
        for (x, y), v in occ.items():
            for dx in range(-radius, radius + 1):
                for dy in range(-radius, radius + 1):
                    nx, ny = x + dx, y + dy
                    if 0 <= nx < 8 and 0 <= ny < 8:
                        want[cid(nx, ny)] = want.get(cid(nx, ny), 0) + v
        assert got == want


def test_pareto_front_planted(ray_session):
    """Skyline semantics vs a brute-force dominance oracle, across
    block shapes (partial counts must sum exactly), plus duplicate
    pairs, same-x groups and the strict-dominance tie rules."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.relational import pareto_front

    rng = np.random.RandomState(7)
    x = rng.randint(0, 50, size=400).astype(np.int64)
    y = rng.randint(0, 50, size=400).astype(np.int64)

    pairs = list(zip(x.tolist(), y.tolist()))
    uniq = sorted(set(pairs))
    want = {}
    for px, py in uniq:
        dominated = any(
            bx >= px and by <= py and (bx > px or by < py)
            for bx, by in uniq
        )
        if not dominated:
            want[(px, py)] = pairs.count((px, py))

    t = pa.table({"x": pa.array(x), "y": pa.array(y)})
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = pareto_front(ds).to_pandas()
        got = {(int(r.x), int(r.y)): int(r.n) for r in out.itertuples()}
        assert got == want, nblocks


def test_pareto_front_cap_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa

    import pytest
    import ray
    from osm2geojson_ray.relational import empty_dataset, pareto_front

    # perfect anti-chain: every point survives -> loud raise at the cap
    n = 50
    k = np.arange(n, dtype=np.int64)
    t = pa.table({"x": pa.array(k), "y": pa.array(k)})
    with pytest.raises(ValueError, match="pareto_front"):
        pareto_front(ray.data.from_arrow(t), max_candidates=10).to_pandas()

    schema = pa.schema([("x", pa.int64()), ("y", pa.int64())])
    out = pareto_front(empty_dataset(schema))
    assert out.count() == 0
    assert out.schema().names == ["x", "y", "n"]


def test_cms_registers_and_estimate(ray_session):
    """CMS registers sum to depth x rows; estimates are never under the
    true count; a planted heavy key with no collisions in its buckets
    estimates exactly."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.relational import cms_estimate, cms_registers

    keys = np.r_[np.full(500, 42, dtype=np.int64),
                 np.arange(100, 160, dtype=np.int64)]
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)})).repartition(5)
    regs = cms_registers(ds, "k", depth=4, width=1024).to_pandas()
    assert regs["cnt"].sum() == 4 * len(keys)
    regs_t = pa.Table.from_pandas(regs, preserve_index=False)

    import collections

    truth = collections.Counter(keys.tolist())
    probe = sorted(truth)
    est = cms_estimate(regs_t, probe, depth=4, width=1024)
    for k, e in zip(probe, est):
        assert e >= truth[k], (k, e, truth[k])
    # 61 distinct keys in 1024 buckets: the heavy key's min-row is
    # overwhelmingly collision-free; assert the exact recovery we see
    assert est[probe.index(42)] == 500


def test_table_checksum_invariance_and_sensitivity(ray_session):
    """Checksum is partitioning/order independent, the ungrouped path
    works, and any single-row mutation flips the fingerprint."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.relational import table_checksum

    rng = np.random.RandomState(3)
    k = rng.randint(0, 2**40, size=300).astype(np.int64)
    g = (k % 3).astype(np.int64)
    t = pa.table({"k": pa.array(k), "g": pa.array(g)})

    base = None
    for nblocks in (1, 11):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = (table_checksum(ds, "k", ["g"]).to_pandas()
               .sort_values("g").reset_index(drop=True))
        if base is None:
            base = out
        else:
            assert out.equals(base)
    assert base["n_rows"].tolist() == [int((g == i).sum()) for i in range(3)]

    # ungrouped: one global row
    glob = table_checksum(ray.data.from_arrow(t), "k").to_pandas()
    assert len(glob) == 1 and int(glob["n_rows"][0]) == 300

    # mutate one row -> at least one modular sum changes in that group
    k2 = k.copy()
    k2[17] += 1
    t2 = pa.table({"k": pa.array(k2), "g": pa.array(g)})
    out2 = (table_checksum(ray.data.from_arrow(t2), "k", ["g"]).to_pandas()
            .sort_values("g").reset_index(drop=True))
    gi = int(g[17])
    row_a, row_b = base.iloc[gi], out2.iloc[gi]
    assert (row_a["csum_a"] != row_b["csum_a"]
            or row_a["csum_b"] != row_b["csum_b"])


def test_triangle_count_random_vs_bruteforce(ray_session):
    """Random multigraphs (dupes + self-loops) against an O(m*d)
    brute force; degree-ordered orientation must count each triangle
    exactly once regardless of degree skew."""
    import numpy as np
    import pyarrow as pa

    from osm2geojson_ray.relational import dataset_from_table, triangle_count

    def brute(u, v):
        es = {(min(a, b), max(a, b)) for a, b in zip(u, v) if a != b}
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        n = sum(1 for a, b in es for c in (adj[a] & adj[b]) if c > b)
        return len(es), n

    rng = np.random.default_rng(11)
    for _ in range(4):
        m = int(rng.integers(30, 300))
        nv = int(rng.integers(6, 30))
        u = rng.integers(0, nv, m).astype(np.int64)
        v = rng.integers(0, nv, m).astype(np.int64)
        res = triangle_count(
            dataset_from_table(pa.table({"u": u, "v": v})), "u", "v"
        ).to_pandas()
        ne, nt = brute(u.tolist(), v.tolist())
        assert (int(res["n_edges"][0]), int(res["n_triangles"][0])) == (ne, nt)

    # star graph: heavy hub, zero triangles
    hub_u = np.zeros(50, np.int64)
    hub_v = np.arange(1, 51, dtype=np.int64)
    res = triangle_count(
        dataset_from_table(pa.table({"u": hub_u, "v": hub_v})), "u", "v"
    ).to_pandas()
    assert int(res["n_triangles"][0]) == 0 and int(res["n_edges"][0]) == 50

    # empty edge stream
    res = triangle_count(
        dataset_from_table(
            pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})), "u", "v"
    ).to_pandas()
    assert int(res["n_edges"][0]) == 0 and int(res["n_triangles"][0]) == 0


def test_grouped_ohlc_ties_and_bounds(ray_session):
    """open/close recover the min/max-time values; ties on t take the
    smallest value at BOTH ends; out-of-range values raise."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    import ray
    from osm2geojson_ray.relational import grouped_ohlc

    t = pa.table({
        "g": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([5, 5, 9, 9, 3, 1], pa.int64()),
        "v": pa.array([7, 4, 2, 8, 6, 6], pa.int64()),
    })
    out = (grouped_ohlc(ray.data.from_arrow(t).repartition(3),
                        ["g"], "ts", "v", value_bits=8)
           .to_pandas().sort_values("g").reset_index(drop=True))
    # g=1: min t=5 has values {7,4} -> open=4; max t=9 has {2,8} -> close=2
    assert out.loc[0, ["open", "close", "high", "low", "n"]].tolist() == \
        [4, 2, 8, 2, 4]
    assert out.loc[1, ["open", "close", "high", "low", "n"]].tolist() == \
        [6, 6, 6, 6, 2]

    bad = pa.table({"g": pa.array([1], pa.int64()),
                    "ts": pa.array([0], pa.int64()),
                    "v": pa.array([256], pa.int64())})
    with _pytest.raises(Exception):
        grouped_ohlc(ray.data.from_arrow(bad), ["g"], "ts", "v",
                     value_bits=8).to_pandas()


def test_pagerank_integer_vs_bruteforce(ray_session):
    """Random directed multigraphs against a scalar reference of the
    same integer recurrence; hub/dangling vertices and partition count
    must not change a single ppm."""
    import numpy as np
    import pyarrow as pa

    from osm2geojson_ray.relational import dataset_from_table, pagerank

    def brute(u, v, K=3, scale=1_000_000, dn=85, dd=100):
        es = sorted(set(zip(u, v)))
        verts = sorted({x for e in es for x in e})
        od = {}
        for s, _ in es:
            od[s] = od.get(s, 0) + 1
        r = {x: scale for x in verts}
        base = ((dd - dn) * scale) // dd
        for _ in range(K):
            c = {x: 0 for x in verts}
            for s, d in es:
                c[d] += r[s] // od[s]
            r = {x: base + (dn * c[x]) // dd for x in verts}
        return r

    rng = np.random.default_rng(19)
    for _ in range(3):
        m = int(rng.integers(20, 200))
        nv = int(rng.integers(5, 25))
        u = rng.integers(0, nv, m).astype(np.int64)
        v = rng.integers(0, nv, m).astype(np.int64)
        got = pagerank(
            dataset_from_table(pa.table({"src": u, "dst": v})), "src", "dst"
        ).to_pandas()
        assert dict(zip(got["vertex"], got["rank_ppm"])) == \
            brute(u.tolist(), v.tolist())

    # pure sink (dangling) + hub: hub mass splits, sink accumulates,
    # the dangling vertex contributes nothing back
    u = np.array([0, 0, 0, 1, 2], np.int64)
    v = np.array([1, 2, 3, 3, 3], np.int64)
    got = pagerank(dataset_from_table(pa.table({"src": u, "dst": v})),
                   "src", "dst").to_pandas()
    assert dict(zip(got["vertex"], got["rank_ppm"])) == \
        brute(u.tolist(), v.tolist())


def test_grouped_mad_matches_bruteforce(ray_session):
    """Exact MAD per group equals a scalar percentile_disc recompute
    (rank = max(ceil(0.5*N), 1)) on random integer data, any
    partitioning."""
    import math

    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.relational import grouped_mad

    def disc_median(vals):
        vals = sorted(vals)
        return vals[max(math.ceil(0.5 * len(vals)), 1) - 1]

    rng = np.random.default_rng(23)
    g = rng.integers(0, 4, 500).astype(np.int64)
    v = rng.integers(-50, 200, 500).astype(np.int64)
    t = pa.table({"g": g, "v": v})
    out = (grouped_mad(ray.data.from_arrow(t).repartition(5), "g", "v")
           .to_pandas().sort_values("g").reset_index(drop=True))
    for _, row in out.iterrows():
        vals = v[g == row["g"]].tolist()
        med = disc_median(vals)
        assert row["med"] == med
        assert row["mad"] == disc_median([abs(x - med) for x in vals])
        assert row["n"] == len(vals)


def test_two_hop_counts_vs_bruteforce(ray_session):
    """Random multigraphs vs BFS-2 brute force; star graph: the hub
    reaches all leaves in 1 hop, each leaf reaches hub + all other
    leaves in 2."""
    import numpy as np
    import pyarrow as pa

    from osm2geojson_ray.relational import dataset_from_table, two_hop_counts

    def brute(u, v):
        adj = {}
        for a, b in zip(u, v):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        out = {}
        for x in adj:
            reach = set(adj[x])
            for m in adj[x]:
                reach |= adj[m]
            reach.discard(x)
            out[x] = len(reach)
        return out

    rng = np.random.default_rng(29)
    for _ in range(3):
        m = int(rng.integers(20, 150))
        nv = int(rng.integers(5, 25))
        u = rng.integers(0, nv, m).astype(np.int64)
        v = rng.integers(0, nv, m).astype(np.int64)
        got = two_hop_counts(
            dataset_from_table(pa.table({"u": u, "v": v})), "u", "v"
        ).to_pandas()
        assert dict(zip(got["vertex"], got["n_reach"])) == \
            brute(u.tolist(), v.tolist())

    hub_u = np.zeros(20, np.int64)
    hub_v = np.arange(1, 21, dtype=np.int64)
    got = two_hop_counts(
        dataset_from_table(pa.table({"u": hub_u, "v": hub_v})), "u", "v"
    ).to_pandas()
    d = dict(zip(got["vertex"], got["n_reach"]))
    assert d[0] == 20 and all(d[i] == 20 for i in range(1, 21))


def test_partial_grouped_agg_or_cross_block(ray_session):
    """The 'or' kind must union bits across blocks (associative
    combine through the partial AND final stages)."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.relational import partial_grouped_agg

    rng = np.random.default_rng(31)
    g = rng.integers(0, 3, 300).astype(np.int64)
    bits = np.int64(1) << rng.integers(0, 62, 300).astype(np.int64)
    t = pa.table({"g": g, "w": bits})
    for nblocks in (1, 7):
        out = (partial_grouped_agg(
            ray.data.from_arrow(t).repartition(nblocks),
            ["g"], {"w": ("w", "or")})
            .to_pandas().sort_values("g").reset_index(drop=True))
        for i in range(3):
            assert out.loc[i, "w"] == np.bitwise_or.reduce(bits[g == i])


def test_grouped_hll_registers_match_global(ray_session):
    """Per-group registers restricted to one group equal the global
    sketch over that group's keys (bit-identical splitmix route/rho),
    across partitionings; window max-merge of two days equals the
    sketch of their union."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.relational import grouped_hll_registers, hll_registers

    rng = np.random.default_rng(41)
    g = np.where(rng.random(400) < 0.5, "d1", "d2")
    k = rng.integers(0, 10**9, 400).astype(np.int64)
    t = pa.table({"day": pa.array(g), "user_id": pa.array(k)})

    base = None
    for nparts in (1, 5):
        got = (grouped_hll_registers(
            ray.data.from_arrow(t).repartition(nparts), "day", "user_id")
            .to_pandas().sort_values(["day", "register_idx"])
            .reset_index(drop=True))
        if base is None:
            base = got
        else:
            assert got.equals(base)

    for day in ("d1", "d2"):
        sub = pa.table({"user_id": pa.array(k[g == day])})
        want = (hll_registers(ray.data.from_arrow(sub), "user_id")
                .to_pandas().sort_values("register_idx")
                .reset_index(drop=True))
        have = (base[base["day"] == day][["register_idx", "register"]]
                .reset_index(drop=True))
        assert have.equals(want)

    # merge property: max over the two days' registers == union sketch
    merged = (base.groupby("register_idx", as_index=False)["register"].max())
    union = (hll_registers(ray.data.from_arrow(
        pa.table({"user_id": pa.array(k)})), "user_id")
        .to_pandas().sort_values("register_idx").reset_index(drop=True))
    assert merged.sort_values("register_idx").reset_index(drop=True).equals(union)


def test_props_extract_counts_malformed(ray_session, tmp_path):
    """q52 semantics on planted props: well-formed rows sum their k,
    malformed / missing-key rows count as n_bad and contribute 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm2geojson_ray.queries import q52_props_extract

    t = pa.table({
        "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
        "props": pa.array(['{"k": 7}', 'garbage', '{"j": 5}', '{"k": 11}'],
                          pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (q52_props_extract(str(tmp_path)).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    assert out.loc[0, ["n", "sum_k", "min_k", "max_k", "n_bad"]].tolist() == \
        [3, 7, 0, 7, 2]
    assert out.loc[1, ["n", "sum_k", "min_k", "max_k", "n_bad"]].tolist() == \
        [1, 11, 11, 11, 0]


def test_kcore_vs_bruteforce(ray_session):
    """Random undirected multigraphs (self-loops and parallel edges
    included) against a scalar peel; the result is the unique maximal
    k-core so iteration order can't matter."""
    import numpy as np
    import pyarrow as pa

    from osm2geojson_ray.relational import dataset_from_table, kcore

    def brute(u, v, k):
        es = {(min(a, b), max(a, b)) for a, b in zip(u, v) if a != b}
        verts = {x for e in es for x in e}
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            keep = {x for x in verts if deg.get(x, 0) >= k}
            if keep == verts:
                return {x: deg[x] for x in verts} if verts else {}
            verts = keep
            es = {(a, b) for a, b in es if a in verts and b in verts}

    rng = np.random.default_rng(23)
    for trial in range(4):
        m = int(rng.integers(20, 300))
        nv = int(rng.integers(6, 30))
        u = rng.integers(0, nv, m).astype(np.int64)
        v = rng.integers(0, nv, m).astype(np.int64)
        k = int(rng.integers(2, 5))
        got = kcore(dataset_from_table(pa.table({"a": u, "b": v})), k,
                    a_col="a", b_col="b").to_pandas()
        assert dict(zip(got["vertex"], got["degree"])) == \
            brute(u.tolist(), v.tolist(), k), (trial, k)

    # planted: 5-clique keeps exactly itself at k=3; pendant path peels
    edges = ([(i, j) for i in range(5) for j in range(i + 1, 5)]
             + [(4, 10), (10, 11), (11, 12)])
    ds = dataset_from_table(pa.table(
        {"a": np.array([e[0] for e in edges], np.int64),
         "b": np.array([e[1] for e in edges], np.int64)}))
    got = kcore(ds, 3, a_col="a", b_col="b").to_pandas()
    assert dict(zip(got["vertex"], got["degree"])) == {i: 4 for i in range(5)}
    # no 5-core anywhere -> empty result
    assert kcore(ds, 5, a_col="a", b_col="b").count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        kcore(ds, 0, a_col="a", b_col="b")


def test_sql_ntile_formula_matches_duckdb():
    """The closed-form NTILE used by q60 equals DuckDB's ntile(k) for
    every (n, k) shape class: n % k == 0, n % k != 0, n < k, n == 1."""
    import duckdb
    import numpy as np

    from osm2geojson_ray.queries import _sql_ntile

    con = duckdb.connect()
    for n, k in [(100, 10), (103, 10), (7, 10), (1, 10), (25, 4), (9, 3)]:
        want = [
            r[0]
            for r in con.execute(
                f"SELECT ntile({k}) OVER (ORDER BY range) "
                f"FROM range(0, {n}) ORDER BY range"
            ).fetchall()
        ]
        got = _sql_ntile(np.arange(1, n + 1, dtype=np.int64), n, k)
        assert got.tolist() == want, (n, k)


def test_partitioned_window_cummax_cummin(ray_session):
    """cummax/cummin equal pandas groupby scans on shuffled input with
    multi-group boundaries and negative values, across partition
    counts."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray
    from osm2geojson_ray.relational import partitioned_window

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "o": rng.permutation(n),
        "v": rng.integers(-1000, 1000, n),
    })
    want = df.sort_values(["k", "o"]).groupby("k")["v"]
    want_max = want.cummax().to_numpy()
    want_min = want.cummin().to_numpy()
    idx = df.sort_values(["k", "o"]).index

    for nparts in (1, 4):
        got = partitioned_window(
            ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(nparts),
            "k", [("o", False)],
            {"hwm": ("v", "cummax"), "lwm": ("v", "cummin")},
        ).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
        assert got["hwm"].to_numpy().tolist() == want_max.tolist()
        assert got["lwm"].to_numpy().tolist() == want_min.tolist()
        assert got["v"].to_numpy().tolist() == df.loc[idx, "v"].tolist()


def test_ordered_prefix_scan_matches_numpy(ray_session):
    """Global exclusive prefix scan (max and sum) equals the single-
    process numpy scan in total order, independent of partition count
    and of the order the rows arrive in."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.relational import ordered_prefix_scan

    rng = np.random.RandomState(7)
    n = 5000
    order = rng.permutation(n).astype(np.int64)  # dense, shuffled
    vals = rng.randint(-1000, 1000, size=n).astype(np.int64)
    t = pa.table({"o": order, "v": vals})

    srt = np.argsort(order)
    v_sorted = vals[srt]
    want_max = np.empty(n, dtype=np.int64)
    want_max[srt] = np.r_[np.int64(np.iinfo(np.int64).min),
                          np.maximum.accumulate(v_sorted)[:-1]]
    want_sum = np.empty(n, dtype=np.int64)
    want_sum[srt] = np.r_[np.int64(0), np.add.accumulate(v_sorted)[:-1]]

    for nparts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nparts)
        for combine, want in (("max", want_max), ("sum", want_sum)):
            got = ordered_prefix_scan(
                ds, "o", "v", combine=combine, num_bands=9, out_col="scan"
            ).to_pandas().sort_values("o")
            np.testing.assert_array_equal(
                got["scan"].to_numpy(), want[srt],
                err_msg=f"{combine} nparts={nparts}",
            )


def test_bfs_hops_matches_python_bfs(ray_session):
    import ray.data

    from osm2geojson_ray.relational import bfs_hops

    rng = np.random.default_rng(5)
    # random sparse graph over ids 0..199 (several vertices % 16 == 0)
    a = rng.integers(0, 200, size=300).astype(np.int64)
    b = rng.integers(0, 200, size=300).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"a": a, "b": b})).repartition(4)

    rounds = 4
    got = (
        bfs_hops(ds, a_col="a", b_col="b", source_mod=16, rounds=rounds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    # oracle: plain BFS from all sources, truncated at `rounds` hops
    from collections import deque

    adj = {}
    verts = set()
    for u, v in zip(a.tolist(), b.tolist()):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
        verts.update((u, v))
    dist = {v: 0 for v in verts if v % 16 == 0}
    dq = deque(dist)
    while dq:
        u = dq.popleft()
        if dist[u] >= rounds:
            continue
        for w in adj.get(u, ()):
            if w not in dist:
                dist[w] = dist[u] + 1
                dq.append(w)
    want = sorted(dist.items())
    assert list(zip(got["node"], got["dist"])) == want


def test_bfs_hops_no_sources_empty(ray_session):
    import ray.data

    from osm2geojson_ray.relational import bfs_hops

    ds = ray.data.from_arrow(
        pa.table({"a": np.array([1, 3], np.int64),
                  "b": np.array([5, 7], np.int64)})
    )
    assert bfs_hops(ds, source_mod=16, rounds=3).count() == 0
