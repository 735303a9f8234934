"""As-of join: kernel vs brute force, dataset op vs pandas merge_asof,
partition-count independence, null/empty robustness."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from osm2geojson_ray.temporal import _asof_merge_indices, asof_join

L_SCHEMA = pa.schema(
    [("k", pa.int64()), ("ts", pa.int64()), ("lv", pa.float64())]
)
R_SCHEMA = pa.schema(
    [("k", pa.int64()), ("ts", pa.int64()), ("rv", pa.int64())]
)


def test_kernel_matches_bruteforce():
    rng = np.random.RandomState(0)
    for trial in range(120):
        nl, nr = rng.randint(0, 30), rng.randint(0, 30)
        lk = rng.randint(0, 5, nl).astype(np.int64)
        rk = rng.randint(0, 5, nr).astype(np.int64)
        lts = rng.randint(0, 25, nl).astype(np.int64)
        rts = rng.randint(0, 25, nr).astype(np.int64)
        for strict in (False, True):
            match = _asof_merge_indices(lk, lts, rk, rts, strict)
            for i in range(nl):
                mask = (rk == lk[i]) & ((rts < lts[i]) if strict else (rts <= lts[i]))
                if not mask.any():
                    assert match[i] == -1
                else:
                    best = rts[mask].max()
                    cands = np.flatnonzero(mask & (rts == best))
                    assert match[i] == cands.max()  # last-row tie-break


def _pandas_asof(ldf, rdf, strict):
    ldf = ldf.sort_values("ts", kind="stable").reset_index(drop=True)
    rdf = (
        rdf.dropna()
        .sort_values(["ts", "rv"], kind="stable")  # last-row tie-break
        .reset_index(drop=True)
    )
    out = pd.merge_asof(
        ldf,
        rdf.rename(columns={"ts": "ts_r", "rv": "rv_r"}),
        left_on="ts",
        right_on="ts_r",
        left_by="k",
        right_by="k",
        allow_exact_matches=not strict,
        direction="backward",
    )
    return out


def _run_asof(ldf, rdf, strict, nparts):
    out = asof_join(
        ray.data.from_arrow(pa.Table.from_pandas(ldf, schema=L_SCHEMA)),
        ray.data.from_arrow(pa.Table.from_pandas(rdf, schema=R_SCHEMA)),
        by="k",
        on="ts",
        l_schema=L_SCHEMA,
        r_schema=R_SCHEMA,
        strict=strict,
        num_partitions=nparts,
    )
    return out.to_pandas()


def test_asof_join_matches_pandas(ray_session):
    rng = np.random.RandomState(7)
    nl, nr = 400, 300
    ldf = pd.DataFrame(
        {
            "k": rng.randint(0, 20, nl).astype(np.int64),
            "ts": rng.randint(0, 10_000, nl).astype(np.int64),
            "lv": rng.rand(nl),
        }
    )
    # unique (k, ts) on the right so merge_asof tie-break is moot
    rdf = pd.DataFrame(
        {
            "k": rng.randint(0, 20, nr).astype(np.int64),
            "ts": rng.randint(0, 10_000, nr).astype(np.int64),
            "rv": np.arange(nr, dtype=np.int64),
        }
    ).drop_duplicates(["k", "ts"])
    for strict in (False, True):
        got = (
            _run_asof(ldf, rdf, strict, 4)
            .sort_values(["k", "ts", "lv"], kind="stable")
            .reset_index(drop=True)
        )
        want = (
            _pandas_asof(ldf, rdf, strict)
            .sort_values(["k", "ts", "lv"], kind="stable")
            .reset_index(drop=True)
        )
        for col in ("k", "ts", "lv", "ts_r", "rv_r"):
            pd.testing.assert_series_equal(
                got[col], want[col], check_names=False, check_dtype=False
            )


def test_asof_join_partition_count_independent(ray_session):
    rng = np.random.RandomState(11)
    ldf = pd.DataFrame(
        {
            "k": rng.randint(0, 7, 100).astype(np.int64),
            "ts": rng.randint(0, 50, 100).astype(np.int64),
            "lv": rng.rand(100),
        }
    )
    rdf = pd.DataFrame(
        {
            "k": rng.randint(0, 7, 80).astype(np.int64),
            "ts": rng.randint(0, 50, 80).astype(np.int64),
            "rv": np.arange(80, dtype=np.int64),
        }
    )
    outs = [
        _run_asof(ldf, rdf, False, p)
        .sort_values(["k", "ts", "lv"], kind="stable")
        .reset_index(drop=True)
        for p in (1, 3, 8)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_asof_join_nulls_and_empty(ray_session):
    ldf = pd.DataFrame(
        {"k": pd.array([1, None, 2], dtype="Int64"),
         "ts": pd.array([5, 5, None], dtype="Int64"),
         "lv": [0.1, 0.2, 0.3]}
    )
    rdf = pd.DataFrame(
        {"k": pd.array([1, 2], dtype="Int64"),
         "ts": pd.array([3, None], dtype="Int64"),
         "rv": pd.array([10, 20], dtype="Int64")}
    )
    out = _run_asof(ldf, rdf, False, 3).sort_values("lv").reset_index(drop=True)
    # row 0: k=1 matches rv=10; rows 1-2: null key / null ts stay unmatched
    assert len(out) == 3
    assert out.loc[0, "rv_r"] == 10
    assert pd.isna(out.loc[1, "rv_r"]) and pd.isna(out.loc[2, "rv_r"])
    # empty right: all left rows kept, nulls
    empty_r = pd.DataFrame({"k": pd.array([], dtype="Int64"),
                            "ts": pd.array([], dtype="Int64"),
                            "rv": pd.array([], dtype="Int64")})
    out2 = _run_asof(ldf, empty_r, False, 2)
    assert len(out2) == 3 and out2["rv_r"].isna().all()


def test_asof_bigint_keys_survive_nulls(ray_session):
    """A null in the 'by'/'on' column must NOT route extraction through
    float64 (which rounds int64 keys above 2^53 and mis-joins)."""
    big = (1 << 60) + 1  # not representable in float64
    ldf = pd.DataFrame(
        {
            "k": pd.array([big, big + 1, None, big], dtype="Int64"),
            "ts": pd.array([10, 10, 10, None], dtype="Int64"),
            "lv": [1.0, 2.0, 3.0, 4.0],
        }
    )
    rdf = pd.DataFrame(
        {
            "k": pd.array([big, big + 1], dtype="Int64"),
            "ts": pd.array([5, 5], dtype="Int64"),
            "rv": pd.array([100, 200], dtype="Int64"),
        }
    )
    out = asof_join(
        ray.data.from_arrow(pa.Table.from_pandas(ldf, schema=L_SCHEMA)),
        ray.data.from_arrow(pa.Table.from_pandas(rdf, schema=R_SCHEMA)),
        by="k", on="ts", l_schema=L_SCHEMA, r_schema=R_SCHEMA,
        num_partitions=3,
    ).to_pandas()
    by_lv = {row.lv: row for row in out.itertuples()}
    assert by_lv[1.0].rv_r == 100      # exact key match, no float rounding
    assert by_lv[2.0].rv_r == 200      # adjacent key must not collide
    assert pd.isna(by_lv[3.0].rv_r)    # null key stays unmatched
    assert pd.isna(by_lv[4.0].rv_r)    # null ts stays unmatched


# ---------------------------------------------------------------- interval join
def _brute_interval_counts(pt, iv_s, iv_e):
    return [int(((pt >= s) & (pt < e)).sum()) for s, e in zip(iv_s, iv_e)]


def test_interval_count_join_matches_bruteforce(ray_session):
    from osm2geojson_ray.temporal import interval_count_join

    rng = np.random.RandomState(7)
    npts, niv = 400, 60
    pt = rng.randint(0, 1000, npts).astype(np.int64)
    s = rng.randint(-50, 1000, niv).astype(np.int64)
    # mix: empty (e <= s), short, long (span many bands), negative starts
    e = s + rng.choice([0, 1, 7, 40, 333], niv).astype(np.int64)
    pts = ray.data.from_arrow(pa.table({"t": pa.array(pt)})).repartition(5)
    iv = ray.data.from_arrow(
        pa.table({"iid": pa.array(np.arange(niv)), "s": pa.array(s), "e": pa.array(e)})
    ).repartition(3)
    for band in (16, 1000):
        out = (
            interval_count_join(
                pts, iv, t="t", start="s", end="e", id_col="iid",
                band_width=band, out_col="n", num_partitions=4,
            )
            .to_pandas()
            .sort_values("iid")
            .reset_index(drop=True)
        )
        assert len(out) == niv  # left-outer: every interval, zeros included
        assert out["n"].tolist() == _brute_interval_counts(pt, s, e)


def test_interval_count_join_nulls_and_empty(ray_session):
    from osm2geojson_ray.temporal import interval_count_join

    pts = ray.data.from_arrow(
        pa.table({"t": pa.array([5, None, 15], pa.int64())})
    )
    iv = ray.data.from_arrow(
        pa.table(
            {
                "iid": pa.array([1, 2, 3], pa.int64()),
                "s": pa.array([0, None, 10], pa.int64()),
                "e": pa.array([10, 20, 10], pa.int64()),
            }
        )
    )
    out = (
        interval_count_join(
            pts, iv, t="t", start="s", end="e", id_col="iid",
            band_width=8, out_col="n", num_partitions=2,
        )
        .to_pandas()
        .sort_values("iid")
        .reset_index(drop=True)
    )
    # null start drops interval 2; empty interval 3 survives with 0
    assert out["iid"].tolist() == [1, 3]
    assert out["n"].tolist() == [1, 0]

    empty = interval_count_join(
        ray.data.from_arrow(pa.table({"t": pa.array([], pa.int64())})),
        ray.data.from_arrow(
            pa.table({"iid": pa.array([], pa.int64()), "s": pa.array([], pa.int64()),
                      "e": pa.array([], pa.int64())})
        ),
        t="t", start="s", end="e", id_col="iid", band_width=8, out_col="n",
    )
    assert empty.count() == 0


def test_grouped_topk_matches_pandas(ray_session):
    from osm2geojson_ray.relational import grouped_topk

    rng = np.random.RandomState(3)
    n = 500
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 20, n).astype(np.int64),
            "v": rng.randint(0, 9, n).astype(np.float64),  # many ties
            "uid": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    for k in (1, 3, 100):
        got = (
            grouped_topk(ds, "g", [("v", True), ("uid", False)], k=k, num_partitions=4)
            .to_pandas()
            .sort_values(["g", "uid"])
            .reset_index(drop=True)
        )
        want = (
            df.sort_values(["g", "v", "uid"], ascending=[True, False, True])
            .groupby("g", sort=True)
            .head(k)
            .sort_values(["g", "uid"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["g", "v", "uid"]], want[["g", "v", "uid"]])


def test_hopping_window_agg(ray_session):
    from osm2geojson_ray.temporal import hopping_window_agg

    # negative times exercise floor division; a null row must vanish
    tv = np.array([-7, -1, 0, 3, 9, 10], dtype=np.int64)
    tbl = pa.table(
        {"t": pa.array(list(tv) + [None], pa.int64()),
         "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 99.0])}
    )
    out = (
        hopping_window_agg(
            ray.data.from_arrow(tbl).repartition(3),
            t="t", width=6, hop=3,
            aggs={"s": ("v", "sum"), "n": (None, "count")},
        )
        .to_pandas()
        .sort_values("w_start")
        .reset_index(drop=True)
    )
    # brute force: window w contains t iff w <= t < w+6, w in 3Z
    want = {}
    for t_i, v in zip(tv, [1.0, 2.0, 4.0, 8.0, 16.0, 32.0]):
        for w in range(((int(t_i) - 6) // 3 + 1) * 3, int(t_i) + 1, 3):
            s, n = want.get(w, (0.0, 0))
            want[w] = (s + v, n + 1)
    assert out["w_start"].tolist() == sorted(want)
    assert out["s"].tolist() == [want[w][0] for w in sorted(want)]
    assert out["n"].tolist() == [want[w][1] for w in sorted(want)]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        hopping_window_agg(ray.data.from_arrow(tbl), t="t", width=7, hop=3, aggs={"n": (None, "count")})


def test_interval_count_join_bigint_times(ray_session):
    """Times above 2^53 (epoch-nanos scale) must not round through
    float64: the padded union columns hold nulls on the other side's
    rows, so a naive whole-column to_numpy would corrupt them."""
    from osm2geojson_ray.temporal import interval_count_join

    base = 4_611_686_018_427_387_904  # 2^62
    pt = np.array([base + 1, base + 2, base + 5], dtype=np.int64)
    s = np.array([base + 1, base + 3], dtype=np.int64)
    e = np.array([base + 3, base + 6], dtype=np.int64)
    out = (
        interval_count_join(
            ray.data.from_arrow(pa.table({"t": pa.array(pt)})),
            ray.data.from_arrow(
                pa.table({"iid": pa.array([1, 2], pa.int64()),
                          "s": pa.array(s), "e": pa.array(e)})
            ),
            t="t", start="s", end="e", id_col="iid",
            band_width=4, out_col="n", num_partitions=2,
        )
        .to_pandas()
        .sort_values("iid")
        .reset_index(drop=True)
    )
    # interval 1 = [base+1, base+3) -> {base+1, base+2}; interval 2 = [base+3, base+6) -> {base+5}
    assert out["iid"].tolist() == [1, 2]
    assert out["n"].tolist() == [2, 1]


def _asof_pair_sets(out_df):
    return sorted(
        map(tuple, out_df.fillna(-999).to_numpy().tolist())
    )


def test_asof_join_banded_matches_plain(ray_session):
    """Banded (hot-key) as-of == plain as-of on tie-free inputs, across
    band widths and strictness."""
    from osm2geojson_ray.temporal import asof_join_banded

    rng = np.random.RandomState(7)
    nl, nr = 400, 300
    lk = rng.randint(0, 6, nl).astype(np.int64)
    rk = rng.randint(0, 6, nr).astype(np.int64)
    lts = rng.permutation(10_000)[:nl].astype(np.int64)
    rts = (rng.permutation(10_000)[:nr] + 10_000).astype(np.int64)
    rts[: nr // 2] -= 10_000  # half the right rows in the left's range
    lds = ray.data.from_arrow(pa.table(
        {"k": lk, "ts": lts, "lv": rng.rand(nl)})).repartition(5)
    rds = ray.data.from_arrow(pa.table(
        {"k": rk, "ts": rts, "rv": rng.randint(0, 99, nr).astype(np.int64)}
    )).repartition(3)

    for strict in (False, True):
        for bw in (64, 1000, 10**9):  # 10^9: everything in one band
            want = asof_join(
                lds, rds, by="k", on="ts", l_schema=L_SCHEMA,
                r_schema=R_SCHEMA, strict=strict,
            ).to_pandas()
            got = asof_join_banded(
                lds, rds, by="k", on="ts", band_width=bw,
                l_schema=L_SCHEMA, r_schema=R_SCHEMA, strict=strict,
            ).to_pandas()
            assert _asof_pair_sets(got) == _asof_pair_sets(want), (strict, bw)


def test_asof_join_banded_hot_key_spreads(ray_session):
    """One key holding 90% of both sides: the banded routing keeps
    every partition's share bounded (the plain by-key routing would put
    90% of all rows in ONE partition), and the result is still exact."""
    from osm2geojson_ray.temporal import _band_route, asof_join_banded

    rng = np.random.RandomState(3)
    n = 20_000
    hot = int(n * 0.9)
    lk = np.concatenate([np.full(hot, 42), rng.randint(100, 120, n - hot)]).astype(np.int64)
    lts = rng.permutation(n * 4)[:n].astype(np.int64)
    rk = lk.copy()
    rts = rng.permutation(n * 4)[:n].astype(np.int64)
    P, BW = 16, 1024

    # routing bound: no partition sees more than 3x its fair share
    band = lts // BW
    parts = _band_route(lk, band) % P
    counts = np.bincount(parts, minlength=P)
    assert counts.max() <= 3 * (n / P), counts.max()

    lds = ray.data.from_arrow(pa.table(
        {"k": lk, "ts": lts, "lv": np.arange(n, dtype=np.float64)})).repartition(8)
    rds = ray.data.from_arrow(pa.table(
        {"k": rk, "ts": rts, "rv": np.arange(n, dtype=np.int64)})).repartition(8)
    got = asof_join_banded(
        lds, rds, by="k", on="ts", band_width=BW,
        l_schema=L_SCHEMA, r_schema=R_SCHEMA, num_partitions=P,
    ).to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)

    # pandas merge_asof oracle
    ldf = pd.DataFrame({"k": lk, "ts": lts, "lv": np.arange(n, dtype=np.float64)}).sort_values("ts")
    rdf = pd.DataFrame({"k": rk, "ts": rts, "rv": np.arange(n, dtype=np.int64)}).sort_values("ts")
    want = pd.merge_asof(ldf, rdf, on="ts", by="k", suffixes=("", "_r")) \
        .rename(columns={"rv": "rv_r"}) if False else pd.merge_asof(
            ldf, rdf, on="ts", by="k")
    want = want.rename(columns={"rv": "rv_r"})
    want["ts_r"] = want["ts"].where(want["rv_r"].notna(), np.nan)
    # merge_asof doesn't emit the matched right ts; check k/ts/lv/rv_r
    want = want.sort_values(["k", "ts"]).reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["ts"].tolist() == want["ts"].tolist()
    assert got["lv"].tolist() == want["lv"].tolist()
    g = got["rv_r"].fillna(-1).astype(int).tolist()
    w = want["rv_r"].fillna(-1).astype(int).tolist()
    assert g == w


def test_asof_join_banded_nulls_and_empty(ray_session):
    from osm2geojson_ray.temporal import asof_join_banded

    lds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 2, 1], pa.int64()),
        "ts": pa.array([10, 5, None, 100], pa.int64()),
        "lv": pa.array([0.5, 1.5, 2.5, 3.5]),
    }))
    rds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, None], pa.int64()),
        "ts": pa.array([8, None, 3], pa.int64()),
        "rv": pa.array([7, 8, 9], pa.int64()),
    }))
    got = asof_join_banded(
        lds, rds, by="k", on="ts", band_width=16,
        l_schema=L_SCHEMA, r_schema=R_SCHEMA,
    ).to_pandas().sort_values("lv").reset_index(drop=True)
    assert len(got) == 4
    # k=1/ts=10 and k=1/ts=100 match rv=7 (ts=8, earlier band for 100);
    # null-key/null-ts lefts and k=2 stay unmatched
    assert got["rv_r"].fillna(-1).astype(int).tolist() == [7, -1, -1, 7]

    empty_r = ray.data.from_arrow(R_SCHEMA.empty_table())
    got2 = asof_join_banded(
        lds, empty_r, by="k", on="ts", band_width=16,
        l_schema=L_SCHEMA, r_schema=R_SCHEMA,
    ).to_pandas()
    assert len(got2) == 4 and got2["rv_r"].isna().all()


def test_interval_coverage_merge_touch_gap(ray_session):
    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.temporal import interval_coverage

    t = pa.table({
        "u": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        # u=1: [0,10] + [5,20] overlap -> [0,20]; [20,30] touches -> merge;
        #      [40,41] gap -> 2nd island.  u=2: disjoint.  u=3: zero-length.
        "s": pa.array([0, 5, 20, 40, 100, 300, 7], pa.int64()),
        "e": pa.array([10, 20, 30, 41, 200, 400, 7], pa.int64()),
    })
    out = (
        interval_coverage(ray.data.from_arrow(t), by="u",
                          start_col="s", end_col="e")
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    assert out["covered"].tolist() == [31, 200, 0]
    assert out["n_islands"].tolist() == [2, 2, 1]


def test_interval_coverage_matches_bruteforce_across_blocks(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.temporal import interval_coverage

    rng = np.random.default_rng(11)
    n = 3000
    u = rng.integers(0, 40, n).astype(np.int64)
    s = rng.integers(0, 10_000, n).astype(np.int64)
    e = s + rng.integers(0, 500, n).astype(np.int64)
    blocks = [
        pa.table({"u": u[i::3], "s": s[i::3], "e": e[i::3]}) for i in range(3)
    ]
    out = (
        interval_coverage(ray.data.from_arrow(blocks), by="u",
                          start_col="s", end_col="e", num_partitions=7)
        .to_pandas().sort_values("u").reset_index(drop=True)
    )

    # brute force per group
    want_cov, want_isl, want_u = [], [], []
    for g in sorted(set(u.tolist())):
        iv = sorted(zip(s[u == g].tolist(), e[u == g].tolist()))
        cov = isl = 0
        cur_s, cur_e = None, None
        for a, b in iv:
            if cur_e is None or a > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                cur_s, cur_e, isl = a, b, isl + 1
            else:
                cur_e = max(cur_e, b)
        if cur_e is not None:
            cov += cur_e - cur_s
        want_u.append(g); want_cov.append(cov); want_isl.append(isl)
    assert out["u"].tolist() == want_u
    assert out["covered"].tolist() == want_cov
    assert out["n_islands"].tolist() == want_isl


def test_interval_coverage_validates_and_overflows(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from osm2geojson_ray.temporal import interval_coverage

    bad = pa.table({"u": pa.array([1], pa.int64()),
                    "s": pa.array([5], pa.int64()),
                    "e": pa.array([4], pa.int64())})
    with pytest.raises(Exception, match="start > end"):
        interval_coverage(ray.data.from_arrow(bad), by="u",
                          start_col="s", end_col="e").materialize()

    # packed-key overflow guard: huge span x many groups raises loudly
    n = 4096
    wide = pa.table({
        "u": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array(np.zeros(n, dtype=np.int64)),
        "e": pa.array(np.full(n, (1 << 52), dtype=np.int64)),
    })
    with pytest.raises(Exception, match="overflow"):
        interval_coverage(ray.data.from_arrow(wide), by="u",
                          start_col="s", end_col="e",
                          num_partitions=1).materialize()


def test_status_periods_vs_bruteforce(ray_session):
    """Random per-group status streams (duplicate timestamps broken by
    order_col) against a scalar run-collapse; partition count must not
    change a row."""
    import numpy as np
    import pyarrow as pa
    import ray

    from osm2geojson_ray.temporal import status_periods

    rng = np.random.default_rng(31)
    n = 400
    g = rng.integers(0, 12, n).astype(np.int64)
    ts = rng.integers(0, 40, n).astype(np.int64)  # many ties
    st = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    eid = np.arange(n, dtype=np.int64)
    rng.shuffle(eid)  # order_col independent of row order

    def brute():
        rows = sorted(zip(g, ts, eid, st), key=lambda r: (r[0], r[1], r[2]))
        out = []
        for gg, tt, _, ss in rows:
            if out and out[-1][0] == gg and out[-1][1] == ss:
                out[-1][3] = tt
                out[-1][4] += 1
            else:
                out.append([gg, ss, tt, tt, 1])
        return sorted(tuple(r) for r in out)

    expect = brute()
    tbl = pa.table({"u": g, "t": ts, "st": st, "eid": eid})
    for parts in (1, 3, 16):
        got = status_periods(
            ray.data.from_arrow(tbl).repartition(4), by="u", on="t",
            status_col="st", order_col="eid", num_partitions=parts,
        ).to_pandas()
        rows = sorted(
            tuple(r) for r in got[
                ["u", "status", "start_on", "end_on", "n_events"]
            ].itertuples(index=False))
        assert rows == expect, parts

    # empty input keeps the schema
    empty = status_periods(
        ray.data.from_arrow(tbl.slice(0, 0)), by="u", on="t",
        status_col="st", order_col="eid")
    assert empty.count() == 0
