"""Driver-facing query suite: every entry pairs a Ray Data pipeline
with (where expressible) an ANSI-SQL oracle DuckDB runs on the same
parquet tables (see __ray_entry__.py).

Column names match the oracle SQL exactly (the driver hashes values
after sorting columns by name).  Float aggregates are rounded on BOTH
sides so distributed summation order can't flip the value hash.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

REFERENCE_DATA = "/root/reference/tests/data"
CELL_LEVEL = 12
TILE_LEVEL = 8


def _pq(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _int_scale_cols(ds, spec: Dict[str, tuple]):
    """Replace float columns with integer-scaled versions so the value
    hash can't be flipped by engine-specific double formatting:
    spec = {old_col: (new_col, scale, "round"|"floor")}.  Sums of
    2-decimal values scaled by 100 are integers up to ~1e-7 noise, so
    round() is exact; pure ratios are identical doubles in both engines,
    so floor() is exact."""

    def fn(t: pa.Table) -> pa.Table:
        for col, (new, scale, mode) in spec.items():
            idx = t.column_names.index(col)
            arr = t[col].to_numpy(zero_copy_only=False) * scale
            arr = np.round(arr) if mode == "round" else np.floor(arr)
            t = t.set_column(idx, new, pa.array(arr.astype(np.int64)))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def _splitmix_over(key_expr: str, src: str) -> str:
    """CTE chain computing splitmix64(key) as h64 for every row of
    ``src`` (key carried through as k) — HUGEINT arithmetic with 2^64
    wraparound, the same technique as _SPLITMIX_PHASE_CTE but keyed on
    a table column instead of range().  Keys must be non-negative."""
    return f"""
sm0 AS (SELECT {key_expr} AS k,
        (CAST({key_expr} AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS z FROM {src}),
sm1 AS (SELECT k, xor(z, z // 1073741824) AS z1 FROM sm0),
smm1 AS (SELECT k,
  ( (z1 % 4294967296) * 13787848793156543929
    + ((z1 // 4294967296) * 13787848793156543929 % 4294967296) * 4294967296
  ) % 18446744073709551616 AS z2 FROM sm1),
sm2 AS (SELECT k, xor(z2, z2 // 134217728) AS z3 FROM smm1),
smm2 AS (SELECT k,
  ( (z3 % 4294967296) * 10723151780598845931
    + ((z3 // 4294967296) * 10723151780598845931 % 4294967296) * 4294967296
  ) % 18446744073709551616 AS z4 FROM sm2),
smfin AS (SELECT k, xor(z4, z4 // 2147483648) AS h64 FROM smm2)
"""


# ---------------------------------------------------------------- TPC-H-ish
def q1_pricing_summary(sf_dir: str):
    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    from .relational import partial_grouped_agg

    # combiner push-down: each batch reduces to <=6 partial rows, so raw
    # lineitem rows never shuffle
    out = partial_grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "count_order": (None, "count"),
        },
    )
    return _int_scale_cols(
        out,
        {
            "sum_qty": ("sum_qty", 1, "round"),
            "sum_base_price": ("sum_base_price_cents", 100, "round"),
            "sum_disc_price": ("sum_disc_price_cents", 100, "round"),
        },
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
       CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_base_price_cents,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_price_cents,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q2_segment_revenue(sf_dir: str):
    from .relational import hash_join

    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.Table.from_arrays([t["o_custkey"], t["o_totalprice"]],
                                       names=["custkey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.Table.from_arrays([t["c_custkey"], t["c_mktsegment"]],
                                       names=["custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        orders,
        cust,
        on="custkey",
        l_schema=pa.schema([("custkey", pa.int64()), ("o_totalprice", pa.float64())]),
        r_schema=pa.schema([("custkey", pa.int64()), ("c_mktsegment", pa.string())]),
        how="inner",
        num_partitions=16,
    )
    from .relational import partial_grouped_agg

    out = partial_grouped_agg(
        joined,
        ["c_mktsegment"],
        {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")},
    )
    return _int_scale_cols(out, {"revenue": ("revenue_cents", 100, "round")})


Q2_SQL = """
SELECT c_mktsegment,
       CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue_cents,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q3_topk_orders(sf_dir: str):
    """Top-10 orders by price WITHOUT a global sort: per-block lexsort
    top-k + one concat reduce (relational.topk) — a global Dataset.sort
    for a LIMIT 10 is an all-to-all shuffle with fixed seconds of
    sample/sort latency at any scale."""
    from .relational import topk

    return topk(
        _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        [("o_totalprice", True), ("o_orderkey", False)],
        k=10,
    )


Q3_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q4_events_daily(sf_dir: str):
    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        return pa.Table.from_arrays([day, t["event_type"], t["value"]],
                                    names=["day", "event_type", "value"])

    from .relational import partial_grouped_agg

    out = partial_grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["event_type", "day"],
        {"sum_value": ("value", "sum"), "n_events": (None, "count")},
    )
    return _int_scale_cols(out, {"sum_value": ("sum_value_cents", 100, "round")})


Q4_SQL = """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_cents, count(*) AS n_events
FROM events GROUP BY event_type, day
"""


def q16_pivot_events_daily(sf_dir: str):
    """PIVOT: one row per day, one count column per event type — wide
    conditional aggregation expressed as vectorized per-batch masked
    partials + the usual tiny combiner reduce (no per-type scans, no
    shuffle of raw rows)."""
    from .relational import partial_grouped_agg

    types = ["click", "error", "purchase", "signup", "view"]
    ds = _pq(sf_dir, "events", ["ts", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        cols = {"day": day}
        for et in types:
            cols["n_" + et] = pc.cast(
                pc.equal(t["event_type"], et), pa.int64()
            )
        return pa.table(cols)

    return partial_grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["day"],
        {("n_" + et): ("n_" + et, "sum") for et in types},
    )


Q16_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY day
"""


def q17_value_stats(sf_dir: str):
    """Grouped mean / population variance / stddev from sufficient
    statistics (n, Σx, Σx²) — ONE pass, raw rows never shuffle, the
    classic distributed-moments aggregate.  Both engines evaluate the
    SAME explicit formula (var = Σx²/n − (Σx/n)²) so the only
    divergence is summation order (~1e-12 relative); scales are chosen
    so that noise cannot cross a rounding boundary."""
    from .relational import partial_grouped_agg

    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def derive(t: pa.Table) -> pa.Table:
        x = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"event_type": t["event_type"].combine_chunks(),
             "x": pa.array(x), "x2": pa.array(x * x)}
        )

    agg = partial_grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["event_type"],
        {"n": (None, "count"), "s1": ("x", "sum"), "s2": ("x2", "sum")},
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t["s1"].to_numpy(zero_copy_only=False)
        s2 = t["s2"].to_numpy(zero_copy_only=False)
        mean = s1 / n
        var = s2 / n - mean * mean
        std = np.sqrt(np.maximum(var, 0))

        def half_away(v, scale):
            v = v * scale
            return pa.array((np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64))

        return pa.table(
            {"event_type": t["event_type"], "n": t["n"],
             "mean_1e4": half_away(mean, 1e4),
             "var_1e2": half_away(var, 1e2),
             "std_1e4": half_away(std, 1e4)}
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


Q17_SQL = """
WITH s AS (
  SELECT event_type, count(*) AS n, sum(value) AS s1, sum(value * value) AS s2
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       CAST(round(s1 / n * 10000) AS BIGINT) AS mean_1e4,
       CAST(round((s2 / n - (s1 / n) * (s1 / n)) * 100) AS BIGINT) AS var_1e2,
       CAST(round(sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0)) * 10000) AS BIGINT) AS std_1e4
FROM s
"""


def q18_hll_user_registers(sf_dir: str):
    """HyperLogLog sketch registers over event user ids — the
    mergeable approximate-COUNT-DISTINCT sketch, emitted as its
    (register_idx, register) rows: pure integers, deterministically
    reproducible, so the DuckDB oracle recomputes the ENTIRE sketch
    exactly (no approximate-vs-exact fudge in the gate; accuracy vs
    the true cardinality is asserted separately in pytest)."""
    from .relational import hll_registers

    return hll_registers(_pq(sf_dir, "events", ["user_id"]), "user_id", p=12)


# p=12: idx = h % 4096, w = h // 4096 (52-bit stream), rho = w==0 ? 53
# : 52 - floor(log2(w)); w < 2^52 is exactly representable in DOUBLE so
# floor(log2()) is boundary-exact
Q18_SQL = f"""
WITH {_splitmix_over("user_id", "(SELECT DISTINCT user_id FROM events)")}
SELECT CAST(h64 % 4096 AS BIGINT) AS register_idx,
       max(CASE WHEN h64 // 4096 = 0 THEN 53
                ELSE 52 - CAST(floor(log2(CAST(h64 // 4096 AS DOUBLE))) AS BIGINT)
           END) AS register
FROM smfin GROUP BY 1
"""


def q51_sliding_hll_users(sf_dir: str):
    """3-day sliding-window distinct-user sketches — the register
    max-merge that replaces a raw re-scan per window at scale:
    per-day HLL registers (relational.grouped_hll_registers,
    bit-identical to q18's sketch), then ONE window merge over the
    tiny #days x registers table (collected driver-side — it is
    sketch-, not data-, sized by construction).  Gate: exact
    (day, register_idx, register) per window; the estimate is a
    deterministic function of these gated integers."""
    from .relational import dataset_from_table, grouped_hll_registers

    ev = _pq(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda t: pa.table({
            "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
            "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )
    daily = grouped_hll_registers(ev, "day", "user_id", p=12).to_pandas()

    import datetime as _dt

    import pandas as pd

    days = sorted(daily["day"].unique())
    by_day = {d: g for d, g in daily.groupby("day")}
    out = []
    for d in days:
        dd = _dt.date.fromisoformat(d)
        frames = [by_day[x] for x in
                  (str(dd - _dt.timedelta(days=k)) for k in range(3))
                  if x in by_day]
        merged = (pd.concat(frames)
                  .groupby("register_idx", as_index=False)["register"].max())
        merged.insert(0, "day", d)
        out.append(merged)
    res = pd.concat(out, ignore_index=True)
    res["register_idx"] = res["register_idx"].astype("int64")
    res["register"] = res["register"].astype("int64")
    return dataset_from_table(pa.Table.from_pandas(res, preserve_index=False))


Q51_SQL = f"""
WITH du AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
            FROM events),
{_splitmix_over("user_id", "(SELECT DISTINCT user_id FROM events)")},
r AS (SELECT du.day, CAST(h64 % 4096 AS BIGINT) AS register_idx,
             max(CASE WHEN h64 // 4096 = 0 THEN 53
                      ELSE 52 - CAST(floor(log2(CAST(h64 // 4096 AS DOUBLE)))
                                     AS BIGINT)
                 END) AS register
      FROM du JOIN smfin ON smfin.k = du.user_id GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM r)
SELECT d.day, r.register_idx, max(r.register) AS register
FROM days d JOIN r
  ON CAST(r.day AS DATE) BETWEEN CAST(d.day AS DATE) - INTERVAL 2 DAY
                             AND CAST(d.day AS DATE)
GROUP BY 1, 2
"""


def q7_asof_prev_event(sf_dir: str):
    """Backward as-of SELF-join: each event enriched with the same
    user's most recent STRICTLY-earlier event (temporal.asof_join —
    hash exchange on user_id, vectorized lexsort/cummax merge per
    partition).  Unmatched firsts coalesce to (-1, 0.0) so the value
    hash has no nulls on either side."""
    from .temporal import asof_join

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
        ]
    )
    cols = ["user_id", "event_id", "ts", "value"]
    ev_l = _pq(sf_dir, "events", cols)
    ev_r = _pq(sf_dir, "events", cols)
    out = asof_join(
        ev_l, ev_r, by="user_id", on="ts", l_schema=schema, r_schema=schema,
        strict=True, r_suffix="_prev", num_partitions=16,
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["event_id"],
                t["user_id"],
                pc.fill_null(t["event_id_prev"], -1),
                pc.fill_null(t["value_prev"], 0.0),
            ],
            names=["event_id", "user_id", "prev_event_id", "prev_value"],
        )

    return out.map_batches(project, batch_format="pyarrow")


Q7_SQL = """
SELECT e.event_id, e.user_id,
       COALESCE(p.event_id, -1) AS prev_event_id,
       COALESCE(p.value, 0.0) AS prev_value
FROM events e ASOF LEFT JOIN events p
  ON e.user_id = p.user_id AND e.ts > p.ts
"""


def q26_asof_banded_prev_event(sf_dir: str):
    """q7's backward as-of self-join through the HOT-KEY-safe banded
    implementation (temporal.asof_join_banded): both sides route on
    (user_id, ts // 6h) so one hot user spreads across partitions; the
    in-band misses are patched from per-band boundary summaries.  Same
    oracle as q7 — the band decomposition must be invisible in the
    result."""
    from .temporal import asof_join_banded

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("value", pa.float64()),
        ]
    )
    cols = ["user_id", "event_id", "ts", "value"]
    out = asof_join_banded(
        _pq(sf_dir, "events", cols), _pq(sf_dir, "events", cols),
        by="user_id", on="ts", band_width=6 * 3600 * 1_000_000,
        l_schema=schema, r_schema=schema,
        strict=True, r_suffix="_prev", num_partitions=16,
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t["event_id"],
                t["user_id"],
                pc.fill_null(t["event_id_prev"], -1),
                pc.fill_null(t["value_prev"], 0.0),
            ],
            names=["event_id", "user_id", "prev_event_id", "prev_value"],
        )

    return out.map_batches(project, batch_format="pyarrow")


def q8_nation_revenue(sf_dir: str):
    """Multi-way join with mixed strategies: lineitem x orders is
    big x big (hash-exchange join on orderkey); customer->nation and
    nation->name are SMALL sides broadcast once via ray.put and applied
    as vectorized lookups inside map_batches — no shuffle for the small
    dimensions (the 100-TB pattern: shuffle only what cannot be
    broadcast)."""
    import ray as _ray
    import pyarrow.parquet as _pqt

    from .relational import hash_join, partial_grouped_agg

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t["l_orderkey"],
                pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            ],
            names=["orderkey", "rev"],
        ),
        batch_format="pyarrow",
    )
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.Table.from_arrays([t["o_orderkey"], t["o_custkey"]],
                                       names=["orderkey", "custkey"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        li,
        orders,
        on="orderkey",
        l_schema=pa.schema([("orderkey", pa.int64()), ("rev", pa.float64())]),
        r_schema=pa.schema([("orderkey", pa.int64()), ("custkey", pa.int64())]),
        how="inner",
        num_partitions=16,
    )
    cust = _pqt.read_table(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_nationkey"])
    nat = _pqt.read_table(os.path.join(sf_dir, "nation.parquet"),
                          columns=["n_nationkey", "n_name"])
    ck = cust["c_custkey"].to_numpy()
    order = np.argsort(ck)
    nk = nat["n_nationkey"].to_numpy()
    names_by_key = np.empty(int(nk.max()) + 1, dtype=object)
    names_by_key[nk] = nat["n_name"].to_pylist()
    side_ref = _ray.put(
        {"ck_sorted": ck[order],
         "cnat": cust["c_nationkey"].to_numpy()[order],
         "nat_name": names_by_key}
    )

    def attach_nation(t: pa.Table) -> pa.Table:
        from .worker_state import cache_key_for_ref, get_or_build

        side = get_or_build(
            ("q8_dims", cache_key_for_ref(side_ref)), lambda: _ray.get(side_ref)
        )
        cks = t["custkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(side["ck_sorted"], cks),
                         len(side["ck_sorted"]) - 1)
        # exact-match mask: a custkey absent from customer must DROP
        # (inner-join semantics, matching the SQL oracle) — an unchecked
        # searchsorted would silently read a neighboring customer's nation
        hit = side["ck_sorted"][pos] == cks
        if not hit.all():
            t = t.filter(pa.array(hit))
            pos = pos[hit]
        nation = side["nat_name"][side["cnat"][pos]]
        return pa.Table.from_arrays(
            [pa.array(nation.tolist(), pa.string()), t["rev"]],
            names=["n_name", "rev"],
        )

    out = partial_grouped_agg(
        joined.map_batches(attach_nation, batch_format="pyarrow"),
        ["n_name"],
        {"revenue": ("rev", "sum"), "n_rows": (None, "count")},
    )
    return _int_scale_cols(out, {"revenue": ("revenue_cents", 100, "round")})


Q8_SQL = """
SELECT n_name,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_cents,
       count(*) AS n_rows
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q9_order_window_counts(sf_dir: str):
    """Range/interval join WITHOUT an equality key: each order defines a
    shipping window [o_orderdate, o_orderdate + (1 + o_orderkey % 28)
    days) and the query counts ALL lineitem ship events inside it (not
    just its own lines).  Runs through temporal.interval_count_join —
    time-banded replication + per-band searchsorted counting, the 1-D
    analog of the cover-cell PIP join."""
    from .temporal import interval_count_join

    DAY_US = 86_400_000_000

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def windows(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        s = t["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = 1 + (keys % 28)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "w_start": pa.array(s, pa.int64()),
                "w_end": pa.array(s + days * DAY_US, pa.int64()),
            }
        )

    iv = orders.map_batches(windows, batch_format="pyarrow")
    pts = _pq(sf_dir, "lineitem", ["l_shipdate"])
    return interval_count_join(
        pts, iv, t="l_shipdate", start="w_start", end="w_end",
        id_col="o_orderkey", band_width=30 * DAY_US, out_col="n_ship",
    )


Q9_SQL = """
SELECT o.o_orderkey, count(l.l_shipdate) AS n_ship
FROM orders o
LEFT JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + ((1 + o.o_orderkey % 28) * INTERVAL 1 DAY)
GROUP BY o.o_orderkey
"""


def q11_sliding_hour_stats(sf_dir: str):
    """Sliding-window aggregate: 1-hour windows hopping every 15 min
    over events (each event in exactly 4 windows).  Bounded replicate +
    combiner push-down via temporal.hopping_window_agg."""
    from .temporal import hopping_window_agg

    HOP_US = 900_000_000  # 15 min
    ev = _pq(sf_dir, "events", ["ts", "value"])
    out = hopping_window_agg(
        ev, t="ts", width=4 * HOP_US, hop=HOP_US,
        aggs={"sum_value": ("value", "sum"), "n_events": (None, "count")},
    )
    return _int_scale_cols(out, {"sum_value": ("sum_value_cents", 100, "round")})


Q11_SQL = """
SELECT (epoch_us(ts) // 900000000 - r.k) * 900000000 AS w_start,
       CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_cents,
       count(*) AS n_events
FROM events, range(4) r(k)
GROUP BY w_start
"""


def t_token_quantiles(sf_dir: str):
    """Exact distributed quantiles (histogram-merge sketch family):
    per-language median/p90 token counts over documents.  Raw rows
    never shuffle — each block emits a (lang, n_tokens) count
    histogram; quantiles read off the merged cdf
    (relational.grouped_quantiles, quantile_disc semantics)."""
    from .relational import grouped_quantiles
    from .text.analysis import analyze_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])
    feats = analyze_documents(docs).select_columns(["lang", "n_tokens"])
    return grouped_quantiles(
        feats, "lang", "n_tokens",
        {"p50_tokens": 0.5, "p90_tokens": 0.9}, n_col="n_docs",
    )


T_QUANTILES_SQL = """
WITH tok AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents)
SELECT lang,
       quantile_disc(n_tokens, 0.5) AS p50_tokens,
       quantile_disc(n_tokens, 0.9) AS p90_tokens,
       count(*) AS n_docs
FROM tok GROUP BY lang
"""


def t_chars_quantiles_cont(sf_dir: str):
    """Interpolated (quantile_cont / R-7) per-source char-length
    quantiles — the continuous member of the histogram-merge quantile
    family, emitted 1e6-scaled with half-away rounding for exact
    oracle hashing."""
    from .relational import grouped_quantiles

    docs = _pq(sf_dir, "documents", ["source", "n_chars"])
    out = grouped_quantiles(
        docs, "source", "n_chars",
        {"p50": 0.5, "p90": 0.9}, n_col="n_docs", interpolate=True,
    )

    def scale(t: pa.Table) -> pa.Table:
        cols = {"source": t["source"], "n_docs": t["n_docs"]}
        for c in ("p50", "p90"):
            v = t[c].to_numpy(zero_copy_only=False) * 1e6
            # half away from zero, matching SQL round()
            cols[c + "_1e6"] = pa.array(
                (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
            )
        return pa.table(cols)

    return out.map_batches(scale, batch_format="pyarrow")


T_CHARS_QUANTILES_SQL = """
SELECT source,
       count(*) AS n_docs,
       CAST(round(quantile_cont(n_chars, 0.5) * 1000000) AS BIGINT) AS p50_1e6,
       CAST(round(quantile_cont(n_chars, 0.9) * 1000000) AS BIGINT) AS p90_1e6
FROM documents GROUP BY source
"""


def q10_top_events_per_user(sf_dir: str):
    """Per-group top-k (ROW_NUMBER window pattern): each user's top-3
    events by value (event_id tiebreak).  relational.grouped_topk —
    per-block partial top-k per group, then a hash exchange of the slim
    candidate stream; no sort shuffle, raw rows never move."""
    from .relational import grouped_topk

    ev = _pq(sf_dir, "events", ["user_id", "event_id", "value"])
    return grouped_topk(ev, "user_id", [("value", True), ("event_id", False)], k=3)


Q10_SQL = """
SELECT user_id, event_id, value FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= 3
"""


def q5_distinct_users(sf_dir: str):
    from .relational import distinct_on

    ds = _pq(sf_dir, "events", ["event_type", "user_id"])

    def pair_key(t: pa.Table) -> pa.Table:
        from .images.synth import splitmix64
        from .text.analysis import _hash63

        # one string hash per DISTINCT event type (a handful), then a
        # vectorized mix with the user id — no per-row Python hashing
        ets = t["event_type"].to_pylist()
        memo: dict = {}
        et_h = np.fromiter(
            (memo.get(et) or memo.setdefault(et, _hash63(et)) for et in ets),
            dtype=np.uint64,
            count=len(ets),
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keys = (
            splitmix64(et_h ^ (uid * np.uint64(0x9E3779B97F4A7C15)))
            >> np.uint64(1)
        ).astype(np.int64)
        return t.append_column("pair_key", pa.array(keys))

    from .relational import partial_grouped_agg

    pairs = distinct_on(ds.map_batches(pair_key, batch_format="pyarrow"), "pair_key")
    # final count via combiner push-down — the post-distinct stream is
    # tiny, so Ray's sort-based groupby would be pure fixed latency
    return partial_grouped_agg(
        pairs.select_columns(["event_type"]),
        ["event_type"],
        {"n_users": (None, "count")},
    )


Q5_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q6_user_sessions(sf_dir: str):
    """Gap-based session windows per user (streaming-shaped operator:
    events treated as a user-partitioned log, windows computed over the
    ts-sorted group — SURVEY §2.5 'windows' extension).  Gap = 7 days."""
    from .relational import _with_part, hash_exchange_map

    GAP_US = 7 * 24 * 3600 * 1_000_000  # microseconds
    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id"])

    def sessionize(df):
        import pandas as pd

        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        # Explicit-unit conversion: parquet timestamps may surface as ns or us
        # depending on reader defaults; pin to microseconds before int math.
        ts_us = df["ts"].astype("datetime64[us]").astype("int64")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap = ts_us - ts_us.shift()
        df = df.assign(_new=(new_user | (gap > GAP_US)).astype("int64"))
        df["session_id"] = df.groupby("user_id")["_new"].cumsum()
        out = (
            df.groupby(["user_id", "session_id"], sort=False)
            .size()
            .reset_index(name="n_events")
        )
        return out

    out = hash_exchange_map(ds, "user_id", 16, sessionize, fn_format="pandas")
    if out is None:
        return (
            _with_part(ds, "user_id", 16)
            .groupby("__part")
            .map_groups(sessionize, batch_format="pandas")
        )
    return out


Q6_SQL = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 7 DAY THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_id
"""


def q15_customers_with_urgent_orders(sf_dir: str):
    """Distributed SEMI JOIN (the EXISTS shape): customers with at
    least one URGENT order — hash_join how="left_semi", one membership
    test per partition, no row duplication from many-to-many matches."""
    from .relational import hash_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["c_custkey"], t["c_name"]], names=["custkey", "c_name"]
        ),
        batch_format="pyarrow",
    )
    ords = (
        _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .filter(expr="o_orderpriority == '1-URGENT'")
        .map_batches(
            lambda t: pa.Table.from_arrays([t["o_custkey"]], names=["custkey"]),
            batch_format="pyarrow",
        )
    )
    return hash_join(
        cust,
        ords,
        on="custkey",
        l_schema=pa.schema([("custkey", pa.int64()), ("c_name", pa.string())]),
        r_schema=pa.schema([("custkey", pa.int64())]),
        how="left_semi",
        num_partitions=16,
    )


Q15_SQL = """
SELECT c_custkey AS custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT')
"""


def q14_rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) in one data pass —
    every rollup level's partials stack inside the same map_batches
    (relational.rollup_agg), so subtotals and the grand total cost no
    extra scans or shuffles."""
    from .relational import rollup_agg

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    out = rollup_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        {"sum_qty_raw": ("l_quantity", "sum"), "n_rows": (None, "count")},
    )
    return _int_scale_cols(out, {"sum_qty_raw": ("sum_qty", 1, "round")})


Q14_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q13_customers_without_urgent_orders(sf_dir: str):
    """Distributed ANTI JOIN: customers that never placed an URGENT
    order (relational.hash_join how="left_anti" — same one-pass hash
    exchange as the inner join; duplicate right keys need no
    pre-distinct; the right side is filtered AT THE READ via a parquet
    row filter, so only matching keys ever leave storage)."""
    from .relational import hash_join

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"]).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["c_custkey"], t["c_name"], t["c_nationkey"]],
            names=["custkey", "c_name", "c_nationkey"],
        ),
        batch_format="pyarrow",
    )
    ords = (
        _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .filter(expr="o_orderpriority == '1-URGENT'")
        .map_batches(
            lambda t: pa.Table.from_arrays([t["o_custkey"]], names=["custkey"]),
            batch_format="pyarrow",
        )
    )
    return hash_join(
        cust,
        ords,
        on="custkey",
        l_schema=pa.schema(
            [("custkey", pa.int64()), ("c_name", pa.string()), ("c_nationkey", pa.int64())]
        ),
        r_schema=pa.schema([("custkey", pa.int64())]),
        how="left_anti",
        num_partitions=16,
    )


Q13_SQL = """
SELECT c_custkey AS custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def q12_customer_running_total(sf_dir: str):
    """Partitioned window functions: per-customer running revenue,
    order rank and previous order value over the order history —
    ``SUM/ROW_NUMBER/LAG OVER (PARTITION BY custkey ORDER BY date,
    key)`` via ONE hash exchange + a vectorized segmented pass
    (relational.partitioned_window).  Money runs as integer cents so
    the running sum is bit-exact regardless of either engine's window
    aggregation order."""
    from .relational import partitioned_window

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t["o_custkey"].combine_chunks(),
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "o_date": t["o_orderdate"].combine_chunks().cast(pa.int64()),
                "price_cents": pa.array(cents),
            }
        )

    ds = orders.map_batches(to_cents, batch_format="pyarrow")
    out = partitioned_window(
        ds,
        "o_custkey",
        [("o_date", False), ("o_orderkey", False)],
        {
            "cum_cents": ("price_cents", "cumsum"),
            "rn": (None, "row_number"),
            "prev_cents": ("price_cents", "lag"),
        },
    )

    def fill_first(t: pa.Table) -> pa.Table:
        # sentinel instead of null at partition starts: null floats
        # break naive value comparison (NaN != NaN) downstream
        i = t.column_names.index("prev_cents")
        return t.set_column(i, "prev_cents", pc.fill_null(t["prev_cents"], -1))

    return out.map_batches(fill_first, batch_format="pyarrow")


Q12_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(epoch_us(o_orderdate) AS BIGINT) AS o_date,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_custkey, o_orderkey, o_date, price_cents,
       CAST(sum(price_cents) OVER w AS BIGINT) AS cum_cents,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       COALESCE(lag(price_cents) OVER w, -1) AS prev_cents
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_date, o_orderkey)
"""


def q27_customer_order_neighbors(sf_dir: str):
    """LEAD + FIRST_VALUE window functions per customer order history —
    the forward-looking twins of q12's cumsum/lag frame, one hash
    exchange + segmented vectorized pass (relational.partitioned_window
    'lead' / 'first_value' kinds)."""
    from .relational import partitioned_window

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "o_custkey": t["o_custkey"].combine_chunks(),
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "o_date": t["o_orderdate"].combine_chunks().cast(pa.int64()),
                "price_cents": pa.array(cents),
            }
        )

    ds = orders.map_batches(to_cents, batch_format="pyarrow")
    out = partitioned_window(
        ds,
        "o_custkey",
        [("o_date", False), ("o_orderkey", False)],
        {
            "next_cents": ("price_cents", "lead"),
            "first_cents": ("price_cents", "first_value"),
            "last_cents": ("price_cents", "last_value"),
        },
    )

    def fill(t: pa.Table) -> pa.Table:
        i = t.column_names.index("next_cents")
        return t.set_column(i, "next_cents", pc.fill_null(t["next_cents"], -1))

    return out.map_batches(fill, batch_format="pyarrow")


Q27_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(epoch_us(o_orderdate) AS BIGINT) AS o_date,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_custkey, o_orderkey, o_date, price_cents,
       COALESCE(lead(price_cents) OVER w, -1) AS next_cents,
       first_value(price_cents) OVER w AS first_cents,
       last_value(price_cents) OVER (
         PARTITION BY o_custkey ORDER BY o_date, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS last_cents
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_date, o_orderkey)
"""


# ---------------------------------------------------------------- text ops
def q28_customer_order_fill(sf_dir: str):
    """LEFT OUTER equi-join with zero-fill: every customer row with
    order count and revenue cents, customers without orders kept at
    zero (relational.hash_join ``how='left_outer'`` — the driver gate
    for the outer-join path; the orders side pre-aggregates
    combiner-style so raw order rows never shuffle)."""
    from .relational import hash_join, partial_grouped_agg

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"].combine_chunks(),
                         "cents": pa.array(cents)})

    agg = partial_grouped_agg(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"],
        {"n_orders": (None, "count"), "cents_sum": ("cents", "sum")},
    )
    joined = hash_join(
        cust,
        agg,
        on="o_custkey",
        l_schema=pa.schema([("o_custkey", pa.int64()),
                            ("c_mktsegment", pa.string())]),
        r_schema=pa.schema([("o_custkey", pa.int64()),
                            ("n_orders", pa.int64()),
                            ("cents_sum", pa.int64())]),
        how="left_outer",
    )

    def zero_fill(t: pa.Table) -> pa.Table:
        out = {"o_custkey": t["o_custkey"], "c_mktsegment": t["c_mktsegment"]}
        for c in ("n_orders", "cents_sum"):
            v = t[c].combine_chunks().to_numpy(zero_copy_only=False)
            v = np.nan_to_num(v.astype(np.float64), nan=0.0).astype(np.int64)
            out[c] = pa.array(v, pa.int64())
        return pa.Table.from_pydict(out)

    return joined.map_batches(zero_fill, batch_format="pyarrow")


Q28_SQL = """
SELECT c.c_custkey AS o_custkey, c.c_mktsegment,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.cents_sum, 0) AS cents_sum
FROM customer c LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
  FROM orders GROUP BY 1
) o ON o.o_custkey = c.c_custkey
"""


def t_token_count(sf_dir: str):
    from .text.analysis import analyze_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return analyze_documents(docs, concurrency=2).select_columns(["doc_id", "n_tokens"])


T_TOKEN_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def t_token_percentile(sf_dir: str):
    """Global rank WITHOUT a sort: every document's exact
    count-below-or-equal over the whole corpus (the percentile /
    calibration signal quality filters need), via a combiner-push-down
    value histogram reduced to ONE broadcast cdf — each batch then
    ranks itself with np.searchsorted.  A Dataset.sort would be an
    all-to-all shuffle; the histogram is #distinct-values-sized
    regardless of row count.  Gate: (doc_id, n_tokens, n_le) vs the
    SQL window count."""
    import ray as _ray

    from .relational import partial_grouped_agg
    from .text.analysis import analyze_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    toks = analyze_documents(docs, concurrency=2).select_columns(
        ["doc_id", "n_tokens"]).materialize()

    hist = partial_grouped_agg(
        toks.select_columns(["n_tokens"]), ["n_tokens"],
        {"c": (None, "count")}).to_pandas().sort_values("n_tokens")
    vals = hist["n_tokens"].to_numpy()
    cdf = hist["c"].to_numpy().cumsum()
    cdf_ref = _ray.put((vals, cdf))

    def rank(t: pa.Table) -> pa.Table:
        v, c = _ray.get(cdf_ref)
        x = t["n_tokens"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(v, x, side="right")
        n_le = np.where(pos > 0, c[np.maximum(pos - 1, 0)], 0).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
            "n_tokens": t["n_tokens"].combine_chunks().cast(pa.int64()),
            "n_le": pa.array(n_le),
        })

    return toks.map_batches(rank, batch_format="pyarrow")


T_TOKEN_PCT_SQL = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(count(*) OVER (ORDER BY n_tokens
                           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_le
FROM t
"""


def t_quality_stats(sf_dir: str):
    from .text.analysis import analyze_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    out = analyze_documents(docs, concurrency=2).select_columns(
        ["doc_id", "n_chars_calc", "alpha_ratio"]
    )
    return _int_scale_cols(out, {"alpha_ratio": ("alpha_ratio_ppm", 1_000_000, "floor")})


T_QUALITY_SQL = """
SELECT doc_id, length(text) AS n_chars_calc,
       CAST(floor(CASE WHEN length(text) = 0 THEN 0.0
            ELSE length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text)
       END * 1000000) AS BIGINT) AS alpha_ratio_ppm
FROM documents
"""


def t_langid(sf_dir: str):
    """Deterministic heuristic language ID: per-language stopword hit
    votes over the lowercased \\S+ tokens, first-max tiebreak in
    _STOPWORDS declaration order, 'und' on zero hits — plus the
    floor-scaled best-language stopword ratio (text/analysis
    TextAnalyzer)."""
    from .text.analysis import analyze_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    out = analyze_documents(docs, concurrency=2).select_columns(
        ["doc_id", "lang_pred", "stopword_ratio"]
    )
    return _int_scale_cols(
        out, {"stopword_ratio": ("stopword_ratio_ppm", 1_000_000, "floor")}
    )


def _langid_values_sql() -> str:
    """VALUES rows (lang, idx, word) mirroring analysis._STOPWORDS —
    idx is the declaration order the engine's argmax tiebreak uses."""
    from .text.analysis import _STOPWORDS

    rows = []
    for idx, (lang, words) in enumerate(_STOPWORDS.items()):
        for w in sorted(words):
            rows.append(f"('{lang}',{idx},'{w}')")
    return ",".join(rows)


T_LANGID_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lower(u.w) AS w
  FROM documents, UNNEST(regexp_extract_all(text, '\S+')) AS u(w)
),
ntok AS (
  SELECT d.doc_id, count(t.w) AS n
  FROM documents d LEFT JOIN toks t ON t.doc_id = d.doc_id
  GROUP BY d.doc_id
),
sw(lang, idx, w) AS (VALUES {_langid_values_sql()}),
hits AS (
  SELECT t.doc_id, s.lang, s.idx, count(*) AS c
  FROM toks t JOIN sw s ON t.w = s.w
  GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, lang, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, idx) AS rn
  FROM hits
)
SELECT n.doc_id,
       COALESCE(b.lang, 'und') AS lang_pred,
       CAST(floor(CASE WHEN n.n = 0 OR b.c IS NULL THEN 0.0
                       ELSE CAST(b.c AS DOUBLE) / n.n END * 1000000) AS BIGINT)
         AS stopword_ratio_ppm
FROM ntok n LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_id = n.doc_id
"""


def t_fingerprint(sf_dir: str):
    """Per-document phrase fingerprint: min FNV-1a-63 over word
    3-grams (lowercased, single-space-joined); documents shorter than
    3 tokens hash their full joined text (TextAnalyzer
    _fingerprint_batch — the rolling-hash document fingerprint)."""
    from .text.analysis import analyze_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return analyze_documents(docs, concurrency=2).select_columns(
        ["doc_id", "fingerprint"]
    )


T_FINGERPRINT_SQL = r"""
WITH RECURSIVE words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
  FROM documents
),
tri AS (
  SELECT w.doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM words w, UNNEST(generate_series(1, len(ws) - 2)) AS u(i)
  WHERE len(ws) >= 3
),
short AS (
  SELECT doc_id, array_to_string(ws, ' ') AS g FROM words WHERE len(ws) < 3
),
gs AS (
  SELECT DISTINCT g FROM (SELECT g FROM tri UNION ALL SELECT g FROM short)
),
fnv AS (
  SELECT g, 1 AS pos, CAST(14695981039346656037 AS HUGEINT) AS h FROM gs
  UNION ALL
  SELECT g, pos + 1,
         (xor(h, CAST(ord(substr(g, pos, 1)) AS HUGEINT)) * 1099511628211)
           % 18446744073709551616
  FROM fnv WHERE pos <= length(g)
),
gh AS (
  SELECT g, CAST(h % 9223372036854775808 AS BIGINT) AS h63
  FROM fnv WHERE pos = length(g) + 1
)
SELECT t.doc_id, min(gh.h63) AS fingerprint
FROM tri t JOIN gh ON gh.g = t.g GROUP BY t.doc_id
UNION ALL
SELECT s.doc_id, gh.h63 AS fingerprint
FROM short s JOIN gh ON gh.g = s.g
"""


def t_repetition(sf_dir: str):
    """Token-repetition stats per document — the boilerplate/spam
    curation signal: total tokens, distinct tokens (type-token ratio
    numerator) and the hottest token's count.  Fully vectorized and
    collision-free: tokens dictionary-encode to exact per-string codes,
    per-doc runs come from one lexsort, run maxima from one reduceat.
    All-integer output, so the gate is hash-exact."""
    from .text.dedup import _flat_tokens

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def rep(t: pa.Table) -> pa.Table:
        n = len(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, parent, n_tokens = _flat_tokens(t["text"])
        distinct = np.zeros(n, dtype=np.int64)
        maxrun = np.zeros(n, dtype=np.int64)
        if len(flat):
            codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False)
            order = np.lexsort((codes, parent))
            p, c = parent[order], codes[order]
            new = np.r_[True, (p[1:] != p[:-1]) | (c[1:] != c[:-1])]
            run_len = np.diff(np.r_[np.flatnonzero(new), len(p)])
            run_doc = p[new]
            distinct = np.bincount(run_doc, minlength=n).astype(np.int64)
            doc_new = np.r_[True, run_doc[1:] != run_doc[:-1]]
            maxrun[run_doc[doc_new]] = np.maximum.reduceat(
                run_len, np.flatnonzero(doc_new)
            )
        return pa.Table.from_pydict(
            {
                "doc_id": ids,
                "n_tokens": n_tokens,
                "distinct_tokens": distinct,
                "max_tok_count": maxrun,
            },
            schema=pa.schema([(c, pa.int64()) for c in
                              ("doc_id", "n_tokens", "distinct_tokens",
                               "max_tok_count")]),
        )

    return docs.map_batches(rep, batch_format="pyarrow")


T_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id, lower(u.w) AS w
  FROM documents, UNNEST(regexp_extract_all(text, '\S+')) AS u(w)
),
wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS distinct_tokens,
         CAST(max(c) AS BIGINT) AS max_tok_count
  FROM wc GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.distinct_tokens, 0) AS distinct_tokens,
       COALESCE(a.max_tok_count, 0) AS max_tok_count
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


def t_exact_dedup(sf_dir: str):
    from .text.dedup import exact_dedup

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(docs).select_columns(["doc_id"])


T_DEDUP_SQL = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def t_minhash_pairs(sf_dir: str):
    from .text.dedup import minhash_lsh_pairs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(docs, jaccard_threshold=0.8).select_columns(["a_id", "b_id"])


def t_jaccard_pairs(sf_dir: str):
    """EXACT n-gram Jaccard near-dup pairs via gram-inverted-index
    candidates + per-pair set verify — the completeness anchor the
    approximate MinHash-LSH pairs are measured against."""
    from .text.dedup import jaccard_pairs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return jaccard_pairs(docs, jaccard_threshold=0.8).select_columns(["a_id", "b_id"])


T_JACCARD_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents WHERE trim(text) <> ''
),
toks AS (
  SELECT doc_id, lower(ws[i]) AS w, i
  FROM words, UNNEST(generate_series(1, len(ws))) AS u(i)
),
nw AS (SELECT doc_id, len(ws) AS n FROM words),
tri AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
short AS (
  SELECT t.doc_id, string_agg(t.w, ' ' ORDER BY t.i) AS g
  FROM toks t JOIN nw ON nw.doc_id = t.doc_id
  WHERE nw.n < 3
  GROUP BY t.doc_id
),
grams AS (
  SELECT DISTINCT doc_id, g FROM tri
  UNION
  SELECT DISTINCT doc_id, g FROM short
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT g1.doc_id AS a_id, g2.doc_id AS b_id, count(*) AS i
  FROM grams g1 JOIN grams g2 ON g1.g = g2.g AND g1.doc_id < g2.doc_id
  GROUP BY g1.doc_id, g2.doc_id
)
SELECT a_id, b_id
FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
"""


def t_contamination(sf_dir: str):
    """Cross-document n-gram contamination: per document, how many of
    its distinct word-3-grams appear in at least one OTHER document,
    and the ratio in ppm (integer division — exact on both sides).
    The set-level form of the duplicated-training-data signal (Lee et
    al. 2022); shares the 3-gram dialect (and the gram CTE) with
    t_jaccard_pairs."""
    from .text.dedup import ngram_contamination

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return ngram_contamination(docs)


T_CONTAMINATION_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents WHERE trim(text) <> ''
),
toks AS (
  SELECT doc_id, lower(ws[i]) AS w, i
  FROM words, UNNEST(generate_series(1, len(ws))) AS u(i)
),
nw AS (SELECT doc_id, len(ws) AS n FROM words),
tri AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
short AS (
  SELECT t.doc_id, string_agg(t.w, ' ' ORDER BY t.i) AS g
  FROM toks t JOIN nw ON nw.doc_id = t.doc_id
  WHERE nw.n < 3
  GROUP BY t.doc_id
),
grams AS (
  SELECT DISTINCT doc_id, g FROM tri
  UNION
  SELECT DISTINCT doc_id, g FROM short
),
cnt AS (SELECT g, count(*) AS nd FROM grams GROUP BY g)
SELECT gr.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         // count(*) AS shared_ppm
FROM grams gr JOIN cnt c ON c.g = gr.g
GROUP BY gr.doc_id
"""


def t_simhash(sf_dir: str):
    from .text.dedup import simhash_signatures

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return simhash_signatures(docs)


# FNV-1a + bit votes are pure integer arithmetic, so DuckDB can recompute
# the full simhash: tokenize with the same \S+ regex, fold FNV-1a over
# each distinct word's characters via a recursive CTE (the documents
# table is ASCII, so codepoints == utf-8 bytes), mask to 63 bits, then
# majority-vote every bit weighted by word multiplicity.  2^64 wraparound
# stays inside HUGEINT because h < 2^64 and the FNV prime is ~2^40.
_SIMHASH_CTE = r"""tokens AS (
  SELECT doc_id, lower(u.w) AS w
  FROM documents, UNNEST(regexp_extract_all(text, '\S+')) AS u(w)
),
wcount AS (SELECT doc_id, w, count(*) AS c FROM tokens GROUP BY doc_id, w),
uw AS (SELECT DISTINCT w FROM wcount),
fnv AS (
  SELECT w, 1 AS pos, CAST(14695981039346656037 AS HUGEINT) AS h FROM uw
  UNION ALL
  SELECT w, pos + 1,
         (xor(h, CAST(ord(substr(w, pos, 1)) AS HUGEINT)) * 1099511628211)
           % 18446744073709551616
  FROM fnv WHERE pos <= length(w)
),
whash AS (
  SELECT w, CAST(h % 9223372036854775808 AS BIGINT) AS h63
  FROM fnv WHERE pos = length(w) + 1
),
bits AS (
  SELECT wc.doc_id, b.b,
         sum(wc.c * ((wh.h63 // (CAST(1 AS BIGINT) << CAST(b.b AS INTEGER))) % 2)) AS ones,
         sum(wc.c) AS cnt
  FROM wcount wc
  JOIN whash wh ON wc.w = wh.w
  CROSS JOIN (SELECT range AS b FROM range(0, 63)) b
  GROUP BY wc.doc_id, b.b
),
sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN 2 * ones > cnt
                       THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM bits GROUP BY doc_id
),
allsigs AS (
  SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sigs s ON d.doc_id = s.doc_id
)"""

T_SIMHASH_SQL = f"""
WITH RECURSIVE {_SIMHASH_CTE}
SELECT doc_id, simhash FROM allsigs
"""

# banding completeness: 3 differing bits can spoil at most 3 of the 4
# 16-bit bands, so every Hamming<=3 pair shares at least one exact band
# — the engine's LSH candidate set is a SUPERSET of the oracle's
# cross-join answer and the exact verify trims it to equality
T_SIMHASH_PAIRS_SQL = f"""
WITH RECURSIVE {_SIMHASH_CTE}
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS distance
FROM allsigs a JOIN allsigs b
  ON a.doc_id < b.doc_id
 AND bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def t_tfidf_topk(sf_dir: str):
    """Top-3 TF-IDF terms per document — term extraction, corpus df,
    broadcast idf scoring and a per-group top-k, end to end without a
    sort shuffle (text/analysis.tfidf_topk)."""
    from .text.analysis import tfidf_topk

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_topk(docs, k=3, scale=1_000_000)


# ranking on the integer-scaled score in BOTH engines (not the raw
# double) removes any last-ulp ln() rank-flip; ties break on the term,
# whose DuckDB memcmp order equals numpy's codepoint order (UTF-8
# byte order preserves codepoint order)
T_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 1000000) AS BIGINT) AS score_1e6
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_1e6 DESC, term) AS r
  FROM scored
)
SELECT doc_id, term, score_1e6 FROM ranked WHERE r <= 3
"""


def t_heavy_tokens(sf_dir: str):
    """Corpus-wide heavy-hitter tokens: every token whose occurrence
    count exceeds 0.5% of ALL token occurrences — Misra-Gries candidate
    sketch + exact verification (relational.heavy_hitters), so the
    output is exact and fully SQL-oracled despite the sketch."""
    from .relational import heavy_hitters
    from .text.analysis import _term_freqs

    import functools

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    # slim (doc, term, tf) rows, materialized once for the three passes
    # (total / sketch / exact) — re-tokenizing raw text 3x would be the
    # expensive part at scale
    term_rows = docs.map_batches(
        functools.partial(_term_freqs, doc_col="doc_id", text_col="text"),
        batch_format="pyarrow",
    ).materialize()
    return heavy_hitters(
        term_rows, "term", weight_col="tf",
        threshold_num=1, threshold_den=200, out_col="n_occurrences",
    )


T_HEAVY_TOKENS_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS term FROM documents
),
occ AS (SELECT term, count(*) AS n_occurrences FROM toks WHERE term <> '' GROUP BY 1),
tot AS (SELECT sum(n_occurrences) AS total FROM occ)
SELECT term, n_occurrences FROM occ, tot
WHERE n_occurrences * 200 > total
"""


def t_vocab_coverage(sf_dir: str):
    """Per-document coverage by the global top-100 vocabulary: the
    fraction of a document's token occurrences that the corpus's 100
    most frequent terms explain, as the exact rational
    (covered_tokens, total_tokens).  Pipeline shape: tokenize once to
    slim (doc, term, tf) rows, combiner-push-down term counts, top-100
    via relational.topk (no sort shuffle, term-asc tiebreak), broadcast
    the tiny vocab via ray.put, then one vectorized is_in pass + one
    doc-keyed partial agg — raw text never shuffles and the vocabulary
    never lands driver-side beyond the 100 winners."""
    import functools

    import ray as _ray

    from .relational import partial_grouped_agg, topk
    from .text.analysis import _term_freqs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    term_rows = docs.map_batches(
        functools.partial(_term_freqs, doc_col="doc_id", text_col="text"),
        batch_format="pyarrow",
    ).materialize()
    counts = partial_grouped_agg(term_rows, ["term"], {"cnt": ("tf", "sum")})
    top = topk(counts, [("cnt", True), ("term", False)], k=100)
    vocab = pa.concat_tables(
        [b for b in top.iter_batches(batch_format="pyarrow")]
    )["term"].combine_chunks()
    vocab_ref = _ray.put(vocab)

    def score(t: pa.Table, *, vref) -> pa.Table:
        from .worker_state import cache_key_for_ref, get_or_build

        v = get_or_build(("vocab100", cache_key_for_ref(vref)),
                         lambda: _ray.get(vref))
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        inv = pc.is_in(t["term"], value_set=v).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "covered": pa.array(np.where(inv, tf, 0)),
                "total": pa.array(tf),
            }
        )

    scored = term_rows.map_batches(
        functools.partial(score, vref=vocab_ref), batch_format="pyarrow"
    )
    return partial_grouped_agg(
        scored, ["doc_id"],
        {"covered_tokens": ("covered", "sum"), "total_tokens": ("total", "sum")},
    )


T_VOCAB_COVERAGE_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
),
cnt AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY 1),
top AS (SELECT term FROM cnt ORDER BY cnt DESC, term LIMIT 100)
SELECT doc_id,
       CAST(sum(CASE WHEN term IN (SELECT term FROM top) THEN tf ELSE 0 END)
            AS BIGINT) AS covered_tokens,
       CAST(sum(tf) AS BIGINT) AS total_tokens
FROM tf GROUP BY 1
"""


def t_bigram_counts(sf_dir: str):
    """Corpus-wide top-50 bigrams — the n-gram language-model counting
    pass: per-batch partial bigram counts (adjacency by shifted
    parent-index compare inside one vectorized stage, so raw text
    never shuffles), a combiner-push-down grouped sum over (w1, w2),
    and the shuffle-free relational.topk with full lexicographic
    tiebreak for a deterministic hash gate."""
    import functools

    from .relational import partial_grouped_agg, topk
    from .text.analysis import _bigram_counts

    docs = _pq(sf_dir, "documents", ["text"])
    partials = docs.map_batches(
        functools.partial(_bigram_counts, text_col="text"),
        batch_format="pyarrow",
    )
    counts = partial_grouped_agg(partials, ["w1", "w2"], {"n": ("n", "sum")})
    return topk(counts, [("n", True), ("w1", False), ("w2", False)], k=50)


T_BIGRAM_SQL = r"""
WITH w AS (
  SELECT list_filter(regexp_split_to_array(text, '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
bg AS (
  SELECT unnest(ws[1:len(ws) - 1]) AS w1, unnest(ws[2:len(ws)]) AS w2
  FROM w WHERE len(ws) >= 2
)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY 1, 2
ORDER BY n DESC, w1, w2 LIMIT 50
"""


def t_hash_sample(sf_dir: str):
    """Deterministic 10% hash sample of the documents table — the
    reproducible, shuffle-free sampling primitive a training-data
    pipeline uses to carve dev/eval splits out of 100 TB (every worker
    makes the identical keep decision from the key alone)."""
    from .relational import hash_sample

    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return hash_sample(docs, "doc_id", 10, 100)


T_HASH_SAMPLE_SQL = f"""
WITH {_splitmix_over("doc_id", "documents")}
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN smfin ON smfin.k = d.doc_id
WHERE h64 % 100 < 10
"""


def t_stratified_sample(sf_dir: str):
    """Per-language quota sampling (keep 60% of en, 15% of everything
    else), still deterministic and shuffle-free — the
    curation-by-source/language shape."""
    from .relational import stratified_hash_sample

    docs = _pq(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_hash_sample(
        docs, "doc_id", "lang", rates={"en": 60}, default_num=15, keep_den=100
    )


T_STRATIFIED_SAMPLE_SQL = f"""
WITH {_splitmix_over("doc_id", "documents")}
SELECT d.doc_id, d.lang
FROM documents d JOIN smfin ON smfin.k = d.doc_id
WHERE h64 % 100 < CASE WHEN d.lang = 'en' THEN 60 ELSE 15 END
"""


def t_weighted_sample(sf_dir: str):
    """Length-proportional deterministic sampling: keep each document
    with probability min(n_chars, 4000)/4000 — the weighted curation
    sample (longer docs more likely kept), shuffle-free and exactly
    reproducible from the key alone (pure integer gate)."""
    from .relational import weighted_hash_sample

    docs = _pq(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return weighted_hash_sample(docs, "doc_id", "n_chars", 4000)


T_WEIGHTED_SAMPLE_SQL = f"""
WITH {_splitmix_over("doc_id", "documents")}
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN smfin ON smfin.k = d.doc_id
WHERE h64 % 4000 < LEAST(GREATEST(d.n_chars, 0), 4000)
"""


# ---------------------------------------------------------------- embeddings
def e_knn_cosine(sf_dir: str):
    from .spatial.knn import embedding_knn

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = emb.filter(expr="vec_id < 3").take_all()
    qids = np.array([r["vec_id"] for r in head], dtype=np.int64)
    qm = np.array([r["embedding"] for r in head], dtype=np.float64)
    out = embedding_knn(emb, qids, qm, k=5)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


E_KNN_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
d AS (
  SELECT q.qid, e.vec_id,
         round(1 - list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 9) AS dist
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY dist, vec_id) AS rnk
  FROM d
)
SELECT qid AS query_id, vec_id AS neighbor_id, rnk AS rank FROM r WHERE rnk <= 5
"""


def e_knn_ivf(sf_dir: str):
    """IVF ANN — the 10^12-row scale path — in its probe-all
    configuration (n_probe == n_clusters => exact, so it shares the
    brute-force SQL oracle; production lowers n_probe to trade recall
    for a cluster-pruned candidate set)."""
    from .spatial.knn import embedding_knn_ivf

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = emb.filter(expr="vec_id < 3").take_all()
    qids = np.array([r["vec_id"] for r in head], dtype=np.int64)
    qm = np.array([r["embedding"] for r in head], dtype=np.float64)
    out = embedding_knn_ivf(emb, qids, qm, k=5, n_clusters=8, n_probe=8)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def e_neardup_pairs(sf_dir: str):
    """Planted-near-dup recovery: every 10th vector gets a twin
    (vec_id + 1,000,000) with +0.02 on its first dimension; the
    operator must recover exactly those pairs at cosine >= 0.95
    (random pairs on this synthetic table top out near 0.51).  The
    oracle replays the same construction in SQL."""
    from .text.dedup import embedding_neardup_pairs

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids % 10 == 0
        t = batch.filter(pa.array(keep))
        if len(t) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], batch["embedding"].type)],
                names=["vec_id", "embedding"],
            )
        col = t["embedding"].combine_chunks()
        values = col.flatten().to_numpy(zero_copy_only=False).copy()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
        # float32 round-trip matches the oracle's CAST(x+0.02 AS FLOAT)
        values[offs] = (values[offs].astype(np.float64) + 0.02).astype(np.float32)
        new_col = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(lens))).astype(np.int32), pa.int32()),
            pa.array(values, pa.float32()),
        )
        new_ids = t["vec_id"].to_numpy(zero_copy_only=False) + 1_000_000
        return pa.Table.from_arrays(
            [pa.array(new_ids), new_col], names=["vec_id", "embedding"]
        )

    allv = emb.union(emb.map_batches(plant, batch_format="pyarrow"))
    return embedding_neardup_pairs(allv, threshold=0.95).select_columns(["a_id", "b_id"])


E_NEARDUP_SQL = """
WITH base AS (SELECT vec_id, embedding FROM embeddings),
planted AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding,
                        (x, i) -> CASE WHEN i = 1 THEN CAST(x + 0.02 AS FLOAT) ELSE x END)
           AS embedding
  FROM base WHERE vec_id % 10 = 0),
allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM allv a JOIN allv b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
"""


def e_label_centroid(sf_dir: str):
    """Per-label embedding centroid (class prototypes) in long format —
    one row per (label, dim) with member count and the 1e4-scaled mean.
    Raw vectors never shuffle: per-batch argsort+reduceat partials,
    then one tiny concat+groupby (vectors.grouped_centroid)."""
    from .vectors import grouped_centroid

    emb = _pq(sf_dir, "embeddings", ["label", "embedding"])
    return grouped_centroid(emb, "label", "embedding", scale=10000, out_col="mean_1e4")


E_LABEL_CENTROID_SQL = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(ord - 1 AS BIGINT) AS dim,
       count(*) AS n_vecs,
       CAST(round(sum(CAST(val AS DOUBLE)) / count(*) * 10000) AS BIGINT) AS mean_1e4
FROM (SELECT label,
             unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------- spatial graft
# Synthetic image points derived from the part table by pure integer /
# float arithmetic so DuckDB can recompute positions, hashes and cells.
def _part_image_batch(t: pa.Table) -> pa.Table:
    k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    # positions confined to [-2, 6) x [-2, 6): dense around the OSM
    # fixture polygons so the PIP join has non-trivial matches
    lon = (k * 2654435761 % 8000000) / 1e6 - 2.0
    lat = (k * 40503 % 8000000) / 1e6 - 2.0
    ph_u = (k.astype(np.uint64) * np.uint64(6364136223846793005)
            + np.uint64(1442695040888963407))
    phash = ph_u.astype(np.int64)
    return pa.Table.from_pydict(
        {"image_id": k, "lon": lon, "lat": lat, "phash": phash},
        schema=pa.schema(
            [("image_id", pa.int64()), ("lon", pa.float64()),
             ("lat", pa.float64()), ("phash", pa.int64())]
        ),
    )


_PART_IMG_SQL = """
SELECT p_partkey AS image_id,
       (p_partkey * 2654435761 % 8000000) / 1e6 - 2 AS lon,
       (p_partkey * 40503 % 8000000) / 1e6 - 2 AS lat,
       CAST((CAST(p_partkey AS HUGEINT) * 6364136223846793005 + 1442695040888963407)
            % 18446744073709551616
            - CASE WHEN (CAST(p_partkey AS HUGEINT) * 6364136223846793005
                         + 1442695040888963407) % 18446744073709551616 >= 9223372036854775808
                   THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS phash
FROM part
"""


def part_images(sf_dir: str):
    return _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        _part_image_batch, batch_format="pyarrow"
    )


def g_cell_encode(sf_dir: str):
    from .spatial.cells import cell_id

    def encode(t: pa.Table) -> pa.Table:
        cells = cell_id(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            CELL_LEVEL,
        )
        return pa.Table.from_pydict(
            {"image_id": t["image_id"], "cell_id": pa.array(cells)},
            schema=pa.schema([("image_id", pa.int64()), ("cell_id", pa.int64())]),
        )

    return part_images(sf_dir).map_batches(encode, batch_format="pyarrow")


G_CELL_SQL = f"""
WITH img AS ({_PART_IMG_SQL})
SELECT image_id,
       {CELL_LEVEL} * 288230376151711744
       + CAST(floor((lon + 180) / 360 * 4096) AS BIGINT) * 536870912
       + CAST(floor((lat + 90) / 180 * 4096) AS BIGINT) AS cell_id
FROM img
"""


def g_tile_counts(sf_dir: str):
    from .spatial.cells import cell_id

    def encode(t: pa.Table) -> pa.Table:
        cells = cell_id(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            TILE_LEVEL,
        )
        return pa.Table.from_pydict({"cell_id": pa.array(cells)},
                                    schema=pa.schema([("cell_id", pa.int64())]))

    from .relational import grouped_count

    return grouped_count(
        part_images(sf_dir).map_batches(encode, batch_format="pyarrow"),
        "cell_id",
        alias="n_images",
    )


G_TILE_SQL = f"""
WITH img AS ({_PART_IMG_SQL})
SELECT {TILE_LEVEL} * 288230376151711744
       + CAST(floor((lon + 180) / 360 * 256) AS BIGINT) * 536870912
       + CAST(floor((lat + 90) / 180 * 256) AS BIGINT) AS cell_id,
       count(*) AS n_images
FROM img GROUP BY 1
"""


def g_cell_smooth(sf_dir: str):
    """Sparse-raster 3x3 box smoothing over the image tile histogram
    (spatial/tiles.neighborhood_rollup): each occupied cell's count
    scatters to its grid neighbors, one combiner-push-down grouped sum
    re-collapses — the heatmap/density-smoothing convolution, run on
    the per-cell histogram so raw points never re-shuffle."""
    from .spatial.cells import cell_id
    from .spatial.tiles import neighborhood_rollup

    def encode(t: pa.Table) -> pa.Table:
        cells = cell_id(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            TILE_LEVEL,
        )
        return pa.Table.from_pydict({"cell_id": pa.array(cells)},
                                    schema=pa.schema([("cell_id", pa.int64())]))

    from .relational import grouped_count

    counts = grouped_count(
        part_images(sf_dir).map_batches(encode, batch_format="pyarrow"),
        "cell_id",
        alias="n_images",
    )
    return neighborhood_rollup(counts, value_col="n_images", radius=1)


G_CELL_SMOOTH_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
c AS (
  SELECT CAST(floor((lon + 180) / 360 * 256) AS BIGINT) AS x,
         CAST(floor((lat + 90) / 180 * 256) AS BIGINT) AS y,
         count(*) AS n
  FROM img GROUP BY 1, 2
),
o AS (SELECT t1.dx - 1 AS dx, t2.dy - 1 AS dy
      FROM range(3) t1(dx), range(3) t2(dy))
SELECT {TILE_LEVEL} * 288230376151711744
       + (c.x + o.dx) * 536870912 + (c.y + o.dy) AS cell_id,
       CAST(sum(c.n) AS BIGINT) AS n_smooth
FROM c, o
WHERE c.x + o.dx BETWEEN 0 AND 255 AND c.y + o.dy BETWEEN 0 AND 255
GROUP BY 1
"""


COMPACT_LEVEL = 9


def g_cell_compact(sf_dir: str):
    """H3/S2-style ``compact`` over the image corpus's level-9 cell
    cover: the minimal mixed-level cell set covering exactly the same
    area (complete sibling quads promote to their parent, cascading).
    One exchange keyed on the level-4 ancestor co-locates every cell
    that can merge; a tiny residue finishes in one final task
    (spatial/cells.compact_cell_set)."""
    from .spatial.cells import cell_id, compact_cell_set

    def encode(t: pa.Table) -> pa.Table:
        cells = cell_id(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            COMPACT_LEVEL,
        )
        return pa.Table.from_pydict({"cell_id": pa.array(cells)},
                                    schema=pa.schema([("cell_id", pa.int64())]))

    enc = part_images(sf_dir).map_batches(encode, batch_format="pyarrow")
    return compact_cell_set(enc, anchor_level=4, num_partitions=16)


def g_cell_uncompact(sf_dir: str):
    """Round-trip gate for the compact/uncompact pair: compacting the
    level-9 cover and expanding it back must reproduce EXACTLY the
    original distinct level-9 cell set (uncompact is per-cell
    independent, so the expansion is a plain map_batches)."""
    from .spatial.cells import cell_id, compact_cell_set, uncompact_cells

    def encode(t: pa.Table) -> pa.Table:
        cells = cell_id(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            COMPACT_LEVEL,
        )
        return pa.Table.from_pydict({"cell_id": pa.array(cells)},
                                    schema=pa.schema([("cell_id", pa.int64())]))

    enc = part_images(sf_dir).map_batches(encode, batch_format="pyarrow")
    comp = compact_cell_set(enc, anchor_level=4, num_partitions=16)

    def expand(t: pa.Table) -> pa.Table:
        out = uncompact_cells(
            t["cell_id"].combine_chunks().to_numpy(zero_copy_only=False),
            COMPACT_LEVEL,
        )
        return pa.Table.from_pydict({"cell_id": out},
                                    schema=pa.schema([("cell_id", pa.int64())]))

    return comp.map_batches(expand, batch_format="pyarrow")


def _uncompact_oracle_sql() -> str:
    n = 1 << COMPACT_LEVEL
    return f"""
WITH img AS ({_PART_IMG_SQL})
SELECT DISTINCT {COMPACT_LEVEL} * 288230376151711744
       + CAST(floor((lon + 180) / 360 * {n}) AS BIGINT) * 536870912
       + CAST(floor((lat + 90) / 180 * {n}) AS BIGINT) AS cell_id
FROM img
"""


G_UNCOMPACT_SQL = _uncompact_oracle_sql()


def _compact_oracle_sql() -> str:
    """Unrolled complete-quad CTE chain (level 9 -> 0): DuckDB lacks
    GROUP BY in recursive CTEs, and the level count is a fixed small
    constant, so the cascade is spelled out level by level in pure
    integer arithmetic."""
    n = 1 << COMPACT_LEVEL
    parts = [
        f"""b{COMPACT_LEVEL} AS (
  SELECT DISTINCT CAST(floor((lon + 180) / 360 * {n}) AS BIGINT) AS x,
                  CAST(floor((lat + 90) / 180 * {n}) AS BIGINT) AS y
  FROM img)"""
    ]
    src = {COMPACT_LEVEL: f"b{COMPACT_LEVEL}"}
    for lv in range(COMPACT_LEVEL - 1, -1, -1):
        parts.append(
            f"c{lv} AS (SELECT x // 2 AS x, y // 2 AS y FROM {src[lv + 1]} "
            f"GROUP BY 1, 2 HAVING count(*) = 4)"
        )
        src[lv] = f"c{lv}"
    sel = []
    for lv in range(COMPACT_LEVEL, -1, -1):
        s = src[lv]
        cid = f"{lv} * 288230376151711744 + {s}.x * 536870912 + {s}.y AS cell_id"
        if lv > 0:
            sel.append(
                f"SELECT {cid} FROM {s} ANTI JOIN c{lv - 1} p "
                f"ON p.x = {s}.x // 2 AND p.y = {s}.y // 2"
            )
        else:
            sel.append(f"SELECT {cid} FROM {s}")
    return (
        f"WITH img AS ({_PART_IMG_SQL}),\n"
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(sel)
    )


G_COMPACT_SQL = _compact_oracle_sql()


def g_knn_phash(sf_dir: str):
    from .spatial.knn import phash_knn

    imgs = part_images(sf_dir).map_batches(
        lambda t: pa.Table.from_arrays([t["image_id"], t["phash"]],
                                       names=["item_id", "phash"]),
        batch_format="pyarrow",
    )
    head = imgs.filter(expr="item_id < 3").take_all()
    qids = np.array([r["item_id"] for r in head], dtype=np.int64)
    qh = np.array([r["phash"] for r in head], dtype=np.int64)
    out = phash_knn(imgs, qids, qh, k=5)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


G_KNN_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
q AS (SELECT image_id AS qid, phash AS qh FROM img WHERE image_id < 3),
d AS (
  SELECT q.qid, i.image_id,
         bit_count(xor(q.qh, i.phash)) AS dist
  FROM q CROSS JOIN img i
),
r AS (
  SELECT qid, image_id, row_number() OVER (PARTITION BY qid ORDER BY dist, image_id) AS rnk
  FROM d
)
SELECT qid AS query_id, image_id AS neighbor_id, rnk AS rank FROM r WHERE rnk <= 5
"""


# ---------------------------------------------------------------- OSM corpus
_CORPUS = [
    "empty", "node", "way", "relation", "map", "barrier-wall",
    "center-feature", "meta", "issue-4", "issue-6", "issue-7", "issue-9",
    "issue-16", "issue-35", "issue-52-highway-service-closed",
    "issue-54-staffordshire",
]


def _corpus_elements() -> List[Tuple[str, list]]:
    from .model.xml_parse import parse_osm_xml

    docs = []
    for base in _CORPUS:
        jp = os.path.join(REFERENCE_DATA, base + ".json")
        xp = os.path.join(REFERENCE_DATA, base + ".osm")
        if os.path.exists(jp):
            with open(jp) as f:
                doc = json.load(f)
        else:
            with open(xp) as f:
                doc = parse_osm_xml(f.read())
        docs.append((base, doc["elements"]))
    return docs


_CORPUS_FEATURES_CACHE = None


def _corpus_features_runs():
    """Stitch every corpus fixture through the DISTRIBUTED pipeline
    once per process and memoize the feature rows: three driver
    queries (features / simplify / metrics) consume the same stitched
    corpus, and re-running 17 pipelines per query would triple the
    driver gate's cost without exercising anything new — the
    distributed path runs in full on the first call; what differs per
    query is the kernel applied downstream."""
    global _CORPUS_FEATURES_CACHE
    if _CORPUS_FEATURES_CACHE is None:
        from .pipeline.osm import OsmPipeline, elements_dataset

        runs = []
        for base, elements in _corpus_elements():
            feats = (
                OsmPipeline(num_partitions=4)
                .features(elements_dataset(elements))
                .take_all()
            )
            feats.sort(key=lambda r: r["seq"])
            runs.append((base, feats))
        _CORPUS_FEATURES_CACHE = runs
    return _CORPUS_FEATURES_CACHE


def osm_corpus_features(sf_dir: str):
    """The whole golden corpus through the DISTRIBUTED pipeline; one
    run per doc keeps ids from colliding across fixtures."""
    rows = []
    for base, feats in _corpus_features_runs():
        for r in feats:
            rows.append(
                {
                    "fixture": base,
                    "seq": r["seq"],
                    "element_type": r["element_type"],
                    "element_id": r["element_id"],
                    "geom_type": r["geom_type"],
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("fixture", pa.string()),
                ("seq", pa.int64()),
                ("element_type", pa.string()),
                ("element_id", pa.int64()),
                ("geom_type", pa.string()),
            ]
        ),
    )


# The corpus is FIXED (the reference's own fixture files), so the
# flagship stitching query's output is a deterministic 27-row table —
# frozen here as a VALUES literal so the driver hash-gates it like any
# SQL-expressible query.  pytest independently verifies the same rows
# against the document-converter path and the reference's golden
# .geojson files (tests/test_pipeline.py), so this literal is pinned by
# an independent oracle, not by the pipeline under test.
OSM_CORPUS_SQL = """
SELECT fixture, CAST(seq AS BIGINT) AS seq, element_type,
       CAST(element_id AS BIGINT) AS element_id, geom_type
FROM (VALUES
  ('node', 0, 'node', 1, 'Point'),
  ('way', 0, 'way', 1, 'LineString'),
  ('relation', 0, 'relation', 1, 'MultiPolygon'),
  ('map', 84, 'way', 110768775, 'Polygon'),
  ('map', 85, 'way', 110768780, 'Polygon'),
  ('map', 87, 'way', 110768785, 'Polygon'),
  ('map', 88, 'way', 111451113, 'Polygon'),
  ('map', 89, 'way', 202526713, 'LineString'),
  ('map', 90, 'way', 496671186, 'Polygon'),
  ('map', 91, 'way', 496671187, 'LineString'),
  ('map', 92, 'way', 496671188, 'Polygon'),
  ('map', 93, 'way', 496671189, 'Polygon'),
  ('map', 94, 'relation', 1562147, 'MultiPolygon'),
  ('map', 95, 'relation', 1802915, 'LineString'),
  ('barrier-wall', 4, 'way', 43934658, 'LineString'),
  ('center-feature', 0, 'relation', 448930, 'Point'),
  ('meta', 0, 'node', 4883483009, 'Point'),
  ('meta', 1, 'node', 6657522239, 'Point'),
  ('meta', 2, 'way', 110768779, 'Polygon'),
  ('issue-4', 1, 'relation', 7390177, 'LineString'),
  ('issue-6', 0, 'way', 155575971, 'LineString'),
  ('issue-7', 0, 'way', 387345429, 'LineString'),
  ('issue-9', 6, 'way', 361110018, 'LineString'),
  ('issue-16', 5, 'way', 4402690, 'LineString'),
  ('issue-35', 0, 'relation', 2718379, 'MultiPolygon'),
  ('issue-52-highway-service-closed', 0, 'way', 60611389, 'LineString'),
  ('issue-54-staffordshire', 0, 'relation', 195444, 'MultiPolygon')
) AS t(fixture, seq, element_type, element_id, geom_type)
"""


def _fixture_polygons(base: str) -> List[Tuple[str, list]]:
    """Document-convert ONE fixture and extract its polygons."""
    from .document import json2shapes
    from .model.xml_parse import parse_osm_xml

    jp = os.path.join(REFERENCE_DATA, base + ".json")
    xp = os.path.join(REFERENCE_DATA, base + ".osm")
    if os.path.exists(jp):
        with open(jp) as f:
            doc = json.load(f)
    else:
        with open(xp) as f:
            doc = parse_osm_xml(f.read())
    polys = []
    for s in json2shapes({"elements": doc["elements"]}):
        g = s["shape"]
        gid = f"{base}/{s['properties']['type']}/{s['properties']['id']}"
        if g["type"] == "Polygon":
            polys.append((gid, g["coordinates"]))
        elif g["type"] == "MultiPolygon":
            for i, p in enumerate(g["coordinates"]):
                polys.append((f"{gid}#{i}", p))
    return polys


def corpus_polygons() -> List[Tuple[str, list]]:
    """Assembled polygons from the corpus (document path, tiny) as the
    small side of spatial joins.  Fixture conversions are independent,
    so they fan out as Ray tasks when a session is live (the serial
    driver loop was ~1.4s of fixed latency in every PIP bench run);
    output order is the fixture list order either way."""
    import ray as _ray

    if _ray.is_initialized():
        fp = _ray.remote(_fixture_polygons)
        per_fixture = _ray.get([fp.remote(b) for b in _CORPUS])
    else:
        per_fixture = [_fixture_polygons(b) for b in _CORPUS]
    return [p for sub in per_fixture for p in sub]


def g_pip_join_osm(sf_dir: str):
    """Synthetic image points against assembled corpus polygons:
    broadcast cell index + PIP over the warm task pool."""
    from .spatial.pip import broadcast_pip_join

    polys = corpus_polygons()
    imgs = part_images(sf_dir)
    return broadcast_pip_join(imgs, polys, level=10, id_col="image_id", concurrency=2)


# Axis-aligned boxes with half-microdegree bounds: the synthetic points
# are exact multiples of 1e-6, so no point can sit on a boundary and the
# even-odd PIP kernel's verdict equals the SQL open-interval predicate
# exactly — which makes the SHUFFLED (both-sides-large, salted) spatial
# join driver-hash-checkable.
_PIP_BOXES = [
    ("box_a", -1.4999995, -0.7999995, 1.2500005, 2.3500005),
    ("box_b", 0.5000005, 1.5000005, 4.7500005, 5.2500005),
    ("box_c", 3.0000005, -1.9999995, 5.9000005, 0.5000005),  # overlaps none
]


def g_pip_join_boxes(sf_dir: str):
    """Shuffled salted PIP join with the polygon side as a real Dataset
    (cover-cell explode in map_batches, coords as Arrow nested lists):
    every stage of the both-sides-large path runs, and the rectangle
    geometry keeps the result SQL-expressible for the driver oracle."""
    from .spatial.pip import polygons_to_dataset, shuffled_pip_join

    polys = [
        (gid, [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]])
        for gid, x0, y0, x1, y1 in _PIP_BOXES
    ]
    poly_ds = polygons_to_dataset(polys)
    imgs = part_images(sf_dir)
    return shuffled_pip_join(
        imgs, poly_ds, level=10, num_partitions=8, salt=2, id_col="image_id"
    )


G_PIP_BOXES_SQL = f"""
WITH img AS ({_PART_IMG_SQL})
SELECT CAST(image_id AS VARCHAR) AS image_id, b.gid AS geom_id
FROM img
JOIN (VALUES
  ('box_a', -1.4999995, -0.7999995, 1.2500005, 2.3500005),
  ('box_b', 0.5000005, 1.5000005, 4.7500005, 5.2500005),
  ('box_c', 3.0000005, -1.9999995, 5.9000005, 0.5000005)
) AS b(gid, x0, y0, x1, y1)
  ON img.lon > b.x0 AND img.lon < b.x1 AND img.lat > b.y0 AND img.lat < b.y1
"""


def g_pip_anti(sf_dir: str):
    """Spatial ANTI join: every image point contained in NO polygon
    (NOT EXISTS), via the broadcast cell-index path with ``anti=True``
    — the curation shape "drop everything inside the exclusion zones".
    Exact per batch because the polygon side is broadcast; reuses the
    half-microdegree boxes so the open-interval SQL twin is bit-exact."""
    from .spatial.pip import broadcast_pip_join

    polys = [
        (gid, [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]])
        for gid, x0, y0, x1, y1 in _PIP_BOXES
    ]
    imgs = part_images(sf_dir)
    return broadcast_pip_join(imgs, polys, level=10, id_col="image_id", anti=True)


G_PIP_ANTI_SQL = f"""
WITH img AS ({_PART_IMG_SQL})
SELECT image_id
FROM img
WHERE NOT EXISTS (
  SELECT 1 FROM (VALUES
    ('box_a', -1.4999995, -0.7999995, 1.2500005, 2.3500005),
    ('box_b', 0.5000005, 1.5000005, 4.7500005, 5.2500005),
    ('box_c', 3.0000005, -1.9999995, 5.9000005, 0.5000005)
  ) AS b(gid, x0, y0, x1, y1)
  WHERE img.lon > b.x0 AND img.lon < b.x1
    AND img.lat > b.y0 AND img.lat < b.y1
)
"""


def _part_rects(mulx: int, muly: int, mulw: int, mulh: int):
    """Deterministic integer rectangles from part keys (x0..x1, y0..y1
    closed; all arithmetic exact int64, so the DuckDB twin replays the
    derivation bit-for-bit)."""

    def f(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x0 = k * mulx % 8000000
        y0 = k * muly % 8000000
        return pa.Table.from_pydict(
            {
                "id": k,
                "x0": x0,
                "y0": y0,
                "x1": x0 + k * mulw % 60000 + 1,
                "y1": y0 + k * mulh % 60000 + 1,
            },
            schema=pa.schema([(c, pa.int64()) for c in ("id", "x0", "y0", "x1", "y1")]),
        )

    return f


def g_rect_join(sf_dir: str):
    """Rect x rect intersection join between two large derived
    rectangle sets — cell-cover explode, one hash exchange, vectorized
    per-cell candidate merge, exact closed-interval test, and
    canonical-cell report-once dedup (spatial/boxjoin.py)."""
    from .spatial.boxjoin import rect_intersection_join

    part = _pq(sf_dir, "part", ["p_partkey"])
    a = part.map_batches(_part_rects(2654435761, 40503, 2246822519, 97577),
                         batch_format="pyarrow")
    b = part.map_batches(_part_rects(3266489917, 65521, 374761393, 13007),
                         batch_format="pyarrow")
    return rect_intersection_join(a, b)


G_RECT_SQL = """
WITH a AS (
  SELECT p_partkey AS a_id,
         (p_partkey * 2654435761) % 8000000 AS x0,
         (p_partkey * 40503) % 8000000 AS y0,
         (p_partkey * 2654435761) % 8000000 + (p_partkey * 2246822519) % 60000 + 1 AS x1,
         (p_partkey * 40503) % 8000000 + (p_partkey * 97577) % 60000 + 1 AS y1
  FROM part
),
b AS (
  SELECT p_partkey AS b_id,
         (p_partkey * 3266489917) % 8000000 AS x0,
         (p_partkey * 65521) % 8000000 AS y0,
         (p_partkey * 3266489917) % 8000000 + (p_partkey * 374761393) % 60000 + 1 AS x1,
         (p_partkey * 65521) % 8000000 + (p_partkey * 13007) % 60000 + 1 AS y1
  FROM part
)
SELECT a.a_id, b.b_id
FROM a JOIN b
  ON a.x0 <= b.x1 AND b.x0 <= a.x1 AND a.y0 <= b.y1 AND b.y0 <= a.y1
"""


def m_image_decode(sf_dir: str):
    """Decode + verify the deterministic image table (actor pool).

    ``decoded_ok`` is a REAL pixel check: the decoded first-pixel RGB
    triple must equal the value the generator's phase predicts
    (including the rgb5 quantization for lossy rows) and the recomputed
    phash must equal the stored one.  Every output column is
    recomputable by the DuckDB oracle from the image index alone
    (splitmix64 re-implemented in SQL), so the driver hash-checks this
    query instead of counting rows."""
    from .images.codec import batch_pixel_view, decode_image
    from .images.phash import phash64_batch_same_size
    from .images.synth import splitmix64, synth_image_table

    ds = synth_image_table(2000, partition_rows=500)

    class DecodeVerify:
        def __call__(self, batch: pa.Table) -> pa.Table:
            n = len(batch)
            idx = (
                pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4), pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            phase = (splitmix64(idx.astype(np.uint64)) % np.uint64(1000)).astype(
                np.int64
            )
            lossy_np = (idx % 4) == 0
            view = batch_pixel_view(batch["bytes"])
            if view is not None:
                px, w, h = view
                # phase-predicted first pixel (same float expressions
                # as the generator), quantized for lossy rows
                p = phase.astype(np.float64) / 1000.0
                pred = np.empty((n, 3), dtype=np.uint8)
                pred[:, 0] = 127.5 * (1 + np.sin(2 * np.pi * (0.0 / w + p)))
                pred[:, 1] = 127.5 * (1 + np.cos(2 * np.pi * (0.0 / h + p * 2)))
                pred[:, 2] = 127.5 * (1 + np.sin(2 * np.pi * (0.0 / (w + h) + p * 3)))
                if lossy_np.any():
                    q = pred[lossy_np].astype(np.int16)
                    pred[lossy_np] = np.clip((q + 4) // 8 * 8, 0, 255).astype(np.uint8)
                first_ok = (px[:, 0, 0, :] == pred).all(axis=1)
                stored_hash = batch["phash"].to_numpy(zero_copy_only=False)
                hash_ok = phash64_batch_same_size(px) == stored_hash
                # lossless rows must round-trip the hash exactly; lossy
                # rows were hashed pre-quantization so only the pixel
                # check applies
                ok_np = first_ok & (hash_ok | lossy_np)
                w_arr = np.full(n, w, dtype=np.int64)
                h_arr = np.full(n, h, dtype=np.int64)
            else:
                ok, ws, hs = [], [], []
                for row in batch.select(["bytes"]).to_pylist():
                    pxr = decode_image(row["bytes"])
                    ws.append(pxr.shape[1])
                    hs.append(pxr.shape[0])
                    ok.append(True)
                ok_np = np.array(ok, dtype=bool)
                w_arr = np.array(ws, dtype=np.int64)
                h_arr = np.array(hs, dtype=np.int64)
            return pa.Table.from_pydict(
                {
                    "image_idx": pa.array(idx),
                    "decoded_ok": pa.array(ok_np.tolist(), pa.bool_()),
                    "lossy": pa.array(lossy_np.tolist(), pa.bool_()),
                    "w": pa.array(w_arr),
                    "h": pa.array(h_arr),
                    "phase": pa.array(phase),
                },
                schema=pa.schema(
                    [("image_idx", pa.int64()), ("decoded_ok", pa.bool_()),
                     ("lossy", pa.bool_()), ("w", pa.int64()),
                     ("h", pa.int64()), ("phase", pa.int64())]
                ),
            )

    return ds.map_batches(DecodeVerify, batch_format="pyarrow", concurrency=2)


# splitmix64 over HUGEINT with 2^64 wraparound; the 64x64-bit multiply
# splits into 32-bit hi/lo parts so intermediates stay inside HUGEINT
_SPLITMIX_PHASE_CTE = """
nums AS (SELECT range AS i FROM range(0, 2000)),
s0 AS (SELECT i, (CAST(i AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS z FROM nums),
s1 AS (SELECT i, xor(z, z // 1073741824) AS z1 FROM s0),
m1 AS (SELECT i,
  ( (z1 % 4294967296) * 13787848793156543929
    + ((z1 // 4294967296) * 13787848793156543929 % 4294967296) * 4294967296
  ) % 18446744073709551616 AS z2 FROM s1),
s2 AS (SELECT i, xor(z2, z2 // 134217728) AS z3 FROM m1),
m2 AS (SELECT i,
  ( (z3 % 4294967296) * 10723151780598845931
    + ((z3 // 4294967296) * 10723151780598845931 % 4294967296) * 4294967296
  ) % 18446744073709551616 AS z4 FROM s2),
fin AS (SELECT i, xor(z4, z4 // 2147483648) AS h64 FROM m2)
"""

M_IMAGE_DECODE_SQL = f"""
WITH {_SPLITMIX_PHASE_CTE}
SELECT i AS image_idx,
       TRUE AS decoded_ok,
       (i % 4 = 0) AS lossy,
       24 AS w,
       16 AS h,
       CAST(h64 % 1000 AS BIGINT) AS phase
FROM fin
"""


def m_psnr_verify(sf_dir: str):
    """The input_hint's decoded-pixel invariant as a distributed
    verification pass (images/transform.VerifyPixels): decode every
    image, regenerate reference pixels from the index, emit the exact
    integer SSE evidence and the PSNR>=40dB gate.  The driver gate
    pins the derivable columns (lossless rows bit-exact, every row
    over 40 dB); the raw per-row ``sse`` integers are pinned by the
    pytest scalar oracle (test_images_text)."""
    from .images.synth import synth_image_table
    from .images.transform import verify_images

    ds = synth_image_table(2000, partition_rows=500)
    return verify_images(ds, concurrency=2).select_columns(
        ["image_idx", "lossy", "npx", "sse_zero", "pass_40db"]
    )


M_PSNR_SQL = """
SELECT range AS image_idx,
       (range % 4 = 0) AS lossy,
       1152 AS npx,
       (range % 4 <> 0) AS sse_zero,
       TRUE AS pass_40db
FROM range(0, 2000)
"""


def m_image_features(sf_dir: str):
    """Multimodal transform chain: synthesize -> resize (actor pool) ->
    feature-extract (actor pool, deterministic projection) — the Ray
    plumbing for decode/resize/embed at scale (real codecs for the
    self-contained container; external formats raise at the documented
    decode boundary).

    Output is hash-checkable by the DuckDB oracle: per-image index,
    the resized dims, embedding dim, and a finiteness gate over the
    ACTUAL embedding values (TRUE only if the chain really produced
    the vector)."""
    from .images.synth import synth_image_table
    from .images.transform import FEATURE_DIM, extract_features, resize_images

    ds = synth_image_table(2000, partition_rows=500)
    feats = extract_features(resize_images(ds, size=(16, 16)))

    def summarize(batch: pa.Table) -> pa.Table:
        from .vectors import vec_matrix

        idx = (
            pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        emb = vec_matrix(batch["embedding"])
        finite = np.isfinite(emb).all(axis=1) & (emb.shape[1] == FEATURE_DIM)
        return pa.Table.from_pydict(
            {
                "image_idx": pa.array(idx),
                "embedding_dim": pa.array(
                    np.full(len(batch), emb.shape[1], dtype=np.int64)
                ),
                "resized_w": pa.array(np.full(len(batch), 16, dtype=np.int64)),
                "resized_h": pa.array(np.full(len(batch), 16, dtype=np.int64)),
                "emb_finite": pa.array(finite.tolist(), pa.bool_()),
            },
            schema=pa.schema(
                [("image_idx", pa.int64()), ("embedding_dim", pa.int64()),
                 ("resized_w", pa.int64()), ("resized_h", pa.int64()),
                 ("emb_finite", pa.bool_())]
            ),
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


M_IMAGE_FEATURES_SQL = """
SELECT range AS image_idx,
       64 AS embedding_dim,
       16 AS resized_w,
       16 AS resized_h,
       TRUE AS emb_finite
FROM range(0, 2000)
"""


def m_image_pyramid(sf_dir: str):
    """Thumbnail pyramid over the synthetic corpus
    (images/transform.image_pyramid): three chained actor-pool resize
    levels (12x8 -> 6x4 -> 3x2), each consuming the previous level so
    full-res bytes are read once.  Gate columns are derivable per
    level (dims, count, container row bytes) but ``dims_ok``/``n_images``
    are measured from the ACTUAL level output — TRUE/2000 only if the
    chain really produced every thumbnail; pixel content is pinned by
    the scalar nearest-neighbor pytest."""
    from .images.synth import synth_image_table
    from .images.transform import image_pyramid
    from .relational import dataset_from_table

    ds = synth_image_table(2000, partition_rows=500)
    levels = image_pyramid(ds, [(12, 8), (6, 4), (3, 2)])

    rows = {"level": [], "w": [], "h": [], "n_images": [],
            "row_bytes": [], "dims_ok": []}
    for li, (w, h), lvl in levels:
        def check(t: pa.Table, w=w, h=h) -> pa.Table:
            blob = t["bytes"].combine_chunks()
            ln = pc.binary_length(blob).to_numpy(zero_copy_only=False)
            ok = bool((ln == 8 + w * h * 3).all()
                      and (t["w"].to_numpy(zero_copy_only=False) == w).all()
                      and (t["h"].to_numpy(zero_copy_only=False) == h).all())
            return pa.table({"n": pa.array([len(t)], pa.int64()),
                             "ok": pa.array([ok], pa.bool_())})
        agg = lvl.map_batches(check, batch_format="pyarrow").to_pandas()
        rows["level"].append(li)
        rows["w"].append(w)
        rows["h"].append(h)
        rows["n_images"].append(int(agg["n"].sum()))
        rows["row_bytes"].append(8 + w * h * 3)
        rows["dims_ok"].append(bool(agg["ok"].all()))
    return dataset_from_table(pa.table({
        "level": pa.array(rows["level"], pa.int64()),
        "w": pa.array(rows["w"], pa.int64()),
        "h": pa.array(rows["h"], pa.int64()),
        "n_images": pa.array(rows["n_images"], pa.int64()),
        "row_bytes": pa.array(rows["row_bytes"], pa.int64()),
        "dims_ok": pa.array(rows["dims_ok"], pa.bool_()),
    }))


M_PYRAMID_SQL = """
SELECT CAST(range AS BIGINT) AS level,
       CAST(CASE range WHEN 0 THEN 12 WHEN 1 THEN 6 ELSE 3 END AS BIGINT) AS w,
       CAST(CASE range WHEN 0 THEN 8 WHEN 1 THEN 4 ELSE 2 END AS BIGINT) AS h,
       CAST(2000 AS BIGINT) AS n_images,
       CAST(8 + (CASE range WHEN 0 THEN 12 WHEN 1 THEN 6 ELSE 3 END)
              * (CASE range WHEN 0 THEN 8 WHEN 1 THEN 4 ELSE 2 END) * 3
            AS BIGINT) AS row_bytes,
       TRUE AS dims_ok
FROM range(0, 3)
"""


def m_image_augment(sf_dir: str):
    """Deterministic augmentation stage
    (images/transform.AugmentImages): center crop 24x16 -> 16x12 plus
    a splitmix-parity horizontal flip — the reproducible per-sample
    coin a training pipeline needs; whole-batch negative-stride
    flip + slice crop on the zero-copy view.  Gate: (image_idx, dims,
    flipped) with the flip coin recomputed by the SQL splitmix CTE;
    pixel content pinned by the flip/crop scalar pytest."""
    from .images.synth import synth_image_table
    from .images.transform import augment_images

    ds = synth_image_table(2000, partition_rows=500)
    out = augment_images(ds, crop=(16, 12), flip="hash")

    def summarize(t: pa.Table) -> pa.Table:
        idx = (
            pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4), pa.int64())
        )
        return pa.table({
            "image_idx": idx,
            "w": t["w"].combine_chunks().cast(pa.int64()),
            "h": t["h"].combine_chunks().cast(pa.int64()),
            "flipped": t["flipped"].combine_chunks(),
        })

    return out.map_batches(summarize, batch_format="pyarrow")


M_AUGMENT_SQL = f"""
WITH {_splitmix_over("range", "range(0, 2000)")}
SELECT k AS image_idx,
       CAST(16 AS BIGINT) AS w,
       CAST(12 AS BIGINT) AS h,
       (h64 % 2 = 1) AS flipped
FROM smfin
"""


def m_tile_mosaic(sf_dir: str):
    """Per-tile contact sheet (images/transform.tile_mosaic): the 2000
    synthetic images get part_images'-formula positions from their
    index, a level-6 cell assignment, a grouped_topk cap at the 16
    smallest ids per tile (so only capped THUMBNAILS shuffle), and one
    cell exchange assembles each 4x4 96x64 mosaic.  The gate checks
    (cell_id, n_used, w, h) against the SQL cell formula with
    least(count, 16); mosaic pixels are pinned by the scalar-assembly
    pytest."""
    from .images.synth import synth_image_table
    from .images.transform import tile_mosaic
    from .relational import grouped_topk
    from .spatial.cells import cell_id

    ds = synth_image_table(2000, partition_rows=500)

    def assign(t: pa.Table) -> pa.Table:
        idx = (
            pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lon = (idx * 2654435761 % 8000000) / 1e6 - 2.0
        lat = (idx * 40503 % 8000000) / 1e6 - 2.0
        return pa.Table.from_pydict(
            {"cell_id": cell_id(lon, lat, 6),
             "image_idx": pa.array(idx),
             "bytes": t["bytes"].combine_chunks()},
            schema=pa.schema([("cell_id", pa.int64()),
                              ("image_idx", pa.int64()),
                              ("bytes", pa.binary())]),
        )

    cells = ds.map_batches(assign, batch_format="pyarrow")
    capped = grouped_topk(cells, "cell_id", [("image_idx", False)], k=16)
    return tile_mosaic(capped).select_columns(
        ["cell_id", "n_used", "w", "h"])


M_MOSAIC_SQL = """
WITH img AS (
  SELECT range AS idx,
         (range * 2654435761 % 8000000) / 1e6 - 2 AS lon,
         (range * 40503 % 8000000) / 1e6 - 2 AS lat
  FROM range(0, 2000)),
c AS (SELECT idx,
             6 * 288230376151711744
             + CAST(floor((lon + 180) / 360 * 64) AS BIGINT) * 536870912
             + CAST(floor((lat + 90) / 180 * 64) AS BIGINT) AS cell_id
      FROM img)
SELECT cell_id,
       CAST(least(count(*), 16) AS BIGINT) AS n_used,
       CAST(96 AS BIGINT) AS w,
       CAST(64 AS BIGINT) AS h
FROM c GROUP BY 1
"""


def t_dup_clusters(sf_dir: str):
    """Near-dup CLUSTERS, not just pairs: exact Jaccard pair edges ->
    distributed connected components (min-label propagation over one
    reusable edge exchange + grouped-min rounds,
    relational.connected_components) -> (doc_id, cluster_id) with
    cluster_id = smallest doc id in the component — the form a dedup
    pipeline actually consumes (keep doc_id == cluster_id, drop the
    rest).  The SQL twin recomputes the same components with a
    recursive CTE over the identical pair list."""
    from .relational import connected_components
    from .text.dedup import jaccard_pairs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    pairs = jaccard_pairs(docs, jaccard_threshold=0.8).select_columns(["a_id", "b_id"])
    out = connected_components(pairs, a_col="a_id", b_col="b_id")

    def rename(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"doc_id": t["node"], "cluster_id": t["label"]},
            schema=pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]),
        )

    return out.map_batches(rename, batch_format="pyarrow")


T_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pair_edges AS ({T_JACCARD_SQL}),
und AS (SELECT a_id AS u, b_id AS v FROM pair_edges
        UNION ALL SELECT b_id, a_id FROM pair_edges),
reach(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM und) t
  UNION
  SELECT und.u, reach.lbl FROM und JOIN reach ON und.v = reach.u
)
SELECT u AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY u
"""


def t_curation_pass(sf_dir: str):
    """The composed end-to-end pass a training-data team actually runs,
    as ONE pipeline: exact near-dup pair edges (jaccard_pairs) ->
    distributed connected components -> keep only each cluster's
    smallest doc (left-anti hash join against the losers) -> per-
    language deterministic quota sample (stratified_hash_sample).
    Every stage is the already-oracled operator; the composition's SQL
    twin chains the same recursive-CTE components and splitmix64
    threshold in one statement."""
    from .relational import connected_components, hash_join, stratified_hash_sample
    from .text.dedup import jaccard_pairs

    docs = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])
    pairs = jaccard_pairs(
        docs.select_columns(["doc_id", "text"]), jaccard_threshold=0.8
    ).select_columns(["a_id", "b_id"])
    comp = connected_components(pairs, a_col="a_id", b_col="b_id")

    def losers(t: pa.Table) -> pa.Table:
        drop = t.filter(pc.not_equal(t["node"], t["label"]))
        return pa.Table.from_pydict(
            {"doc_id": drop["node"]}, schema=pa.schema([("doc_id", pa.int64())])
        )

    lose_ds = comp.map_batches(losers, batch_format="pyarrow")
    survivors = hash_join(
        _pq(sf_dir, "documents", ["doc_id", "lang"]),
        lose_ds,
        on="doc_id",
        l_schema=pa.schema([("doc_id", pa.int64()), ("lang", pa.string())]),
        r_schema=pa.schema([("doc_id", pa.int64())]),
        how="left_anti",
    )
    return stratified_hash_sample(
        survivors, "doc_id", "lang", rates={"en": 60}, default_num=15, keep_den=100
    )


T_CURATION_SQL = f"""
WITH RECURSIVE pair_edges AS ({T_JACCARD_SQL}),
und AS (SELECT a_id AS u, b_id AS v FROM pair_edges
        UNION ALL SELECT b_id, a_id FROM pair_edges),
reach(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM und) t
  UNION
  SELECT und.u, reach.lbl FROM und JOIN reach ON und.v = reach.u
),
clusters AS (SELECT u AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY u),
losers AS (SELECT doc_id FROM clusters WHERE cluster_id <> doc_id),
{_splitmix_over("doc_id", "documents")}
SELECT d.doc_id, d.lang
FROM documents d JOIN smfin ON smfin.k = d.doc_id
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
  AND h64 % 100 < CASE WHEN d.lang = 'en' THEN 60 ELSE 15 END
"""


def q19_order_rank_windows(sf_dir: str):
    """Ranking window family — RANK / DENSE_RANK / NTILE(4) OVER
    (PARTITION BY custkey ORDER BY date[, key]) — through the same one
    hash-exchange + segmented vectorized pass as q12
    (relational.partitioned_window).  rank/dense_rank tie on the date
    column only (value-determined, so the gate is deterministic);
    ntile orders with the unique key tiebreak."""
    from .relational import partitioned_window

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"].combine_chunks(),
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "o_date": t["o_orderdate"].combine_chunks().cast(pa.int64()),
            }
        )

    out = partitioned_window(
        orders.map_batches(prep, batch_format="pyarrow"),
        "o_custkey",
        [("o_date", False), ("o_orderkey", False)],
        {
            "rnk": ("o_date", "rank"),
            "drnk": ("o_date", "dense_rank"),
            "quartile": (None, "ntile:4"),
        },
    )
    return out.select_columns(["o_custkey", "o_orderkey", "rnk", "drnk", "quartile"])


Q19_SQL = """
SELECT o_custkey, o_orderkey,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rnk,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drnk,
       ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS quartile
FROM orders
"""


def q25_order_date_distribution(sf_dir: str):
    """PERCENT_RANK and CUME_DIST gated as EXACT RATIONALS — two int64
    columns each (numerator, shared denominator) instead of a float
    that could diverge in the last ulp: prnk_num=(rank-1),
    den=(size-1), cume_num=#rows with key<=current; SQL emits the same
    integers from its own window functions."""
    from .relational import partitioned_window

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"].combine_chunks(),
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "o_date": t["o_orderdate"].combine_chunks().cast(pa.int64()),
            }
        )

    out = partitioned_window(
        orders.map_batches(prep, batch_format="pyarrow"),
        "o_custkey",
        [("o_date", False), ("o_orderkey", False)],
        {
            "rnk": ("o_date", "rank"),
            "den": (None, "rank_den"),
            "cume_num": ("o_date", "cume_num"),
        },
    )

    def rationals(t: pa.Table) -> pa.Table:
        rnk = t["rnk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t["o_custkey"].combine_chunks(),
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "prnk_num": pa.array((rnk - 1).astype(np.int64)),
                "den": t["den"].combine_chunks(),
                "cume_num": t["cume_num"].combine_chunks(),
            }
        )

    return out.map_batches(rationals, batch_format="pyarrow")


Q25_SQL = """
SELECT o_custkey, o_orderkey,
       rank() OVER w - 1 AS prnk_num,
       count(*) OVER (PARTITION BY o_custkey) - 1 AS den,
       CAST(round(cume_dist() OVER w
                  * count(*) OVER (PARTITION BY o_custkey)) AS BIGINT)
         AS cume_num
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
"""


def q20_priciest_order_per_customer(sf_dir: str):
    """Grouped ARG_MAX with no join-back: each customer's most
    expensive order via the packed-key trick (value and complemented
    orderkey in one int64; plain max = lexicographic (price desc, key
    asc) winner; relational.grouped_argmax) — one combiner-pushdown
    pass, ties to the smaller orderkey.  The SQL twin runs the very
    same packed max and decode."""
    from .relational import grouped_argmax

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t["o_custkey"].combine_chunks(),
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "cents": pa.array(cents),
            }
        )

    return grouped_argmax(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"],
        "cents",
        "o_orderkey",
        arg_bits=30,
        out_value="max_cents",
        out_arg="best_orderkey",
    )


Q20_SQL = """
WITH t AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
m AS (
  SELECT o_custkey,
         max(cents * 1073741824 + (1073741823 - o_orderkey)) AS p
  FROM t GROUP BY 1)
SELECT o_custkey,
       p // 1073741824 AS max_cents,
       1073741823 - p % 1073741824 AS best_orderkey
FROM m
"""


def q21_rolling_revenue(sf_dir: str):
    """Sliding window FRAME — SUM OVER (PARTITION BY custkey ORDER BY
    date, key ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — as a cumsum
    difference inside the one-exchange window pass (kind "rollsum:2"),
    integer cents for a bit-exact gate."""
    from .relational import partitioned_window

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t["o_custkey"].combine_chunks(),
                "o_orderkey": t["o_orderkey"].combine_chunks(),
                "o_date": t["o_orderdate"].combine_chunks().cast(pa.int64()),
                "cents": pa.array(cents),
            }
        )

    out = partitioned_window(
        orders.map_batches(prep, batch_format="pyarrow"),
        "o_custkey",
        [("o_date", False), ("o_orderkey", False)],
        {"roll3_cents": ("cents", "rollsum:2")},
    )
    return out.select_columns(["o_custkey", "o_orderkey", "roll3_cents"])


Q21_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3_cents
FROM orders
"""


def osm_corpus_simplify(sf_dir: str):
    """The golden corpus stitched by the distributed pipeline, then
    Douglas-Peucker-simplified at eps=1e-5 deg (~1 m) in one streaming
    map_batches pass (geom/simplify.simplify_features).  The gate rows
    are per-feature vertex counts before/after — deterministic because
    the corpus and eps are fixed (same freezing rationale as
    osm_corpus_features)."""
    import ray.data as _rd

    from .geom.simplify import simplify_features

    rows = []
    for base, feats in _corpus_features_runs():
        out = simplify_features(_rd.from_items(feats), eps=1e-5).take_all()
        out.sort(key=lambda r: r["seq"])
        for r in out:
            rows.append(
                {
                    "fixture": base,
                    "seq": r["seq"],
                    "geom_type": r["geom_type"],
                    "n_in": r["n_in"],
                    "n_out": r["n_out"],
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("fixture", pa.string()),
                ("seq", pa.int64()),
                ("geom_type", pa.string()),
                ("n_in", pa.int64()),
                ("n_out", pa.int64()),
            ]
        ),
    )


def osm_corpus_metrics(sf_dir: str):
    """Per-feature geometry measurements (planar shoelace area,
    perimeter/length, area- or length-weighted centroid) over the
    stitched golden corpus, one streaming map_batches pass
    (geom/metrics.metrics_features).  Gate values are floor-scaled
    integers (area 1e12, length 1e9, centroid 1e7) — floor is tie-free
    and the corpus is fixed, so the VALUES literal below is
    deterministic; the kernels are pinned independently by
    tests/test_metrics.py known-shape checks."""
    import ray.data as _rd

    from .geom.metrics import metrics_features

    rows = []
    for base, feats in _corpus_features_runs():
        out = metrics_features(_rd.from_items(feats)).take_all()
        out.sort(key=lambda r: r["seq"])
        for r in out:
            def _fl(v, s):
                return int(np.floor(v * s)) if np.isfinite(v) else -(10**15)

            rows.append(
                {
                    "fixture": base,
                    "seq": r["seq"],
                    "area_p": _fl(r["area_deg2"], 1e12),
                    "len_n": _fl(r["length_deg"], 1e9),
                    "cx_n": _fl(r["cx"], 1e7),
                    "cy_n": _fl(r["cy"], 1e7),
                }
            )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("fixture", pa.string()),
                ("seq", pa.int64()),
                ("area_p", pa.int64()),
                ("len_n", pa.int64()),
                ("cx_n", pa.int64()),
                ("cy_n", pa.int64()),
            ]
        ),
    )


OSM_METRICS_SQL = """
SELECT fixture, CAST(seq AS BIGINT) AS seq,
       CAST(area_p AS BIGINT) AS area_p, CAST(len_n AS BIGINT) AS len_n,
       CAST(cx_n AS BIGINT) AS cx_n, CAST(cy_n AS BIGINT) AS cy_n
FROM (VALUES
  ('node', 0, 0, 0, 43210000, 12340000),
  ('way', 0, 0, 241421356, 11085786, 292893),
  ('relation', 0, 3750000000000, 10414213562, -111112, 0),
  ('map', 84, 404806, 4429732, 262427032, 506136117),
  ('map', 85, 124193, 1788160, 262429866, 506130112),
  ('map', 87, 81982, 1258554, 262436539, 506131070),
  ('map', 88, 1282441, 4996380, 262441676, 506140965),
  ('map', 89, 0, 1004041, 262434893, 506138289),
  ('map', 90, 125799, 1310440, 262422491, 506134806),
  ('map', 91, 0, 287706, 262436430, 506134660),
  ('map', 92, 42731, 904942, 262435060, 506136204),
  ('map', 93, 77718, 1333389, 262438837, 506132644),
  ('map', 94, 477318, 4791049, 262443971, 506141068),
  ('map', 95, 0, 4429732, 262427510, 506135804),
  ('barrier-wall', 4, 0, 3404491, -793691362, 437734267),
  ('center-feature', 0, 0, 0, 262443283, 506108274),
  ('meta', 0, 0, 0, 262433173, 506136731),
  ('meta', 1, 0, 0, 262449014, 506148747),
  ('meta', 2, 110157, 1880524, 262451896, 506144924),
  ('issue-4', 1, 0, 159501742, 288760003, 469791890),
  ('issue-6', 0, 0, 221737, 85642906, 472947386),
  ('issue-7', 0, 0, 177932, 85960728, 473970404),
  ('issue-9', 6, 0, 2636121, 71815097, 507428405),
  ('issue-16', 5, 0, 212317, 133313139, 525037313),
  ('issue-35', 0, 6245656517, 1103994910, 49221775, 514358316),
  ('issue-54-staffordshire', 0, 350182011215, 6009543759, -20322940, 528519725),
  ('issue-52-highway-service-closed', 0, 0, 4963253, -1161814101, 513292227)
) AS t(fixture, seq, area_p, len_n, cx_n, cy_n)
"""


# Frozen like OSM_CORPUS_SQL: fixed corpus + fixed eps => deterministic
# 27-row table; pytest pins the simplify kernel independently
# (tests/test_simplify.py: DP span guarantee, subset/idempotence, ring
# validity), so this literal is not self-certifying.
OSM_SIMPLIFY_SQL = """
SELECT fixture, CAST(seq AS BIGINT) AS seq, geom_type,
       CAST(n_in AS BIGINT) AS n_in, CAST(n_out AS BIGINT) AS n_out
FROM (VALUES
  ('node', 0, 'Point', 1, 1),
  ('way', 0, 'LineString', 3, 3),
  ('relation', 0, 'MultiPolygon', 9, 9),
  ('map', 84, 'Polygon', 29, 26),
  ('map', 85, 'Polygon', 5, 5),
  ('map', 87, 'Polygon', 5, 5),
  ('map', 88, 'Polygon', 14, 8),
  ('map', 89, 'LineString', 3, 2),
  ('map', 90, 'Polygon', 24, 15),
  ('map', 91, 'LineString', 2, 2),
  ('map', 92, 'Polygon', 5, 5),
  ('map', 93, 'Polygon', 5, 5),
  ('map', 94, 'MultiPolygon', 21, 19),
  ('map', 95, 'LineString', 29, 26),
  ('barrier-wall', 4, 'LineString', 4, 4),
  ('center-feature', 0, 'Point', 1, 1),
  ('meta', 0, 'Point', 1, 1),
  ('meta', 1, 'Point', 1, 1),
  ('meta', 2, 'Polygon', 12, 12),
  ('issue-4', 1, 'LineString', 218, 80),
  ('issue-6', 0, 'LineString', 2, 2),
  ('issue-7', 0, 'LineString', 2, 2),
  ('issue-9', 6, 'LineString', 6, 5),
  ('issue-16', 5, 'LineString', 2, 2),
  ('issue-35', 0, 'MultiPolygon', 3321, 1491),
  ('issue-52-highway-service-closed', 0, 'LineString', 36, 17),
  ('issue-54-staffordshire', 0, 'MultiPolygon', 23852, 15517)
) AS t(fixture, seq, geom_type, n_in, n_out)
"""


def q22_user_event_paths(sf_dir: str):
    """Ordered per-group string collection — string_agg(event_type
    ORDER BY event_id) per user — via ONE hash exchange and a single
    vectorized pc.binary_join over group-offset list slices per
    partition (relational.grouped_concat): the event-sequence /
    session-path aggregate, with no per-group Python concat."""
    from .relational import grouped_concat

    events = _pq(sf_dir, "events", ["user_id", "event_type", "event_id"])
    return grouped_concat(
        events, "user_id", "event_type", "event_id", sep=",", out_col="path"
    )


Q22_SQL = """
SELECT user_id, string_agg(event_type, ',' ORDER BY event_id) AS path
FROM events GROUP BY user_id
"""


def q23_urgent_lineitem_counts(sf_dir: str):
    """Semi join with a broadcast BLOOM prefilter
    (relational.bloom_semi_join): the urgent-order key set reduces to a
    1 Mbit filter broadcast once; lineitem rows that cannot match never
    enter the exchange, and the exact left-semi hash join on the
    survivors removes the Bloom's false positives — the classic
    fact-table pushdown, exact by construction (gate = plain IN in
    SQL)."""
    from .relational import bloom_semi_join, partial_grouped_agg

    li = _pq(sf_dir, "lineitem", ["l_orderkey"])

    def urgent_keys(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["o_orderpriority"], "1-URGENT")
        return pa.table({"l_orderkey": t["o_orderkey"].filter(mask)})

    keys = _pq(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        urgent_keys, batch_format="pyarrow"
    )
    semi = bloom_semi_join(li, keys, on="l_orderkey", l_schema=pa.schema(
        [("l_orderkey", pa.int64())]
    ))
    return partial_grouped_agg(semi, ["l_orderkey"], {"n_items": (None, "count")})


Q23_SQL = """
SELECT l_orderkey, count(*) AS n_items
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY 1
"""


def q24_returning_users(sf_dir: str):
    """Set operations: users active in BOTH parity-halves of the event
    log (SQL INTERSECT) — relational.intersect_distinct:
    partition-wise distinct + left_semi on one exchange shape."""
    from .relational import intersect_distinct

    ev = _pq(sf_dir, "events", ["event_id", "user_id"])

    # deterministic halves by event id parity (driver-recomputable)
    def split(half):
        def fn(t: pa.Table) -> pa.Table:
            eid = t["event_id"].to_numpy(zero_copy_only=False)
            m = eid % 2 == half
            return pa.table({"user_id": t["user_id"].filter(pa.array(m))})

        return fn

    even = ev.map_batches(split(0), batch_format="pyarrow")
    odd = ev.map_batches(split(1), batch_format="pyarrow")
    return intersect_distinct(even, odd, on="user_id")


Q24_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 0
INTERSECT
SELECT user_id FROM events WHERE event_id % 2 = 1
"""


def t_snapshot_diff(sf_dir: str):
    """CDC snapshot diff (relational.snapshot_diff): v2 of the document
    table derived deterministically (drop doc_id%11==0, append 'X' to
    text for doc_id%7==0, add new ids +1e9 for doc_id%13==0), then the
    delta classified as added/removed/changed with payloads never
    entering the shuffle (crc32 fingerprints ride the exchange, the
    oracle compares the texts themselves)."""
    from .relational import _crc32_vectorized, snapshot_diff

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def with_fp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "fp": pa.array(
                    _crc32_vectorized(t["text"].combine_chunks()).astype(np.int64)
                ),
            }
        )

    def make_v2(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = t["text"].combine_chunks()
        keep = did % 11 != 0
        did_k = did[keep]
        text_k = text.filter(pa.array(keep))
        mod = did_k % 7 == 0
        suffix = pa.array(np.where(mod, "X", ""))
        text_k = pc.binary_join_element_wise(text_k, suffix, "")
        new_mask = did % 13 == 0
        new_ids = did[new_mask] + 1_000_000_000
        new_text = pa.array([f"new {i}" for i in did[new_mask]], pa.string())
        text_arr = text_k.cast(pa.string())
        if isinstance(text_arr, pa.ChunkedArray):
            text_arr = text_arr.combine_chunks()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([did_k, new_ids])),
                "text": pa.concat_arrays([text_arr, new_text]),
            }
        )

    v2 = docs.map_batches(make_v2, batch_format="pyarrow")
    return snapshot_diff(
        docs.map_batches(with_fp, batch_format="pyarrow"),
        v2.map_batches(with_fp, batch_format="pyarrow"),
        key="doc_id",
        fp_col="fp",
    )


T_SNAPSHOT_SQL = """
WITH oldv AS (SELECT doc_id, text FROM documents),
newv AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || 'X' ELSE text END AS text
  FROM documents WHERE doc_id % 11 <> 0
  UNION ALL
  SELECT doc_id + 1000000000, 'new ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 13 = 0
),
j AS (SELECT coalesce(o.doc_id, n.doc_id) AS key,
             o.text AS ot, n.text AS nt
      FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id)
SELECT key,
       CASE WHEN ot IS NULL THEN 'added'
            WHEN nt IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM j WHERE ot IS NULL OR nt IS NULL OR ot <> nt
"""


def m_caption_extract(sf_dir: str):
    """Caption-side analytics on the image+caption table: vectorized
    regex extraction (pyarrow.compute.extract_regex, no per-row
    Python) pulls the structured scene/phase fields OUT OF THE CAPTION
    STRINGS, then a combiner-pushdown groupby aggregates per phase
    decade.  The oracle never reads a caption: it recomputes
    scene/phase numerically (the splitmix64 HUGEINT CTE) — a
    cross-representation gate that the string path parsed exactly what
    the generator encoded."""
    from .images.synth import synth_image_table
    from .relational import partial_grouped_agg

    ds = synth_image_table(2000, partition_rows=500)

    def extract(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(
            t["caption"], r"^synthetic scene (?P<scene>\d+) phase (?P<phase>\d+)$"
        )
        scene = pc.cast(pc.struct_field(ext, "scene"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        phase = pc.cast(pc.struct_field(ext, "phase"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "phase_decade": pa.array(phase // 100),
                "scene": pa.array(scene),
            }
        )

    return partial_grouped_agg(
        ds.map_batches(extract, batch_format="pyarrow"),
        ["phase_decade"],
        {"n_images": (None, "count"), "sum_scene": ("scene", "sum")},
    )


M_CAPTION_SQL = f"""
WITH {_SPLITMIX_PHASE_CTE}
SELECT CAST((h64 % 1000) // 100 AS BIGINT) AS phase_decade,
       count(*) AS n_images,
       CAST(sum(i) AS BIGINT) AS sum_scene
FROM fin GROUP BY 1
"""


def m_image_dedup(sf_dir: str):
    """Content-based exact image dedup: FNV63 over the encoded BYTES
    (vectorized buffer-level hash, payloads never shuffle — only slim
    (image_idx, content_hash) rows ride the exchange), keeper = min
    image_idx per distinct payload plus the duplicate count.

    On this deterministic corpus byte-equality is exactly
    (phase, codec) equality — two images share bytes iff splitmix64
    phases match AND both are lossy or both lossless — so the DuckDB
    oracle recomputes the clusters from the image index alone."""
    from .images.synth import synth_image_table
    from .relational import hash_exchange_map
    from .text.dedup import _content_hash_col

    ds = synth_image_table(2000, partition_rows=500)

    def hash_rows(t: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4), pa.int64())
        slim = pa.table({"image_idx": idx, "bytes": t["bytes"]})
        return _content_hash_col(slim, "bytes").select(["image_idx", "content_hash"])

    hashed = ds.map_batches(hash_rows, batch_format="pyarrow")

    def agg(df):
        g = df.groupby("content_hash", sort=False)
        import pandas as pd

        return pd.DataFrame(
            {"image_idx": g["image_idx"].min(), "n_dups": g.size()}
        ).reset_index(drop=True)

    return hash_exchange_map(hashed, "content_hash", 16, agg, fn_format="pandas")


M_IMAGE_DEDUP_SQL = f"""
WITH {_SPLITMIX_PHASE_CTE}
SELECT CAST(min(i) AS BIGINT) AS image_idx, CAST(count(*) AS BIGINT) AS n_dups
FROM fin GROUP BY h64 % 1000, (i % 4 = 0)
"""


def m_image_curation(sf_dir: str):
    """Composed multimodal curation pass — the image-side twin of
    t_curation_pass: byte-content dedup (keeper = min image_idx per
    distinct payload) -> deterministic splitmix64 hash sample of the
    keepers (keep 25%).  Shuffle-free after the dedup exchange; every
    stage re-runs to the identical sample (resume-stable), and the
    whole pipeline is one SQL statement for the oracle."""
    from .relational import hash_sample

    keepers = m_image_dedup(sf_dir)
    return hash_sample(keepers, "image_idx", 25, 100)


M_IMAGE_CURATION_SQL = f"""
WITH {_SPLITMIX_PHASE_CTE},
keepers AS (
  SELECT CAST(min(i) AS BIGINT) AS image_idx, CAST(count(*) AS BIGINT) AS n_dups
  FROM fin GROUP BY h64 % 1000, (i % 4 = 0)
),
{_splitmix_over("image_idx", "keepers")}
SELECT k2.image_idx, k2.n_dups
FROM keepers k2 JOIN smfin ON smfin.k = k2.image_idx
WHERE smfin.h64 % 100 < 25
"""


def m_phash_clusters(sf_dir: str):
    """Near-duplicate image clustering end to end: pHash band-LSH
    candidate pairs at Hamming 0 -> distributed connected components ->
    (cluster representative = min image_idx, cluster size), clusters of
    size >= 2 only (singletons never enter the edge list).

    No SQL oracle: the phash is a float block-mean image hash (not
    SQL-expressible, and many-to-one on generator phases — 221 hashes
    across 851 phases at n=2000), so the driver records rows-only and
    tests/test_images_text.py pins the clusters against an exact
    single-process group-by-phash oracle."""
    from .images.synth import synth_image_table
    from .relational import connected_components, grouped_count
    from .spatial.knn import phash_band_pairs

    ds = synth_image_table(2000, partition_rows=500)

    def items(t: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4), pa.int64())
        return pa.table({"item_id": idx, "phash": t["phash"]})

    pairs = ds.map_batches(items, batch_format="pyarrow")
    edges = phash_band_pairs(pairs, max_distance=0)
    comps = connected_components(edges, a_col="a_id", b_col="b_id")
    out = grouped_count(comps, "label", alias="csize")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"rep_idx": t["label"].cast(pa.int64()),
             "csize": t["csize"].cast(pa.int64())}
        )

    return out.map_batches(rename, batch_format="pyarrow")


# ------------------------------------------------- distance joins (integer)
# Integer micro-degree points derived from part keys: every distance is
# exact int64 arithmetic, so the DuckDB twins replay the joins
# bit-for-bit (no floats in the gate).
def part_points_int(sf_dir: str):
    def to_int(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "point_id": k,
                "x": k * 2654435761 % 8000000,
                "y": k * 40503 % 8000000,
            },
            schema=pa.schema(
                [("point_id", pa.int64()), ("x", pa.int64()), ("y", pa.int64())]
            ),
        )

    return _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        to_int, batch_format="pyarrow"
    )


_PART_PTS_SQL = """
SELECT CAST(p_partkey AS BIGINT) AS point_id,
       CAST(p_partkey AS BIGINT) * 2654435761 % 8000000 AS x,
       CAST(p_partkey AS BIGINT) * 40503 % 8000000 AS y
FROM part
"""

_RJ_QUERY_KEYS = [11, 23, 37, 53]
_RJ_RADIUS = 500_000  # micro-degrees


def g_radius_join(sf_dir: str):
    """Within-distance spatial join: all (probe, point) pairs with
    planar squared distance <= R^2.  Probe side broadcast (4 centers);
    point side streams through one map_batches with a bbox prefilter —
    no shuffle (spatial/distance.radius_join)."""
    from .spatial.distance import radius_join

    qk = np.array(_RJ_QUERY_KEYS, dtype=np.int64)
    return radius_join(
        part_points_int(sf_dir),
        qk,
        qk * 2654435761 % 8000000,
        qk * 40503 % 8000000,
        _RJ_RADIUS,
    )


G_RADIUS_SQL = f"""
WITH pts AS ({_PART_PTS_SQL}),
q AS (SELECT CAST(k AS BIGINT) AS query_id,
             CAST(k AS BIGINT) * 2654435761 % 8000000 AS qx,
             CAST(k AS BIGINT) * 40503 % 8000000 AS qy
      FROM (SELECT unnest([{', '.join(str(k) for k in _RJ_QUERY_KEYS)}]) AS k))
SELECT q.query_id, p.point_id,
       (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy) AS d2_udeg
FROM q CROSS JOIN pts p
WHERE abs(p.x - q.qx) <= {_RJ_RADIUS} AND abs(p.y - q.qy) <= {_RJ_RADIUS}
  AND (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy)
      <= {_RJ_RADIUS * _RJ_RADIUS}
"""


def g_nearest_site(sf_dir: str):
    """Nearest-neighbor spatial join: each point -> closest of 16
    sites, ties to the smaller site id.  One vectorized (n x 16)
    distance matrix per batch; the lexicographic argmin is a row-wise
    min over the packed key d2*64+site (spatial/distance.nearest_join),
    which the SQL twin takes verbatim as min(...) and decodes."""
    from .spatial.distance import nearest_join

    j = np.arange(16, dtype=np.int64)
    return nearest_join(
        part_points_int(sf_dir),
        j,
        (j * 5915587277 + 1000003) % 8000000,
        (j * 3367900313 + 2000003) % 8000000,
    )


G_NEAREST_SQL = f"""
WITH pts AS ({_PART_PTS_SQL}),
s AS (SELECT j AS site_id,
             (j * 5915587277 + 1000003) % 8000000 AS sx,
             (j * 3367900313 + 2000003) % 8000000 AS sy
      FROM range(16) t(j)),
k AS (SELECT p.point_id,
             min(((p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)) * 64
                 + s.site_id) AS kmin
      FROM pts p CROSS JOIN s GROUP BY 1)
SELECT point_id, kmin % 64 AS site_id, kmin // 64 AS d2_udeg FROM k
"""

def g_zorder_keys(sf_dir: str):
    """Morton / Z-order storage keys for the image points at level 12
    — the clustered sort key for locality-preserving table layout
    (spatial/cells.zorder_key: grid floor + magic-constant bit
    interleave, all integer shift/mask arithmetic the SQL twin
    replays step for step)."""
    from .spatial.cells import zorder_key

    def encode(t: pa.Table) -> pa.Table:
        z = zorder_key(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            12,
        )
        return pa.Table.from_pydict(
            {"image_id": t["image_id"], "zkey": pa.array(z)},
            schema=pa.schema([("image_id", pa.int64()), ("zkey", pa.int64())]),
        )

    return part_images(sf_dir).map_batches(encode, batch_format="pyarrow")


G_ZORDER_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
g AS (SELECT image_id,
             CAST(floor((lon + 180) / 360 * 4096) AS BIGINT) AS x,
             CAST(floor((lat + 90) / 180 * 4096) AS BIGINT) AS y
      FROM img),
a AS (SELECT image_id,
             (x | (x << 8)) & 16711935 AS x1,
             (y | (y << 8)) & 16711935 AS y1 FROM g),
b AS (SELECT image_id,
             (x1 | (x1 << 4)) & 252645135 AS x2,
             (y1 | (y1 << 4)) & 252645135 AS y2 FROM a),
c AS (SELECT image_id,
             (x2 | (x2 << 2)) & 858993459 AS x3,
             (y2 | (y2 << 2)) & 858993459 AS y3 FROM b),
d AS (SELECT image_id,
             (x3 | (x3 << 1)) & 1431655765 AS x4,
             (y3 | (y3 << 1)) & 1431655765 AS y4 FROM c)
SELECT image_id, x4 | (y4 << 1) AS zkey FROM d
"""


def e_quantize_codes(sf_dir: str):
    """Symmetric int8 scalar quantization of the embedding table —
    the ANN-index compression step (vectors.quantize_embeddings): one
    shuffle-free absmax pass reduced to a broadcast per-dim scale, one
    code-emitting pass.  floor-based so the gate never hits a rounding
    tie; the SQL twin computes (x*127)/absmax in the identical IEEE
    double op order."""
    from .vectors import quantize_embeddings

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return quantize_embeddings(emb, "vec_id", "embedding", levels=127)


E_QUANTIZE_SQL = """
WITH flat AS (
  SELECT vec_id,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(val AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT dim, max(abs(x)) AS amax FROM flat GROUP BY 1)
SELECT f.vec_id, f.dim,
       CAST(greatest(-127, least(127,
            floor((f.x * 127) / (CASE WHEN s.amax = 0 THEN 1.0 ELSE s.amax END))))
            AS BIGINT) AS code
FROM flat f JOIN s USING (dim)
"""


_GEO_QKEYS = [7, 19, 31]
_GEO_RADIUS_M = 120_000.0


def e_kmeans_sizes(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding table
    (vectors.kmeans: broadcast centroids, per-batch argmin + reduceat
    partials, vectors never shuffle; deterministic farthest-point
    init).  Iterative and float-centroid-valued, so no SQL oracle —
    output is the deterministic per-cluster size table and pytest pins
    planted-cluster recovery, argmin-consistency and partition-count
    independence."""
    from .relational import partial_grouped_agg
    from .vectors import kmeans

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    assign, _cents, _iters = kmeans(emb, "vec_id", "embedding", k=4, max_iters=15)
    return partial_grouped_agg(assign, ["cluster"], {"n_vecs": (None, "count")})


def g_radius_geo(sf_dir: str):
    """Geodesic (haversine, meters) within-distance join — the
    latitude-correct variant of g_radius_join
    (spatial/distance.radius_join_geo: lat-aware bbox prefilter + exact
    great-circle test, same broadcast/stream shape).  The gate is the
    MEMBERSHIP SET only (query_id, point_id — no float distances): on
    the frozen inputs no point sits within libm-ulp of the radius
    boundary, so both engines' trig agrees on every in/out decision."""
    from .spatial.distance import radius_join_geo

    qk = np.array(_GEO_QKEYS, dtype=np.int64)
    qlon = (qk * 2654435761 % 8000000) / 1e6 - 2.0
    qlat = (qk * 40503 % 8000000) / 1e6 - 2.0
    out = radius_join_geo(part_images(sf_dir), qk, qlon, qlat, _GEO_RADIUS_M,
                          id_col="image_id")
    return out.select_columns(["query_id", "point_id"])


G_RADIUS_GEO_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
q AS (SELECT CAST(k AS BIGINT) AS query_id,
             (CAST(k AS BIGINT) * 2654435761 % 8000000) / 1e6 - 2 AS qlon,
             (CAST(k AS BIGINT) * 40503 % 8000000) / 1e6 - 2 AS qlat
      FROM (SELECT unnest([{', '.join(str(k) for k in _GEO_QKEYS)}]) AS k))
SELECT q.query_id, i.image_id AS point_id
FROM q CROSS JOIN img i
WHERE 2 * 6371008.8 * asin(sqrt(least(1.0,
        sin(radians(i.lat - q.qlat) / 2) * sin(radians(i.lat - q.qlat) / 2)
        + cos(radians(q.qlat)) * cos(radians(i.lat))
          * sin(radians(i.lon - q.qlon) / 2) * sin(radians(i.lon - q.qlon) / 2))))
      <= {_GEO_RADIUS_M}
"""


_PYR_LEVELS = (12, 8, 4)


def g_cell_pyramid(sf_dir: str):
    """Multi-resolution tile-count pyramid over the image points: one
    pass at the finest level (per-batch np.unique partials), coarser
    levels derived from the fine histogram by integer shift arithmetic
    in one small reduce (spatial/tiles.cell_pyramid)."""
    from .spatial.tiles import cell_pyramid

    return cell_pyramid(part_images(sf_dir), _PYR_LEVELS)


# The SQL twin mirrors the engine exactly: float floor at the FINE
# grid once, then integer // shifts for the parents (never re-floors
# at the coarse grid, so float rounding can never diverge between the
# two level paths).
G_PYRAMID_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
fine AS (
  SELECT CAST(floor((lon + 180) / 360 * 4096) AS BIGINT) AS ix,
         CAST(floor((lat + 90) / 180 * 4096) AS BIGINT) AS iy
  FROM img),
f AS (SELECT ix, iy, count(*) AS n FROM fine GROUP BY 1, 2)
SELECT CAST(12 AS BIGINT) AS level,
       12 * 288230376151711744 + ix * 536870912 + iy AS cell_id,
       CAST(sum(n) AS BIGINT) AS n_points
FROM f GROUP BY 1, 2
UNION ALL
SELECT CAST(8 AS BIGINT),
       8 * 288230376151711744 + (ix // 16) * 536870912 + (iy // 16),
       CAST(sum(n) AS BIGINT)
FROM f GROUP BY 1, 2
UNION ALL
SELECT CAST(4 AS BIGINT),
       4 * 288230376151711744 + (ix // 256) * 536870912 + (iy // 256),
       CAST(sum(n) AS BIGINT)
FROM f GROUP BY 1, 2
"""


_TS_MAX = np.int64(1) << np.int64(62)


def q33_user_funnel(sf_dir: str):
    """Sequence-funnel conversion per user (view -> purchase): a user
    converts iff SOME view strictly precedes SOME purchase, i.e.
    min(view ts) < max(purchase ts) — the order-sensitive funnel
    reduced to two conditional extremes, so ONE combiner-push-down
    partial_grouped_agg does the whole thing (sentinel-coded
    conditional min/max; raw events never shuffle)."""
    from .relational import partial_grouped_agg

    ev = _pq(sf_dir, "events", ["ts", "user_id", "event_type"])

    def code(t: pa.Table) -> pa.Table:
        ts = (
            t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        et = t["event_type"].to_numpy(zero_copy_only=False)
        is_v = et == "view"
        is_p = et == "purchase"
        return pa.Table.from_pydict(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "view_ts": np.where(is_v, ts, _TS_MAX),
                "purch_ts": np.where(is_p, ts, -_TS_MAX),
                "n_v": is_v.astype(np.int64),
                "n_p": is_p.astype(np.int64),
            },
        )

    agg = partial_grouped_agg(
        ev.map_batches(code, batch_format="pyarrow"),
        ["user_id"],
        {
            "min_view": ("view_ts", "min"),
            "max_purch": ("purch_ts", "max"),
            "n_views": ("n_v", "sum"),
            "n_purchases": ("n_p", "sum"),
        },
    )

    def finish(t: pa.Table) -> pa.Table:
        mv = t["min_view"].to_numpy(zero_copy_only=False)
        mp = t["max_purch"].to_numpy(zero_copy_only=False)
        nv = t["n_views"].to_numpy(zero_copy_only=False).astype(np.int64)
        npp = t["n_purchases"].to_numpy(zero_copy_only=False).astype(np.int64)
        conv = ((nv > 0) & (npp > 0) & (mv < mp)).astype(np.int64)
        return pa.Table.from_pydict(
            {"user_id": t["user_id"].cast(pa.int64()),
             "n_views": nv, "n_purchases": npp, "converted": conv},
            schema=pa.schema([("user_id", pa.int64()), ("n_views", pa.int64()),
                              ("n_purchases", pa.int64()),
                              ("converted", pa.int64())]),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q33_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_views,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS n_purchases,
       CAST(CASE WHEN min(epoch_us(ts)) FILTER (WHERE event_type = 'view')
                      < max(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
                 THEN 1 ELSE 0 END AS BIGINT) AS converted
FROM events GROUP BY 1
"""


def q34_event_value_tiles(sf_dir: str):
    """Distribution windows per user over event values — NTILE(4),
    RANK with the PERCENT_RANK denominator, and the CUME_DIST
    numerator, all exact integers (the rational-as-two-ints recipe that
    keeps float window functions hash-gateable).  One hash exchange +
    one segmented vectorized pass computes all four
    (relational.partitioned_window kinds 'ntile:4' / 'rank' /
    'rank_den' / 'cume_num')."""
    from .relational import partitioned_window

    ev = _pq(sf_dir, "events", ["event_id", "user_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "event_id": t["event_id"].cast(pa.int64()),
                "value_cents": pa.array(cents),
            }
        )

    ds = ev.map_batches(to_cents, batch_format="pyarrow")
    return partitioned_window(
        ds,
        "user_id",
        [("value_cents", False), ("event_id", False)],
        {
            "quartile": ("value_cents", "ntile:4"),
            "vrank": ("value_cents", "rank"),
            "prank_den": ("value_cents", "rank_den"),
            "cume_rows": ("value_cents", "cume_num"),
        },
    )


Q34_SQL = """
WITH e AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS value_cents
  FROM events
)
SELECT user_id, event_id, value_cents,
       CAST(ntile(4) OVER (
         PARTITION BY user_id ORDER BY value_cents, event_id
       ) AS BIGINT) AS quartile,
       CAST(rank() OVER w AS BIGINT) AS vrank,
       CAST(count(*) OVER (PARTITION BY user_id) - 1 AS BIGINT) AS prank_den,
       CAST(count(*) OVER w AS BIGINT) AS cume_rows
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY value_cents)
"""


def q35_qty_disc_corr_parts(sf_dir: str):
    """Grouped CORRELATION via exact-integer sufficient statistics —
    per return flag, the six corr/covariance partials (n, Σx, Σy, Σx²,
    Σy², Σxy) over quantity x discount-basis-points, one combiner
    push-down pass (raw lineitem rows never shuffle; corr(x,y) =
    (nΣxy − ΣxΣy) / √((nΣx²−Σx²ₛ)(nΣy²−Σy²ₛ)) is a driver-side
    rational of these integers, so the gate is bit-exact where a float
    corr() could never be)."""
    from .relational import partial_grouped_agg

    li = _pq(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])

    def derive(t: pa.Table) -> pa.Table:
        q = np.round(
            t["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        d = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        one = np.ones(len(t), dtype=np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"].combine_chunks(),
                "one": pa.array(one),
                "x": pa.array(q),
                "y": pa.array(d),
                "xx": pa.array(q * q),
                "yy": pa.array(d * d),
                "xy": pa.array(q * d),
            }
        )

    return partial_grouped_agg(
        li.map_batches(derive, batch_format="pyarrow"),
        ["l_returnflag"],
        {
            "n": ("one", "sum"),
            "sum_x": ("x", "sum"),
            "sum_y": ("y", "sum"),
            "sum_xx": ("xx", "sum"),
            "sum_yy": ("yy", "sum"),
            "sum_xy": ("xy", "sum"),
        },
    )


Q35_SQL = """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y
  FROM lineitem
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * x) AS BIGINT) AS sum_xx,
       CAST(sum(y * y) AS BIGINT) AS sum_yy,
       CAST(sum(x * y) AS BIGINT) AS sum_xy
FROM li GROUP BY 1
"""


def q50_daily_user_bitmap(sf_dir: str):
    """Per-day active-user BITMAP index — the roaring-bitmap shape of
    audience analytics: each event sets bit (user_id % 64) of word
    (user_id // 64) for its day; per-batch OR partials combine through
    the new ``or`` kind of partial_grouped_agg (associative, raw
    events never shuffle) and the gate compares exact word values plus
    the popcount-derived distinct-user count per day against bit_or in
    SQL."""
    from .relational import partial_grouped_agg

    ev = _pq(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda t: pa.table({
            "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
            "word_idx": pa.array(
                t["user_id"].to_numpy(zero_copy_only=False) // 62),
            "word": pa.array(
                np.int64(1) << (t["user_id"].to_numpy(zero_copy_only=False)
                                % 62).astype(np.int64)),
        }),
        batch_format="pyarrow",
    )
    agg = partial_grouped_agg(ev, ["day", "word_idx"],
                              {"word": ("word", "or")})

    def finish(t: pa.Table) -> pa.Table:
        w = t["word"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pop = np.zeros(len(w), np.int64)
        v = w.copy()
        while v.any():
            pop += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        return pa.table({
            "day": t["day"].combine_chunks(),
            "word_idx": t["word_idx"].combine_chunks().cast(pa.int64()),
            "word": t["word"].combine_chunks().cast(pa.int64()),
            "n_users": pa.array(pop),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


Q50_SQL = """
WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                  user_id // 62 AS word_idx,
                  CAST(1 AS BIGINT) << CAST(user_id % 62 AS INT) AS bit
           FROM events)
SELECT day, word_idx, CAST(bit_or(bit) AS BIGINT) AS word,
       CAST(bit_count(bit_or(bit)) AS BIGINT) AS n_users
FROM e GROUP BY 1, 2
"""


def q53_unpivot_events(sf_dir: str):
    """UNPIVOT / melt — the wide→long reshape inverse of q16's PIVOT:
    the pivoted per-day count table melts back to (day, event_type, n)
    rows in one stateless map (each wide row emits #types long rows
    via column concat — no shuffle at all; the pivot's tiny combiner
    output is the only exchanged data), dropping zero-count cells the
    way UNPIVOT drops NULLs."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = q16_pivot_events_daily(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        n = len(t)
        day = t["day"].combine_chunks()
        days, ets, ns = [], [], []
        for et in types:
            days.append(day)
            ets.append(pa.array([et] * n, pa.string()))
            ns.append(t["n_" + et].combine_chunks().cast(pa.int64()))
        out = pa.table({
            "day": pa.concat_arrays(days),
            "event_type": pa.concat_arrays(ets),
            "n": pa.concat_arrays(ns),
        })
        return out.filter(pc.greater(out["n"], 0))

    return wide.map_batches(melt, batch_format="pyarrow")


Q53_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


def q52_props_extract(sf_dir: str):
    """Semi-structured property extraction — the JSON-ish payload
    field every event log carries: one Arrow RE2 `extract_regex` pass
    pulls k out of ``props`` (RE2 on both engines, so extraction is
    byte-identical), then a combiner-push-down sum/min/max/count per
    event type plus an n_bad miss counter (0 on healthy data but the
    gate checks it)."""
    from .relational import partial_grouped_agg

    ev = _pq(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        col = t["props"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        m = pc.extract_regex(col, r'"k": (?P<v>\d+)')
        v = pc.struct_field(m, "v")
        ok = pc.is_valid(v)
        k = pc.fill_null(pc.cast(v, pa.int64()), 0)
        return pa.table({
            "event_type": t["event_type"].combine_chunks(),
            "k": k,
            "bad": pc.cast(pc.invert(ok), pa.int64()),
        })

    return partial_grouped_agg(
        ev.map_batches(extract, batch_format="pyarrow"),
        ["event_type"],
        {"n": (None, "count"), "sum_k": ("k", "sum"),
         "min_k": ("k", "min"), "max_k": ("k", "max"),
         "n_bad": ("bad", "sum")},
    )


Q52_SQL = r"""
WITH e AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS v
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(COALESCE(v, 0)) AS BIGINT) AS sum_k,
       CAST(min(COALESCE(v, 0)) AS BIGINT) AS min_k,
       CAST(max(COALESCE(v, 0)) AS BIGINT) AS max_k,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
FROM e GROUP BY 1
"""


def q48_event_trigrams(sf_dir: str):
    """Top-20 length-3 event-type sequences across all users — the
    behavioral n-gram miner: ONE hash exchange on user_id, a
    per-partition lexsort + double shift builds every within-user
    trigram vectorized (all of a user's rows are co-located, so no
    window machinery is needed), per-partition np.unique pre-counts,
    one tiny grouped sum, and the shuffle-free relational.topk with
    full lexicographic tiebreak."""
    from .relational import hash_exchange_map, partial_grouped_agg, topk

    ev = _pq(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    tri_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("c", pa.string()), ("n", pa.int64())])

    def trigrams(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        if len(t) == 0:
            return tri_schema.empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, u))
        us, cs = u[order], codes[order]
        n = len(us)
        if n < 3:
            return tri_schema.empty_table()
        # trigram rows: positions i where i, i+1, i+2 share a user
        same = (us[:-2] == us[1:-1]) & (us[1:-1] == us[2:])
        a, b, c = cs[:-2][same], cs[1:-1][same], cs[2:][same]
        if len(a) == 0:
            return tri_schema.empty_table()
        v = len(et.dictionary)
        packed = (a * v + b) * v + c
        uniq, cnt = np.unique(packed, return_counts=True)
        dic = et.dictionary
        return pa.Table.from_pydict(
            {"a": dic.take(pa.array(uniq // (v * v))),
             "b": dic.take(pa.array(uniq // v % v)),
             "c": dic.take(pa.array(uniq % v)),
             "n": cnt.astype(np.int64)},
            schema=tri_schema)

    parts = hash_exchange_map(ev, "user_id", 16, trigrams)
    total = partial_grouped_agg(parts, ["a", "b", "c"], {"n": ("n", "sum")})
    return topk(total, [("n", True), ("a", False), ("b", False),
                        ("c", False)], k=20)


Q48_SQL = """
WITH w AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS b,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS c
  FROM events),
g AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS n FROM w
      WHERE b IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2, 3)
SELECT a, b, c, n FROM g ORDER BY n DESC, a, b, c LIMIT 20
"""


def q49_copurchase_pairs(sf_dir: str):
    """Market-basket mining: top-25 part pairs co-occurring in the
    same order — ONE hash exchange of slim (orderkey, partkey) rows,
    per-partition vectorized triu pair enumeration per order (the
    capped-LSH standard: an order's item list is bounded by the
    schema, so no cap needed here), np.unique pre-count, tiny grouped
    sum, shuffle-free topk."""
    from .relational import hash_exchange_map, partial_grouped_agg, topk

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    pair_schema = pa.schema([("part_a", pa.int64()), ("part_b", pa.int64()),
                             ("n", pa.int64())])

    def pairs(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        if len(t) == 0:
            return pair_schema.empty_table()
        o = t["l_orderkey"].to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, o))
        os_, ps = o[order], p[order]
        # dedup repeated parts within an order (same part on two lines)
        keep = np.r_[True, (os_[1:] != os_[:-1]) | (ps[1:] != ps[:-1])]
        os_, ps = os_[keep], ps[keep]
        starts = np.flatnonzero(np.r_[True, os_[1:] != os_[:-1]])
        ends = np.r_[starts[1:], len(os_)]
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            ii, jj = np.triu_indices(int(g), k=1)
            a_out.append(ps[s + ii])
            b_out.append(ps[s + jj])
        if not a_out:
            return pair_schema.empty_table()
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        packed = a * 2_000_000 + b  # partkeys < 2e6 at every test sf
        uniq, cnt = np.unique(packed, return_counts=True)
        return pa.Table.from_pydict(
            {"part_a": uniq // 2_000_000, "part_b": uniq % 2_000_000,
             "n": cnt.astype(np.int64)},
            schema=pair_schema)

    parts = hash_exchange_map(li, "l_orderkey", 16, pairs)
    total = partial_grouped_agg(parts, ["part_a", "part_b"],
                                {"n": ("n", "sum")})
    return topk(total, [("n", True), ("part_a", False), ("part_b", False)],
                k=25)


Q49_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
SELECT part_a, part_b, n FROM p ORDER BY n DESC, part_a, part_b LIMIT 25
"""


def q46_brand_price_slope(sf_dir: str):
    """Grouped least-squares slope of retail price (cents) vs part
    size as an EXACT integer rational: one combiner-push-down pass of
    the moment partials, then slope_num = nΣxy − ΣxΣy and slope_den =
    nΣx² − (Σx)² per brand — the regression analog of q35's corr
    gate; no float division anywhere."""
    from .relational import partial_grouped_agg

    part = _pq(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])

    def derive(t: pa.Table) -> pa.Table:
        x = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.round(
            t["p_retailprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "p_brand": t["p_brand"].combine_chunks(),
            "x": pa.array(x), "y": pa.array(y),
            "xx": pa.array(x * x), "xy": pa.array(x * y),
        })

    agg = partial_grouped_agg(
        part.map_batches(derive, batch_format="pyarrow"),
        ["p_brand"],
        {"n": (None, "count"), "sum_x": ("x", "sum"), "sum_y": ("y", "sum"),
         "sum_xx": ("xx", "sum"), "sum_xy": ("xy", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        sx = t["sum_x"].to_numpy(zero_copy_only=False)
        sy = t["sum_y"].to_numpy(zero_copy_only=False)
        sxx = t["sum_xx"].to_numpy(zero_copy_only=False)
        sxy = t["sum_xy"].to_numpy(zero_copy_only=False)
        return pa.table({
            "p_brand": t["p_brand"].combine_chunks(),
            "n": pa.array(n.astype(np.int64)),
            "slope_num": pa.array(n * sxy - sx * sy),
            "slope_den": pa.array(n * sxx - sx * sx),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


Q46_SQL = """
WITH p AS (SELECT p_brand, CAST(p_size AS BIGINT) AS x,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS y
           FROM part)
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den
FROM p GROUP BY 1
"""


def q47_user_event_entropy(sf_dir: str):
    """Per-user event-type entropy as EXACT integer evidence: each
    (user, type) count contributes round(c·ln(c)·10⁶) — rounded PER
    TERM so the grouped sum is an order-free integer (a raw float Σ
    would be addition-order-dependent and unhashable); entropy is the
    driver-side rational H = ln(n) − Σ/(n·10⁶) of (n_events,
    sum_clnc_1e6), same exactness argument as q35's corr partials."""
    from .relational import partial_grouped_agg

    ev = _pq(sf_dir, "events", ["user_id", "event_type"])
    cnt = partial_grouped_agg(
        ev, ["user_id", "event_type"], {"c": (None, "count")})

    def term(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
            "c": t["c"].combine_chunks().cast(pa.int64()),
            "clnc": pa.array(np.round(c * np.log(c) * 1e6).astype(np.int64)),
        })

    return partial_grouped_agg(
        cnt.map_batches(term, batch_format="pyarrow"),
        ["user_id"],
        {"n_events": ("c", "sum"), "n_types": (None, "count"),
         "sum_clnc_1e6": ("clnc", "sum")},
    )


Q47_SQL = """
WITH c AS (SELECT user_id, event_type, count(*) AS c
           FROM events GROUP BY 1, 2),
t AS (SELECT user_id, c,
             CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000)
                  AS BIGINT) AS clnc
      FROM c)
SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(clnc) AS BIGINT) AS sum_clnc_1e6
FROM t GROUP BY 1
"""


def q36_retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users bucketed by their FIRST active
    month, counted per (cohort_month, month_offset) — the product
    analytics staple.  Pipeline shape: events reduce to distinct
    (user, month) pairs first (composite int key — exact, not a hash —
    so raw events shuffle once as slim pairs), the per-user cohort is
    a combiner-push-down min over those pairs, and ONE int-keyed
    hash_join + tiny grouped count finishes — event payloads never
    move."""
    from .relational import distinct_on, hash_join, partial_grouped_agg

    ev = _pq(sf_dir, "events", ["ts", "user_id"])

    def month_pairs(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        m = ts.astype("datetime64[M]").astype(np.int64)  # months since 1970
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            # months since 1970 stay < 4096 for any sane timestamp, so
            # the composite key is collision-free by construction
            {"user_id": pa.array(uid), "m": pa.array(m),
             "um": pa.array(uid * 4096 + m)},
            schema=pa.schema([("user_id", pa.int64()), ("m", pa.int64()),
                              ("um", pa.int64())]),
        )

    pairs = distinct_on(
        ev.map_batches(month_pairs, batch_format="pyarrow"), "um"
    ).select_columns(["user_id", "m"]).materialize()
    cohort = partial_grouped_agg(pairs, ["user_id"], {"cm": ("m", "min")})
    joined = hash_join(
        pairs,
        cohort,
        on="user_id",
        l_schema=pa.schema([("user_id", pa.int64()), ("m", pa.int64())]),
        r_schema=pa.schema([("user_id", pa.int64()), ("cm", pa.int64())]),
        how="inner",
        num_partitions=16,
    )

    def offs(t: pa.Table) -> pa.Table:
        m = t["m"].to_numpy(zero_copy_only=False)
        cm = t["cm"].to_numpy(zero_copy_only=False)
        return pa.table({"cohort_month": pa.array(cm),
                         "month_offset": pa.array(m - cm)})

    return partial_grouped_agg(
        joined.map_batches(offs, batch_format="pyarrow"),
        ["cohort_month", "month_offset"],
        {"n_users": (None, "count")},
    )


Q36_SQL = """
WITH am AS (
  SELECT DISTINCT user_id,
         CAST(datediff('month', DATE '1970-01-01', ts) AS BIGINT) AS m
  FROM events
),
coh AS (SELECT user_id, min(m) AS cm FROM am GROUP BY 1)
SELECT cm AS cohort_month, m - cm AS month_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM am JOIN coh USING (user_id)
GROUP BY 1, 2
"""


def q37_event_transitions(sf_dir: str):
    """First-order event-transition matrix (Markov counts): per-user
    LAG over the ts-ordered event log, then a grouped count of
    (prev_event, next_event) bigrams — one hash exchange on user_id +
    segmented lag (relational.partitioned_window, string 'lag' kind)
    and one tiny combiner-push-down count; the sequence-statistics
    shape an LLM behavioral-data pipeline runs."""
    from .relational import partial_grouped_agg, partitioned_window

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "event_id": t["event_id"].cast(pa.int64()),
                "ts_us": t["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "event_type": t["event_type"].combine_chunks(),
            }
        )

    lagged = partitioned_window(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        [("ts_us", False), ("event_id", False)],
        {"prev_event": ("event_type", "lag")},
    )

    def pairs(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t["prev_event"])
        return pa.table(
            {"prev_event": t["prev_event"].filter(keep),
             "next_event": t["event_type"].filter(keep)}
        )

    return partial_grouped_agg(
        lagged.map_batches(pairs, batch_format="pyarrow"),
        ["prev_event", "next_event"],
        {"n": (None, "count")},
    )


Q37_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_event
  FROM events
)
SELECT prev_event, event_type AS next_event, CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev_event IS NOT NULL
GROUP BY 1, 2
"""


def q32_full_outer_fill(sf_dir: str):
    """FULL OUTER equi-join driver gate (relational.hash_join
    ``how='full_outer'``): BUILDING-segment customers vs per-customer
    order aggregates — left-only rows (BUILDING customers without
    orders) zero-fill the order stats, right-only rows (non-BUILDING
    customers' orders) sentinel-fill the segment flag; both sides'
    unmatched rows survive, gate columns all non-null integers."""
    from .relational import hash_join, partial_grouped_agg

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def bld(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["c_mktsegment"], "BUILDING")
        return pa.table({
            "o_custkey": t["c_custkey"].filter(keep).cast(pa.int64()),
            "is_building": pa.array(
                np.ones(int(np.count_nonzero(keep.to_numpy(zero_copy_only=False))),
                        dtype=np.int64)
            ),
        })

    left = cust.map_batches(bld, batch_format="pyarrow")
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"o_custkey": t["o_custkey"].combine_chunks(),
                         "cents": pa.array(cents)})

    agg = partial_grouped_agg(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"],
        {"n_orders": (None, "count"), "cents_sum": ("cents", "sum")},
    )
    joined = hash_join(
        left,
        agg,
        on="o_custkey",
        l_schema=pa.schema([("o_custkey", pa.int64()),
                            ("is_building", pa.int64())]),
        r_schema=pa.schema([("o_custkey", pa.int64()),
                            ("n_orders", pa.int64()),
                            ("cents_sum", pa.int64())]),
        how="full_outer",
    )

    def fill(t: pa.Table) -> pa.Table:
        out = {"custkey": t["o_custkey"].cast(pa.int64())}
        for c in ("is_building", "n_orders", "cents_sum"):
            v = t[c].combine_chunks().to_numpy(zero_copy_only=False)
            v = np.nan_to_num(v.astype(np.float64), nan=0.0).astype(np.int64)
            out[c] = pa.array(v, pa.int64())
        return pa.Table.from_pydict(out)

    return joined.map_batches(fill, batch_format="pyarrow")


Q32_SQL = """
WITH bld AS (SELECT c_custkey AS custkey, CAST(1 AS BIGINT) AS is_building
             FROM customer WHERE c_mktsegment = 'BUILDING'),
agg AS (SELECT o_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents_sum
        FROM orders GROUP BY 1)
SELECT COALESCE(b.custkey, a.custkey) AS custkey,
       COALESCE(b.is_building, 0) AS is_building,
       COALESCE(a.n_orders, 0) AS n_orders,
       COALESCE(a.cents_sum, 0) AS cents_sum
FROM bld b FULL OUTER JOIN agg a ON b.custkey = a.custkey
"""


def q31_order_expectations(sf_dir: str):
    """Data-quality expectation gate (relational.validate_expectations):
    four vectorized rules over orders, ONE scan, (rule, n_rows,
    n_violations) per rule — the publish gate a production pipeline
    runs before promoting a dataset."""
    from .relational import validate_expectations

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"])

    def _nonpositive_price(t: pa.Table):
        return pc.less_equal(t["o_totalprice"], 0.0)

    def _null_custkey(t: pa.Table):
        return pc.is_null(t["o_custkey"])

    def _bad_priority(t: pa.Table):
        return pc.invert(pc.is_in(
            t["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                "4-NOT SPECIFIED", "5-LOW"]),
        ))

    def _dup_low_key(t: pa.Table):
        # plausibility rule exercising a numeric band: keys must be > 0
        return pc.less_equal(t["o_orderkey"], 0)

    def _price_band(t: pa.Table):
        # a rule that actually FIRES on this data (anomalously large
        # orders) so the gate checks non-zero violation accounting too
        return pc.greater(t["o_totalprice"], 300000.0)

    return validate_expectations(orders, {
        "nonpositive_price": _nonpositive_price,
        "null_custkey": _null_custkey,
        "bad_priority": _bad_priority,
        "nonpositive_key": _dup_low_key,
        "price_above_300k": _price_band,
    })


Q31_SQL = """
SELECT 'bad_priority' AS rule, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderpriority NOT IN
            ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
            THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'nonpositive_key', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_orderkey <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'nonpositive_price', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'null_custkey', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'price_above_300k', CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
"""


def t_bm25_topk(sf_dir: str):
    """Top-3 BM25 terms per document (text/analysis.bm25_topk):
    Robertson idf with dl/avgdl length normalization, ranked on the
    half-away-rounded integer score with the term as tiebreak (the
    tfidf-proven ulp-proof recipe)."""
    from .text.analysis import bm25_topk

    return bm25_topk(_pq(sf_dir, "documents", ["doc_id", "text"]), k=3)


T_BM25_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
a AS (SELECT (SELECT CAST(sum(dl) AS DOUBLE) FROM dl) / (SELECT n FROM n) AS avgdl),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(
           ln(1.0 + (n.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * (1.2 + 1))
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / a.avgdl))
           * 1000000) AS BIGINT) AS score_1e6
  FROM tf JOIN df ON tf.term = df.term
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN n CROSS JOIN a
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score_1e6 DESC, term) AS r
  FROM scored
)
SELECT doc_id, term, score_1e6 FROM ranked WHERE r <= 3
"""


def g_convex_hull(sf_dir: str):
    """Distributed convex hull (spatial/hull.convex_hull): per-block
    vectorized Akl-Toussaint prune, exact monotone chain over the tiny
    survivor stream.  Gate input: integer points derived from the 64
    smallest supplier keys (relational.topk, no sort shuffle) so the
    Caratheodory SQL vertex test (p is a vertex iff p is not inside
    any triangle / segment of the other distinct points) stays a
    feasible cross join.  Output = the distinct strict hull vertices;
    row order is not meaningful (the driver sorts)."""
    from .relational import topk
    from .spatial.hull import convex_hull

    sup = topk(_pq(sf_dir, "supplier", ["s_suppkey"]),
               [("s_suppkey", False)], k=64)

    def to_pts(t: pa.Table) -> pa.Table:
        k = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"x": k * 2654435761 % 8000000, "y": k * 40503 % 8000000},
            schema=pa.schema([("x", pa.int64()), ("y", pa.int64())]),
        )

    return convex_hull(sup.map_batches(to_pts, batch_format="pyarrow"))


G_HULL_SQL = """
WITH sk AS (SELECT CAST(s_suppkey AS BIGINT) AS k
            FROM supplier ORDER BY s_suppkey LIMIT 64),
pts AS (SELECT DISTINCT k * 2654435761 % 8000000 AS x,
                        k * 40503 % 8000000 AS y FROM sk),
inner_tri AS (
  SELECT DISTINCT p.x, p.y
  FROM pts p
  JOIN pts a ON (a.x, a.y) != (p.x, p.y)
  JOIN pts b ON (b.x, b.y) != (p.x, p.y)
  JOIN pts c ON (c.x, c.y) != (p.x, p.y)
  WHERE (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) != 0
    AND sign((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x))
        * sign((c.x - b.x) * (p.y - b.y) - (c.y - b.y) * (p.x - b.x)) >= 0
    AND sign((c.x - b.x) * (p.y - b.y) - (c.y - b.y) * (p.x - b.x))
        * sign((a.x - c.x) * (p.y - c.y) - (a.y - c.y) * (p.x - c.x)) >= 0
    AND sign((a.x - c.x) * (p.y - c.y) - (a.y - c.y) * (p.x - c.x))
        * sign((b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x)) >= 0
),
inner_seg AS (
  SELECT DISTINCT p.x, p.y
  FROM pts p
  JOIN pts a ON (a.x, a.y) != (p.x, p.y)
  JOIN pts b ON (b.x, b.y) != (p.x, p.y) AND (b.x, b.y) != (a.x, a.y)
  WHERE (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) = 0
    AND (p.x - a.x) * (b.x - a.x) + (p.y - a.y) * (b.y - a.y) >= 0
    AND (p.x - b.x) * (a.x - b.x) + (p.y - b.y) * (a.y - b.y) >= 0
)
SELECT x, y FROM pts
EXCEPT SELECT x, y FROM inner_tri
EXCEPT SELECT x, y FROM inner_seg
"""


def t_char_diversity(sf_dir: str):
    """Character-diversity quality signal (text/analysis
    char_diversity): per-doc character count, distinct characters, and
    the exact-integer Simpson collision sum — one flat-buffer
    np.unique pass per batch, no shuffle, no floats anywhere."""
    from .text.analysis import char_diversity

    return char_diversity(_pq(sf_dir, "documents", ["doc_id", "text"]))


T_CHAR_DIVERSITY_SQL = r"""
WITH ch AS (
  SELECT doc_id, u.c AS c, count(*) AS cnt
  FROM documents, unnest(regexp_extract_all(text, '[\s\S]')) AS u(c)
  GROUP BY 1, 2)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(count(ch.c) AS BIGINT) AS n_distinct_chars,
       CAST(COALESCE(sum(ch.cnt * ch.cnt), 0) AS BIGINT) AS collision_sum
FROM documents d LEFT JOIN ch ON ch.doc_id = d.doc_id
GROUP BY 1, 2
"""


def q30_user_coverage(sf_dir: str):
    """Union-of-intervals per user (temporal.interval_coverage): each
    event opens a deterministic (event_id % 7 + 1)-minute interval;
    the query reports total covered microseconds and merged-island
    count per user — overlaps collapse, touching intervals merge.
    One slim hash exchange + a single vectorized segmented pass per
    partition."""
    from .temporal import interval_coverage

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id"])

    def mk(t: pa.Table) -> pa.Table:
        s = (
            t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = s + (eid % 7 + 1) * 60_000_000
        return pa.Table.from_pydict(
            {"user_id": t["user_id"].cast(pa.int64()), "s": s, "e": e},
            schema=pa.schema([("user_id", pa.int64()), ("s", pa.int64()),
                              ("e", pa.int64())]),
        )

    iv = ev.map_batches(mk, batch_format="pyarrow")
    out = interval_coverage(iv, by="user_id", start_col="s", end_col="e")

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["user_id", "covered_us", "n_islands"])

    return out.map_batches(rename, batch_format="pyarrow")


Q30_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + (event_id % 7 + 1) * 60000000 AS e
  FROM events),
m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM iv),
isl AS (
  SELECT user_id, s, e,
         CAST(sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM m),
pi AS (SELECT user_id, island, max(e) - min(s) AS len
       FROM isl GROUP BY 1, 2)
SELECT user_id, CAST(sum(len) AS BIGINT) AS covered_us,
       CAST(count(*) AS BIGINT) AS n_islands
FROM pi GROUP BY 1
"""


def m_tile_phash_rollup(sf_dir: str):
    """Geo x image composition: every image point is assigned its
    level-6 grid cell (spatial/cells.cell_id — same float-floor-once
    encode the pyramid uses) and each tile rolls up to image count,
    bit_xor pHash fingerprint (order-independent, exact — the 'did
    this tile's content change' signal for incremental re-processing)
    and min pHash — one combiner-push-down partial_grouped_agg, raw
    image rows never shuffle."""
    from .relational import partial_grouped_agg
    from .spatial.cells import cell_id

    def assign(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"cell_id": cell_id(lon, lat, 6), "phash": t["phash"]},
            schema=pa.schema([("cell_id", pa.int64()), ("phash", pa.int64())]),
        )

    cells = part_images(sf_dir).map_batches(assign, batch_format="pyarrow")
    return partial_grouped_agg(
        cells,
        ["cell_id"],
        {
            "n_images": (None, "count"),
            "phash_xor": ("phash", "xor"),
            "phash_min": ("phash", "min"),
        },
    )


M_TILE_ROLLUP_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
c AS (SELECT 6 * 288230376151711744
             + CAST(floor((lon + 180) / 360 * 64) AS BIGINT) * 536870912
             + CAST(floor((lat + 90) / 180 * 64) AS BIGINT) AS cell_id,
             phash
      FROM img)
SELECT cell_id,
       CAST(count(*) AS BIGINT) AS n_images,
       bit_xor(phash) AS phash_xor,
       min(phash) AS phash_min
FROM c GROUP BY 1
"""


_REDACT_PATTERN = r"\b(spark|slow)\b"


def t_redact(sf_dir: str):
    """Regex scrub / PII-redaction stage (text/analysis
    redact_documents): global RE2 replace of the target pattern plus a
    per-document hit-count audit column — one stateless vectorized
    map_batches, no shuffle.  Arrow and DuckDB both execute RE2, which
    is what makes the gate byte-exact on the redacted text."""
    from .text.analysis import redact_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return redact_documents(docs, pattern=_REDACT_PATTERN, replacement="[X]")


T_REDACT_SQL = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_REDACT_PATTERN}')) AS BIGINT) AS n_hits,
       regexp_replace(text, '{_REDACT_PATTERN}', '[X]', 'g') AS redacted
FROM documents
"""


def q29_user_mode_event(sf_dir: str):
    """Statistical mode per group (relational.grouped_mode): each
    user's most frequent event type with its count, ties to the
    lexically smaller type — combiner-push-down (user, type) counts
    then a k=1 grouped_topk; raw events never shuffle."""
    from .relational import grouped_mode

    ev = _pq(sf_dir, "events", ["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type", count_col="mode_count")


Q29_SQL = """
SELECT user_id, event_type, mode_count FROM (
  SELECT user_id, event_type, CAST(cnt AS BIGINT) AS mode_count,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cnt DESC, event_type) AS rn
  FROM (SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2)
) WHERE rn = 1
"""


def g_knn_sites(sf_dir: str):
    """k-nearest spatial join (spatial/distance.knearest_join): each
    point's 3 closest of the 16 sites, ranked, ties to the smaller
    site id via the same packed (d2*64 + idx) integer key as
    g_nearest_site — broadcast site table, one (n, 16) distance matrix
    + argpartition per batch, no shuffle."""
    from .spatial.distance import knearest_join

    j = np.arange(16, dtype=np.int64)
    return knearest_join(
        part_points_int(sf_dir),
        j,
        (j * 5915587277 + 1000003) % 8000000,
        (j * 3367900313 + 2000003) % 8000000,
        k=3,
    )


G_KNN_SITES_SQL = f"""
WITH pts AS ({_PART_PTS_SQL}),
s AS (SELECT j AS site_idx,
             (j * 5915587277 + 1000003) % 8000000 AS sx,
             (j * 3367900313 + 2000003) % 8000000 AS sy
      FROM range(16) t(j)),
r AS (SELECT p.point_id,
             ((p.x - s.sx) * (p.x - s.sx) + (p.y - s.sy) * (p.y - s.sy)) * 64
             + s.site_idx AS key
      FROM pts p CROSS JOIN s),
w AS (SELECT point_id, key,
             row_number() OVER (PARTITION BY point_id ORDER BY key) AS nn_rank
      FROM r)
SELECT point_id, CAST(nn_rank AS BIGINT) AS nn_rank,
       CAST(key % 64 AS BIGINT) AS site_id,
       CAST(key // 64 AS BIGINT) AS d2_udeg
FROM w WHERE nn_rank <= 3
"""


def q38_pareto_orders(sf_dir: str):
    """2-D Pareto frontier / skyline (relational.pareto_front): the
    non-dominated orders on (price maximized, order date minimized) --
    "no other order is both at least as expensive and at least as
    early, one strictly".  Each block prunes to its local skyline
    (a locally dominated pair can never be globally non-dominated)
    before ONE exact reduce over the tiny survivor stream; per-pair
    row counts sum across blocks exactly because every block holding a
    global survivor emits it.  The oracle recomputes the frontier with
    an independent mechanism (min-day representative per price + a
    running-min window over descending price)."""
    from .relational import pareto_front

    ords = _pq(sf_dir, "orders", ["o_totalprice", "o_orderdate"])

    def to_pts(t: pa.Table) -> pa.Table:
        price = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        day = (
            t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False) // 86_400_000_000
        )
        return pa.Table.from_pydict(
            {"price_cents": price, "day_i": day},
            schema=pa.schema([("price_cents", pa.int64()),
                              ("day_i", pa.int64())]),
        )

    out = pareto_front(ords.map_batches(to_pts, batch_format="pyarrow"),
                       "price_cents", "day_i")
    return out.map_batches(
        lambda t: t.rename_columns(["price_cents", "day_i", "n_orders"]),
        batch_format="pyarrow",
    )


Q38_SQL = """
WITH pts AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day_i
  FROM orders),
d AS (SELECT price_cents, day_i, CAST(count(*) AS BIGINT) AS n_orders
      FROM pts GROUP BY 1, 2),
rep AS (SELECT price_cents, day_i, n_orders,
               row_number() OVER (PARTITION BY price_cents
                                  ORDER BY day_i) AS rn
        FROM d),
r2 AS (SELECT price_cents, day_i, n_orders,
              min(day_i) OVER (ORDER BY price_cents DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS pm
       FROM rep WHERE rn = 1)
SELECT price_cents, day_i, n_orders FROM r2 WHERE pm IS NULL OR day_i < pm
"""


def q39_cms_user_registers(sf_dir: str):
    """Count-Min sketch registers (relational.cms_registers) over the
    event log's user column -- the mergeable point-frequency sketch:
    4 x 1024 additive counters, each batch bincounts locally and only
    nonzero slots travel; partials merge by SUM across any
    partitioning.  Register-exact gate (same technique as the HLL
    query): the oracle replays splitmix64(user_id*4 + r) % 1024 in
    HUGEINT arithmetic and counts per slot."""
    from .relational import cms_registers

    return cms_registers(_pq(sf_dir, "events", ["user_id"]), "user_id",
                         depth=4, width=1024)


Q39_SQL = f"""
WITH ks AS (SELECT user_id * 4 + rr AS kk
            FROM events
            CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS rr)),
{_splitmix_over("kk", "ks")}
SELECT CAST(k % 4 AS BIGINT) AS r,
       CAST(h64 % 1024 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM smfin GROUP BY 1, 2
"""


def q40_group_checksum(sf_dir: str):
    """Order-independent table checksum per group
    (relational.table_checksum): modular sums of splitmix64 row-key
    hashes under two independent primes + row count, per return flag
    -- the validate-100-TB-without-moving-it primitive (any dropped /
    duplicated / altered row flips the 62-bit fingerprint; commutative
    addition makes it partitioning- and order-independent).  Row key =
    (l_orderkey * 8 + l_linenumber) * 4 + flag code -- the group is
    folded INTO the hashed key so the oracle recovers it from k % 4
    without a join-back (the synthetic lineitem has duplicate
    (orderkey, linenumber) pairs, so a join-back would fan out)."""
    from .relational import table_checksum

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_returnflag"])
    flag_set = pa.array(["A", "N", "R"])

    def keyed(t: pa.Table) -> pa.Table:
        code = (
            pc.index_in(t["l_returnflag"], value_set=flag_set)
            .cast(pa.int64()).combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        k = (
            t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 8
            + t["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        ) * 4 + code
        return pa.Table.from_pydict(
            {"rowk": k, "l_returnflag": t["l_returnflag"].combine_chunks()},
            schema=pa.schema([("rowk", pa.int64()),
                              ("l_returnflag", pa.string())]),
        )

    return table_checksum(ds=li.map_batches(keyed, batch_format="pyarrow"),
                          key_col="rowk", group_keys=["l_returnflag"])


Q40_SQL = f"""
WITH src AS (SELECT (l_orderkey * 8 + l_linenumber) * 4
                    + CASE l_returnflag WHEN 'A' THEN 0
                                        WHEN 'N' THEN 1 ELSE 2 END AS rowk
             FROM lineitem),
{_splitmix_over("rowk", "src")}
SELECT CASE k % 4 WHEN 0 THEN 'A' WHEN 1 THEN 'N' ELSE 'R' END
         AS l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(h64 % 2147483647) % 2147483647 AS BIGINT) AS csum_a,
       CAST(sum(h64 % 2147483629) % 2147483629 AS BIGINT) AS csum_b
FROM smfin GROUP BY 1
"""


def m_tile_quota(sf_dir: str):
    """Per-tile image quota (spatial rebalancing curation): cap every
    level-6 tile at 8 images, kept deterministically by smallest
    splitmix64(image_id) -- the dataset-balancing pass a
    vision-pretraining pipeline runs so dense metros don't dominate
    training batches.  Composition: cell assign (spatial/cells.cell_id)
    -> relational.grouped_topk on the hash (per-block top-k first, so
    raw rows never shuffle; the exchange carries <= 8 x tiles x blocks
    candidate rows)."""
    from .relational import grouped_topk
    from .spatial.cells import cell_id

    def assign(t: pa.Table) -> pa.Table:
        from .images.synth import splitmix64

        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        img = t["image_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(img.astype(np.uint64))
        return pa.Table.from_pydict(
            {"cell_id": cell_id(lon, lat, 6), "image_id": img,
             "h64": h},
            schema=pa.schema([("cell_id", pa.int64()),
                              ("image_id", pa.int64()),
                              ("h64", pa.uint64())]),
        )

    cells = part_images(sf_dir).map_batches(assign, batch_format="pyarrow")
    kept = grouped_topk(cells, "cell_id",
                        [("h64", False), ("image_id", False)], k=8)
    return kept.select_columns(["cell_id", "image_id"])


M_TILE_QUOTA_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
c AS (SELECT image_id,
             6 * 288230376151711744
             + CAST(floor((lon + 180) / 360 * 64) AS BIGINT) * 536870912
             + CAST(floor((lat + 90) / 180 * 64) AS BIGINT) AS cell_id
      FROM img),
{_splitmix_over("image_id", "c")}
, w AS (SELECT c.cell_id, c.image_id,
               row_number() OVER (PARTITION BY c.cell_id
                                  ORDER BY f.h64, c.image_id) AS rn
        FROM c JOIN smfin f ON f.k = c.image_id)
SELECT cell_id, image_id FROM w WHERE rn <= 8
"""



def q41_user_hour_ohlc(sf_dir: str):
    """Open-high-low-close bars per (user, hour)
    (relational.grouped_ohlc): open/close are the values at the min /
    max event time, recovered WITHOUT a sort or join-back by the
    two-sided packed-key trick -- min(t*S+v) and max(t*S+(S-1-v)) are
    the conditional extremes as plain min/max partials, so ONE
    combiner-push-down pass computes all five bar columns; ties on t
    take the smallest value at both ends, and the oracle runs the
    identical packed expressions verbatim."""
    from .relational import grouped_ohlc

    ev = _pq(sf_dir, "events", ["ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = (
            t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        vc = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {"user_id": t["user_id"].cast(pa.int64()),
             "hour_i": us // 3_600_000_000,
             "off_us": us % 3_600_000_000,
             "vc": vc},
        )

    out = grouped_ohlc(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "hour_i"], "off_us", "vc", value_bits=26,
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            ["user_id", "hour_i", "open_cents", "close_cents",
             "high_cents", "low_cents", "n_events"]),
        batch_format="pyarrow",
    )


Q41_SQL = """
WITH e AS (
  SELECT user_id,
         epoch_us(ts) // 3600000000 AS hour_i,
         epoch_us(ts) % 3600000000 AS off_us,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events)
SELECT user_id, hour_i,
       CAST(min(off_us * 67108864 + vc) % 67108864 AS BIGINT) AS open_cents,
       CAST(67108863 - max(off_us * 67108864 + 67108863 - vc) % 67108864
            AS BIGINT) AS close_cents,
       max(vc) AS high_cents,
       min(vc) AS low_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM e GROUP BY 1, 2
"""


def q44_max_event_gap(sf_dir: str):
    """Longest silence per user — max inter-event gap in microseconds
    (monitoring / churn-signal window op): one hash exchange
    (partitioned_window lag over (ts, event_id)), a vectorized gap
    map with a -1 sentinel for first events (no nulls in the gate),
    and a combiner-push-down max+count."""
    from .relational import partial_grouped_agg, partitioned_window

    ev = _pq(sf_dir, "events", ["user_id", "ts", "event_id"]).map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
            "ts_us": t["ts"].combine_chunks().cast(pa.timestamp("us"))
            .cast(pa.int64()),
            "event_id": t["event_id"].combine_chunks().cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )
    w = partitioned_window(
        ev, "user_id", [("ts_us", False), ("event_id", False)],
        {"prev_us": ("ts_us", "lag")},
    )

    def gap(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
            "gap": pc.fill_null(
                pc.subtract(t["ts_us"], t["prev_us"]), -1).combine_chunks()
            .cast(pa.int64()),
        })

    return partial_grouped_agg(
        w.map_batches(gap, batch_format="pyarrow"),
        ["user_id"],
        {"max_gap_us": ("gap", "max"), "n_events": (None, "count")},
    )


Q44_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
g AS (SELECT user_id,
             COALESCE(ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                               ORDER BY ts_us, event_id),
                      -1) AS gap
      FROM e)
SELECT user_id, max(gap) AS max_gap_us, CAST(count(*) AS BIGINT) AS n_events
FROM g GROUP BY 1
"""


def q45_cume_new_users(sf_dir: str):
    """Cumulative distinct users by day — the audience-growth curve:
    per-user first-seen day as a combiner-push-down grouped MIN (string
    days sort chronologically), per-day new-user counts, and ONE
    running sum over the #days-row result (driver-side, metrics-scale
    by construction — the distinct-user set itself never leaves the
    cluster)."""
    from .relational import dataset_from_table, partial_grouped_agg

    ev = _pq(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
            "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
        }),
        batch_format="pyarrow",
    )
    first = partial_grouped_agg(ev, ["user_id"], {"day": ("day", "min")})
    per_day = partial_grouped_agg(
        first.select_columns(["day"]), ["day"], {"n_new": (None, "count")}
    ).to_pandas().sort_values("day").reset_index(drop=True)
    per_day["cume_users"] = per_day["n_new"].cumsum().astype("int64")
    return dataset_from_table(
        pa.Table.from_pandas(per_day, preserve_index=False))


Q45_SQL = """
WITH f AS (SELECT user_id, min(strftime(ts, '%Y-%m-%d')) AS day
           FROM events GROUP BY 1),
c AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1)
SELECT day, n_new,
       CAST(sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cume_users
FROM c
"""


def g_two_hop(sf_dir: str):
    """Per-vertex distinct <=2-hop reach (relational.two_hop_counts)
    over the same deterministic 64-vertex part-key graph as
    g_triangles: symmetrized dedup once, one middle-vertex self-join,
    pair-routed distinct, combiner-push-down count."""
    from .relational import two_hop_counts

    def to_edges(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"u": k * 2654435761 % 8000000 // 125000,
             "v": k * 40503 % 8000000 // 125000},
            schema=pa.schema([("u", pa.int64()), ("v", pa.int64())]),
        )

    edges = _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        to_edges, batch_format="pyarrow")
    return two_hop_counts(edges, "u", "v")


G_TWO_HOP_SQL = """
WITH raw AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part),
e0 AS (SELECT k * 2654435761 % 8000000 // 125000 AS u,
             k * 40503 % 8000000 // 125000 AS v FROM raw),
sym AS (SELECT u AS a, v AS b FROM e0 WHERE u <> v
        UNION SELECT v, u FROM e0 WHERE u <> v),
two AS (SELECT l.a AS a, r.b AS w FROM sym l JOIN sym r ON l.b = r.a
        WHERE l.a <> r.b),
reach AS (SELECT DISTINCT a, w
          FROM (SELECT a, b AS w FROM sym UNION ALL SELECT a, w FROM two))
SELECT a AS vertex, CAST(count(*) AS BIGINT) AS n_reach FROM reach GROUP BY 1
"""


def q42_value_mad(sf_dir: str):
    """Grouped median absolute deviation of event values in cents
    (relational.grouped_mad) — robust outlier scale per event type:
    two exact histogram-quantile passes (percentile_disc rule), raw
    rows never shuffle, the #groups median table broadcasts between
    them."""
    from .relational import grouped_mad

    ev = _pq(sf_dir, "events", ["event_type", "value"]).map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"].combine_chunks(),
            "vc": pa.array(np.round(
                t["value"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        }),
        batch_format="pyarrow",
    )
    out = grouped_mad(ev, "event_type", "vc")
    return out.map_batches(
        lambda t: t.rename_columns(["event_type", "med_cents", "mad_cents",
                                    "n"]),
        batch_format="pyarrow",
    )


Q42_SQL = """
WITH e AS (SELECT event_type,
                  CAST(round(value * 100) AS BIGINT) AS vc FROM events),
m AS (SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY vc) AS BIGINT)
               AS med_cents
      FROM e GROUP BY 1)
SELECT e.event_type, m.med_cents,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(e.vc - m.med_cents))
            AS BIGINT) AS mad_cents,
       CAST(count(*) AS BIGINT) AS n
FROM e JOIN m USING (event_type) GROUP BY 1, 2
"""


def q43_fk_orphans(sf_dir: str):
    """Cross-table referential-integrity / coverage audit — the
    data-quality scan a 100-TB lake runs after ingesting a window: one
    left_anti hash join per FK edge (membership test per partition, no
    row duplication), counting dimension rows the 1995 fact window did
    NOT cover (non-zero by construction) plus two strict FK checks
    (zero on healthy data).  One (check, n) row each."""
    from .relational import hash_join

    def count_anti(left, right, on_l, on_r, check):
        from .relational import dataset_from_table

        l2 = left.map_batches(
            lambda t, c=on_l: pa.table({"k": t[c].combine_chunks()
                                        .cast(pa.int64())}),
            batch_format="pyarrow")
        r2 = right.map_batches(
            lambda t, c=on_r: pa.table({"k": t[c].combine_chunks()
                                        .cast(pa.int64())}),
            batch_format="pyarrow")
        n = hash_join(
            l2, r2, on="k",
            l_schema=pa.schema([("k", pa.int64())]),
            r_schema=pa.schema([("k", pa.int64())]),
            how="left_anti",
        ).count()
        return dataset_from_table(pa.table(
            {"check": pa.array([check], pa.string()),
             "n_orphans": pa.array([n], pa.int64())}))

    def year_filter(ds, ts_col, year):
        def f(t: pa.Table, c=ts_col, y=year) -> pa.Table:
            yy = pc.year(t[c])
            return t.filter(pc.equal(yy, y))
        return ds.map_batches(f, batch_format="pyarrow")

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    part = _pq(sf_dir, "part", ["p_partkey"])
    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_shipdate"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey"])
    li95 = year_filter(li, "l_shipdate", 1995)

    # the 1995 ingest window: which dimension rows does it NOT cover?
    out = count_anti(cust, year_filter(orders, "o_orderdate", 1995),
                     "c_custkey", "o_custkey", "customers_without_1995_order")
    for args in [(part, li95, "p_partkey", "l_partkey",
                  "parts_not_shipped_1995"),
                 (supp, li, "s_suppkey", "l_suppkey", "suppliers_never_used"),
                 (orders, cust, "o_custkey", "c_custkey",
                  "orders_missing_customer")]:
        out = out.union(count_anti(*args))
    return out


Q43_SQL = """
SELECT 'customers_without_1995_order' AS check, CAST(count(*) AS BIGINT) AS n_orphans
FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995)
UNION ALL
SELECT 'parts_not_shipped_1995', CAST(count(*) AS BIGINT)
FROM part p WHERE NOT EXISTS (SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND year(l.l_shipdate) = 1995)
UNION ALL
SELECT 'suppliers_never_used', CAST(count(*) AS BIGINT)
FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
UNION ALL
SELECT 'orders_missing_customer', CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


def e_int8_dot_topk(sf_dir: str):
    """Quantized exact-re-rank ANN (vectors.int8_dot_topk): top-10
    neighbors for the 4 smallest-id query vectors by the EXACT integer
    dot product of int8 quantization codes — broadcast query codes,
    per-batch integer matmul + partial top-k, grouped_topk finish; no
    float tolerance anywhere.  The oracle recomputes the identical
    floor-quantization (the e_quantize_codes expression) and joins
    codes on dim."""
    from .vectors import int8_dot_topk

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return int8_dot_topk(emb, "vec_id", "embedding", k=10, num_queries=4)


E_INT8_DOT_SQL = """
WITH flat AS (
  SELECT vec_id,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(val AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT dim, max(abs(x)) AS amax FROM flat GROUP BY 1),
codes AS (
  SELECT f.vec_id, f.dim,
         CAST(greatest(-127, least(127,
              floor((f.x * 127) / (CASE WHEN s.amax = 0 THEN 1.0 ELSE s.amax END))))
              AS BIGINT) AS code
  FROM flat f JOIN s USING (dim)),
q AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
dots AS (
  SELECT qc.vec_id AS query_id, c.vec_id AS vec_id,
         CAST(sum(qc.code * c.code) AS BIGINT) AS dot
  FROM codes qc JOIN codes c USING (dim)
  WHERE qc.vec_id IN (SELECT vec_id FROM q) AND c.vec_id <> qc.vec_id
  GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, vec_id) AS rn
      FROM dots)
SELECT query_id, vec_id, dot FROM r WHERE rn <= 10
"""


def t_inverted_index(sf_dir: str):
    """Exact-match search index over the documents corpus
    (text/analysis.inverted_index): per distinct term, exact df and
    total occurrences plus a posting list capped at the 16 smallest
    doc_ids, comma-joined ascending; one term-hash exchange, lexsort +
    reduceat + pc.binary_join kernel, raw text never shuffles.  The
    oracle caps via row_number and string_aggs in the same order."""
    from .text.analysis import inverted_index

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return inverted_index(docs, max_postings=16)


T_INVIDX_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term <> '' GROUP BY 1, 2),
rn AS (SELECT doc_id, term, tf,
              row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       FROM tf)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS n_occ,
       string_agg(CASE WHEN rn <= 16 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS postings
FROM rn GROUP BY term
"""


def t_fuzzy_name_pairs(sf_dir: str):
    """Fuzzy entity-resolution join (text/dedup.editdist1_pairs): all
    customer-name pairs at edit distance exactly 1 -- deletion-variant
    blocking keys (complete for distance <= 1), vectorized per-bucket
    pair enumeration with the capped-LSH standard, real-string-pair
    dedup, exact verify.  The oracle blocks on the same deletion
    variants in SQL and verifies with levenshtein()."""
    from .text.dedup import editdist1_pairs

    names = _pq(sf_dir, "customer", ["c_name"]).map_batches(
        lambda t: pa.table({"term": t["c_name"].combine_chunks()}),
        batch_format="pyarrow",
    )
    return editdist1_pairs(names, min_len=4)


T_FUZZY_SQL = """
WITH v AS (SELECT DISTINCT c_name AS term FROM customer
           WHERE len(c_name) >= 4),
idx AS (SELECT CAST(range AS BIGINT) AS i FROM range(64)),
var AS (
  SELECT term, term AS var FROM v
  UNION ALL
  SELECT term,
         substr(term, 1, CAST(i AS INT)) || substr(term, CAST(i + 2 AS INT))
           AS var
  FROM v JOIN idx ON idx.i < len(term)),
cand AS (SELECT DISTINCT least(a.term, b.term) AS term_a,
                         greatest(a.term, b.term) AS term_b
         FROM var a JOIN var b ON a.var = b.var AND a.term < b.term)
SELECT term_a, term_b FROM cand WHERE levenshtein(term_a, term_b) = 1
"""


def g_triangles(sf_dir: str):
    """Exact distributed triangle count (relational.triangle_count,
    degree-ordered orientation -- wedge fan-out bounded by sqrt(m) even
    with hub vertices): a deterministic 64-vertex graph derived from
    part keys; output is one (n_edges, n_triangles) row the 3-way
    self-join oracle recomputes."""
    from .relational import triangle_count

    def to_edges(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # high bits of the mixed key, NOT low bits: (x % 64) of a
        # linear map is itself linear in k mod 64, which makes v a
        # function of u (zero triangles); // 125000 decorrelates
        return pa.Table.from_pydict(
            {"u": k * 2654435761 % 8000000 // 125000,
             "v": k * 40503 % 8000000 // 125000},
            schema=pa.schema([("u", pa.int64()), ("v", pa.int64())]),
        )

    edges = _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        to_edges, batch_format="pyarrow")
    return triangle_count(edges, "u", "v")


def g_pagerank(sf_dir: str):
    """Fixed-iteration integer PageRank (relational.pagerank): ranks
    in ppm, per-edge share r // outdeg, update ((100-85)*1e6)//100 +
    85*contrib//100 — all-integer so the 3-iteration unrolled SQL twin
    is bit-exact.  Directed 64-vertex graph from part keys (same
    decorrelated high-bits construction as g_triangles)."""
    from .relational import pagerank

    def to_edges(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"src": k * 2654435761 % 8000000 // 125000,
             "dst": k * 40503 % 8000000 // 125000},
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        )

    edges = _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        to_edges, batch_format="pyarrow")
    return pagerank(edges, "src", "dst", iterations=3)


G_PAGERANK_SQL = """
WITH raw AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part),
e AS (SELECT DISTINCT k * 2654435761 % 8000000 // 125000 AS src,
                      k * 40503 % 8000000 // 125000 AS dst FROM raw),
verts AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e),
od AS (SELECT src AS vertex, CAST(count(*) AS BIGINT) AS odeg
       FROM e GROUP BY 1),
r0 AS (SELECT vertex, CAST(1000000 AS BIGINT) AS r FROM verts),
c1 AS (SELECT e.dst AS vertex, CAST(sum(r0.r // od.odeg) AS BIGINT) AS c
       FROM e JOIN r0 ON r0.vertex = e.src JOIN od ON od.vertex = e.src
       GROUP BY 1),
r1 AS (SELECT v.vertex,
              CAST(150000 + 85 * COALESCE(c1.c, 0) // 100 AS BIGINT) AS r
       FROM verts v LEFT JOIN c1 USING (vertex)),
c2 AS (SELECT e.dst AS vertex, CAST(sum(r1.r // od.odeg) AS BIGINT) AS c
       FROM e JOIN r1 ON r1.vertex = e.src JOIN od ON od.vertex = e.src
       GROUP BY 1),
r2 AS (SELECT v.vertex,
              CAST(150000 + 85 * COALESCE(c2.c, 0) // 100 AS BIGINT) AS r
       FROM verts v LEFT JOIN c2 USING (vertex)),
c3 AS (SELECT e.dst AS vertex, CAST(sum(r2.r // od.odeg) AS BIGINT) AS c
       FROM e JOIN r2 ON r2.vertex = e.src JOIN od ON od.vertex = e.src
       GROUP BY 1),
r3 AS (SELECT v.vertex,
              CAST(150000 + 85 * COALESCE(c3.c, 0) // 100 AS BIGINT) AS r
       FROM verts v LEFT JOIN c3 USING (vertex))
SELECT vertex, r AS rank_ppm FROM r3
"""


G_TRIANGLES_SQL = """
WITH raw AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part),
e0 AS (SELECT k * 2654435761 % 8000000 // 125000 AS u,
            k * 40503 % 8000000 // 125000 AS v FROM raw),
e AS (SELECT DISTINCT least(u, v) AS lo, greatest(u, v) AS hi
      FROM e0 WHERE u != v)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
"""



# ------------------------------------------------- round-5f operator wave
def t_simhash_pairs(sf_dir: str):
    """SimHash NEAR-duplicate pairs at Hamming distance <= 3 — the
    classic web-dedup detector (Manku et al. 2007): banded LSH over the
    64-bit signatures (4 x 16-bit bands; 3 differing bits can spoil at
    most 3 bands, so every qualifying pair shares >= 1 exact band —
    candidate generation is COMPLETE, not probabilistic, at this
    radius) plus an exact Hamming verify.  Signatures ride the
    exchange as slim (band_key, id, hash) rows; document text never
    shuffles.  The SQL twin recomputes the signatures (recursive-CTE
    FNV, the t_simhash technique) and cross-joins with bit_count."""
    from .spatial.knn import phash_band_pairs
    from .text.dedup import simhash_signatures

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    sigs = simhash_signatures(docs).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["doc_id"], t["simhash"]], names=["item_id", "phash"]),
        batch_format="pyarrow",
    )
    return phash_band_pairs(sigs, max_distance=3)


def q54_order_outliers(sf_dir: str):
    """Grouped IQR outlier fences (robust anomaly screen): per order
    priority, q1/q3 of the integer cents via the exact histogram-merge
    quantiles, then one streaming pass counts rows outside
    [q1 - 1.5*IQR, q3 + 1.5*IQR].  The x2 scaling keeps the half-IQR
    fence in integers, so both engines compare identical int64s.  The
    fence table is #groups rows (broadcast in the flag closure); raw
    order rows never shuffle — their outlier flags combine
    combiner-style."""
    from .relational import (dataset_from_table, grouped_quantiles,
                             partial_grouped_agg)

    orders = _pq(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"o_orderpriority": t["o_orderpriority"].combine_chunks(),
                         "cents": pa.array(cents)})

    cents = orders.map_batches(to_cents, batch_format="pyarrow").materialize()
    q = grouped_quantiles(
        cents, "o_orderpriority", "cents", {"q1": 0.25, "q3": 0.75},
        n_col="n_orders",
    ).to_pandas()  # #groups rows (5): tiny by construction
    keys = pa.array(q["o_orderpriority"].tolist())
    q1 = q["q1"].to_numpy().astype(np.int64)
    q3 = q["q3"].to_numpy().astype(np.int64)
    lo2 = 2 * q1 - 3 * (q3 - q1)
    hi2 = 2 * q3 + 3 * (q3 - q1)

    def flag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["o_orderpriority"], value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        c = t["cents"].to_numpy(zero_copy_only=False)
        out = (2 * c < lo2[idx]) | (2 * c > hi2[idx])
        return pa.table({"o_orderpriority": t["o_orderpriority"].combine_chunks(),
                         "outlier": pa.array(out.astype(np.int64))})

    counts = partial_grouped_agg(
        cents.map_batches(flag, batch_format="pyarrow"),
        ["o_orderpriority"], {"n_outliers": ("outlier", "sum")},
    ).to_pandas()
    out = q.merge(counts, on="o_orderpriority")
    return dataset_from_table(pa.Table.from_pandas(out, preserve_index=False))


Q54_SQL = """
WITH o AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
q AS (
  SELECT o_orderpriority,
         quantile_disc(cents, 0.25) AS q1,
         quantile_disc(cents, 0.75) AS q3,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM o GROUP BY 1)
SELECT q.o_orderpriority, q.q1, q.q3, q.n_orders,
       CAST(sum(CASE WHEN 2 * o.cents < 2 * q.q1 - 3 * (q.q3 - q.q1)
                       OR 2 * o.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM o JOIN q USING (o_orderpriority)
GROUP BY 1, 2, 3, 4
"""


def q55_user_status_periods(sf_dir: str):
    """SCD2 history build from the event log: collapse each user's
    ordered event stream into validity periods — one row per maximal
    run of consecutive equal event types, with first/last event time
    and run length (temporal.status_periods: one hash exchange on
    user_id, vectorized dictionary-encode + run-break pass per
    partition)."""
    from .temporal import status_periods

    ev = _pq(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"].combine_chunks(),
            "t_us": t["ts"].combine_chunks().cast(pa.int64()),
            "event_type": t["event_type"].combine_chunks(),
            "event_id": t["event_id"].combine_chunks(),
        })

    out = status_periods(
        ev.map_batches(prep, batch_format="pyarrow"),
        by="user_id", on="t_us", status_col="event_type",
        order_col="event_id",
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            ["user_id", "status", "start_us", "end_us", "n_events"]),
        batch_format="pyarrow",
    )


Q55_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_type, event_id FROM events),
m AS (
  SELECT user_id, t, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
i AS (
  SELECT user_id, t, event_type,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM m)
SELECT user_id, min(event_type) AS status,
       CAST(min(t) AS BIGINT) AS start_us,
       CAST(max(t) AS BIGINT) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM i GROUP BY user_id, isl
"""


_KCORE_DIV = 7812  # ~1025-vertex organic graph: non-trivial peel at every sf
_KCORE_K = 4
# planted 10-clique on vertices 5000-5009 (disjoint from the organic
# range [0, 1024]) plus a pendant path 5009-5010-5011-5012: the clique
# guarantees a non-empty 4-core at every sf (the sf0.001 organic graph
# is too sparse to keep one) and the path exercises the peel
_KCORE_PLANTED = ([(5000 + i, 5000 + j) for i in range(10)
                   for j in range(i + 1, 10)]
                  + [(5009, 5010), (5010, 5011), (5011, 5012)])


def q56_part_graph_kcore(sf_dir: str):
    """Maximal 4-core of the part-derived graph plus a planted clique
    (relational.kcore): iterative distributed peel — per-round degree
    combiner + two slim semi joins — with a strictly-decreasing
    edge-count stop.  The SQL twin unrolls 12 peel rounds (measured
    depth: 8 at sf0.01, <=2 elsewhere; extra rounds are fixed-point
    no-ops), so the gate is exact on (vertex, in-core degree)."""
    import ray as _ray

    from .relational import kcore

    def to_edges(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"a": k * 2654435761 % 8000000 // _KCORE_DIV,
             "b": k * 40503 % 8000000 // _KCORE_DIV},
            schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
        )

    planted = _ray.data.from_arrow(pa.Table.from_pydict(
        {"a": np.array([e[0] for e in _KCORE_PLANTED], np.int64),
         "b": np.array([e[1] for e in _KCORE_PLANTED], np.int64)},
        schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    ))
    edges = _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        to_edges, batch_format="pyarrow").union(planted)
    return kcore(edges, _KCORE_K, a_col="a", b_col="b")


def _kcore_sql(k: int, div: int, rounds: int) -> str:
    # every s{i} is referenced twice per round: without MATERIALIZED,
    # CTE inlining doubles the plan per round (2^rounds base scans -->
    # "too many open files")
    values = ", ".join(f"({a}, {b})" for a, b in _KCORE_PLANTED)
    parts = [f"""raw AS (SELECT CAST(p_partkey AS BIGINT) AS pk FROM part),
e0 AS (SELECT pk * 2654435761 % 8000000 // {div} AS u,
              pk * 40503 % 8000000 // {div} AS v FROM raw
       UNION ALL
       SELECT CAST(u AS BIGINT), CAST(v AS BIGINT)
       FROM (VALUES {values}) AS planted(u, v)),
e AS MATERIALIZED (SELECT DISTINCT least(u, v) AS lo, greatest(u, v) AS hi
      FROM e0 WHERE u != v),
s0 AS MATERIALIZED (SELECT lo AS vertex FROM e UNION SELECT hi FROM e)"""]
    for i in range(rounds):
        parts.append(
            f"""ke{i} AS MATERIALIZED (SELECT e.lo, e.hi FROM e
  JOIN s{i} a ON a.vertex = e.lo JOIN s{i} b ON b.vertex = e.hi),
d{i} AS MATERIALIZED (SELECT vertex, CAST(count(*) AS BIGINT) AS degree
         FROM (SELECT lo AS vertex FROM ke{i}
               UNION ALL SELECT hi FROM ke{i})
         GROUP BY 1),
s{i + 1} AS MATERIALIZED (SELECT vertex FROM d{i} WHERE degree >= {k})"""
        )
    last = rounds - 1
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT vertex, degree FROM d{last} WHERE degree >= {k}")


Q56_SQL = _kcore_sql(_KCORE_K, _KCORE_DIV, 12)


def t_gopher_filter(sf_dir: str):
    """Composed Gopher-style quality filter (Rae et al. 2021 family):
    per document, keep/drop plus the FIRST failing rule as the audit
    reason — too_short (< 20 tokens), too_long (> 90), low_alpha
    (alpha ratio < 0.815) — all integer comparisons on the analyzer's
    columns, one stateless vectorized pass, no shuffle.  The reason
    precedence makes drop accounting disjoint (sum of reason counts ==
    total drops), which is what a curation dashboard actually needs."""
    from .text.analysis import analyze_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    feats = analyze_documents(docs, concurrency=2).select_columns(
        ["doc_id", "n_tokens", "alpha_ratio"])

    def rules(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        ppm = np.floor(
            t["alpha_ratio"].to_numpy(zero_copy_only=False) * 1_000_000
        ).astype(np.int64)
        reason = np.select(
            [nt < 20, nt > 90, ppm < 815000],
            ["too_short", "too_long", "low_alpha"], default="keep")
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
            "n_tokens": pa.array(nt),
            "alpha_ratio_ppm": pa.array(ppm),
            "keep": pa.array((reason == "keep").astype(np.int64)),
            "reason": pa.array(reason.tolist(), pa.string()),
        })

    return feats.map_batches(rules, batch_format="pyarrow")


T_GOPHER_SQL = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         CAST(floor(CASE WHEN length(text) = 0 THEN 0.0
              ELSE length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                   / length(text) END * 1000000) AS BIGINT) AS ppm
  FROM documents)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, ppm AS alpha_ratio_ppm,
       CAST(CASE WHEN n_tokens < 20 OR n_tokens > 90 OR ppm < 815000
                 THEN 0 ELSE 1 END AS BIGINT) AS keep,
       CASE WHEN n_tokens < 20 THEN 'too_short'
            WHEN n_tokens > 90 THEN 'too_long'
            WHEN ppm < 815000 THEN 'low_alpha'
            ELSE 'keep' END AS reason
FROM t
"""


def _lcg64_sql(expr: str) -> str:
    """Signed-BIGINT view of the 64-bit LCG mix of ``expr`` (the
    _PART_IMG_SQL phash arithmetic, parameterized)."""
    u = (f"(CAST({expr} AS HUGEINT) * 6364136223846793005 "
         f"+ 1442695040888963407) % 18446744073709551616")
    return (f"CAST({u} - CASE WHEN {u} >= 9223372036854775808 "
            f"THEN 18446744073709551616 ELSE 0 END AS BIGINT)")


def m_phash_near_pairs(sf_dir: str):
    """pHash near-duplicate pairs at Hamming <= 3 over a derived image
    hash with PLANTED quad structure (the same low-bit-perturbation a
    re-encoded thumbnail produces): base hash = LCG mix of the quad
    anchor, low 2 bits = the member index, so within-quad pairs sit at
    Hamming 1-2 and cross-quad pairs at ~32.  Banded LSH (4 x 16 bits,
    complete at radius <= 3) + exact verify — the engine's pair set
    equals the oracle's full O(n^2) bit_count cross join.  Key cap
    4096 bounds the oracle join at every sf."""
    from .spatial.knn import phash_band_pairs

    def quad_phash(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[k < 4096]
        base = (k - k % 4).astype(np.uint64)
        ph = (base * np.uint64(6364136223846793005)
              + np.uint64(1442695040888963407)) ^ (k % 4).astype(np.uint64)
        return pa.Table.from_pydict(
            {"item_id": k, "phash": ph.astype(np.int64)},
            schema=pa.schema([("item_id", pa.int64()), ("phash", pa.int64())]),
        )

    items = _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        quad_phash, batch_format="pyarrow")
    return phash_band_pairs(items, max_distance=3)


M_PHASH_PAIRS_SQL = f"""
WITH img AS (
  SELECT CAST(p_partkey AS BIGINT) AS image_id,
         xor({_lcg64_sql("p_partkey - p_partkey % 4")},
             CAST(p_partkey % 4 AS BIGINT)) AS ph
  FROM part WHERE p_partkey < 4096)
SELECT a.image_id AS a_id, b.image_id AS b_id,
       CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS distance
FROM img a JOIN img b
  ON a.image_id < b.image_id AND bit_count(xor(a.ph, b.ph)) <= 3
"""


def t_substring_dup(sf_dir: str):
    """Exact duplicated-substring signal at window width 32 chars
    (text/dedup.char_window_dup): per doc, distinct windows + windows
    shared verbatim with another doc + ppm — the copy-paste detector
    token shingles miss.  Windows come zero-copy off the Arrow string
    buffer (sliding_window_view + vectorized FNV); only slim distinct
    (window_hash, doc_id) rows ride the gram exchange.  The SQL twin
    enumerates the same windows with substr over generate_series."""
    from .text.dedup import char_window_dup

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    out = char_window_dup(docs, window=32)
    return out.map_batches(
        lambda t: t.rename_columns(
            ["doc_id", "n_windows", "n_shared", "shared_ppm"]),
        batch_format="pyarrow",
    )


T_SUBSTR_DUP_SQL = """
WITH w AS (
  SELECT doc_id, substr(text, CAST(g AS INTEGER), 32) AS win
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 31)) AS g
        FROM documents)
),
dw AS (SELECT DISTINCT doc_id, win FROM w),
gc AS (SELECT win, count(*) AS nd FROM dw GROUP BY 1),
per AS (
  SELECT dw.doc_id,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(count(*) FILTER (WHERE gc.nd >= 2) AS BIGINT) AS n_shared
  FROM dw JOIN gc USING (win) GROUP BY 1)
SELECT doc_id, n_windows, n_shared,
       n_shared * 1000000 // n_windows AS shared_ppm
FROM per
"""


def t_norm_dedup(sf_dir: str):
    """Canonicalized (fuzzy-exact) dedup: lowercase, strip
    non-alphanumerics, collapse whitespace — the normalization pass
    that catches trivially-reformatted duplicates exact_dedup misses —
    then keeper (min doc_id) + duplicate count per distinct normalized
    text.  Arrow and DuckDB both run RE2, so the normalized strings
    are byte-identical on both sides (the t_redact precedent); only
    slim (doc_id, content_hash) rows ride the exchange."""
    from .relational import hash_exchange_map
    from .text.dedup import _content_hash_col

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(pc.fill_null(t["text"], ""))
        s = pc.replace_substring_regex(s, r"[^a-z0-9\s]", "")
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim_whitespace(s)
        slim = pa.table({"doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                         "norm": s})
        return _content_hash_col(slim, "norm").select(["doc_id", "content_hash"])

    hashed = docs.map_batches(norm, batch_format="pyarrow")

    def agg(df):
        import pandas as pd

        g = df.groupby("content_hash", sort=False)
        return pd.DataFrame(
            {"doc_id": g["doc_id"].min(), "n_dups": g.size()}
        ).reset_index(drop=True)

    return hash_exchange_map(hashed, "content_hash", 16, agg, fn_format="pandas")


T_NORM_DEDUP_SQL = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                             '\s+', ' ', 'g')) AS norm
  FROM documents)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM n GROUP BY norm
"""


_PACK_BUDGET = 700  # tokens per source (~half of each sf's per-source mass)


def t_token_budget_pack(sf_dir: str):
    """Data-mixture packing: deterministically select documents per
    source, in doc_id order, until each source's token budget is spent
    — the 'fill the mixture to N tokens per domain' step of training-
    data assembly.  One hash exchange on the source key, one segmented
    cumsum (relational.partitioned_window), a stateless filter; raw
    text never shuffles (only analyzer counts)."""
    from .relational import partitioned_window
    from .text.analysis import analyze_documents
    from .text.dedup import _content_hash_col

    docs = _pq(sf_dir, "documents", ["doc_id", "text", "source"])
    feats = analyze_documents(docs, concurrency=2).select_columns(
        ["doc_id", "source", "n_tokens"])
    keyed = feats.map_batches(
        lambda t: _content_hash_col(t, "source"), batch_format="pyarrow")
    win = partitioned_window(
        keyed, "content_hash", [("doc_id", False)],
        {"cum_tokens": ("n_tokens", "cumsum")},
    )
    return win.filter(expr=f"cum_tokens <= {_PACK_BUDGET}").select_columns(
        ["doc_id", "source", "n_tokens", "cum_tokens"])


T_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents),
w AS (
  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM t)
SELECT doc_id, source, n_tokens, cum_tokens
FROM w WHERE cum_tokens <= {_PACK_BUDGET}
"""


_PRICE_BANDS = [  # (band, lo_cents inclusive, hi_cents exclusive)
    ("band_0", 0, 5_000_000),
    ("band_1", 5_000_000, 15_000_000),
    ("band_2", 15_000_000, 25_000_000),
    ("band_3", 25_000_000, 35_000_000),
    ("band_4", 35_000_000, 45_000_000),
    ("band_5", 45_000_000, 10**18),
]


def q57_price_band_join(sf_dir: str):
    """Broadcast RANGE-lookup join (the dimension-band non-equi join):
    each order routed to its price band by one np.searchsorted against
    the broadcast band edges — no shuffle for the join itself (the
    small side rides the task closure), per-band rollup via the
    combiner push-down.  The SQL twin is the literal non-equi JOIN ON
    cents >= lo AND cents < hi."""
    from .relational import partial_grouped_agg

    edges = np.array([b[1] for b in _PRICE_BANDS], np.int64)
    names = np.array([b[0] for b in _PRICE_BANDS])

    def assign(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        idx = np.searchsorted(edges, cents, side="right") - 1
        return pa.table({"band": pa.array(names[idx].tolist(), pa.string()),
                         "cents": pa.array(cents)})

    orders = _pq(sf_dir, "orders", ["o_totalprice"])
    return partial_grouped_agg(
        orders.map_batches(assign, batch_format="pyarrow"),
        ["band"], {"n_orders": (None, "count"), "sum_cents": ("cents", "sum")},
    )


Q57_SQL = f"""
WITH bands(band, lo, hi) AS (VALUES
  {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _PRICE_BANDS)}),
o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
SELECT b.band,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o.cents) AS BIGINT) AS sum_cents
FROM o JOIN bands b ON o.cents >= b.lo AND o.cents < b.hi
GROUP BY 1
"""


def q58_bitmap_retention(sf_dir: str):
    """Day-over-day retention via BITMAP algebra: build each day's
    active-user bitmap (62-bit words, bit_or combiner — the q50
    index), join day d's words with day d+1's on a packed
    (day, word_idx) key, and popcount the AND — set intersection as
    pure integer ops, never materializing user lists.  The oracle
    recomputes retention from plain DISTINCT set logic, gating that
    the bitmap math equals set semantics.  Day pairs with zero
    returning users emit no row on either side (inner join)."""
    from .relational import hash_join, partial_grouped_agg

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000
        return pa.table({
            "day_i": pa.array(day.astype(np.int64)),
            "word_idx": pa.array((u // 62).astype(np.int64)),
            "word": pa.array((np.int64(1) << (u % 62).astype(np.int64))),
        })

    ev = _pq(sf_dir, "events", ["user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    bm = partial_grouped_agg(ev, ["day_i", "word_idx"],
                             {"word": ("word", "or")}).materialize()

    def as_next(t: pa.Table) -> pa.Table:
        d = t["day_i"].to_numpy(zero_copy_only=False)
        wi = t["word_idx"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"jk": (d + 1) * 4096 + wi, "day_next": d + 1,
             "word_a": t["word"].combine_chunks()},
            schema=pa.schema([("jk", pa.int64()), ("day_next", pa.int64()),
                              ("word_a", pa.int64())]),
        )

    def as_self(t: pa.Table) -> pa.Table:
        d = t["day_i"].to_numpy(zero_copy_only=False)
        wi = t["word_idx"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"jk": d * 4096 + wi, "word_b": t["word"].combine_chunks()},
            schema=pa.schema([("jk", pa.int64()), ("word_b", pa.int64())]),
        )

    j = hash_join(
        bm.map_batches(as_next, batch_format="pyarrow"),
        bm.map_batches(as_self, batch_format="pyarrow"),
        on="jk",
        l_schema=pa.schema([("jk", pa.int64()), ("day_next", pa.int64()),
                            ("word_a", pa.int64())]),
        r_schema=pa.schema([("jk", pa.int64()), ("word_b", pa.int64())]),
    )

    def pop_and(t: pa.Table) -> pa.Table:
        v = (t["word_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
             & t["word_b"].to_numpy(zero_copy_only=False).astype(np.uint64))
        pop = np.zeros(len(v), np.int64)
        while v.any():
            pop += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
        return pa.table({"day_i": t["day_next"].combine_chunks(),
                         "n_ret": pa.array(pop)})

    out = partial_grouped_agg(
        j.map_batches(pop_and, batch_format="pyarrow"),
        ["day_i"], {"n_returning": ("n_ret", "sum")},
    )
    return out.filter(expr="n_returning > 0")


Q58_SQL = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_i, user_id FROM events)
SELECT CAST(b.day_i AS BIGINT) AS day_i,
       CAST(count(*) AS BIGINT) AS n_returning
FROM du a JOIN du b ON b.user_id = a.user_id AND b.day_i = a.day_i + 1
GROUP BY 1
"""


_BBOX_CELL = 500_000  # micro-degrees per grid cell (16x16 over the 8M range)


def g_cell_bbox_agg(sf_dir: str):
    """Per-cell bounding-box metadata (the pruning index a clustered
    spatial layout stores per tile): min/max integer coordinates and
    point count per grid cell, one combiner push-down pass over the
    integer point table — min/max/count partials, raw points never
    shuffle."""
    from .relational import partial_grouped_agg

    def assign(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        cell = (x // _BBOX_CELL) * 16 + y // _BBOX_CELL
        return pa.table({"cell": pa.array(cell.astype(np.int64)),
                         "x": t["x"].combine_chunks(),
                         "y": t["y"].combine_chunks()})

    pts = part_points_int(sf_dir).map_batches(assign, batch_format="pyarrow")
    return partial_grouped_agg(
        pts, ["cell"],
        {"n_points": (None, "count"),
         "min_x": ("x", "min"), "max_x": ("x", "max"),
         "min_y": ("y", "min"), "max_y": ("y", "max")},
    )


G_BBOX_SQL = f"""
WITH pts AS ({_PART_PTS_SQL})
SELECT (x // {_BBOX_CELL}) * 16 + y // {_BBOX_CELL} AS cell,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
       CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
FROM pts GROUP BY 1
"""


_GRID_START_US = 1_704_067_200_000_000  # 2024-01-01T00:00Z
_GRID_END_US = 1_706_745_600_000_000    # 2024-02-01T00:00Z
_GRID_STEP_US = 21_600_000_000          # 6 h -> 124 slots


def q59_grid_resample_ffill(sf_dir: str):
    """Time-grid RESAMPLE + forward-fill (the gap-filling /
    downsampling step of feature pipelines): materialize a fixed 6-hour
    slot grid per user and attach each slot's most recent at-or-before
    event via the distributed as-of join — slots with no prior event
    fill -1.  The event side first collapses to one row per
    (user, ts) (max event_id) so as-of tie-break is well-defined on
    both sides; the grid is generated IN the map stage from the
    distinct-user stream (no driver-side cross join).  SQL twin:
    CROSS JOIN grid + DuckDB ASOF LEFT JOIN."""
    from .relational import distinct_on, partial_grouped_agg
    from .temporal import asof_join

    ev = _pq(sf_dir, "events", ["user_id", "ts", "event_id"]).map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"].combine_chunks(),
            "t_us": t["ts"].combine_chunks().cast(pa.int64()),
            "event_id": t["event_id"].combine_chunks(),
        }),
        batch_format="pyarrow",
    )
    # one row per (user, ts): deterministic as-of regardless of ties;
    # the event time is renamed to the grid's 'on' column (asof_join
    # requires a shared on-column name)
    ev1 = partial_grouped_agg(ev, ["user_id", "t_us"],
                              {"event_id": ("event_id", "max")}).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["user_id"], t["t_us"], t["event_id"]],
            names=["user_id", "slot_us", "event_id"]),
        batch_format="pyarrow",
    )

    slots = np.arange(_GRID_START_US, _GRID_END_US, _GRID_STEP_US,
                      dtype=np.int64)

    def expand(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"user_id": np.repeat(u, len(slots)),
             "slot_us": np.tile(slots, len(u))},
            schema=pa.schema([("user_id", pa.int64()),
                              ("slot_us", pa.int64())]),
        )

    grid = distinct_on(ev.select_columns(["user_id"]), "user_id").map_batches(
        expand, batch_format="pyarrow")

    out = asof_join(
        grid, ev1, by="user_id", on="slot_us",
        l_schema=pa.schema([("user_id", pa.int64()), ("slot_us", pa.int64())]),
        r_schema=pa.schema([("user_id", pa.int64()), ("slot_us", pa.int64()),
                            ("event_id", pa.int64())]),
        strict=False,
    )

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"].combine_chunks(),
            "slot_us": t["slot_us"].combine_chunks(),
            "last_event_id": pc.fill_null(t["event_id_r"], -1),
        })

    return out.map_batches(fill, batch_format="pyarrow")


Q59_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, max(event_id) AS event_id
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT u.user_id, s.slot_us
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT range AS slot_us
              FROM range({_GRID_START_US}, {_GRID_END_US},
                         {_GRID_STEP_US})) s)
SELECT g.user_id, g.slot_us,
       CAST(COALESCE(e.event_id, -1) AS BIGINT) AS last_event_id
FROM grid g ASOF LEFT JOIN e
  ON g.user_id = e.user_id AND g.slot_us >= e.t
"""


_CHUNK_TOKENS = 512


def t_seq_pack(sf_dir: str):
    """Sequence-packing MANIFEST: assign every document a training
    chunk id and byte offset by packing each source's docs, in doc_id
    order, into {chunk}-token sequences — chunk_id = tokens-before //
    cap, offset = tokens-before % cap (documents straddle chunk
    boundaries exactly as a contiguous token stream would).  One
    segmented cumsum per source (relational.partitioned_window), no
    text shuffle; the wide->long manifest is what a 100-TB pretokenize
    job writes next to its shards."""
    from .relational import partitioned_window
    from .text.analysis import analyze_documents
    from .text.dedup import _content_hash_col

    docs = _pq(sf_dir, "documents", ["doc_id", "text", "source"])
    feats = analyze_documents(docs, concurrency=2).select_columns(
        ["doc_id", "source", "n_tokens"])
    keyed = feats.map_batches(
        lambda t: _content_hash_col(t, "source"), batch_format="pyarrow")
    win = partitioned_window(
        keyed, "content_hash", [("doc_id", False)],
        {"cum_tokens": ("n_tokens", "cumsum")},
    )

    def manifest(t: pa.Table) -> pa.Table:
        cum = t["cum_tokens"].to_numpy(zero_copy_only=False)
        nt = t["n_tokens"].to_numpy(zero_copy_only=False)
        before = cum - nt
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
            "source": t["source"].combine_chunks(),
            "n_tokens": t["n_tokens"].combine_chunks().cast(pa.int64()),
            "chunk_id": pa.array(before // _CHUNK_TOKENS),
            "chunk_offset": pa.array(before % _CHUNK_TOKENS),
        })

    return win.map_batches(manifest, batch_format="pyarrow")


def _sql_ntile(r: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 1-based global rank r over n rows: the first
    n % k tiles hold ceil(n/k) rows, the rest floor(n/k) — vectorized
    and exactly DuckDB's distribution."""
    big, nbig, small = n // k + 1, n % k, n // k
    if small == 0:
        return r.astype(np.int64)
    return np.where(
        r <= nbig * big,
        (r - 1) // big + 1,
        nbig + (r - nbig * big - 1) // small + 1,
    ).astype(np.int64)


_DEBOUNCE_US = 86_400_000_000  # 24 h


def q63_event_debounce(sf_dir: str):
    """Streaming DEBOUNCE / throttle (the event-cleaning rule: keep an
    event only if the user's previous same-type event is more than 24 h
    older): one hash exchange on user_id, lag(ts) and lag(event_type)
    over (event_type, ts, event_id) order so same-type events are
    consecutive, keep = type-run start OR gap > threshold; per-user
    rollup of total vs kept.  One exchange, no per-type re-shuffle."""
    from .relational import partial_grouped_agg, partitioned_window

    ev = _pq(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"].combine_chunks(),
            "event_type": t["event_type"].combine_chunks(),
            "t_us": t["ts"].combine_chunks().cast(pa.int64()),
            "event_id": t["event_id"].combine_chunks(),
        })

    win = partitioned_window(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        [("event_type", False), ("t_us", False), ("event_id", False)],
        {"prev_t": ("t_us", "lag"), "prev_type": ("event_type", "lag")},
    )

    def keep_flags(t: pa.Table) -> pa.Table:
        new_run = pc.or_kleene(
            pc.is_null(t["prev_type"]),
            pc.not_equal(t["event_type"], t["prev_type"]),
        )
        gap_ok = pc.greater(
            pc.subtract(t["t_us"], pc.fill_null(t["prev_t"], 0)),
            pa.scalar(_DEBOUNCE_US),
        )
        kept = pc.cast(pc.or_kleene(new_run, gap_ok), pa.int64())
        return pa.table({
            "user_id": t["user_id"].combine_chunks(),
            "kept": kept,
        })

    return partial_grouped_agg(
        win.map_batches(keep_flags, batch_format="pyarrow"),
        ["user_id"],
        {"n_events": (None, "count"), "n_kept": ("kept", "sum")},
    )


Q63_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events),
w AS (
  SELECT user_id, event_type, t,
         lag(t) OVER (PARTITION BY user_id
                      ORDER BY event_type, t, event_id) AS pt,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY event_type, t, event_id) AS ptype
  FROM e)
SELECT user_id,
       count(*) AS n_events,
       CAST(count(*) FILTER (WHERE ptype IS NULL OR ptype <> event_type
                                OR t - pt > {_DEBOUNCE_US}) AS BIGINT) AS n_kept
FROM w GROUP BY 1
"""


_CONC_IV_US = 300_000_000  # each event holds a resource for 5 minutes
_DAY_US = 86_400_000_000


def q62_max_concurrency(sf_dir: str):
    """Sweep-line MAX CONCURRENCY per day (the peak-load / capacity
    metric): every event opens a half-open 5-minute interval; each
    interval emits a +1 at its start and a -1 at its (day-clipped) end,
    one hash exchange on the day co-locates the sweep, a segmented
    cumsum over (time, delta) order walks it (delta ascending puts -1
    first at ties — an interval ending exactly at t is no longer
    active when one starts at t), and a per-day max rollup finishes.
    Raw events ship exactly two slim delta rows each."""
    from .relational import partial_grouped_agg, partitioned_window

    ev = _pq(sf_dir, "events", ["ts"])

    def deltas(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        day = ts // _DAY_US
        end = np.minimum(ts + _CONC_IV_US, (day + 1) * _DAY_US)
        return pa.Table.from_pydict(
            {
                "day": np.concatenate([day, day]),
                "x": np.concatenate([ts, end]),
                "delta": np.concatenate([
                    np.ones(len(ts), dtype=np.int64),
                    -np.ones(len(ts), dtype=np.int64),
                ]),
            },
            schema=pa.schema([("day", pa.int64()), ("x", pa.int64()),
                              ("delta", pa.int64())]),
        )

    win = partitioned_window(
        ev.map_batches(deltas, batch_format="pyarrow"),
        "day",
        [("x", False), ("delta", False)],
        {"conc": ("delta", "cumsum")},
    )
    return partial_grouped_agg(
        win.select_columns(["day", "conc"]),
        ["day"],
        {"max_concurrent": ("conc", "max")},
    )


Q62_SQL = f"""
WITH iv AS (
  SELECT epoch_us(ts) AS t,
         epoch_us(ts) // {_DAY_US} AS day
  FROM events),
deltas AS (
  SELECT day, t AS x, 1 AS delta FROM iv
  UNION ALL
  SELECT day, least(t + {_CONC_IV_US}, (day + 1) * {_DAY_US}) AS x, -1 AS delta
  FROM iv),
w AS (
  SELECT day,
         sum(delta) OVER (PARTITION BY day ORDER BY x, delta
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas)
SELECT CAST(day AS BIGINT) AS day,
       CAST(max(conc) AS BIGINT) AS max_concurrent
FROM w GROUP BY 1
"""


_SEG_SUBGRID = 4096 * 256  # level-12 cells x 256 subcells


def g_seg_cells(sf_dir: str):
    """Vector-to-tile assignment by segment RASTERIZATION
    (spatial/cells.segment_cells_dda): each synthetic segment (endpoint
    A = image point k, endpoint B = image point k+7) is walked with 257
    exact integer-midpoint DDA samples over the level-12 grid, and the
    per-segment distinct-cell count plus cell-key range comes out of
    one row-wise sort — the which-tiles-does-this-way-touch step of a
    tile re-render scheduler.  No shuffle at all: a segment's samples
    never leave its batch.  The SQL twin replays the same integer
    interpolation via unnest(generate_series(...)) (the banked list
    form) + DISTINCT."""
    from .spatial.cells import segment_cells_dda

    def raster(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)

        def subcoords(kk):
            lon = (kk * 2654435761 % 8000000) / 1e6 - 2.0
            lat = (kk * 40503 % 8000000) / 1e6 - 2.0
            sx = np.floor((lon + 180.0) / 360.0 * _SEG_SUBGRID).astype(np.int64)
            sy = np.floor((lat + 90.0) / 180.0 * (_SEG_SUBGRID // 2)).astype(np.int64)
            return sx, sy

        sx0, sy0 = subcoords(k)
        sx1, sy1 = subcoords(k + 7)
        n_cells, min_cell, max_cell = segment_cells_dda(
            sx0, sy0, sx1, sy1, steps=256, sub=256, grid=4096
        )
        return pa.Table.from_pydict(
            {"seg_id": k, "n_cells": n_cells,
             "min_cell": min_cell, "max_cell": max_cell},
            schema=pa.schema([("seg_id", pa.int64()), ("n_cells", pa.int64()),
                              ("min_cell", pa.int64()), ("max_cell", pa.int64())]),
        )

    return _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        raster, batch_format="pyarrow")


G_SEG_CELLS_SQL = f"""
WITH seg AS (
  SELECT p_partkey AS seg_id,
         CAST(floor(((p_partkey * 2654435761 % 8000000) / 1e6 - 2 + 180)
                    / 360 * {_SEG_SUBGRID}) AS BIGINT) AS sx0,
         CAST(floor(((p_partkey * 40503 % 8000000) / 1e6 - 2 + 90)
                    / 180 * {_SEG_SUBGRID // 2}) AS BIGINT) AS sy0,
         CAST(floor((((p_partkey + 7) * 2654435761 % 8000000) / 1e6 - 2 + 180)
                    / 360 * {_SEG_SUBGRID}) AS BIGINT) AS sx1,
         CAST(floor((((p_partkey + 7) * 40503 % 8000000) / 1e6 - 2 + 90)
                    / 180 * {_SEG_SUBGRID // 2}) AS BIGINT) AS sy1
  FROM part),
samp AS (
  SELECT seg_id,
         (sx0 * (256 - t) + sx1 * t) // 256 AS px,
         (sy0 * (256 - t) + sy1 * t) // 256 AS py
  FROM seg CROSS JOIN (SELECT unnest(generate_series(0, 256)) AS t)),
cells AS (SELECT DISTINCT seg_id, (px // 256) * 4096 + (py // 256) AS cell
          FROM samp)
SELECT seg_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(min(cell) AS BIGINT) AS min_cell,
       CAST(max(cell) AS BIGINT) AS max_cell
FROM cells GROUP BY 1
"""


def q61_user_drawdown(sf_dir: str):
    """Per-user running-peak DRAWDOWN (the time-series risk metric:
    high-water-mark minus current value, maximized over the history):
    one hash exchange on user_id, a segmented vectorized cummax over
    (ts, event_id) order (the new partitioned_window "cummax" kind),
    then a combiner-pushdown per-user rollup of max(hwm - value) and
    the peak itself.  Integer cents end to end."""
    from .relational import partial_grouped_agg, partitioned_window

    ev = _pq(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"].combine_chunks(),
            "event_id": t["event_id"].combine_chunks(),
            "t_us": t["ts"].combine_chunks().cast(pa.int64()),
            "vc": pc.cast(pc.round(pc.multiply(t["value"], pa.scalar(100.0))),
                          pa.int64()),
        })

    win = partitioned_window(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id",
        [("t_us", False), ("event_id", False)],
        {"hwm": ("vc", "cummax")},
    )

    def drawdown(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"].combine_chunks(),
            "dd": pc.subtract(t["hwm"], t["vc"]),
            "hwm": t["hwm"].combine_chunks(),
        })

    return partial_grouped_agg(
        win.map_batches(drawdown, batch_format="pyarrow"),
        ["user_id"],
        {"max_drawdown_cents": ("dd", "max"), "peak_cents": ("hwm", "max")},
    )


Q61_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
w AS (
  SELECT user_id, vc,
         max(vc) OVER (PARTITION BY user_id ORDER BY t, event_id
                       ROWS UNBOUNDED PRECEDING) AS hwm
  FROM e)
SELECT user_id,
       CAST(max(hwm - vc) AS BIGINT) AS max_drawdown_cents,
       CAST(max(hwm) AS BIGINT) AS peak_cents
FROM w GROUP BY 1
"""


_HILBERT_LEVEL = 12


def g_hilbert_keys(sf_dir: str):
    """Hilbert-curve layout keys for every image point
    (spatial/cells.hilbert_key, level 12 / 4096-grid): the
    space-filling sort key with strictly better locality than Z-order
    — consecutive keys are ALWAYS grid-adjacent, so a range scan of a
    Hilbert-clustered shard never takes Morton jumps.  Pure integer
    bit-walk; the oracle unrolls the same 12 flip-rotate steps as
    MATERIALIZED CTEs (plain CTEs inline the step chain into an
    exponential expression tree — the banked kcore lesson)."""
    from .spatial.cells import hilbert_key

    def encode(t: pa.Table) -> pa.Table:
        hk = hilbert_key(
            t["lon"].to_numpy(zero_copy_only=False),
            t["lat"].to_numpy(zero_copy_only=False),
            _HILBERT_LEVEL,
        )
        return pa.Table.from_pydict(
            {"image_id": t["image_id"], "hkey": pa.array(hk)},
            schema=pa.schema([("image_id", pa.int64()), ("hkey", pa.int64())]),
        )

    return part_images(sf_dir).map_batches(encode, batch_format="pyarrow")


def _hilbert_sql(level: int) -> str:
    g = 1 << level
    parts = [f"""
h0 AS MATERIALIZED (
  SELECT image_id,
         CAST(floor((lon + 180) / 360 * {g}) AS BIGINT) AS x,
         CAST(floor((lat + 90) / 180 * {g}) AS BIGINT) AS y,
         CAST(0 AS BIGINT) AS d
  FROM img)"""]
    for i, shift in enumerate(range(level - 1, -1, -1), start=1):
        s = 1 << shift
        parts.append(f"""
h{i} AS MATERIALIZED (
  SELECT image_id, nx AS x, ny AS y, nd AS d FROM (
    SELECT image_id,
           d + {s * s} * (CASE WHEN x // {s} % 2 = 0 AND y // {s} % 2 = 0 THEN 0
                               WHEN x // {s} % 2 = 0 THEN 1
                               WHEN y // {s} % 2 = 0 THEN 3
                               ELSE 2 END) AS nd,
           CASE WHEN y // {s} % 2 = 1 THEN x
                WHEN x // {s} % 2 = 1 THEN {g} - 1 - y
                ELSE y END AS nx,
           CASE WHEN y // {s} % 2 = 1 THEN y
                WHEN x // {s} % 2 = 1 THEN {g} - 1 - x
                ELSE x END AS ny
    FROM h{i - 1}))""")
    return ",".join(parts) + f"\nSELECT image_id, d AS hkey FROM h{level}"


G_HILBERT_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
{_hilbert_sql(_HILBERT_LEVEL)}
"""


def q60_decile_lift(sf_dir: str):
    """Global NTILE(10) lift table over customer revenue WITHOUT a
    global sort: the combiner-pushdown revenue rollup feeds (1) a
    value histogram reduced to one broadcast cdf (global count-below
    per distinct revenue — the t_token_percentile trick; the broadcast
    is #distinct-values-sized, not #rows-sized) and (2) one
    partitioned_window row_number over each revenue TIE GROUP (custkey
    ascending) — global_rank = cdf_below + tie_rank exactly, then the
    SQL NTILE distribution formula (first n%10 tiles take the extra
    row) assigns deciles and a rollup emits per-decile customer count
    and revenue.  Deterministic: (cents, custkey) is a total order."""
    import ray as _ray

    from .relational import partial_grouped_agg, partitioned_window

    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0))),
                        pa.int64())
        return pa.table({"o_custkey": t["o_custkey"].combine_chunks(),
                         "cents": cents})

    rev = partial_grouped_agg(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"], {"cents": ("cents", "sum")},
    ).materialize()

    hist = partial_grouped_agg(
        rev.select_columns(["cents"]), ["cents"], {"c": (None, "count")}
    ).to_pandas().sort_values("cents")
    vals = hist["cents"].to_numpy()
    below = np.concatenate([[0], hist["c"].to_numpy().cumsum()])
    n_total = int(below[-1])
    cdf_ref = _ray.put((vals, below))

    ranked = partitioned_window(
        rev, "cents", [("o_custkey", False)],
        {"tie_rank": (None, "row_number")},
    )

    def decile_of(t: pa.Table) -> pa.Table:
        v, b = _ray.get(cdf_ref)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        tie = t["tie_rank"].to_numpy(zero_copy_only=False)
        r = b[np.searchsorted(v, cents)] + tie  # 1-based global rank
        return pa.table({
            "decile": pa.array(_sql_ntile(r, n_total, 10)),
            "cents": t["cents"].combine_chunks().cast(pa.int64()),
        })

    return partial_grouped_agg(
        ranked.map_batches(decile_of, batch_format="pyarrow"),
        ["decile"],
        {"n_customers": (None, "count"), "sum_cents": ("cents", "sum")},
    )


Q60_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1),
t AS (SELECT cents, ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
      FROM rev)
SELECT CAST(decile AS BIGINT) AS decile,
       count(*) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY 1
"""


def e_rp_bits(sf_dir: str):
    """Cosine-LSH bit signatures for every embedding
    (vectors.rp_lsh_signatures): 16 pseudo-random ±1 hyperplanes from
    splitmix64 parity, dotted against the int8 quantization codes —
    all-integer arithmetic, so the DuckDB twin replays the exact bits
    (codes CTE = the already-oracled e_quantize_codes expression; the
    hyperplane signs come from the HUGEINT splitmix chain)."""
    from .vectors import rp_lsh_signatures

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return rp_lsh_signatures(emb, "vec_id", "embedding", num_bits=16)


E_RP_BITS_SQL = f"""
WITH flat AS (
  SELECT vec_id,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(val AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT dim, max(abs(x)) AS amax FROM flat GROUP BY 1),
codes AS (
  SELECT f.vec_id, f.dim,
         CAST(greatest(-127, least(127,
              floor((f.x * 127) / (CASE WHEN s.amax = 0 THEN 1.0 ELSE s.amax END))))
              AS BIGINT) AS code
  FROM flat f JOIN s USING (dim)),
jd AS (SELECT r.range AS j, d.dim
       FROM range(0, 16) r CROSS JOIN (SELECT DISTINCT dim FROM codes) d),
{_splitmix_over("j * 1024 + dim", "jd")},
signs AS (SELECT k // 1024 AS j, k % 1024 AS dim,
                 CASE WHEN h64 % 2 = 0 THEN 1 ELSE -1 END AS sgn
          FROM smfin),
dots AS (SELECT c.vec_id, g.j, sum(c.code * g.sgn) AS dot
         FROM codes c JOIN signs g USING (dim) GROUP BY 1, 2)
SELECT vec_id,
       CAST(sum(CASE WHEN dot >= 0
                     THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
                     ELSE 0 END) AS BIGINT) AS sig
FROM dots GROUP BY 1
"""


# size ladder cycled per 250-image partition; standard aspect buckets
# (bucket 4 = 9:16 is deliberately unmatched by any ladder size — the
# assignment must PICK, not pattern-match)
_ASPECT_LADDER = [(24, 16), (16, 24), (20, 20), (32, 12)]
_ASPECT_BUCKETS = [(1, 1), (4, 3), (3, 4), (16, 9), (9, 16)]
# lcm of bucket-ratio denominators: scaling |w*bh - bw*h| / bh by
# 144/bh makes the nearest-ratio comparison pure int64
_ASPECT_SCALE = [144 // bh for _, bh in _ASPECT_BUCKETS]


def m_aspect_bucket(sf_dir: str):
    """Aspect-ratio BUCKETING manifest — the batching prerequisite of
    any variable-resolution image trainer (SDXL-style buckets): each
    image goes to the fixed bucket whose w:h ratio is nearest its own,
    ties to the smaller bucket id, compared in EXACT integer
    arithmetic (|w*bh - bw*h| scaled by lcm/bh — no float ratios, so
    no tie ambiguity).  Input is the variable-size synthetic corpus
    (size ladder cycled per partition); one shuffle-free map + one
    combiner-pushdown rollup.  The oracle never reads the table: it
    recomputes each partition's (w, h) from the image index — a
    cross-representation gate that the Ray path synthesized and
    bucketed exactly what the generator encodes."""
    from .images.synth import synth_image_table
    from .relational import partial_grouped_agg

    ds = synth_image_table(2000, partition_rows=250, size_ladder=_ASPECT_LADDER)
    bw = np.array([b[0] for b in _ASPECT_BUCKETS], dtype=np.int64)
    bh = np.array([b[1] for b in _ASPECT_BUCKETS], dtype=np.int64)
    sc = np.array(_ASPECT_SCALE, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4), pa.int64())
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.abs(w[:, None] * bh[None, :] - bw[None, :] * h[:, None]) * sc
        # np.argmin returns the FIRST minimum -> smallest bucket id on ties
        bid = np.argmin(score, axis=1).astype(np.int64)
        return pa.table({"bucket_id": pa.array(bid), "image_idx": idx})

    return partial_grouped_agg(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["bucket_id"],
        {"n_images": (None, "count"), "sum_idx": ("image_idx", "sum")},
    )


M_ASPECT_BUCKET_SQL = """
WITH imgsz AS (
  SELECT range AS i,
         CASE (range // 250) % 4 WHEN 0 THEN 24 WHEN 1 THEN 16
                                 WHEN 2 THEN 20 ELSE 32 END AS w,
         CASE (range // 250) % 4 WHEN 0 THEN 16 WHEN 1 THEN 24
                                 WHEN 2 THEN 20 ELSE 12 END AS h
  FROM range(0, 2000)),
scored AS (
  SELECT i, b.bid,
         row_number() OVER (
           PARTITION BY i
           ORDER BY abs(w * b.bh - b.bw * h) * b.sc, b.bid) AS rn
  FROM imgsz CROSS JOIN (VALUES (0, 1, 1, 144), (1, 4, 3, 48),
                                (2, 3, 4, 36), (3, 16, 9, 16),
                                (4, 9, 16, 9)) b(bid, bw, bh, sc))
SELECT CAST(bid AS BIGINT) AS bucket_id,
       count(*) AS n_images,
       CAST(sum(i) AS BIGINT) AS sum_idx
FROM scored WHERE rn = 1 GROUP BY 1
"""


def e_pq_codes(sf_dir: str):
    """Product-quantization code assignment (vectors.pq_assign): 8
    subspaces x 16 centroids over the int8 quantization codes, exact
    integer squared-distance argmin (ties to the smaller centroid id),
    deterministic sample codebook (the 16 smallest-id vectors) so the
    DuckDB twin recomputes the whole index-build — codes CTE + codebook
    join + ranked distances."""
    from .vectors import pq_assign

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pq_assign(emb, "vec_id", "embedding",
                     num_subspaces=8, num_centroids=16)


E_PQ_SQL = """
WITH flat AS (
  SELECT vec_id,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(val AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT dim, max(abs(x)) AS amax FROM flat GROUP BY 1),
codes AS (
  SELECT f.vec_id, f.dim,
         CAST(greatest(-127, least(127,
              floor((f.x * 127) / (CASE WHEN s.amax = 0 THEN 1.0 ELSE s.amax END))))
              AS BIGINT) AS code
  FROM flat f JOIN s USING (dim)),
cb_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT DISTINCT vec_id FROM codes ORDER BY vec_id LIMIT 16)),
cb AS (SELECT i.cid, c.dim, c.code AS cbcode
       FROM cb_ids i JOIN codes c USING (vec_id)),
dist AS (
  SELECT c.vec_id, c.dim // 8 AS subspace, b.cid,
         sum((c.code - b.cbcode) * (c.code - b.cbcode)) AS d2
  FROM codes c JOIN cb b ON b.dim = c.dim
  GROUP BY 1, 2, 3),
ranked AS (
  SELECT vec_id, subspace, cid,
         row_number() OVER (PARTITION BY vec_id, subspace
                            ORDER BY d2, cid) AS rn
  FROM dist)
SELECT vec_id,
       CAST(subspace AS BIGINT) AS subspace,
       CAST(cid AS BIGINT) AS code_id
FROM ranked WHERE rn = 1
"""


def t_containment_pairs(sf_dir: str):
    """Exact n-gram CONTAINMENT near-dup pairs
    (text/dedup.containment_pairs): fires when the smaller gram set is
    >= 90% inside the larger — the subset-duplication (quoting /
    embedding) case Jaccard misses.  Candidates from the shared
    gram-inverted index (complete), pair-routed exact verify, integer
    rational gate (inter_sz, min_sz) — no float comparisons anywhere."""
    from .text.dedup import containment_pairs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return containment_pairs(docs, threshold_num=9, threshold_den=10)


T_CONTAIN_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents WHERE trim(text) <> ''
),
toks AS (
  SELECT doc_id, lower(ws[i]) AS w, i
  FROM words, UNNEST(generate_series(1, len(ws))) AS u(i)
),
nw AS (SELECT doc_id, len(ws) AS n FROM words),
tri AS (
  SELECT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
short AS (
  SELECT t.doc_id, string_agg(t.w, ' ' ORDER BY t.i) AS g
  FROM toks t JOIN nw ON nw.doc_id = t.doc_id
  WHERE nw.n < 3
  GROUP BY t.doc_id
),
grams AS (
  SELECT DISTINCT doc_id, g FROM tri
  UNION
  SELECT DISTINCT doc_id, g FROM short
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT g1.doc_id AS a_id, g2.doc_id AS b_id, count(*) AS i
  FROM grams g1 JOIN grams g2 ON g1.g = g2.g AND g1.doc_id < g2.doc_id
  GROUP BY g1.doc_id, g2.doc_id
)
SELECT a_id, b_id,
       CAST(i AS BIGINT) AS inter_sz,
       CAST(least(sa.sz, sb.sz) AS BIGINT) AS min_sz
FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
WHERE i * 10 >= 9 * least(sa.sz, sb.sz)
"""


_WINNOW_W = 4


def t_winnow_fps(sf_dir: str):
    """Winnowing fingerprint sets (MOSS local similarity,
    text/analysis.winnowing_fingerprints): distinct window-minima of
    word-trigram FNV hashes — any shared run of window+gram-1 words
    between two documents is GUARANTEED to produce a shared
    fingerprint, the property the single global-min fingerprint lacks.
    Batch-local and shuffle-free; the gate pins the per-doc distinct
    set via count, min and order-free xor against the recursive-FNV
    SQL twin."""
    from .text.analysis import winnowing_fingerprints

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    return winnowing_fingerprints(docs, gram=3, window=_WINNOW_W)


T_WINNOW_SQL = rf"""
WITH RECURSIVE words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
  FROM documents
),
tri AS (
  SELECT w.doc_id, i, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM words w, UNNEST(generate_series(1, len(ws) - 2)) AS u(i)
  WHERE len(ws) >= 3
),
short AS (
  SELECT doc_id, array_to_string(ws, ' ') AS g FROM words WHERE len(ws) < 3
),
gs AS (
  SELECT DISTINCT g FROM (SELECT g FROM tri UNION ALL SELECT g FROM short)
),
fnv AS (
  SELECT g, 1 AS pos, CAST(14695981039346656037 AS HUGEINT) AS h FROM gs
  UNION ALL
  SELECT g, pos + 1,
         (xor(h, CAST(ord(substr(g, pos, 1)) AS HUGEINT)) * 1099511628211)
           % 18446744073709551616
  FROM fnv WHERE pos <= length(g)
),
gh AS (
  SELECT g, CAST(h % 9223372036854775808 AS BIGINT) AS h63
  FROM fnv WHERE pos = length(g) + 1
),
hpos AS (SELECT t.doc_id, t.i, gh.h63 FROM tri t JOIN gh USING (g)),
wm AS (
  SELECT doc_id, i,
         min(h63) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN {_WINNOW_W - 1} PRECEDING
                        AND CURRENT ROW) AS m,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM hpos),
fps AS (
  SELECT DISTINCT doc_id, m FROM wm
  WHERE ng >= {_WINNOW_W} AND i >= {_WINNOW_W}
  UNION
  SELECT doc_id, min(h63) AS m FROM hpos
  GROUP BY doc_id HAVING count(*) < {_WINNOW_W}
  UNION
  SELECT s.doc_id, gh.h63 AS m FROM short s JOIN gh USING (g))
SELECT doc_id,
       count(*) AS n_fps,
       CAST(min(m) AS BIGINT) AS min_fp,
       CAST(bit_xor(m) AS BIGINT) AS xor_fp
FROM fps GROUP BY 1
"""


_TRAIN_BATCH = 32


def m_train_manifest(sf_dir: str):
    """Training-BATCH manifest over the aspect-bucketed corpus (the
    loader-side artifact an SDXL-style trainer consumes): within each
    aspect bucket, images in id order pack into fixed-size batches of
    {batch} — one partitioned_window row_number per bucket, batch_id =
    (rn-1)//{batch}, then a per-(bucket, batch) rollup of count and id
    range.  Composes the oracled bucket assignment with the oracled
    window machinery; the SQL twin is the bucket CTE + row_number."""
    from .images.synth import synth_image_table
    from .relational import partial_grouped_agg, partitioned_window

    ds = synth_image_table(2000, partition_rows=250, size_ladder=_ASPECT_LADDER)
    bw = np.array([b[0] for b in _ASPECT_BUCKETS], dtype=np.int64)
    bh = np.array([b[1] for b in _ASPECT_BUCKETS], dtype=np.int64)
    sc = np.array(_ASPECT_SCALE, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4), pa.int64())
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = np.abs(w[:, None] * bh[None, :] - bw[None, :] * h[:, None]) * sc
        bid = np.argmin(score, axis=1).astype(np.int64)
        return pa.table({"bucket_id": pa.array(bid), "image_idx": idx})

    win = partitioned_window(
        ds.map_batches(assign, batch_format="pyarrow"),
        "bucket_id",
        [("image_idx", False)],
        {"rn": (None, "row_number")},
    )

    def to_batches(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket_id": t["bucket_id"].combine_chunks(),
            "batch_id": pa.array((rn - 1) // _TRAIN_BATCH),
            "image_idx": t["image_idx"].combine_chunks(),
        })

    return partial_grouped_agg(
        win.map_batches(to_batches, batch_format="pyarrow"),
        ["bucket_id", "batch_id"],
        {"n_images": (None, "count"),
         "min_idx": ("image_idx", "min"),
         "max_idx": ("image_idx", "max")},
    )


M_TRAIN_MANIFEST_SQL = f"""
WITH imgsz AS (
  SELECT range AS i,
         CASE (range // 250) % 4 WHEN 0 THEN 24 WHEN 1 THEN 16
                                 WHEN 2 THEN 20 ELSE 32 END AS w,
         CASE (range // 250) % 4 WHEN 0 THEN 16 WHEN 1 THEN 24
                                 WHEN 2 THEN 20 ELSE 12 END AS h
  FROM range(0, 2000)),
scored AS (
  SELECT i, b.bid,
         row_number() OVER (
           PARTITION BY i
           ORDER BY abs(w * b.bh - b.bw * h) * b.sc, b.bid) AS rn
  FROM imgsz CROSS JOIN (VALUES (0, 1, 1, 144), (1, 4, 3, 48),
                                (2, 3, 4, 36), (3, 16, 9, 16),
                                (4, 9, 16, 9)) b(bid, bw, bh, sc)),
bucketed AS (SELECT i, bid FROM scored WHERE rn = 1),
packed AS (
  SELECT bid, i,
         (row_number() OVER (PARTITION BY bid ORDER BY i) - 1)
           // {_TRAIN_BATCH} AS batch_id
  FROM bucketed)
SELECT CAST(bid AS BIGINT) AS bucket_id,
       CAST(batch_id AS BIGINT) AS batch_id,
       count(*) AS n_images,
       CAST(min(i) AS BIGINT) AS min_idx,
       CAST(max(i) AS BIGINT) AS max_idx
FROM packed GROUP BY 1, 2
"""


_DBSCAN_G = 1 << 14


def g_grid_cluster(sf_dir: str):
    """Grid-density spatial clustering (DBSCAN with eps = one cell,
    min_pts = 1): snap the image points to a 16384^2 grid, cluster the
    OCCUPIED cells by 8-neighbor adjacency with the distributed
    connected-components engine, report per-cluster cell and point
    counts (spatial/cluster.grid_density_clusters).  The point table
    never shuffles — only the bounded occupied-cell set does.  SQL
    twin: the same neighbor equi-join (8 direction offsets) plus the
    recursive-CTE min-label propagation used by t_dup_clusters."""
    from .spatial.cluster import grid_density_clusters

    return grid_density_clusters(
        part_images(sf_dir).select_columns(["lon", "lat"]), level=14
    )


# shared grid-cc oracle plumbing: point cells -> occupied counts ->
# 8-neighbor equi-join edges -> recursive min-label propagation
_GRID_CC_CTES = f"""
pts AS (
  SELECT image_id,
         CAST(floor((lon + 180) / 360 * {_DBSCAN_G}) AS BIGINT) * {_DBSCAN_G}
       + CAST(floor((lat + 90) / 180 * {_DBSCAN_G}) AS BIGINT) AS cell
  FROM img),
cells AS (SELECT cell, count(*) AS n_points FROM pts GROUP BY 1),
und AS (
  SELECT a.cell AS u, b.cell AS v
  FROM cells a
  CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1))
       d(dx, dy)
  JOIN cells b
    ON b.cell = (a.cell // {_DBSCAN_G} + d.dx) * {_DBSCAN_G}
              + (a.cell % {_DBSCAN_G} + d.dy)
  WHERE a.cell // {_DBSCAN_G} + d.dx BETWEEN 0 AND {_DBSCAN_G - 1}
    AND a.cell % {_DBSCAN_G} + d.dy BETWEEN 0 AND {_DBSCAN_G - 1}),
reach(u, lbl) AS (
  SELECT cell, cell FROM cells
  UNION
  SELECT und.u, reach.lbl FROM und JOIN reach ON und.v = reach.u),
labels AS (SELECT u AS cell, min(lbl) AS cluster_id FROM reach GROUP BY 1)
"""

G_GRID_CLUSTER_SQL = f"""
WITH RECURSIVE img AS ({_PART_IMG_SQL}),
{_GRID_CC_CTES}
SELECT l.cluster_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(c.n_points) AS BIGINT) AS n_points
FROM labels l JOIN cells c USING (cell)
GROUP BY 1
"""


def g_spatial_dedup(sf_dir: str):
    """Composed GEO-DEDUP curation pass (spatial/cluster.spatial_dedup)
    — collapse bursts of near-identical capture locations to one
    representative image: grid-cell cluster labels + one hash join
    routing each image id to its cluster + per-cluster (min id, count)
    rollup.  Image payloads never shuffle — only slim (id, cell) rows
    ride the join.  SQL twin: the grid-cc recursive CTE joined back to
    the per-point cell table."""
    from .spatial.cluster import spatial_dedup

    return spatial_dedup(
        part_images(sf_dir).select_columns(["image_id", "lon", "lat"]),
        id_col="image_id", level=14,
    )


G_SPATIAL_DEDUP_SQL = f"""
WITH RECURSIVE img AS ({_PART_IMG_SQL}),
{_GRID_CC_CTES}
SELECT l.cluster_id,
       CAST(min(p.image_id) AS BIGINT) AS keeper_id,
       count(*) AS n_images
FROM pts p JOIN labels l USING (cell)
GROUP BY 1
"""


T_SEQ_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents),
w AS (
  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
                                           ORDER BY doc_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS BIGINT)
           AS before
  FROM t)
SELECT doc_id, source, n_tokens,
       before // {_CHUNK_TOKENS} AS chunk_id,
       before % {_CHUNK_TOKENS} AS chunk_offset
FROM w
"""


_SESS_GAP_US = 1_800_000_000  # 30-min inactivity gap == session hold time
_SESS_BAND_US = 3_600_000_000  # 1-h ownership bands for the overlap join


def q64_session_overlap_pairs(sf_dir: str):
    """INTERVAL x INTERVAL overlap self-join (the who-was-online-
    together shape): sessionize the event log per user (30-min
    inactivity gap, half-open [first_ts, last_ts + 30 min) hold), band
    the time axis into 1-h buckets, replicate each session onto every
    band it touches, and enumerate overlapping cross-user session
    pairs inside ONE band only — the band containing
    max(start_a, start_b) — so every pair is counted exactly once with
    no distinct exchange.  Per-band work is a start-sorted sweep:
    searchsorted upper bounds + one vectorized triangular expansion
    (no per-pair Python).  Band width is the density/skew knob — at
    10^12-event scale shrink it until per-band session counts bound
    worker heaps.  Three hash exchanges total (user_id -> band ->
    u_lo), raw events never ride the pair stream."""
    from .relational import hash_exchange_map

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id"])

    def sessions(df):
        import pandas as pd

        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        t = df["ts"].astype("datetime64[us]").astype("int64")
        new = df["user_id"].ne(df["user_id"].shift()) | (
            t - t.shift() > _SESS_GAP_US
        )
        grp = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy().astype("int64"),
                "sid": new.cumsum().to_numpy(),
                "t": t.to_numpy(),
            }
        )
        iv = grp.groupby(["user_id", "sid"], sort=False)["t"].agg(["min", "max"])
        iv = iv.reset_index()
        return pd.DataFrame(
            {
                "user_id": iv["user_id"],
                "s": iv["min"],
                "e": iv["max"] + _SESS_GAP_US,
            }
        )

    sess = hash_exchange_map(ds, "user_id", 16, sessions, fn_format="pandas")

    band_schema = pa.schema(
        [("band", pa.int64()), ("u", pa.int64()), ("s", pa.int64()),
         ("e", pa.int64())]
    )

    def bands(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        e = t["e"].to_numpy(zero_copy_only=False)
        u = t["u" if "u" in t.column_names else "user_id"].to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        b0 = s // _SESS_BAND_US
        reps = ((e - 1) // _SESS_BAND_US - b0 + 1).astype(np.int64)
        tot = int(reps.sum())
        step = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        return pa.Table.from_pydict(
            {
                "band": np.repeat(b0, reps) + step,
                "u": np.repeat(u, reps),
                "s": np.repeat(s, reps),
                "e": np.repeat(e, reps),
            },
            schema=band_schema,
        )

    banded = sess.map_batches(bands, batch_format="pyarrow")

    pair_schema = pa.schema(
        [("u_lo", pa.int64()), ("u_hi", pa.int64()), ("cnt", pa.int64())]
    )

    def pair_bands(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        e = t["e"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy(zero_copy_only=False)
        order = np.lexsort((u, s, band))
        band, s, e, u = band[order], s[order], e[order], u[order]
        cut = np.flatnonzero(np.r_[True, band[1:] != band[:-1], True])
        lo_parts, hi_parts = [], []
        for k in range(len(cut) - 1):
            a, b = int(cut[k]), int(cut[k + 1])
            ss, ee, uu = s[a:b], e[a:b], u[a:b]
            m = b - a
            # j > i overlap i  <=>  s_j < e_i  (s sorted, e_j > s_j >= s_i)
            hi = np.searchsorted(ss, ee, side="left")
            # ownership: count the pair only where max(s_i, s_j) = s_j
            # falls in THIS band -> j restricted to the in-band suffix
            jstart = int(np.searchsorted(ss, band[a] * _SESS_BAND_US,
                                         side="left"))
            start = np.maximum(np.arange(m) + 1, jstart)
            cnt = np.maximum(hi - start, 0)
            tot = int(cnt.sum())
            if tot == 0:
                continue
            ii = np.repeat(np.arange(m), cnt)
            jj = np.repeat(start, cnt) + (
                np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            )
            ua, ub = uu[ii], uu[jj]
            keep = ua != ub
            ua, ub = ua[keep], ub[keep]
            lo_parts.append(np.minimum(ua, ub))
            hi_parts.append(np.maximum(ua, ub))
        if not lo_parts:
            return pa.Table.from_pydict(
                {"u_lo": np.empty(0, np.int64), "u_hi": np.empty(0, np.int64),
                 "cnt": np.empty(0, np.int64)},
                schema=pair_schema,
            )
        lo = np.concatenate(lo_parts)
        hic = np.concatenate(hi_parts)
        # partition-local pre-count: user ids are < 2^31, pack the pair
        packed = (lo << np.int64(32)) | hic
        uniq, counts = np.unique(packed, return_counts=True)
        return pa.Table.from_pydict(
            {
                "u_lo": (uniq >> np.int64(32)),
                "u_hi": uniq & np.int64(0xFFFFFFFF),
                "cnt": counts.astype(np.int64),
            },
            schema=pair_schema,
        )

    pairs = hash_exchange_map(banded, "band", 16, pair_bands)

    def pair_count(df):
        g = df.groupby(["u_lo", "u_hi"], sort=False)["cnt"].sum()
        out = g.reset_index()
        out.columns = ["u_lo", "u_hi", "n_overlaps"]
        return out

    return hash_exchange_map(pairs, "u_lo", 16, pair_count, fn_format="pandas")


Q64_SQL = f"""
WITH g AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESS_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, t,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
), iv AS (
  SELECT user_id, sid, min(t) AS st, max(t) + {_SESS_GAP_US} AS en
  FROM s GROUP BY 1, 2
)
SELECT CAST(a.user_id AS BIGINT) AS u_lo,
       CAST(b.user_id AS BIGINT) AS u_hi,
       CAST(count(*) AS BIGINT) AS n_overlaps
FROM iv a JOIN iv b
  ON a.user_id < b.user_id AND a.st < b.en AND b.st < a.en
GROUP BY 1, 2
"""


_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]


def q65_column_profile(sf_dir: str):
    """One-pass COLUMN PROFILER (the Deequ / Great-Expectations
    data-quality shape): a fixed column set is melted to slim
    (col, val) string rows with batch-local pre-counting (np.unique
    per column per batch — the exchange carries distinct values, not
    rows), exact per-column distinct counts come from ONE value-hash
    exchange (same-value rows co-locate regardless of source column),
    and a combiner-pushdown rollup finishes with n_rows / n_distinct /
    min / max per column.  Values are profiled in canonical string
    form (CAST AS VARCHAR on the oracle side) so heterogeneous column
    types share one slim exchange — the scale path for a 10^2-column
    profile over 10^12 rows."""
    from .relational import hash_exchange_map, partial_grouped_agg

    ords = _pq(sf_dir, "orders", _PROFILE_COLS)

    def melt_counts(t: pa.Table) -> pa.Table:
        import pandas as pd

        frames = []
        for c in _PROFILE_COLS:
            v = pc.cast(t[c], pa.string())
            vals, counts = np.unique(
                v.to_numpy(zero_copy_only=False), return_counts=True
            )
            frames.append(
                pd.DataFrame(
                    {"col": c, "val": vals, "cnt": counts.astype("int64")}
                )
            )
        return pa.Table.from_pandas(
            pd.concat(frames, ignore_index=True), preserve_index=False
        )

    pre = ords.map_batches(melt_counts, batch_format="pyarrow")

    def profile_part(df):
        import pandas as pd

        g = df.groupby(["col", "val"], sort=False)["cnt"].sum().reset_index()
        gg = g.groupby("col", sort=False)
        return pd.DataFrame(
            {
                "n_rows": gg["cnt"].sum(),
                "n_distinct": gg.size(),
                "val_min": gg["val"].min(),
                "val_max": gg["val"].max(),
            }
        ).reset_index()

    parts = hash_exchange_map(pre, "val", 16, profile_part, fn_format="pandas")
    return partial_grouped_agg(
        parts,
        ["col"],
        {
            "n_rows": ("n_rows", "sum"),
            "n_distinct": ("n_distinct", "sum"),
            "val_min": ("val_min", "min"),
            "val_max": ("val_max", "max"),
        },
    )


Q65_SQL = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n_rows,"
    f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
    f" min(CAST({c} AS VARCHAR)) AS val_min,"
    f" max(CAST({c} AS VARCHAR)) AS val_max FROM orders"
    for c in _PROFILE_COLS
)


def q66_benford_audit(sf_dir: str):
    """BENFORD first-significant-digit audit (the fraud / synthetic-
    data smoke test a data-quality pass runs over every money column):
    integer cents (half-away rounding, the house float->int
    convention), first digit via the decimal string — no float log10,
    whose boundary error at exact powers of ten would misbin — then a
    combiner-pushdown (status, digit) count.  Fully batch-local until
    the tiny rollup."""
    from .relational import partial_grouped_agg

    ords = _pq(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def digits(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(p) * np.floor(np.abs(p) * 100 + 0.5)).astype(np.int64)
        d = pc.utf8_slice_codeunits(
            pc.cast(pa.array(cents), pa.string()), 0, 1
        )
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"].combine_chunks(),
                "digit": pc.cast(d, pa.int64()),
            }
        )

    return partial_grouped_agg(
        ords.map_batches(digits, batch_format="pyarrow"),
        ["o_orderstatus", "digit"],
        {"n_orders": (None, "count")},
    )


Q66_SQL = """
SELECT o_orderstatus,
       CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                   1, 1) AS BIGINT) AS digit,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY 1, 2
"""


def q67_winsorized_totals(sf_dir: str):
    """WINSORIZATION (robust-preprocessing transform, not just outlier
    DETECTION like q54's IQR fences): per-priority P5/P95 bounds come
    off the distributed exact histogram quantiles
    (relational.grouped_quantiles), the
    5-row bounds table is broadcast into the clip stage (never a
    shuffle join), and a combiner-pushdown rollup reports the clipped
    integer-cents sum plus how many rows each tail clipped.  Bounds
    are DISCRETE order statistics (quantile_disc parity), so the whole
    pipeline stays integer — no float accumulation or rounding
    boundary anywhere."""
    from .relational import grouped_quantiles, partial_grouped_agg

    ords = _pq(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    cents_schema = pa.schema(
        [("o_orderpriority", pa.string()), ("cents", pa.int64())]
    )

    def to_cents(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(p) * np.floor(np.abs(p) * 100 + 0.5)).astype(np.int64)
        return pa.Table.from_pydict(
            {"o_orderpriority": t["o_orderpriority"].combine_chunks(),
             "cents": cents},
            schema=cents_schema,
        )

    cents = ords.map_batches(to_cents, batch_format="pyarrow")
    # DISCRETE (quantile_disc) bounds: exact order statistics, so the
    # whole pipeline stays integer — interpolated bounds would hang a
    # half-cent rounding boundary on two engines' last-ulp float
    # expression order
    bounds = grouped_quantiles(
        cents, "o_orderpriority", "cents", {"p05": 0.05, "p95": 0.95},
    ).to_pandas()  # 5 rows: the broadcast-small-side pattern

    lo_by = dict(zip(bounds["o_orderpriority"], bounds["p05"].astype("int64")))
    hi_by = dict(zip(bounds["o_orderpriority"], bounds["p95"].astype("int64")))

    def clip(t: pa.Table) -> pa.Table:
        pri = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        c = t["cents"].to_numpy(zero_copy_only=False)
        # 5 priorities: two tiny dict-lookup gathers via pandas map
        import pandas as pd

        lo = pd.Series(pri).map(lo_by).to_numpy(dtype=np.int64)
        hi = pd.Series(pri).map(hi_by).to_numpy(dtype=np.int64)
        clipped = np.minimum(np.maximum(c, lo), hi)
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"].combine_chunks(),
                "w_cents": clipped,
                "clip_lo": (c < lo).astype(np.int64),
                "clip_hi": (c > hi).astype(np.int64),
            }
        )

    return partial_grouped_agg(
        cents.map_batches(clip, batch_format="pyarrow"),
        ["o_orderpriority"],
        {
            "winsorized_cents": ("w_cents", "sum"),
            "n_clipped_lo": ("clip_lo", "sum"),
            "n_clipped_hi": ("clip_hi", "sum"),
            "n_orders": (None, "count"),
        },
    )


Q67_SQL = """
WITH c AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
b AS (
  SELECT o_orderpriority,
         CAST(quantile_disc(cents, 0.05) AS BIGINT) AS lo,
         CAST(quantile_disc(cents, 0.95) AS BIGINT) AS hi
  FROM c GROUP BY 1)
SELECT c.o_orderpriority,
       CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT) AS winsorized_cents,
       CAST(count(*) FILTER (WHERE cents < lo) AS BIGINT) AS n_clipped_lo,
       CAST(count(*) FILTER (WHERE cents > hi) AS BIGINT) AS n_clipped_hi,
       CAST(count(*) AS BIGINT) AS n_orders
FROM c JOIN b USING (o_orderpriority) GROUP BY 1
"""


def q68_key_skew_audit(sf_dir: str):
    """Pre-shuffle KEY-SKEW audit with the engine's REAL partitioner
    (the diagnostic a planner runs before committing to an exchange
    key): route the event log through the same hash exchange every
    join/groupby here uses, and report per partition its row count,
    distinct-key count, and hottest single key's row count — the
    numbers that decide whether the key needs salting.  The oracle
    recomputes the int-key routing rule (key % P) in SQL, so the gate
    pins that the exchange places every row where the plan says it
    does."""
    from .relational import hash_exchange_map

    ev = _pq(sf_dir, "events", ["user_id"])

    def audit(df):
        import pandas as pd

        if not len(df):
            return pd.DataFrame(
                {"part": pd.Series([], dtype="int64"),
                 "n_rows": pd.Series([], dtype="int64"),
                 "n_keys": pd.Series([], dtype="int64"),
                 "max_key_rows": pd.Series([], dtype="int64")}
            )
        c = df.groupby("user_id", sort=False).size()
        return pd.DataFrame(
            {
                "part": [int(df["__part"].iloc[0])],
                "n_rows": [int(c.sum())],
                "n_keys": [int(len(c))],
                "max_key_rows": [int(c.max())],
            }
        )

    return hash_exchange_map(ev, "user_id", 16, audit, fn_format="pandas")


Q68_SQL = """
WITH k AS (
  SELECT user_id % 16 AS part, user_id, count(*) AS c
  FROM events GROUP BY 1, 2)
SELECT CAST(part AS BIGINT) AS part,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_key_rows
FROM k GROUP BY 1
"""


def m_align_check(sf_dir: str):
    """Cross-modal ALIGNMENT filter (the deterministic CLIP-score
    stand-in): a corruption harness mispairs every 97th caption
    (phase + 500 mod 1000 — collision-free at every phase, pinned by
    test), then the actor-pool alignment stage
    (images/transform.AlignCaptionPixels) parses each caption,
    re-renders reference pixels FROM THE CAPTION ALONE, decodes the
    actual payload and compares exactly (lossy rows through the
    quantization LUT).  The oracle never reads a caption or a pixel:
    it recomputes the phase numerically (splitmix64 HUGEINT CTE) and
    knows exactly which rows the harness mispaired — ``aligned`` is
    TRUE iff both the string path and the pixel path ran correctly."""
    from .images.synth import synth_image_table
    from .images.transform import align_captions

    ds = synth_image_table(2000, partition_rows=500)

    def corrupt(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(
            t["caption"],
            r"^synthetic scene (?P<scene>\d+) phase (?P<phase>\d+)$",
        )
        scene = pc.struct_field(ext, "scene")
        phase = pc.cast(pc.struct_field(ext, "phase"), pa.int64())
        scene_i = pc.cast(scene, pa.int64()).to_numpy(zero_copy_only=False)
        phase_i = phase.to_numpy(zero_copy_only=False)
        bad_np = (scene_i % 97) == 0
        new_phase = np.where(bad_np, (phase_i + 500) % 1000, phase_i)
        n = len(t)
        pre = pa.array(np.repeat("synthetic scene", n), pa.string())
        mid = pa.array(np.repeat("phase", n), pa.string())
        rebuilt = pc.binary_join_element_wise(
            pre,
            pc.cast(scene, pa.string()),
            mid,
            pc.cast(pa.array(new_phase), pa.string()),
            " ",
        )
        cap = pc.if_else(pa.array(bad_np), rebuilt, t["caption"])
        return pa.table(
            {
                "image_id": t["image_id"].combine_chunks(),
                "bytes": t["bytes"].combine_chunks(),
                "fmt": t["fmt"].combine_chunks(),
                "caption": cap,
            }
        )

    return align_captions(ds.map_batches(corrupt, batch_format="pyarrow"))


M_ALIGN_SQL = f"""
WITH {_SPLITMIX_PHASE_CTE}
SELECT i AS image_idx,
       CAST(CASE WHEN i % 97 = 0 THEN (h64 % 1000 + 500) % 1000
                 ELSE h64 % 1000 END AS BIGINT) AS caption_phase,
       (i % 97 <> 0) AS aligned
FROM fin
"""


def q70_click_attribution(sf_dir: str):
    """Last-touch ATTRIBUTION (the marketing-analytics join): every
    purchase is attributed to the same user's most recent prior-or-
    simultaneous click via the distributed backward as-of join, then
    revenue rolls up by the CLICK's hour-of-day (never the click's row
    identity, so equal-timestamp click ties cannot make the two
    engines diverge).  Unattributed purchases (no prior click) land in
    the -1 bucket.  One user exchange + a 25-row combiner rollup."""
    from .relational import partial_grouped_agg
    from .temporal import asof_join

    l_schema = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("cents", pa.int64())]
    )
    r_schema = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us"))]
    )

    def purchases(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "ts": t["ts"].combine_chunks(),
                "cents": (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5))
                .astype(np.int64),
            },
            schema=l_schema,
        )

    ev_p = _pq(sf_dir, "events", ["user_id", "ts", "value", "event_type"]) \
        .filter(expr="event_type == 'purchase'") \
        .map_batches(purchases, batch_format="pyarrow")
    ev_c = _pq(sf_dir, "events", ["user_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'click'") \
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {"user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                 "ts": t["ts"].combine_chunks()},
                schema=r_schema),
            batch_format="pyarrow",
        )

    out = asof_join(
        ev_p, ev_c, by="user_id", on="ts",
        l_schema=l_schema, r_schema=r_schema,
        strict=False, r_suffix="_c", num_partitions=16,
    )

    def bucket(t: pa.Table) -> pa.Table:
        cts = t["ts_c"].combine_chunks().cast(pa.int64())
        us = cts.to_numpy(zero_copy_only=False)  # float64 w/ NaN for null
        valid = ~np.isnan(us)
        hour_np = np.full(len(t), -1, dtype=np.int64)
        hour_np[valid] = (us[valid].astype(np.int64) // 3_600_000_000) % 24
        return pa.table(
            {"click_hour": hour_np,
             "cents": t["cents"].combine_chunks()}
        )

    return partial_grouped_agg(
        out.map_batches(bucket, batch_format="pyarrow"),
        ["click_hour"],
        {"n_purchases": (None, "count"), "attributed_cents": ("cents", "sum")},
    )


Q70_SQL = """
WITH p AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT COALESCE(CAST((epoch_us(c.ts) // 3600000000) % 24 AS BIGINT), -1)
         AS click_hour,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(p.cents) AS BIGINT) AS attributed_cents
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
GROUP BY 1
"""


_WM_LATENESS_US = 3_600_000_000  # 1-h allowed lateness
_WM_SHARD_STRIDE = 1 << 40  # arrival = shard-by-shard backfill replay


def q69_watermark_late(sf_dir: str):
    """STREAMING WATERMARK / late-data accounting (the correctness
    budget every event-time window needs): arrival order models a
    sharded backfill replayed shard-by-shard
    (arrival = (event_id % 1000) * 2^40 + event_id — injective,
    massively event-time out-of-order), the watermark is the running
    MAX event-time over all strictly-earlier arrivals — a GLOBAL
    exclusive prefix scan (relational.ordered_prefix_scan), which no
    per-key window can express — and an event is late iff it lands
    more than 1 h behind it (t + L < wm, kept integer so the identity
    seed needs no special case).  Per-user rollup of total vs late."""
    from .relational import ordered_prefix_scan, partial_grouped_agg

    ev = _pq(sf_dir, "events", ["event_id", "ts", "user_id"])

    slim_schema = pa.schema(
        [("arrival", pa.int64()), ("user_id", pa.int64()),
         ("t_us", pa.int64())]
    )

    def slim(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "arrival": (eid % 1000) * _WM_SHARD_STRIDE + eid,
                "user_id": t["user_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "t_us": t["ts"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False),
            },
            schema=slim_schema,
        )

    scanned = ordered_prefix_scan(
        ev.map_batches(slim, batch_format="pyarrow"),
        "arrival", "t_us", combine="max", out_col="wm",
    )

    def flags(t: pa.Table) -> pa.Table:
        wm = t["wm"].to_numpy(zero_copy_only=False)
        tt = t["t_us"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks(),
                "late": (tt + _WM_LATENESS_US < wm).astype(np.int64),
            }
        )

    return partial_grouped_agg(
        scanned.map_batches(flags, batch_format="pyarrow"),
        ["user_id"],
        {"n_events": (None, "count"), "n_late": ("late", "sum")},
    )


Q69_SQL = f"""
WITH w AS (
  SELECT user_id, epoch_us(ts) AS t,
         max(epoch_us(ts)) OVER (
             ORDER BY (event_id % 1000) * {_WM_SHARD_STRIDE} + event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE t + {_WM_LATENESS_US} < wm) AS BIGINT)
         AS n_late
FROM w GROUP BY 1
"""


def m_pixel_hist(sf_dir: str):
    """Per-channel PIXEL-VALUE HISTOGRAM over decoded bytes (the
    dataset-statistics pass a vision pipeline runs before choosing
    normalization constants): decode every payload zero-copy, bincount
    each channel's values into 16 buckets split by codec, combiner-
    pushdown rollup.  The oracle rebuilds the histogram FROM THE
    GENERATOR FORMULA — DuckDB's libm sin/cos reproduce numpy's
    float64 pixel expressions bit-for-bit on this host (verified over
    every (phase, coordinate) profile value), the separable gradients
    make it 1000x24 + 1000x16 + 1000x39 profile rows instead of 2.3M
    pixels, and the lossy rows replay the encoder's quantization rule
    in integer SQL.  A pixel-level cross-representation gate: green
    only if decode, the codec split, and the channel layout are all
    exactly right."""
    from .images.codec import batch_pixel_view
    from .images.synth import synth_image_table
    from .relational import partial_grouped_agg

    ds = synth_image_table(2000, partition_rows=500)

    hist_schema = pa.schema(
        [("channel", pa.string()), ("lossy", pa.bool_()),
         ("bucket", pa.int64()), ("n_px", pa.int64())]
    )

    def hist(t: pa.Table) -> pa.Table:
        view = batch_pixel_view(t["bytes"])
        px, w, h = view
        lossy = pc.equal(t["fmt"], "rgb5").to_numpy(zero_copy_only=False)
        chans, lossies, buckets, counts = [], [], [], []
        for mask_val, mask in ((True, lossy), (False, ~lossy)):
            if not mask.any():
                continue
            sub = px[mask]
            for ci, cname in enumerate("rgb"):
                cnt = np.bincount(
                    (sub[..., ci] >> 4).ravel(), minlength=16
                ).astype(np.int64)
                chans.append(np.repeat(cname, 16))
                lossies.append(np.full(16, mask_val, dtype=bool))
                buckets.append(np.arange(16, dtype=np.int64))
                counts.append(cnt)
        return pa.Table.from_pydict(
            {
                "channel": np.concatenate(chans),
                "lossy": np.concatenate(lossies),
                "bucket": np.concatenate(buckets),
                "n_px": np.concatenate(counts),
            },
            schema=hist_schema,
        )

    out = partial_grouped_agg(
        ds.map_batches(hist, batch_format="pyarrow"),
        ["channel", "lossy", "bucket"],
        {"n_px": ("n_px", "sum")},
    )
    # drop empty buckets on both sides: the oracle only emits buckets
    # that occur
    return out.filter(expr="n_px > 0")


M_PIXEL_HIST_SQL = f"""
WITH {_SPLITMIX_PHASE_CTE},
ph AS (SELECT i, CAST(h64 % 1000 AS BIGINT) AS pm, (i % 4 = 0) AS lossy
       FROM fin),
xs AS (SELECT range AS x FROM range(0, 24)),
ys AS (SELECT range AS y FROM range(0, 16)),
dd AS (SELECT range AS d FROM range(0, 39)),
u AS (
  SELECT 'r' AS channel, lossy,
         CAST(floor(127.5 * (1 + sin(2 * pi() * (x / 24.0 + pm / 1000.0))))
              AS BIGINT) AS v,
         16 AS cnt
  FROM ph, xs
  UNION ALL
  SELECT 'g', lossy,
         CAST(floor(127.5 * (1 + cos(2 * pi() * (y / 16.0 + (pm / 1000.0) * 2))))
              AS BIGINT),
         24
  FROM ph, ys
  UNION ALL
  SELECT 'b', lossy,
         CAST(floor(127.5 * (1 + sin(2 * pi() * (d / 40.0 + (pm / 1000.0) * 3))))
              AS BIGINT),
         LEAST(23, d) - GREATEST(0, d - 15) + 1
  FROM ph, dd
),
q AS (
  SELECT channel, lossy,
         CASE WHEN lossy THEN LEAST((v + 4) // 8 * 8, 255) ELSE v END AS v2,
         cnt
  FROM u
)
SELECT channel, lossy, v2 // 16 AS bucket, CAST(sum(cnt) AS BIGINT) AS n_px
FROM q GROUP BY 1, 2, 3
"""


_SHAPER_T_US = 4 * 3_600_000_000  # one event per 4 h service rate


def q71_traffic_shaper(sf_dir: str):
    """Leaky-bucket TRAFFIC SHAPER (GCRA) delay accounting — the
    streaming rate-limit primitive: each user's events are serviced at
    one per T; departure obeys the recurrence D_i = max(t_i, D_{i-1})
    + T, whose closed form is a running max, D_i = (i+1)*T +
    max_{j<=i}(t_j - j*T) — so the per-key scan is ONE cummax over the
    user-ordered log (no sequential loop), and the queueing delay
    d_i = D_i - T - t_i = i*T + cummax(t_j - j*T) - t_i is exact
    integer microseconds.  One user exchange computes row numbers,
    the cummax, the delays AND the per-user rollup (events / delayed /
    total / max delay) in a single vectorized pass."""
    from .relational import _with_part, hash_exchange_map

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id"])

    def shape(df):
        import pandas as pd

        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        t = df["ts"].astype("datetime64[us]").astype("int64")
        j = df.groupby("user_id", sort=False).cumcount()
        base = t - j * _SHAPER_T_US
        run = base.groupby(df["user_id"], sort=False).cummax()
        delay = j * _SHAPER_T_US + run - t
        agg = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "delay": delay.to_numpy(),
                "delayed": (delay > 0).to_numpy().astype("int64"),
            }
        ).groupby("user_id", sort=False)
        out = pd.DataFrame(
            {
                "n_events": agg["delay"].size(),
                "n_delayed": agg["delayed"].sum(),
                "sum_delay_us": agg["delay"].sum(),
                "max_delay_us": agg["delay"].max(),
            }
        ).reset_index()
        for c in ("n_events", "n_delayed", "sum_delay_us", "max_delay_us"):
            out[c] = out[c].astype("int64")
        return out

    out = hash_exchange_map(ds, "user_id", 16, shape, fn_format="pandas")
    if out is None:
        return (
            _with_part(ds, "user_id", 16)
            .groupby("__part")
            .map_groups(shape, batch_format="pandas")
        )
    return out.drop_columns(["__part"]) if "__part" in out.schema().names else out


Q71_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) - 1 AS BIGINT) AS j
  FROM events),
d AS (
  SELECT user_id,
         j * {_SHAPER_T_US}
           + max(t - j * {_SHAPER_T_US})
               OVER (PARTITION BY user_id ORDER BY j)
           - t AS delay
  FROM e)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN delay > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_delayed,
       CAST(sum(delay) AS BIGINT) AS sum_delay_us,
       CAST(max(delay) AS BIGINT) AS max_delay_us
FROM d GROUP BY user_id
"""


_BOM_LEVELS = 7  # ancestors via //10^k; covers p_partkey < 10^7


def q72_bom_rollup(sf_dir: str):
    """HIERARCHY (BOM-style) subtree rollup — aggregate every node of
    an implicit tree over its whole subtree in ONE pass: parent(p) =
    p // 10 defines a fixed-depth part taxonomy, each row explodes
    batch-locally into its <=7 (ancestor, cents) contributions
    (vectorized level loop, no recursion, no iteration rounds — the
    recursive-CTE shape collapses because ancestor chains are
    computable per row), then one combiner-pushdown grouped sum
    finishes.  Raw rows never shuffle; the exchange carries only the
    slim ancestor stream."""
    from .relational import partial_grouped_agg

    ds = _pq(sf_dir, "part", ["p_partkey", "p_retailprice"])

    explode_schema = pa.schema([("node", pa.int64()), ("cents", pa.int64())])

    def explode(t: pa.Table) -> pa.Table:
        p = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["p_retailprice"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(np.int64)
        if len(p) and p.max() >= 10 ** _BOM_LEVELS:
            raise ValueError("p_partkey exceeds the 7-level taxonomy")
        nodes, vals = [], []
        div = 1
        for _ in range(_BOM_LEVELS):
            nd = p // div
            m = nd > 0
            nodes.append(nd[m])
            vals.append(cents[m])
            div *= 10
        return pa.Table.from_pydict(
            {"node": np.concatenate(nodes), "cents": np.concatenate(vals)},
            schema=explode_schema,
        )

    return partial_grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["node"],
        {"n_parts": (None, "count"), "subtree_cents": ("cents", "sum")},
    )


Q72_SQL = """
WITH base AS (
  SELECT p_partkey AS p,
         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
  FROM part),
anc AS (
  SELECT p // d.div AS node, cents
  FROM base, (VALUES (1), (10), (100), (1000), (10000), (100000),
              (1000000)) AS d(div)
  WHERE p // d.div > 0)
SELECT node, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS subtree_cents
FROM anc GROUP BY node
"""


def q73_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS with non-hierarchical sets — the general
    multi-aggregation SQL surface beyond ROLLUP/CUBE: per-flag,
    per-status, the cross, and the grand total, all stacked inside the
    SAME one-pass partial (relational.rollup_agg grouping_sets=...), so
    four grouping levels cost one scan and one slim exchange."""
    from .relational import rollup_agg

    ds = _pq(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"]
    )

    def cents(t: pa.Table) -> pa.Table:
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"].combine_chunks(),
                "l_linestatus": t["l_linestatus"].combine_chunks(),
                "cents": (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5))
                .astype(np.int64),
            }
        )

    return rollup_agg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {"sum_cents": ("cents", "sum"), "n_rows": (None, "count")},
        grouping_sets=[
            ["l_returnflag"],
            ["l_linestatus"],
            ["l_returnflag", "l_linestatus"],
            [],
        ],
    )


Q73_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                        (l_returnflag, l_linestatus), ())
"""


def t_rarity_score(sf_dir: str):
    """Integer unigram RARITY scoring — the perplexity-style quality
    signal of an LLM-data pipeline without a single float: each term's
    information weight is 64 - bit_length(df) (an exact integer ~
    64 - log2(df), identical in numpy via frexp and in SQL via
    length(bin(df))), a document scores sum(tf * weight), and hapax
    terms (df = 1) are counted separately as the OOV-risk signal.
    Shape: tokenize once to slim (doc, term, tf) rows, combiner
    push-down df, pack the (vocab, df) arrays by a REMOTE reduce (the
    tfidf broadcast path — never driver pandas), one vectorized
    index_in + weight pass, one doc-keyed rollup.  Above ~10^6 terms
    swap the broadcast for tfidf_topk's salted term-join exchange."""
    import functools

    import ray as _ray

    from .relational import partial_grouped_agg
    from .text.analysis import _term_freqs

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])
    term_rows = docs.map_batches(
        functools.partial(_term_freqs, doc_col="doc_id", text_col="text"),
        batch_format="pyarrow",
    ).materialize()
    df = partial_grouped_agg(
        term_rows.select_columns(["term"]), ["term"], {"df": (None, "count")}
    )

    @_ray.remote
    def _df_pack(*blocks):
        t = pa.concat_tables(blocks, promote_options="default")
        return (
            t["term"].combine_chunks(),
            pc.fill_null(t["df"], 0).cast(pa.int64())
            .combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64),
        )

    block_refs = [
        block_ref
        for bundle in df.iter_internal_ref_bundles()
        for block_ref, _meta in bundle.blocks
    ]
    ref = _df_pack.remote(*block_refs)

    def score(t: pa.Table) -> pa.Table:
        from .worker_state import cache_key_for_ref, get_or_build

        vocab, dfv = get_or_build(
            ("rarity_df", cache_key_for_ref(ref)), lambda: _ray.get(ref)
        )
        codes = (
            pc.index_in(t["term"], value_set=vocab)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        d = dfv[codes]
        # bit_length via frexp: d = m * 2^e with 0.5 <= m < 1, so e is
        # exactly bit_length(d) for every int64 below 2^53
        _, e = np.frexp(d.astype(np.float64))
        w = 64 - e.astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "tot": pa.array(tf),
                "sc": pa.array(tf * w),
                "hapax": pa.array((d == 1).astype(np.int64)),
            }
        )

    scored = term_rows.map_batches(score, batch_format="pyarrow")
    return partial_grouped_agg(
        scored,
        ["doc_id"],
        {
            "total_tokens": ("tot", "sum"),
            "rarity_score": ("sc", "sum"),
            "n_hapax_terms": ("hapax", "sum"),
        },
    )


T_RARITY_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term <> '' GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id,
       CAST(sum(tf.tf) AS BIGINT) AS total_tokens,
       CAST(sum(tf.tf * (64 - length(bin(df.df)))) AS BIGINT)
         AS rarity_score,
       CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax_terms
FROM tf JOIN df USING (term) GROUP BY tf.doc_id
"""


_MRL_DIMS = 16  # truncated-retrieval prefix (of the 64-dim embeddings)


def e_mrl_recall(sf_dir: str):
    """Matryoshka / truncated-embedding RECALL audit — the evaluation
    pass behind every "can we serve the 16-dim prefix?" decision: the
    exact int8-dot top-10 for each query at FULL dimension vs at the
    16-dim prefix (vectors.int8_dot_topk dims=16 — same per-dim
    absmax scale, so truncated codes equal the full run's leading
    codes), then the per-query overlap |topk_full ∩ topk_prefix|.
    Both lists ride the broadcast-queries / partial-top-k shape; the
    overlap is one packed-key hash join + a 4-row rollup."""
    from .relational import hash_join, partial_grouped_agg
    from .vectors import int8_dot_topk

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    full = int8_dot_topk(emb, "vec_id", "embedding", k=10, num_queries=4)
    pref = int8_dot_topk(
        emb, "vec_id", "embedding", k=10, num_queries=4, dims=_MRL_DIMS
    )

    pair_schema = pa.schema([("pair", pa.int64()), ("query_id", pa.int64())])

    def pack(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and (v.min() < 0 or v.max() >= (1 << 31)):
            raise ValueError("vec_id out of packable range")
        return pa.Table.from_pydict(
            {"pair": (q << 31) | v, "query_id": q}, schema=pair_schema
        )

    fp = full.map_batches(pack, batch_format="pyarrow")
    pp = pref.map_batches(pack, batch_format="pyarrow").select_columns(["pair"])
    common = hash_join(
        fp, pp, on="pair",
        l_schema=pair_schema, r_schema=pa.schema([("pair", pa.int64())]),
        num_partitions=4,
    )
    return partial_grouped_agg(
        common.select_columns(["query_id"]),
        ["query_id"],
        {"n_common": (None, "count")},
    )


E_MRL_SQL = f"""
WITH flat AS (
  SELECT vec_id,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(val AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT dim, max(abs(x)) AS amax FROM flat GROUP BY 1),
codes AS (
  SELECT f.vec_id, f.dim,
         CAST(greatest(-127, least(127,
              floor((f.x * 127) / (CASE WHEN s.amax = 0 THEN 1.0 ELSE s.amax END))))
              AS BIGINT) AS code
  FROM flat f JOIN s USING (dim)),
q AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
dots_full AS (
  SELECT qc.vec_id AS query_id, c.vec_id AS vec_id,
         CAST(sum(qc.code * c.code) AS BIGINT) AS dot
  FROM codes qc JOIN codes c USING (dim)
  WHERE qc.vec_id IN (SELECT vec_id FROM q) AND c.vec_id <> qc.vec_id
  GROUP BY 1, 2),
dots_pref AS (
  SELECT qc.vec_id AS query_id, c.vec_id AS vec_id,
         CAST(sum(qc.code * c.code) AS BIGINT) AS dot
  FROM codes qc JOIN codes c USING (dim)
  WHERE qc.vec_id IN (SELECT vec_id FROM q) AND c.vec_id <> qc.vec_id
        AND dim < {_MRL_DIMS}
  GROUP BY 1, 2),
rf AS (SELECT query_id, vec_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY dot DESC, vec_id) AS rn
       FROM dots_full),
rp AS (SELECT query_id, vec_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY dot DESC, vec_id) AS rn
       FROM dots_pref)
SELECT rf.query_id, CAST(count(*) AS BIGINT) AS n_common
FROM rf JOIN rp ON rf.query_id = rp.query_id AND rf.vec_id = rp.vec_id
WHERE rf.rn <= 10 AND rp.rn <= 10
GROUP BY rf.query_id
"""


def g_heading_octants(sf_dir: str):
    """Trig-free segment HEADING histogram — the bearing-distribution
    pass of a road-network audit without atan2: 45-degree compass
    sectors have their boundaries exactly on dx/dy sign changes and
    |dx| vs |dy| comparisons, so the octant of every synthetic way
    segment (deterministic LCG-jitter deltas, positive dividends so
    numpy's floored %% equals SQL's truncated %%) is a pure integer
    decision chain — bit-identical in numpy (np.select) and SQL (the
    same CASE ladder), no float angle anywhere.  Rollup: segments and
    total squared length per octant (degenerate zero-length segments
    land in octant -1).  Fully batch-local + one 9-row exchange."""
    from .relational import partial_grouped_agg

    def octants(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # segment delta = deterministic LCG jitter (endpoint B = A +
        # (dx, dy) in subgrid units) — spans all 8 headings uniformly
        dx = (k * 48271 % 2001) - 1000
        dy = (k * 69621 % 2001) - 1000
        octant = np.select(
            [
                (dx == 0) & (dy == 0),
                (dy >= 0) & (dx > 0) & (dx > dy),
                (dx > 0) & (dy > 0) & (dy >= dx),
                (dx <= 0) & (dy > 0) & (dy > -dx),
                (dx < 0) & (dy > 0) & (-dx >= dy),
                (dx < 0) & (dy <= 0) & (-dx > -dy),
                (dx < 0) & (dy < 0) & (-dy >= -dx),
                (dx >= 0) & (dy < 0) & (-dy > dx),
            ],
            [-1, 0, 1, 2, 3, 4, 5, 6],
            default=7,
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {"octant": octant, "sq_len": dx * dx + dy * dy},
            schema=pa.schema([("octant", pa.int64()), ("sq_len", pa.int64())]),
        )

    return partial_grouped_agg(
        _pq(sf_dir, "part", ["p_partkey"]).map_batches(
            octants, batch_format="pyarrow"
        ),
        ["octant"],
        {"n_segs": (None, "count"), "sum_sq_len": ("sq_len", "sum")},
    )


G_HEADING_SQL = """
WITH d AS (
  SELECT p_partkey * 48271 % 2001 - 1000 AS dx,
         p_partkey * 69621 % 2001 - 1000 AS dy
  FROM part),
o AS (
  SELECT CASE
           WHEN dx = 0 AND dy = 0 THEN -1
           WHEN dy >= 0 AND dx > 0 AND dx > dy THEN 0
           WHEN dx > 0 AND dy > 0 AND dy >= dx THEN 1
           WHEN dx <= 0 AND dy > 0 AND dy > -dx THEN 2
           WHEN dx < 0 AND dy > 0 AND -dx >= dy THEN 3
           WHEN dx < 0 AND dy <= 0 AND -dx > -dy THEN 4
           WHEN dx < 0 AND dy < 0 AND -dy >= -dx THEN 5
           WHEN dx >= 0 AND dy < 0 AND -dy > dx THEN 6
           ELSE 7
         END AS octant,
         dx * dx + dy * dy AS sq_len
  FROM d)
SELECT octant, CAST(count(*) AS BIGINT) AS n_segs,
       CAST(sum(sq_len) AS BIGINT) AS sum_sq_len
FROM o GROUP BY octant
"""


_LERP_STEP_US = 12 * 3_600_000_000  # 12-h resample grid


def q74_linear_interp(sf_dir: str):
    """Time-grid resample by EXACT-RATIONAL linear interpolation — the
    sensor/price upsampling pass with no float drift: each user's
    value series (per-(user, ts) deduped on min event_id) is sampled
    at every 12-h epoch-aligned grid time g inside each consecutive
    pair [t0, t1), emitting the lerp as the exact integer pair
    (num = v0*(t1-g) + v1*(g-t0), den = t1-t0) so the gate compares
    rationals, not doubles.  One user exchange; grid expansion is a
    vectorized repeat/arange inside the partition kernel (the engine's
    segment-expansion idiom), raw rows never re-shuffle."""
    from .relational import _with_part, hash_exchange_map

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("g_us", pa.int64()),
         ("num_cents_us", pa.int64()), ("den_us", pa.int64())]
    )

    def interp(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        u = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = tbl["ts"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = tbl["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = tbl["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(vv) * np.floor(np.abs(vv) * 100 + 0.5)).astype(np.int64)
        order = np.lexsort((eid, t, u))
        u, t, cents = u[order], t[order], cents[order]
        # dedupe (user, ts) keeping the smallest event_id's value
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1])
        u, t, cents = u[keep], t[keep], cents[keep]
        if len(u) < 2:
            return out_schema.empty_table()
        pair = u[1:] == u[:-1]
        t0, t1 = t[:-1][pair], t[1:][pair]
        v0, v1 = cents[:-1][pair], cents[1:][pair]
        pu = u[:-1][pair]
        S = _LERP_STEP_US
        k0 = -(-t0 // S)  # ceil(t0 / S): first grid index >= t0
        k1 = -(-t1 // S)  # grid indices in [k0, k1) stay < t1
        cnt = np.maximum(k1 - k0, 0)
        total = int(cnt.sum())
        if total == 0:
            return out_schema.empty_table()
        rep = np.repeat(np.arange(len(cnt)), cnt)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt
        )
        g = (k0[rep] + offs) * S
        num = v0[rep] * (t1[rep] - g) + v1[rep] * (g - t0[rep])
        return pa.Table.from_pydict(
            {"user_id": pu[rep], "g_us": g, "num_cents_us": num,
             "den_us": (t1 - t0)[rep]},
            schema=out_schema,
        )

    out = hash_exchange_map(ds, "user_id", 16, interp)
    if out is None:
        return (
            _with_part(ds, "user_id", 16)
            .groupby("__part")
            .map_groups(interp, batch_format="pyarrow")
        )
    return out


Q74_SQL = f"""
WITH e0 AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id)
           AS rn
  FROM events),
e AS (SELECT user_id, t, cents FROM e0 WHERE rn = 1),
p AS (SELECT user_id, t AS t0, cents AS v0,
             lead(t) OVER (PARTITION BY user_id ORDER BY t) AS t1,
             lead(cents) OVER (PARTITION BY user_id ORDER BY t) AS v1
      FROM e),
g AS (SELECT user_id, t0, v0, t1, v1,
             unnest(generate_series((t0 + {_LERP_STEP_US} - 1)
                                      // {_LERP_STEP_US} * {_LERP_STEP_US},
                                    t1 - 1, {_LERP_STEP_US})) AS g
      FROM p WHERE t1 IS NOT NULL)
SELECT user_id, g AS g_us,
       v0 * (t1 - g) + v1 * (g - t0) AS num_cents_us,
       t1 - t0 AS den_us
FROM g
"""


_PATTERN_THRESHOLD = 20000


def m_pattern_detect(sf_dir: str):
    """Fixed-pattern MATCHED FILTER over decoded pixels — the
    watermark / test-card detection pass of an image-curation
    pipeline: every payload is decoded zero-copy and its R channel is
    dotted (exact int64) against a ±1 step template over the full
    2-D plane; an image is flagged when |response| >= 20000.  The
    engine computes the honest dense 2-D correlation; the SQL oracle
    exploits the generator's separability (R varies only with x) to
    recompute every response from 24 profile values per phase, with
    the lossy rows replaying the encoder's quantization rule — a
    cross-representation gate on decode, channel layout AND the
    integer filter arithmetic.  Fully batch-local + a 4-row rollup."""
    from .images.codec import batch_pixel_view
    from .images.synth import synth_image_table
    from .relational import partial_grouped_agg

    ds = synth_image_table(2000, partition_rows=500)

    out_schema = pa.schema(
        [("lossy", pa.bool_()), ("detected", pa.bool_()),
         ("n_images", pa.int64()), ("sum_score", pa.int64())]
    )

    def correlate(t: pa.Table) -> pa.Table:
        px, w, h = batch_pixel_view(t["bytes"])
        f = np.where(np.arange(w) < w // 2, 1, -1).astype(np.int64)
        r = px[..., 0].astype(np.int64)  # (n, h, w)
        score = (r * f[None, None, :]).sum(axis=(1, 2))
        lossy = pc.equal(t["fmt"], "rgb5").to_numpy(zero_copy_only=False)
        detected = np.abs(score) >= _PATTERN_THRESHOLD
        return pa.Table.from_pydict(
            {"lossy": lossy, "detected": detected,
             "n_images": np.ones(len(t), np.int64), "sum_score": score},
            schema=out_schema,
        )

    return partial_grouped_agg(
        ds.map_batches(correlate, batch_format="pyarrow"),
        ["lossy", "detected"],
        {"n_images": ("n_images", "sum"), "sum_score": ("sum_score", "sum")},
    )


M_PATTERN_SQL = f"""
WITH {_SPLITMIX_PHASE_CTE},
ph AS (SELECT i, CAST(h64 % 1000 AS BIGINT) AS pm, (i % 4 = 0) AS lossy
       FROM fin),
xs AS (SELECT range AS x FROM range(0, 24)),
v AS (
  SELECT i, lossy, x,
         CAST(floor(127.5 * (1 + sin(2 * pi() * (x / 24.0 + pm / 1000.0))))
              AS BIGINT) AS v
  FROM ph, xs),
q AS (SELECT i, lossy, x,
             CASE WHEN lossy THEN LEAST((v + 4) // 8 * 8, 255) ELSE v END AS v2
      FROM v),
s AS (SELECT i, lossy,
             16 * sum(v2 * CASE WHEN x < 12 THEN 1 ELSE -1 END) AS score
      FROM q GROUP BY i, lossy)
SELECT lossy, (abs(score) >= {_PATTERN_THRESHOLD}) AS detected,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(score) AS BIGINT) AS sum_score
FROM s GROUP BY 1, 2
"""


def g_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distances (relational.bfs_hops): every
    vertex of the deterministic 64-vertex part graph within 4 hops of
    a source (vertices divisible by 16), with its exact hop count —
    min-plus label propagation, edges exchanged once and reused each
    round, frontier + combiner-pushdown grouped min per round.  The
    4-round unrolled SQL twin recomputes distances bit-for-bit
    (labels are monotone and hop-h vertices finalize by round h)."""
    from .relational import bfs_hops

    def to_edges(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"a": k * 2654435761 % 8000000 // 125000,
             "b": k * 40503 % 8000000 // 125000},
            schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
        )

    edges = _pq(sf_dir, "part", ["p_partkey"]).map_batches(
        to_edges, batch_format="pyarrow")
    return bfs_hops(edges, source_mod=16, rounds=4)


_BFS_ROUND = """
d{n} AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
  SELECT node, dist FROM d{p}
  UNION ALL
  SELECT e.dst AS node, d{p}.dist + 1 AS dist
  FROM e JOIN d{p} ON d{p}.node = e.src) GROUP BY node)"""

G_BFS_SQL = (
    """
WITH raw AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part),
e0 AS (SELECT k * 2654435761 % 8000000 // 125000 AS u,
              k * 40503 % 8000000 // 125000 AS v FROM raw),
e AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
       FROM e WHERE src % 16 = 0),"""
    + ",".join(_BFS_ROUND.format(n=i, p=i - 1) for i in range(1, 5))
    + """
SELECT node, dist FROM d4
"""
)


_CONV_WINDOW_US = 24 * 3_600_000_000  # 24-h conversion window


def q75_temporal_anti(sf_dir: str):
    """TEMPORAL ANTI-JOIN — "views never followed by a purchase within
    24 h" (the absence-within-window predicate that funnels, churn
    triggers and retargeting audiences all need; strictly-after
    window (t, t+W] so equal-timestamp ties cannot diverge): one user
    exchange co-locates each user's views and purchases, then the
    window test is two vectorized searchsorted probes against the
    partition's purchase timeline on a dense-code composite key — no
    per-user loop, no pair blow-up, raw events never re-shuffle.
    Output per user: views and unconverted views."""
    from .relational import _with_part, hash_exchange_map

    ds = _pq(sf_dir, "events", ["ts", "user_id", "event_type"]).filter(
        expr="event_type == 'view' or event_type == 'purchase'"
    )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_views", pa.int64()),
         ("n_unconverted", pa.int64())]
    )

    def anti(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        if len(tbl) == 0:
            return out_schema.empty_table()
        u = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = tbl["ts"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        is_view = pc.equal(tbl["event_type"], "view") \
            .to_numpy(zero_copy_only=False)
        codes, inv = np.unique(u, return_inverse=True)
        tmin = t.min()
        span = (t.max() - tmin) + _CONV_WINDOW_US + 2
        key = inv.astype(np.int64) * span + (t - tmin)
        pk = np.sort(key[~is_view])
        vk = key[is_view]
        lo = np.searchsorted(pk, vk, side="right")
        hi = np.searchsorted(pk, vk + _CONV_WINDOW_US, side="right")
        unconv = (hi == lo).astype(np.int64)
        vu = u[is_view]
        order = np.argsort(vu, kind="stable")
        vu_s, unconv_s = vu[order], unconv[order]
        uniq, starts = np.unique(vu_s, return_index=True)
        ends = np.append(starts[1:], len(vu_s))
        return pa.Table.from_pydict(
            {
                "user_id": uniq,
                "n_views": (ends - starts).astype(np.int64),
                "n_unconverted": np.add.reduceat(unconv_s, starts)
                if len(starts) else np.array([], np.int64),
            },
            schema=out_schema,
        )

    out = hash_exchange_map(ds, "user_id", 16, anti)
    if out is None:
        return (
            _with_part(ds, "user_id", 16)
            .groupby("__part")
            .map_groups(anti, batch_format="pyarrow")
        )
    return out


Q75_SQL = f"""
WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'view'),
p AS (SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase'),
per_view AS (
  SELECT v.event_id, v.user_id, count(p.t) AS np
  FROM v LEFT JOIN p
    ON p.user_id = v.user_id
   AND p.t > v.t AND p.t <= v.t + {_CONV_WINDOW_US}
  GROUP BY v.event_id, v.user_id)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_views,
       CAST(sum(CASE WHEN np = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unconverted
FROM per_view GROUP BY user_id
"""


def t_lang_confusion(sf_dir: str):
    """Language-ID CONFUSION MATRIX — the evaluation gate of the
    heuristic classifier: predicted language (the t_langid stopword
    argmax) against the table's labeled ``lang`` column, as exact
    (label, predicted, n_docs) counts.  One actor-pool analysis pass
    plus a tiny rollup; the oracle replays the full prediction chain
    in SQL and joins the label."""
    from .relational import partial_grouped_agg
    from .text.analysis import analyze_documents

    docs = _pq(sf_dir, "documents", ["doc_id", "text", "lang"])
    preds = analyze_documents(
        docs.select_columns(["doc_id", "text"]), concurrency=2
    ).select_columns(["doc_id", "lang_pred"])

    from .relational import hash_join

    labeled = hash_join(
        preds.map_batches(
            lambda t: pa.Table.from_pydict(
                {"doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                 "lang_pred": t["lang_pred"].combine_chunks()},
                schema=pa.schema([("doc_id", pa.int64()),
                                  ("lang_pred", pa.string())]),
            ),
            batch_format="pyarrow",
        ),
        docs.map_batches(
            lambda t: pa.Table.from_pydict(
                {"doc_id": t["doc_id"].combine_chunks().cast(pa.int64()),
                 "lang": t["lang"].combine_chunks()},
                schema=pa.schema([("doc_id", pa.int64()),
                                  ("lang", pa.string())]),
            ),
            batch_format="pyarrow",
        ),
        on="doc_id",
        l_schema=pa.schema([("doc_id", pa.int64()), ("lang_pred", pa.string())]),
        r_schema=pa.schema([("doc_id", pa.int64()), ("lang", pa.string())]),
        num_partitions=8,
    )
    return partial_grouped_agg(
        labeled.select_columns(["lang", "lang_pred"]),
        ["lang", "lang_pred"],
        {"n_docs": (None, "count")},
    )


T_LANG_CONFUSION_SQL = rf"""
WITH toks AS (
  SELECT doc_id, lower(u.w) AS w
  FROM documents, UNNEST(regexp_extract_all(text, '\S+')) AS u(w)
),
sw(lang, idx, w) AS (VALUES {_langid_values_sql()}),
hits AS (
  SELECT t.doc_id, s.lang, s.idx, count(*) AS c
  FROM toks t JOIN sw s ON t.w = s.w
  GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, lang, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, idx) AS rn
  FROM hits
),
pred AS (
  SELECT d.doc_id, d.lang, COALESCE(b.lang, 'und') AS lang_pred
  FROM documents d
  LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.doc_id = d.doc_id)
SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2
"""


def e_centroid_drift(sf_dir: str):
    """Embedding DRIFT audit — "did the distribution move between two
    cohorts?" with no float tolerance: vectors split into deterministic
    halves (vec_id %% 2), each component floor-quantized to 1e-6 ticks,
    per-(label, half, dim) integer sums via the long-form reduceat
    partial, and the per-label L1 centroid distance cross-multiplied
    exact: sum_dims |s0*n1 - s1*n0| (the |mean0-mean1| L1 scaled by
    n0*n1, kept rational).  Raw vectors never shuffle; the final
    half-vs-half fold runs over the tiny (labels x dims) aggregate."""
    from .relational import partial_grouped_agg
    from .vectors import vec_matrix

    emb = _pq(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    part_schema = pa.schema(
        [("label", pa.int64()), ("half", pa.int64()), ("dim", pa.int64()),
         ("s", pa.int64()), ("n", pa.int64())]
    )

    def partials(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        M = vec_matrix(t["embedding"])  # (n, d) float
        q = np.floor(M.astype(np.float64) * 1_000_000).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        half = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 2
        key = lab * 2 + half
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        d = q.shape[1]
        sums = np.add.reduceat(q[order], starts, axis=0)  # (groups, d)
        counts = np.diff(np.append(starts, len(ks)))
        g = ks[starts]
        return pa.Table.from_pydict(
            {
                "label": np.repeat(g // 2, d),
                "half": np.repeat(g % 2, d),
                "dim": np.tile(np.arange(d, dtype=np.int64), len(g)),
                "s": sums.ravel(),
                "n": np.repeat(counts.astype(np.int64), d),
            },
            schema=part_schema,
        )

    agg = partial_grouped_agg(
        emb.map_batches(partials, batch_format="pyarrow"),
        ["label", "half", "dim"],
        {"s": ("s", "sum"), "n": ("n", "sum")},
    )

    out_schema = pa.schema(
        [("label", pa.int64()), ("n0", pa.int64()), ("n1", pa.int64()),
         ("l1_cross", pa.int64())]
    )

    def fold(t: pa.Table) -> pa.Table:
        # tiny (labels x 2 x dims) aggregate — single block after
        # repartition(1)
        lab = t["label"].to_numpy(zero_copy_only=False)
        half = t["half"].to_numpy(zero_copy_only=False)
        dim = t["dim"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        labs = np.unique(lab)
        rows = {"label": [], "n0": [], "n1": [], "l1_cross": []}
        for lb in labs:
            m0 = (lab == lb) & (half == 0)
            m1 = (lab == lb) & (half == 1)
            if not m0.any() or not m1.any():
                continue
            o0, o1 = np.argsort(dim[m0]), np.argsort(dim[m1])
            s0, s1 = s[m0][o0], s[m1][o1]
            n0, n1 = int(n[m0][0]), int(n[m1][0])
            rows["label"].append(int(lb))
            rows["n0"].append(n0)
            rows["n1"].append(n1)
            rows["l1_cross"].append(int(np.abs(s0 * n1 - s1 * n0).sum()))
        return pa.Table.from_pydict(rows, schema=out_schema)

    return agg.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


E_DRIFT_SQL = """
WITH flat AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM (SELECT vec_id, label, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT label, vec_id % 2 AS half, dim,
             CAST(sum(q) AS BIGINT) AS s, count(*) AS n
      FROM flat GROUP BY 1, 2, 3),
j AS (SELECT s0.label, s0.dim, s0.s AS s0, s1.s AS s1,
             s0.n AS n0, s1.n AS n1
      FROM (SELECT * FROM s WHERE half = 0) s0
      JOIN (SELECT * FROM s WHERE half = 1) s1 USING (label, dim))
SELECT label, CAST(max(n0) AS BIGINT) AS n0, CAST(max(n1) AS BIGINT) AS n1,
       CAST(sum(abs(s0 * n1 - s1 * n0)) AS BIGINT) AS l1_cross
FROM j GROUP BY label
"""


def q76_weighted_median(sf_dir: str):
    """Exact WEIGHTED median — the duration/revenue-weighted order
    statistic ("the quantity at which half the money sits below"):
    per return flag, the smallest quantity whose running revenue
    reaches half the flag's total, all integer cents.  Shape: one
    combiner-pushdown (flag, qty) revenue rollup (the only pass over
    the data — the value domain is small, the classic histogram
    trick), then the pick runs over the tiny aggregate."""
    from .relational import partial_grouped_agg

    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_quantity", "l_extendedprice"])

    def slim(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"].combine_chunks(),
                "qty": (np.sign(q) * np.floor(np.abs(q) + 0.5)).astype(np.int64),
                "cents": (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5))
                .astype(np.int64),
            }
        )

    agg = partial_grouped_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["l_returnflag", "qty"],
        {"w": ("cents", "sum")},
    )

    out_schema = pa.schema(
        [("l_returnflag", pa.string()), ("weighted_median_qty", pa.int64()),
         ("total_cents", pa.int64())]
    )

    def pick(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        rows = {"l_returnflag": [], "weighted_median_qty": [],
                "total_cents": []}
        for flag, g in df.groupby("l_returnflag", sort=False):
            g = g.sort_values("qty")
            cw = g["w"].cumsum()
            tw = int(g["w"].sum())
            med = int(g["qty"].to_numpy()[(2 * cw >= tw).to_numpy()][0])
            rows["l_returnflag"].append(flag)
            rows["weighted_median_qty"].append(med)
            rows["total_cents"].append(tw)
        return pa.Table.from_pydict(rows, schema=out_schema)

    return agg.repartition(1).map_batches(
        pick, batch_format="pyarrow", batch_size=None
    )


Q76_SQL = """
WITH w AS (SELECT l_returnflag,
                  CAST(round(l_quantity) AS BIGINT) AS qty,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
a AS (SELECT l_returnflag, qty, CAST(sum(cents) AS BIGINT) AS w
      FROM w GROUP BY 1, 2),
c AS (SELECT l_returnflag, qty,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY qty) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM a)
SELECT l_returnflag,
       CAST(min(qty) AS BIGINT) AS weighted_median_qty,
       CAST(max(tw) AS BIGINT) AS total_cents
FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag
"""


_ISLAND_HOLD_US = 30 * 60_000_000  # each event holds a 30-min interval


def q77_interval_union(sf_dir: str):
    """GAPS-AND-ISLANDS interval union — merge every user's
    overlapping 30-min event intervals into maximal islands and report
    island count + exact union length (the de-overlapped "time
    actually active" metric naive sum-of-durations double-counts):
    one user exchange, then a single vectorized pass — lexsort,
    per-user shifted cummax of interval ends, break flags, island ids
    by cumsum, reduceat min/max per island.  No per-user loop."""
    from .relational import _with_part, hash_exchange_map

    ds = _pq(sf_dir, "events", ["ts", "user_id"])

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_islands", pa.int64()),
         ("union_us", pa.int64())]
    )

    def islands(df):
        import pandas as pd

        df = df.sort_values(["user_id", "ts"], kind="stable")
        u = df["user_id"].to_numpy()
        s = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        e = s + _ISLAND_HOLD_US
        run_end = pd.Series(e).groupby(pd.Series(u), sort=False).cummax() \
            .to_numpy()
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        brk = new_user.copy()
        brk[1:] |= s[1:] > run_end[:-1]
        iid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        isl_start = s[starts]
        isl_end = np.maximum.reduceat(e, starts)
        isl_user = u[starts]
        span = isl_end - isl_start
        uniq, ustarts = np.unique(isl_user, return_index=True)
        uends = np.append(ustarts[1:], len(isl_user))
        return pd.DataFrame(
            {
                "user_id": uniq,
                "n_islands": (uends - ustarts).astype("int64"),
                "union_us": np.add.reduceat(span, ustarts).astype("int64"),
            }
        )

    out = hash_exchange_map(ds, "user_id", 16, islands, fn_format="pandas")
    if out is None:
        return (
            _with_part(ds, "user_id", 16)
            .groupby("__part")
            .map_groups(islands, batch_format="pandas")
        )
    return out.drop_columns(["__part"]) if "__part" in out.schema().names else out


Q77_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS s,
                  epoch_us(ts) + {_ISLAND_HOLD_US} AS e
           FROM events),
o AS (SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
      FROM e),
b AS (SELECT user_id, s, e,
             CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk
      FROM o),
ids AS (SELECT user_id, s, e,
               sum(brk) OVER (PARTITION BY user_id ORDER BY s, e) AS iid
        FROM b),
g AS (SELECT user_id, iid, min(s) AS st, max(e) AS en
      FROM ids GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(en - st) AS BIGINT) AS union_us
FROM g GROUP BY user_id
"""


def t_ngram_novelty(sf_dir: str):
    """Corpus NOVELTY curve — for each document, how many of its
    distinct word trigrams it INTRODUCES (global first occurrence by
    doc_id order): the incremental-contribution signal a curation
    pass uses to drop late boilerplate while keeping early canonical
    copies.  Shape: trigrams assembled batch-locally (the winnowing
    construction: one Arrow regex split + parent-aligned gather +
    binary_join), per-doc distinct via one packed np.unique, then ONE
    gram-keyed hash exchange whose partition kernel both finds each
    gram's min doc AND flags every (doc, gram) row in place — no
    join-back pass; a doc-keyed rollup finishes.  Documents shorter
    than 3 tokens have no trigrams and are absent (both engines).
    Routing hashes only co-locate; grouping is by the gram STRING, so
    hash collisions cannot merge grams."""
    from .relational import empty_dataset, hash_exchange_map, partial_grouped_agg
    from .text.analysis import _hash63_batch

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    gram_schema = pa.schema(
        [("doc_id", pa.int64()), ("g", pa.string()), ("gram_key", pa.int64())]
    )

    def grams(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(ne))
        parent = parent[ne]
        total = len(flat)
        starts = (
            np.flatnonzero(parent[: total - 2] == parent[2:])
            if total >= 3 else np.empty(0, np.int64)
        )
        if len(starts) == 0:
            return gram_schema.empty_table()
        parts = [flat.take(pa.array(starts + k, pa.int64())) for k in range(3)]
        g = pc.binary_join_element_wise(*parts, " ")
        gdoc = parent[starts].astype(np.int64)
        denc = g.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        _, idx = np.unique(gdoc * np.int64(len(denc.dictionary)) + codes,
                           return_index=True)
        sel = pa.array(np.sort(idx), pa.int64())
        gd = g.take(sel)
        doc_ids = t["doc_id"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)[gdoc[np.sort(idx)]]
        return pa.Table.from_pydict(
            {"doc_id": doc_ids, "g": gd,
             "gram_key": _hash63_batch(gd).astype(np.int64)},
            schema=gram_schema,
        )

    rows = docs.map_batches(grams, batch_format="pyarrow")

    flag_schema = pa.schema([("doc_id", pa.int64()), ("novel", pa.int64())])

    def kernel(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            return flag_schema.empty_table()
        g = tbl["g"]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        codes = g.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, codes))
        cs, ds_ = codes[order], doc[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        lens = np.diff(np.append(starts, n))
        novel = (ds_ == np.repeat(ds_[starts], lens)).astype(np.int64)
        return pa.Table.from_pydict(
            {"doc_id": ds_, "novel": novel}, schema=flag_schema
        )

    flagged = hash_exchange_map(rows, "gram_key", 16, kernel)
    if flagged is None:
        return empty_dataset(
            pa.schema([("doc_id", pa.int64()), ("n_trigrams", pa.int64()),
                       ("n_novel", pa.int64())])
        )
    return partial_grouped_agg(
        flagged, ["doc_id"],
        {"n_trigrams": (None, "count"), "n_novel": ("novel", "sum")},
    )


T_NOVELTY_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
  FROM documents
),
tri AS (
  SELECT w.doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM words w, UNNEST(generate_series(1, len(ws) - 2)) AS u(i)
  WHERE len(ws) >= 3
),
dt AS (SELECT DISTINCT doc_id, g FROM tri),
mn AS (SELECT g, min(doc_id) AS m FROM dt GROUP BY 1)
SELECT dt.doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(CASE WHEN mn.m = dt.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel
FROM dt JOIN mn USING (g) GROUP BY dt.doc_id
"""


def g_cell_moran(sf_dir: str):
    """Spatial AUTOCORRELATION (Moran's I) over the image tile
    histogram, kept EXACT: with K occupied cells, S total images and
    rook (4-neighbor) adjacency restricted to occupied cells, the
    numerator sum over neighbor pairs of (K*x_i - S)(K*x_j - S) and
    the denominator sum of (K*x_i - S)^2 expand into six integer
    aggregates (K, S, sum x^2, pair count, sum x_i*x_j, sum x_i+x_j)
    — no float mean anywhere, the classic hot-spot statistic as pure
    int64.  Shape: per-cell counts via combiner pushdown, neighbor
    pairs via TWO shifted-key hash joins of the tiny histogram with
    itself (east + north, each undirected pair once), one stacked
    rollup; raw points never re-shuffle."""
    from .relational import hash_join, partial_grouped_agg

    def encode(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * 256).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * 256).astype(np.int64)
        return pa.Table.from_pydict(
            {"key": x * 256 + y},
            schema=pa.schema([("key", pa.int64())]),
        )

    counts = partial_grouped_agg(
        part_images(sf_dir).map_batches(encode, batch_format="pyarrow"),
        ["key"],
        {"n": (None, "count")},
    ).materialize()

    cnt_schema = pa.schema([("key", pa.int64()), ("n", pa.int64())])

    agg_schema = pa.schema(
        [("g", pa.int64()), ("n_cells", pa.int64()), ("sum_x", pa.int64()),
         ("sum_x2", pa.int64()), ("n_pairs", pa.int64()),
         ("sum_xy", pa.int64()), ("sum_xpxj", pa.int64())]
    )

    def cell_partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"g": [0], "n_cells": [len(n)], "sum_x": [int(n.sum())],
             "sum_x2": [int((n * n).sum())], "n_pairs": [0],
             "sum_xy": [0], "sum_xpxj": [0]},
            schema=agg_schema,
        )

    def shifted(dx: int, dy: int):
        def fn(t: pa.Table) -> pa.Table:
            key = t["key"].to_numpy(zero_copy_only=False)
            x, y = key // 256, key % 256
            nx, ny = x + dx, y + dy
            m = (nx >= 0) & (nx < 256) & (ny >= 0) & (ny < 256)
            return pa.Table.from_pydict(
                {"key": (nx * 256 + ny)[m],
                 "n": t["n"].to_numpy(zero_copy_only=False)[m]},
                schema=cnt_schema,
            )
        return fn

    def pair_partial(t: pa.Table) -> pa.Table:
        a = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["n_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"g": [0], "n_cells": [0], "sum_x": [0], "sum_x2": [0],
             "n_pairs": [len(a)], "sum_xy": [int((a * b).sum())],
             "sum_xpxj": [int((a + b).sum())]},
            schema=agg_schema,
        )

    partials = [counts.map_batches(cell_partial, batch_format="pyarrow")]
    for dx, dy in ((1, 0), (0, 1)):
        j = hash_join(
            counts.map_batches(shifted(dx, dy), batch_format="pyarrow"),
            counts.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"key": t["key"], "n_r": t["n"]},
                    schema=pa.schema([("key", pa.int64()), ("n_r", pa.int64())]),
                ),
                batch_format="pyarrow",
            ),
            on="key",
            l_schema=cnt_schema,
            r_schema=pa.schema([("key", pa.int64()), ("n_r", pa.int64())]),
            num_partitions=4,
        )
        partials.append(j.map_batches(pair_partial, batch_format="pyarrow"))

    u = partials[0].union(*partials[1:])
    agg = partial_grouped_agg(
        u, ["g"],
        {c: (c, "sum") for c in
         ("n_cells", "sum_x", "sum_x2", "n_pairs", "sum_xy", "sum_xpxj")},
    )

    out_schema = pa.schema(
        [("n_cells", pa.int64()), ("sum_x", pa.int64()),
         ("n_pairs", pa.int64()), ("moran_num", pa.int64()),
         ("moran_den", pa.int64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        K = t["n_cells"].to_numpy(zero_copy_only=False).astype(np.int64)
        S = t["sum_x"].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = t["sum_x2"].to_numpy(zero_copy_only=False).astype(np.int64)
        npair = t["n_pairs"].to_numpy(zero_copy_only=False).astype(np.int64)
        xy = t["sum_xy"].to_numpy(zero_copy_only=False).astype(np.int64)
        xp = t["sum_xpxj"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "n_cells": K, "sum_x": S, "n_pairs": npair,
                "moran_num": K * K * xy - K * S * xp + npair * S * S,
                "moran_den": K * K * x2 - K * S * S,
            },
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow") \
        .select_columns(["n_cells", "sum_x", "n_pairs", "moran_num",
                         "moran_den"])


G_MORAN_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
c AS (
  SELECT CAST(floor((lon + 180) / 360 * 256) AS BIGINT) AS x,
         CAST(floor((lat + 90) / 180 * 256) AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS n
  FROM img GROUP BY 1, 2),
cellagg AS (SELECT count(*) AS k, sum(n) AS s, sum(n * n) AS x2 FROM c),
pairs AS (
  SELECT a.n AS na, b.n AS nb
  FROM c a JOIN c b
    ON (b.x = a.x + 1 AND b.y = a.y) OR (b.x = a.x AND b.y = a.y + 1)),
pairagg AS (SELECT count(*) AS np, COALESCE(sum(na * nb), 0) AS xy,
                   COALESCE(sum(na + nb), 0) AS xp
            FROM pairs)
SELECT CAST(k AS BIGINT) AS n_cells, CAST(s AS BIGINT) AS sum_x,
       CAST(np AS BIGINT) AS n_pairs,
       CAST(k * k * xy - k * s * xp + np * s * s AS BIGINT) AS moran_num,
       CAST(k * k * x2 - k * s * s AS BIGINT) AS moran_den
FROM cellagg, pairagg
"""


def m_tile_coverage_gap(sf_dir: str):
    """Geo x image COVERAGE-GAP audit — which map tiles have imagery,
    which have customer demand, and where the two disagree: the image
    tile histogram FULL OUTER-joined with a customer-demand tile
    histogram (customer points from the same deterministic hash
    family, same 256-grid cells), each cell classified
    both / image_only / demand_only, rolled up to class totals.  Two
    combiner-pushdown histograms + one full-outer hash exchange of
    the tiny per-cell streams — raw points never re-shuffle."""
    from .relational import grouped_count, hash_join, partial_grouped_agg

    def img_cells(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * 256).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * 256).astype(np.int64)
        return pa.Table.from_pydict(
            {"key": x * 256 + y}, schema=pa.schema([("key", pa.int64())])
        )

    def cust_cells(t: pa.Table) -> pa.Table:
        c = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = (c * 1299709 % 8000000) / 1e6 - 2.0
        lat = (c * 7368787 % 8000000) / 1e6 - 2.0
        x = np.floor((lon + 180.0) / 360.0 * 256).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * 256).astype(np.int64)
        return pa.Table.from_pydict(
            {"key": x * 256 + y}, schema=pa.schema([("key", pa.int64())])
        )

    imgs = grouped_count(
        part_images(sf_dir).map_batches(img_cells, batch_format="pyarrow"),
        "key", alias="n_images",
    )
    custs = grouped_count(
        _pq(sf_dir, "customer", ["c_custkey"]).map_batches(
            cust_cells, batch_format="pyarrow"),
        "key", alias="n_custs",
    )
    joined = hash_join(
        imgs, custs, on="key",
        l_schema=pa.schema([("key", pa.int64()), ("n_images", pa.int64())]),
        r_schema=pa.schema([("key", pa.int64()), ("n_custs", pa.int64())]),
        how="full_outer", num_partitions=4,
    )

    cls_schema = pa.schema(
        [("coverage", pa.string()), ("n_cells", pa.int64()),
         ("n_images", pa.int64()), ("n_custs", pa.int64())]
    )

    def classify(t: pa.Table) -> pa.Table:
        ni = pc.fill_null(t["n_images"], 0).cast(pa.int64()) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        nc = pc.fill_null(t["n_custs"], 0).cast(pa.int64()) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        cls = np.where(
            (ni > 0) & (nc > 0), "both",
            np.where(ni > 0, "image_only", "demand_only"),
        )
        return pa.Table.from_pydict(
            {"coverage": cls, "n_cells": np.ones(len(ni), np.int64),
             "n_images": ni, "n_custs": nc},
            schema=cls_schema,
        )

    return partial_grouped_agg(
        joined.map_batches(classify, batch_format="pyarrow"),
        ["coverage"],
        {"n_cells": ("n_cells", "sum"), "n_images": ("n_images", "sum"),
         "n_custs": ("n_custs", "sum")},
    )


M_COVERAGE_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
ic AS (
  SELECT CAST(floor((lon + 180) / 360 * 256) AS BIGINT) * 256
         + CAST(floor((lat + 90) / 180 * 256) AS BIGINT) AS key,
         CAST(count(*) AS BIGINT) AS n_images
  FROM img GROUP BY 1),
cc AS (
  SELECT CAST(floor(((c_custkey * 1299709 % 8000000) / 1e6 - 2 + 180)
                    / 360 * 256) AS BIGINT) * 256
         + CAST(floor(((c_custkey * 7368787 % 8000000) / 1e6 - 2 + 90)
                      / 180 * 256) AS BIGINT) AS key,
         CAST(count(*) AS BIGINT) AS n_custs
  FROM customer GROUP BY 1),
j AS (SELECT COALESCE(ic.n_images, 0) AS ni, COALESCE(cc.n_custs, 0) AS nc
      FROM ic FULL OUTER JOIN cc USING (key))
SELECT CASE WHEN ni > 0 AND nc > 0 THEN 'both'
            WHEN ni > 0 THEN 'image_only'
            ELSE 'demand_only' END AS coverage,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(ni) AS BIGINT) AS n_images,
       CAST(sum(nc) AS BIGINT) AS n_custs
FROM j GROUP BY 1
"""


def q78_decayed_value(sf_dir: str):
    """DECAYED COUNTER rollup — recency-weighted user value with a
    half-life of one day, kept exact: each purchase contributes
    cents >> age_days (integer floor halving per elapsed day since
    the corpus watermark, capped at 62), so the "exponentially
    decayed sum" every feature store keeps is a plain integer
    aggregate both engines reproduce bit-for-bit — no float pow.
    One tiny max-ts aggregate (the watermark), then a combiner
    push-down per-user rollup."""
    from .relational import partial_grouped_agg

    ev = _pq(sf_dir, "events", ["user_id", "ts", "value", "event_type"]) \
        .filter(expr="event_type == 'purchase'")
    wm_us = int(pa.scalar(ev.max("ts")).cast(pa.timestamp("us")).cast(pa.int64()).as_py())

    day_us = 86_400_000_000

    def decay(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(np.int64)
        age = np.minimum((wm_us - ts) // day_us, 62).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"].combine_chunks().cast(pa.int64()),
                "decayed": cents >> age,
                "cents": cents,
            }
        )

    return partial_grouped_agg(
        ev.map_batches(decay, batch_format="pyarrow"),
        ["user_id"],
        {"n_purchases": (None, "count"), "total_cents": ("cents", "sum"),
         "decayed_cents": ("decayed", "sum")},
    )


Q78_SQL = """
WITH p AS (SELECT user_id, epoch_us(ts) AS t,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
wm AS (SELECT max(t) AS w FROM p),
d AS (SELECT user_id, cents,
             cents // CAST(power(2, LEAST((w - t) // 86400000000, 62))
                           AS BIGINT) AS decayed
      FROM p, wm)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(decayed) AS BIGINT) AS decayed_cents
FROM d GROUP BY user_id
"""


_MUT_DIMS = 8
_MUT_K = 3


def e_knn_mutuality(sf_dir: str):
    """kNN-graph MUTUALITY audit — the symmetry rate of the directed
    k-nearest-neighbor graph (low mutuality flags hubness / a bad
    metric before the graph is trusted for clustering or diffusion):
    every vector's exact top-3 by int8-quantized dot over the 8-dim
    prefix, then the fraction of directed edges whose reverse edge
    also exists.  The code matrix is assembled by a REMOTE reduce and
    broadcast once (an anchor-sample audit at web scale); per-batch
    integer matmul + partial top-k; mutual edges found by ONE packed
    (src,dst)<->(dst,src) hash join; a single-row rollup."""
    import ray as _ray

    from .relational import grouped_topk, hash_join, partial_grouped_agg
    from .vectors import _absmax_scale_ref, _quantize_matrix, vec_matrix

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    scale_ref = _absmax_scale_ref(emb, "embedding")

    @_ray.remote
    def _pack(amax, *blocks):
        t = pa.concat_tables(blocks, promote_options="default")
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = vec_matrix(t["embedding"])[:, :_MUT_DIMS]
        return ids, _quantize_matrix(M, amax[:_MUT_DIMS], 127)

    block_refs = [
        block_ref
        for bundle in emb.materialize().iter_internal_ref_bundles()
        for block_ref, _meta in bundle.blocks
    ]
    bundle_ref = _pack.remote(scale_ref, *block_refs)

    edge_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("dot", pa.int64())]
    )

    def knn(t: pa.Table) -> pa.Table:
        from .worker_state import cache_key_for_ref, get_or_build

        all_ids, all_codes = get_or_build(
            ("mut_codes", cache_key_for_ref(bundle_ref)),
            lambda: _ray.get(bundle_ref),
        )
        if len(t) == 0:
            return edge_schema.empty_table()
        amax = _ray.get(scale_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _quantize_matrix(
            vec_matrix(t["embedding"])[:, :_MUT_DIMS], amax[:_MUT_DIMS], 127
        )
        dots = codes @ all_codes.T  # (n, N) exact int64
        srcs, dsts, dd = [], [], []
        for i in range(len(ids)):
            row = dots[i]
            mask = all_ids != ids[i]
            cid, cdot = all_ids[mask], row[mask]
            sel = np.lexsort((cid, -cdot))[:_MUT_K]
            srcs.append(np.full(len(sel), ids[i], np.int64))
            dsts.append(cid[sel])
            dd.append(cdot[sel])
        return pa.Table.from_pydict(
            {"src": np.concatenate(srcs), "dst": np.concatenate(dsts),
             "dot": np.concatenate(dd)}, schema=edge_schema)

    # partial top-k per batch is already exact here (the broadcast side
    # is complete), so grouped_topk just dedupes across any block
    # overlap — and guards the invariant if batching ever changes
    edges = grouped_topk(
        emb.map_batches(knn, batch_format="pyarrow"),
        "src", [("dot", True), ("dst", False)], k=_MUT_K,
    )

    pk_schema = pa.schema([("fwd", pa.int64())])

    def pack_fwd(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (max(s.max(), d.max()) >= (1 << 31) or min(s.min(), d.min()) < 0):
            raise ValueError("vec_id out of packable range")
        return pa.Table.from_pydict({"fwd": (s << 31) | d}, schema=pk_schema)

    def pack_rev(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict({"fwd": (d << 31) | s}, schema=pk_schema)

    edges = edges.materialize()
    mutual = hash_join(
        edges.map_batches(pack_fwd, batch_format="pyarrow"),
        edges.map_batches(pack_rev, batch_format="pyarrow"),
        on="fwd", l_schema=pk_schema, r_schema=pk_schema,
        how="left_semi", num_partitions=4,
    )

    def tag(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "g": pa.array(np.zeros(len(t), np.int64)),
                "n_edges": pa.array(
                    np.full(len(t), 1 if name == "e" else 0, np.int64)),
                "n_mutual": pa.array(
                    np.full(len(t), 1 if name == "m" else 0, np.int64)),
            })
        return fn

    u = edges.map_batches(tag("e"), batch_format="pyarrow").union(
        mutual.map_batches(tag("m"), batch_format="pyarrow"))
    out = partial_grouped_agg(
        u, ["g"], {"n_edges": ("n_edges", "sum"), "n_mutual": ("n_mutual", "sum")}
    )
    return out.map_batches(
        lambda t: t.drop_columns(["g"]), batch_format="pyarrow"
    )


E_MUTUALITY_SQL = f"""
WITH flat AS (
  SELECT vec_id,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(val AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT dim, max(abs(x)) AS amax FROM flat GROUP BY 1),
codes AS (
  SELECT f.vec_id, f.dim,
         CAST(greatest(-127, least(127,
              floor((f.x * 127) / (CASE WHEN s.amax = 0 THEN 1.0 ELSE s.amax END))))
              AS BIGINT) AS code
  FROM flat f JOIN s USING (dim)
  WHERE f.dim < {_MUT_DIMS}),
dots AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(sum(a.code * b.code) AS BIGINT) AS dot
  FROM codes a JOIN codes b USING (dim)
  WHERE a.vec_id <> b.vec_id
  GROUP BY 1, 2),
r AS (SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dot DESC, dst) AS rn
      FROM dots),
e AS (SELECT src, dst FROM r WHERE rn <= {_MUT_K})
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN m.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mutual
FROM e LEFT JOIN e m ON m.src = e.dst AND m.dst = e.src
"""


def q79_cusum_changepoint(sf_dir: str):
    """CHANGE-POINT detection by exact integer CUSUM — "where did this
    user's spend level shift?": with S the user's total purchase cents
    over n ordered purchases and P_k the prefix sum, the mean-centered
    cusum n*P_k - k*S is a pure integer whose extreme |value| marks
    the most likely level shift (the classic offline CUSUM statistic,
    scaled by n to avoid the rational mean).  Per user: the max
    |cusum|, its 1-based position k (ties -> smallest k), and n.
    One user exchange, one vectorized pass (lexsort + segmented
    cumsum), no floats anywhere."""
    from .relational import _with_part, hash_exchange_map

    ds = _pq(sf_dir, "events", ["event_id", "ts", "user_id", "value",
                                "event_type"]) \
        .filter(expr="event_type == 'purchase'")

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_purchases", pa.int64()),
         ("max_abs_cusum", pa.int64()), ("argmax_k", pa.int64())]
    )

    def cusum(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        if len(tbl) == 0:
            return out_schema.empty_table()
        u = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = tbl["ts"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = tbl["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = tbl["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(np.int64)
        order = np.lexsort((eid, t, u))
        u, cents = u[order], cents[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.append(starts, len(u)))
        n_rep = np.repeat(lens.astype(np.int64), lens)
        S_rep = np.repeat(np.add.reduceat(cents, starts), lens)
        csum = np.cumsum(cents)
        base = np.repeat(np.r_[0, csum[starts[1:] - 1]]
                         if len(starts) > 1 else np.array([0], np.int64), lens)
        prefix = csum - base
        k = np.arange(len(u)) - np.repeat(starts, lens) + 1
        d = np.abs(n_rep * prefix - k * S_rep)
        # per-user argmax with smallest-k tiebreak: maximize (d, -k)
        # packed as d * (n+1) - k?  d can be ~1e13 * n — overflow risk.
        # Instead: segmented max of d, then first position hitting it.
        dmax = np.repeat(np.maximum.reduceat(d, starts), lens)
        hit = d == dmax
        # first hit per segment: positions where hit, keep min k
        kk = np.where(hit, k, np.iinfo(np.int64).max)
        argk = np.minimum.reduceat(kk, starts)
        return pa.Table.from_pydict(
            {
                "user_id": u[starts],
                "n_purchases": lens.astype(np.int64),
                "max_abs_cusum": np.maximum.reduceat(d, starts),
                "argmax_k": argk,
            },
            schema=out_schema,
        )

    out = hash_exchange_map(ds, "user_id", 16, cusum)
    if out is None:
        return (
            _with_part(ds, "user_id", 16)
            .groupby("__part")
            .map_groups(cusum, batch_format="pyarrow")
        )
    return out


Q79_SQL = """
WITH p AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS k
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id, k,
         sum(cents) OVER (PARTITION BY user_id ORDER BY k) AS prefix,
         sum(cents) OVER (PARTITION BY user_id) AS s,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM p),
d AS (SELECT user_id, k, n, abs(n * prefix - k * s) AS dabs FROM c),
m AS (SELECT user_id, max(n) AS n_purchases, max(dabs) AS mx
      FROM d GROUP BY user_id)
SELECT d.user_id,
       CAST(m.n_purchases AS BIGINT) AS n_purchases,
       CAST(m.mx AS BIGINT) AS max_abs_cusum,
       CAST(min(d.k) AS BIGINT) AS argmax_k
FROM d JOIN m ON m.user_id = d.user_id AND d.dabs = m.mx
GROUP BY d.user_id, m.n_purchases, m.mx
"""


_LINK_BAL_BAND = 1000  # acctbal cents band width for the score


def q80_record_linkage(sf_dir: str):
    """RECORD-LINKAGE scoring (Fellegi–Sunter shape, integer weights):
    candidate customer-supplier pairs BLOCKED on nationkey (the
    blocking join every entity-resolution pass starts with), each
    scored by exact field agreements — same acctbal band (+3), name
    suffix-digit match (+2), positive-balance agreement (+1) — and
    rolled up into the per-nation score histogram that calibrates the
    match threshold.  One hash exchange on the small blocking key;
    comparisons fully vectorized per partition."""
    from .relational import hash_join, partial_grouped_agg

    cust_schema = pa.schema(
        [("nationkey", pa.int64()), ("c_bal_cents", pa.int64()),
         ("c_dig", pa.int64())]
    )
    supp_schema = pa.schema(
        [("nationkey", pa.int64()), ("s_bal_cents", pa.int64()),
         ("s_dig", pa.int64())]
    )

    def prep(bal_col, name_col, key_col, schema, prefix):
        def fn(t: pa.Table) -> pa.Table:
            v = t[bal_col].to_numpy(zero_copy_only=False)
            cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)) \
                .astype(np.int64)
            # last digit of the trailing number in the name
            digs = pc.utf8_slice_codeunits(
                t[name_col].combine_chunks(), start=-1, stop=99)
            dig = pc.if_else(
                pc.match_substring_regex(digs, "^[0-9]$"),
                pc.cast(digs, pa.int64(), safe=False),
                pa.scalar(-1, pa.int64()),
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_pydict(
                {"nationkey": t[key_col].combine_chunks().cast(pa.int64()),
                 f"{prefix}_bal_cents": cents, f"{prefix}_dig": dig},
                schema=schema,
            )
        return fn

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey",
                                    "c_acctbal"]).map_batches(
        prep("c_acctbal", "c_name", "c_nationkey", cust_schema, "c"),
        batch_format="pyarrow",
    )
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey",
                                    "s_acctbal"]).map_batches(
        prep("s_acctbal", "s_name", "s_nationkey", supp_schema, "s"),
        batch_format="pyarrow",
    )
    pairs = hash_join(
        cust, supp, on="nationkey",
        l_schema=cust_schema, r_schema=supp_schema, num_partitions=8,
    )

    def score(t: pa.Table) -> pa.Table:
        cb = t["c_bal_cents"].to_numpy(zero_copy_only=False)
        sb = t["s_bal_cents"].to_numpy(zero_copy_only=False)
        cd = t["c_dig"].to_numpy(zero_copy_only=False)
        sd = t["s_dig"].to_numpy(zero_copy_only=False)
        B = _LINK_BAL_BAND
        sc = (
            3 * (np.floor_divide(cb, B) == np.floor_divide(sb, B)).astype(np.int64)
            + 2 * ((cd >= 0) & (cd == sd)).astype(np.int64)
            + ((cb > 0) == (sb > 0)).astype(np.int64)
        )
        return pa.table(
            {"nationkey": t["nationkey"].combine_chunks(), "score": pa.array(sc)}
        )

    return partial_grouped_agg(
        pairs.map_batches(score, batch_format="pyarrow"),
        ["nationkey", "score"],
        {"n_pairs": (None, "count")},
    )


Q80_SQL = f"""
WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cb,
                  CASE WHEN regexp_matches(right(c_name, 1), '^[0-9]$')
                       THEN CAST(right(c_name, 1) AS BIGINT) ELSE -1 END AS cd
           FROM customer),
s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
             CAST(round(s_acctbal * 100) AS BIGINT) AS sb,
             CASE WHEN regexp_matches(right(s_name, 1), '^[0-9]$')
                  THEN CAST(right(s_name, 1) AS BIGINT) ELSE -1 END AS sd
      FROM supplier),
p AS (SELECT c.nationkey,
             3 * CASE WHEN floor(CAST(cb AS DOUBLE) / {_LINK_BAL_BAND})
                           = floor(CAST(sb AS DOUBLE) / {_LINK_BAL_BAND})
                      THEN 1 ELSE 0 END
             + 2 * CASE WHEN cd >= 0 AND cd = sd THEN 1 ELSE 0 END
             + CASE WHEN (cb > 0) = (sb > 0) THEN 1 ELSE 0 END AS score
      FROM c JOIN s USING (nationkey))
SELECT nationkey, CAST(score AS BIGINT) AS score,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM p GROUP BY 1, 2
"""


def q81_ship_lag_hist(sf_dir: str):
    """Fact-to-fact DATE-LAG histogram — the fulfilment-latency
    distribution (order date -> line-item ship date): one hash join
    on orderkey ships only the two date columns, the lag lands in
    integer day buckets of 7, and a combiner-pushdown rollup counts
    lines per (priority, lag week) — the SLA heat-map a logistics
    dashboard draws.  Joined columns pruned at the read; no sort."""
    from .relational import hash_join, partial_grouped_agg

    li_schema = pa.schema([("okey", pa.int64()), ("ship_us", pa.int64())])
    o_schema = pa.schema(
        [("okey", pa.int64()), ("odate_us", pa.int64()),
         ("prio", pa.string())]
    )

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: pa.Table.from_pydict(
            {"okey": t["l_orderkey"].combine_chunks().cast(pa.int64()),
             "ship_us": t["l_shipdate"].combine_chunks().cast(pa.int64())},
            schema=li_schema,
        ),
        batch_format="pyarrow",
    )
    od = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                                "o_orderpriority"]).map_batches(
        lambda t: pa.Table.from_pydict(
            {"okey": t["o_orderkey"].combine_chunks().cast(pa.int64()),
             "odate_us": t["o_orderdate"].combine_chunks().cast(pa.int64()),
             "prio": t["o_orderpriority"].combine_chunks()},
            schema=o_schema,
        ),
        batch_format="pyarrow",
    )
    j = hash_join(li, od, on="okey", l_schema=li_schema, r_schema=o_schema,
                  num_partitions=16)

    day_us = 86_400_000_000

    def bucket(t: pa.Table) -> pa.Table:
        lag_days = (
            t["ship_us"].to_numpy(zero_copy_only=False)
            - t["odate_us"].to_numpy(zero_copy_only=False)
        ) // day_us
        return pa.table(
            {"prio": t["prio"].combine_chunks(),
             "lag_week": pa.array(np.floor_divide(lag_days, 7))}
        )

    return partial_grouped_agg(
        j.map_batches(bucket, batch_format="pyarrow"),
        ["prio", "lag_week"],
        {"n_lines": (None, "count")},
    )


Q81_SQL = """
SELECT o.o_orderpriority AS prio,
       CAST(floor(floor(CAST(epoch_us(l.l_shipdate)
                             - epoch_us(o.o_orderdate) AS DOUBLE)
                        / 86400000000) / 7) AS BIGINT) AS lag_week,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


def m_bytes_audit(sf_dir: str):
    """STORAGE-LAYOUT audit over the opaque binary column — bytes per
    (w, h, lossy) shape class, with the byte counts MEASURED zero-copy
    from the Arrow buffer offsets (pc.binary_length), never computed
    from metadata: the oracle recomputes every container size from
    the generator formula (8-byte header + w*h*3 payload) and the
    partition size ladder, so the gate proves stored payloads are
    exactly the size the codec contract promises.  Shuffle-free map +
    one tiny rollup."""
    from .images.synth import synth_image_table
    from .relational import partial_grouped_agg

    ds = synth_image_table(2000, partition_rows=250, size_ladder=_ASPECT_LADDER)

    def audit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "w": t["w"].combine_chunks().cast(pa.int64()),
                "h": t["h"].combine_chunks().cast(pa.int64()),
                "lossy": pc.equal(t["fmt"], "rgb5").combine_chunks(),
                "nbytes": pc.binary_length(t["bytes"].combine_chunks())
                .cast(pa.int64()),
            }
        )

    return partial_grouped_agg(
        ds.map_batches(audit, batch_format="pyarrow"),
        ["w", "h", "lossy"],
        {"n_images": (None, "count"), "total_bytes": ("nbytes", "sum")},
    )


M_BYTES_SQL = """
WITH imgsz AS (
  SELECT range AS i,
         CASE (range // 250) % 4 WHEN 0 THEN 24 WHEN 1 THEN 16
                                 WHEN 2 THEN 20 ELSE 32 END AS w,
         CASE (range // 250) % 4 WHEN 0 THEN 16 WHEN 1 THEN 24
                                 WHEN 2 THEN 20 ELSE 12 END AS h
  FROM range(0, 2000))
SELECT CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       (i % 4 = 0) AS lossy,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(8 + w * h * 3) AS BIGINT) AS total_bytes
FROM imgsz GROUP BY 1, 2, 3
"""


def e_norm_hist(sf_dir: str):
    """Embedding NORM histogram over int8 quantization codes — the
    index-health audit (degenerate norm mass flags collapsed or
    unnormalized embeddings): squared code norm sum(code^2) per
    vector is exact int64; bucketed by //10000 and counted.
    Shuffle-free per-batch quantize + one tiny rollup; the oracle
    replays the floor-quantization and the same integer buckets."""
    from .relational import partial_grouped_agg
    from .vectors import _absmax_scale_ref, _quantize_matrix, vec_matrix

    import ray as _ray

    emb = _pq(sf_dir, "embeddings", ["embedding"])
    scale_ref = _absmax_scale_ref(emb, "embedding")

    def hist(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"bucket": pa.array([], pa.int64())})
        amax = _ray.get(scale_ref)
        codes = _quantize_matrix(vec_matrix(t["embedding"]), amax, 127)
        n2 = (codes * codes).sum(axis=1)
        return pa.table({"bucket": pa.array(n2 // 10000)})

    return partial_grouped_agg(
        emb.map_batches(hist, batch_format="pyarrow"),
        ["bucket"],
        {"n_vecs": (None, "count")},
    )


E_NORM_HIST_SQL = """
WITH flat AS (
  SELECT vec_id,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(val AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT dim, max(abs(x)) AS amax FROM flat GROUP BY 1),
codes AS (
  SELECT f.vec_id,
         CAST(greatest(-127, least(127,
              floor((f.x * 127) / (CASE WHEN s.amax = 0 THEN 1.0 ELSE s.amax END))))
              AS BIGINT) AS code
  FROM flat f JOIN s USING (dim)),
n2 AS (SELECT vec_id, sum(code * code) AS norm2 FROM codes GROUP BY 1)
SELECT CAST(norm2 // 10000 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM n2 GROUP BY 1
"""


def m_phash_bit_balance(sf_dir: str):
    """pHash BIT-BALANCE audit — per-bit ones count across the image
    corpus (a bit stuck near 0 or n carries no entropy and silently
    halves LSH band selectivity): each batch unpacks the 64 hash bits
    with vectorized shifts and bincount-style column sums, one 64-row
    rollup.  Runs over the LCG-hash image corpus (part_images — the
    synth table's block-mean phash is float-path, deliberately not
    SQL-twinned); the oracle replays the bit extraction in HUGEINT
    SQL with an explicit two's-complement lift for negative int64
    hashes."""
    from .relational import partial_grouped_agg

    ds = part_images(sf_dir)

    out_schema = pa.schema([("bit", pa.int64()), ("n_ones", pa.int64())])

    def bits(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        ones = ((ph[:, None] >> shifts[None, :]) & np.uint64(1)) \
            .sum(axis=0).astype(np.int64)
        return pa.Table.from_pydict(
            {"bit": np.arange(64, dtype=np.int64), "n_ones": ones},
            schema=out_schema,
        )

    return partial_grouped_agg(
        ds.map_batches(bits, batch_format="pyarrow"),
        ["bit"],
        {"n_ones": ("n_ones", "sum")},
    )


M_BIT_BALANCE_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
ph AS (
  SELECT CASE WHEN phash < 0
              THEN CAST(phash AS HUGEINT) + 18446744073709551616
              ELSE CAST(phash AS HUGEINT) END AS u
  FROM img),
b AS (SELECT CAST(range AS BIGINT) AS bit,
             CAST(power(2, range) AS HUGEINT) AS p
      FROM range(0, 64))
SELECT b.bit,
       CAST(sum(CASE WHEN (ph.u // b.p) % 2 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ones
FROM ph, b GROUP BY b.bit
"""


def e_pq_distortion(sf_dir: str):
    """PQ DISTORTION audit — total squared quantization error per
    subspace (the reconstruction-quality number that decides codebook
    size before an index ships): vectors.pq_assign emit_distance=True
    carries each assignment's exact int64 squared distance out of the
    same broadcast-codebook kernel, and one combiner-pushdown rollup
    gives (subspace, n_vecs, total_dist2).  The oracle rebuilds the
    whole index in SQL (the e_pq_codes chain) and sums min distances."""
    from .relational import partial_grouped_agg
    from .vectors import pq_assign

    emb = _pq(sf_dir, "embeddings", ["vec_id", "embedding"])
    assigned = pq_assign(emb, "vec_id", "embedding", emit_distance=True)
    return partial_grouped_agg(
        assigned.select_columns(["subspace", "dist2"]),
        ["subspace"],
        {"n_vecs": (None, "count"), "total_dist2": ("dist2", "sum")},
    )


E_PQ_DISTORTION_SQL = """
WITH flat AS (
  SELECT vec_id,
         CAST(ord - 1 AS BIGINT) AS dim,
         CAST(val AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings)),
s AS (SELECT dim, max(abs(x)) AS amax FROM flat GROUP BY 1),
codes AS (
  SELECT f.vec_id, f.dim,
         CAST(greatest(-127, least(127,
              floor((f.x * 127) / (CASE WHEN s.amax = 0 THEN 1.0 ELSE s.amax END))))
              AS BIGINT) AS code
  FROM flat f JOIN s USING (dim)),
cb_ids AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT DISTINCT vec_id FROM codes ORDER BY vec_id LIMIT 16)),
cb AS (SELECT i.cid, c.dim, c.code AS cbcode
       FROM cb_ids i JOIN codes c USING (vec_id)),
dist AS (
  SELECT c.vec_id, c.dim // 8 AS subspace, b.cid,
         sum((c.code - b.cbcode) * (c.code - b.cbcode)) AS d2
  FROM codes c JOIN cb b ON b.dim = c.dim
  GROUP BY 1, 2, 3),
best AS (SELECT vec_id, subspace, min(d2) AS d2min
         FROM dist GROUP BY 1, 2)
SELECT CAST(subspace AS BIGINT) AS subspace,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(d2min) AS BIGINT) AS total_dist2
FROM best GROUP BY 1
"""


def q83_mutual_match(sf_dir: str):
    """MUTUAL BEST-MATCH bipartite pairing — the greedy core of an
    assignment/reconciliation pass: within each nation, every customer
    names its closest supplier by |acctbal| cents distance (ties to
    the smaller suppkey), every supplier names its closest customer,
    and a pair counts only when both choices agree (the stable
    "mutual nearest neighbor" rule dedup and entity-matching use to
    avoid chains).  Shape: one nation-blocked hash join, BOTH argmins
    as packed-key combiner-pushdown mins (diff << 20 | key — no
    row_number shuffle), one supplier-keyed join to test agreement,
    a 25-row rollup."""
    from .relational import hash_join, partial_grouped_agg

    c_schema = pa.schema(
        [("nationkey", pa.int64()), ("custkey", pa.int64()),
         ("c_cents", pa.int64())]
    )
    s_schema = pa.schema(
        [("nationkey", pa.int64()), ("suppkey", pa.int64()),
         ("s_cents", pa.int64())]
    )

    def prep(nation_in, key_in, bal_in, key_out, cents_out, schema):
        def fn(t: pa.Table) -> pa.Table:
            v = t[bal_in].to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {
                    "nationkey": t[nation_in].combine_chunks()
                    .cast(pa.int64()),
                    key_out: t[key_in].combine_chunks().cast(pa.int64()),
                    cents_out: (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5))
                    .astype(np.int64),
                },
                schema=schema,
            )
        return fn

    cust = _pq(sf_dir, "customer",
               ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        prep("c_nationkey", "c_custkey", "c_acctbal", "custkey", "c_cents",
             c_schema),
        batch_format="pyarrow",
    )
    supp = _pq(sf_dir, "supplier",
               ["s_suppkey", "s_nationkey", "s_acctbal"]).map_batches(
        prep("s_nationkey", "s_suppkey", "s_acctbal", "suppkey", "s_cents",
             s_schema),
        batch_format="pyarrow",
    )
    # NOT materialized: pairs feeds only the packed projection below
    # (pp is the stream both argmins consume — it alone is pinned)
    pairs = hash_join(cust, supp, on="nationkey",
                      l_schema=c_schema, r_schema=s_schema,
                      num_partitions=8)

    PK = 1 << 20

    def packed(t: pa.Table) -> pa.Table:
        cc = t["c_cents"].to_numpy(zero_copy_only=False)
        sc = t["s_cents"].to_numpy(zero_copy_only=False)
        ck = t["custkey"].to_numpy(zero_copy_only=False)
        sk = t["suppkey"].to_numpy(zero_copy_only=False)
        diff = np.abs(cc - sc)
        if len(diff) and (diff.max() >= (1 << 42) or ck.max() >= PK
                          or sk.max() >= PK):
            raise ValueError("pack range exceeded")
        return pa.table(
            {
                "nationkey": t["nationkey"].combine_chunks(),
                "custkey": pa.array(ck),
                "suppkey": pa.array(sk),
                "pack_s": pa.array(diff * PK + sk),
                "pack_c": pa.array(diff * PK + ck),
            }
        )

    pp = pairs.map_batches(packed, batch_format="pyarrow").materialize()
    best_c = partial_grouped_agg(
        pp.select_columns(["nationkey", "custkey", "pack_s"]),
        ["nationkey", "custkey"], {"pack_s": ("pack_s", "min")},
    )
    best_s = partial_grouped_agg(
        pp.select_columns(["suppkey", "pack_c"]),
        ["suppkey"], {"pack_c": ("pack_c", "min")},
    )

    bc_schema = pa.schema(
        [("nationkey", pa.int64()), ("custkey", pa.int64()),
         ("suppkey", pa.int64())]
    )
    bs_schema = pa.schema(
        [("suppkey", pa.int64()), ("best_cust", pa.int64())]
    )

    j = hash_join(
        best_c.map_batches(
            lambda t: pa.Table.from_pydict(
                {"nationkey": t["nationkey"].combine_chunks(),
                 "custkey": t["custkey"].combine_chunks(),
                 "suppkey": pc.bit_wise_and(
                     t["pack_s"].combine_chunks(), PK - 1)},
                schema=bc_schema),
            batch_format="pyarrow"),
        best_s.map_batches(
            lambda t: pa.Table.from_pydict(
                {"suppkey": t["suppkey"].combine_chunks(),
                 "best_cust": pc.bit_wise_and(
                     t["pack_c"].combine_chunks(), PK - 1)},
                schema=bs_schema),
            batch_format="pyarrow"),
        on="suppkey", l_schema=bc_schema, r_schema=bs_schema,
        num_partitions=8,
    )

    def mutual(t: pa.Table) -> pa.Table:
        m = (t["custkey"].to_numpy(zero_copy_only=False)
             == t["best_cust"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {"nationkey": t["nationkey"].combine_chunks(),
             "n_custs": pa.array(np.ones(len(t), np.int64)),
             "n_mutual": pa.array(m)}
        )

    return partial_grouped_agg(
        j.map_batches(mutual, batch_format="pyarrow"),
        ["nationkey"],
        {"n_custs": ("n_custs", "sum"), "n_mutual": ("n_mutual", "sum")},
    )


Q83_SQL = """
WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                  c_custkey AS custkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cc
           FROM customer),
s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
             s_suppkey AS suppkey,
             CAST(round(s_acctbal * 100) AS BIGINT) AS sc
      FROM supplier),
p AS (SELECT c.nationkey, c.custkey, s.suppkey, abs(cc - sc) AS diff
      FROM c JOIN s USING (nationkey)),
bc AS (SELECT nationkey, custkey, suppkey
       FROM (SELECT *, row_number() OVER (PARTITION BY custkey
                                          ORDER BY diff, suppkey) AS rn
             FROM p) WHERE rn = 1),
bs AS (SELECT suppkey, custkey AS best_cust
       FROM (SELECT *, row_number() OVER (PARTITION BY suppkey
                                          ORDER BY diff, custkey) AS rn
             FROM p) WHERE rn = 1)
SELECT bc.nationkey, CAST(count(*) AS BIGINT) AS n_custs,
       CAST(sum(CASE WHEN bs.best_cust = bc.custkey THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mutual
FROM bc JOIN bs USING (suppkey)
GROUP BY bc.nationkey
"""


def q84_tv_distance(sf_dir: str):
    """Categorical DISTRIBUTION-DRIFT gate — exact scaled total
    variation between two user cohorts' event-type mixes: with cohort
    sizes n0, n1 and per-type counts c0, c1, TV*2*n0*n1 =
    sum_t |n1*c0(t) - n0*c1(t)| is a pure integer (the cross-
    multiplied |p0 - p1| — no rational division), the A/B-health
    check every event pipeline runs.  One (type, cohort) combiner
    rollup, fold over the tiny aggregate."""
    from .relational import partial_grouped_agg

    ev = _pq(sf_dir, "events", ["user_id", "event_type"])

    def halves(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"].combine_chunks(),
             "half": pc.bit_wise_and(
                 t["user_id"].combine_chunks().cast(pa.int64()), 1)}
        )

    agg = partial_grouped_agg(
        ev.map_batches(halves, batch_format="pyarrow"),
        ["event_type", "half"],
        {"n": (None, "count")},
    )

    out_schema = pa.schema(
        [("n0", pa.int64()), ("n1", pa.int64()), ("n_types", pa.int64()),
         ("tv_cross", pa.int64())]
    )

    def fold(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        half = t["half"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = int(codes.max()) + 1 if len(codes) else 0
        c0 = np.bincount(codes[half == 0], weights=n[half == 0],
                         minlength=k).astype(np.int64)
        c1 = np.bincount(codes[half == 1], weights=n[half == 1],
                         minlength=k).astype(np.int64)
        n0, n1 = int(c0.sum()), int(c1.sum())
        tv = int(np.abs(n1 * c0 - n0 * c1).sum())
        return pa.Table.from_pydict(
            {"n0": [n0], "n1": [n1], "n_types": [k], "tv_cross": [tv]},
            schema=out_schema,
        )

    return agg.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


Q84_SQL = """
WITH h AS (SELECT event_type, user_id % 2 AS half FROM events),
c AS (SELECT event_type, half, CAST(count(*) AS BIGINT) AS n
      FROM h GROUP BY 1, 2),
w AS (SELECT event_type,
             COALESCE(sum(CASE WHEN half = 0 THEN n END), 0) AS c0,
             COALESCE(sum(CASE WHEN half = 1 THEN n END), 0) AS c1
      FROM c GROUP BY 1),
tot AS (SELECT sum(c0) AS n0, sum(c1) AS n1 FROM w)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(abs(n1 * c0 - n0 * c1)) AS BIGINT) AS tv_cross
FROM w, tot GROUP BY n0, n1
"""


def t_template_detect(sf_dir: str):
    """Boilerplate TEMPLATE detection — documents sharing the same
    first-8-token prefix (the generated-page / form-letter signal a
    curation pass removes before near-dup hashing even runs): prefix
    assembled batch-locally from the lowercased token stream (one
    Arrow regex split, rank-masked gather, ListArray + binary_join —
    no per-doc Python), one string-keyed combiner rollup, groups with
    >= 2 docs survive.  Output (prefix, n_docs, min_doc)."""
    from .relational import partial_grouped_agg

    docs = _pq(sf_dir, "documents", ["doc_id", "text"])

    pref_schema = pa.schema(
        [("prefix", pa.string()), ("doc_id", pa.int64())]
    )

    def prefixes(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(ne))
        parent = parent[ne]
        n = len(t)
        counts = np.bincount(parent, minlength=n)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        rank = np.arange(len(parent)) - np.repeat(starts, counts)
        keep = rank < 8
        kept = np.minimum(counts, 8)
        offsets = np.r_[0, np.cumsum(kept)].astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.filter(pa.array(keep))
        )
        return pa.Table.from_pydict(
            {"prefix": pc.binary_join(la, " "),
             "doc_id": t["doc_id"].combine_chunks().cast(pa.int64())},
            schema=pref_schema,
        )

    agg = partial_grouped_agg(
        docs.map_batches(prefixes, batch_format="pyarrow"),
        ["prefix"],
        {"n_docs": (None, "count"), "min_doc": ("doc_id", "min")},
    )
    return agg.filter(expr="n_docs >= 2")


T_TEMPLATE_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws
  FROM documents),
pref AS (SELECT doc_id, array_to_string(ws[1:8], ' ') AS prefix
         FROM words)
SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM pref GROUP BY prefix HAVING count(*) >= 2
"""


def g_cell_gini(sf_dir: str):
    """Spatial CONCENTRATION (Gini numerator) of imagery across
    occupied tiles, exact: sum_i sum_j |x_i - x_j| over the K occupied
    cells collapses to the sorted-prefix identity 2*sum(i*x_(i)) -
    (K+1)*S — one combiner-pushdown histogram, then the closed form
    over the tiny sorted aggregate (tie order among equal counts
    cannot change the sum).  With Moran's I (clustering) this is the
    inequality half of a coverage audit; integers end to end."""
    from .relational import partial_grouped_agg

    def encode(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * 256).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * 256).astype(np.int64)
        return pa.Table.from_pydict(
            {"key": x * 256 + y}, schema=pa.schema([("key", pa.int64())])
        )

    counts = partial_grouped_agg(
        part_images(sf_dir).map_batches(encode, batch_format="pyarrow"),
        ["key"],
        {"n": (None, "count")},
    )

    out_schema = pa.schema(
        [("n_cells", pa.int64()), ("sum_x", pa.int64()),
         ("gini_num", pa.int64())]
    )

    def fold(t: pa.Table) -> pa.Table:
        x = np.sort(t["n"].to_numpy(zero_copy_only=False).astype(np.int64))
        K, S = len(x), int(x.sum())
        i = np.arange(1, K + 1, dtype=np.int64)
        g = int(2 * (i * x).sum() - (K + 1) * S)
        return pa.Table.from_pydict(
            {"n_cells": [K], "sum_x": [S], "gini_num": [g]},
            schema=out_schema,
        )

    return counts.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


G_GINI_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
c AS (
  SELECT CAST(floor((lon + 180) / 360 * 256) AS BIGINT) * 256
         + CAST(floor((lat + 90) / 180 * 256) AS BIGINT) AS key,
         CAST(count(*) AS BIGINT) AS n
  FROM img GROUP BY 1),
r AS (SELECT n, row_number() OVER (ORDER BY n) AS i FROM c),
a AS (SELECT count(*) AS k, sum(n) AS s, sum(i * n) AS ixn FROM r)
SELECT CAST(k AS BIGINT) AS n_cells, CAST(s AS BIGINT) AS sum_x,
       CAST(2 * ixn - (k + 1) * s AS BIGINT) AS gini_num
FROM a
"""


def q85_user_lifespan(sf_dir: str):
    """User LIFESPAN distribution — weeks between first and last
    event per user, bucketed (the retention-shape histogram behind
    cohort LTV models): per-user min/max via one combiner-pushdown
    rollup, integer 7-day buckets, a second tiny rollup.  Raw events
    reduce to one row per user before anything shuffles twice."""
    from .relational import partial_grouped_agg

    ev = _pq(sf_dir, "events", ["user_id", "ts"])

    def slim(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.int64())
        return pa.table(
            {"user_id": t["user_id"].combine_chunks().cast(pa.int64()),
             "t_us": ts}
        )

    spans = partial_grouped_agg(
        ev.map_batches(slim, batch_format="pyarrow"),
        ["user_id"],
        {"t_min": ("t_us", "min"), "t_max": ("t_us", "max")},
    )

    week_us = 7 * 86_400_000_000

    def bucket(t: pa.Table) -> pa.Table:
        span = (t["t_max"].to_numpy(zero_copy_only=False)
                - t["t_min"].to_numpy(zero_copy_only=False))
        return pa.table({"lifespan_weeks": pa.array(span // week_us)})

    return partial_grouped_agg(
        spans.map_batches(bucket, batch_format="pyarrow"),
        ["lifespan_weeks"],
        {"n_users": (None, "count")},
    )


Q85_SQL = """
WITH s AS (SELECT user_id,
                  epoch_us(max(ts)) - epoch_us(min(ts)) AS span
           FROM events GROUP BY 1)
SELECT span // 604800000000 AS lifespan_weeks,
       CAST(count(*) AS BIGINT) AS n_users
FROM s GROUP BY 1
"""


def g_cell_erosion(sf_dir: str):
    """Morphological EROSION over the occupied-tile set — interior
    cells (all four rook neighbors occupied) vs frontier cells, the
    coverage-boundary detector that tells a mapping pipeline where
    imagery runs out: each occupied cell scatters its four neighbor
    positions, one combiner-pushdown count gives per-position
    occupied-neighbor totals, one hash join back classifies each
    occupied cell by its own neighbor count (0-4).  Sparse end to
    end — the 256x256 grid never densifies; raw points shuffle only
    as the tiny per-cell histogram."""
    from .relational import hash_join, partial_grouped_agg

    def encode(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        x = np.floor((lon + 180.0) / 360.0 * 256).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * 256).astype(np.int64)
        return pa.Table.from_pydict(
            {"key": x * 256 + y}, schema=pa.schema([("key", pa.int64())])
        )

    counts = partial_grouped_agg(
        part_images(sf_dir).map_batches(encode, batch_format="pyarrow"),
        ["key"],
        {"n": (None, "count")},
    ).materialize()

    nb_schema = pa.schema([("key", pa.int64())])

    def scatter(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        x, y = key // 256, key % 256
        outs = []
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = x + dx, y + dy
            m = (nx >= 0) & (nx < 256) & (ny >= 0) & (ny < 256)
            outs.append((nx * 256 + ny)[m])
        return pa.Table.from_pydict(
            {"key": np.concatenate(outs)}, schema=nb_schema
        )

    nb_counts = partial_grouped_agg(
        counts.map_batches(scatter, batch_format="pyarrow"),
        ["key"],
        {"nb": (None, "count")},
    )

    cnt_schema = pa.schema([("key", pa.int64()), ("n", pa.int64())])
    nbc_schema = pa.schema([("key", pa.int64()), ("nb", pa.int64())])

    j = hash_join(
        counts, nb_counts, on="key",
        l_schema=cnt_schema, r_schema=nbc_schema,
        how="left_outer", num_partitions=4,
    )

    def classify(t: pa.Table) -> pa.Table:
        nb = pc.fill_null(t["nb"], 0).cast(pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table(
            {"n_neighbors": pa.array(nb),
             "n_cells": pa.array(np.ones(len(nb), np.int64)),
             "interior": pa.array(nb == 4)}
        )

    return partial_grouped_agg(
        j.map_batches(classify, batch_format="pyarrow"),
        ["n_neighbors", "interior"],
        {"n_cells": ("n_cells", "sum")},
    )


G_EROSION_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
c AS (
  SELECT CAST(floor((lon + 180) / 360 * 256) AS BIGINT) AS x,
         CAST(floor((lat + 90) / 180 * 256) AS BIGINT) AS y
  FROM img GROUP BY 1, 2),
o AS (SELECT dx, dy FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1))
      AS t(dx, dy)),
nbc AS (
  SELECT a.x, a.y, count(b.x) AS nb
  FROM c a LEFT JOIN (c b JOIN o
    ON TRUE) ON b.x + o.dx = a.x AND b.y + o.dy = a.y
  GROUP BY a.x, a.y)
SELECT CAST(nb AS BIGINT) AS n_neighbors, (nb = 4) AS interior,
       CAST(count(*) AS BIGINT) AS n_cells
FROM nbc GROUP BY 1, 2
"""


def t_length_gini(sf_dir: str):
    """Corpus LENGTH-INEQUALITY (Gini numerator) over document sizes —
    the balance diagnostic before token-budget packing (a handful of
    giant docs dominating sum-of-chars skews every shard): exact
    sum_i sum_j |len_i - len_j| via the sorted-prefix identity
    2*sum(i*x_(i)) - (N+1)*S.  Values here are per-DOC lengths (not a
    histogram), so the combiner stage ships one slim int per doc and
    the closed form runs over the sorted aggregate."""
    ds = _pq(sf_dir, "documents", ["n_chars"])

    out_schema = pa.schema(
        [("n_docs", pa.int64()), ("sum_chars", pa.int64()),
         ("gini_num", pa.int64())]
    )

    def fold(t: pa.Table) -> pa.Table:
        x = np.sort(t["n_chars"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        n, s = len(x), int(x.sum())
        i = np.arange(1, n + 1, dtype=np.int64)
        g = int(2 * (i * x).sum() - (n + 1) * s)
        return pa.Table.from_pydict(
            {"n_docs": [n], "sum_chars": [s], "gini_num": [g]},
            schema=out_schema,
        )

    return ds.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


T_LENGTH_GINI_SQL = """
WITH r AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS i
           FROM documents),
a AS (SELECT count(*) AS n, sum(n_chars) AS s, sum(i * n_chars) AS ixn
      FROM r)
SELECT CAST(n AS BIGINT) AS n_docs, CAST(s AS BIGINT) AS sum_chars,
       CAST(2 * ixn - (n + 1) * s AS BIGINT) AS gini_num
FROM a
"""


def q86_revenue_concentration(sf_dir: str):
    """Revenue WHALE-CONCENTRATION — the exact share of total order
    revenue held by the top decile of customers (ceil(N/10) biggest
    spenders, ties to the smaller custkey): the risk metric behind
    "how exposed are we to our largest accounts".  Per-customer
    revenue via one combiner-pushdown rollup; the decile cut runs
    over the tiny per-customer aggregate; output is the exact integer
    pair (top_cents, total_cents) plus counts — no percentage
    floats."""
    from .relational import partial_grouped_agg

    ords = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"custkey": t["o_custkey"].combine_chunks().cast(pa.int64()),
             "cents": pa.array(
                 (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5))
                 .astype(np.int64))}
        )

    per_cust = partial_grouped_agg(
        ords.map_batches(cents, batch_format="pyarrow"),
        ["custkey"],
        {"rev": ("cents", "sum")},
    )

    out_schema = pa.schema(
        [("n_customers", pa.int64()), ("n_top", pa.int64()),
         ("top_cents", pa.int64()), ("total_cents", pa.int64())]
    )

    def fold(t: pa.Table) -> pa.Table:
        rev = t["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(rev)
        k = -(-n // 10)  # ceil(n/10)
        order = np.lexsort((ck, -rev))[:k]
        return pa.Table.from_pydict(
            {"n_customers": [n], "n_top": [int(k)],
             "top_cents": [int(rev[order].sum())],
             "total_cents": [int(rev.sum())]},
            schema=out_schema,
        )

    return per_cust.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    )


Q86_SQL = """
WITH pc AS (SELECT o_custkey AS custkey,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1),
r AS (SELECT rev, row_number() OVER (ORDER BY rev DESC, custkey) AS i,
             count(*) OVER () AS n
      FROM pc)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       CAST((max(n) + 9) // 10 AS BIGINT) AS n_top,
       CAST(sum(CASE WHEN i <= (n + 9) // 10 THEN rev ELSE 0 END)
            AS BIGINT) AS top_cents,
       CAST(sum(rev) AS BIGINT) AS total_cents
FROM r
"""


def e_dim_stats(sf_dir: str):
    """Per-DIMENSION embedding statistics — the feature-health table
    (a dead or exploding dimension flags a bad encoder export):
    count, sum and sum-of-squares of the 1e-6-tick floor-quantized
    values per dimension, exact int64 — variance and mean are
    recoverable as rationals downstream without any float having
    touched the aggregate.  Long-form reduceat partials, one 64-row
    rollup; raw vectors never shuffle."""
    from .relational import partial_grouped_agg
    from .vectors import vec_matrix

    emb = _pq(sf_dir, "embeddings", ["embedding"])

    part_schema = pa.schema(
        [("dim", pa.int64()), ("n", pa.int64()), ("s", pa.int64()),
         ("s2", pa.int64())]
    )

    def partials(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        M = vec_matrix(t["embedding"]).astype(np.float64)
        q = np.floor(M * 1_000_000).astype(np.int64)
        d = q.shape[1]
        return pa.Table.from_pydict(
            {"dim": np.arange(d, dtype=np.int64),
             "n": np.full(d, q.shape[0], np.int64),
             "s": q.sum(axis=0),
             "s2": (q * q).sum(axis=0)},
            schema=part_schema,
        )

    return partial_grouped_agg(
        emb.map_batches(partials, batch_format="pyarrow"),
        ["dim"],
        {"n": ("n", "sum"), "s": ("s", "sum"), "s2": ("s2", "sum")},
    )


E_DIM_STATS_SQL = """
WITH flat AS (
  SELECT CAST(ord - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM (SELECT unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS ord FROM embeddings))
SELECT dim, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS s,
       CAST(sum(q * q) AS BIGINT) AS s2
FROM flat GROUP BY dim
"""


_SALT_CAP = 16  # target max rows per (cell, salt) shard


def g_salt_plan(sf_dir: str):
    """SKEW SALT-PLAN — the planning half of salted-shuffle execution
    (the north rule's "ways/relations spanning cells handled via
    explicit salted-skew repartitioning"): from the tile histogram,
    every cell whose row count exceeds the shard cap gets an explicit
    integer salt factor ceil(n / cap), i.e. how many shards its key
    must split into so no reduce task exceeds the cap.  This is the
    exact table `shuffled_pip_join`'s salt path consumes; emitting it
    as a query makes the skew decision itself auditable.  One
    combiner-pushdown histogram + a vectorized ceil-div filter."""
    from .relational import partial_grouped_agg

    def encode(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        # coarse 64-grid so hot cells actually exceed the cap
        x = np.floor((lon + 180.0) / 360.0 * 64).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * 64).astype(np.int64)
        return pa.Table.from_pydict(
            {"key": x * 64 + y}, schema=pa.schema([("key", pa.int64())])
        )

    counts = partial_grouped_agg(
        part_images(sf_dir).map_batches(encode, batch_format="pyarrow"),
        ["key"],
        {"n": (None, "count")},
    )

    out_schema = pa.schema(
        [("key", pa.int64()), ("n", pa.int64()), ("salt", pa.int64())]
    )

    def plan(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        hot = n > _SALT_CAP
        return pa.Table.from_pydict(
            {"key": t["key"].to_numpy(zero_copy_only=False)[hot],
             "n": n[hot],
             "salt": -(-n[hot] // _SALT_CAP)},
            schema=out_schema,
        )

    return counts.map_batches(plan, batch_format="pyarrow")


G_SALT_PLAN_SQL = f"""
WITH img AS ({_PART_IMG_SQL}),
c AS (
  SELECT CAST(floor((lon + 180) / 360 * 64) AS BIGINT) * 64
         + CAST(floor((lat + 90) / 180 * 64) AS BIGINT) AS key,
         CAST(count(*) AS BIGINT) AS n
  FROM img GROUP BY 1)
SELECT key, n,
       CAST((n + {_SALT_CAP} - 1) // {_SALT_CAP} AS BIGINT) AS salt
FROM c WHERE n > {_SALT_CAP}
"""


def t_cross_source_dup(sf_dir: str):
    """CROSS-SOURCE template-overlap matrix — how many distinct
    first-8-token templates each pair of sources shares (the
    provenance-overlap table that decides which feed to drop before
    dedup even runs; verbatim cross-source copies are rarer than
    shared boilerplate, so the template key is the one that fires):
    distinct (source, prefix) pairs batch-locally (the
    t_template_detect assembly), ONE prefix-keyed hash exchange
    co-locates every source carrying a template, the partition kernel
    enumerates each template's source pairs (vectorized triu over the
    tiny per-template source set, string-ranked so a < b matches
    SQL), a pair rollup finishes.  Routing hashes only co-locate;
    pairing groups by the prefix STRING, so collisions cannot
    conflate templates."""
    from .relational import empty_dataset, hash_exchange_map, partial_grouped_agg
    from .text.analysis import _hash63_batch

    docs = _pq(sf_dir, "documents", ["source", "text"])

    slim_schema = pa.schema(
        [("source", pa.string()), ("text", pa.string()),
         ("text_key", pa.int64())]
    )

    def slim(t: pa.Table) -> pa.Table:
        src = t["source"]
        txt = t["text"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        toks = pc.split_pattern_regex(pc.utf8_lower(txt), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(ne))
        parent = parent[ne]
        n = len(t)
        counts = np.bincount(parent, minlength=n)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        rk = np.arange(len(parent)) - np.repeat(starts, counts)
        keep = rk < 8
        kept = np.minimum(counts, 8)
        offsets = np.r_[0, np.cumsum(kept)].astype(np.int32)
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat.filter(pa.array(keep)))
        prefix = pc.binary_join(la, " ")
        s_codes = src.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        p_enc = prefix.dictionary_encode()
        p_codes = p_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        _, idx = np.unique(
            s_codes * np.int64(len(p_enc.dictionary)) + p_codes,
            return_index=True)
        sel = pa.array(np.sort(idx), pa.int64())
        pp = prefix.take(sel)
        return pa.Table.from_pydict(
            {"source": src.take(sel), "text": pp,
             "text_key": _hash63_batch(pp).astype(np.int64)},
            schema=slim_schema,
        )

    rows = docs.map_batches(slim, batch_format="pyarrow")

    pair_schema = pa.schema(
        [("source_a", pa.string()), ("source_b", pa.string())]
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        if len(tbl) == 0:
            return pair_schema.empty_table()
        txt = tbl["text"]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t_codes = txt.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        src = tbl["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        s_enc = src.dictionary_encode()
        s_codes = s_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # rank dict codes by STRING order so triu pairs satisfy a < b
        # exactly as the SQL twin's a.source < b.source does
        dict_order = np.argsort(np.asarray(s_enc.dictionary, dtype=object))
        rank = np.empty(len(dict_order), np.int64)
        rank[dict_order] = np.arange(len(dict_order))
        order = np.lexsort((rank[s_codes], t_codes))
        # the slim stage dedupes (source, prefix) only per BATCH — drop
        # cross-batch repeats here so triu can't emit (s, s) pairs
        tc0 = t_codes[order]
        rk0 = rank[s_codes][order]
        uniq = np.r_[True, (tc0[1:] != tc0[:-1]) | (rk0[1:] != rk0[:-1])]
        order = order[uniq]
        tc = t_codes[order]
        starts = np.flatnonzero(np.r_[True, tc[1:] != tc[:-1]])
        lens = np.diff(np.append(starts, len(tc)))
        aa, bb = [], []
        src_sorted = src.take(pa.array(order, pa.int64()))
        for s, ln in zip(starts, lens):  # per DISTINCT text; ln tiny
            if ln < 2:
                continue
            ii, jj = np.triu_indices(int(ln), k=1)
            aa.append(s + ii)
            bb.append(s + jj)
        if not aa:
            return pair_schema.empty_table()
        ai = pa.array(np.concatenate(aa), pa.int64())
        bi = pa.array(np.concatenate(bb), pa.int64())
        return pa.Table.from_pydict(
            {"source_a": src_sorted.take(ai),
             "source_b": src_sorted.take(bi)},
            schema=pair_schema,
        )

    pairs = hash_exchange_map(rows, "text_key", 16, kernel)
    if pairs is None:
        return empty_dataset(
            pa.schema([("source_a", pa.string()), ("source_b", pa.string()),
                       ("n_shared_texts", pa.int64())])
        )
    return partial_grouped_agg(
        pairs, ["source_a", "source_b"],
        {"n_shared_texts": (None, "count")},
    )


T_CROSS_SOURCE_SQL = r"""
WITH words AS (
  SELECT source, regexp_extract_all(lower(text), '\S+') AS ws
  FROM documents),
dt AS (SELECT DISTINCT source, array_to_string(ws[1:8], ' ') AS p
       FROM words),
pr AS (SELECT a.source AS source_a, b.source AS source_b
       FROM dt a JOIN dt b ON a.p = b.p AND a.source < b.source)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared_texts
FROM pr GROUP BY 1, 2
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q2_segment_revenue": q2_segment_revenue,
    "q3_topk_orders": q3_topk_orders,
    "q4_events_daily": q4_events_daily,
    "q5_distinct_users": q5_distinct_users,
    "q6_user_sessions": q6_user_sessions,
    "q7_asof_prev_event": q7_asof_prev_event,
    "q8_nation_revenue": q8_nation_revenue,
    "q9_order_window_counts": q9_order_window_counts,
    "q10_top_events_per_user": q10_top_events_per_user,
    "q11_sliding_hour_stats": q11_sliding_hour_stats,
    "q12_customer_running_total": q12_customer_running_total,
    "q13_customers_without_urgent_orders": q13_customers_without_urgent_orders,
    "q14_rollup_pricing": q14_rollup_pricing,
    "q15_customers_with_urgent_orders": q15_customers_with_urgent_orders,
    "q16_pivot_events_daily": q16_pivot_events_daily,
    "q17_value_stats": q17_value_stats,
    "q18_hll_user_registers": q18_hll_user_registers,
    "q19_order_rank_windows": q19_order_rank_windows,
    "q20_priciest_order_per_customer": q20_priciest_order_per_customer,
    "q21_rolling_revenue": q21_rolling_revenue,
    "q22_user_event_paths": q22_user_event_paths,
    "q23_urgent_lineitem_counts": q23_urgent_lineitem_counts,
    "q24_returning_users": q24_returning_users,
    "q25_order_date_distribution": q25_order_date_distribution,
    "q26_asof_banded_prev_event": q26_asof_banded_prev_event,
    "q27_customer_order_neighbors": q27_customer_order_neighbors,
    "q28_customer_order_fill": q28_customer_order_fill,
    "t_token_count": t_token_count,
    "t_quality_stats": t_quality_stats,
    "t_langid": t_langid,
    "t_fingerprint": t_fingerprint,
    "t_repetition": t_repetition,
    "t_token_quantiles": t_token_quantiles,
    "t_chars_quantiles_cont": t_chars_quantiles_cont,
    "t_exact_dedup": t_exact_dedup,
    "t_minhash_pairs": t_minhash_pairs,
    "t_jaccard_pairs": t_jaccard_pairs,
    "t_contamination": t_contamination,
    "t_dup_clusters": t_dup_clusters,
    "t_curation_pass": t_curation_pass,
    "t_snapshot_diff": t_snapshot_diff,
    "t_simhash": t_simhash,
    "t_tfidf_topk": t_tfidf_topk,
    "t_heavy_tokens": t_heavy_tokens,
    "t_vocab_coverage": t_vocab_coverage,
    "t_bigram_counts": t_bigram_counts,
    "t_hash_sample": t_hash_sample,
    "t_stratified_sample": t_stratified_sample,
    "t_weighted_sample": t_weighted_sample,
    "e_label_centroid": e_label_centroid,
    "e_knn_cosine": e_knn_cosine,
    "e_knn_ivf": e_knn_ivf,
    "e_neardup_pairs": e_neardup_pairs,
    "e_kmeans_sizes": e_kmeans_sizes,
    "g_cell_encode": g_cell_encode,
    "g_tile_counts": g_tile_counts,
    "g_knn_phash": g_knn_phash,
    "g_pip_join_osm": g_pip_join_osm,
    "g_pip_join_boxes": g_pip_join_boxes,
    "g_pip_anti": g_pip_anti,
    "g_cell_smooth": g_cell_smooth,
    "g_radius_join": g_radius_join,
    "g_nearest_site": g_nearest_site,
    "g_radius_geo": g_radius_geo,
    "g_cell_pyramid": g_cell_pyramid,
    "g_cell_compact": g_cell_compact,
    "g_cell_uncompact": g_cell_uncompact,
    "g_zorder_keys": g_zorder_keys,
    "g_rect_join": g_rect_join,
    "e_quantize_codes": e_quantize_codes,
    "osm_corpus_features": osm_corpus_features,
    "osm_corpus_simplify": osm_corpus_simplify,
    "osm_corpus_metrics": osm_corpus_metrics,
    "m_image_decode": m_image_decode,
    "m_psnr_verify": m_psnr_verify,
    "m_image_features": m_image_features,
    "m_caption_extract": m_caption_extract,
    "m_image_dedup": m_image_dedup,
    "m_image_curation": m_image_curation,
    "m_phash_clusters": m_phash_clusters,
    "t_redact": t_redact,
    "q29_user_mode_event": q29_user_mode_event,
    "g_knn_sites": g_knn_sites,
    "m_tile_phash_rollup": m_tile_phash_rollup,
    "q30_user_coverage": q30_user_coverage,
    "t_char_diversity": t_char_diversity,
    "g_convex_hull": g_convex_hull,
    "t_bm25_topk": t_bm25_topk,
    "q31_order_expectations": q31_order_expectations,
    "q32_full_outer_fill": q32_full_outer_fill,
    "q33_user_funnel": q33_user_funnel,
    "q34_event_value_tiles": q34_event_value_tiles,
    "q35_qty_disc_corr_parts": q35_qty_disc_corr_parts,
    "q36_retention_cohorts": q36_retention_cohorts,
    "q37_event_transitions": q37_event_transitions,
    "q38_pareto_orders": q38_pareto_orders,
    "q39_cms_user_registers": q39_cms_user_registers,
    "q40_group_checksum": q40_group_checksum,
    "m_tile_quota": m_tile_quota,
    "q41_user_hour_ohlc": q41_user_hour_ohlc,
    "t_fuzzy_name_pairs": t_fuzzy_name_pairs,
    "g_triangles": g_triangles,
    "g_pagerank": g_pagerank,
    "t_inverted_index": t_inverted_index,
    "e_int8_dot_topk": e_int8_dot_topk,
    "q42_value_mad": q42_value_mad,
    "q43_fk_orphans": q43_fk_orphans,
    "g_two_hop": g_two_hop,
    "q44_max_event_gap": q44_max_event_gap,
    "q45_cume_new_users": q45_cume_new_users,
    "m_image_pyramid": m_image_pyramid,
    "q46_brand_price_slope": q46_brand_price_slope,
    "q47_user_event_entropy": q47_user_event_entropy,
    "q48_event_trigrams": q48_event_trigrams,
    "q49_copurchase_pairs": q49_copurchase_pairs,
    "q50_daily_user_bitmap": q50_daily_user_bitmap,
    "m_tile_mosaic": m_tile_mosaic,
    "q51_sliding_hll_users": q51_sliding_hll_users,
    "q52_props_extract": q52_props_extract,
    "m_image_augment": m_image_augment,
    "q53_unpivot_events": q53_unpivot_events,
    "t_token_percentile": t_token_percentile,
    "t_simhash_pairs": t_simhash_pairs,
    "q54_order_outliers": q54_order_outliers,
    "q55_user_status_periods": q55_user_status_periods,
    "q56_part_graph_kcore": q56_part_graph_kcore,
    "t_gopher_filter": t_gopher_filter,
    "m_phash_near_pairs": m_phash_near_pairs,
    "t_substring_dup": t_substring_dup,
    "t_norm_dedup": t_norm_dedup,
    "t_token_budget_pack": t_token_budget_pack,
    "q57_price_band_join": q57_price_band_join,
    "q58_bitmap_retention": q58_bitmap_retention,
    "g_cell_bbox_agg": g_cell_bbox_agg,
    "q59_grid_resample_ffill": q59_grid_resample_ffill,
    "t_seq_pack": t_seq_pack,
    "g_grid_cluster": g_grid_cluster,
    "m_aspect_bucket": m_aspect_bucket,
    "e_rp_bits": e_rp_bits,
    "q60_decile_lift": q60_decile_lift,
    "g_hilbert_keys": g_hilbert_keys,
    "q61_user_drawdown": q61_user_drawdown,
    "g_seg_cells": g_seg_cells,
    "q62_max_concurrency": q62_max_concurrency,
    "g_spatial_dedup": g_spatial_dedup,
    "m_train_manifest": m_train_manifest,
    "t_winnow_fps": t_winnow_fps,
    "t_containment_pairs": t_containment_pairs,
    "e_pq_codes": e_pq_codes,
    "q63_event_debounce": q63_event_debounce,
    "q64_session_overlap_pairs": q64_session_overlap_pairs,
    "q65_column_profile": q65_column_profile,
    "q66_benford_audit": q66_benford_audit,
    "m_align_check": m_align_check,
    "q67_winsorized_totals": q67_winsorized_totals,
    "q68_key_skew_audit": q68_key_skew_audit,
    "m_pixel_hist": m_pixel_hist,
    "q69_watermark_late": q69_watermark_late,
    "q70_click_attribution": q70_click_attribution,
    "q71_traffic_shaper": q71_traffic_shaper,
    "q72_bom_rollup": q72_bom_rollup,
    "q73_grouping_sets": q73_grouping_sets,
    "t_rarity_score": t_rarity_score,
    "e_mrl_recall": e_mrl_recall,
    "g_heading_octants": g_heading_octants,
    "q74_linear_interp": q74_linear_interp,
    "m_pattern_detect": m_pattern_detect,
    "g_bfs_hops": g_bfs_hops,
    "q75_temporal_anti": q75_temporal_anti,
    "t_lang_confusion": t_lang_confusion,
    "e_centroid_drift": e_centroid_drift,
    "q76_weighted_median": q76_weighted_median,
    "q77_interval_union": q77_interval_union,
    "t_ngram_novelty": t_ngram_novelty,
    "g_cell_moran": g_cell_moran,
    "m_tile_coverage_gap": m_tile_coverage_gap,
    "q78_decayed_value": q78_decayed_value,
    "e_knn_mutuality": e_knn_mutuality,
    "q79_cusum_changepoint": q79_cusum_changepoint,
    "q80_record_linkage": q80_record_linkage,
    "q81_ship_lag_hist": q81_ship_lag_hist,
    "m_bytes_audit": m_bytes_audit,
    "e_norm_hist": e_norm_hist,
    "m_phash_bit_balance": m_phash_bit_balance,
    "e_pq_distortion": e_pq_distortion,
    "q83_mutual_match": q83_mutual_match,
    "q84_tv_distance": q84_tv_distance,
    "t_template_detect": t_template_detect,
    "g_cell_gini": g_cell_gini,
    "q85_user_lifespan": q85_user_lifespan,
    "g_cell_erosion": g_cell_erosion,
    "t_length_gini": t_length_gini,
    "q86_revenue_concentration": q86_revenue_concentration,
    "e_dim_stats": e_dim_stats,
    "g_salt_plan": g_salt_plan,
    "t_cross_source_dup": t_cross_source_dup,
}

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "q2_segment_revenue": Q2_SQL,
    "q3_topk_orders": Q3_SQL,
    "q4_events_daily": Q4_SQL,
    "q5_distinct_users": Q5_SQL,
    "q6_user_sessions": Q6_SQL,
    "q7_asof_prev_event": Q7_SQL,
    "q8_nation_revenue": Q8_SQL,
    "q9_order_window_counts": Q9_SQL,
    "q10_top_events_per_user": Q10_SQL,
    "q11_sliding_hour_stats": Q11_SQL,
    "q12_customer_running_total": Q12_SQL,
    "q13_customers_without_urgent_orders": Q13_SQL,
    "q14_rollup_pricing": Q14_SQL,
    "q15_customers_with_urgent_orders": Q15_SQL,
    "q16_pivot_events_daily": Q16_SQL,
    "q17_value_stats": Q17_SQL,
    "q18_hll_user_registers": Q18_SQL,
    "q19_order_rank_windows": Q19_SQL,
    "q20_priciest_order_per_customer": Q20_SQL,
    "q21_rolling_revenue": Q21_SQL,
    "q22_user_event_paths": Q22_SQL,
    "q23_urgent_lineitem_counts": Q23_SQL,
    "q24_returning_users": Q24_SQL,
    "q25_order_date_distribution": Q25_SQL,
    "q26_asof_banded_prev_event": Q7_SQL,
    "q27_customer_order_neighbors": Q27_SQL,
    "q28_customer_order_fill": Q28_SQL,
    "t_token_count": T_TOKEN_SQL,
    "t_quality_stats": T_QUALITY_SQL,
    "t_langid": T_LANGID_SQL,
    "t_fingerprint": T_FINGERPRINT_SQL,
    "t_repetition": T_REPETITION_SQL,
    "t_token_quantiles": T_QUANTILES_SQL,
    "t_chars_quantiles_cont": T_CHARS_QUANTILES_SQL,
    "t_exact_dedup": T_DEDUP_SQL,
    "t_jaccard_pairs": T_JACCARD_SQL,
    "t_contamination": T_CONTAMINATION_SQL,
    "t_dup_clusters": T_DUP_CLUSTERS_SQL,
    "t_curation_pass": T_CURATION_SQL,
    "t_snapshot_diff": T_SNAPSHOT_SQL,
    "t_simhash": T_SIMHASH_SQL,
    "t_tfidf_topk": T_TFIDF_SQL,
    "t_heavy_tokens": T_HEAVY_TOKENS_SQL,
    "t_vocab_coverage": T_VOCAB_COVERAGE_SQL,
    "t_bigram_counts": T_BIGRAM_SQL,
    "t_hash_sample": T_HASH_SAMPLE_SQL,
    "t_stratified_sample": T_STRATIFIED_SAMPLE_SQL,
    "t_weighted_sample": T_WEIGHTED_SAMPLE_SQL,
    "e_label_centroid": E_LABEL_CENTROID_SQL,
    "osm_corpus_features": OSM_CORPUS_SQL,
    "osm_corpus_simplify": OSM_SIMPLIFY_SQL,
    "osm_corpus_metrics": OSM_METRICS_SQL,
    "e_knn_cosine": E_KNN_SQL,
    "e_knn_ivf": E_KNN_SQL,
    "e_neardup_pairs": E_NEARDUP_SQL,
    "g_cell_encode": G_CELL_SQL,
    "g_tile_counts": G_TILE_SQL,
    "g_knn_phash": G_KNN_SQL,
    "g_pip_join_boxes": G_PIP_BOXES_SQL,
    "g_pip_anti": G_PIP_ANTI_SQL,
    "g_cell_smooth": G_CELL_SMOOTH_SQL,
    "g_radius_join": G_RADIUS_SQL,
    "g_nearest_site": G_NEAREST_SQL,
    "g_radius_geo": G_RADIUS_GEO_SQL,
    "g_cell_pyramid": G_PYRAMID_SQL,
    "g_cell_compact": G_COMPACT_SQL,
    "g_cell_uncompact": G_UNCOMPACT_SQL,
    "g_zorder_keys": G_ZORDER_SQL,
    "g_rect_join": G_RECT_SQL,
    "e_quantize_codes": E_QUANTIZE_SQL,
    "m_image_decode": M_IMAGE_DECODE_SQL,
    "m_psnr_verify": M_PSNR_SQL,
    "m_image_features": M_IMAGE_FEATURES_SQL,
    "m_caption_extract": M_CAPTION_SQL,
    "m_image_dedup": M_IMAGE_DEDUP_SQL,
    "m_image_curation": M_IMAGE_CURATION_SQL,
    "t_redact": T_REDACT_SQL,
    "q29_user_mode_event": Q29_SQL,
    "g_knn_sites": G_KNN_SITES_SQL,
    "m_tile_phash_rollup": M_TILE_ROLLUP_SQL,
    "q30_user_coverage": Q30_SQL,
    "t_char_diversity": T_CHAR_DIVERSITY_SQL,
    "g_convex_hull": G_HULL_SQL,
    "t_bm25_topk": T_BM25_SQL,
    "q31_order_expectations": Q31_SQL,
    "q32_full_outer_fill": Q32_SQL,
    "q33_user_funnel": Q33_SQL,
    "q34_event_value_tiles": Q34_SQL,
    "q35_qty_disc_corr_parts": Q35_SQL,
    "q36_retention_cohorts": Q36_SQL,
    "q37_event_transitions": Q37_SQL,
    "q38_pareto_orders": Q38_SQL,
    "q39_cms_user_registers": Q39_SQL,
    "q40_group_checksum": Q40_SQL,
    "m_tile_quota": M_TILE_QUOTA_SQL,
    "q41_user_hour_ohlc": Q41_SQL,
    "t_fuzzy_name_pairs": T_FUZZY_SQL,
    "g_triangles": G_TRIANGLES_SQL,
    "g_pagerank": G_PAGERANK_SQL,
    "t_inverted_index": T_INVIDX_SQL,
    "e_int8_dot_topk": E_INT8_DOT_SQL,
    "q42_value_mad": Q42_SQL,
    "q43_fk_orphans": Q43_SQL,
    "g_two_hop": G_TWO_HOP_SQL,
    "q44_max_event_gap": Q44_SQL,
    "q45_cume_new_users": Q45_SQL,
    "m_image_pyramid": M_PYRAMID_SQL,
    "q46_brand_price_slope": Q46_SQL,
    "q47_user_event_entropy": Q47_SQL,
    "q48_event_trigrams": Q48_SQL,
    "q49_copurchase_pairs": Q49_SQL,
    "q50_daily_user_bitmap": Q50_SQL,
    "m_tile_mosaic": M_MOSAIC_SQL,
    "q51_sliding_hll_users": Q51_SQL,
    "q52_props_extract": Q52_SQL,
    "m_image_augment": M_AUGMENT_SQL,
    "q53_unpivot_events": Q53_SQL,
    "t_token_percentile": T_TOKEN_PCT_SQL,
    "t_simhash_pairs": T_SIMHASH_PAIRS_SQL,
    "q54_order_outliers": Q54_SQL,
    "q55_user_status_periods": Q55_SQL,
    "q56_part_graph_kcore": Q56_SQL,
    "t_gopher_filter": T_GOPHER_SQL,
    "m_phash_near_pairs": M_PHASH_PAIRS_SQL,
    "t_substring_dup": T_SUBSTR_DUP_SQL,
    "t_norm_dedup": T_NORM_DEDUP_SQL,
    "t_token_budget_pack": T_PACK_SQL,
    "q57_price_band_join": Q57_SQL,
    "q58_bitmap_retention": Q58_SQL,
    "g_cell_bbox_agg": G_BBOX_SQL,
    "q59_grid_resample_ffill": Q59_SQL,
    "t_seq_pack": T_SEQ_PACK_SQL,
    "g_grid_cluster": G_GRID_CLUSTER_SQL,
    "m_aspect_bucket": M_ASPECT_BUCKET_SQL,
    "e_rp_bits": E_RP_BITS_SQL,
    "q60_decile_lift": Q60_SQL,
    "g_hilbert_keys": G_HILBERT_SQL,
    "q61_user_drawdown": Q61_SQL,
    "g_seg_cells": G_SEG_CELLS_SQL,
    "q62_max_concurrency": Q62_SQL,
    "g_spatial_dedup": G_SPATIAL_DEDUP_SQL,
    "m_train_manifest": M_TRAIN_MANIFEST_SQL,
    "t_winnow_fps": T_WINNOW_SQL,
    "t_containment_pairs": T_CONTAIN_SQL,
    "e_pq_codes": E_PQ_SQL,
    "q63_event_debounce": Q63_SQL,
    "q64_session_overlap_pairs": Q64_SQL,
    "q65_column_profile": Q65_SQL,
    "q66_benford_audit": Q66_SQL,
    "m_align_check": M_ALIGN_SQL,
    "q67_winsorized_totals": Q67_SQL,
    "q68_key_skew_audit": Q68_SQL,
    "m_pixel_hist": M_PIXEL_HIST_SQL,
    "q69_watermark_late": Q69_SQL,
    "q70_click_attribution": Q70_SQL,
    "q71_traffic_shaper": Q71_SQL,
    "q72_bom_rollup": Q72_SQL,
    "q73_grouping_sets": Q73_SQL,
    "t_rarity_score": T_RARITY_SQL,
    "e_mrl_recall": E_MRL_SQL,
    "g_heading_octants": G_HEADING_SQL,
    "q74_linear_interp": Q74_SQL,
    "m_pattern_detect": M_PATTERN_SQL,
    "g_bfs_hops": G_BFS_SQL,
    "q75_temporal_anti": Q75_SQL,
    "t_lang_confusion": T_LANG_CONFUSION_SQL,
    "e_centroid_drift": E_DRIFT_SQL,
    "q76_weighted_median": Q76_SQL,
    "q77_interval_union": Q77_SQL,
    "t_ngram_novelty": T_NOVELTY_SQL,
    "g_cell_moran": G_MORAN_SQL,
    "m_tile_coverage_gap": M_COVERAGE_SQL,
    "q78_decayed_value": Q78_SQL,
    "e_knn_mutuality": E_MUTUALITY_SQL,
    "q79_cusum_changepoint": Q79_SQL,
    "q80_record_linkage": Q80_SQL,
    "q81_ship_lag_hist": Q81_SQL,
    "m_bytes_audit": M_BYTES_SQL,
    "e_norm_hist": E_NORM_HIST_SQL,
    "m_phash_bit_balance": M_BIT_BALANCE_SQL,
    "e_pq_distortion": E_PQ_DISTORTION_SQL,
    "q83_mutual_match": Q83_SQL,
    "q84_tv_distance": Q84_SQL,
    "t_template_detect": T_TEMPLATE_SQL,
    "g_cell_gini": G_GINI_SQL,
    "q85_user_lifespan": Q85_SQL,
    "g_cell_erosion": G_EROSION_SQL,
    "t_length_gini": T_LENGTH_GINI_SQL,
    "q86_revenue_concentration": Q86_SQL,
    "e_dim_stats": E_DIM_STATS_SQL,
    "g_salt_plan": G_SALT_PLAN_SQL,
    "t_cross_source_dup": T_CROSS_SOURCE_SQL,
}
