"""Planar distance joins over integer micro-degree coordinates.

Two spatial-join primitives the tiling engine needs beyond PIP/kNN
(reference analog: osm2geojson has no distance ops — these extend the
graft surface the same way spatial/pip.py and spatial/knn.py do):

- :func:`radius_join` — every (query, point) pair with squared planar
  distance <= r^2 ("find all images within R of each probe center").
- :func:`nearest_join` — each point's nearest site from a small site
  set, ties broken by smaller site id ("assign each image to its
  closest POI / shard center").

Coordinates are int64 micro-degrees, so every distance is EXACT
integer arithmetic (d2 <= 2*(8e6)^2 ~ 1.3e14 fits int64 with room for
the encoded-key trick below) and a DuckDB oracle can replay the join
bit-for-bit — no floats ever enter the correctness gate.

Scale shape (10^12-point table):
- The small side (probe centers / sites) is broadcast ONCE — a tiny
  ndarray captured in the task closure (ships with the task spec, not
  per batch); a big site set would move to ray.put + worker_state like
  spatial/knn.py's query matrices.
- The point side streams: one ``map_batches`` pass, no shuffle, no
  materialization.  Per batch the kernel is pure numpy —
  a bbox prefilter per probe (radius_join) or an (n x s) squared
  distance matrix (nearest_join).
- Both-sides-large would cell-bucket each side at a level where the
  radius spans O(1) cells and co-partition (the shuffled_pip_join
  pattern in spatial/pip.py); documented, not needed for the
  broadcast-small-side queries here.

The nearest tie-break needs no sort: with s <= 64 sites, the pair
(d2, site_idx) packs into one int64 key ``d2 * 64 + site_idx`` whose
row-wise ``min`` IS the lexicographic argmin — one vectorized
reduction instead of argsort, and the SQL oracle can take the very
same ``min(...)`` and decode it.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

_RADIUS_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("point_id", pa.int64()), ("d2_udeg", pa.int64())]
)


def radius_join(
    points,
    query_ids: Sequence[int],
    qx: Sequence[int],
    qy: Sequence[int],
    radius: int,
    *,
    id_col: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
):
    """All (query, point) pairs within ``radius`` (planar, micro-deg).

    ``points``: Dataset with int64 columns (id_col, x_col, y_col).
    Returns a Dataset (query_id, point_id, d2_udeg), unordered.
    """
    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_x = np.asarray(qx, dtype=np.int64)
    q_y = np.asarray(qy, dtype=np.int64)
    r = int(radius)
    r2 = r * r

    def per_batch(t: pa.Table) -> pa.Table:
        pid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        out_q, out_p, out_d = [], [], []
        for j in range(len(q_ids)):
            # bbox prefilter: cheap axis tests drop the vast majority
            # before the multiply (the cell-prefilter idea, inline)
            m = (np.abs(x - q_x[j]) <= r) & (np.abs(y - q_y[j]) <= r)
            if not m.any():
                continue
            dx = x[m] - q_x[j]
            dy = y[m] - q_y[j]
            d2 = dx * dx + dy * dy
            inside = d2 <= r2
            if not inside.any():
                continue
            out_q.append(np.full(int(inside.sum()), q_ids[j], dtype=np.int64))
            out_p.append(pid[m][inside])
            out_d.append(d2[inside])
        if not out_q:
            return _RADIUS_SCHEMA.empty_table()
        return pa.Table.from_pydict(
            {
                "query_id": np.concatenate(out_q),
                "point_id": np.concatenate(out_p),
                "d2_udeg": np.concatenate(out_d),
            },
            schema=_RADIUS_SCHEMA,
        )

    return points.map_batches(per_batch, batch_format="pyarrow")


_NEAREST_SCHEMA = pa.schema(
    [("point_id", pa.int64()), ("site_id", pa.int64()), ("d2_udeg", pa.int64())]
)


def nearest_join(
    points,
    site_ids: Sequence[int],
    sx: Sequence[int],
    sy: Sequence[int],
    *,
    id_col: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
):
    """Each point -> its nearest site (ties to the smaller site INDEX,
    which equals the smaller site id when ``site_ids`` is sorted
    ascending — assert it so the SQL twin's decode agrees).

    Returns a Dataset (point_id, site_id, d2_udeg), one row per point.
    """
    s_ids = np.asarray(site_ids, dtype=np.int64)
    s_x = np.asarray(sx, dtype=np.int64)
    s_y = np.asarray(sy, dtype=np.int64)
    if len(s_ids) > 64:
        raise ValueError("nearest_join packs site index into 6 bits (<= 64 sites)")
    if not np.all(np.diff(s_ids) > 0):
        raise ValueError("site_ids must be strictly ascending for the tie-break")

    def per_batch(t: pa.Table) -> pa.Table:
        pid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        dx = x[:, None] - s_x[None, :]
        dy = y[:, None] - s_y[None, :]
        d2 = dx * dx + dy * dy  # (n, s) int64, max ~1.3e14
        key = d2 * np.int64(64) + np.arange(len(s_ids), dtype=np.int64)[None, :]
        kmin = key.min(axis=1)  # lexicographic (d2, site_idx) argmin
        idx = (kmin % 64).astype(np.int64)
        return pa.Table.from_pydict(
            {"point_id": pid, "site_id": s_ids[idx], "d2_udeg": kmin // 64},
            schema=_NEAREST_SCHEMA,
        )

    return points.map_batches(per_batch, batch_format="pyarrow")


_KNEAREST_SCHEMA = pa.schema(
    [("point_id", pa.int64()), ("nn_rank", pa.int64()),
     ("site_id", pa.int64()), ("d2_udeg", pa.int64())]
)


def knearest_join(
    points,
    site_ids: Sequence[int],
    sx: Sequence[int],
    sy: Sequence[int],
    *,
    k: int = 3,
    id_col: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
):
    """Each point -> its k NEAREST sites, ranked 1..k (the spatial
    k-nearest-join; ties break to the smaller site index, which equals
    the smaller site id for strictly-ascending ``site_ids`` — asserted,
    same contract as ``nearest_join``).

    Same packed integer key (d2 * 64 + site_idx) as ``nearest_join``,
    so the SQL twin is an exact cross-join + ``row_number() OVER
    (PARTITION BY point ORDER BY key)`` decode.  Per batch: ONE (n, s)
    int64 distance matrix, then ``argpartition`` to the k smallest
    packed keys per row and a tiny (n, k) sort — O(n*s) not
    O(n*s*log s).  Broadcast-small-side shape: the site table rides in
    the task closure (<= 64 sites by the 6-bit pack), points stream —
    no shuffle at any scale.  Output rows = k x points, slim int64
    columns only."""
    s_ids = np.asarray(site_ids, dtype=np.int64)
    s_x = np.asarray(sx, dtype=np.int64)
    s_y = np.asarray(sy, dtype=np.int64)
    if len(s_ids) > 64:
        raise ValueError("knearest_join packs site index into 6 bits (<= 64 sites)")
    if not np.all(np.diff(s_ids) > 0):
        raise ValueError("site_ids must be strictly ascending for the tie-break")
    kk = min(int(k), len(s_ids))
    if kk < 1:
        raise ValueError("k must be >= 1 with at least one site")

    def per_batch(t: pa.Table) -> pa.Table:
        pid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        n = len(pid)
        if n == 0:
            return _KNEAREST_SCHEMA.empty_table()
        dx = x[:, None] - s_x[None, :]
        dy = y[:, None] - s_y[None, :]
        key = (dx * dx + dy * dy) * np.int64(64) + np.arange(
            len(s_ids), dtype=np.int64
        )[None, :]
        if kk < key.shape[1]:
            part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
            sub = np.take_along_axis(key, part, axis=1)
            order = np.argsort(sub, axis=1)
            top_keys = np.take_along_axis(sub, order, axis=1)
        else:
            top_keys = np.sort(key, axis=1)
        return pa.Table.from_pydict(
            {
                "point_id": np.repeat(pid, kk),
                "nn_rank": np.tile(np.arange(1, kk + 1, dtype=np.int64), n),
                "site_id": s_ids[(top_keys % 64).ravel()],
                "d2_udeg": (top_keys // 64).ravel(),
            },
            schema=_KNEAREST_SCHEMA,
        )

    return points.map_batches(per_batch, batch_format="pyarrow")


_EARTH_R_M = 6_371_008.8  # IUGG mean radius


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized great-circle distance in meters (haversine).  The
    geodesic companion to the planar kernels above: planar micro-degree
    distance distorts with latitude (a degree of longitude shrinks by
    cos(lat)); use this metric when inputs span real latitudes.  Not
    driver-hash-gated (trig last-ulp differences across libm builds
    could flip a floor at a boundary) — pinned by pytest against
    reference values instead."""
    lon1, lat1, lon2, lat2 = (
        np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2)
    )
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2.0 * _EARTH_R_M * np.arcsin(np.sqrt(np.minimum(h, 1.0)))


_RADIUS_GEO_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("point_id", pa.int64()), ("dist_m", pa.float64())]
)


def radius_join_geo(
    points,
    query_ids: Sequence[int],
    q_lon: Sequence[float],
    q_lat: Sequence[float],
    radius_m: float,
    *,
    id_col: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
):
    """Geodesic within-distance join (meters): same broadcast/stream
    shape as :func:`radius_join`, with a latitude-aware bbox prefilter
    (lon window widened by 1/cos(lat), clamped at the poles) before the
    exact haversine test."""
    q_ids = np.asarray(query_ids, dtype=np.int64)
    qx = np.asarray(q_lon, dtype=np.float64)
    qy = np.asarray(q_lat, dtype=np.float64)
    r = float(radius_m)
    # degrees per meter: 1 deg lat ~ R*pi/180 meters
    deg_lat = r / (_EARTH_R_M * np.pi / 180.0)
    # The max in-radius |dlon| occurs at the POLEWARD edge of the
    # latitude band (smallest cos), not at the query latitude — use the
    # band's minimum cos so the bbox is a strict superset of the disk.
    band_lo = np.clip(qy - deg_lat, -90.0, 90.0)
    band_hi = np.clip(qy + deg_lat, -90.0, 90.0)
    coslat = np.minimum(np.cos(np.radians(band_lo)), np.cos(np.radians(band_hi)))
    # band containing a pole -> cos reaches 0 there: no lon prefilter
    pole = (band_lo <= -90.0 + 1e-12) | (band_hi >= 90.0 - 1e-12)
    coslat = np.maximum(np.where(pole, 0.0, coslat), 1e-6)
    deg_lon = np.minimum(deg_lat / coslat, 360.0)

    def per_batch(t: pa.Table) -> pa.Table:
        pid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        x = t[lon_col].to_numpy(zero_copy_only=False)
        y = t[lat_col].to_numpy(zero_copy_only=False)
        out_q, out_p, out_d = [], [], []
        for j in range(len(q_ids)):
            m = (np.abs(y - qy[j]) <= deg_lat) & (np.abs(x - qx[j]) <= deg_lon[j])
            if not m.any():
                continue
            d = haversine_m(x[m], y[m], qx[j], qy[j])
            inside = d <= r
            if not inside.any():
                continue
            out_q.append(np.full(int(inside.sum()), q_ids[j], dtype=np.int64))
            out_p.append(pid[m][inside])
            out_d.append(d[inside])
        if not out_q:
            return _RADIUS_GEO_SCHEMA.empty_table()
        return pa.Table.from_pydict(
            {
                "query_id": np.concatenate(out_q),
                "point_id": np.concatenate(out_p),
                "dist_m": np.concatenate(out_d),
            },
            schema=_RADIUS_GEO_SCHEMA,
        )

    return points.map_batches(per_batch, batch_format="pyarrow")
