"""Hierarchical lon/lat cell index (H3/S2-style levels, from scratch —
neither library ships in this environment).

A cell at level L is one square of the 2^L x 2^L grid over
[-180,180] x [-90,90].  Cell ids pack (level, x, y) into an int64:

    id = (L << 58) | (x << 29) | y        with 0 <= L <= 24

which keeps ids comparable within a level, makes parent/child
arithmetic shifts, and stays positive in int64 (DuckDB-friendly so
oracle SQL can recompute ids with integer arithmetic).

All hot-path functions are numpy-vectorized; they run inside
``map_batches`` over zero-copy Arrow columns.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

MAX_LEVEL = 24
_LON_SPAN = 360.0
_LAT_SPAN = 180.0


def _grid_xy(lon: np.ndarray, lat: np.ndarray, level: int) -> Tuple[np.ndarray, np.ndarray]:
    n = 1 << level
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / _LON_SPAN * n).astype(np.int64)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / _LAT_SPAN * n).astype(np.int64)
    np.clip(x, 0, n - 1, out=x)
    np.clip(y, 0, n - 1, out=y)
    return x, y


def cell_id(lon, lat, level: int):
    """Vectorized point -> cell id (int64 ndarray)."""
    if level < 0 or level > MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    x, y = _grid_xy(np.atleast_1d(lon), np.atleast_1d(lat), level)
    return (np.int64(level) << np.int64(58)) | (x << np.int64(29)) | y


def point_cells(lon, lat, level: int) -> np.ndarray:
    return cell_id(lon, lat, level)


def cell_parts(cid: int) -> Tuple[int, int, int]:
    level = int(cid >> 58)
    x = int((cid >> 29) & ((1 << 29) - 1))
    y = int(cid & ((1 << 29) - 1))
    return level, x, y


def cell_bounds(cid: int) -> Tuple[float, float, float, float]:
    """(min_lon, min_lat, max_lon, max_lat) of a cell."""
    level, x, y = cell_parts(cid)
    n = 1 << level
    w = _LON_SPAN / n
    h = _LAT_SPAN / n
    return (-180.0 + x * w, -90.0 + y * h, -180.0 + (x + 1) * w, -90.0 + (y + 1) * h)


def cell_parent(cid: int, parent_level: int) -> int:
    level, x, y = cell_parts(cid)
    if parent_level > level:
        raise ValueError("parent_level above cell level")
    shift = level - parent_level
    return (parent_level << 58) | ((x >> shift) << 29) | (y >> shift)


def cover_bbox(min_lon, min_lat, max_lon, max_lat, level: int) -> np.ndarray:
    """All cell ids whose squares intersect the bbox (inclusive)."""
    x0, y0 = _grid_xy(np.array([min_lon]), np.array([min_lat]), level)
    x1, y1 = _grid_xy(np.array([max_lon]), np.array([max_lat]), level)
    xs = np.arange(x0[0], x1[0] + 1, dtype=np.int64)
    ys = np.arange(y0[0], y1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return (np.int64(level) << np.int64(58)) | (gx.ravel() << np.int64(29)) | gy.ravel()


def _rect_intersects_polygon(rect, poly) -> bool:
    """Exact rectangle x polygon intersection (vertex-in-rect,
    rect-corner-in-polygon, or edge crossing).  Vertex containment and
    corner-in-ring run vectorized; the scalar proper-intersection test
    only sees edges whose bbox overlaps the rectangle (an exact
    prefilter: two segments can only intersect inside both bboxes), so
    a 21k-vertex shell costs one numpy pass per cell, not 84k Python
    segment tests."""
    from ..geom.kernels import _segments_properly_intersect, points_in_ring_many

    rx0, ry0, rx1, ry1 = rect
    shell = np.asarray(poly[0], dtype=np.float64)
    sx, sy = shell[:-1, 0], shell[:-1, 1]
    if bool(np.any((sx >= rx0) & (sx <= rx1) & (sy >= ry0) & (sy <= ry1))):
        return True
    cx = np.array([rx0, rx0, rx1, rx1], dtype=np.float64)
    cy = np.array([ry0, ry1, ry0, ry1], dtype=np.float64)
    inside = np.asarray(points_in_ring_many(cx, cy, poly[0]), dtype=bool)
    if inside.any():
        for hole in poly[1:]:
            inside &= ~np.asarray(points_in_ring_many(cx, cy, hole), dtype=bool)
        if inside.any():
            return True
    # edge crossings: any polygon edge crossing any rect edge
    rect_edges = [
        ((rx0, ry0), (rx1, ry0)),
        ((rx1, ry0), (rx1, ry1)),
        ((rx1, ry1), (rx0, ry1)),
        ((rx0, ry1), (rx0, ry0)),
    ]
    for ring in poly:
        r = np.asarray(ring, dtype=np.float64)
        ax, ay = r[:-1, 0], r[:-1, 1]
        bx, by = r[1:, 0], r[1:, 1]
        cand = (
            (np.maximum(ax, bx) >= rx0)
            & (np.minimum(ax, bx) <= rx1)
            & (np.maximum(ay, by) >= ry0)
            & (np.minimum(ay, by) <= ry1)
        )
        for i in np.flatnonzero(cand):
            a = (ax[i], ay[i])
            b = (bx[i], by[i])
            for r0, r1 in rect_edges:
                if _segments_properly_intersect(a, b, r0, r1):
                    return True
    return False


def cover_polygon(poly: List[List[List[float]]], level: int) -> np.ndarray:
    """Cell ids whose squares intersect the polygon (shell minus holes
    at rectangle granularity: a cell fully inside a hole is excluded)."""
    from ..geom.kernels import ring_bbox

    bb = ring_bbox(poly[0])
    candidates = cover_bbox(bb[0], bb[1], bb[2], bb[3], level)
    out = [c for c in candidates.tolist() if _rect_intersects_polygon(cell_bounds(c), [poly[0]])]
    if len(poly) > 1:
        # exclude cells fully inside a hole: all 4 corners in the hole
        # and no hole edge crossing the cell
        def in_hole(c):
            rect = cell_bounds(c)
            corners = (
                (rect[0], rect[1]),
                (rect[0], rect[3]),
                (rect[2], rect[1]),
                (rect[2], rect[3]),
            )
            for hole in poly[1:]:
                if all(_point_in_ring(cx, cy, hole) for cx, cy in corners) and not _any_edge_crossing(rect, hole):
                    return True
            return False

        out = [c for c in out if not in_hole(c)]
    return np.asarray(out, dtype=np.int64)


def _point_in_ring(x, y, ring):
    from ..geom.kernels import point_in_ring

    return point_in_ring(x, y, ring)


def _any_edge_crossing(rect, ring) -> bool:
    from ..geom.kernels import _segments_properly_intersect

    rx0, ry0, rx1, ry1 = rect
    rect_edges = [
        ((rx0, ry0), (rx1, ry0)),
        ((rx1, ry0), (rx1, ry1)),
        ((rx1, ry1), (rx0, ry1)),
        ((rx0, ry1), (rx0, ry0)),
    ]
    # exact bbox prefilter (see _rect_intersects_polygon)
    r = np.asarray(ring, dtype=np.float64)
    ax, ay = r[:-1, 0], r[:-1, 1]
    bx, by = r[1:, 0], r[1:, 1]
    cand = (
        (np.maximum(ax, bx) >= rx0)
        & (np.minimum(ax, bx) <= rx1)
        & (np.maximum(ay, by) >= ry0)
        & (np.minimum(ay, by) <= ry1)
    )
    for i in np.flatnonzero(cand):
        for r0, r1 in rect_edges:
            if _segments_properly_intersect((ax[i], ay[i]), (bx[i], by[i]), r0, r1):
                return True
    return False
