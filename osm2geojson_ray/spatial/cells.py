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


def _orient_sign_vec(ax, ay, bx, by, cx, cy):
    """np.sign of the 2D cross product — the same float expression as
    kernels._segments_properly_intersect's orient2, vectorized."""
    return np.sign((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))


def _segments_cross_own_rect(ax, ay, bx, by, rx0, ry0, rx1, ry1) -> np.ndarray:
    """Pairwise proper-intersection of segment i against rect i's four
    edges (identical predicate to _segments_properly_intersect)."""
    out = np.zeros(len(ax), dtype=bool)
    for qx1, qy1, qx2, qy2 in (
        (rx0, ry0, rx1, ry0),
        (rx1, ry0, rx1, ry1),
        (rx1, ry1, rx0, ry1),
        (rx0, ry1, rx0, ry0),
    ):
        d1 = _orient_sign_vec(qx1, qy1, qx2, qy2, ax, ay)
        d2 = _orient_sign_vec(qx1, qy1, qx2, qy2, bx, by)
        d3 = _orient_sign_vec(ax, ay, bx, by, qx1, qy1)
        d4 = _orient_sign_vec(ax, ay, bx, by, qx2, qy2)
        out |= (
            (d1 != d2) & (d3 != d4)
            & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
        )
    return out


def _ring_cross_grid(
    ring, level: int, x0: int, x1: int, y0: int, y1: int,
    max_pairs: int = 1 << 21,
) -> np.ndarray:
    """(nx, ny) bool grid: cells properly crossed by any ring edge.
    Pairs (edge, cell) are enumerated per edge over its bbox'd cell
    span (expanded one cell so float rounding can't drop a boundary
    pair — the exact orientation predicate is authoritative), chunked
    so the pair arrays stay bounded."""
    n = 1 << level
    w = _LON_SPAN / n
    h = _LAT_SPAN / n
    nx, ny = x1 - x0 + 1, y1 - y0 + 1
    out = np.zeros((nx, ny), dtype=bool)
    r = np.asarray(ring, dtype=np.float64)
    ax, ay = r[:-1, 0], r[:-1, 1]
    bx, by = r[1:, 0], r[1:, 1]
    ne = len(ax)
    if ne == 0:
        return out
    exi0 = np.clip(np.floor((np.minimum(ax, bx) + 180.0) / w).astype(np.int64) - 1, x0, x1)
    exi1 = np.clip(np.floor((np.maximum(ax, bx) + 180.0) / w).astype(np.int64) + 1, x0, x1)
    eyi0 = np.clip(np.floor((np.minimum(ay, by) + 90.0) / h).astype(np.int64) - 1, y0, y1)
    eyi1 = np.clip(np.floor((np.maximum(ay, by) + 90.0) / h).astype(np.int64) + 1, y0, y1)
    counts = (exi1 - exi0 + 1) * (eyi1 - eyi0 + 1)
    bounds = np.concatenate(([0], np.cumsum(counts)))
    start = 0
    while start < ne:
        # widest edge slice whose pair count fits the budget
        stop = int(np.searchsorted(bounds, bounds[start] + max_pairs, side="right")) - 1
        stop = max(stop, start + 1)
        sl = slice(start, stop)
        c = counts[sl]
        total = int(c.sum())
        if total:
            nye = (eyi1[sl] - eyi0[sl] + 1)
            k = np.arange(total) - np.repeat(np.cumsum(c) - c, c)
            nye_r = np.repeat(nye, c)
            ex = np.repeat(exi0[sl], c) + k // nye_r
            ey = np.repeat(eyi0[sl], c) + k % nye_r
            rx0 = -180.0 + ex * w
            rx1 = -180.0 + (ex + 1) * w
            ry0 = -90.0 + ey * h
            ry1 = -90.0 + (ey + 1) * h
            cross = _segments_cross_own_rect(
                np.repeat(ax[sl], c), np.repeat(ay[sl], c),
                np.repeat(bx[sl], c), np.repeat(by[sl], c),
                rx0, ry0, rx1, ry1,
            )
            out[ex[cross] - x0, ey[cross] - y0] = True
        start = stop
    return out


def _vertices_in_cells(
    ring, level: int, x0: int, x1: int, y0: int, y1: int
) -> np.ndarray:
    """(nx, ny) bool grid: cells whose CLOSED rect contains a ring
    vertex.  Approximate grid index per vertex, then the exact >=/<=
    rect comparisons over the +-1 neighborhood (a vertex exactly on a
    shared cell edge belongs to both cells)."""
    n = 1 << level
    w = _LON_SPAN / n
    h = _LAT_SPAN / n
    out = np.zeros((x1 - x0 + 1, y1 - y0 + 1), dtype=bool)
    r = np.asarray(ring, dtype=np.float64)
    vx, vy = r[:-1, 0], r[:-1, 1]
    ix = np.floor((vx + 180.0) / w).astype(np.int64)
    iy = np.floor((vy + 90.0) / h).astype(np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            cx, cy = ix + dx, iy + dy
            m = (cx >= x0) & (cx <= x1) & (cy >= y0) & (cy <= y1)
            if not m.any():
                continue
            cxm, cym, vxm, vym = cx[m], cy[m], vx[m], vy[m]
            hit = (
                (vxm >= -180.0 + cxm * w) & (vxm <= -180.0 + (cxm + 1) * w)
                & (vym >= -90.0 + cym * h) & (vym <= -90.0 + (cym + 1) * h)
            )
            out[cxm[hit] - x0, cym[hit] - y0] = True
    return out


def _corner_grid_in_ring(
    ring, level: int, x0: int, x1: int, y0: int, y1: int
) -> np.ndarray:
    """(nx+1, ny+1) bool grid: CELL CORNERS inside the ring (even-odd,
    kernels.points_in_ring_many — identical float expressions to the
    scalar corner test, evaluated once per unique corner instead of 4x
    per cell)."""
    from ..geom.kernels import points_in_ring_many

    n = 1 << level
    w = _LON_SPAN / n
    h = _LAT_SPAN / n
    gx = -180.0 + np.arange(x0, x1 + 2, dtype=np.float64) * w
    gy = -90.0 + np.arange(y0, y1 + 2, dtype=np.float64) * h
    px = np.repeat(gx, len(gy))
    py = np.tile(gy, len(gx))
    ins = np.asarray(points_in_ring_many(px, py, ring), dtype=bool)
    return ins.reshape(len(gx), len(gy))


def cover_polygon(poly: List[List[List[float]]], level: int) -> np.ndarray:
    """Cell ids whose squares intersect the polygon (shell minus holes
    at rectangle granularity: a cell fully inside a hole is excluded).

    Fully vectorized across the candidate grid: shell-vertex-in-cell
    marks, a corner-grid even-odd pass, and chunked edge x cell-edge
    proper-intersection tests — the per-cell Python loop (one
    _rect_intersects_polygon call per candidate; 10^5 calls for a
    continent-sized cover) is gone.  The scalar predicate remains the
    test oracle (tests/test_spatial.py)."""
    from ..geom.kernels import ring_bbox

    bb = ring_bbox(poly[0])
    candidates = cover_bbox(bb[0], bb[1], bb[2], bb[3], level)
    x0g, y0g = _grid_xy(np.array([bb[0]]), np.array([bb[1]]), level)
    x1g, y1g = _grid_xy(np.array([bb[2]]), np.array([bb[3]]), level)
    x0, y0, x1, y1 = int(x0g[0]), int(y0g[0]), int(x1g[0]), int(y1g[0])
    shell = poly[0]
    corners = _corner_grid_in_ring(shell, level, x0, x1, y0, y1)
    keep = (
        _vertices_in_cells(shell, level, x0, x1, y0, y1)
        | corners[:-1, :-1] | corners[1:, :-1] | corners[:-1, 1:] | corners[1:, 1:]
        | _ring_cross_grid(shell, level, x0, x1, y0, y1)
    )
    for hole in poly[1:]:
        # exclude cells fully inside a hole: all 4 corners in the hole
        # and no hole edge crossing the cell
        cih = _corner_grid_in_ring(hole, level, x0, x1, y0, y1)
        all4 = cih[:-1, :-1] & cih[1:, :-1] & cih[:-1, 1:] & cih[1:, 1:]
        if all4.any():
            keep &= ~(all4 & ~_ring_cross_grid(hole, level, x0, x1, y0, y1))
    return candidates[keep.ravel()]


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


def compact_cells(cids: np.ndarray, *, stop_level: int = 0) -> np.ndarray:
    """H3/S2-style ``compact``: replace every COMPLETE set of 4 sibling
    cells by their parent, cascading upward, never promoting below
    ``stop_level``.  Input may mix levels; duplicate ids dedupe.  The
    contract matches H3 ``compactCells``: input is a DISJOINT cover
    (an ancestor and its descendant in the same set is out of
    contract — neither subsumes the other).  Output is the minimal
    covering set (sorted, distinct).  Pure numpy: one unique+isin pass
    per level, no Python per-cell loop."""
    cids = np.unique(np.asarray(cids, dtype=np.int64))
    if len(cids) == 0:
        return cids
    levels = (cids >> np.int64(58)).astype(np.int64)
    by_level = {int(l): cids[levels == l] for l in np.unique(levels)}
    out = []
    for lv in range(max(by_level), stop_level, -1):
        cur = by_level.pop(lv, None)
        if cur is None or len(cur) == 0:
            continue
        x = (cur >> np.int64(29)) & np.int64((1 << 29) - 1)
        y = cur & np.int64((1 << 29) - 1)
        parents = (np.int64(lv - 1) << np.int64(58)) | ((x >> 1) << np.int64(29)) | (y >> 1)
        uniq, counts = np.unique(parents, return_counts=True)
        complete = uniq[counts == 4]
        out.append(cur[~np.isin(parents, complete)])
        if len(complete):
            prev = by_level.get(lv - 1)
            by_level[lv - 1] = (
                complete if prev is None else np.union1d(prev, complete)
            )
    for rest in by_level.values():
        out.append(rest)
    return np.sort(np.concatenate(out)) if out else cids[:0]


def uncompact_cells(cids: np.ndarray, level: int, *,
                    max_out: int = 64_000_000) -> np.ndarray:
    """Inverse of ``compact_cells``: expand every cell to ALL its
    descendants at ``level`` (cells already at ``level`` pass through).
    Raises if any input cell is finer than ``level``.  Vectorized per
    source level: each expansion is one broadcast add over a 4^d
    offset grid.

    ``max_out`` guards the 4^d fan-out (one level-0 cell uncompacted
    to level 24 is 2.8e14 ids): the total output size is computed up
    front from the level histogram and the call raises — loudly, never
    truncating — when it exceeds the bound.  Expand in level-windowed
    hops (or raise the bound) for genuinely huge covers."""
    cids = np.asarray(cids, dtype=np.int64)
    if len(cids) == 0:
        return cids
    levels = (cids >> np.int64(58)).astype(np.int64)
    if (levels > level).any():
        raise ValueError("uncompact target level above an input cell's level")
    n_out = int((4 ** (np.int64(level) - levels)).sum())
    if n_out > max_out:
        raise ValueError(
            f"uncompact_cells would emit {n_out} ids (> max_out={max_out})"
        )
    out = []
    for lv in np.unique(levels):
        cur = cids[levels == lv]
        shift = int(level - lv)
        n = 1 << shift
        x = ((cur >> np.int64(29)) & np.int64((1 << 29) - 1)) << np.int64(shift)
        y = (cur & np.int64((1 << 29) - 1)) << np.int64(shift)
        dx = np.repeat(np.arange(n, dtype=np.int64), n)
        dy = np.tile(np.arange(n, dtype=np.int64), n)
        cx = (x[:, None] + dx[None, :]).ravel()
        cy = (y[:, None] + dy[None, :]).ravel()
        out.append((np.int64(level) << np.int64(58)) | (cx << np.int64(29)) | cy)
    return np.sort(np.concatenate(out))


def compact_cell_set(ds, cell_col: str = "cell_id", *, anchor_level: int = 4,
                     num_partitions: int = 16):
    """Distributed compact of a cell-id Dataset column (ids need not be
    distinct): ONE hash exchange routes every cell by its ancestor at
    ``anchor_level``, which co-locates all cells that could ever merge
    at levels ABOVE the anchor (siblings share their coarse ancestor),
    so each partition compacts independently down to the anchor.  Cells
    that reach (or arrived at/below) the anchor level — at most one per
    anchor cell per partition, a globally tiny set — finish in a single
    final compact task.  Output: one ``cell_id`` column, the minimal
    covering set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..relational import dataset_from_table, empty_dataset, hash_exchange_map, union_all

    schema = pa.schema([("cell_id", pa.int64())])

    def split(t: pa.Table) -> pa.Table:
        c = t[cell_col].combine_chunks().to_numpy(zero_copy_only=False)
        lv = c >> np.int64(58)
        fine = lv > anchor_level
        x = (c >> np.int64(29)) & np.int64((1 << 29) - 1)
        y = c & np.int64((1 << 29) - 1)
        sh = (lv - anchor_level).clip(min=0)
        route = (
            (np.int64(anchor_level) << np.int64(58))
            | ((x >> sh) << np.int64(29))
            | (y >> sh)
        )
        return pa.Table.from_pydict(
            {"cell_id": c, "route": np.where(fine, route, c), "fine": fine},
            schema=pa.schema([("cell_id", pa.int64()), ("route", pa.int64()),
                              ("fine", pa.bool_())]),
        )

    keyed = ds.map_batches(split, batch_format="pyarrow")

    coarse_parts = []

    def local_compact(t: pa.Table) -> pa.Table:
        c = t["cell_id"].combine_chunks().to_numpy(zero_copy_only=False)
        fine = t["fine"].combine_chunks().to_numpy(zero_copy_only=False)
        compacted = compact_cells(c[fine], stop_level=anchor_level)
        lv = compacted >> np.int64(58)
        # anchor-level results may still merge with siblings from OTHER
        # partitions; ship them (plus pass-through coarse input) to the
        # tiny final stage, emit the rest as final
        coarse = np.concatenate([compacted[lv <= anchor_level], np.unique(c[~fine])])
        done = compacted[lv > anchor_level]
        return pa.Table.from_pydict(
            {"cell_id": np.concatenate([done, coarse]),
             "final": np.concatenate([np.ones(len(done), bool), np.zeros(len(coarse), bool)])},
            schema=pa.schema([("cell_id", pa.int64()), ("final", pa.bool_())]),
        )

    mixed = hash_exchange_map(keyed, "route", num_partitions, local_compact)
    if mixed is None:
        return empty_dataset(schema)

    def keep_final(t: pa.Table) -> pa.Table:
        return t.filter(t["final"]).select(["cell_id"])

    done_ds = mixed.map_batches(keep_final, batch_format="pyarrow")
    # the non-final residue is <= one cell per (anchor cell, partition) —
    # globally tiny by construction, so a driver-side finish is safe
    coarse = np.concatenate(
        [t.filter(pc.invert(t["final"].combine_chunks()))["cell_id"]
         .to_numpy(zero_copy_only=False)
         for t in mixed.iter_batches(batch_format="pyarrow")]
        or [np.empty(0, dtype=np.int64)]
    )
    top = compact_cells(coarse, stop_level=0)
    top_tbl = pa.Table.from_pydict({"cell_id": top}, schema=schema)
    return union_all([done_ds, dataset_from_table(top_tbl)], schema=schema)


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Interleave-ready spread of 16-bit values into even bit
    positions (classic Morton magic constants), vectorized int64."""
    v = v & np.int64(0xFFFF)
    v = (v | (v << np.int64(8))) & np.int64(0x00FF00FF)
    v = (v | (v << np.int64(4))) & np.int64(0x0F0F0F0F)
    v = (v | (v << np.int64(2))) & np.int64(0x33333333)
    v = (v | (v << np.int64(1))) & np.int64(0x55555555)
    return v


def zorder_key(lon, lat, level: int):
    """Vectorized point -> Morton / Z-order key at ``level`` (<= 16):
    grid coordinates bit-interleaved so numerically-close keys are
    spatially close — the storage sort key that makes range scans of a
    tile-sharded table touch contiguous row groups.  Pure shift/mask
    integer arithmetic over the same grid as ``cell_id``, so a SQL
    twin can replay it exactly."""
    if level < 0 or level > 16:
        raise ValueError("zorder_key supports levels 0..16")
    x, y = _grid_xy(np.atleast_1d(lon), np.atleast_1d(lat), level)
    return _spread_bits16(x) | (_spread_bits16(y) << np.int64(1))


def hilbert_key(lon, lat, level: int):
    """Vectorized point -> Hilbert-curve index at ``level`` (<= 16):
    the space-filling sort key with strictly better locality than
    Z-order (consecutive keys are ALWAYS grid-adjacent — no Morton
    jumps), the layout key of choice for range-scanned spatial shards.

    Classic xy2d bit walk (public-domain algorithm): per bit plane s,
    quadrant digit (3*rx) XOR ry accumulates s*s steps, then the
    subgrid is flip-rotated.  Pure integer arithmetic on the same
    floor grid as ``cell_id`` so an (unrolled, MATERIALIZED-CTE) SQL
    twin replays every step exactly."""
    if level < 0 or level > 16:
        raise ValueError("hilbert_key supports levels 0..16")
    x, y = _grid_xy(np.atleast_1d(lon), np.atleast_1d(lat), level)
    n = np.int64(1 << level)
    d = np.zeros_like(x)
    s = n >> np.int64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate/flip the quadrant so the sub-curve orients correctly;
        # the flip reflects in the FULL grid (n-1-x), keeping coords in
        # [0, n) — so the SQL twin's // and % never see negatives
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, n - 1 - x, x)
        y_f = np.where(flip, n - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def segment_cells_dda(sx0, sy0, sx1, sy1, *, steps: int = 256,
                      sub: int = 256, grid: int = 4096):
    """Vectorized DDA rasterization summary of line segments onto the
    ``grid``^2 cell raster — the vector-to-tile assignment step of a
    tiling engine (which tiles must re-render when a way changes).

    Endpoints are SUBCELL-scaled integers (coord * grid * sub), and the
    walk samples ``steps+1`` points per segment with exact integer
    midpoint interpolation px = (sx0*(K-t) + sx1*t) // K — floor-div on
    both engines, no float accumulation, so a SQL twin replays every
    sample bit-for-bit.  Sampling is exact full-supercover when the
    per-step movement stays under one cell (sub subcells); callers
    size ``steps`` to their expected maximum segment extent.

    Returns (n_cells, min_cell, max_cell): distinct-visited-cell count
    and the flat cell-key range per segment — all (n,) int64, computed
    with one row-wise sort (no Python loop)."""
    sx0 = np.asarray(sx0, dtype=np.int64)[:, None]
    sy0 = np.asarray(sy0, dtype=np.int64)[:, None]
    sx1 = np.asarray(sx1, dtype=np.int64)[:, None]
    sy1 = np.asarray(sy1, dtype=np.int64)[:, None]
    k = np.int64(steps)
    t = np.arange(steps + 1, dtype=np.int64)[None, :]
    px = (sx0 * (k - t) + sx1 * t) // k
    py = (sy0 * (k - t) + sy1 * t) // k
    cells = (px // sub) * np.int64(grid) + (py // sub)
    cells.sort(axis=1)
    fresh = np.empty(cells.shape, dtype=bool)
    fresh[:, 0] = True
    fresh[:, 1:] = cells[:, 1:] != cells[:, :-1]
    return (
        fresh.sum(axis=1).astype(np.int64),
        cells[:, 0].copy(),
        cells[:, -1].copy(),
    )
