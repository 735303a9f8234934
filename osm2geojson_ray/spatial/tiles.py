"""Raster <-> vector tile assignment.

Assignment = cell-keyed equi-join between image point-cells and
geometry cover-cells at one level: every (image, geometry, cell) where
the image's cell belongs to the geometry's cover.  Pure cell-id
arithmetic (no exact PIP) — the coarse routing stage feeding the PIP
join, and an output in its own right (tile statistics / sharding).
"""

from __future__ import annotations

import json
from typing import List, Tuple

import numpy as np
import pyarrow as pa

import ray.data

from ..relational import hash_join
from .cells import cell_id, cover_polygon

ASSIGN_SCHEMA = pa.schema(
    [("cell", pa.int64()), ("image_id", pa.string()), ("geom_id", pa.string())]
)


def geometry_tiles(polygons: List[Tuple[str, list]], level: int) -> pa.Table:
    """(geom_id, cell) cover rows for a polygon list."""
    gids, cells = [], []
    for gid, poly in polygons:
        for c in cover_polygon(poly, level).tolist():
            gids.append(gid)
            cells.append(c)
    return pa.Table.from_pydict(
        {"cell": cells, "geom_id": gids},
        schema=pa.schema([("cell", pa.int64()), ("geom_id", pa.string())]),
    )


def tile_assignment(
    images,
    polygons: List[Tuple[str, list]],
    *,
    level: int = 12,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "image_id",
    num_partitions: int = 16,
):
    """images Dataset x polygon cover -> (cell, image_id, geom_id)."""
    tiles = ray.data.from_arrow(geometry_tiles(polygons, level))

    def key_images(batch: pa.Table) -> pa.Table:
        cells = cell_id(
            batch[lon_col].to_numpy(zero_copy_only=False),
            batch[lat_col].to_numpy(zero_copy_only=False),
            level,
        )
        return pa.Table.from_pydict(
            {"cell": pa.array(cells), "image_id": batch[id_col]},
            schema=pa.schema([("cell", pa.int64()), ("image_id", pa.string())]),
        )

    keyed = images.map_batches(key_images, batch_format="pyarrow")
    return hash_join(
        keyed,
        tiles,
        on="cell",
        l_schema=pa.schema([("cell", pa.int64()), ("image_id", pa.string())]),
        r_schema=pa.schema([("cell", pa.int64()), ("geom_id", pa.string())]),
        how="inner",
        num_partitions=num_partitions,
    )


def tile_stats(assignment):
    """Per-(geom, cell) image counts — the aggregate consumers read."""
    from ray.data.aggregate import Count

    return assignment.groupby(["geom_id", "cell"]).aggregate(Count(alias_name="n_images"))


_PYRAMID_SCHEMA = pa.schema(
    [("level", pa.int64()), ("cell_id", pa.int64()), ("n_points", pa.int64())]
)
_XY_MASK = np.int64((1 << 29) - 1)


def neighborhood_rollup(counts, *, value_col: str, radius: int = 1,
                        out_col: str = "n_smooth"):
    """Grid-neighborhood smoothing: for every cell, the sum of
    ``value_col`` over the (2r+1)x(2r+1) cell window around it — the
    sparse-raster box convolution (heatmap smoothing / density
    estimation over tiles).

    Input: a (cell_id, value) Dataset (e.g. ``grouped_count`` output —
    already one row per DISTINCT cell, so the explode below runs on the
    histogram, never the raw points).  Each input row scatters its
    value to the <= (2r+1)^2 neighbors that exist on the grid
    (edge-clipped, no wraparound — matches the SQL twin's bounds
    predicate), then one combiner-push-down grouped sum re-collapses.
    One exchange of <= (2r+1)^2 x #distinct-cells slim rows total.
    Output cells are exactly those within ``radius`` of an occupied
    cell; unreachable empty cells never materialize (sparse semantics).
    """
    from ..relational import partial_grouped_agg

    k = 2 * radius + 1

    def scatter(t: pa.Table) -> pa.Table:
        cid = t["cell_id"].to_numpy(zero_copy_only=False)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        level = cid >> np.int64(58)
        x = (cid >> np.int64(29)) & _XY_MASK
        y = cid & _XY_MASK
        n = np.int64(1) << level  # grid size per row (level-mixed safe)
        offs = np.arange(-radius, radius + 1, dtype=np.int64)
        dx = np.repeat(offs, k)  # (k*k,)
        dy = np.tile(offs, k)
        nx = x[:, None] + dx[None, :]
        ny = y[:, None] + dy[None, :]
        ok = (nx >= 0) & (nx < n[:, None]) & (ny >= 0) & (ny < n[:, None])
        tgt = (level[:, None] << np.int64(58)) | (nx << np.int64(29)) | ny
        rep_val = np.broadcast_to(val[:, None], tgt.shape)
        flat_ok = ok.ravel()
        return pa.Table.from_pydict(
            {"cell_id": tgt.ravel()[flat_ok], out_col: rep_val.ravel()[flat_ok]},
            schema=pa.schema([("cell_id", pa.int64()), (out_col, pa.int64())]),
        )

    exploded = counts.map_batches(scatter, batch_format="pyarrow")
    return partial_grouped_agg(exploded, ["cell_id"], {out_col: (out_col, "sum")})


def cell_pyramid(points, levels, *, lon_col: str = "lon", lat_col: str = "lat"):
    """Multi-resolution point-count pyramid: (level, cell_id, n_points)
    for every requested level of the cell hierarchy — the
    compact/uncompact-style rollup a tile server wants, in ONE pass.

    Scale shape: the raw points are read once, at the FINEST level
    only — each batch reduces to per-fine-cell partial counts
    (np.unique), so only #distinct-cells x #blocks tiny rows leave the
    map stage and raw points never shuffle.  One remote reduce sums
    the fine histogram and derives every coarser level from it by
    integer shift arithmetic (cells.cell_parent, vectorized) — no
    second pass over the data, no per-level scans.  At a true tile
    pyramid's cardinality (4^12 potential fine cells) the reduce would
    shard by cell hash first (partial_grouped_agg's exchange shape);
    one task suffices for any realistic distinct-cell count here.
    """
    import ray as _ray

    lvls = sorted({int(l) for l in levels}, reverse=True)
    fine = lvls[0]

    def partial(t: pa.Table) -> pa.Table:
        cells = cell_id(
            t[lon_col].to_numpy(zero_copy_only=False),
            t[lat_col].to_numpy(zero_copy_only=False),
            fine,
        )
        uniq, cnt = np.unique(cells, return_counts=True)
        return pa.Table.from_pydict(
            {"cell_id": uniq, "n_points": cnt.astype(np.int64)},
            schema=pa.schema([("cell_id", pa.int64()), ("n_points", pa.int64())]),
        )

    partials = points.map_batches(partial, batch_format="pyarrow")

    def _sum_by(cells: np.ndarray, n: np.ndarray):
        order = np.argsort(cells, kind="stable")
        c = cells[order]
        v = n[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        return c[starts], np.add.reduceat(v, starts)

    @_ray.remote
    def _final(*blocks):
        tbl = pa.concat_tables(blocks, promote_options="default")
        cells = tbl["cell_id"].to_numpy(zero_copy_only=False)
        n = tbl["n_points"].to_numpy(zero_copy_only=False)
        fc, fn = _sum_by(cells, n)
        fx = (fc >> np.int64(29)) & _XY_MASK
        fy = fc & _XY_MASK
        out_l, out_c, out_n = [], [], []
        for L in lvls:
            if L == fine:
                c, v = fc, fn
            else:
                shift = np.int64(fine - L)
                parent = (
                    (np.int64(L) << np.int64(58))
                    | ((fx >> shift) << np.int64(29))
                    | (fy >> shift)
                )
                c, v = _sum_by(parent, fn)
            out_l.append(np.full(len(c), L, dtype=np.int64))
            out_c.append(c)
            out_n.append(v)
        return pa.Table.from_pydict(
            {
                "level": np.concatenate(out_l),
                "cell_id": np.concatenate(out_c),
                "n_points": np.concatenate(out_n),
            },
            schema=_PYRAMID_SCHEMA,
        )

    refs = []
    for bundle in partials.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs:
        return ray.data.from_arrow(_PYRAMID_SCHEMA.empty_table())
    return ray.data.from_arrow_refs([_final.remote(*refs)])
