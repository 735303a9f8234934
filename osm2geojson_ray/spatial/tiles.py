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
