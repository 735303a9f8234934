"""Grid-density spatial clustering (DBSCAN-style, from scratch).

The classic scale trick for clustering billions of points: snap every
point to a grid cell, cluster the OCCUPIED CELLS by 8-neighbor
adjacency (Moore neighborhood) instead of the raw points — grid-DBSCAN
with eps = one cell diagonal and min_pts = 1.  The heavy input reduces
to one combiner-pushdown count per cell; everything after operates on
the occupied-cell set, which is bounded by the grid (2^(2*level)
cells), not by the point count — at 100 TB of points the cluster step
is the same size as at 100 GB.

Stages (all reusing already-oracled primitives):
  1. points -> flat cell key gx * G + gy   (one map, no shuffle)
  2. grouped_count -> (cell, n_points)     (one hash exchange)
  3. occupied cells emit 4 forward neighbor candidates; a left-semi
     hash join against the occupied-key set keeps only edges whose
     endpoint exists (connected_components mirrors each edge, so the
     4 forward directions cover the full Moore neighborhood)
  4. relational.connected_components -> (cell, label)
  5. left-outer join labels back onto occupied cells; singleton cells
     (no neighbor) label themselves

``grid_cell_labels`` returns the per-cell label table (the join side
spatial dedup needs); ``grid_density_clusters`` rolls it up to
per-cluster cell/point counts.

The flat ``gx * G + gy`` key (no level tag, unlike cells.cell_id) keeps
the DuckDB twin's neighbor arithmetic to one ``// G`` / ``% G`` pair.

Reference scope: the reference (aspectumapp/osm2geojson) has no
clustering at all — this is part of the graft surface (BASELINE.json
spatial-join + tiling engine over image points).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])

# forward half of the Moore neighborhood; connected_components adds the
# reverse direction of every edge, so 4 directions = full 8-adjacency
_FWD = ((1, -1), (1, 0), (1, 1), (0, 1))


def flat_cell_key(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Point -> flat grid key gx * 2^level + gy (int64, clipped)."""
    g = 1 << level
    gx = np.floor((lon + 180.0) / 360.0 * g).astype(np.int64)
    gy = np.floor((lat + 90.0) / 180.0 * g).astype(np.int64)
    np.clip(gx, 0, g - 1, out=gx)
    np.clip(gy, 0, g - 1, out=gy)
    return gx * g + gy


def grid_cell_labels(
    points,
    *,
    lon_col: str = "lon",
    lat_col: str = "lat",
    level: int = 14,
    num_partitions: int = 16,
):
    """Label every OCCUPIED grid cell with its 8-adjacency component.

    Returns a Dataset (cell, n_points, cluster_id) with cluster_id =
    the smallest flat cell key in the component (cells with no occupied
    neighbor label themselves).
    """
    from ..relational import connected_components, grouped_count, hash_join

    g = 1 << level

    def to_cells(t: pa.Table) -> pa.Table:
        cells = flat_cell_key(
            t[lon_col].to_numpy(zero_copy_only=False),
            t[lat_col].to_numpy(zero_copy_only=False),
            level,
        )
        return pa.Table.from_pydict(
            {"cell": cells}, schema=pa.schema([("cell", pa.int64())])
        )

    cells = grouped_count(
        points.map_batches(to_cells, batch_format="pyarrow"),
        "cell",
        alias="n_points",
    )

    def neighbor_candidates(t: pa.Table) -> pa.Table:
        c = t["cell"].to_numpy(zero_copy_only=False)
        gx, gy = c // g, c % g
        outs_a, outs_b = [], []
        for dx, dy in _FWD:
            nx, ny = gx + dx, gy + dy
            ok = (nx >= 0) & (nx < g) & (ny >= 0) & (ny < g)
            outs_a.append(c[ok])
            outs_b.append(nx[ok] * g + ny[ok])
        return pa.Table.from_pydict(
            {"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)},
            schema=_EDGE_SCHEMA,
        )

    keys = cells.map_batches(
        lambda t: pa.Table.from_pydict(
            {"b": t["cell"].combine_chunks()},
            schema=pa.schema([("b", pa.int64())]),
        ),
        batch_format="pyarrow",
    )
    edges = hash_join(
        cells.map_batches(neighbor_candidates, batch_format="pyarrow"),
        keys,
        on="b",
        l_schema=pa.schema([("b", pa.int64()), ("a", pa.int64())]),
        r_schema=pa.schema([("b", pa.int64())]),
        how="left_semi",
        num_partitions=num_partitions,
    ).materialize()

    occupied_schema = pa.schema([("cell", pa.int64()), ("n_points", pa.int64())])
    if edges.count() == 0:
        # no adjacent occupied cells anywhere: every cell is its own
        # cluster — skip the component rounds entirely
        def singleton(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "cell": t["cell"].combine_chunks(),
                    "n_points": t["n_points"].combine_chunks().cast(pa.int64()),
                    "cluster_id": t["cell"].combine_chunks(),
                }
            )

        return cells.map_batches(singleton, batch_format="pyarrow")

    labels = connected_components(
        edges, a_col="a", b_col="b", num_partitions=num_partitions
    ).map_batches(
        lambda t: pa.Table.from_pydict(
            {"cell": t["node"], "label": t["label"]},
            schema=pa.schema([("cell", pa.int64()), ("label", pa.int64())]),
        ),
        batch_format="pyarrow",
    )

    joined = hash_join(
        cells,
        labels,
        on="cell",
        l_schema=occupied_schema,
        r_schema=pa.schema([("cell", pa.int64()), ("label", pa.int64())]),
        how="left_outer",
        num_partitions=num_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell": t["cell"].combine_chunks().cast(pa.int64()),
                "n_points": t["n_points"].combine_chunks().cast(pa.int64()),
                "cluster_id": pc.coalesce(t["label"], t["cell"]).cast(pa.int64()),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def grid_density_clusters(
    points,
    *,
    lon_col: str = "lon",
    lat_col: str = "lat",
    level: int = 14,
    num_partitions: int = 16,
):
    """Cluster points by occupied-grid-cell 8-adjacency.

    Returns a Dataset (cluster_id, n_cells, n_points) with cluster_id =
    the smallest flat cell key in the component.
    """
    from ..relational import partial_grouped_agg

    labels = grid_cell_labels(
        points,
        lon_col=lon_col,
        lat_col=lat_col,
        level=level,
        num_partitions=num_partitions,
    )
    return partial_grouped_agg(
        labels,
        ["cluster_id"],
        {"n_cells": (None, "count"), "n_points": ("n_points", "sum")},
    )


def spatial_dedup(
    points,
    *,
    id_col: str = "image_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    level: int = 14,
    num_partitions: int = 16,
):
    """Keep ONE point per spatial cluster (the geo-dedup curation pass:
    collapse bursts of near-identical capture locations to a single
    representative): grid_cell_labels + one hash join routing each
    point's id to its cell's cluster label + a per-cluster (min id,
    count) rollup.  Point payloads never shuffle — only slim
    (id, cell) rows ride the join.

    Returns (cluster_id, keeper_id, n_images).
    """
    from ..relational import hash_join, partial_grouped_agg

    def to_rows(t: pa.Table) -> pa.Table:
        cells = flat_cell_key(
            t[lon_col].to_numpy(zero_copy_only=False),
            t[lat_col].to_numpy(zero_copy_only=False),
            level,
        )
        return pa.Table.from_pydict(
            {"pid": t[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
             "cell": cells},
            schema=pa.schema([("pid", pa.int64()), ("cell", pa.int64())]),
        )

    labels = grid_cell_labels(
        points, lon_col=lon_col, lat_col=lat_col, level=level,
        num_partitions=num_partitions,
    ).select_columns(["cell", "cluster_id"])

    routed = hash_join(
        points.map_batches(to_rows, batch_format="pyarrow"),
        labels,
        on="cell",
        l_schema=pa.schema([("cell", pa.int64()), ("pid", pa.int64())]),
        r_schema=pa.schema([("cell", pa.int64()), ("cluster_id", pa.int64())]),
        how="inner",
        num_partitions=num_partitions,
    )
    return partial_grouped_agg(
        routed,
        ["cluster_id"],
        {"keeper_id": ("pid", "min"), "n_images": (None, "count")},
    )
