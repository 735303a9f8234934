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
  6. per-cluster rollup: n_cells, n_points

The flat ``gx * G + gy`` key (no level tag, unlike cells.cell_id) keeps
the DuckDB twin's neighbor arithmetic to one ``// G`` / ``% G`` pair.

Reference scope: the reference (aspectumapp/osm2geojson) has no
clustering at all — this is part of the graft surface (BASELINE.json
spatial-join + tiling engine over image points).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])

# forward half of the Moore neighborhood; connected_components adds the
# reverse direction of every edge, so 4 directions = full 8-adjacency
_FWD = ((1, -1), (1, 0), (1, 1), (0, 1))


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
    from ..relational import (
        connected_components,
        grouped_count,
        hash_join,
        partial_grouped_agg,
    )

    g = 1 << level

    def to_cells(t: pa.Table) -> pa.Table:
        lon = t[lon_col].to_numpy(zero_copy_only=False)
        lat = t[lat_col].to_numpy(zero_copy_only=False)
        gx = np.floor((lon + 180.0) / 360.0 * g).astype(np.int64)
        gy = np.floor((lat + 90.0) / 180.0 * g).astype(np.int64)
        np.clip(gx, 0, g - 1, out=gx)
        np.clip(gy, 0, g - 1, out=gy)
        return pa.Table.from_pydict(
            {"cell": gx * g + gy}, schema=pa.schema([("cell", pa.int64())])
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
                    "cluster_id": t["cell"].combine_chunks(),
                    "n_cells": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "n_points": t["n_points"].combine_chunks().cast(pa.int64()),
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

    import pyarrow.compute as pc

    def finalize_arrow(t: pa.Table) -> pa.Table:
        lab = pc.coalesce(t["label"], t["cell"]).cast(pa.int64())
        return pa.table(
            {
                "cluster_id": lab,
                "n_points": t["n_points"].combine_chunks().cast(pa.int64()),
            }
        )

    rolled = joined.map_batches(finalize_arrow, batch_format="pyarrow")
    return partial_grouped_agg(
        rolled,
        ["cluster_id"],
        {"n_cells": (None, "count"), "n_points": ("n_points", "sum")},
    )
