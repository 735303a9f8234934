"""Point-in-polygon spatial join (cell-indexed, two execution paths).

``broadcast_pip_join`` — the polygon side is small (assembled OSM
geometries): build cell -> prepared-polygon index once, ``ray.put`` it,
and run an ACTOR POOL over the image Dataset; each actor fetches the
index once in ``__init__`` (never re-shipped per batch) and tests its
batches vectorized.

``shuffled_pip_join`` — both sides large: polygons explode to their
cover cells (optionally salted when a cell is hot), images key by their
cell, a cell-keyed equi-join co-locates candidates and per-group PIP
runs inside ``map_groups``.  Partitioning key: cell id.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray

from ..geom.kernels import ring_bbox
from .cells import cell_id, cover_polygon


def points_in_polygon(lons: np.ndarray, lats: np.ndarray, poly) -> np.ndarray:
    """Vectorized even-odd PIP for n points against one polygon."""
    inside = _points_in_ring(lons, lats, np.asarray(poly[0], dtype=np.float64))
    for hole in poly[1:]:
        inside &= ~_points_in_ring(lons, lats, np.asarray(hole, dtype=np.float64))
    return inside


def _points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px = px[:, None]
    py = py[:, None]
    cond = (y1 > py) != (y2 > py)
    denom = np.where(y2 == y1, 1.0, y2 - y1)
    xcross = x1 + (py - y1) / denom * (x2 - x1)
    hits = cond & (px < xcross)
    return hits.sum(axis=1) % 2 == 1


class _CellPolygonIndex:
    """cell id -> list of (geom_id, polygon, bbox).

    ``covers``: optional precomputed ``cover_polygon`` results (one int
    array per polygon) so the driver can fan the cover computation out
    as Ray tasks; insertion order stays polygon-list order regardless."""

    def __init__(self, polygons: List[Tuple[str, list]], level: int, covers=None):
        self.level = level
        self.cells: Dict[int, List[int]] = {}
        self.polys = polygons
        self.bboxes = [ring_bbox(p[1][0]) for p in polygons]
        if covers is None:
            covers = [cover_polygon(poly, level) for _gid, poly in polygons]
        for i, cov in enumerate(covers):
            for c in cov.tolist():
                self.cells.setdefault(c, []).append(i)

    def candidates(self, cell: int) -> List[int]:
        return self.cells.get(cell, [])


def build_polygon_index(polygons: List[Tuple[str, list]], level: int) -> "ray.ObjectRef":
    """Build + broadcast the cell index (one ray.put, read per actor/
    worker).  Per-polygon cell covers are independent — computed as Ray
    tasks when a session is live (a large polygon's cover was ~1s of
    serial driver latency); the index assembly itself is order-stable."""
    covers = None
    if ray.is_initialized() and len(polygons) > 1:
        cov_task = ray.remote(cover_polygon)
        covers = ray.get([cov_task.remote(poly, level) for _gid, poly in polygons])
    return ray.put(_CellPolygonIndex(polygons, level, covers=covers))


class PipTester:
    """Actor-pool stage: images batch -> (image_id, geom_id) matches.

    Stateful setup (index fetch) runs once per actor in __init__
    (SURVEY.md §2.3); __call__ is vectorized per batch.
    """

    def __init__(self, index_ref, lon_col="lon", lat_col="lat", id_col="image_id",
                 anti=False):
        self.index: _CellPolygonIndex = ray.get(index_ref)
        # sorted key array: one vectorized membership test per batch
        # replaces a Python candidates() lookup per distinct cell
        self.cell_keys = np.array(sorted(self.index.cells), dtype=np.int64)
        self.lon_col, self.lat_col, self.id_col = lon_col, lat_col, id_col
        # anti=True inverts the join: emit each point contained in NO
        # polygon, once (the SQL NOT EXISTS shape).  Correct per batch
        # because the whole polygon side is broadcast — a point's
        # verdict never depends on other batches.
        self.anti = anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        lons = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lats = batch[self.lat_col].to_numpy(zero_copy_only=False)
        cells = cell_id(lons, lats, self.index.level)
        out_rows, out_geom = [], []
        # most rows fall in cells no polygon covers: one searchsorted
        # membership pass keeps only candidate rows, then the group
        # loop runs over that (tiny) subset
        pos = np.searchsorted(self.cell_keys, cells)
        pos_clip = np.minimum(pos, len(self.cell_keys) - 1)
        hit_mask = (
            (self.cell_keys[pos_clip] == cells)
            if len(self.cell_keys)
            else np.zeros(len(cells), dtype=bool)
        )
        cand_rows = np.flatnonzero(hit_mask)
        # group candidate rows by cell, then test each candidate
        # polygon against all points of that cell at once
        order = cand_rows[np.argsort(cells[cand_rows], kind="stable")]
        sorted_cells = cells[order]
        boundaries = np.flatnonzero(np.diff(sorted_cells)) + 1
        for seg in np.split(order, boundaries):
            if len(seg) == 0:
                continue
            cand = self.index.candidates(int(cells[seg[0]]))
            if not cand:
                continue
            seg_lons, seg_lats = lons[seg], lats[seg]
            for pi in cand:
                gid, poly = self.index.polys[pi]
                bb = self.index.bboxes[pi]
                mask = (
                    (seg_lons >= bb[0])
                    & (seg_lons <= bb[2])
                    & (seg_lats >= bb[1])
                    & (seg_lats <= bb[3])
                )
                if not mask.any():
                    continue
                hit = points_in_polygon(seg_lons[mask], seg_lats[mask], poly)
                hit_rows = np.asarray(seg)[mask][hit]
                out_rows.extend(hit_rows.tolist())
                out_geom.extend([gid] * len(hit_rows))
        # ids come straight from the Arrow column via take — the match
        # set is tiny, so the batch's id strings are never pythonized
        id_col = batch[self.id_col]
        if self.anti:
            matched = np.zeros(len(batch), dtype=bool)
            if out_rows:
                matched[np.asarray(out_rows, dtype=np.int64)] = True
            keep = np.flatnonzero(~matched)
            return pa.Table.from_arrays(
                [id_col.take(pa.array(keep, pa.int64()))],
                schema=pa.schema([("image_id", id_col.type)]),
            )
        ids = (
            id_col.take(pa.array(out_rows, pa.int64()))
            if out_rows
            else pa.chunked_array([], type=id_col.type)
        )
        return pa.Table.from_arrays(
            [ids, pa.array(out_geom, pa.string())],
            schema=pa.schema(
                [("image_id", id_col.type), ("geom_id", pa.string())]
            ),
        )


def _pip_task(batch: pa.Table, *, index_ref, lon_col, lat_col, id_col,
              anti=False) -> pa.Table:
    """Task-mode PIP: the prepared tester is built once per WORKER
    process (worker_state cache keyed by the broadcast ref) and reused
    by every task that lands there — actor-pool state without the
    actor-pool spawn cost."""
    from ..worker_state import cache_key_for_ref, get_or_build

    key = ("pip_tester", cache_key_for_ref(index_ref), lon_col, lat_col, id_col, anti)
    tester = get_or_build(
        key, lambda: PipTester(index_ref, lon_col, lat_col, id_col, anti=anti)
    )
    return tester(batch)


def broadcast_pip_join(
    images,
    polygons: "Optional[List[Tuple[str, list]]]",
    *,
    level: int = 12,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "image_id",
    concurrency: int = 2,
    batch_size: Optional[int] = None,
    compute: str = "tasks",
    index_ref: "Optional[ray.ObjectRef]" = None,
    anti: bool = False,
):
    """images Dataset (with lon/lat columns) x small polygon list ->
    Dataset of (image_id, geom_id) containment rows; ``anti=True``
    flips it to the spatial ANTI join — one (image_id,) row per point
    contained in NO polygon (NOT EXISTS semantics), exact per batch
    since the whole polygon index is broadcast.

    ``compute="tasks"`` (default) runs on the warm task pool with the
    index cached per worker process; ``"actors"`` keeps the classic
    fixed actor pool (sized by ``concurrency``) for when per-process
    state build is the dominant cost.  ``concurrency`` only applies in
    actor mode — the task pool auto-scales with the cluster.
    ``index_ref``: pre-built index ref (e.g. ``ray.put`` of a cached
    ``_CellPolygonIndex``) — ``polygons`` may be None then.  NOTE: an
    still-materializing task-output ref is a NET LOSS here — early
    fused tasks block inside ``ray.get`` while HOLDING worker slots, so
    "overlapping" prep with the stream measured slower at both 2 and 8
    cpus than just blocking the driver first; pass a ready ref."""
    import functools

    if index_ref is None:
        index_ref = build_polygon_index(polygons, level)
    if compute == "tasks":
        return images.map_batches(
            functools.partial(
                _pip_task,
                index_ref=index_ref,
                lon_col=lon_col,
                lat_col=lat_col,
                id_col=id_col,
                anti=anti,
            ),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return images.map_batches(
        PipTester,
        fn_constructor_kwargs={
            "index_ref": index_ref,
            "lon_col": lon_col,
            "lat_col": lat_col,
            "id_col": id_col,
            "anti": anti,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


RINGS_TYPE = pa.list_(pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())])))
POLY_DS_SCHEMA = pa.schema([("geom_id", pa.string()), ("rings", RINGS_TYPE)])


def polygons_to_dataset(polygons: List[Tuple[str, list]]):
    """(geom_id, [[ [lon,lat], ...], ...]) list -> polygon Dataset with
    native nested coordinates (the shuffled join's big-side input
    format; at scale, read this schema straight from parquet)."""
    import ray.data

    rows = [
        {
            "geom_id": gid,
            "rings": [[{"lon": float(p[0]), "lat": float(p[1])} for p in ring]
                      for ring in poly],
        }
        for gid, poly in polygons
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=POLY_DS_SCHEMA))


def _rings_to_coords(rings_value) -> list:
    """One Arrow rings value (list of list of {lon,lat}) -> the nested
    [[ [lon,lat], ...], ...] lists the PIP kernels take."""
    return [[[p["lon"], p["lat"]] for p in ring] for ring in rings_value]


def _explode_polygons_to_cells(level: int, salt: int):
    """map_batches stage: polygon rows -> one row per (cover cell x
    salt), coordinates riding as native Arrow nested lists (replicated
    via ``take`` — never JSON, never the driver)."""

    def fn(batch: pa.Table) -> pa.Table:
        rings_col = batch["rings"].combine_chunks()
        n = len(batch)
        covers = [
            cover_polygon(_rings_to_coords(rings_col[i].as_py()), level)
            for i in range(n)
        ]
        counts = np.array([len(c) * salt for c in covers], dtype=np.int64)
        cells = (
            np.concatenate([np.repeat(c, salt) for c in covers])
            if n
            else np.array([], dtype=np.int64)
        )
        salts = (
            np.concatenate([np.tile(np.arange(salt, dtype=np.int64), len(c)) for c in covers])
            if n
            else np.array([], dtype=np.int64)
        )
        take_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), counts))
        return pa.Table.from_arrays(
            [
                pa.array(cells * salt + salts),
                batch["geom_id"].take(take_idx),
                rings_col.take(take_idx),
            ],
            schema=pa.schema(
                [("cell_salt", pa.int64()), ("geom_id", pa.string()),
                 ("rings", RINGS_TYPE)]
            ),
        )

    return fn


def shuffled_pip_join(
    images,
    polygons,
    *,
    level: int = 12,
    num_partitions: int = 16,
    salt: int = 1,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "image_id",
):
    """Both sides large: cell-keyed equi-join + per-group PIP.

    ``polygons`` is a Dataset with schema (geom_id: string, rings:
    list<list<struct<lon,lat>>>) — or a small (geom_id, coords) list,
    wrapped via :func:`polygons_to_dataset` for convenience.  The
    cover-cell explode runs distributed inside ``map_batches`` and the
    coordinates ride the exchange as native Arrow nested lists: no
    driver-side fan-out, no JSON re-parse per group (at 10^9 polygons
    the old list-input path materialized every (polygon x cell x salt)
    JSON row on the driver).

    ``salt`` > 1 splits every cell into ``salt`` sub-keys: polygon rows
    replicate per sub-key, image rows pick one by id hash — bounding
    the largest group at roughly images_per_cell / salt (hot-cell skew
    handling; SURVEY.md §4)."""
    from ..relational import _crc32_vectorized, hash_join

    if isinstance(polygons, list):
        polygons = polygons_to_dataset(polygons)
    poly_ds = polygons.map_batches(
        _explode_polygons_to_cells(level, salt), batch_format="pyarrow"
    )
    poly_schema = pa.schema(
        [("cell_salt", pa.int64()), ("geom_id", pa.string()), ("rings", RINGS_TYPE)]
    )

    def key_images(batch: pa.Table) -> pa.Table:
        lons = batch[lon_col].to_numpy(zero_copy_only=False)
        lats = batch[lat_col].to_numpy(zero_copy_only=False)
        cells = cell_id(lons, lats, level)
        ids = batch[id_col]
        if salt > 1:
            # stable per-image salt (builtin hash is process-randomized);
            # vectorized crc32 over the DECIMAL STRING form so int and
            # string id columns route identically
            import pyarrow.compute as pc

            as_str = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
            if not pa.types.is_string(as_str.type):
                as_str = as_str.cast(pa.string())
            h = _crc32_vectorized(as_str) % salt
        else:
            h = np.zeros(len(batch), dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "cell_salt": pa.array(cells * salt + h),
                "image_id": ids,
                "i_lon": batch[lon_col],
                "i_lat": batch[lat_col],
            }
        )

    img_keyed = images.map_batches(key_images, batch_format="pyarrow")
    img_schema = pa.schema(
        [
            ("cell_salt", pa.int64()),
            ("image_id", pa.string()),
            ("i_lon", pa.float64()),
            ("i_lat", pa.float64()),
        ]
    )
    joined = hash_join(
        img_keyed,
        poly_ds,
        on="cell_salt",
        l_schema=img_schema,
        r_schema=poly_schema,
        how="inner",
        num_partitions=num_partitions,
    )

    def test_group(batch: pa.Table) -> pa.Table:
        out_img, out_geom = [], []
        lons = batch["i_lon"].to_numpy(zero_copy_only=False)
        lats = batch["i_lat"].to_numpy(zero_copy_only=False)
        ids = batch["image_id"]
        gid_col = batch["geom_id"].combine_chunks()
        rings_col = batch["rings"].combine_chunks()
        # candidate rows are already (image x polygon) pairs; group by
        # geom_id (unique per polygon) and decode each polygon's rings
        # from Arrow ONCE per group — not per row, and never from JSON
        gids_np = gid_col.to_numpy(zero_copy_only=False)
        order = np.argsort(gids_np, kind="stable")
        sorted_gids = gids_np[order]
        bounds = np.flatnonzero(sorted_gids[1:] != sorted_gids[:-1]) + 1
        for seg in np.split(order, bounds):
            if len(seg) == 0:
                continue
            poly = _rings_to_coords(rings_col[int(seg[0])].as_py())
            hit = points_in_polygon(lons[seg], lats[seg], poly)
            hit_rows = np.asarray(seg)[hit]
            out_img.extend(hit_rows.tolist())
            out_geom.extend(gids_np[hit_rows].tolist())
        matched_ids = (
            ids.take(pa.array(out_img, pa.int64()))
            if out_img
            else pa.chunked_array([], type=ids.type)
        )
        return pa.Table.from_arrays(
            [matched_ids, pa.array(out_geom, pa.string())],
            schema=pa.schema([("image_id", ids.type), ("geom_id", pa.string())]),
        )

    return joined.map_batches(test_group, batch_format="pyarrow")
