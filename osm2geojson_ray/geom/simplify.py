"""Douglas-Peucker geometry simplification (from scratch — no shapely
in this environment; reference osm2geojson has no simplify, this
extends the graft's geometry toolkit the way kernels.py does).

The kernel is the classic stack-based DP, but each split evaluates ALL
point-to-chord distances of its span in one vectorized numpy pass —
the Python loop runs once per KEPT vertex, not per point, so dense
inputs that simplify heavily cost O(kept * n) vector work, and the
common near-straight spans collapse in a single evaluation.

Semantics:
- endpoints always kept; dropped points lie within ``eps``
  (perpendicular chord distance; radial when the chord degenerates).
- rings (closed, first == last): DP over the closed polyline; if fewer
  than 3 distinct vertices survive, the ORIGINAL ring is returned so
  polygon validity is never sacrificed for compression.
- vertices of the output are a subset of the input (no new points) —
  the property tests key on this.

Dataset stage: :func:`simplify_features` maps GeoJSON feature rows
(``geometry_json`` column, the pipeline's output schema) through the
kernel in ``map_batches``.  At 10^12-geometry scale the coordinates
would ride as Arrow ``list<struct>`` columns end-to-end (as the stitch
pipeline's internals do) instead of per-row JSON; the JSON hop here
matches the corpus-facing feature schema it plugs into.
"""

from __future__ import annotations

import json
from typing import List

import numpy as np
import pyarrow as pa


def dp_keep_mask(coords: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep mask for an (n, 2) polyline under tolerance eps."""
    n = len(coords)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    x = coords[:, 0]
    y = coords[:, 1]
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay = x[i], y[i]
        bx, by = x[j], y[j]
        px = x[i + 1 : j]
        py = y[i + 1 : j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (px - ax) ** 2 + (py - ay) ** 2
            dmax2 = d2.max()
            thresh = eps * eps
        else:
            cross = (px - ax) * dy - (py - ay) * dx
            d2 = cross * cross  # squared distance * seg2
            dmax2 = d2.max()
            thresh = eps * eps * seg2
        if dmax2 > thresh:
            k = i + 1 + int(d2.argmax())
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_line(coords: List[List[float]], eps: float) -> List[List[float]]:
    arr = np.asarray(coords, dtype=np.float64)
    mask = dp_keep_mask(arr, eps)
    return [coords[i] for i in np.flatnonzero(mask)]


def simplify_ring(ring: List[List[float]], eps: float) -> List[List[float]]:
    """Closed ring (first == last).  Falls back to the original ring if
    simplification would leave fewer than 3 distinct vertices."""
    out = simplify_line(ring, eps)
    if len(out) < 4:  # 3 distinct + closing point
        return ring
    return out


def simplify_geometry(geom: dict, eps: float) -> dict:
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point" or t == "MultiPoint":
        return geom
    if t == "LineString":
        return {"type": t, "coordinates": simplify_line(c, eps)}
    if t == "MultiLineString":
        return {"type": t, "coordinates": [simplify_line(l, eps) for l in c]}
    if t == "Polygon":
        return {"type": t, "coordinates": [simplify_ring(r, eps) for r in c]}
    if t == "MultiPolygon":
        return {
            "type": t,
            "coordinates": [[simplify_ring(r, eps) for r in p] for p in c],
        }
    if t == "GeometryCollection":
        return {
            "type": t,
            "geometries": [simplify_geometry(g, eps) for g in geom["geometries"]],
        }
    raise ValueError(f"unknown geometry type {t!r}")


def _count_vertices(geom: dict) -> int:
    t = geom["type"]
    if t == "GeometryCollection":
        return sum(_count_vertices(g) for g in geom["geometries"])
    c = geom.get("coordinates")
    if t == "Point":
        return 1
    if t in ("MultiPoint", "LineString"):
        return len(c)
    if t in ("MultiLineString", "Polygon"):
        return sum(len(part) for part in c)
    if t == "MultiPolygon":
        return sum(len(r) for p in c for r in p)
    raise ValueError(f"unknown geometry type {t!r}")


_SIMPLIFY_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("geom_type", pa.string()),
        ("geometry_json", pa.string()),
        ("n_in", pa.int64()),
        ("n_out", pa.int64()),
    ]
)


def simplify_features(features_ds, eps: float):
    """Feature rows -> simplified geometry + vertex counts, streaming
    one map_batches pass (no shuffle, no state)."""

    def per_batch(t: pa.Table) -> pa.Table:
        seqs = t["seq"].to_numpy(zero_copy_only=False)
        gtypes = t["geom_type"].to_pylist()
        geoms = t["geometry_json"].to_pylist()
        out_json, n_in, n_out = [], [], []
        for gj in geoms:
            g = json.loads(gj)
            s = simplify_geometry(g, eps)
            out_json.append(json.dumps(s))
            n_in.append(_count_vertices(g))
            n_out.append(_count_vertices(s))
        return pa.Table.from_pydict(
            {
                "seq": seqs,
                "geom_type": gtypes,
                "geometry_json": out_json,
                "n_in": np.asarray(n_in, dtype=np.int64),
                "n_out": np.asarray(n_out, dtype=np.int64),
            },
            schema=_SIMPLIFY_SCHEMA,
        )

    return features_ds.map_batches(per_batch, batch_format="pyarrow")
