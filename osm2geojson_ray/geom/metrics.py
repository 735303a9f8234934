"""Geometry metrics: planar area, perimeter/length, centroid — the
measurement functions a spatial engine exposes next to PIP/kNN/tiles
(reference osm2geojson has none; graft extension like simplify.py).

All kernels are vectorized numpy over coordinate arrays (shoelace /
segment-norm sums in one pass per ring); the Dataset stage maps GeoJSON
feature rows in one streaming ``map_batches`` with no shuffle.  Areas
are in square degrees and lengths in degrees (planar — the engine's
cell grid is planar too); a geodesic variant would swap the kernel
only.

Centroid convention: area-weighted polygon centroid (holes subtract),
standard shoelace moments; for LineStrings the length-weighted segment
midpoint centroid; for Points the point itself.
"""

from __future__ import annotations

import json
from typing import List, Tuple

import numpy as np
import pyarrow as pa


def ring_metrics(ring: List[List[float]]) -> Tuple[float, float, float, float]:
    """(signed_area, perimeter, cx*area, cy*area) for one closed ring —
    the moment form so polygon centroids compose by summation."""
    a = np.asarray(ring, dtype=np.float64)
    x, y = a[:, 0], a[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    s_area = 0.5 * cross.sum()
    per = float(np.hypot(np.diff(x), np.diff(y)).sum())
    mx = ((x[:-1] + x[1:]) * cross).sum() / 6.0
    my = ((y[:-1] + y[1:]) * cross).sum() / 6.0
    return float(s_area), per, float(mx), float(my)


def line_metrics(coords: List[List[float]]) -> Tuple[float, float, float]:
    """(length, cx*length, cy*length) for a polyline (moment form)."""
    a = np.asarray(coords, dtype=np.float64)
    x, y = a[:, 0], a[:, 1]
    seg = np.hypot(np.diff(x), np.diff(y))
    mx = ((x[:-1] + x[1:]) * 0.5 * seg).sum()
    my = ((y[:-1] + y[1:]) * 0.5 * seg).sum()
    return float(seg.sum()), float(mx), float(my)


def geometry_metrics(geom: dict) -> Tuple[float, float, float, float]:
    """(area, length, cx, cy) of any GeoJSON geometry.

    area: |sum of ring signed areas| per polygon (holes are CW after
    winding normalization, so they subtract).  length: exterior+hole
    perimeters for areal types, polyline length otherwise.  Centroid:
    area-weighted for areal, length-weighted for lineal, point mean
    for point types; (nan, nan) when the weight is zero."""
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        return 0.0, 0.0, float(c[0]), float(c[1])
    if t == "MultiPoint":
        a = np.asarray(c, dtype=np.float64)
        return 0.0, 0.0, float(a[:, 0].mean()), float(a[:, 1].mean())
    if t == "LineString":
        ln, mx, my = line_metrics(c)
        return 0.0, ln, mx / ln if ln else np.nan, my / ln if ln else np.nan
    if t == "MultiLineString":
        ln = mx = my = 0.0
        for part in c:
            l, a, b = line_metrics(part)
            ln += l
            mx += a
            my += b
        return 0.0, ln, mx / ln if ln else np.nan, my / ln if ln else np.nan
    if t in ("Polygon", "MultiPolygon"):
        polys = c if t == "MultiPolygon" else [c]
        area = per = mx = my = 0.0
        for poly in polys:
            for ring in poly:
                s, p, a, b = ring_metrics(ring)
                area += s
                per += p
                mx += a
                my += b
        aa = abs(area)
        return (
            aa,
            per,
            mx / area if area else np.nan,
            my / area if area else np.nan,
        )
    if t == "GeometryCollection":
        raise ValueError("metrics over GeometryCollection: map members instead")
    raise ValueError(f"unknown geometry type {t!r}")


_METRICS_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("geom_type", pa.string()),
        ("area_deg2", pa.float64()),
        ("length_deg", pa.float64()),
        ("cx", pa.float64()),
        ("cy", pa.float64()),
    ]
)


def metrics_features(features_ds):
    """Feature rows -> per-feature metrics, one streaming pass."""

    def per_batch(t: pa.Table) -> pa.Table:
        seqs = t["seq"].to_numpy(zero_copy_only=False)
        gtypes = t["geom_type"].to_pylist()
        area, length, cx, cy = [], [], [], []
        for gj in t["geometry_json"].to_pylist():
            a, l, x, y = geometry_metrics(json.loads(gj))
            area.append(a)
            length.append(l)
            cx.append(x)
            cy.append(y)
        return pa.Table.from_pydict(
            {
                "seq": seqs,
                "geom_type": gtypes,
                "area_deg2": area,
                "length_deg": length,
                "cx": cx,
                "cy": cy,
            },
            schema=_METRICS_SCHEMA,
        )

    return features_ds.map_batches(per_batch, batch_format="pyarrow")
