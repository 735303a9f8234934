"""Geometry metrics kernels: known-shape checks + moment composition."""

import numpy as np
import pytest

from osm2geojson_ray.geom.metrics import geometry_metrics, line_metrics, ring_metrics

SQ = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
HOLE = [[1.0, 1.0], [1.0, 3.0], [3.0, 3.0], [3.0, 1.0], [1.0, 1.0]]  # CW


def test_ring_metrics_square():
    s, p, mx, my = ring_metrics(SQ)
    assert s == 16.0 and p == 16.0
    assert (mx / s, my / s) == (2.0, 2.0)


def test_polygon_with_hole():
    a, per, cx, cy = geometry_metrics({"type": "Polygon", "coordinates": [SQ, HOLE]})
    assert a == 16.0 - 4.0
    assert per == 16.0 + 8.0
    assert (cx, cy) == (2.0, 2.0)  # symmetric hole keeps the centroid


def test_multipolygon_composition():
    sq2 = [[10.0, 0.0], [12.0, 0.0], [12.0, 2.0], [10.0, 2.0], [10.0, 0.0]]
    a, per, cx, cy = geometry_metrics(
        {"type": "MultiPolygon", "coordinates": [[SQ], [sq2]]}
    )
    assert a == 16.0 + 4.0
    # area-weighted centroid of (2,2)x16 and (11,1)x4
    assert cx == pytest.approx((2 * 16 + 11 * 4) / 20)
    assert cy == pytest.approx((2 * 16 + 1 * 4) / 20)


def test_line_metrics():
    ln, mx, my = line_metrics([[0.0, 0.0], [3.0, 0.0], [3.0, 4.0]])
    assert ln == 7.0
    # segment midpoints (1.5,0)x3 and (3,2)x4
    assert mx / ln == pytest.approx((1.5 * 3 + 3 * 4) / 7)
    assert my / ln == pytest.approx((0 * 3 + 2 * 4) / 7)
    a, l, cx, cy = geometry_metrics({"type": "Point", "coordinates": [5.0, 6.0]})
    assert (a, l, cx, cy) == (0.0, 0.0, 5.0, 6.0)


def test_winding_insensitive_area():
    rev = list(reversed(SQ))
    a1, _, _, _ = geometry_metrics({"type": "Polygon", "coordinates": [SQ]})
    a2, _, _, _ = geometry_metrics({"type": "Polygon", "coordinates": [rev]})
    assert a1 == a2 == 16.0
