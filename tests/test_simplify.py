"""Douglas-Peucker simplification: DP's per-span guarantee, subset /
endpoint / idempotence properties, ring validity fallback."""

import json

import numpy as np
import pyarrow as pa
import pytest

from osm2geojson_ray.geom.simplify import (
    dp_keep_mask,
    simplify_features,
    simplify_geometry,
    simplify_line,
    simplify_ring,
)


def _seg_dist(p, a, b):
    a, b, p = map(np.asarray, (a, b, p))
    if (a == b).all():
        return float(np.hypot(*(p - a)))
    t = np.dot(p - a, b - a) / np.dot(b - a, b - a)
    # DP uses the infinite-chord perpendicular distance
    return float(abs(np.cross(b - a, p - a)) / np.hypot(*(b - a)))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_dp_span_guarantee(seed):
    rng = np.random.default_rng(seed)
    n = 120
    coords = np.cumsum(rng.normal(0, 1.0, (n, 2)), axis=0)
    eps = 1.5
    mask = dp_keep_mask(coords, eps)
    assert mask[0] and mask[-1]
    kept = np.flatnonzero(mask)
    assert len(kept) < n  # it actually simplified
    # every dropped point lies within eps of the chord of its final span
    for a, b in zip(kept[:-1], kept[1:]):
        for k in range(a + 1, b):
            assert _seg_dist(coords[k], coords[a], coords[b]) <= eps + 1e-12


def test_subset_and_idempotence():
    rng = np.random.default_rng(5)
    line = np.cumsum(rng.normal(0, 1.0, (60, 2)), axis=0).tolist()
    out = simplify_line(line, 1.0)
    ids = {id(p) for p in line}
    assert all(id(p) in ids for p in out)  # vertices are input objects
    assert out[0] == line[0] and out[-1] == line[-1]
    assert simplify_line(out, 1.0) == out


def test_collinear_collapse():
    line = [[float(i), 0.0] for i in range(10)]
    assert simplify_line(line, 0.0) == [[0.0, 0.0], [9.0, 0.0]]


def test_ring_fallback_keeps_validity():
    # tiny square ring, huge eps: would collapse to 2 points -> fallback
    ring = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
    assert simplify_ring(ring, 100.0) == ring
    # large noisy ring with a real interior vertex budget still closes
    rng = np.random.default_rng(6)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 40))
    pts = np.c_[np.cos(ang), np.sin(ang)] * (10 + rng.normal(0, 0.05, (40, 1)))
    ring2 = pts.tolist() + [pts[0].tolist()]
    out = simplify_ring(ring2, 0.2)
    assert out[0] == out[-1] and len(out) >= 4 and len(out) < len(ring2)


def test_geometry_types_recursion():
    g = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [5.0, 0.01], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]]
        ],
    }
    s = simplify_geometry(g, 0.1)
    assert s["coordinates"][0][0] == [
        [0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]
    ]
    pt = {"type": "Point", "coordinates": [1.0, 2.0]}
    assert simplify_geometry(pt, 1.0) == pt


def test_simplify_features_stage(ray_session):
    import ray.data

    line = [[float(i), (0.02 if i % 2 else 0.0)] for i in range(50)]
    rows = [
        {
            "seq": 0,
            "geom_type": "LineString",
            "geometry_json": json.dumps({"type": "LineString", "coordinates": line}),
        }
    ]
    ds = ray.data.from_items(rows)
    out = simplify_features(ds, 0.1).take_all()
    assert out[0]["n_in"] == 50 and out[0]["n_out"] == 2
    g = json.loads(out[0]["geometry_json"])
    assert g["coordinates"] == [[0.0, 0.0], [49.0, 0.02]]
