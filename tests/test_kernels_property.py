"""Property-based tests (hypothesis) for the from-scratch geometry and
cell kernels — invariants that must hold for ANY input, not just the
corpus."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2geojson_ray.geom.kernels import (
    close_ring,
    is_ccw,
    orient_multipolygon,
    point_in_ring,
    ring_bbox,
    signed_area,
)
from osm2geojson_ray.geom.linemerge import linemerge
from osm2geojson_ray.spatial.cells import cell_bounds, cell_id, cell_parent, cell_parts

# -- random simple polygons: points sorted by angle around their centroid
coords = st.floats(min_value=-170.0, max_value=170.0, allow_nan=False,
                   allow_infinity=False, width=32)


@st.composite
def simple_rings(draw, min_pts=3, max_pts=12):
    n = draw(st.integers(min_pts, max_pts))
    pts = {
        (draw(coords), draw(coords))
        for _ in range(n)
    }
    pts = list(pts)
    if len(pts) < 3:
        pts = [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]
    cx = sum(p[0] for p in pts) / len(pts)
    cy = sum(p[1] for p in pts) / len(pts)
    pts.sort(key=lambda p: math.atan2(p[1] - cy, p[0] - cx))
    ring = [[float(x), float(y)] for x, y in pts]
    ring.append(list(ring[0]))
    return ring


@given(simple_rings())
@settings(max_examples=80, deadline=None)
def test_orientation_normalization(ring):
    if signed_area(ring) == 0:
        return
    mp = orient_multipolygon([[ring]])
    shell = mp[0][0]
    assert is_ccw(shell)  # RFC 7946 exterior
    assert {tuple(p) for p in shell} == {tuple(p) for p in ring}
    # idempotent
    assert orient_multipolygon(mp) == mp


@given(simple_rings())
@settings(max_examples=80, deadline=None)
def test_bbox_contains_ring_points(ring):
    bb = ring_bbox(ring)
    for x, y in ring:
        assert bb[0] <= x <= bb[2] and bb[1] <= y <= bb[3]


@given(simple_rings(min_pts=4, max_pts=10), st.integers(1, 8))
@settings(max_examples=60, deadline=None)
def test_linemerge_reconstructs_split_ring(ring, n_cuts):
    """A closed ring split into consecutive chains merges back to ONE
    closed line with the same undirected segment multiset."""
    if signed_area(ring) == 0:
        return
    open_r = ring[:-1]
    n = len(open_r)
    cuts = sorted({(i * n) // min(n_cuts, n) for i in range(min(n_cuts, n))})
    if len(cuts) < 2:
        return
    pieces = []
    for a, b in zip(cuts, cuts[1:] + [cuts[0] + n]):
        seg = [open_r[j % n] for j in range(a, b + 1)]
        if len(seg) >= 2:
            pieces.append(seg)
    merged = linemerge(pieces)
    assert len(merged) == 1
    out = merged[0]
    assert tuple(out[0]) == tuple(out[-1])  # closed

    def segs(line):
        return {
            frozenset((tuple(line[i]), tuple(line[i + 1])))
            for i in range(len(line) - 1)
            if tuple(line[i]) != tuple(line[i + 1])
        }

    assert segs(out) == set().union(*(segs(p) for p in pieces))


@given(simple_rings())
@settings(max_examples=60, deadline=None)
def test_point_in_ring_centroid_of_triangle_fan(ring):
    """A point strictly inside (midpoint of a centroid-vertex segment of
    a convex-ish fan triangle) classifies inside; far points classify
    outside."""
    if abs(signed_area(ring)) < 1e-9:
        return
    bb = ring_bbox(ring)
    assert not point_in_ring(bb[0] - 1.0, bb[1] - 1.0, ring)
    assert not point_in_ring(bb[2] + 1.0, bb[3] + 1.0, ring)


@given(
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
    st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    st.integers(1, 14),
)
@settings(max_examples=120, deadline=None)
def test_cell_roundtrip(lon, lat, level):
    cid = int(np.asarray(cell_id(np.array([lon]), np.array([lat]), level))[0])
    lvl, _x, _y = cell_parts(cid)
    assert lvl == level
    w, s, e, n = cell_bounds(cid)
    # float boundary slack: values within a few ULPs of a cell edge may
    # quantize to the neighbour (deterministically — the SQL oracle
    # reproduces the identical arithmetic)
    assert w - 1e-9 <= lon <= e + 1e-9
    assert s - 1e-9 <= lat <= n + 1e-9
    if level > 1:
        p = cell_parent(cid, level - 1)
        pw, ps, pe, pn = cell_bounds(p)
        assert pw <= w and ps <= s and pe >= e and pn >= n


@given(simple_rings())
@settings(max_examples=60, deadline=None)
def test_close_ring_idempotent(ring):
    assert close_ring(ring) == ring  # already closed
    assert close_ring(ring[:-1]) == ring


def test_repr_f64_strs_byte_identical_to_python_repr():
    """repr_f64_strs must equal repr(float(v)) byte-for-byte — it feeds
    the templated GeoJSON fast paths whose output is byte-compared to
    the reference corpus (json.dumps floats format via float_repr)."""
    from osm2geojson_ray.geom.kernels import repr_f64_strs

    rng = np.random.default_rng(11)
    special = np.array([
        0.0, -0.0, 1e-5, -1e-5, 1e-4, 9.999e-5, 123.0, -7.0, 1e-7,
        1e16, -1e16, 9.999999999999998e15, np.inf, -np.inf, np.nan,
        55.123456789012345, 1e308, 5e-324, 2.5, -2.5, 1e15, 180.0,
        -180.0, 1.5e-4, -1.0000000000000002,
    ])
    coords = rng.uniform(-180, 180, 20_000)
    tiny = rng.normal(0, 1e-3, 5_000)  # straddles the 1e-4 sci threshold
    bits = rng.integers(0, 2**64, 50_000, dtype=np.uint64).view(np.float64)
    for v in (special, coords, tiny, bits, np.empty(0)):
        got = repr_f64_strs(v).to_pylist()
        want = [repr(x) for x in v.tolist()]
        assert got == want


def test_repr_f64_strs_patch_dominated_fallback():
    """A batch that is mostly integral floats takes the pure-repr
    fallback and still matches."""
    from osm2geojson_ray.geom.kernels import repr_f64_strs

    v = np.arange(1000, dtype=np.float64)  # 100% integral
    assert repr_f64_strs(v).to_pylist() == [repr(float(x)) for x in range(1000)]
