"""buffer(0)-style validity repair (reference main.py:264-270).

The reference calls shapely ``poly.buffer(0)`` on invalid polygons.
Documented GEOS zero-buffer behavior on the corpus-style defect classes
(self-touch / self-cross at a shared VERTEX):

- bowtie (figure-eight, lobes wound in opposite directions): the lobe
  wound against the dominant direction is discarded; the dominant lobe
  survives as a simple polygon;
- self-touching ring pinching off a same-winding lobe: both lobes
  survive as separate polygons (a MultiPolygon);
- self-touching ring pinching off an opposite-winding interior loop:
  the loop becomes a hole.

These tests pin that behavior for the from-scratch emulation.
"""

from osm2geojson_ray.geom.assemble import _buffer0_polygon


def _shell_pointsets(mp):
    return {frozenset(tuple(p) for p in poly[0]) for poly in mp}


def test_bowtie_keeps_dominant_lobe():
    # left lobe (0,0)-(1,1)-(0,2) is CCW (+2); right lobe
    # (1,1)-(2,2)-(2,0) is CW (-2) -> right lobe dropped
    bow = [[0, 0], [1, 1], [2, 2], [2, 0], [1, 1], [0, 2], [0, 0]]
    repaired = _buffer0_polygon([bow])
    assert repaired is not None
    assert len(repaired) == 1
    assert len(repaired[0]) == 1  # no holes
    assert _shell_pointsets(repaired) == {
        frozenset({(0, 0), (1, 1), (0, 2)})
    }


def test_self_touching_same_winding_splits():
    # two CCW unit squares sharing the vertex (1,1), one ring
    ring = [
        [0, 0], [1, 0], [1, 1], [2, 1], [2, 2], [1, 2], [1, 1], [0, 1], [0, 0]
    ]
    repaired = _buffer0_polygon([ring])
    assert repaired is not None
    assert len(repaired) == 2  # both squares survive
    assert _shell_pointsets(repaired) == {
        frozenset({(0, 0), (1, 0), (1, 1), (0, 1)}),
        frozenset({(1, 1), (2, 1), (2, 2), (1, 2)}),
    }
    assert all(len(poly) == 1 for poly in repaired)


def test_pinched_hole_becomes_hole():
    # CCW outer 4x4 square with an interior CW loop pinched at (0,0)
    # via a zero-width corridor revisiting (1,1): traversal goes out to
    # the shell, comes back through (1,1), walks the inner loop CW
    pinched = [
        [0, 0], [4, 0], [4, 4], [0, 4], [0, 0],
        [1, 1], [1, 2], [2, 2], [2, 1], [1, 1],
        [0, 0],
    ]
    repaired = _buffer0_polygon([pinched])
    assert repaired is not None
    assert len(repaired) == 1
    poly = repaired[0]
    assert len(poly) == 2  # shell + hole
    assert {tuple(p) for p in poly[0]} == {(0, 0), (4, 0), (4, 4), (0, 4)}
    assert {tuple(p) for p in poly[1]} == {(1, 1), (1, 2), (2, 2), (2, 1)}


def test_valid_polygon_unchanged():
    square = [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]
    assert _buffer0_polygon([square]) == [[square]]
