"""Core ring/polygon kernels: area, orientation, containment, validity.

Rings are lists of ``[lon, lat]`` pairs, closed (first == last).
Polygons are ``[shell, hole1, ...]``; multipolygons lists of polygons.
Pure Python with O(n) / O(n log n) algorithms — ring sizes in OSM data
are small; bulk parallelism comes from Ray Data batching above, not
vectorization inside a single ring.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

Pt = Sequence[float]
Ring = List[List[float]]


def signed_area(ring: Ring) -> float:
    """Shoelace signed area; > 0 for counter-clockwise rings."""
    a = 0.0
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[i + 1][0], ring[i + 1][1]
        a += x1 * y2 - x2 * y1
    return a / 2.0


def is_ccw(ring: Ring) -> bool:
    return signed_area(ring) > 0


def rings_equal(a: Pt, b: Pt) -> bool:
    return a[0] == b[0] and a[1] == b[1]


def close_ring(ring: Ring) -> Ring:
    """Append the first coordinate if the ring is not closed (the same
    auto-close Polygon() applies in the reference, main.py:356)."""
    if ring and not rings_equal(ring[0], ring[-1]):
        return list(ring) + [list(ring[0])]
    return list(ring)


def reverse_ring(ring: Ring) -> Ring:
    """Reverse a closed ring; since first == last the start coordinate
    is preserved ([a,b,c,a] -> [a,c,b,a])."""
    return [list(p) for p in reversed(ring)]


def rotate_ring(ring: Ring, start: int) -> Ring:
    """Rotate a closed ring so it starts at index ``start`` (of the open
    representation); output is closed again."""
    open_ring = ring[:-1]
    n = len(open_ring)
    start %= n
    out = open_ring[start:] + open_ring[:start]
    out.append(list(out[0]))
    return out


def orient_ring(ring: Ring, ccw: bool) -> Ring:
    """Force orientation; a reversal of a closed ring keeps the first
    point first ([a,b,c,a] -> [a,c,b,a]), matching shapely's orient."""
    if is_ccw(ring) == ccw:
        return list(ring)
    return [list(ring[0])] + [list(p) for p in reversed(ring[1:-1])] + [list(ring[0])]


def orient_polygon(poly: List[Ring]) -> List[Ring]:
    """RFC 7946 orientation: exterior CCW, holes CW (reference
    ``orient_multipolygon``, main.py:259-261 via shapely orient(sign=1))."""
    out = [orient_ring(poly[0], ccw=True)]
    for hole in poly[1:]:
        out.append(orient_ring(hole, ccw=False))
    return out


def orient_multipolygon(mp: List[List[Ring]]) -> List[List[Ring]]:
    return [orient_polygon(p) for p in mp]


def ring_bbox(ring: Ring) -> Tuple[float, float, float, float]:
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    return (min(xs), min(ys), max(xs), max(ys))


def bbox_contains(outer: Tuple[float, float, float, float], inner) -> bool:
    return (
        outer[0] <= inner[0]
        and outer[1] <= inner[1]
        and outer[2] >= inner[2]
        and outer[3] >= inner[3]
    )


def bbox_intersects(a, b) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def point_in_ring(x: float, y: float, ring: Ring) -> bool:
    """Even-odd rule; points exactly on an edge are treated as inside
    (adequate for hole-assignment + the PIP join, where the synthetic
    points avoid boundaries)."""
    inside = False
    n = len(ring)
    j = n - 2  # ring closed: skip duplicate last point
    for i in range(n - 1):
        xi, yi = ring[i][0], ring[i][1]
        xj, yj = ring[j][0], ring[j][1]
        if (yi > y) != (yj > y):
            t = (y - yi) / (yj - yi)
            xcross = xi + t * (xj - xi)
            if x < xcross:
                inside = not inside
            elif x == xcross:
                return True
        elif yi == y and xi == x:
            return True
        j = i
    return inside


def point_in_polygon(x: float, y: float, poly: List[Ring]) -> bool:
    if not point_in_ring(x, y, poly[0]):
        return False
    for hole in poly[1:]:
        if point_in_ring(x, y, hole):
            return False
    return True


def points_in_ring_many(xs, ys, ring: Ring):
    """Vectorized ``point_in_ring`` over point arrays — identical
    semantics (even-odd parity; a point exactly on a crossing edge or
    equal to a vertex counts as inside) and identical float expressions
    per element, chunked so the points x edges matrix stays bounded."""
    import numpy as np

    pts = np.asarray(ring, dtype=np.float64)
    xi = pts[:-1, 0]
    yi = pts[:-1, 1]
    # edge partner is the PREVIOUS vertex (j = i-1, wrapping to n-2),
    # matching the scalar loop's (i, j) pairing and operand order
    xj = np.roll(xi, 1)
    yj = np.roll(yi, 1)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    npts, nedge = len(xs), len(xi)
    out = np.zeros(npts, dtype=bool)
    if npts == 0 or nedge == 0:
        return out
    # exact-preserving edge prefilter: an edge entirely left of every
    # point (max edge x < min point x => x < xcross impossible and no
    # vertex can equal a point) or with a y-interval missing the point
    # y-range (no crossing, no vertex match) contributes nothing
    min_x = xs.min()
    min_y, max_y = ys.min(), ys.max()
    e_hi_x = np.maximum(xi, xj)
    e_lo_y = np.minimum(yi, yj)
    e_hi_y = np.maximum(yi, yj)
    live = (e_hi_x >= min_x) & (e_lo_y <= max_y) & (e_hi_y >= min_y)
    if not live.all():
        xi, yi, xj, yj = xi[live], yi[live], xj[live], yj[live]
        nedge = len(xi)
        if nedge == 0:
            return out
    def eval_pairs(p_idx: "np.ndarray", e_idx: "np.ndarray"):
        """The exact per-pair predicate over a points x edges block —
        identical float expressions regardless of which (superset of
        relevant) edges are enumerated, because an edge whose y-interval
        misses a point's y contributes neither a crossing, an on-edge
        hit, nor a vertex match."""
        x = xs[p_idx][:, None]
        y = ys[p_idx][:, None]
        exi, eyi, exj, eyj = xi[e_idx], yi[e_idx], xj[e_idx], yj[e_idx]
        crossing = (eyi[None, :] > y) != (eyj[None, :] > y)
        t = (y - eyi[None, :]) / np.where(crossing, eyj[None, :] - eyi[None, :], 1.0)
        xcross = exi[None, :] + t * (exj[None, :] - exi[None, :])
        inside = ((crossing & (x < xcross)).sum(axis=1) % 2) == 1
        on_edge = (crossing & (x == xcross)).any(axis=1)
        at_vertex = ((eyi[None, :] == y) & (exi[None, :] == x)).any(axis=1)
        out[p_idx] = inside | on_edge | at_vertex

    all_edges = np.arange(nedge)
    if npts * nedge <= 500_000 or nedge < 64:
        chunk = max(1, int(500_000 // nedge))
        for s in range(0, npts, chunk):
            eval_pairs(np.arange(s, min(npts, s + chunk)), all_edges)
        return out
    # large case: Y-BINNED pair enumeration.  Every edge relevant to a
    # point's predicate has the point's y inside its [min(yi,yj),
    # max(yi,yj)] interval, and floor((v - ymin) * scale) is monotone in
    # v (IEEE multiply/subtract are monotone), so replicating each edge
    # to its bin RANGE guarantees the point's bin is covered — the bin
    # pass only prunes pairs whose predicate is identically false.
    # 21k points x 21k edges: 454M pairs -> a few M.
    e_lo = np.minimum(yi, yj)
    e_hi = np.maximum(yi, yj)
    ymin = min(float(ys.min()), float(e_lo.min()))
    ymax = max(float(ys.max()), float(e_hi.max()))
    if ymax <= ymin:
        chunk = max(1, int(4_000_000 // nedge))
        for s in range(0, npts, chunk):
            eval_pairs(np.arange(s, min(npts, s + chunk)), all_edges)
        return out
    nbins = int(np.clip(np.sqrt(min(npts, nedge)) * 4, 16, 2048))
    scale = nbins / (ymax - ymin)
    p_bin = np.clip(((ys - ymin) * scale).astype(np.int64), 0, nbins - 1)
    e_b0 = np.clip(((e_lo - ymin) * scale).astype(np.int64), 0, nbins - 1)
    e_b1 = np.clip(((e_hi - ymin) * scale).astype(np.int64), 0, nbins - 1)
    counts = e_b1 - e_b0 + 1
    rep_edges = np.repeat(all_edges, counts)
    offs = np.arange(len(rep_edges)) - np.repeat(np.cumsum(counts) - counts, counts)
    rep_bins = np.repeat(e_b0, counts) + offs
    e_order = np.argsort(rep_bins, kind="stable")
    rep_edges_sorted = rep_edges[e_order]
    bin_starts = np.searchsorted(rep_bins[e_order], np.arange(nbins + 1))
    p_order = np.argsort(p_bin, kind="stable")
    p_starts = np.searchsorted(p_bin[p_order], np.arange(nbins + 1))
    for b in range(nbins):
        ps = p_order[p_starts[b] : p_starts[b + 1]]
        if not len(ps):
            continue
        es = rep_edges_sorted[bin_starts[b] : bin_starts[b + 1]]
        if not len(es):
            continue
        eval_pairs(ps, es)
    return out


def ring_contains_ring(outer: Ring, inner: Ring) -> bool:
    """True when every tested vertex of ``inner`` lies inside ``outer``
    (bbox pre-check + vectorized even-odd vertex test; corpus rings do
    not cross)."""
    if not bbox_contains(ring_bbox(outer), ring_bbox(inner)):
        return False
    import numpy as np

    pts = np.asarray(inner[:-1], dtype=np.float64)
    if len(pts) == 0:
        return True
    return bool(points_in_ring_many(pts[:, 0], pts[:, 1], outer).all())


def _segments_properly_intersect(p1, p2, p3, p4) -> bool:
    def orient2(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    d1 = orient2(p3, p4, p1)
    d2 = orient2(p3, p4, p2)
    d3 = orient2(p1, p2, p3)
    d4 = orient2(p1, p2, p4)
    if d1 != d2 and d3 != d4 and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0:
        return True
    return False


def ring_self_intersects(ring: Ring) -> bool:
    """Proper self-intersection test (bowtie detection).  Shared
    endpoints between adjacent segments are not intersections; repeated
    non-adjacent vertices (self-touch) are allowed, matching GEOS
    is_valid for rings only loosely — adequate as the corpus-exercised
    validity gate (reference fix_invalid_polygon, main.py:264-270).
    Vectorized with numpy for rings above a small size."""
    n = len(ring) - 1
    if n < 3:
        return False
    if n <= 48:
        segs = [(ring[i], ring[i + 1]) for i in range(n)]
        for i in range(n):
            for j in range(i + 2, n):
                if i == 0 and j == n - 1:
                    continue  # first and last share the ring-closure point
                if _segments_properly_intersect(*segs[i], *segs[j]):
                    return True
        return False
    return _ring_self_intersects_np(ring)


def _ring_self_intersects_np(ring: Ring) -> bool:
    """Sweep over segments sorted by min-x: each segment is only paired
    with the following segments whose x-interval overlaps its own
    (searchsorted range), so candidate count is ~n x local overlap
    instead of the dense n^2 matrix — real boundary rings (20k+ points)
    drop from seconds to milliseconds."""
    import numpy as np

    pts = np.asarray(ring, dtype=np.float64)
    p1, p2 = pts[:-1], pts[1:]
    n = len(p1)
    lo = np.minimum(p1, p2)
    hi = np.maximum(p1, p2)
    order = np.argsort(lo[:, 0], kind="stable")
    lox = lo[order, 0]
    hix = hi[order, 0]
    # candidates for sorted position a: positions b in (a, end_a) where
    # lox[b] <= hix[a]  (x-intervals overlap; sortedness gives the rest)
    ends = np.searchsorted(lox, hix, side="right")
    counts = np.maximum(ends - np.arange(n) - 1, 0)
    total = int(counts.sum())
    if total == 0:
        return False
    a_pos = np.repeat(np.arange(n), counts)
    cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
    b_pos = a_pos + 1 + (np.arange(total) - np.repeat(cum, counts))
    ii = order[a_pos]
    jj = order[b_pos]
    # orient as (i < j) segment-index pairs for the adjacency rules
    swap = ii > jj
    ii, jj = np.where(swap, jj, ii), np.where(swap, ii, jj)
    keep = jj >= ii + 2
    keep &= ~((ii == 0) & (jj == n - 1))
    # y-interval overlap prefilter
    keep &= (lo[ii, 1] <= hi[jj, 1]) & (lo[jj, 1] <= hi[ii, 1])
    if not keep.any():
        return False
    ii, jj = ii[keep], jj[keep]
    chunk = 4_000_000
    for s in range(0, len(ii), chunk):
        ic, jc = ii[s : s + chunk], jj[s : s + chunk]
        a1, a2 = p1[ic], p2[ic]
        b1, b2 = p1[jc], p2[jc]

        def cross(o, a, b):
            return (a[:, 0] - o[:, 0]) * (b[:, 1] - o[:, 1]) - (a[:, 1] - o[:, 1]) * (
                b[:, 0] - o[:, 0]
            )

        d1 = np.sign(cross(b1, b2, a1))
        d2 = np.sign(cross(b1, b2, a2))
        d3 = np.sign(cross(a1, a2, b1))
        d4 = np.sign(cross(a1, a2, b2))
        hit = (d1 != d2) & (d3 != d4) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
        if hit.any():
            return True
    return False


def is_valid_polygon(poly: List[Ring]) -> bool:
    """Corpus-grade validity: rings closed with >= 4 points, no proper
    self-intersection, holes inside the shell."""
    for ring in poly:
        if len(ring) < 4 or not rings_equal(ring[0], ring[-1]):
            return False
        if ring_self_intersects(ring):
            return False
    for hole in poly[1:]:
        if not ring_contains_ring(poly[0], hole):
            return False
    return True


def is_valid_multipolygon(mp: List[List[Ring]]) -> bool:
    return all(is_valid_polygon(p) for p in mp)


def dedupe_consecutive(coords: Ring) -> Ring:
    """Drop consecutive duplicate coordinates (GEOS drops repeated
    points when constructing geometries from sequences)."""
    out: Ring = []
    for p in coords:
        if not out or not rings_equal(out[-1], p):
            out.append(list(p))
    return out


def repr_f64_strs(values):
    """Vectorized Python-``repr``-byte-identical float formatting.

    Returns a ``pyarrow`` string array whose elements equal
    ``repr(float(v))`` for every v in ``values`` (a float64 numpy
    array).  Arrow's float->string cast emits the same unique
    shortest-round-trip digit string as CPython's ``float_repr`` (both
    are Ryu/Grisu-style), but the two diverge in *presentation* for
    four classes, which are detected vectorized and patched with the
    exact ``repr``:

    - integral values (Arrow ``123`` vs Python ``123.0``; also ``0``/``-0``),
    - ``|v| < 1e-4`` (Python switches to scientific below 1e-4,
      Arrow later and with a different exponent format),
    - ``|v| >= 1e16`` (Python ``1e+16`` vs Arrow plain digits),
    - non-finite (``nan``/``inf`` spellings).

    Coordinate-like data hits the patch classes at ~1e-6 rates, so the
    whole column formats in Arrow; if a batch is patch-dominated
    (>5 %), fall back to one ``repr`` loop — correct either way.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    v = np.ascontiguousarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return pa.array([], pa.string())
    av = np.abs(v)
    with np.errstate(invalid="ignore"):
        odd = (av < 1e-4) | (av >= 1e16) | (np.trunc(v) == v) | ~np.isfinite(v)
    n_odd = int(odd.sum())
    if n_odd > n // 20:
        return pa.array([repr(x) for x in v.tolist()], pa.string())
    s = pc.cast(pa.array(v), pa.string())
    if n_odd:
        idx = np.flatnonzero(odd)
        repl = np.full(n, "", dtype=object)
        vi = v[idx].tolist()
        for k, i in enumerate(idx.tolist()):
            repl[i] = repr(vi[k])
        s = pc.if_else(pa.array(odd), pa.array(repl, pa.string()), s)
    return s
