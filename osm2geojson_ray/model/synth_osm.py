"""Deterministic synthetic OSM element tables for benchmarks
(FIXTURES.md §A scale-up spec).

Geometry is deliberately realistic-simple: nodes sit on a jittered
grid; line ways are consecutive grid runs; area ways are axis-aligned
grid rectangles (jitter << spacing keeps them simple polygons);
multipolygon relations pair an outer rectangle with a strictly nested
inner one (hole-punching exercises the overlay kernels), and a few
mega-relations carry thousands of disjoint outer rectangles (the
cascaded-union / skew path).

Seeded (42) and pure — the same arguments always yield the same table,
so bench inputs are reproducible and cacheable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schema import elements_table

_LINE_TAGS = [{"highway": "residential"}, {"waterway": "river"}, {"barrier": "wall"}, {}]
_AREA_TAGS = [{"building": "yes"}, {"landuse": "grass"}, {"leisure": "park"}, {"natural": "water"}]


def synth_elements(
    n_nodes: int = 10000,
    n_ways: int = 1000,
    n_relations: int = 50,
    n_mega_relations: int = 2,
    mega_members: int = 2000,
    seed: int = 42,
):
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n_nodes)))
    n_nodes = side * side  # full grid simplifies rectangle picking
    ids = np.arange(1, n_nodes + 1)
    gx = (ids - 1) % side
    gy = (ids - 1) // side
    spacing = 20.0 / side
    jitter = spacing * 0.01
    lon = -10.0 + gx * spacing + rng.uniform(-jitter, jitter, n_nodes)
    lat = -10.0 + gy * spacing + rng.uniform(-jitter, jitter, n_nodes)

    def node_id(x, y):
        return int(y * side + x + 1)

    elements = []
    for i in range(n_nodes):
        el = {"type": "node", "id": int(ids[i]), "lon": float(lon[i]), "lat": float(lat[i])}
        if i % 97 == 0:
            el["tags"] = {"amenity": "bench"}
        elements.append(el)

    def rect_refs(x0, y0, w, h):
        r = [node_id(x0, y0), node_id(x0 + w, y0), node_id(x0 + w, y0 + h), node_id(x0, y0 + h)]
        return r + [r[0]]

    way_id0 = n_nodes + 1
    area_ways = []  # (way_id, x0, y0, w, h)
    wid = way_id0
    for w in range(n_ways):
        if rng.random() < 0.3:
            # area way: grid rectangle
            rw = int(rng.integers(1, 6))
            rh = int(rng.integers(1, 6))
            x0 = int(rng.integers(0, side - rw - 1))
            y0 = int(rng.integers(0, side - rh - 1))
            el = {
                "type": "way",
                "id": wid,
                "nodes": rect_refs(x0, y0, rw, rh),
                "tags": dict(_AREA_TAGS[int(rng.integers(0, len(_AREA_TAGS)))]),
            }
            area_ways.append((wid, x0, y0, rw, rh))
        else:
            # line way: consecutive run inside one grid row
            length = int(rng.integers(2, 51))
            y0 = int(rng.integers(0, side))
            x0 = int(rng.integers(0, max(1, side - length)))
            refs = [node_id(min(x0 + j, side - 1), y0) for j in range(length)]
            el = {"type": "way", "id": wid, "nodes": refs}
            tags = _LINE_TAGS[int(rng.integers(0, len(_LINE_TAGS)))]
            if tags:
                el["tags"] = dict(tags)
        elements.append(el)
        wid += 1

    # dedicated relation member ways: nested rectangle pairs
    # (relation ids assigned AFTER all ways so the bare-id used-filter
    # can't collide them with member way ids)
    next_way = wid

    def add_rect_way(x0, y0, rw, rh):
        nonlocal next_way
        el = {"type": "way", "id": next_way, "nodes": rect_refs(x0, y0, rw, rh)}
        elements.append(el)
        next_way += 1
        return el["id"]

    rel_specs = []
    for r in range(n_relations):
        rw = int(rng.integers(6, 12))
        rh = int(rng.integers(6, 12))
        x0 = int(rng.integers(0, side - rw - 1))
        y0 = int(rng.integers(0, side - rh - 1))
        outer = add_rect_way(x0, y0, rw, rh)
        inner = add_rect_way(x0 + 2, y0 + 2, rw - 4, rh - 4)
        rel_specs.append(
            {
                "members": [
                    {"type": "way", "ref": outer, "role": "outer"},
                    {"type": "way", "ref": inner, "role": "inner"},
                ],
                "tags": {"type": "multipolygon", "landuse": "forest"},
            }
        )

    # mega-relations: many disjoint outer rectangles (one per grid row
    # band) — the hot-key / cascaded-union stressor
    for m in range(n_mega_relations):
        members = []
        for k in range(mega_members):
            x0 = (3 * k) % max(1, side - 2)
            y0 = (2 * k * 7 + m) % max(1, side - 2)
            ref = add_rect_way(min(x0, side - 2), min(y0, side - 2), 1, 1)
            members.append({"type": "way", "ref": ref, "role": "outer"})
        rel_specs.append(
            {
                "members": members,
                "tags": {"type": "multipolygon", "natural": "scrub"},
            }
        )
    rel_id0 = next_way + 1
    for r, spec in enumerate(rel_specs):
        elements.append({"type": "relation", "id": rel_id0 + r, **spec})
    return elements


def synth_elements_table(**kwargs) -> pa.Table:
    return elements_table(synth_elements(**kwargs))
