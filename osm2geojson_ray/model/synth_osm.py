"""Deterministic synthetic OSM element tables for benchmarks
(FIXTURES.md §A scale-up spec: jittered node grid, 2-50-node ways with
~30% closed, outer/inner relations, tag mix drawn from the polygon
rules, plus a few mega-relations to exercise skew salting).

Seeded (42) and pure — the same (n_nodes, ...) always yields the same
table, so bench inputs are reproducible and cacheable."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._tag_rules import POLYGON_FEATURES
from .schema import elements_table

_TAG_CHOICES = [
    {"building": "yes"},
    {"highway": "residential"},
    {"landuse": "grass"},
    {"waterway": "river"},
    {"leisure": "park"},
    {"natural": "water"},
    {"barrier": "wall"},
    {},
]


def synth_elements(
    n_nodes: int = 10000,
    n_ways: int = 1000,
    n_relations: int = 50,
    n_mega_relations: int = 2,
    mega_members: int = 2000,
    seed: int = 42,
):
    """Element dicts: nodes on a jittered grid, ways referencing
    consecutive node runs, multipolygon relations over closed ways."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n_nodes)))
    ids = np.arange(1, n_nodes + 1)
    gx = (ids - 1) % side
    gy = (ids - 1) // side
    lon = -10.0 + gx * (20.0 / side) + rng.uniform(-0.001, 0.001, n_nodes)
    lat = -10.0 + gy * (20.0 / side) + rng.uniform(-0.001, 0.001, n_nodes)

    elements = []
    for i in range(n_nodes):
        el = {"type": "node", "id": int(ids[i]), "lon": float(lon[i]), "lat": float(lat[i])}
        if i % 97 == 0:
            el["tags"] = {"amenity": "bench"}
        elements.append(el)

    way_id0 = n_nodes + 1
    closed_ways = []
    for w in range(n_ways):
        length = int(rng.integers(2, 51))
        start = int(rng.integers(0, max(1, n_nodes - length)))
        refs = [int(ids[start + j]) for j in range(length)]
        closed = rng.random() < 0.3 and length >= 3
        if closed:
            refs.append(refs[0])
        el = {"type": "way", "id": way_id0 + w, "nodes": refs}
        tags = _TAG_CHOICES[int(rng.integers(0, len(_TAG_CHOICES)))]
        if tags:
            el["tags"] = dict(tags)
        if closed:
            closed_ways.append(way_id0 + w)
        elements.append(el)

    rel_id0 = way_id0 + n_ways + 1
    total_rels = n_relations + n_mega_relations
    for r in range(total_rels):
        n_members = (
            mega_members if r >= n_relations else int(rng.integers(2, 20))
        )
        members = []
        for m in range(n_members):
            if not closed_ways:
                break
            ref = closed_ways[int(rng.integers(0, len(closed_ways)))]
            role = "outer" if m == 0 or rng.random() < 0.7 else "inner"
            members.append({"type": "way", "ref": ref, "role": role})
        el = {
            "type": "relation",
            "id": rel_id0 + r,
            "members": members,
            "tags": {"type": "multipolygon", "landuse": "forest"},
        }
        elements.append(el)
    return elements


def synth_elements_table(**kwargs) -> pa.Table:
    return elements_table(synth_elements(**kwargs))
