"""Fit GEOS CascadedPolygonUnion structure against issue-35 golden.

Emulates JTS STRtree(4) bulk-load + itemsTree + binaryUnion reduction,
computes per-input-polygon union depth (number of real binary unions it
passes through) and the output polygon order, then checks consistency
with the golden ring rotations.
"""

import itertools
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm2geojson_ray.geom.kernels import is_ccw, ring_bbox  # noqa: E402
from osm2geojson_ray.geom.linemerge import linemerge  # noqa: E402

CAP = 4


def str_pack(items):
    """items: list of (idx, (minx,miny,maxx,maxy)). Returns nested tree:
    node = list of children; child = node | ('item', idx)."""
    boundables = [("item", i, env) for i, env in items]

    def centre_x(b):
        return (b[2][0] + b[2][2]) / 2.0

    def centre_y(b):
        return (b[2][1] + b[2][3]) / 2.0

    def env_union(envs):
        return (
            min(e[0] for e in envs),
            min(e[1] for e in envs),
            max(e[2] for e in envs),
            max(e[3] for e in envs),
        )

    def create_parents(children, use_x_slices=True):
        n = len(children)
        min_leaf = math.ceil(n / CAP)
        slice_count = math.ceil(math.sqrt(min_leaf))
        sorted_x = sorted(children, key=centre_x)
        slice_cap = math.ceil(n / slice_count)
        slices = [sorted_x[i : i + slice_cap] for i in range(0, n, slice_cap)]
        parents = []
        for sl in slices:
            sorted_y = sorted(sl, key=centre_y)
            for i in range(0, len(sorted_y), CAP):
                grp = sorted_y[i : i + CAP]
                parents.append(("node", grp, env_union([g[2] for g in grp])))
        return parents

    level = boundables
    while True:
        parents = create_parents(level)
        if len(parents) == 1:
            root = parents[0]
            break
        level = parents
    return root


def items_tree(node):
    out = []
    for child in node[1]:
        if child[0] == "node":
            sub = items_tree(child)
            if sub:
                out.append(sub)
        else:
            out.append(child[1])
    return out


def binary_union(geoms, depths):
    """geoms: list of 'geometry' = list of input indices. Returns merged
    index list; increments depths for every real union."""
    n = len(geoms)
    if n == 0:
        return None
    if n == 1:
        return geoms[0]
    if n == 2:
        return union_safe(geoms[0], geoms[1], depths)
    mid = (n + 0) // 2
    g0 = binary_union(geoms[:mid], depths)
    g1 = binary_union(geoms[mid:], depths)
    return union_safe(g0, g1, depths)


def union_safe(g0, g1, depths):
    if g0 is None and g1 is None:
        return None
    if g0 is None:
        return g1
    if g1 is None:
        return g0
    for i in g0 + g1:
        depths[i] += 1
    return g0 + g1


def union_tree(tree, depths):
    geoms = []
    for o in tree:
        if isinstance(o, list):
            geoms.append(union_tree(o, depths))
        else:
            geoms.append([o])
    return binary_union(geoms, depths)


def cascaded_order_and_depths(polys):
    """polys: list of rings (shell only). Returns (order, depths)."""
    items = [(i, ring_bbox(p)) for i, p in enumerate(polys)]
    root = str_pack(items)
    tree = items_tree(root)
    depths = {i: 0 for i, _ in items}
    order = union_tree(tree, depths)
    return order, depths


def canon(ring):
    open_r = [tuple(p) for p in ring[:-1]]
    best = None
    for seq in (open_r, open_r[::-1]):
        n = len(seq)
        for s in range(n):
            rot = tuple(seq[s:] + seq[:s])
            if best is None or rot < best:
                best = rot
    return best


def rel_transform(src, dst):
    so = [tuple(p) for p in src[:-1]]
    do = [tuple(p) for p in dst[:-1]]
    n = len(so)
    for rev in (False, True):
        s = so[::-1] if rev else so
        for k in range(n):
            if tuple(s[k:] + s[:k]) == tuple(do):
                return rev, k
    return None


def apply_passes(ring, p_unions, final_shell):
    """Forward model: p_unions union passes (canonical shell CW), then
    one output pass as shell/hole of the final overlay, then orient."""
    from osm2geojson_ray.geom.kernels import reverse_ring, rotate_ring

    r = [list(x) for x in ring]
    for _ in range(p_unions):
        if is_ccw(r):
            r = reverse_ring(r)
        r = rotate_ring(r, 1)
    # final overlay pass: shell canonical CW, hole canonical CCW
    if final_shell:
        if is_ccw(r):
            r = reverse_ring(r)
        r = rotate_ring(r, 1)
        if not is_ccw(r):  # orient: shell CCW
            r = reverse_ring(r)
    else:
        if not is_ccw(r):
            r = reverse_ring(r)
        r = rotate_ring(r, 1)
        if is_ccw(r):  # orient: hole CW
            r = reverse_ring(r)
    return r


if __name__ == "__main__":
    d = json.load(open("/root/reference/tests/data/issue-35.json"))
    golden = json.load(open("/root/reference/tests/data/issue-35.geojson"))["features"][0][
        "geometry"
    ]
    rel = [e for e in d["elements"] if e["type"] == "relation"][0]
    wm = [m for m in rel["members"] if m["type"] == "way"]
    role_groups = [
        (role, [[[float(nd["lon"]), float(nd["lat"])] for nd in m["geometry"]] for m in grp])
        for role, grp in itertools.groupby(wm, key=lambda m: m["role"])
    ]
    grings = [
        (pi, ri, r) for pi, poly in enumerate(golden["coordinates"]) for ri, r in enumerate(poly)
    ]

    for role, lines in role_groups:
        merged = [r if r[0] == r[-1] else r + [r[0]] for r in linemerge(lines)]
        if len(merged) < 2:
            print(f"{role}: single merged ring, skip union fit")
            continue
        order, depths = cascaded_order_and_depths(merged)
        print(f"{role}: union order {order}")
        print(f"{role}: depths {[depths[i] for i in order]}")
        final_shell = role == "outer"
        for pos, i in enumerate(order):
            ring = merged[i]
            pred = apply_passes(ring, depths[i], final_shell)
            c = canon(ring)
            hits = [(pi, ri) for pi, ri, gr in grings if canon(gr) == c]
            if not hits:
                print(f"  merged[{i}] NO golden match")
                continue
            pi, ri = hits[0]
            gr = [g for p, r, g in grings if (p, r) == (pi, ri)][0]
            ok = pred == gr
            t = rel_transform(pred, gr)
            print(
                f"  merged[{i}] n={len(ring)-1} depth={depths[i]} -> golden p{pi} r{ri} "
                f"exact={ok}" + ("" if ok else f" resid rev={t[0]} rot={t[1]}")
            )
