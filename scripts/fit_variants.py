"""Search cascaded-union emulation variants against issue-35 targets.

Targets (derived from golden):
- inner-group union output order O_inner (hole order in golden poly 0)
- per-ring renode count d_eff
- outer2-group output order O_outer2 (golden polys 1..8)
"""

import itertools
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm2geojson_ray.geom.kernels import ring_bbox  # noqa: E402
from osm2geojson_ray.geom.linemerge import linemerge  # noqa: E402

O_INNER = [8, 3, 4, 2, 5, 1, 0, 6, 7, 11, 9, 10, 16, 14, 13, 19, 17, 12, 18, 20, 15]
D_INNER = {8: 3, 3: 3, 4: 3, 2: 4, 5: 4, 1: 0, 0: 0, 6: 3, 7: 3, 11: 4, 9: 4, 10: 3,
           16: 3, 14: 4, 13: 4, 19: 3, 17: 4, 12: 4, 18: 3, 20: 4, 15: 4}
O_OUTER2 = [0, 6, 3, 5, 2, 4, 1, 7]
D_OUTER2 = {i: 2 for i in O_OUTER2}  # 3 total minus 1 for the final union


def bbox_intersects(a, b):
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def env_union(a, b):
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def str_tree(indices, envs, cap, slice_fn):
    def create_parents(children):
        n = len(children)
        slice_count = slice_fn(n, cap)
        sorted_x = sorted(children, key=lambda b: (b[2][0] + b[2][2]) / 2.0)
        slice_cap = math.ceil(n / slice_count)
        slices = [sorted_x[i:i + slice_cap] for i in range(0, n, slice_cap)]
        parents = []
        for sl in slices:
            sorted_y = sorted(sl, key=lambda b: (b[2][1] + b[2][3]) / 2.0)
            for i in range(0, len(sorted_y), cap):
                grp = sorted_y[i:i + cap]
                env = grp[0][2]
                for g in grp[1:]:
                    env = env_union(env, g[2])
                parents.append(("node", grp, env))
        return parents

    level = [("item", i, envs[i]) for i in indices]
    while True:
        parents = create_parents(level)
        if len(parents) == 1:
            root = parents[0]
            break
        level = parents

    def items(node):
        out = []
        for child in node[1]:
            if child[0] == "node":
                out.append(items(child))
            else:
                out.append(child[1])
        return out

    return items(root)


def run_variant(envs, tree_kind, mid_kind, combine_kind, cap=4):
    n = len(envs)
    renodes = {i: 0 for i in range(n)}

    def env_of(g):
        e = envs[g[0]]
        for i in g[1:]:
            e = env_union(e, envs[i])
        return e

    def union_actual(a, b):
        for i in a + b:
            renodes[i] += 1
        return a + b

    def union_optimized(g0, g1):
        if g0 is None:
            return g1
        if g1 is None:
            return g0
        e0, e1 = env_of(g0), env_of(g1)
        if not bbox_intersects(e0, e1):
            return g0 + g1
        if len(g0) <= 1 and len(g1) <= 1:
            return union_actual(g0, g1)
        common = (max(e0[0], e1[0]), max(e0[1], e1[1]), min(e0[2], e1[2]), min(e0[3], e1[3]))
        disjoint, g0i, g1i = [], [], []
        for i in g0:
            (g0i if bbox_intersects(envs[i], common) else disjoint).append(i)
        for i in g1:
            (g1i if bbox_intersects(envs[i], common) else disjoint).append(i)
        if g0i and g1i:
            unioned = union_actual(g0i, g1i)
        else:
            unioned = g0i or g1i
        if combine_kind == "disjoint_first":
            return disjoint + unioned
        if combine_kind == "union_first":
            return unioned + disjoint
        return disjoint[: len([i for i in g0 if i in disjoint])] + unioned + disjoint[
            len([i for i in g0 if i in disjoint]):
        ]

    def binary_union(geoms):
        n = len(geoms)
        if n == 0:
            return None
        if n == 1:
            return geoms[0]
        if n == 2:
            return union_optimized(geoms[0], geoms[1])
        mid = (n + 1) // 2 if mid_kind == "ceil" else n // 2
        return union_optimized(binary_union(geoms[:mid]), binary_union(geoms[mid:]))

    def union_tree(tree):
        geoms = []
        for o in tree:
            if isinstance(o, list):
                geoms.append(union_tree(o))
            else:
                geoms.append([o])
        return binary_union(geoms)

    if tree_kind == "jts":
        tree = str_tree(list(range(n)), envs, cap, lambda m, c: math.ceil(math.sqrt(math.ceil(m / c))))
    elif tree_kind == "sqrt_n":
        tree = str_tree(list(range(n)), envs, cap, lambda m, c: math.ceil(math.sqrt(m / c)))
    elif tree_kind == "flat_str":
        t = str_tree(list(range(n)), envs, cap, lambda m, c: math.ceil(math.sqrt(math.ceil(m / c))))

        def flatten(x):
            out = []
            for o in x:
                out.extend(flatten(o) if isinstance(o, list) else [o])
            return out

        tree = flatten(t)
    elif tree_kind == "flat_input":
        tree = list(range(n))
    order = union_tree(tree)
    return order, renodes


def main():
    d = json.load(open("/root/reference/tests/data/issue-35.json"))
    rel = [e for e in d["elements"] if e["type"] == "relation"][0]
    wm = [m for m in rel["members"] if m["type"] == "way"]
    role_groups = [
        (role, [[[float(nd["lon"]), float(nd["lat"])] for nd in m["geometry"]] for m in grp])
        for role, grp in itertools.groupby(wm, key=lambda m: m["role"])
    ]
    targets = {"inner": (O_INNER, D_INNER), "outer2": (O_OUTER2, D_OUTER2)}
    groups = {}
    seen_outer = 0
    for role, lines in role_groups:
        merged = [r if r[0] == r[-1] else r + [r[0]] for r in linemerge(lines)]
        if role == "outer":
            seen_outer += 1
            if len(merged) > 1:
                groups["outer2"] = merged
        elif role == "inner":
            groups["inner"] = merged

    best = []
    for tree_kind in ["jts", "sqrt_n", "flat_str", "flat_input"]:
        for mid_kind in ["floor", "ceil"]:
            for combine_kind in ["disjoint_first", "union_first"]:
                for cap in [4, 10, 16]:
                    score = 0
                    detail = {}
                    for key, merged in groups.items():
                        envs = [ring_bbox(r) for r in merged]
                        order, renodes = run_variant(envs, tree_kind, mid_kind, combine_kind, cap)
                        to, td = targets[key]
                        order_ok = order == to
                        d_ok = sum(renodes[i] == td[i] for i in renodes)
                        score += (100 if order_ok else 0) + d_ok
                        detail[key] = (order_ok, d_ok, len(renodes))
                    best.append((score, tree_kind, mid_kind, combine_kind, cap, detail))
    best.sort(reverse=True)
    for b in best[:10]:
        print(b)


if __name__ == "__main__":
    main()
