"""issue-35: test the 'sorted emission per actual overlay union' hypothesis.

Round-3 order fitting (docs/issue35_byte_equality.md) established:
- uu(21) golden order == sorted(input[0:12], key=env.miny) ++
  sorted(input[12:21], key=env.miny)   (input-contiguous 12|9 split)
- uu(8) golden order == global sort by env center-y
- no single envelope sort fits both -> "scan-order emission" conjecture.

The one combination those passes did NOT test: a cascaded fold over
input-chunked leaves where every ACTUAL overlay union re-sorts its
output components by an emission key, while envelope-DISJOINT combines
concatenate (GeometryCombiner preserves side order).  Under that model
uu(21) = concat(sort(left), sort(right)) iff the fold's top sides are
{0..11} | {12..20} and envelope-disjoint, while uu(8) = sort(all 8) iff
its top union is an actual overlay — allowing DIFFERENT effective
behavior from ONE mechanism.  The open question is whether one
emission key fits both (miny fits uu(21)'s parts; cy fits uu(8)).

Usage: python scripts/fit_emission.py
"""

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from osm2geojson_ray.geom.kernels import ring_bbox  # noqa: E402
from osm2geojson_ray.geom.linemerge import linemerge  # noqa: E402

O_INNER = [8, 3, 4, 2, 5, 1, 0, 6, 7, 11, 9, 10, 16, 14, 13, 19, 17, 12, 18, 20, 15]
O_OUTER2 = [0, 6, 3, 5, 2, 4, 1, 7]


def bbox_intersects(a, b):
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def env_of(envs, g):
    e = envs[g[0]]
    for i in g[1:]:
        e = (min(e[0], envs[i][0]), min(e[1], envs[i][1]),
             max(e[2], envs[i][2]), max(e[3], envs[i][3]))
    return e


EMISSION_KEYS = {
    "miny": lambda env, ring: env[1],
    "cy": lambda env, ring: (env[1] + env[3]) / 2.0,
    "minx": lambda env, ring: env[0],
    "cx": lambda env, ring: (env[0] + env[2]) / 2.0,
    "min_vertex_yx": lambda env, ring: min((p[1], p[0]) for p in ring),
    "miny_then_minx": lambda env, ring: (env[1], env[0]),
}


def fold(envs, rings, items, emission, chunk, mid_kind):
    """Cascade: chunk leaves in INPUT order, balanced binary fold.
    Actual union (env overlap) -> emission sort; disjoint -> concat."""

    def union2(a, b):
        if not bbox_intersects(env_of(envs, a), env_of(envs, b)):
            return a + b  # GeometryCombiner: concat, order preserved
        out = a + b
        return sorted(out, key=lambda i: emission(envs[i], rings[i]))

    def binary(geoms):
        n = len(geoms)
        if n == 1:
            return geoms[0]
        if n == 2:
            return union2(geoms[0], geoms[1])
        mid = (n + 1) // 2 if mid_kind == "ceil" else n // 2
        return union2(binary(geoms[:mid]), binary(geoms[mid:]))

    leaves = [items[i:i + chunk] for i in range(0, len(items), chunk)]
    folded = [binary([[i] for i in leaf]) for leaf in leaves]
    return binary(folded)


def main():
    d = json.load(open("/root/reference/tests/data/issue-35.json"))
    rel = [e for e in d["elements"] if e["type"] == "relation"][0]
    wm = [m for m in rel["members"] if m["type"] == "way"]
    groups = {}
    for role, grp in itertools.groupby(wm, key=lambda m: m["role"]):
        lines = [[[float(nd["lon"]), float(nd["lat"])] for nd in m["geometry"]]
                 for m in grp]
        merged = [r if r[0] == r[-1] else r + [r[0]] for r in linemerge(lines)]
        if role == "inner":
            groups["inner"] = merged
        elif role == "outer" and len(merged) > 1:
            groups["outer2"] = merged

    targets = {"inner": O_INNER, "outer2": O_OUTER2}
    hits = []
    for key_name, emission in EMISSION_KEYS.items():
        for chunk in (2, 3, 4, 8, 10, 16):
            for mid_kind in ("floor", "ceil"):
                ok = {}
                for gname, merged in groups.items():
                    envs = [ring_bbox(r) for r in merged]
                    order = fold(envs, merged, list(range(len(merged))),
                                 emission, chunk, mid_kind)
                    ok[gname] = (order == targets[gname], order)
                both = all(v[0] for v in ok.values())
                hits.append((both, key_name, chunk, mid_kind,
                             {g: v[0] for g, v in ok.items()}))
                if both:
                    print("EXACT FIT:", key_name, chunk, mid_kind)
    full = [h for h in hits if h[0]]
    partial = [h for h in hits if not h[0] and any(h[4].values())]
    print("full fits:", len(full))
    for h in partial:
        print("partial:", h[1:])
    if not full and not partial:
        print("no fits under the emission-sort + disjoint-concat model")


if __name__ == "__main__":
    main()
