"""Diff the document converter against the reference golden corpus.

Usage: python scripts/fit_corpus.py [case ...]
Prints PASS/FAIL per case plus the first structural difference.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2geojson_ray import json2geojson, xml2geojson  # noqa: E402

DATA = "/root/reference/tests/data"


def first_diff(a, b, path="$"):
    if type(a) is not type(b):
        return f"{path}: type {type(a).__name__} != {type(b).__name__} ({a!r} vs {b!r})"
    if isinstance(a, dict):
        for k in a:
            if k not in b:
                return f"{path}.{k}: only in ours ({a[k]!r})"
        for k in b:
            if k not in a:
                return f"{path}.{k}: only in golden ({b[k]!r})"
        for k in a:
            d = first_diff(a[k], b[k], f"{path}.{k}")
            if d:
                return d
        return None
    if isinstance(a, list):
        if len(a) != len(b):
            return f"{path}: len {len(a)} != {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            d = first_diff(x, y, f"{path}[{i}]")
            if d:
                return d
        return None
    if a != b:
        return f"{path}: {a!r} != {b!r}"
    return None


def run_case(base, kwargs=None):
    golden_name = base + ".geojson"
    with open(os.path.join(DATA, golden_name)) as f:
        golden = json.load(f)
    src = kwargs.pop("_src", None) if kwargs else None
    kwargs = kwargs or {}
    json_path = os.path.join(DATA, (src or base) + ".json")
    osm_path = os.path.join(DATA, (src or base) + ".osm")
    results = {}
    if os.path.exists(json_path):
        with open(json_path) as f:
            results["json"] = json2geojson(f.read(), **kwargs)
    if os.path.exists(osm_path):
        with open(osm_path) as f:
            results["xml"] = xml2geojson(f.read(), **kwargs)
    ok = True
    for kind, got in results.items():
        d = first_diff(got, golden)
        if d:
            ok = False
            print(f"FAIL {base} [{kind}]: {d}")
    if ok and results:
        print(f"PASS {base}")
    if not results:
        print(f"SKIP {base}: no input found")
    return ok


CASES = [
    ("empty", None),
    ("node", None),
    ("way", None),
    ("relation", None),
    ("map", None),
    ("barrier-wall", None),
    ("center-feature", None),
    ("meta", None),
    ("issue-4", None),
    ("issue-6", None),
    ("issue-7", None),
    ("issue-9", None),
    ("issue-9-all", {"filter_used_refs": False, "_src": "issue-9"}),
    ("issue-16", None),
    ("issue-35", None),
    ("issue-52-highway-service-closed", None),
]

if __name__ == "__main__":
    wanted = set(sys.argv[1:])
    n_ok = n_all = 0
    for base, kwargs in CASES:
        if wanted and base not in wanted:
            continue
        n_all += 1
        n_ok += bool(run_case(base, dict(kwargs) if kwargs else None))
    print(f"{n_ok}/{n_all} cases pass")
