"""Element -> shape conversion kernels (reference parity: main.py:183-788).

These functions are the per-group compute of the distributed pipeline:
once a shuffle has co-located a way with its nodes (or a relation with
its member ways), the group payload is a small dict index and the
assembly below runs inside ``map_groups`` / ``map_batches`` workers.
They also run standalone over a whole small document (the conformance
path for the reference's golden corpus).

Shapes are ``{"shape": <geojson geometry dict>, "properties": dict}``.
``used`` marks are written onto the index elements exactly like the
reference mutates ``refs_index`` (main.py:293, 317-323, 529, 609); the
distributed pipeline reads them back off the group and emits
(used_id, consumer) pair records instead of sharing state.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Tuple

from ..classify import DEFAULT_CLASSIFIER, PolygonClassifier, element_ring_closed
from . import overlay
from .kernels import (
    close_ring,
    is_valid_multipolygon,
    is_valid_polygon,
    orient_multipolygon,
    rings_equal,
)
from .linemerge import linemerge


class AssemblyError(Exception):
    """Raised when raise_on_failure is set and a conversion fails."""


PROP_KEYS = ["type", "id", "tags", "nodes", "timestamp", "user", "uid", "version"]


def element_props(el: dict) -> dict:
    """Whitelist projection (main.py:236-238; note ``changeset`` is
    parsed but intentionally dropped here)."""
    return {k: el[k] for k in PROP_KEYS if k in el}


def ref_key(el_type: str, el_id) -> str:
    return f"{el_type}/{el_id}"


def build_refs_index(elements: List[dict]) -> Dict[str, dict]:
    """Last-wins on duplicate keys, like the reference dict comprehension
    (main.py:228-229)."""
    return {ref_key(el["type"], el["id"]): el for el in elements}


def _fail(message: str, raise_on_failure: bool) -> None:
    if raise_on_failure:
        raise AssemblyError(message)


def element_to_shape(
    el: dict,
    refs_index: Optional[Dict[str, dict]] = None,
    classifier: PolygonClassifier = DEFAULT_CLASSIFIER,
    raise_on_failure: bool = False,
) -> Optional[dict]:
    t = el.get("type")
    if t == "node":
        return node_to_shape(el)
    if t == "way":
        return way_to_shape(el, refs_index, classifier, raise_on_failure)
    if t == "relation":
        return relation_to_shape(el, refs_index, classifier, raise_on_failure)
    # Overpass `count` (and any unknown kind) falls through with a
    # warning, reference main.py:199-200
    import logging

    logging.getLogger("osm2geojson_ray").warning(
        "Failed to convert element to shape"
    )
    return None


def node_to_shape(node: dict) -> dict:
    # float() coercion everywhere coordinates enter a shape: JSON input
    # may carry ints, but shapely-produced goldens are all-float
    return {
        "shape": {"type": "Point", "coordinates": [float(node["lon"]), float(node["lat"])]},
        "properties": element_props(node),
    }


def way_to_shape(
    way: dict,
    refs_index: Optional[Dict[str, dict]],
    classifier: PolygonClassifier = DEFAULT_CLASSIFIER,
    raise_on_failure: bool = False,
) -> Optional[dict]:
    refs_index = refs_index or {}

    if "center" in way:
        c = way["center"]
        return {
            "shape": {"type": "Point", "coordinates": [float(c["lon"]), float(c["lat"])]},
            "properties": element_props(way),
        }

    if way.get("geometry"):
        coords = [[float(nd["lon"]), float(nd["lat"])] for nd in way["geometry"]]

    elif way.get("_coords") is not None:
        # distributed path: node coordinates already resolved by the
        # way⋈node shuffle; classifier closure still follows the
        # original `nodes` refs (element_ring_closed), preserving the
        # reference's node-id-based open-ring semantics
        coords = [list(c) for c in way["_coords"]]

    elif way.get("nodes"):
        coords = []
        for ref in way["nodes"]:
            node = refs_index.get(ref_key("node", ref))
            if node is not None:
                node["used"] = way["id"]
                coords.append([float(node["lon"]), float(node["lat"])])
            else:
                _fail(f"node {ref} not found for way", raise_on_failure)
                return None

    elif "ref" in way:
        target = refs_index.get(ref_key(way["type"], way["ref"]))
        if target is None:
            _fail(f"way ref {way.get('ref')} not in index", raise_on_failure)
            return None
        # propagate the consumer id onto the referenced element
        # (main.py:317-323); member dicts carry "used", real ways "id"
        if "id" in way:
            target["used"] = way["id"]
        elif "used" in way:
            target["used"] = way["used"]
        resolved = way_to_shape(target, refs_index, classifier, raise_on_failure)
        if resolved is None:
            _fail("way-by-ref not converted", raise_on_failure)
            return None
        shape = resolved["shape"]
        coords = shape["coordinates"][0] if shape["type"] == "Polygon" else shape["coordinates"]

    else:
        _fail("way without nodes/geometry/ref", raise_on_failure)
        return None

    if len(coords) < 2:
        _fail("not enough coords for way", raise_on_failure)
        return None

    props = element_props(way)
    if classifier.is_polygon(way.get("tags"), ring_closed=element_ring_closed(way)):
        ring = close_ring(coords)
        if len(ring) < 4:
            # Polygon() on < 3 distinct coords raises in the reference
            # (caught at main.py:358-363) -> element skipped
            _fail("failed to build polygon from way", raise_on_failure)
            return None
        poly = [ring]
        if not is_valid_polygon(poly):
            repaired = _buffer0_polygon(poly)
            if repaired is None:
                _fail("failed to build polygon from way", raise_on_failure)
                return None
            if len(repaired) > 1:  # buffer(0) split -> MultiPolygon
                return {
                    "shape": {"type": "MultiPolygon", "coordinates": repaired},
                    "properties": props,
                }
            poly = repaired[0]
        return {"shape": {"type": "Polygon", "coordinates": poly}, "properties": props}
    return {"shape": {"type": "LineString", "coordinates": coords}, "properties": props}


def _buffer0_polygon(poly):
    """buffer(0)-style validity repair (reference main.py:264-270,
    shapely ``poly.buffer(0)``), for the corpus-style defect classes:
    rings that self-touch or self-cross at a REPEATED VERTEX.

    GEOS zero-buffer semantics emulated:
    - the ring is decomposed into simple loops at repeated vertices
      (stack walk: closing a previously-seen vertex pops one loop);
    - zero-area loops (pinch corridors, spikes) are discarded;
    - loops wound in the ring's dominant direction become shells;
    - opposite-wound loops strictly inside a shell become its holes;
      opposite-wound loops outside any shell are discarded (the
      negative lobe of a bowtie);
    - pre-existing holes of the input polygon are re-attached to the
      shell that contains them.

    Self-crossings at non-vertex points (needing segment noding) are
    out of scope — the polygon is returned unchanged, like the
    reference when buffer(0) cannot fix the geometry.

    Returns MULTIPOLYGON coordinates (a list of polygons).
    """
    from .kernels import ring_contains_ring, signed_area

    shell = poly[0]
    open_pts = [tuple(p) for p in shell[:-1]]
    if len(set(open_pts)) == len(open_pts):
        return [poly]  # no repeated vertex: not a vertex-touch defect

    # stack walk: pop a loop whenever a vertex repeats on the stack
    stack: list = []
    index: dict = {}
    loops = []
    for p in open_pts + [open_pts[0]]:
        if p in index and index[p] is not None:
            start = index[p]
            loop = stack[start:]
            for q in loop[1:]:
                index[q] = None
            del stack[start + 1 :]
            if len(loop) >= 3:
                loops.append(loop)
            continue
        index[p] = len(stack)
        stack.append(p)
    if len(stack) > 1 and len(stack) >= 3:
        loops.append(stack)

    loops = [lp for lp in loops if signed_area(list(lp) + [lp[0]]) != 0]
    if not loops:
        return [poly]
    areas = [signed_area(list(lp) + [lp[0]]) for lp in loops]
    dominant = 1.0 if sum(areas) >= 0 else -1.0
    shells = [
        [list(q) for q in lp] + [list(lp[0])]
        for lp, a in zip(loops, areas)
        if a * dominant > 0
    ]
    if not shells:
        return [poly]
    cut_holes = [
        [list(q) for q in lp] + [list(lp[0])]
        for lp, a in zip(loops, areas)
        if a * dominant < 0
    ]
    out = [[s] for s in shells]
    for hole in cut_holes + [list(map(list, h)) for h in poly[1:]]:
        for p in out:
            if ring_contains_ring(p[0], hole):
                p.append(hole)
                break
    return out


def _buffer0_multipolygon(mp):
    """Per-polygon buffer(0) repair over MultiPolygon coordinates."""
    from .kernels import is_valid_polygon

    out = []
    for poly in mp:
        if is_valid_polygon(poly):
            out.append(poly)
        else:
            out.extend(_buffer0_polygon(poly))
    return out or None


def relation_to_shape(
    rel: dict,
    refs_index: Optional[Dict[str, dict]],
    classifier: PolygonClassifier = DEFAULT_CLASSIFIER,
    raise_on_failure: bool = False,
) -> Optional[dict]:
    if "center" in rel:
        c = rel["center"]
        return {
            "shape": {"type": "Point", "coordinates": [float(c["lon"]), float(c["lat"])]},
            "properties": element_props(rel),
        }
    try:
        if classifier.is_polygon(rel.get("tags"), ring_closed=element_ring_closed(rel)):
            return multipolygon_relation_to_shape(rel, refs_index, classifier, raise_on_failure)
        return multiline_relation_to_shape(rel, refs_index, classifier, raise_on_failure)
    except AssemblyError:
        raise
    except Exception as e:  # mirror the reference's broad catch (main.py:491-495)
        if raise_on_failure:
            raise AssemblyError(f"failed to convert relation: {e}") from e
        return None


def relation_tail_from_lines(
    el: dict,
    shapes: List[Tuple[str, list, int]],
    classifier: PolygonClassifier = DEFAULT_CLASSIFIER,
) -> Optional[dict]:
    """relation_to_shape's dispatch + assembly tail over PRE-CONVERTED
    member lines (the distributed salted path converts members as a
    flat parallel map first).  ``shapes`` = ordered (role, line coords,
    member ref) — exactly what the in-process path builds member by
    member — so the algebra below is byte-identical to it."""
    props = element_props(el)
    if "center" in el:
        c = el["center"]
        return {
            "shape": {"type": "Point", "coordinates": [float(c["lon"]), float(c["lat"])]},
            "properties": props,
        }
    try:
        if classifier.is_polygon(el.get("tags"), ring_closed=element_ring_closed(el)):
            mp = _shapes_to_multipolygon(shapes, False)
            if mp is None:
                return None
            if not is_valid_multipolygon(mp):
                repaired = _buffer0_multipolygon(mp)
                mp = repaired if repaired is not None else mp
            mp = orient_multipolygon(mp)
            return {
                "shape": {"type": "MultiPolygon", "coordinates": mp},
                "properties": props,
            }
        lines = [coords for _role, coords, _ref in shapes]
        if not lines:
            return None
        merged = linemerge(lines)
        if len(merged) == 1:
            geom = {"type": "LineString", "coordinates": merged[0]}
        else:
            geom = {"type": "MultiLineString", "coordinates": merged}
        return {"shape": geom, "properties": props}
    except AssemblyError:
        raise
    except Exception:  # mirror relation_to_shape's broad catch
        return None


def _relation_members(rel: dict, refs_index: Dict[str, dict]) -> Optional[List[dict]]:
    if "members" in rel:
        return rel["members"]
    target = refs_index.get(ref_key(rel["type"], rel["ref"])) if "ref" in rel else None
    if target is None:
        return None
    return target.get("members")


def multiline_relation_to_shape(
    rel: dict,
    refs_index: Dict[str, dict],
    classifier: PolygonClassifier = DEFAULT_CLASSIFIER,
    raise_on_failure: bool = False,
) -> Optional[dict]:
    members = _relation_members(rel, refs_index)
    if members is None:
        _fail("ref for multiline relation not found", raise_on_failure)
        return None

    lines = []
    for member in members:
        if member["type"] == "way":
            member_shape = way_to_shape(member, refs_index, classifier, raise_on_failure)
        elif member["type"] == "relation":
            target = refs_index.get(ref_key("relation", member["ref"]))
            if target is not None:
                target["used"] = rel["id"]  # KeyError on nested member dicts, like main.py:529
            if target is not None and "_shape" in target:
                # distributed path: nested relation resolved in an
                # earlier round; its shape is carried in the group
                member_shape = (
                    {"shape": target["_shape"]} if target["_shape"] is not None else None
                )
            else:
                member_shape = element_to_shape(member, refs_index, classifier, raise_on_failure)
        else:
            _fail("multiline member not handled", raise_on_failure)
            continue

        if member_shape is None:
            _fail("failed to make way in relation", raise_on_failure)
            continue

        shape = member_shape["shape"]
        if shape["type"] == "Polygon":
            shape = {"type": "LineString", "coordinates": shape["coordinates"][0]}
        lines.append(shape["coordinates"])

    if not lines:
        _fail("no lines for multiline relation", raise_on_failure)
        return None

    merged = linemerge(lines)
    if len(merged) == 1:
        geom = {"type": "LineString", "coordinates": merged[0]}
    else:
        geom = {"type": "MultiLineString", "coordinates": merged}
    return {"shape": geom, "properties": element_props(rel)}


def multipolygon_relation_to_shape(
    rel: dict,
    refs_index: Dict[str, dict],
    classifier: PolygonClassifier = DEFAULT_CLASSIFIER,
    raise_on_failure: bool = False,
) -> Optional[dict]:
    members = _relation_members(rel, refs_index)
    if members is None:
        _fail("ref for multipolygon relation not found", raise_on_failure)
        return None

    shapes: List[Tuple[str, list, int]] = []  # (role, line coords, member ref)
    for member in members:
        if member["type"] != "way":
            _fail("multipolygon member not handled", raise_on_failure)
            continue
        member["used"] = rel["id"]
        member_shape = way_to_shape(member, refs_index, classifier, raise_on_failure)
        if member_shape is None:
            _fail("failed to make way in multipolygon relation", raise_on_failure)
            continue
        shape = member_shape["shape"]
        coords = shape["coordinates"][0] if shape["type"] == "Polygon" else shape["coordinates"]
        shapes.append((member["role"], coords, member["ref"]))

    mp = _shapes_to_multipolygon(shapes, raise_on_failure)
    if mp is None:
        _fail("failed to convert shapes to multipolygon", raise_on_failure)
        return None

    if not is_valid_multipolygon(mp):
        repaired = _buffer0_multipolygon(mp)
        mp = repaired if repaired is not None else mp
    mp = orient_multipolygon(mp)
    return {
        "shape": {"type": "MultiPolygon", "coordinates": mp},
        "properties": element_props(rel),
    }


def _lines_to_multipolygon(lines: List[list], raise_on_failure: bool = False):
    """linemerge -> polygonize-closed-rings -> unary_union
    (main.py:676-704)."""
    merged = linemerge(lines)
    if len(merged) > 1:
        polys = []
        for line in merged:
            ring = close_ring(line)
            if len(ring) < 4:
                _fail("failed to build polygon from merged line", raise_on_failure)
                continue
            poly = [ring]
            if not is_valid_polygon(poly):
                repaired = _buffer0_polygon(poly)
                if repaired is not None:
                    polys.extend(repaired)
                    continue
            polys.append(poly)
        return overlay.unary_union(polys)
    if not merged:
        return None
    ring = close_ring(merged[0])
    if len(ring) < 4:
        _fail("failed to convert lines to polygon", raise_on_failure)
        return None
    return [[ring]]


def _shapes_to_multipolygon(shapes, raise_on_failure: bool = False):
    """Consecutive-role grouping + outer/inner algebra (main.py:707-788)."""
    if not shapes:
        _fail("empty multipolygon", raise_on_failure)
        return None

    groups = []
    for role, grp in itertools.groupby(shapes, key=lambda s: s[0]):
        grp = list(grp)
        geom = _lines_to_multipolygon([g[1] for g in grp], raise_on_failure)
        groups.append((role, geom, [g[2] for g in grp]))

    # issue-54 repair: several outer groups that actually connect are
    # merged into one polygon (main.py:727-742)
    outer_idx = [i for i, (role, _, _) in enumerate(groups) if role == "outer"]
    if len(outer_idx) > 1:
        all_outer = [coords for role, coords, _ in shapes if role == "outer"]
        all_ids = [rid for role, _, rid in shapes if role == "outer"]
        merged = _lines_to_multipolygon(all_outer, raise_on_failure)
        if merged is not None and len(merged) == 1:
            for i in reversed(outer_idx):
                groups.pop(i)
            groups.insert(outer_idx[0], ("outer", merged, all_ids))

    base_index = next((i for i, (role, _, _) in enumerate(groups) if role == "outer"), -1)
    if base_index < 0:
        _fail('no "outer" role in multipolygon relation', raise_on_failure)
        return None

    mp = groups[base_index][1]
    if mp is None or not is_valid_multipolygon(mp):
        _fail('invalid "outer" base in multipolygon relation', raise_on_failure)
        return None

    for i, (role, geom, _ids) in enumerate(groups):
        if i == base_index or geom is None:
            continue
        if role == "inner":
            mp = overlay.difference(mp, geom)
        else:
            mp = overlay.union(mp, geom)
    return mp
