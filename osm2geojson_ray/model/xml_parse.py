"""OSM/Overpass XML -> Overpass-JSON element dicts.

Table-driven single-pass walk over ElementTree (reference parity:
parse_xml.py:277-373; field specs parse_xml.py:7-8).  Output dicts are
content-equal to Overpass JSON so the XML and JSON readers converge on
one element model (mirrors tests/test_parse_xml.py:87-100 in the
reference).

At scale this parser runs per-shard inside ``flat_map`` over
``read_binary_files`` output — XML is not splittable mid-file, so
sharding happens at file granularity (one .osm file per task).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional
from xml.etree import ElementTree

# attribute spec: name -> converter (None = keep string)
_META: Dict[str, Any] = {
    "timestamp": None,
    "version": int,
    "changeset": int,
    "user": None,
    "uid": int,
}
_IDENT: Dict[str, Any] = {"role": None, "id": int, "ref": int}
_STRUCTURAL = {"node", "way", "relation", "member", "nd"}


def _attrs(el: ElementTree.Element, spec: Dict[str, Any]) -> dict:
    out = {}
    a = el.attrib
    for name, conv in spec.items():
        if name in a:
            out[name] = conv(a[name]) if conv else a[name]
    return out


def _collect(el: ElementTree.Element):
    """Split children into (bounds, tags dict, structural children)."""
    bounds = None
    tags: Dict[str, str] = {}
    children: List[ElementTree.Element] = []
    count_child = None
    extras: List[ElementTree.Element] = []
    for child in el:
        tag = child.tag
        if tag == "tag":
            tags[child.attrib["k"]] = child.attrib["v"]
        elif tag == "bounds":
            bounds = {
                k: float(child.attrib[k]) for k in ("minlat", "minlon", "maxlat", "maxlon")
            }
        elif tag == "count":
            count_child = child
        elif tag in _STRUCTURAL:
            children.append(child)
        else:
            extras.append(child)
    return bounds, tags, children, count_child, extras


def _parse_node(el: ElementTree.Element) -> dict:
    item = _attrs(el, {**_IDENT, "lat": float, "lon": float, **_META})
    item["type"] = "node"
    _b, tags, _c, _cnt, _x = _collect(el)
    if tags:
        item["tags"] = tags
    return item


def _parse_way(el: ElementTree.Element) -> dict:
    item = _attrs(el, {"ref": int, "id": int, "role": None, **_META})
    item["type"] = "way"
    _b, tags, children, _cnt, _x = _collect(el)
    nodes: List[int] = []
    geometry: List[dict] = []
    for nd in children:
        if nd.tag != "nd":
            continue
        a = nd.attrib
        if "ref" in a and "lat" not in a and "lon" not in a:
            nodes.append(int(a["ref"]))
        else:
            geometry.append(_attrs(nd, {"ref": int, "lat": float, "lon": float}))
    if tags:
        item["tags"] = tags
    if geometry:
        item["geometry"] = geometry
    if nodes:
        item["nodes"] = nodes
    return item


def _parse_relation(el: ElementTree.Element) -> dict:
    item = _attrs(el, {"id": int, "ref": int, "role": None, **_META})
    item["type"] = "relation"
    bounds, tags, children, _cnt, _x = _collect(el)
    members = [_parse_member(c) for c in children if c.tag == "member"]
    members = [m for m in members if m is not None]
    if members:
        item["members"] = members
    if bounds is not None:
        item["bounds"] = bounds
    if tags:
        item["tags"] = tags
    return item


def _parse_member(el: ElementTree.Element) -> Optional[dict]:
    # a <member> is parsed as the element kind named by its type attr
    # (parse_xml.py:321-322)
    kind = el.attrib.get("type")
    parser = _PARSERS.get(kind)
    return parser(el) if parser else None


def _parse_count(el: ElementTree.Element) -> dict:
    item = {"id": int(el.attrib["id"])} if "id" in el.attrib else {}
    item["type"] = "count"
    _b, tags, _c, _cnt, _x = _collect(el)
    if tags:
        item["tags"] = tags
    return item


_PARSERS = {"node": _parse_node, "way": _parse_way, "relation": _parse_relation}


def parse_osm_xml(xml_str: str) -> Optional[dict]:
    """Parse an OSM XML document into the Overpass-JSON dict shape."""
    root = ElementTree.fromstring(xml_str)
    if root.tag != "osm":
        return None

    _bounds, _tags, children, count_child, extras = _collect(root)
    elements = [_PARSERS[c.tag](c) for c in children if c.tag in _PARSERS]
    if count_child is not None:
        elements.append(_parse_count(count_child))

    doc: dict = {"version": 0.6, "elements": elements}
    if "version" in root.attrib:
        doc["version"] = float(root.attrib["version"])
    if "generator" in root.attrib:
        doc["generator"] = root.attrib["generator"]
    for extra in extras:
        if extra.tag == "meta" and "osm_base" in extra.attrib:
            doc.setdefault("osm3s", {})["timestamp_osm_base"] = extra.attrib["osm_base"]
        elif extra.tag == "note":
            doc.setdefault("osm3s", {})["copyright"] = extra.text
    return doc
