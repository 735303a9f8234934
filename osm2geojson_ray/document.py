"""Whole-document conversion (reference parity: main.py:60-180).

This is the small-document path: one Overpass doc converted in-process
with the same kernels the distributed pipeline runs per shuffle group.
The conformance suite drives THIS code and the Ray pipeline side by
side against the reference's golden corpus.
"""

from __future__ import annotations

import json
from typing import List, Optional, Union

from .classify import PolygonClassifier
from .geom.assemble import (
    AssemblyError,
    build_refs_index,
    element_to_shape,
)
from .model.xml_parse import parse_osm_xml


def _make_classifier(area_keys, polygon_features) -> PolygonClassifier:
    if area_keys is None and polygon_features is None:
        from .classify import DEFAULT_CLASSIFIER

        return DEFAULT_CLASSIFIER
    return PolygonClassifier(polygon_features, area_keys)


def json2shapes(
    data: Union[str, dict],
    filter_used_refs: bool = True,
    area_keys: Optional[dict] = None,
    polygon_features: Optional[list] = None,
    raise_on_failure: bool = False,
) -> List[dict]:
    if isinstance(data, str):
        data = json.loads(data)
    return _doc_to_shapes(data, filter_used_refs, area_keys, polygon_features, raise_on_failure)


def xml2shapes(xml_str: str, **kwargs) -> List[dict]:
    return json2shapes(parse_osm_xml(xml_str), **kwargs)


def json2geojson(
    data: Union[str, dict],
    filter_used_refs: bool = True,
    area_keys: Optional[dict] = None,
    polygon_features: Optional[list] = None,
    raise_on_failure: bool = False,
) -> dict:
    shapes = json2shapes(data, filter_used_refs, area_keys, polygon_features, raise_on_failure)
    return shapes_to_feature_collection(shapes)


def xml2geojson(xml_str: str, **kwargs) -> dict:
    return json2geojson(parse_osm_xml(xml_str), **kwargs)


def shape_to_feature(shape: dict, properties: Optional[dict] = None) -> dict:
    """Wrap a geometry dict as a GeoJSON Feature (main.py:251-256).
    Geometries are already JSON-ready nested lists (no tuple
    conversion needed — Arrow/py dicts, not shapely)."""
    return {"type": "Feature", "properties": properties or {}, "geometry": shape}


def shapes_to_feature_collection(shapes: List[dict]) -> dict:
    return {
        "type": "FeatureCollection",
        "features": [shape_to_feature(s["shape"], s["properties"]) for s in shapes],
    }


def _doc_to_shapes(
    data: dict,
    filter_used_refs: bool = True,
    area_keys: Optional[dict] = None,
    polygon_features: Optional[list] = None,
    raise_on_failure: bool = False,
) -> List[dict]:
    classifier = _make_classifier(area_keys, polygon_features)
    refs = [el for el in data["elements"] if el.get("type") in ("node", "way", "relation")]
    refs_index = build_refs_index(refs)

    shapes = []
    for el in data["elements"]:
        try:
            shape = element_to_shape(el, refs_index, classifier, raise_on_failure)
        except AssemblyError:
            raise
        if shape is not None:
            shapes.append(shape)

    if not filter_used_refs:
        return shapes

    # bare-id used set, cross-type collisions preserved (main.py:171)
    used = {ref["id"] for ref in refs if "used" in ref}
    return [s for s in shapes if s["properties"]["id"] not in used]
