"""osm2geojson_ray — a Ray-Data-native OSM stitching + spatial-join +
tiling engine.

Public surface:

- document API (small docs, reference-compatible):
  ``json2geojson`` / ``xml2geojson`` / ``json2shapes`` / ``xml2shapes``
- distributed API: ``pipeline.osm`` (elements Dataset -> features),
  ``spatial`` (cell index, PIP join, kNN, tiles), ``images`` (synthetic
  image tables + codecs), ``text`` (dedup / quality / language ops).
"""

from .document import (  # noqa: F401
    json2geojson,
    json2shapes,
    shape_to_feature,
    shapes_to_feature_collection,
    xml2geojson,
    xml2shapes,
)
from .classify import is_geometry_polygon, PolygonClassifier  # noqa: F401
from .model.xml_parse import parse_osm_xml  # noqa: F401

__version__ = "0.1.0"
