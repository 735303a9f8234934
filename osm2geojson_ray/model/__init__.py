"""Element model: parsers producing the Overpass-JSON element dicts and
the Arrow schema used by the distributed pipeline."""

from .xml_parse import parse_osm_xml  # noqa: F401
