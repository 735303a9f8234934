"""XML/JSON reader convergence (mirrors reference tests/test_parse_xml.py:87-100)."""

import json
import os

import pytest

from osm2geojson_ray.model.xml_parse import parse_osm_xml

from .conftest import REFERENCE_DATA, fixture_path, read_fixture

PAIRS = [
    b
    for b in ["empty", "node", "way", "relation", "map"]
    if os.path.exists(fixture_path(b + ".osm")) and os.path.exists(fixture_path(b + ".json"))
]


@pytest.mark.parametrize("base", PAIRS)
def test_xml_json_parity(base):
    parsed = parse_osm_xml(read_fixture(base + ".osm"))
    expected = json.loads(read_fixture(base + ".json"))
    if "version" not in expected:
        parsed = {k: v for k, v in parsed.items() if k != "version"}
    assert parsed == expected


def test_all_osm_files_parse():
    for name in os.listdir(REFERENCE_DATA):
        if name.endswith(".osm"):
            doc = parse_osm_xml(read_fixture(name))
            assert doc is not None and "elements" in doc
