"""Distributed pipeline conformance: corpus through Ray Data must equal
the document converter (and thus the goldens)."""

import json
import os

import pytest

from osm2geojson_ray import json2geojson
from osm2geojson_ray.model.xml_parse import parse_osm_xml
from osm2geojson_ray.pipeline.osm import OsmPipeline, elements_dataset, features_to_geojson

from .conftest import fixture_path, read_fixture

CASES = [
    "empty",
    "node",
    "way",
    "relation",
    "map",
    "barrier-wall",
    "center-feature",
    "meta",
    "issue-4",
    "issue-6",
    "issue-7",
    "issue-9",
    "issue-16",
    "issue-35",
    "issue-52-highway-service-closed",
    "issue-54-staffordshire",
]


def load_doc(base):
    json_path = fixture_path(base + ".json")
    if os.path.exists(json_path):
        return json.loads(read_fixture(base + ".json"))
    return parse_osm_xml(read_fixture(base + ".osm"))


@pytest.mark.parametrize("base", CASES)
def test_pipeline_matches_document_converter(ray_session, base):
    doc = load_doc(base)
    expected = json2geojson(doc)
    ds = elements_dataset(doc["elements"])
    got = features_to_geojson(OsmPipeline(num_partitions=4).features(ds))
    assert got == expected


def test_pipeline_filter_used_refs_off(ray_session):
    doc = load_doc("issue-9")
    expected = json2geojson(doc, filter_used_refs=False)
    ds = elements_dataset(doc["elements"])
    pipe = OsmPipeline(num_partitions=4, filter_used_refs=False)
    got = features_to_geojson(pipe.features(ds))
    assert got == expected


def test_pipeline_shuffle_used_filter(ray_session):
    """The shuffle anti-join path must agree with the broadcast path."""
    doc = load_doc("issue-9")
    ds = elements_dataset(doc["elements"])
    broadcast = features_to_geojson(
        OsmPipeline(num_partitions=4, used_filter_strategy="broadcast").features(ds)
    )
    shuffle = features_to_geojson(
        OsmPipeline(num_partitions=4, used_filter_strategy="shuffle").features(ds)
    )
    assert broadcast == shuffle == json2geojson(doc)


def test_pipeline_parquet_path_input(ray_session, tmp_path):
    """features(<parquet path>) — the fused read+split — must equal
    features(<Dataset>) and the document converter, including with
    multiple small row groups per file and a list of paths."""
    import pyarrow.parquet as pq

    from osm2geojson_ray.model.schema import elements_table

    doc = load_doc("map")
    expected = json2geojson(doc)
    tbl = elements_table(doc["elements"])
    p1 = str(tmp_path / "el1.parquet")
    pq.write_table(tbl, p1, row_group_size=7)
    got = features_to_geojson(OsmPipeline(num_partitions=4).features(p1))
    assert got == expected

    # list-of-paths: split one doc across two files (feature set is
    # order-insensitive at the collection level after seq sort)
    half = len(doc["elements"]) // 2
    p2, p3 = str(tmp_path / "el2.parquet"), str(tmp_path / "el3.parquet")
    pq.write_table(elements_table(doc["elements"][:half]), p2)
    pq.write_table(elements_table(doc["elements"][half:]), p3)
    got2 = features_to_geojson(OsmPipeline(num_partitions=4).features([p2, p3]))
    assert got2 == expected


def test_pipeline_stage_gate_off(ray_session):
    """stage_gate=False (fully overlapped consume DAG) must produce the
    same output as the default gated execution — the gate is purely a
    scheduling choice, never a semantic one."""
    doc = load_doc("relation")
    expected = json2geojson(doc)
    ds = elements_dataset(doc["elements"])
    pipe = OsmPipeline(num_partitions=4, stage_gate=False)
    assert features_to_geojson(pipe.features(ds)) == expected


def test_used_keep_mask_sharded_equals_flat():
    """The residue-sharded used-id membership test must equal the flat
    sorted-array test — including negative (editor-draft) ids, whose %
    routing must agree between the shard builder and the prober."""
    import numpy as np

    from osm2geojson_ray.pipeline.osm import _USED_ID_SHARDS, _used_keep_mask

    rng = np.random.RandomState(7)
    used = np.unique(rng.randint(-1000, 1000, size=400).astype(np.int64))
    el = rng.randint(-1200, 1200, size=1000).astype(np.int64)
    flat = _used_keep_mask(used, el)
    S = _USED_ID_SHARDS
    shards = tuple(np.unique(used[used % S == s]) for s in range(S))
    sharded = _used_keep_mask(shards, el)
    assert (flat == sharded).all()
    # and both agree with the definition
    assert (flat == ~np.isin(el, used)).all()


def test_pipeline_consume_stream_mode(ray_session):
    """consume_mode="stream" (the lazy map_batches/union consume DAG)
    must equal the default task-mode consume — the mode is a scheduling
    choice, never a semantic one."""
    for base in ("relation", "issue-9", "map"):
        doc = load_doc(base)
        expected = json2geojson(doc)
        ds = elements_dataset(doc["elements"])
        pipe = OsmPipeline(num_partitions=4, consume_mode="stream")
        assert features_to_geojson(pipe.features(ds)) == expected


def test_pipeline_metrics(ray_session):
    """A5 accounting: way resolution + relation outcome counters."""
    doc = load_doc("issue-16")  # inner-only relation fails to convert
    pipe = OsmPipeline(num_partitions=4)
    pipe.features(elements_dataset(doc["elements"])).count()
    m = pipe.metrics().set_index("stage")
    assert m.loc["way_resolution", "rows_ok"] >= 1
    rel_rounds = [s for s in m.index if s.startswith("relation_round_")]
    assert rel_rounds
    total_rels = int(m.loc[rel_rounds, "rows_in"].sum())
    failed = int(m.loc[rel_rounds, "rows_failed"].sum())
    assert total_rels >= 1 and failed >= 1  # the unconvertible relation


@pytest.mark.parametrize("base", ["relation", "map", "issue-16", "issue-35",
                                  "issue-54-staffordshire", "issue-9"])
def test_salted_path_matches_document_converter(ray_session, base):
    """Mega-relation (salted) path must be byte-identical to the normal
    path and the document converter — forced by a tiny threshold so
    every relation takes it."""
    doc = load_doc(base)
    expected = json2geojson(doc)
    ds = elements_dataset(doc["elements"])
    pipe = OsmPipeline(num_partitions=4, salt_member_threshold=1)
    got = features_to_geojson(pipe.features(ds))
    assert got == expected


@pytest.mark.parametrize("nparts", [1, 3, 7])
def test_partition_count_independence(ray_session, nparts):
    """Output must not depend on the partition count (hash exchange
    routing, block boundaries, round scheduling)."""
    doc = load_doc("map")
    expected = json2geojson(doc)
    ds = elements_dataset(doc["elements"], override_num_blocks=max(2, nparts))
    got = features_to_geojson(OsmPipeline(num_partitions=nparts).features(ds))
    assert got == expected


def test_salted_path_multipolygon_split_member(ray_session):
    """A member way whose invalid ring buffer(0)-splits into a
    MultiPolygon arrives at the salted converter as a LineString with
    NESTED coordinates (the by-ref member dict has no tags).  That
    shape must ride the payload fallback and match the normal path and
    the document converter (previously: IndexError building the flat
    line column).  The relation has 2 members so it actually exceeds
    salt_member_threshold=1 and takes the mega path."""
    # self-crossing ring that decomposes at repeated vertex (1,1) into
    # two same-winding loops -> MultiPolygon after repair
    ring = [[0, 0], [1, 0], [1, 1], [4, 1], [2, 2], [2, 0], [1, 1], [0, 1], [0, 0]]
    sq = [[10, 10], [11, 10], [11, 11], [10, 11], [10, 10]]
    nodes = [
        {"type": "node", "id": 100 + i, "lon": float(x), "lat": float(y)}
        for i, (x, y) in enumerate(ring[:-1])
    ] + [
        {"type": "node", "id": 200 + i, "lon": float(x), "lat": float(y)}
        for i, (x, y) in enumerate(sq[:-1])
    ]
    doc = {
        "elements": nodes
        + [
            {"type": "way", "id": 7, "tags": {"area": "yes"},
             "nodes": [100 + i for i in range(len(ring) - 1)] + [100]},
            {"type": "way", "id": 8,
             "nodes": [200 + i for i in range(len(sq) - 1)] + [200]},
            {
                "type": "relation",
                "id": 9,
                "tags": {"type": "multipolygon", "building": "yes"},
                "members": [
                    {"type": "way", "ref": 7, "role": "outer"},
                    {"type": "way", "ref": 8, "role": "outer"},
                ],
            },
        ]
    }
    expected = json2geojson(doc)
    normal = features_to_geojson(
        OsmPipeline(num_partitions=4).features(elements_dataset(doc["elements"]))
    )
    salted = features_to_geojson(
        OsmPipeline(num_partitions=4, salt_member_threshold=1).features(
            elements_dataset(doc["elements"])
        )
    )
    assert normal == expected
    assert salted == expected
