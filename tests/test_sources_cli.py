"""File sources, CLI, sinks, IVF ANN."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa

import ray.data

from .conftest import REFERENCE_DATA, fixture_path


def test_read_osm_files(ray_session, tmp_path):
    paths = [fixture_path("way.osm"), fixture_path("relation.osm")]
    local = [str(tmp_path / os.path.basename(p)) for p in paths]
    for src, dst in zip(paths, local):
        shutil.copy(src, dst)
    from osm2geojson_ray.sources import read_osm_files

    ds = read_osm_files(local)
    rows = ds.take_all()
    shards = {r["shard"] for r in rows}
    assert shards == {"way.osm", "relation.osm"}
    assert any(r["type"] == "relation" for r in rows)


def test_read_image_table(ray_session, tmp_path):
    """Parquet branch round-trips the input_hint schema with column
    pruning; the .lance branch raises the documented ImportError in
    this sandbox (no pylance)."""
    import pyarrow.parquet as pq
    import pytest

    from osm2geojson_ray.images.synth import synth_image_table
    from osm2geojson_ray.sources import read_image_table

    tbl = synth_image_table(64, partition_rows=64).take_all()
    import pyarrow as pa

    path = str(tmp_path / "images.parquet")
    pq.write_table(pa.Table.from_pylist(tbl), path)
    ds = read_image_table(path, columns=["image_id", "phash", "caption"])
    got = ds.take_all()
    assert len(got) == 64
    assert set(got[0].keys()) == {"image_id", "phash", "caption"}
    with pytest.raises(ImportError, match="lance"):
        read_image_table(str(tmp_path / "images.lance"))


def test_read_json_files(ray_session, tmp_path):
    src = fixture_path("issue-9.json")
    dst = str(tmp_path / "issue-9.json")
    shutil.copy(src, dst)
    from osm2geojson_ray.sources import read_overpass_json_files

    rows = read_overpass_json_files([dst]).take_all()
    assert len(rows) == len(json.load(open(src))["elements"])


def test_cli_matches_document_api(tmp_path):
    out = str(tmp_path / "out.geojson")
    r = subprocess.run(
        [sys.executable, "-m", "osm2geojson_ray", fixture_path("way.osm"), out],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    from osm2geojson_ray import xml2geojson

    with open(fixture_path("way.osm")) as f:
        want = xml2geojson(f.read())
    assert json.load(open(out)) == want
    # overwrite guard
    r2 = subprocess.run(
        [sys.executable, "-m", "osm2geojson_ray", fixture_path("way.osm"), out],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 1


def test_write_feature_collection(ray_session, tmp_path):
    from osm2geojson_ray import json2geojson
    from osm2geojson_ray.pipeline.osm import OsmPipeline, elements_dataset
    from osm2geojson_ray.sources import write_feature_collection

    doc = json.load(open(fixture_path("way.json")))
    ds = elements_dataset(doc["elements"])
    out = str(tmp_path / "fc.geojson")
    got = write_feature_collection(OsmPipeline(num_partitions=2).features(ds), out)
    assert got == json2geojson(doc)
    assert json.load(open(out)) == got


def test_embedding_knn_ivf_high_probe_is_exact(ray_session):
    from osm2geojson_ray.spatial.knn import embedding_knn, embedding_knn_ivf

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(400, 16))
    ids = np.arange(400, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.Table.from_pydict({"vec_id": ids, "embedding": [v.tolist() for v in vecs]})
    )
    exact = embedding_knn(ds, ids[:2], vecs[:2], k=5).take_all()
    # probing every cluster makes IVF exhaustive -> identical results
    approx = embedding_knn_ivf(
        ds, ids[:2], vecs[:2], k=5, n_clusters=8, n_probe=8
    ).take_all()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"]) for r in approx]
    ) == sorted([(r["query_id"], r["rank"], r["neighbor_id"]) for r in exact])


def test_overpass_call_loopback_and_retries():
    """S3 source against a loopback HTTP server: success path returns
    the body; an HTTP 5xx exhausts retries (ConnectionError); a
    transport error (down port) propagates IMMEDIATELY — reference
    parity: only HTTPError is retried (helpers.py:33-60)."""
    import http.server
    import threading

    from osm2geojson_ray.sources import overpass_call

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            assert b"data=" in body
            payload = b'{"version": 0.6, "elements": []}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        out = overpass_call("[out:json];node(1);out;", url=f"http://127.0.0.1:{port}/")
        assert json.loads(out) == {"version": 0.6, "elements": []}
    finally:
        srv.shutdown()

    import pytest as _pytest
    import urllib.error

    # transport error (connection refused / timeout): NOT retried,
    # propagates raw (URLError and TimeoutError are both OSError)
    with _pytest.raises(OSError):
        overpass_call("q", url=f"http://127.0.0.1:{port}/", retries=2,
                      backoff_sec=0.01, timeout=1.0)

    # HTTP-status error: retried to exhaustion
    class FailHandler(http.server.BaseHTTPRequestHandler):
        hits = []

        def do_POST(self):
            FailHandler.hits.append(1)
            self.send_response(503)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv2 = http.server.HTTPServer(("127.0.0.1", 0), FailHandler)
    port2 = srv2.server_address[1]
    t2 = threading.Thread(target=srv2.serve_forever, daemon=True)
    t2.start()
    try:
        with _pytest.raises(ConnectionError):
            overpass_call("q", url=f"http://127.0.0.1:{port2}/", retries=3,
                          backoff_sec=0.01)
        assert len(FailHandler.hits) == 3
    finally:
        srv2.shutdown()


def test_doc_meta_roundtrip(ray_session):
    """Sharded sources keep the Overpass document header reachable
    (version/generator/osm3s) via the shard-keyed meta table."""
    from osm2geojson_ray.sources import read_doc_meta

    rows = {r["shard"]: r for r in read_doc_meta(
        [fixture_path("issue-35.json"), fixture_path("map.osm")]
    ).take_all()}
    j = rows["issue-35.json"]
    assert j["version"] == 0.6
    assert j["generator"] and "Overpass" in j["generator"]
    assert j["timestamp_osm_base"]
    x = rows["map.osm"]
    assert x["version"] == 0.6


def test_count_element_warns(caplog):
    """Overpass `count` elements warn and drop, reference main.py:199-200."""
    import logging

    from osm2geojson_ray.geom.assemble import element_to_shape

    with caplog.at_level(logging.WARNING, logger="osm2geojson_ray"):
        out = element_to_shape({"type": "count", "id": 1, "tags": {"total": "5"}})
    assert out is None
    assert any("Failed to convert element to shape" in r.message for r in caplog.records)


def test_geojsonl_roundtrip(ray_session, tmp_path):
    """Sharded .geojsonl sink: write at nparts>1, read back, same
    Feature multiset (and per-file seq order) as the document
    converter's FeatureCollection."""
    from osm2geojson_ray.document import xml2geojson
    from osm2geojson_ray.pipeline.osm import OsmPipeline, elements_dataset
    from osm2geojson_ray.model.xml_parse import parse_osm_xml
    from osm2geojson_ray.sources import read_features_geojsonl, write_features_geojsonl

    raw = open(fixture_path("map.osm"), encoding="utf-8").read()
    doc = parse_osm_xml(raw)
    feats_ds = OsmPipeline(num_partitions=3).features(elements_dataset(doc["elements"]))
    out_dir = str(tmp_path / "geojsonl")
    manifest = write_features_geojsonl(feats_ds, out_dir)
    assert sum(m["rows"] for m in manifest) > 0

    got = read_features_geojsonl(out_dir)
    expected = xml2geojson(raw)["features"]
    key = lambda f: json.dumps(f, sort_keys=True)
    assert sorted(map(key, got)) == sorted(map(key, expected))
    # every line parsed as a proper Feature
    assert all(f["type"] == "Feature" for f in got)
