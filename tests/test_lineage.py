"""Resumable partitioned output: a rerun skips completed partitions and
final output is byte-identical to an uninterrupted run."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from osm2geojson_ray.state.lineage import PartitionedRun


def build(part: str) -> pa.Table:
    n = int(part)
    return pa.Table.from_pydict({"x": list(range(n * 10, n * 10 + 5)), "part": [part] * 5})


def read_all(run: PartitionedRun, parts):
    return {
        p: pq.read_table(os.path.join(run.partition_dir(p), "data.parquet"))
        for p in parts
    }


def test_resume_skips_done(tmp_path):
    parts = [str(i) for i in range(4)]
    run = PartitionedRun(str(tmp_path / "out"))
    # interrupted run: only first two partitions complete
    run.run(parts[:2], build)
    assert set(run.completed()) == {"0", "1"}

    calls = []

    def tracking_build(p):
        calls.append(p)
        return build(p)

    # resumed run over the full partition list
    done = run.run(parts, tracking_build)
    assert calls == ["2", "3"]  # completed partitions skipped
    assert set(done) == set(parts)

    # byte-identical to an uninterrupted run
    fresh = PartitionedRun(str(tmp_path / "fresh"))
    fresh.run(parts, build)
    got = read_all(run, parts)
    want = read_all(fresh, parts)
    for p in parts:
        assert got[p].equals(want[p])
        assert done[p]["checksum"] == fresh.completed()[p]["checksum"]
        assert done[p]["rows"] == 5


def test_stitch_osm_resumable(ray_session, tmp_path):
    """End-to-end resume of the distributed stitch: one partition per
    OSM shard; a second run skips completed shards."""
    import json
    import time

    from osm2geojson_ray.sources import stitch_osm_resumable

    from .conftest import fixture_path

    shards = [fixture_path("way.osm"), fixture_path("relation.osm")]
    out = str(tmp_path / "stitch")
    t0 = time.time()
    done = stitch_osm_resumable(shards, out, num_partitions=2)
    assert set(done) == {"way.osm", "relation.osm"}
    assert all(rec["rows"] >= 1 for rec in done.values())

    # resume: manifest satisfied -> no work, identical manifest
    done2 = stitch_osm_resumable(shards, out, num_partitions=2)
    assert {k: v["checksum"] for k, v in done2.items()} == {
        k: v["checksum"] for k, v in done.items()
    }


def test_checksum_order_insensitive():
    from osm2geojson_ray.state.lineage import _table_checksum

    a = pa.Table.from_pydict({"x": [1, 2, 3], "s": ["a", "b", None], "f": [1.5, None, 0.0]})
    b = a.take([2, 0, 1])
    assert _table_checksum(a) == _table_checksum(b)
    c = pa.Table.from_pydict({"x": [1, 2, 4], "s": ["a", "b", None], "f": [1.5, None, 0.0]})
    assert _table_checksum(a) != _table_checksum(c)
    # null vs empty string distinguished
    d = pa.Table.from_pydict({"x": [1], "s": [None], "f": [0.0]})
    e = pa.Table.from_pydict({"x": [1], "s": [""], "f": [0.0]})
    assert _table_checksum(d) != _table_checksum(e)


def test_concurrent_partitions(tmp_path):
    """max_concurrent > 1: same manifest and identical partition files
    as the serial loop, every partition present exactly once."""
    parts = [str(i) for i in range(8)]
    serial = PartitionedRun(str(tmp_path / "serial"))
    serial.run(parts, build)
    conc = PartitionedRun(str(tmp_path / "conc"))
    done = conc.run(parts, build, max_concurrent=4)
    assert set(done) == set(parts)
    assert {k: v["checksum"] for k, v in serial.completed().items()} == {
        k: v["checksum"] for k, v in conc.completed().items()
    }
    for p in parts:
        assert read_all(serial, [p])[p].equals(read_all(conc, [p])[p])
    # manifest has one line per partition
    with open(conc.manifest_path) as f:
        assert len(f.readlines()) == len(parts)
