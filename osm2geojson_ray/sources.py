"""Sources and sinks (SURVEY.md §2.1).

- ``read_osm_files`` / ``read_overpass_json_files``: sharded file
  reads -> elements Dataset.  XML/JSON documents are not splittable
  mid-file, so sharding is at file granularity: ``read_binary_files``
  hands each file to a ``flat_map``-style batch parser.
- ``overpass_call``: Overpass API POST with bounded retries
  (reference helpers.py:33-84).  No network in this sandbox — the
  function is real but will raise on connection failure after retries.
- ``write_feature_collection`` / ``write_features_parquet``: GeoJSON
  document sink (small results) and partitioned parquet sink
  (resumable large results).
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import urllib.request
from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray.data

from .model.schema import ELEMENT_SCHEMA, elements_to_rows
from .model.xml_parse import parse_osm_xml

OVERPASS_URL = "https://overpass-api.de/api/interpreter"


def read_image_table(path: str, *, columns: Optional[List[str]] = None):
    """Read the image+caption table (the engine's raster-side input,
    BASELINE input_hint schema: image_id:string, bytes:binary, w:int32,
    h:int32, fmt:string, caption:string, phash:int64).

    A ``.lance`` dataset directory routes to ``ray.data.read_lance``
    (column projection pushed down); anything else reads as parquet.
    The ``lance`` package is not installed in this sandbox, so the
    Lance branch is exercised only for its error contract here — the
    parquet branch carries the tests, and
    ``images.synth.synth_image_table`` produces the same schema for
    deterministic benchmarks."""
    if path.rstrip("/").endswith(".lance"):
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "Lance input requires the 'lance' package, which is not "
                "installed in this environment; convert the dataset to "
                "parquet or install pylance"
            ) from e
        return ray.data.read_lance(path, columns=columns)
    return ray.data.read_parquet(path, columns=columns)


def _elements_from_doc(doc: dict, shard: str) -> pa.Table:
    rows = elements_to_rows(doc.get("elements", []))
    tbl = pa.Table.from_pylist(rows, schema=ELEMENT_SCHEMA)
    return tbl.append_column("shard", pa.array([shard] * len(tbl), pa.string()))


def read_osm_files(paths: List[str]):
    """OSM XML shards -> elements Dataset (one task per file)."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            doc = parse_osm_xml(row["bytes"].decode("utf-8"))
            if doc:
                tables.append(_elements_from_doc(doc, os.path.basename(row["path"])))
        if not tables:
            return ELEMENT_SCHEMA.append(pa.field("shard", pa.string())).empty_table()
        return pa.concat_tables(tables)

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


DOC_META_SCHEMA = pa.schema(
    [
        ("shard", pa.string()),
        ("version", pa.float64()),
        ("generator", pa.string()),
        ("timestamp_osm_base", pa.string()),
        ("copyright", pa.string()),
    ]
)


def read_doc_meta(paths: List[str]):
    """Document-header round-trip for sharded sources: one row per shard
    with the Overpass header fields (version / generator / osm3s) that
    the element stream intentionally drops (reference format_ojson,
    parse_xml.py:239-274).  Tiny side table — join on ``shard`` when a
    consumer needs provenance."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            raw = row["bytes"].decode("utf-8")
            doc = (
                json.loads(raw)
                if raw.lstrip()[:1] in ("{", "[")
                else parse_osm_xml(raw)
            ) or {}
            osm3s = doc.get("osm3s") or {}
            rows.append(
                {
                    "shard": os.path.basename(row["path"]),
                    "version": float(doc["version"]) if doc.get("version") is not None else None,
                    "generator": doc.get("generator"),
                    "timestamp_osm_base": osm3s.get("timestamp_osm_base"),
                    "copyright": osm3s.get("copyright"),
                }
            )
        return pa.Table.from_pylist(rows, schema=DOC_META_SCHEMA)

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def read_overpass_json_files(paths: List[str]):
    """Overpass JSON shards -> elements Dataset."""
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for row in batch.to_pylist():
            doc = json.loads(row["bytes"].decode("utf-8"))
            tables.append(_elements_from_doc(doc, os.path.basename(row["path"])))
        if not tables:
            return ELEMENT_SCHEMA.append(pa.field("shard", pa.string())).empty_table()
        return pa.concat_tables(tables)

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def overpass_call(query: str, *, retries: int = 5, backoff_sec: float = 5.0,
                  url: str = OVERPASS_URL, timeout: float = 60.0) -> str:
    """POST an Overpass query with bounded fixed-backoff retries
    (reference retry_request_multi, helpers.py:33-60).  At scale this
    is a driver-side fetch feeding ``elements_dataset``; Ray task
    retries subsume this loop for file-based sources."""
    data = urllib.parse.urlencode({"data": query}).encode()
    last_err: Optional[Exception] = None
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(url, data=data, timeout=timeout) as resp:
                return resp.read().decode("utf-8")
        except urllib.error.HTTPError as e:
            # reference parity: ONLY HTTP-status errors are retried
            # (helpers.py:33-60 retries requests HTTPError); transport
            # errors (DNS, refused, timeout) propagate immediately
            last_err = e
            if attempt < retries - 1:
                time.sleep(backoff_sec)
    raise ConnectionError(f"overpass_call failed after {retries} attempts: {last_err}")


def stitch_osm_resumable(
    shard_paths: List[str], out_dir: str, *, max_concurrent: int = 1, **pipe_kwargs
):
    """End-to-end resumable stitching (north_rule: "resumable from
    checkpoint with per-partition lineage + metrics"): one output
    partition per input OSM shard, each stitched by the full
    distributed pipeline; a restart consults the lineage manifest and
    skips completed shards.  ``max_concurrent`` bounds how many shard
    pipelines run at once (keep the cluster busy across shard DAG
    boundaries at large shard counts).  Returns the manifest records."""
    from .pipeline.osm import OsmPipeline
    from .state.lineage import PartitionedRun

    run = PartitionedRun(out_dir)

    def build(shard: str) -> pa.Table:
        from .pipeline.osm import FEATURE_SCHEMA

        path = next(p for p in shard_paths if os.path.basename(p) == shard)
        elements = read_osm_files([path]).map_batches(
            lambda t: t.drop_columns(["shard"]), batch_format="pyarrow"
        )
        pipe = OsmPipeline(**pipe_kwargs)
        feats = pipe.features(elements)
        tbls = list(feats.iter_batches(batch_format="pyarrow"))
        return (
            pa.concat_tables(tbls, promote_options="default")
            if tbls
            else FEATURE_SCHEMA.empty_table()
        )

    return run.run(
        [os.path.basename(p) for p in shard_paths],
        build,
        input_refs=lambda shard: [shard],
        max_concurrent=max_concurrent,
    )


def write_feature_collection(features_ds, path: str) -> dict:
    """Small-result sink: collect feature rows into one FeatureCollection
    document (ordering by ``seq`` like the reference output)."""
    from .pipeline.osm import features_to_geojson

    doc = features_to_geojson(features_ds)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f)
    return doc


def write_features_parquet(features_ds, out_dir: str, *, min_rows_per_file: int = 100_000):
    """Large-result sink: a directory of parquet part files (resumable
    layout; pair with state.PartitionedRun for checkpointed runs)."""
    features_ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
    return out_dir


def write_features_geojsonl(features_ds, out_dir: str) -> List[dict]:
    """Distributed GeoJSON sink: one ``.geojsonl`` part file per block,
    one Feature per line (reference CLI emits one FeatureCollection,
    __main__.py:115-135 — at scale that single document cannot exist,
    so the sharded line-delimited form is the faithful analogue).

    Each Feature line is assembled by pure Arrow string concatenation
    of the already-serialized properties/geometry JSON (no per-row
    json.dumps); lines are written seq-sorted per file and files are
    named by their smallest seq so a directory listing reads in
    document order when blocks hold contiguous ranges.  Returns the
    manifest (path, rows) per part file."""
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.Table.from_pydict(
                {"path": [], "rows": []},
                schema=pa.schema([("path", pa.string()), ("rows", pa.int64())]),
            )
        batch = batch.sort_by("seq")
        lines = pc.binary_join_element_wise(
            '{"type": "Feature", "properties": ',
            batch["properties_json"],
            ', "geometry": ',
            batch["geometry_json"],
            "}\n",
            "",
        )
        min_seq = pc.min(batch["seq"]).as_py()
        path = os.path.join(out_dir, f"part-{min_seq:012d}.geojsonl")
        with open(path, "w", encoding="utf-8") as f:
            f.writelines(lines.to_pylist())
        return pa.Table.from_pydict(
            {"path": [path], "rows": [len(batch)]},
            schema=pa.schema([("path", pa.string()), ("rows", pa.int64())]),
        )

    return features_ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=None
    ).take_all()


def read_features_geojsonl(out_dir: str) -> List[dict]:
    """Read a sharded ``.geojsonl`` directory back into a Feature list
    (files in name order = seq order for contiguous blocks)."""
    feats: List[dict] = []
    for name in sorted(os.listdir(out_dir)):
        if not name.endswith(".geojsonl"):
            continue
        with open(os.path.join(out_dir, name), encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    feats.append(json.loads(line))
    return feats


def write_clustered_parquet(
    ds,
    key: str,
    out_dir: str,
    *,
    num_partitions: int = 16,
    sample_rows: int = 4096,
    overwrite: bool = False,
):
    """Locality-clustered partitioned parquet sink — the OPTIMIZE
    ZORDER layout: range-partition rows by sampled quantile bounds of
    an int64 sort key (pair with ``spatial.cells.zorder_key`` for
    spatial locality), sort WITHIN each partition, one file per
    partition plus a ``manifest.json`` of disjoint key ranges.  A
    reader doing a key-range scan then touches only the overlapping
    files.

    Scale shape: NO global sort — one bounded sample (``limit``), a
    hash-free range exchange on the broadcast bounds, and a per-
    partition lexsort; each partition writes independently, so a
    failed run resumes by skipping files already present (the
    same skip-finished idiom as stitch_osm_resumable).
    """
    import json as _json

    os.makedirs(out_dir, exist_ok=True)

    # Bounds from a CROSS-BLOCK strided sample, not ds.limit (the first
    # rows): on key-sorted/clustered input a head sample collapses the
    # quantiles and routes nearly everything to one partition.  Up to 64
    # evenly-strided keys per block keeps the pulled sample tiny (64 x
    # #blocks int64s) while covering every block's key range.
    def block_sample(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table({key: pa.array([], pa.int64())})
        idx = np.unique(np.linspace(0, n - 1, min(64, n)).astype(np.int64))
        return pa.table({key: pa.array(
            t[key].to_numpy(zero_copy_only=False)[idx].astype(np.int64))})

    sample = ds.select_columns([key]).map_batches(
        block_sample, batch_format="pyarrow"
    ).take_all()
    keys = np.array([r[key] for r in sample], dtype=np.int64)
    if len(keys) > sample_rows:  # driver-side cap, still strided
        keys = keys[np.unique(np.linspace(0, len(keys) - 1, sample_rows).astype(np.int64))]
    keys = np.sort(keys)
    if len(keys) == 0:
        bounds = np.array([], dtype=np.int64)
    else:
        qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
        bounds = np.unique(np.quantile(keys, qs, method="lower").astype(np.int64))
    nparts = len(bounds) + 1

    def assign(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, k, side="right").astype(np.int64)
        return t.append_column("__range", pa.array(part))

    from .relational import hash_exchange_map

    written = []

    def write_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({"part": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        p = int(tbl["__range"][0].as_py())
        tbl = tbl.drop_columns(
            [c for c in ("__range", "__part") if c in tbl.column_names]
        )
        order = np.argsort(tbl[key].to_numpy(zero_copy_only=False), kind="stable")
        tbl = tbl.take(pa.array(order))
        path = os.path.join(out_dir, f"part-{p:05d}.parquet")
        if overwrite or not os.path.exists(path):
            import pyarrow.parquet as pq

            pq.write_table(tbl, path)
        return pa.table({"part": [p], "n": [len(tbl)]})

    # range exchange: reuse the hash exchange machinery with the
    # precomputed __part column as the routing key (mod nparts is the
    # identity on 0..nparts-1)
    routed = ds.map_batches(assign, batch_format="pyarrow")
    stats_ds = hash_exchange_map(routed, "__range", nparts, write_part)
    stats = stats_ds.take_all() if stats_ds is not None else []
    if not stats:
        # empty input: persist the schema in an empty part file so
        # read_clustered_parquet returns an empty dataset instead of
        # IndexError-ing on manifest["parts"][0]
        import pyarrow.parquet as pq

        schema = ds.schema()
        pa_schema = getattr(schema, "base_schema", None) if schema is not None else None
        if pa_schema is None:
            pa_schema = pa.schema([(key, pa.int64())])
        pq.write_table(
            pa_schema.empty_table(), os.path.join(out_dir, "part-00000.parquet")
        )
        stats = [{"part": 0, "n": 0}]
    manifest = {
        "key": key,
        "bounds": bounds.tolist(),
        "parts": sorted(
            ({"part": int(r["part"]), "rows": int(r["n"])} for r in stats),
            key=lambda r: r["part"],
        ),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        _json.dump(manifest, f)
    return manifest


def read_clustered_parquet(out_dir: str, *, key_min=None, key_max=None):
    """Range-pruned reader for a ``write_clustered_parquet`` layout:
    consult the manifest's disjoint key ranges and read ONLY the files
    that can overlap [key_min, key_max] (inclusive), with a residual
    filter for exactness inside the boundary files.  The manifest makes
    the prune an O(#parts) driver decision — no file footers touched
    for skipped ranges."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    key = manifest["key"]
    bounds = manifest["bounds"]

    def part_range(p: int):
        lo = bounds[p - 1] if p > 0 else None  # inclusive
        hi = bounds[p] if p < len(bounds) else None  # exclusive
        return lo, hi

    paths = []
    for entry in manifest["parts"]:
        p = entry["part"]
        lo, hi = part_range(p)
        if key_min is not None and hi is not None and hi <= key_min:
            continue
        if key_max is not None and lo is not None and lo > key_max:
            continue
        paths.append(os.path.join(out_dir, f"part-{p:05d}.parquet"))
    if not paths:
        import pyarrow.parquet as pq

        first = os.path.join(out_dir, f"part-{manifest['parts'][0]['part']:05d}.parquet")
        return ray.data.from_arrow(pq.read_schema(first).empty_table())

    ds = ray.data.read_parquet(paths)

    if key_min is None and key_max is None:
        return ds

    def residual(t: pa.Table) -> pa.Table:
        import numpy as np_

        k = t[key].to_numpy(zero_copy_only=False)
        m = np_.ones(len(k), dtype=bool)
        if key_min is not None:
            m &= k >= key_min
        if key_max is not None:
            m &= k <= key_max
        return t.filter(pa.array(m))

    return ds.map_batches(residual, batch_format="pyarrow")
