"""Cluster job entrypoint for the flagship stitch + tile/PIP pipeline.

Submit to a running Ray cluster (north_rule: "run via ray job submit on
a fixed-size multi-node Ray cluster"):

    ray job submit --working-dir /root/repo -- \
        python scripts/job_entry.py \
            --elements /data/elements/*.parquet --out /data/features \
            --images /data/images.parquet --pip-out /data/matched

or run standalone (starts local Ray).  Output is resumable: features
land as one parquet directory per input shard with a `_lineage.jsonl`
manifest (partition id, input refs, row count, value checksum, wall
time); a resubmitted job skips completed shards.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--elements", nargs="+", required=True,
                    help="element parquet shard path(s) or globs")
    ap.add_argument("--out", required=True,
                    help="features output dir (parquet, lineage manifest)")
    ap.add_argument("--images", default=None,
                    help="optional image table (parquet or .lance) for the "
                         "tile/PIP leg")
    ap.add_argument("--pip-out", default=None,
                    help="matched image->polygon output dir (parquet)")
    ap.add_argument("--num-partitions", type=int, default=32)
    ap.add_argument("--pip-level", type=int, default=10)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    from osm2geojson_ray.pipeline.osm import FEATURE_SCHEMA, OsmPipeline
    from osm2geojson_ray.state.lineage import PartitionedRun

    import pyarrow as pa

    shard_paths = sorted(
        p for pattern in args.elements for p in (glob.glob(pattern) or [pattern])
    )
    t0 = time.time()
    run = PartitionedRun(args.out)

    def build(shard: str) -> pa.Table:
        path = next(p for p in shard_paths if os.path.basename(p) == shard)
        pipe = OsmPipeline(num_partitions=args.num_partitions)
        feats = pipe.features(path)  # fused read+split over row groups
        tbls = list(feats.iter_batches(batch_format="pyarrow"))
        return (
            pa.concat_tables(tbls, promote_options="default")
            if tbls
            else FEATURE_SCHEMA.empty_table()
        )

    records = run.run(
        [os.path.basename(p) for p in shard_paths],
        build,
        input_refs=lambda shard: [shard],
        max_concurrent=2,
    )
    n_feats = sum(r["rows"] for r in records.values())

    result = {
        "features_rows": n_feats,
        "shards": len(records),
        "out": args.out,
        "stitch_sec": round(time.time() - t0, 3),
    }

    if args.images and args.pip_out:
        from osm2geojson_ray.queries import corpus_polygons
        from osm2geojson_ray.sources import read_image_table
        from osm2geojson_ray.spatial.pip import broadcast_pip_join

        t1 = time.time()
        imgs = read_image_table(args.images)
        if "lon" not in (imgs.schema().names or []):
            # table carries no geo-position: derive the deterministic
            # placement used by the synthetic corpus (image index ->
            # lon/lat), same as bench.py's add_position stage
            import numpy as np
            import pyarrow.compute as pc

            from osm2geojson_ray.images.synth import image_position

            def add_position(batch: pa.Table) -> pa.Table:
                idx = (
                    pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4),
                            pa.int64())
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                lon, lat = image_position(idx, (-10.0, -10.0, 60.0, 60.0))
                return batch.append_column("lon", pa.array(lon)).append_column(
                    "lat", pa.array(lat)
                )

            imgs = imgs.map_batches(add_position, batch_format="pyarrow")
        matched = broadcast_pip_join(imgs, corpus_polygons(),
                                     level=args.pip_level)
        matched.write_parquet(args.pip_out)
        result["pip_matched_rows"] = matched.count()
        result["pip_sec"] = round(time.time() - t1, 3)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
