"""CLI: convert OSM XML / Overpass JSON to GeoJSON.

Mirrors the reference CLI surface (reference __main__.py:11-135):
reader selected by extension or --reader, overwrite guard, optional
custom areaKeys / polygon-features config, indent control; adds
--distributed to run the conversion through the Ray Data pipeline.

    python -m osm2geojson_ray input.osm output.geojson [-f] [--indent N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="osm2geojson_ray", description=__doc__)
    p.add_argument("infile", help="input .osm / .xml / .json file")
    p.add_argument("outfile", help="output GeoJSON file (- for stdout)")
    p.add_argument("-f", "--force", action="store_true", help="overwrite existing output")
    p.add_argument("--reader", choices=["auto", "xml", "json"], default="auto")
    p.add_argument("--indent", type=int, default=None)
    p.add_argument("--areas", help="custom areaKeys JSON file")
    p.add_argument("--polygons", help="custom polygon-features JSON file")
    p.add_argument("--no-filter-used-refs", action="store_true")
    p.add_argument("--raise-on-failure", action="store_true")
    p.add_argument(
        "--distributed",
        action="store_true",
        help="run through the Ray Data pipeline (starts a local Ray session)",
    )
    p.add_argument(
        "--geojsonl-dir",
        help="with --distributed: write a sharded .geojsonl directory "
        "(one Feature per line, one part file per block) instead of "
        "collecting a single FeatureCollection on the driver",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.outfile != "-" and os.path.exists(args.outfile) and not args.force:
        print(f"output file {args.outfile!r} exists (use -f to overwrite)", file=sys.stderr)
        return 1

    reader = args.reader
    if reader == "auto":
        ext = os.path.splitext(args.infile)[1].lower()
        reader = "json" if ext == ".json" else "xml"

    with open(args.infile, encoding="utf-8") as f:
        raw = f.read()

    area_keys = polygon_features = None
    if args.areas:
        with open(args.areas) as f:
            loaded = json.load(f)
        area_keys = loaded.get("areaKeys", loaded)
    if args.polygons:
        with open(args.polygons) as f:
            polygon_features = json.load(f)

    kwargs = dict(
        filter_used_refs=not args.no_filter_used_refs,
        area_keys=area_keys,
        polygon_features=polygon_features,
        raise_on_failure=args.raise_on_failure,
    )

    if args.distributed:
        import ray

        from .model.xml_parse import parse_osm_xml
        from .pipeline.osm import OsmPipeline, elements_dataset, features_to_geojson

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        doc = json.loads(raw) if reader == "json" else parse_osm_xml(raw)
        from .classify import PolygonClassifier

        clf = None
        if area_keys is not None or polygon_features is not None:
            clf = PolygonClassifier(polygon_features, area_keys)
        pipe = OsmPipeline(classifier=clf, filter_used_refs=not args.no_filter_used_refs)
        feats = pipe.features(elements_dataset(doc["elements"]))
        if args.geojsonl_dir:
            from .sources import write_features_geojsonl

            manifest = write_features_geojsonl(feats, args.geojsonl_dir)
            ray.shutdown()
            print(
                json.dumps({"out_dir": args.geojsonl_dir,
                            "files": len(manifest),
                            "rows": sum(m["rows"] for m in manifest)})
            )
            return 0
        result = features_to_geojson(feats)
        ray.shutdown()
    else:
        from .document import json2geojson, xml2geojson

        convert = json2geojson if reader == "json" else xml2geojson
        result = convert(raw, **kwargs)

    text = json.dumps(result, indent=args.indent)
    if args.outfile == "-":
        print(text)
    else:
        with open(args.outfile, "w", encoding="utf-8") as f:
            f.write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
