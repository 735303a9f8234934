from .osm import OsmPipeline, elements_dataset, features_to_geojson  # noqa: F401
