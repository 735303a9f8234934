"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship pipeline at sf0.001 — OSM corpus stitched by
  the distributed pipeline, assembled polygons broadcast into a
  cell-indexed point-in-polygon join against deterministic synthetic
  image points, plus tile assignment counts.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2 + graft ops); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for the SQL-expressible
  subset (same column names; float aggregates rounded on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from osm2geojson_ray.queries import g_pip_join_osm, osm_corpus_features

    sf_dir = "/root/testdata/sf0.001"
    # stitching correctness (distributed pipeline over the corpus) ...
    features = osm_corpus_features(sf_dir)
    # ... feeding the spatial join (broadcast PIP over cell index)
    pip = g_pip_join_osm(sf_dir)
    n_matches = pip.count()
    import pyarrow as pa

    summary = pa.Table.from_pydict(
        {
            "stage": ["osm_features", "pip_matches"],
            "rows": [features.num_rows, n_matches],
        }
    )
    return summary


def queries() -> dict[str, Callable[[str], Any]]:
    from osm2geojson_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from osm2geojson_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
