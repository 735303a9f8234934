"""From-scratch geometry kernels (no shapely in this environment).

Geometries are plain GeoJSON-shaped dicts::

    {"type": "Point"|"LineString"|"Polygon"|"MultiLineString"|"MultiPolygon",
     "coordinates": nested lists of [lon, lat]}

All kernels are pure functions designed to run inside ``map_batches`` /
``map_groups`` workers; nothing here touches Ray.
"""

from .kernels import (  # noqa: F401
    signed_area,
    is_ccw,
    rings_equal,
    rotate_ring,
    reverse_ring,
    close_ring,
    point_in_ring,
    point_in_polygon,
    ring_bbox,
    bbox_contains,
    bbox_intersects,
    ring_contains_ring,
    orient_polygon,
    orient_multipolygon,
    is_valid_polygon,
)
from .linemerge import linemerge  # noqa: F401
