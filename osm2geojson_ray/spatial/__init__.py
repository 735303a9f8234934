from .cells import (  # noqa: F401
    MAX_LEVEL,
    cell_id,
    cell_bounds,
    cell_parent,
    cover_bbox,
    cover_polygon,
    point_cells,
)
