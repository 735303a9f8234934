"""Distributed 2-D convex hull over integer points.

Scale shape (the only one that works at 10^12 points): each block
VECTORIZED-prunes with the Akl-Toussaint heuristic — points strictly
inside the convex polygon of the block's 8 directional extremes
(min/max of x, y, x+y, x-y) can never be hull vertices of any superset,
so they are discarded locally; only the tiny survivor stream (the
block-hull upper bound; typically O(sqrt(n)) for scattered data) is
gathered into ONE exact monotone-chain reduce.  The final chain is a
sequential loop, but over survivors only — their count is checked
against ``max_candidates`` with a LOUD raise (adversarial inputs such
as all-points-on-a-circle keep everything; raise the cap or pre-bucket
for those, never silently truncate — the repo's no-silent-caps rule).

Output: the DISTINCT strict hull vertices (collinear mid-edge points
and duplicates excluded), matching the SQL Caratheodory vertex test
(p is a vertex iff p is not in the convex hull of the other distinct
points).  Reference analog: none (the reference has no hull operator);
this extends the geospatial aggregate family (SURVEY.md §2.5 graft).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_HULL_SCHEMA = pa.schema([("x", pa.int64()), ("y", pa.int64())])


def _chain(xy: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain over DEDUPED lexsorted int64 points
    (n, 2) -> strict hull vertices in CCW order.  Collinear mid-edge
    points are dropped (strict turns only).  Sequential loop — callers
    must prune first."""
    n = len(xy)
    if n <= 2:
        return xy

    def half(pts):
        out = []
        for p in pts:
            while len(out) >= 2:
                ax, ay = out[-2]
                bx, by = out[-1]
                # strict left turn required: <= 0 pops collinear too
                if (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) <= 0:
                    out.pop()
                else:
                    break
            out.append((int(p[0]), int(p[1])))
        return out[:-1]  # endpoint repeats in the other half

    lower = half(xy)
    upper = half(xy[::-1])
    return np.array(lower + upper, dtype=np.int64)


def _extreme_polygon(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """CCW hull of the 8 directional extreme points of a block."""
    cand = []
    for key in (x, y, x + y, x - y):
        cand.append((int(x[np.argmin(key)]), int(y[np.argmin(key)])))
        cand.append((int(x[np.argmax(key)]), int(y[np.argmax(key)])))
    pts = np.unique(np.array(cand, dtype=np.int64), axis=0)
    return _chain(pts)


def _local_prune(t: pa.Table, x_col: str, y_col: str) -> pa.Table:
    n = len(t)
    if n == 0:
        return _HULL_SCHEMA.empty_table()
    x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    poly = _extreme_polygon(x, y)
    if len(poly) >= 3:
        # strictly inside the CCW extreme polygon => discard (safe:
        # such a point is in the hull interior of ANY superset)
        inside = np.ones(n, dtype=bool)
        for i in range(len(poly)):
            ax, ay = poly[i]
            bx, by = poly[(i + 1) % len(poly)]
            inside &= (bx - ax) * (y - ay) - (by - ay) * (x - ax) > 0
        keep = ~inside
        x, y = x[keep], y[keep]
    xy = np.unique(np.stack([x, y], axis=1), axis=0)
    return pa.Table.from_pydict(
        {"x": xy[:, 0], "y": xy[:, 1]}, schema=_HULL_SCHEMA
    )


def convex_hull(points, *, x_col: str = "x", y_col: str = "y",
                max_candidates: int = 200_000):
    """Distributed exact convex hull: per-block Akl-Toussaint prune
    (vectorized) -> one exact monotone-chain reduce over the survivor
    stream.  Returns a Dataset of the distinct strict hull vertices
    (x, y) — row order is not meaningful (gate sorts).  Raises when
    survivors exceed ``max_candidates`` (see module docstring)."""
    import ray as _ray
    import ray.data

    import functools

    pruned = points.map_batches(
        functools.partial(_local_prune, x_col=x_col, y_col=y_col),
        batch_format="pyarrow",
    )

    @_ray.remote
    def _final(*blocks):
        tbl = pa.concat_tables(blocks, promote_options="default")
        if len(tbl) > max_candidates:
            raise ValueError(
                f"convex_hull: {len(tbl)} candidates survived pruning "
                f"(> max_candidates={max_candidates}); raise the cap or "
                "pre-bucket near-circular inputs"
            )
        if len(tbl) == 0:
            return _HULL_SCHEMA.empty_table()
        xy = np.unique(
            np.stack(
                [tbl["x"].to_numpy(zero_copy_only=False),
                 tbl["y"].to_numpy(zero_copy_only=False)],
                axis=1,
            ),
            axis=0,
        )
        hull = _chain(xy)
        return pa.Table.from_pydict(
            {"x": hull[:, 0], "y": hull[:, 1]}, schema=_HULL_SCHEMA
        )

    refs = []
    for bundle in pruned.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs:
        from ..relational import empty_dataset

        return empty_dataset(_HULL_SCHEMA)
    return ray.data.from_arrow_refs([_final.remote(*refs)])
