"""Distributed rectangle-intersection join (rect x rect) over an
integer grid.

Scale shape (the spatial-join standard for two LARGE sides):

- each side explodes its rectangles into the grid cells they cover
  (slim (cell, side, id, bounds) rows — a rect of width w covers
  O((w/cell)^2) cells, bounded for bounded rects);
- ONE hash exchange co-locates each cell's rows from both sides;
- per partition, a vectorized pandas merge on the cell key enumerates
  candidate pairs and the exact closed-interval overlap test filters
  them;
- REPORT-ONCE dedup without a distinct pass: a surviving pair is
  emitted only from the CANONICAL cell — the cell containing the
  intersection's min corner (max(ax0,bx0), max(ay0,by0)), which both
  sides' covers necessarily include — so a pair spanning many shared
  cells appears exactly once.

Touching rectangles (shared edge/corner) count as intersecting, which
keeps the SQL twin a plain conjunction of <= comparisons over int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RECT_PAIR_SCHEMA = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])

_GRID_AXIS = 1 << 12  # cells per axis in the packed key (cix*4096+ciy)


def _cover_rows(t: pa.Table, side: int, cell: int) -> pa.Table:
    """Explode rects into (cell_key, side, id, x0, y0, x1, y1) rows."""
    n = len(t)
    out_schema = pa.schema(
        [("cell_key", pa.int64()), ("side", pa.int8()), ("id", pa.int64()),
         ("x0", pa.int64()), ("y0", pa.int64()), ("x1", pa.int64()), ("y1", pa.int64())]
    )
    if n == 0:
        return out_schema.empty_table()
    cols = {
        c: t[c].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in ("id", "x0", "y0", "x1", "y1")
    }
    ix0, ix1 = cols["x0"] // cell, cols["x1"] // cell
    iy0, iy1 = cols["y0"] // cell, cols["y1"] // cell
    if int(ix1.max()) >= _GRID_AXIS or int(iy1.max()) >= _GRID_AXIS:
        raise ValueError("rect coordinates exceed the packed grid range")
    nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
    rep = nx * ny
    total = int(rep.sum())
    row = np.repeat(np.arange(n), rep)
    # local cell index within each rect's cover, row-major over (nx, ny)
    starts = np.concatenate(([0], np.cumsum(rep)))[:-1]
    local = np.arange(total) - np.repeat(starts, rep)
    ny_r = np.repeat(ny, rep)
    cix = np.repeat(ix0, rep) + local // ny_r
    ciy = np.repeat(iy0, rep) + local % ny_r
    return pa.Table.from_pydict(
        {
            "cell_key": cix * _GRID_AXIS + ciy,
            "side": np.full(total, side, dtype=np.int8),
            "id": cols["id"][row],
            "x0": cols["x0"][row],
            "y0": cols["y0"][row],
            "x1": cols["x1"][row],
            "y1": cols["y1"][row],
        },
        schema=out_schema,
    )


def rect_intersection_join(
    left,
    right,
    *,
    cell: int = 1 << 16,
    num_partitions: int = 16,
    max_cell_pairs: int = 1 << 22,
):
    """All intersecting (a_id, b_id) pairs between two rect Datasets
    with int64 columns (id, x0, y0, x1, y1), x0 <= x1 and y0 <= y1.
    Closed-interval semantics: touching rects intersect.  Each pair is
    emitted exactly once (canonical-cell report-once).

    ``max_cell_pairs``: a DEGENERATE cell whose candidate product
    n_left x n_right exceeds this is dropped from enumeration with a
    logged warning (the no-silent-caps standard — a pile of stacked
    rects in one cell is quadratic; pick a smaller ``cell`` or
    pre-aggregate identical rects).  0 disables the cap."""
    from ..relational import empty_dataset, hash_exchange_map

    lrows = left.map_batches(
        lambda t: _cover_rows(t, 0, cell), batch_format="pyarrow"
    )
    rrows = right.map_batches(
        lambda t: _cover_rows(t, 1, cell), batch_format="pyarrow"
    )

    def pairs(df):
        import pandas as pd

        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        if not len(a) or not len(b):
            return pd.DataFrame({"a_id": pd.Series([], dtype="int64"),
                                 "b_id": pd.Series([], dtype="int64")})
        if max_cell_pairs:
            ca = a["cell_key"].value_counts()
            cb = b["cell_key"].value_counts()
            prod = ca.mul(cb, fill_value=0)
            hot = prod[prod > max_cell_pairs]
            if len(hot):
                import logging

                logging.getLogger(__name__).warning(
                    "rect_intersection_join: dropping %d cell(s) with "
                    "candidate products up to %d (> max_cell_pairs=%d)",
                    len(hot), int(hot.max()), max_cell_pairs,
                )
                a = a[~a["cell_key"].isin(hot.index)]
                b = b[~b["cell_key"].isin(hot.index)]
                if not len(a) or not len(b):
                    return pd.DataFrame(
                        {"a_id": pd.Series([], dtype="int64"),
                         "b_id": pd.Series([], dtype="int64")})
        m = a.merge(b, on="cell_key", suffixes=("_a", "_b"))
        keep = (
            (m["x0_a"] <= m["x1_b"]) & (m["x0_b"] <= m["x1_a"])
            & (m["y0_a"] <= m["y1_b"]) & (m["y0_b"] <= m["y1_a"])
        )
        m = m[keep]
        # canonical cell: the one holding the intersection's min corner
        canon = (
            np.maximum(m["x0_a"].to_numpy(), m["x0_b"].to_numpy()) // cell
        ) * _GRID_AXIS + (
            np.maximum(m["y0_a"].to_numpy(), m["y0_b"].to_numpy()) // cell
        )
        m = m[m["cell_key"].to_numpy() == canon]
        return pd.DataFrame(
            {"a_id": m["id_a"].to_numpy(), "b_id": m["id_b"].to_numpy()}
        )

    out = hash_exchange_map(
        [lrows, rrows], "cell_key", num_partitions, pairs, fn_format="pandas"
    )
    if out is None:
        return empty_dataset(RECT_PAIR_SCHEMA)
    return out
