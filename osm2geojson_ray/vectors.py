"""Arrow list<float> column -> (n, dim) float64 matrix, zero-copy-ish.

Embedding columns arrive as (fixed or variable) list arrays; converting
through ``to_pylist`` builds n*dim Python floats.  ``vec_matrix``
instead flattens the Arrow values buffer straight into numpy and
reshapes — only the dtype cast allocates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def vec_matrix(col) -> np.ndarray:
    """ChunkedArray/Array of list<floating> (no nulls, equal lengths)
    -> (n, dim) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    lengths = pc.list_value_length(col)
    if col.null_count or pc.min(lengths).as_py() != pc.max(lengths).as_py():
        # ragged or null rows: fall back to the safe python path
        return np.array(col.to_pylist(), dtype=np.float64)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


def grouped_centroid(ds, group_col: str, vec_col: str, *, scale: int = 10000,
                     out_col: str = "mean_scaled"):
    """Per-group embedding centroid in LONG format: one output row per
    (group, dimension) with the member count and the integer-scaled
    mean — the cluster-summary / class-prototype aggregate of an
    embedding table.

    Distributed shape: each batch reduces its vectors to per-group
    (sum, count) partials with one stable argsort + ``add.reduceat``
    (no per-row Python, no raw vectors in any shuffle), partials are
    long (group, dim, vsum, n) rows, and ``partial_grouped_agg``'s
    single concat+groupby task finishes — at 10^12 rows only
    #groups x dim x #blocks tiny partial rows move.  The mean is
    emitted integer-scaled with half-away-from-zero rounding so the
    value hash matches SQL ``round()`` (numpy's ``np.round`` is
    half-to-even and would differ on exact .5 boundaries)."""

    def partial(tbl: pa.Table) -> pa.Table:
        g = (
            pc.fill_null(tbl[group_col], 0)
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        M = vec_matrix(tbl[vec_col])
        if len(g) == 0 or M.shape[1] == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.float64()),
                    "n_vecs": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(g, kind="stable")
        gs, Ms = g[order], M[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        sums = np.add.reduceat(Ms, starts, axis=0)
        counts = np.diff(np.r_[starts, len(gs)]).astype(np.int64)
        uniq = gs[starts]
        dim = M.shape[1]
        return pa.table(
            {
                group_col: pa.array(np.repeat(uniq, dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), len(uniq))),
                "vsum": pa.array(sums.ravel()),
                "n_vecs": pa.array(np.repeat(counts, dim)),
            }
        )

    from .relational import partial_grouped_agg

    agg = partial_grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "dim"],
        {"vsum": ("vsum", "sum"), "n_vecs": ("n_vecs", "sum")},
    )

    def finalize(tbl: pa.Table) -> pa.Table:
        s = tbl["vsum"].to_numpy(zero_copy_only=False)
        n = tbl["n_vecs"].to_numpy(zero_copy_only=False)
        mean = s / n * scale
        # DuckDB round(): half away from zero
        scaled = (np.sign(mean) * np.floor(np.abs(mean) + 0.5)).astype(np.int64)
        return pa.table(
            {
                group_col: tbl[group_col],
                "dim": tbl["dim"],
                "n_vecs": tbl["n_vecs"],
                out_col: pa.array(scaled),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
