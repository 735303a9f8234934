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
