"""Shared fixed-dim embedding decode: Arrow list<float> column -> (n, d).

Every similarity/dedup hot stage needs the embedding column as a dense
float64 matrix. ``np.stack(col.to_pylist())`` builds n Python lists per
batch before numpy ever sees the data; for a fixed-dim list column the
child values buffer is already the row-major matrix, so flatten+reshape
is (near-)zero-copy. The reshape doubles as validation: ragged rows or
null slots change the flat length and fail loudly instead of silently
mis-shaping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embed_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from an embedding column.

    ``col`` is an Arrow ``ChunkedArray``/``Array`` of ``list<floating>``
    (the hot path — flatten/reshape over the values buffer, no per-row
    Python objects) or a pandas ``Series`` of per-row vectors (group-fn
    contexts, where pandas has already materialized objects).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        n = len(col)
        if n == 0:
            return np.empty((0, 0), dtype)
        # flatten() honors offsets/slices and drops null slots, so a null
        # embedding surfaces as a reshape error rather than row skew
        flat = col.flatten().to_numpy(zero_copy_only=False)
        d, rem = divmod(len(flat), n)
        if rem:
            raise ValueError(
                f"ragged or null embedding column: {len(flat)} values over {n} rows"
            )
        return np.ascontiguousarray(flat.reshape(n, d), dtype=dtype)
    # pandas Series (or any sequence of per-row vectors)
    vals = col.to_numpy() if hasattr(col, "to_numpy") else col
    if len(vals) == 0:
        return np.empty((0, 0), dtype)
    return np.stack(vals).astype(dtype, copy=False)
