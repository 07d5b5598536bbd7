"""Exact 3-nearest-neighbor mean squared distance, pure jnp.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2`
(scene/gaussian_model.py:134; internals reconstructed in SURVEY.md §2.11 as
Morton-sorted approximate 3-NN). Used once at init to set initial splat
scales, so an exact blocked O(N^2) sweep is the right trade: fully
vectorized, static shapes, streaming top-k keeps memory at
O(rows_block * cols_chunk).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def mean_dist2_to_3nn(points: jnp.ndarray, row_block: int = 1024,
                      col_chunk: int = 8192) -> jnp.ndarray:
    """(N,3) float32 -> (N,) mean squared distance to the 3 nearest neighbors.

    Matches distCUDA2's contract: self-distance excluded; callers clamp the
    result (reference scene/gaussian_model.py:134-135).
    """
    n = points.shape[0]
    k = 4  # keep 4 smallest: self (0) + 3 neighbors

    rpad = (-n) % row_block
    cpad = (-n) % col_chunk
    rows = jnp.concatenate([points, jnp.full((rpad, 3), 1e12, points.dtype)])
    cols = jnp.concatenate([points, jnp.full((cpad, 3), -1e12, points.dtype)])
    n_rb = rows.shape[0] // row_block
    n_cc = cols.shape[0] // col_chunk
    cols_steps = cols.reshape(n_cc, col_chunk, 3)

    def per_row_block(rblk):
        def step(best, cchunk):
            d2 = jnp.sum((rblk[:, None, :] - cchunk[None, :, :]) ** 2, axis=-1)
            merged = jnp.concatenate([best, d2], axis=1)
            neg, _ = lax.top_k(-merged, k)
            return -neg, None

        best0 = jnp.full((row_block, k), jnp.inf, points.dtype)
        best, _ = lax.scan(step, best0, cols_steps)
        # best is ascending; column 0 is the self-distance (0).
        return jnp.mean(best[:, 1:], axis=1)

    out = lax.map(per_row_block, rows.reshape(n_rb, row_block, 3))
    return out.reshape(-1)[:n]
