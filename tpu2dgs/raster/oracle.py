"""Oracle rasterizer: every splat against every pixel, pure jnp.

O(N * pixels) — the executable spec for all fast backends (SURVEY.md §4:
"pure-jnp reference rasterizer ... serving as oracle"). Differentiable,
CPU-runnable, no binning: splats are globally depth-sorted and composited
chunk-by-chunk over the full pixel grid with the shared blend math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpu2dgs.raster import blend
from tpu2dgs.raster.preprocess import SplatScreen


def rasterize_oracle(
    splats: SplatScreen,
    width: int,
    height: int,
    bg_color: jnp.ndarray,
    chunk: int = 64,
):
    """Returns (image (H,W,3), allmap dict of (H,W[,3]) arrays)."""
    n = splats.tmat.shape[0]
    pad = (-n) % chunk
    order = jnp.argsort(splats.depth)  # stable; culled (inf) land at the end
    if pad:
        order = jnp.concatenate([order, jnp.zeros((pad,), order.dtype)])
    num_chunks = (n + pad) // chunk
    order = order.reshape(num_chunks, chunk)
    valid = jnp.arange(num_chunks * chunk).reshape(num_chunks, chunk) < n

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    px = xs.reshape(-1)
    py = ys.reshape(-1)

    state = blend.init_state(width * height, dtype=splats.tmat.dtype)

    def body(state, inp):
        ids, ok = inp
        tmat = splats.tmat[ids]
        alpha, depth, contrib = blend.splat_pixel_response(
            tmat, splats.filter_center[ids], splats.opacity[ids], px, py
        )
        contrib = contrib & (ok & splats.visible[ids])[:, None]
        state = blend.blend_chunk(
            state, alpha, depth, contrib, splats.color[ids], splats.normal[ids]
        )
        return state, None

    state, _ = lax.scan(jax.checkpoint(body), state, (order, valid))

    color, maps = blend.finalize(state, bg_color)
    image = color.reshape(height, width, 3)
    allmap = {
        k: v.reshape(height, width, *v.shape[1:]) for k, v in maps.items()
    }
    return image, allmap
