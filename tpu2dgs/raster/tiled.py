"""Tile-binned rasterizer in pure XLA — the static-shape TPU answer to the
reference's CUB-radix-sort + per-tile-thread-block design (SURVEY.md §2.10).

Where CUDA duplicates (tile, depth) keys and radix-sorts them, a TPU wants
static shapes and no atomics. The design here:

  1. Depth compaction: one stable global sort of the N splat depths
     (culled = +inf) yields a depth-ordered visible prefix (binning.py).
  2. Coarse binning: the screen is divided into coarse bins of
     `coarse_tiles x coarse_tiles` fine tiles. For each bin, the front-most
     `bin_capacity` overlapping splats are selected positionally (prefix-sum
     + binary search over the hit matrix — no per-bin sorting).
  3. Fine binning: each 16x16 fine tile refines its coarse bin's candidate
     list to `tile_capacity` entries the same way. Positional order in the
     compacted space IS front-to-back depth order (ties broken by id).
  4. Blending: all tiles advance in lockstep through their lists,
     `chunk` splats per step, using the shared vectorized compositing math in
     `blend.py` (vmapped over tiles). Front-to-back order dependence is
     closed-form via cumulative ops inside each chunk.

`rasterize_rows` renders a horizontal strip of tile rows with a dynamic
row offset: the unit of distribution. Sharding the strip loop over a device
mesh (tpu2dgs/parallel/) gives tile-parallel rendering with no change to
the math — each device bins and blends only its rows.

Capacity overflow (a tile touching more than `tile_capacity` splats) drops
the *farthest* splats — the ones a saturated pixel would skip anyway. The
aux dict reports per-frame maxima so capacities can be validated offline.

Equivalence with the oracle is exact (same blend math, same contribution set
— see common.CUTOFF) as long as capacities are not exceeded; tests assert
allclose for outputs and gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpu2dgs.raster import binning
from tpu2dgs.raster import blend
from tpu2dgs.raster.preprocess import SplatScreen


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _overlaps(x0, x1, y0, y1, bx0, bx1, by0, by1):
    """AABB intersection test, broadcasting splat axes against bin axes."""
    return (x0 <= bx1) & (x1 >= bx0) & (y0 <= by1) & (y1 >= by0)


def bin_square(splats: SplatScreen, settings, nty_local: int,
               tile_row_offset, bin_cap: int, tile_cap: int, k_vis: int):
    """Two-level square-tile binning via binning.py's compaction scheme.

    Returns (comp, tile_ids (T, cap) int32 splat ids, tile_valid, counts
    (T,) raw overlap counts, bin_counts (NB,))."""
    w = settings.width
    tpx = settings.tile_px
    cbt = settings.coarse_tiles
    ntx = _cdiv(w, tpx)
    nbx, nby = _cdiv(ntx, cbt), _cdiv(nty_local, cbt)

    comp = binning.compact_visible(splats, k_vis)

    nb = nby * nbx
    bin_px = tpx * cbt
    bix = jnp.arange(nb, dtype=jnp.float32) % nbx
    biy = (jnp.arange(nb, dtype=jnp.float32) // nbx
           + jnp.float32(tile_row_offset) / cbt)
    bx0 = bix * bin_px
    bx1 = bx0 + (bin_px - 1)
    by0 = biy * bin_px
    by1 = by0 + (bin_px - 1)
    cand_pos, cand_valid, bin_counts = binning.select_coarse(
        comp, bx0, bx1, by0, by1, bin_cap)

    t = nty_local * ntx
    tix = jnp.arange(t, dtype=jnp.int32) % ntx
    tiy_local = jnp.arange(t, dtype=jnp.int32) // ntx
    bin_of_tile = (tiy_local // cbt) * nbx + tix // cbt
    tx0 = (tix * tpx).astype(jnp.float32)
    tx1 = tx0 + (tpx - 1)
    ty0 = ((tiy_local + tile_row_offset) * tpx).astype(jnp.float32)
    ty1 = ty0 + (tpx - 1)
    tile_pos, tile_valid, counts = binning.select_fine(
        comp, cand_pos, cand_valid, bin_of_tile, tx0, tx1, ty0, ty1, tile_cap)
    tile_ids = comp.perm[tile_pos]
    return comp, tile_ids, tile_valid, counts, bin_counts


def rasterize_rows(
    splats: SplatScreen,
    settings,
    bg_color: jnp.ndarray,
    tile_row_offset,     # traced or 0; MUST be a multiple of coarse_tiles
    nty_local: int,      # static tile-row count of this strip
    return_aux: bool = False,
):
    """Rasterize a horizontal strip of `nty_local` tile rows starting at
    fine-tile row `tile_row_offset`. Returns (strip (nty_local*tpx, W', 3),
    allmap dict) with W' = ntx*tpx (caller crops to the true width)."""
    w = settings.width
    tpx = settings.tile_px
    cbt = settings.coarse_tiles
    n = splats.tmat.shape[0]

    ntx = _cdiv(w, tpx)
    t = ntx * nty_local
    p = tpx * tpx

    bin_cap = min(settings.bin_capacity, _pow2_at_least(n))
    tile_cap = min(settings.tile_capacity, bin_cap)
    k_vis = min(settings.vis_capacity or n, n)

    comp, tile_ids, tile_valid, counts, bin_counts = bin_square(
        splats, settings, nty_local, tile_row_offset, bin_cap, tile_cap,
        k_vis,
    )

    # Per-tile global pixel coordinates.
    tix = (jnp.arange(t, dtype=jnp.int32) % ntx)
    tiy = (jnp.arange(t, dtype=jnp.int32) // ntx) + tile_row_offset
    ly = jnp.repeat(jnp.arange(tpx, dtype=jnp.float32), tpx)   # (P,)
    lx = jnp.tile(jnp.arange(tpx, dtype=jnp.float32), tpx)
    px = tix[:, None].astype(jnp.float32) * tpx + lx[None, :]  # (T, P)
    py = tiy[:, None].astype(jnp.float32) * tpx + ly[None, :]

    chunk = settings.chunk
    steps = _cdiv(tile_cap, chunk)
    pad = steps * chunk - tile_cap
    if pad:
        tile_ids = jnp.concatenate(
            [tile_ids, jnp.zeros((t, pad), tile_ids.dtype)], axis=1)
        tile_valid = jnp.concatenate(
            [tile_valid, jnp.zeros((t, pad), bool)], axis=1)
    ids_steps = jnp.moveaxis(tile_ids.reshape(t, steps, chunk), 1, 0)
    valid_steps = jnp.moveaxis(tile_valid.reshape(t, steps, chunk), 1, 0)

    response = jax.vmap(blend.splat_pixel_response)   # over tiles
    composite = jax.vmap(blend.blend_chunk)

    def body(state, inp):
        ids, ok = inp                                 # (T, chunk)
        alpha, depth, contrib = response(
            splats.tmat[ids], splats.filter_center[ids], splats.opacity[ids],
            px, py,
        )                                             # (T, chunk, P)
        contrib = contrib & ok[:, :, None]
        state = composite(
            state, alpha, depth, contrib, splats.color[ids], splats.normal[ids]
        )
        return state, None

    state0 = jax.vmap(lambda _: blend.init_state(p, dtype=splats.tmat.dtype))(
        jnp.arange(t)
    )
    state, _ = lax.scan(jax.checkpoint(body), state0, (ids_steps, valid_steps))

    color, maps = jax.vmap(lambda s: blend.finalize(s, bg_color))(state)

    def untile(a):
        a = a.reshape(nty_local, ntx, tpx, tpx, *a.shape[2:])
        return jnp.moveaxis(a, 2, 1).reshape(
            nty_local * tpx, ntx * tpx, *a.shape[4:]
        )

    image = untile(color.reshape(t, p, 3))
    allmap = {k: untile(v.reshape(t, p, *v.shape[2:])) for k, v in maps.items()}
    # Capacity diagnostics in the pallas backend's _aux_* convention so the
    # Trainer's adaptive cap growth consumes them from either backend.
    allmap["_aux_tile_overflow_frac"] = jnp.mean(
        (counts > tile_cap).astype(jnp.float32))
    allmap["_aux_bin_overflow_frac"] = jnp.mean(
        (bin_counts > bin_cap).astype(jnp.float32))
    allmap["_aux_tile_count_max"] = jnp.max(counts).astype(jnp.float32)
    allmap["_aux_bin_count_max"] = jnp.max(bin_counts).astype(jnp.float32)
    # Blended work (capacity-clamped tile entries): the load-balance signal
    # under tile-row sharding (parallel/sharded all-gathers per-strip sums).
    allmap["_aux_strip_work"] = jnp.sum(
        jnp.minimum(counts, tile_cap)).astype(jnp.float32)
    if not return_aux:
        return image, allmap
    aux = {
        "tile_count_max": jnp.max(counts),
        "tile_overflow": jnp.sum(counts > tile_cap),
        "bin_count_max": jnp.max(bin_counts),
        "bin_overflow": jnp.sum(bin_counts > bin_cap),
    }
    return image, allmap, aux


def rasterize_tiled(splats: SplatScreen, settings, bg_color: jnp.ndarray,
                    return_aux: bool = False):
    """Returns (image (H,W,3), allmap dict) [, aux dict]."""
    h = settings.height
    nty = _cdiv(h, settings.tile_px)
    out = rasterize_rows(
        splats, settings, bg_color, 0, nty, return_aux=return_aux
    )
    image, allmap = out[0][:h, : settings.width], out[1]
    allmap = {k: v if k.startswith("_aux_") else v[:h, : settings.width]
              for k, v in allmap.items()}
    if return_aux:
        return image, allmap, out[2]
    return image, allmap


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
