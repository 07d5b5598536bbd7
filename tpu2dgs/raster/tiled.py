"""Tile-binned rasterizer in pure XLA — the static-shape TPU answer to the
reference's CUB-radix-sort + per-tile-thread-block design (SURVEY.md §2.10).

Where CUDA duplicates (tile, depth) keys and radix-sorts them, a TPU wants
static shapes and no atomics. The design here:

  1. Global depth ranks: one `argsort` of the N splat depths (culled = +inf).
  2. Coarse binning: the screen is divided into coarse bins of
     `coarse_tiles x coarse_tiles` fine tiles. For each bin, the front-most
     `bin_capacity` overlapping splats are selected with a *streaming* top-k
     over splat chunks (bounded memory, any N).
  3. Fine binning: each 16x16 fine tile refines its coarse bin's candidate
     list to `tile_capacity` entries with one more top-k. Keys are depth
     ranks, so each tile's list is front-to-back sorted by construction.
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

from tpu2dgs.raster import blend
from tpu2dgs.raster.preprocess import SplatScreen


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _aabb(splats: SplatScreen):
    """Per-splat conservative screen AABB (x0, x1, y0, y1), stop-gradient."""
    c = lax.stop_gradient(splats.filter_center)
    r = splats.radius.astype(jnp.float32)
    return c[:, 0] - r, c[:, 0] + r, c[:, 1] - r, c[:, 1] + r


def _overlaps(x0, x1, y0, y1, bx0, bx1, by0, by1):
    """AABB intersection test, broadcasting splat axes against bin axes."""
    return (x0 <= bx1) & (x1 >= bx0) & (y0 <= by1) & (y1 >= by0)


def _smallest_k(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-row k smallest values of `keys` (..., M), ascending order."""
    neg, _ = lax.top_k(-keys, k)
    return -neg


def bin_coarse(
    splats: SplatScreen,
    rank_key: jnp.ndarray,  # (N,) depth rank, BIG where invisible
    big: int,
    nbx: int,
    nby: int,
    bin_px: int,
    capacity: int,
    bin_row_offset,         # traced or 0: first coarse-bin row of this strip
    chunk: int = 32768,
):
    """Streaming front-most-`capacity` selection per coarse bin.

    Returns (nby*nbx, capacity) int32 depth ranks, ascending, BIG-padded.
    """
    n = rank_key.shape[0]
    x0, x1, y0, y1 = _aabb(splats)

    nb = nby * nbx
    bix = jnp.arange(nb, dtype=jnp.float32) % nbx
    biy = jnp.arange(nb, dtype=jnp.float32) // nbx + bin_row_offset
    bx0 = (bix * bin_px)[:, None]
    bx1 = (bix * bin_px + (bin_px - 1))[:, None]
    by0 = (biy * bin_px)[:, None]
    by1 = (biy * bin_px + (bin_px - 1))[:, None]

    pad = (-n) % chunk
    def padded(a, fill):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) if pad else a

    steps = (n + pad) // chunk
    xs = (
        padded(rank_key, big).reshape(steps, chunk),
        padded(x0, 1e9).reshape(steps, chunk),
        padded(x1, -1e9).reshape(steps, chunk),
        padded(y0, 1e9).reshape(steps, chunk),
        padded(y1, -1e9).reshape(steps, chunk),
    )

    def step(best, inp):
        rk, cx0, cx1, cy0, cy1 = inp
        hit = _overlaps(cx0[None], cx1[None], cy0[None], cy1[None], bx0, bx1, by0, by1)
        keys = jnp.where(hit, rk[None, :], big)  # (NB, chunk)
        merged = jnp.concatenate([best, keys], axis=1)
        return _smallest_k(merged, capacity), None

    init = jnp.full((nb, capacity), big, jnp.int32)
    best, _ = lax.scan(step, init, xs)
    return best


def bin_fine(
    splats: SplatScreen,
    order: jnp.ndarray,       # (N,) splat id at each depth rank
    coarse: jnp.ndarray,      # (NB, B) ranks per coarse bin
    big: int,
    ntx: int,
    nty: int,
    tile_px: int,
    coarse_tiles: int,
    capacity: int,
    tile_row_offset,          # traced or 0: first fine-tile row of this strip
):
    """Refine coarse candidates to per-fine-tile lists.

    Returns (T, capacity) int32 splat ids, (T, capacity) bool valid,
    (T,) int32 exact per-tile overlap counts (within the coarse candidates).
    """
    n = order.shape[0]
    x0, x1, y0, y1 = _aabb(splats)
    nbx = _cdiv(ntx, coarse_tiles)

    # Candidate splat data gathered once at bin granularity.
    cand_id = order[jnp.minimum(coarse, n - 1)]         # (NB, B)
    cand_ok = coarse < big
    cx0 = jnp.where(cand_ok, x0[cand_id], 1e9)
    cx1 = jnp.where(cand_ok, x1[cand_id], -1e9)
    cy0 = jnp.where(cand_ok, y0[cand_id], 1e9)
    cy1 = jnp.where(cand_ok, y1[cand_id], -1e9)

    t = nty * ntx
    tix = jnp.arange(t, dtype=jnp.int32) % ntx
    tiy_local = jnp.arange(t, dtype=jnp.int32) // ntx
    tiy = tiy_local + tile_row_offset
    bin_of_tile = (tiy_local // coarse_tiles) * nbx + tix // coarse_tiles  # (T,)

    tx0 = (tix * tile_px).astype(jnp.float32)[:, None]
    tx1 = tx0 + (tile_px - 1)
    ty0 = (tiy * tile_px).astype(jnp.float32)[:, None]
    ty1 = ty0 + (tile_px - 1)

    hit = _overlaps(
        cx0[bin_of_tile], cx1[bin_of_tile], cy0[bin_of_tile], cy1[bin_of_tile],
        tx0, tx1, ty0, ty1,
    )  # (T, B)
    counts = jnp.sum(hit, axis=1, dtype=jnp.int32)

    keys = jnp.where(hit, coarse[bin_of_tile], big)
    tile_ranks = _smallest_k(keys, capacity)            # (T, C) ascending
    tile_valid = tile_ranks < big
    tile_ids = order[jnp.minimum(tile_ranks, n - 1)]
    return tile_ids, tile_valid, counts


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
    big = n + 1

    ntx = _cdiv(w, tpx)
    nbx, nby = _cdiv(ntx, cbt), _cdiv(nty_local, cbt)
    t = ntx * nty_local
    p = tpx * tpx

    order = jnp.argsort(splats.depth).astype(jnp.int32)   # id at rank
    rank = jnp.argsort(order).astype(jnp.int32)           # rank of id
    rank_key = jnp.where(splats.visible, rank, big)

    bin_cap = min(settings.bin_capacity, _pow2_at_least(n))
    tile_cap = min(settings.tile_capacity, bin_cap)

    coarse = bin_coarse(
        splats, rank_key, big, nbx, nby, bin_px=tpx * cbt, capacity=bin_cap,
        bin_row_offset=tile_row_offset // cbt,
    )
    tile_ids, tile_valid, counts = bin_fine(
        splats, order, coarse, big, ntx, nty_local, tpx, cbt,
        capacity=tile_cap, tile_row_offset=tile_row_offset,
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
    if not return_aux:
        return image, allmap
    aux = {
        "tile_count_max": jnp.max(counts),
        "tile_overflow": jnp.sum(counts > tile_cap),
        "bin_count_max": jnp.max(jnp.sum(coarse < big, axis=1)),
        "bin_overflow": jnp.sum(coarse[:, -1] < big),
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
    allmap = {k: v[:h, : settings.width] for k, v in allmap.items()}
    if return_aux:
        return image, allmap, out[2]
    return image, allmap


def _pow2_at_least(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
