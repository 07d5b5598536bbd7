"""Deterministic splat binning: depth compaction + prefix-sum selection.

The TPU replacement for the reference rasterizer's CUB radix sort over
(tile | depth) 64-bit keys (SURVEY.md §2.10 [RECON]). Round-1 used per-bin
`lax.top_k` over depth keys, which was 27% of the frame (ROADMAP.md) and
nondeterministic at equal depths. This design splits ordering from
selection:

  1. `compact_visible`: ONE stable global sort of the N splat depths
     (culled = +inf) yields a depth-ascending prefix of visible splat ids,
     ties broken by id — exactly the oracle's composite order. Every
     downstream stage works in this compacted index space, so per-bin
     front-to-back order is positional: no more depth keys anywhere.
  2. Per-bin selection of the first `cap` overlapping splats is then
     "indices of the first cap set bits per row" of the bin x splat hit
     matrix: an int32 cumsum along splats followed by a vectorized binary
     search (`searchsorted_rows`) for ranks 1..cap. Both are cheap
     bandwidth-bound VPU ops — no O(N log N) per-bin sorting networks.

Both the XLA tiled backend and the fused Pallas backend bin through this
module, so their per-tile splat lists are bit-identical (deterministic
backend-equivalence even at exactly-equal depths).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from tpu2dgs.raster.preprocess import SplatScreen

# Bound on the bool hit matrix + int32 cumsum materialized per selection
# group: rows are processed in groups so group_rows * M stays under this.
_MAX_ELEMENTS = 32 * 1024 * 1024


class Compacted(NamedTuple):
    """Depth-ordered visible prefix of the splat array."""

    perm: jnp.ndarray         # (K,) int32 splat id at compacted slot
    valid: jnp.ndarray        # (K,) bool — slot < num_visible
    num_visible: jnp.ndarray  # () int32
    # Screen AABBs gathered into compacted order (empty boxes when invalid):
    x0: jnp.ndarray
    x1: jnp.ndarray
    y0: jnp.ndarray
    y1: jnp.ndarray
    depth: jnp.ndarray        # (K,) sorted view depth (+inf past visible) —
                              # the cross-device merge key (parallel/sharded)


def pack_interval(lo, hi) -> jnp.ndarray:
    """Pack a screen [lo, hi] f32 interval into ONE int32 as a pair of
    inward-rounded (interval-shrinking) integer pixel bounds.

    Every binning rectangle (tile/bin/column, both backends) has INTEGER
    pixel corners, so for integer b:  lo <= b  <=>  ceil(lo) <= b  and
    hi >= b  <=>  floor(hi) >= b — INWARD integer rounding reproduces the
    original hit sets EXACTLY (no inflation, no lost hits), while halving
    the sort payload (two box channels per axis -> one int32). Bounds are
    clipped to +-32767: every rectangle lives in [0, dim], so a clipped
    bound tests identically, and empty lo>hi intervals (the +-1e9 culled
    markers) stay empty. Idempotent on already-packed-and-unpacked values
    (they are integers), which is what the cross-device survivor merge
    relies on when it re-packs compact_visible's boxes."""
    loq = jnp.clip(jnp.ceil(lo), -32767.0, 32767.0).astype(jnp.int32)
    hiq = jnp.clip(jnp.floor(hi), -32767.0, 32767.0).astype(jnp.int32)
    u = (((loq + 32768).astype(jnp.uint32) << 16)
         | (hiq + 32768).astype(jnp.uint32))
    return lax.bitcast_convert_type(u, jnp.int32)


def unpack_interval(p: jnp.ndarray):
    """Inverse of pack_interval: int32 -> (lo, hi) f32 (integer-valued)."""
    u = lax.bitcast_convert_type(p, jnp.uint32)
    lo = (u >> 16).astype(jnp.int32) - 32768
    hi = (u & 0xFFFF).astype(jnp.int32) - 32768
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def compact_visible(splats: SplatScreen, k: int) -> Compacted:
    """Stable depth sort -> first-k visible prefix (ties broken by id).

    One multi-operand `lax.sort` carries the screen-AABB channels through
    the permutation, replacing argsort + four 131K-element XLA gathers
    (measured ~2.8ms of pure gather overhead on v5e). The four box bounds
    ride as TWO packed int32 payloads (inward-rounded integer pixels —
    hit-set-exact against the integer binning rectangles, see
    pack_interval), cutting the sort payload from 6 to 4 operands
    (compact_visible 3.28 -> 2.67 ms/iter raw on v5e)."""
    depth = lax.stop_gradient(splats.depth)  # +inf where culled
    n = depth.shape[0]
    c = lax.stop_gradient(splats.box_center)
    e = lax.stop_gradient(splats.box_half)
    iota = jnp.arange(n, dtype=jnp.int32)
    px = pack_interval(c[:, 0] - e[:, 0], c[:, 0] + e[:, 0])
    py = pack_interval(c[:, 1] - e[:, 1], c[:, 1] + e[:, 1])
    sdepth, order, spx, spy = lax.sort(
        (depth, iota, px, py), dimension=0, is_stable=True, num_keys=1)
    perm = order[:k].astype(jnp.int32)
    num_visible = jnp.sum(splats.visible, dtype=jnp.int32)
    valid = jnp.arange(k, dtype=jnp.int32) < num_visible

    lox, hix = unpack_interval(spx[:k])
    loy, hiy = unpack_interval(spy[:k])
    x0 = jnp.where(valid, lox, 1e9)
    x1 = jnp.where(valid, hix, -1e9)
    y0 = jnp.where(valid, loy, 1e9)
    y1 = jnp.where(valid, hiy, -1e9)
    dep = jnp.where(valid, sdepth[:k], jnp.inf)
    return Compacted(perm, valid, num_visible, x0, x1, y0, y1, dep)


def searchsorted_rows(csum: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Row-wise first index where csum[r, i] >= target, for each target.

    csum: (R, M) nondecreasing int32 rows. targets: (C,) int32 >= 1.
    Returns (R, C) int32 in [0, M] (M when a row never reaches the target).
    """
    r, m = csum.shape
    c = targets.shape[0]
    lo = jnp.zeros((r, c), jnp.int32)
    hi = jnp.full((r, c), m, jnp.int32)
    # The result space is [0, m] — m + 1 values — so 2^steps must cover m + 1.
    for _ in range(max(1, m.bit_length())):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(csum, jnp.minimum(mid, m - 1), axis=1)
        ge = v >= targets[None, :]
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    return lo


def first_k_hits(hit: jnp.ndarray, cap: int):
    """Positions of the first `cap` True entries per row, in order.

    hit: (R, M) bool. Returns (pos (R, cap) int32 zero-filled,
    valid (R, cap) bool, counts (R,) int32 = total hits per row).
    """
    csum = jnp.cumsum(hit.astype(jnp.int32), axis=1)
    counts = csum[:, -1]
    targets = jnp.arange(1, cap + 1, dtype=jnp.int32)
    pos = searchsorted_rows(csum, targets)
    valid = targets[None, :] <= counts[:, None]
    return jnp.where(valid, pos, 0), valid, counts


def _overlaps(x0, x1, y0, y1, bx0, bx1, by0, by1):
    return (x0 <= bx1) & (x1 >= bx0) & (y0 <= by1) & (y1 >= by0)


def select_coarse(comp: Compacted, bx0, bx1, by0, by1, cap: int):
    """First-`cap` depth-ordered splats per coarse bin.

    bx0..by1: (NB,) f32 bin pixel rectangles (inclusive).
    Returns (pos (NB, cap) int32 compacted slots, valid, counts (NB,)).
    Rows are processed in groups to bound the (rows x K) hit matrix.
    """
    nb = bx0.shape[0]
    k = comp.x0.shape[0]
    group = max(1, min(nb, _MAX_ELEMENTS // max(k, 1)))

    def run(bins):
        gx0, gx1, gy0, gy1 = bins
        hit = _overlaps(
            comp.x0[None], comp.x1[None], comp.y0[None], comp.y1[None],
            gx0[:, None], gx1[:, None], gy0[:, None], gy1[:, None],
        )
        return first_k_hits(hit, cap)

    if group >= nb:
        return run((bx0, bx1, by0, by1))

    pad = (-nb) % group
    def padded(a, fill):
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)]) if pad else a
    boxes = (
        padded(bx0, 1e9).reshape(-1, group),
        padded(bx1, -1e9).reshape(-1, group),
        padded(by0, 1e9).reshape(-1, group),
        padded(by1, -1e9).reshape(-1, group),
    )
    pos, valid, counts = lax.map(run, boxes)
    return (
        pos.reshape(-1, cap)[:nb],
        valid.reshape(-1, cap)[:nb],
        counts.reshape(-1)[:nb],
    )


def select_fine(comp: Compacted, cand_pos, cand_valid, bin_of_tile,
                tx0, tx1, ty0, ty1, cap: int):
    """Refine coarse candidate lists to per-tile lists (order preserved).

    cand_pos/cand_valid: (NB, B) coarse output. bin_of_tile: (T,) int32.
    tx0..ty1: (T,) f32 tile rectangles. Returns (pos (T, cap) compacted
    slots, valid (T, cap), counts (T,))."""
    cx0 = jnp.where(cand_valid, comp.x0[cand_pos], 1e9)
    cx1 = jnp.where(cand_valid, comp.x1[cand_pos], -1e9)
    cy0 = jnp.where(cand_valid, comp.y0[cand_pos], 1e9)
    cy1 = jnp.where(cand_valid, comp.y1[cand_pos], -1e9)

    hit = _overlaps(
        cx0[bin_of_tile], cx1[bin_of_tile], cy0[bin_of_tile], cy1[bin_of_tile],
        tx0[:, None], tx1[:, None], ty0[:, None], ty1[:, None],
    )  # (T, B)
    sel, valid, counts = first_k_hits(hit, cap)
    pos = jnp.take_along_axis(cand_pos[bin_of_tile], sel, axis=1)
    return jnp.where(valid, pos, 0), valid, counts
