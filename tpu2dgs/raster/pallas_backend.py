"""Fused Pallas TPU rasterizer: forward + backward surfel blending kernels.

The TPU counterpart of the reference's renderCUDA/backward.cu pair
(SURVEY.md §2.10 [RECON]): CUDA parallelizes the 16x16-pixel tile across a
thread block and walks splats sequentially; here each grid step owns a
(BY=16, BX=128)-pixel block — two native (8,128) f32 vector tiles — and
walks its depth-sorted splat list sequentially with full-plane VPU ops.
The sequential walk gives bit-faithful front-to-back semantics (sticky
early termination, median depth, pairwise distortion) with no cumulative-op
gymnastics, plus two things XLA cannot express:

  * per-tile dynamic trip counts (each block loops only over ITS splats),
  * chunk-level early exit once every pixel saturates (T < 1e-4).

Ray-splat intersection is linearized: with C = [c1 c2 c3],
c1 = -(a3 x a2), c2 = -(a1 x a3), c3 = a1 x a2 (a_i = tmat columns), the
homogeneous intersection is p(x, y) = x*c1 + y*c2 + c3 — 2 FMA per
component per pixel. `pack_records` computes these per-splat constants in
XLA (so their gradient w.r.t. tmat is free autodiff); the custom_vjp
boundary wraps only the blend, and the backward kernel re-walks each tile
back-to-front with suffix accumulators (the TPU replacement for CUDA's
atomicAdd gradient scatter is a per-splat plane reduction + the XLA
gather-transpose outside).

Binning goes through binning.py (global depth compaction + prefix-sum
selection) with rectangular (BX x BY) tiles; per-tile lists arrive
depth-sorted and deterministic.

Record layout (REC = 24 floats):
  0:9   c1, c2, c3        (intersection constants)
  9:12  a3                (tmat w column: intersection depth)
  12:15 color
  15:18 normal (view space)
  18    opacity
  19:21 filter_center     (screen-space low-pass; no gradient by design)
  21    compacted-slot id (stamped by binning's carried iota channel; the
                           backward scatter target. Zero in pack_records)
  22    te2, 23 fr2       (adaptive coverage bounds, binning-only)

Binning carries the full record through the select-kernel hierarchy
(_bin_records), so the per-tile record lists the blend kernels consume come
straight out of the L3 compaction — there is no (T, cap) row gather
anywhere, and the L2/L3 hit test is the exact conic∪circle coverage test
(select_kernel._exact_coverage) instead of the reference's AABB binning.

Output channel layout (OUT_CH = 16):
  0:3 rgb (alpha-weighted, pre-background)   3 T_final
  4 expected depth (unnormalized)            5:8 normal
  8 median depth                             9 distortion
  10 m1   11 m2   12 last contributor (f32)  13:16 pad
nondifferentiable aux: channels 10-12 (backward reconstruction only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu2dgs.raster import binning
from tpu2dgs.raster import select_kernel
from tpu2dgs.raster.common import (
    ALPHA_CLAMP,
    ALPHA_MIN,
    CUTOFF,
    DIST_FAR,
    DIST_NEAR,
    FILTER_INV_SQUARE,
    INTERSECT_NEAR,
    MEDIAN_T,
    T_EPS,
)
from tpu2dgs.raster.preprocess import SplatScreen

REC = 24
# Packed gradient-row width (backward): only record channels 0:19 carry
# gradients (c1,c2,c3,a3,color,normal,opacity); filter_center/te2/fr2 are
# no-gradient by design and the slot id needs no cotangent. Packing 19 grad
# channels + the slot (channel 19 of the packed row) instead of all REC=24
# cuts the backward's lane reductions, packed stores, HBM write traffic and
# the XLA scatter width by 1/6. CHUNK*OUTREC = 640 = 5 flat 128-lane rows.
OUTREC = 20
OUT_CH = 16
BY = 16   # block pixel rows (BY=8 retested after the SMEM-read fix:
          # 12.4 vs 14.3 Mpix/s — fixed per-entry cost still dominates)
BX = 128  # block pixel cols (one lane register row)
# Splats per early-exit check. Env-overridable for tuning sweeps only
# (must keep CHUNK*OUTREC a multiple of 128 for the backward's flat-lane
# scratch, and GROUP a multiple of CHUNK). Round-5 sweep on v5e (bench,
# tile cap 2048): 32/128 = 16.2-16.3 Mpix/s, 64/128 = 16.48,
# 32/256 = 16.41, 64/256 = 16.53-16.69 -> 64/256 is the default (the
# round-2 "CHUNK=64 rejected" predates count-proportional staging, whose
# group DMA amortizes better over bigger chunks; early exit is rarely
# taken mid-group on real loads, so coarser exit checks cost nothing).
import os as _os
CHUNK = int(_os.environ.get("TPU2DGS_CHUNK", "64"))


def pack_records(splats: SplatScreen) -> jnp.ndarray:
    """(N, REC) per-splat record. Differentiable (pure XLA); channels 21-23
    (slot pad + the adaptive coverage bounds) are binning-side constants
    with exactly-zero gradients."""
    tmat = splats.tmat
    a1 = tmat[:, :, 0]
    a2 = tmat[:, :, 1]
    a3 = tmat[:, :, 2]
    c1 = -jnp.cross(a3, a2)
    c2 = -jnp.cross(a1, a3)
    c3 = jnp.cross(a1, a2)
    n = tmat.shape[0]
    return jnp.concatenate(
        [
            c1, c2, c3, a3,
            splats.color,
            splats.normal,
            splats.opacity[:, None],
            lax.stop_gradient(splats.filter_center),
            jnp.zeros((n, 1), tmat.dtype),
            lax.stop_gradient(splats.te2)[:, None],
            lax.stop_gradient(splats.fr2)[:, None],
        ],
        axis=-1,
    )


def _map_depth(d):
    safe = jnp.maximum(d, 1e-6)
    return DIST_FAR * (safe - DIST_NEAR) / ((DIST_FAR - DIST_NEAR) * safe)


def _splat_response(r, px, py):
    """Shared fwd recompute: r = 21 scalars, px/py = (BY,BX) planes.

    Returns (alpha, depthp, hit, G, su, sv, inv, not_clamped)."""
    pu = px * r[0] + py * r[3] + r[6]
    pv = px * r[1] + py * r[4] + r[7]
    pw = px * r[2] + py * r[5] + r[8]
    valid = pw != 0.0
    inv = jnp.where(valid, 1.0, 0.0) / jnp.where(valid, pw, 1.0)
    su = pu * inv
    sv = pv * inv
    rho3d = su * su + sv * sv
    dx = px - r[19]
    dy = py - r[20]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.where(use3d, rho3d, rho2d)
    inside = (rho3d <= CUTOFF * CUTOFF) | (rho2d <= rho3d)
    depthp = su * r[9] + sv * r[10] + r[11]
    G = jnp.exp(-0.5 * rho)
    raw = r[18] * G
    not_clamped = raw < ALPHA_CLAMP
    alpha = jnp.minimum(ALPHA_CLAMP, raw)
    hit = (
        valid & inside & (depthp >= INTERSECT_NEAR) & (alpha >= ALPHA_MIN)
    )
    return alpha, depthp, hit, G, su, sv, inv, not_clamped, use3d


# Record staging granularity: group = min(GROUP, capk) entries per VMEM->SMEM
# DMA. The per-tile record block rides HBM->VMEM on Pallas' pipelined
# block fetch (full HBM bandwidth, capk-proportional but cheap); only the
# CHUNKS ACTUALLY WALKED are staged into SMEM for scalar reads, double
# buffered so the next group's DMA overlaps the current group's blending.
# The previous design DMA'd the whole (NCH, capk) block into SMEM per
# tile: measured ~60 GB/s effective — ~1.1 ms/frame of the forward at
# capk 2048, 79% of it padding — and made capacity itself expensive,
# forcing truncation (capk 2048 cut 16% of true entries on the bench
# pileup). Count-proportional staging decouples fidelity from cost.
GROUP = int(_os.environ.get("TPU2DGS_GROUP", "256"))
assert CHUNK * OUTREC % 128 == 0 and GROUP % CHUNK == 0, (CHUNK, GROUP)
assert GROUP % 128 == 0, GROUP  # _round_group alignment unit


def _round_group(x: int) -> int:
    """Round a per-tile capacity up so the record-staging group
    (min(GROUP, capk)) divides it exactly: 128-multiples below GROUP
    (group == capk there), whole GROUP-multiples above."""
    x = max(128, -(-x // 128) * 128)
    return x if x <= GROUP else -(-x // GROUP) * GROUP


def _rec_dma(rec_ref, smem, sem, g, buf, group):
    return pltpu.make_async_copy(
        rec_ref.at[0, :, pl.ds(g * group, group)], smem.at[buf],
        sem.at[buf])


def _read_rec(smem, buf, off):
    # smem is the (2, NCH, GROUP) staged record buffer: per-splat constants
    # are read as true scalars. Scalar SMEM loads feed VPU broadcast
    # operands directly; a VMEM row-read + 21 lane extracts cost ~130
    # cycles/splat in cross-lane relayouts (measured 368 -> 240 cy/step on
    # v5e when switched to SMEM).
    return [smem[buf, k, off] for k in range(21)]


def _fwd_kernel(counts_ref, row0_ref, rec_ref, out_ref, smem, sem, *,
                nty: int, group: int, unroll: bool):
    # Grid is COLUMN-major (tile i -> column i//nty, row i%nty) so that the
    # backward kernel's per-column gradient accumulator block stays
    # resident across all of a column's tiles.
    gc = group // CHUNK
    i = pl.program_id(0)
    count = counts_ref[i]

    @pl.when(count > 0)
    def _():
        _rec_dma(rec_ref, smem, sem, 0, 0, group).start()
    x0 = ((i // nty) * BX).astype(jnp.float32)
    y0 = (((i % nty) + row0_ref[0]) * BY).astype(jnp.float32)
    # integer iota then cast: Mosaic rejects float iota
    px = x0 + lax.broadcasted_iota(jnp.int32, (BY, BX), 1).astype(jnp.float32)
    py = y0 + lax.broadcasted_iota(jnp.int32, (BY, BX), 0).astype(jnp.float32)

    zeros = jnp.zeros((BY, BX), jnp.float32)
    state = (
        jnp.ones((BY, BX), jnp.float32),   # 0 T
        jnp.ones((BY, BX), jnp.float32),   # 1 alive (1.0 until killed)
        zeros, zeros, zeros,               # 2:5 rgb
        zeros,                             # 5 depth
        zeros, zeros, zeros,               # 6:9 normal
        zeros,                             # 9 median
        zeros,                             # 10 m1
        zeros,                             # 11 m2
        zeros,                             # 12 dist
        jnp.full((BY, BX), -1.0),          # 13 last contributor
    )

    def chunk_body(c, state):
        j0 = c * CHUNK
        g = c // gc
        buf = g % 2

        @pl.when(c % gc == 0)
        def _():
            _rec_dma(rec_ref, smem, sem, g, buf, group).wait()

        @pl.when((c % gc == 0) & ((g + 1) * group < count))
        def _():
            _rec_dma(rec_ref, smem, sem, g + 1, 1 - buf, group).start()

        def splat_body(k, state):
            (T, alive, r0, g0, b0, dep, n0, n1, n2, med, m1, m2, dist,
             last) = state
            jj = j0 + k
            r = _read_rec(smem, buf, (c % gc) * CHUNK + k)
            alpha, depthp, hit, G, su, sv, inv, nc, u3 = _splat_response(
                r, px, py)
            ok = hit & (alive > 0.0) & (jj < count)
            test_t = T * (1.0 - alpha)
            kill = ok & (test_t < T_EPS)
            alive = jnp.where(kill, 0.0, alive)
            a = jnp.where(ok & ~kill, alpha, 0.0)
            w = a * T
            blended = a > 0.0

            med = jnp.where(blended & (T > MEDIAN_T), depthp, med)
            last = jnp.where(blended, jj.astype(jnp.float32), last)

            m = _map_depth(depthp)
            dist = dist + w * (m * m * (1.0 - T) + m2 - 2.0 * m * m1)
            m1 = m1 + w * m
            m2 = m2 + w * m * m

            return (
                T * (1.0 - a), alive,
                r0 + w * r[12], g0 + w * r[13], b0 + w * r[14],
                dep + w * depthp,
                n0 + w * r[15], n1 + w * r[16], n2 + w * r[17],
                med, m1, m2, dist, last,
            )

        # Static unroll: each splat's response math is independent of the
        # serial blend chain, so straight-line code lets Mosaic overlap the
        # splats' SMEM constant loads + plane math across iterations
        # (fwd 17.7 -> 12.9 ms/frame on v5e). Interpret mode (CPU tests)
        # keeps the rolled loop: the unroll only bloats trace time there.
        if unroll:
            for k in range(CHUNK):
                state = splat_body(k, state)
            return state
        return lax.fori_loop(0, CHUNK, splat_body, state)

    def cond(carry):
        c, state = carry
        # continue while splats remain AND any pixel is still alive
        return (c * CHUNK < count) & (jnp.max(state[1]) > 0.0)

    def body(carry):
        c, state = carry
        return c + 1, chunk_body(c, state)

    c_exit, state = lax.while_loop(cond, body, (0, state))

    # Early exit can leave one prefetched group's DMA un-consumed; drain it
    # (semaphores must be zero at kernel end).
    gp = (c_exit - 1) // gc + 1

    @pl.when((c_exit > 0) & (gp * group < count))
    def _():
        _rec_dma(rec_ref, smem, sem, gp, gp % 2, group).wait()

    (T, alive, r0, g0, b0, dep, n0, n1, n2, med, m1, m2, dist, last) = state
    out_ref[0, 0] = r0
    out_ref[0, 1] = g0
    out_ref[0, 2] = b0
    out_ref[0, 3] = T
    out_ref[0, 4] = dep
    out_ref[0, 5] = n0
    out_ref[0, 6] = n1
    out_ref[0, 7] = n2
    out_ref[0, 8] = med
    out_ref[0, 9] = dist
    out_ref[0, 10] = m1
    out_ref[0, 11] = m2
    out_ref[0, 12] = last
    out_ref[0, 13] = zeros
    out_ref[0, 14] = zeros
    out_ref[0, 15] = zeros


def _bwd_kernel(counts_ref, row0_ref, off_ref, rec_ref, out_ref, dout_ref,
                dpack_ref, scratch, smem, sem, gdma, gsem, pend, *,
                nty: int, pack_cap: int, group: int, unroll: bool):
    """Backward blend: re-walks each tile back-to-front with suffix
    accumulators, emitting GLOBALLY-PACKED gradient rows.

    Each tile stores its gradient rows at its global cursor `off_ref[i]`
    (exclusive prefix sum of the GROUP-aligned EFFECTIVE counts — entries
    up to the tile's last contributor, _effective_counts), so the packed
    output holds only rows the walk can produce, instead of the
    (T, cap, REC) padded form — the XLA scatter-add outside then processes
    ~4x fewer rows (the padded form measured 15ms/frame at 78% padding).
    One global pack (vs the earlier per-column packs of a shared static
    capacity) follows the scene's actual row distribution: a hot column
    no longer overflows while empty columns waste reserved rows.

    The packed array is HBM-RESIDENT (memory_space ANY): at production
    caps it exceeds scoped VMEM (a VMEM-resident block OOM'd at the
    derived default pack capacity — 229376 rows = 18.1M > the 16M scoped
    limit, found by the round-4 soak). The kernel accumulates each
    128-entry GROUP's rows (20 flat lane rows) in a double-buffered VMEM
    staging buffer and DMAs the completed group to its slot
    (off + g*GROUP)*OUTREC/128 — fixed-size copies into disjoint,
    group-aligned regions, overlapped with the next group's compute.
    Partial top groups are zero-filled at first visit so every reserved
    row is written. Rows carry their compacted-slot target in packed
    channel 19 (the slot iota channel binning carries through the record
    compaction as record channel 21); packed channels 0:19 are the
    gradients of record channels 0:19. Chunk stores past `count` write
    zero rows with slot 0 (a harmless +=0 in the scatter). A group whose
    rows would land past pack_cap is DROPPED (clean tail truncation,
    counted by _aux_grad_pack_overflow_frac) — never clamped onto earlier
    rows, which would overwrite other tiles' gradients. Rows past the
    global demand are never written: the caller masks them before the
    scatter (no in-kernel zero fill of the full array).

    The output is stored FLAT-LANE: a group's (GROUP, OUTREC) rows are
    GROUP*OUTREC/128 full 128-lane rows, so the (pack_cap*OUTREC//128,
    128) array has zero lane padding — a (pack_cap, OUTREC) layout would
    be lane-padded 20->128 by the (8,128) tiling (6.4x HBM traffic).
    Row-major order is identical, so the reshape to (rows, OUTREC)
    outside is free of index math.

    NOTE: two in-kernel scatter alternatives were built and measured before
    this design: per-column slot accumulators + a merge kernel (~60
    cycles/entry dynamic-sublane RMW) and the padded XLA scatter-add (~13
    cycles/row but over ALL padded rows). Global packing keeps the cheap
    per-chunk stores AND gives the scatter only live rows."""
    gc = group // CHUNK
    i = pl.program_id(0)
    count = counts_ref[i]
    off = off_ref[i]

    @pl.when(i == 0)
    def _():
        # pend[b] = (in-flight flag, destination base row) for each of the
        # two group staging buffers; SMEM scratch starts undefined.
        pend[0, 0] = 0
        pend[1, 0] = 0
    x0 = ((i // nty) * BX).astype(jnp.float32)
    y0 = (((i % nty) + row0_ref[0]) * BY).astype(jnp.float32)
    # integer iota then cast: Mosaic rejects float iota
    px = x0 + lax.broadcasted_iota(jnp.int32, (BY, BX), 1).astype(jnp.float32)
    py = y0 + lax.broadcasted_iota(jnp.int32, (BY, BX), 0).astype(jnp.float32)

    t_final = out_ref[0, 3]
    m1_final = out_ref[0, 10]
    m2_final = out_ref[0, 11]
    last = out_ref[0, 12]

    d_rgb = (dout_ref[0, 0], dout_ref[0, 1], dout_ref[0, 2])
    d_t = dout_ref[0, 3]
    d_dep = dout_ref[0, 4]
    d_nrm = (dout_ref[0, 5], dout_ref[0, 6], dout_ref[0, 7])
    d_med = dout_ref[0, 8]
    d_dist = dout_ref[0, 9]

    dt_term = d_t * t_final  # dL/dT_final * T_final (plane)

    zeros = jnp.zeros((BY, BX), jnp.float32)
    lane0 = (lax.broadcasted_iota(jnp.int32, (1, BX), 1) == 0).astype(
        jnp.float32)
    # carry: T_cur, acc_w, s_w, s_wm, acc_a, med_done, s_wm2 (for M2b)
    init = (t_final, zeros, zeros, zeros, zeros, zeros, zeros)

    # start from the last chunk that contains any contributor
    max_last = jnp.max(last).astype(jnp.int32)
    start_chunk = jnp.where(
        max_last < 0, 0, (max_last // CHUNK) + 1
    )

    @pl.when(start_chunk > 0)
    def _():
        g0 = (start_chunk - 1) // gc
        _rec_dma(rec_ref, smem, sem, g0, g0 % 2, group).start()

    def chunk_body(c, carry):
        j0 = c * CHUNK
        g = c // gc
        buf = g % 2
        # Descending walk: a group's first visit is at its highest chunk
        # (or the entry chunk); stage it and prefetch the group below.
        first_visit = (c % gc == gc - 1) | (c == start_chunk - 1)

        @pl.when(first_visit)
        def _():
            _rec_dma(rec_ref, smem, sem, g, buf, group).wait()

        @pl.when(first_visit & (g > 0))
        def _():
            _rec_dma(rec_ref, smem, sem, g - 1, 1 - buf, group).start()

        def splat_body(kk, carry):
            k = CHUNK - 1 - kk
            jj = j0 + k
            (T_cur, acc_w, s_w, s_wm, acc_a, med_done, s_wm2) = carry
            r = _read_rec(smem, buf, (c % gc) * CHUNK + k)
            alpha, depthp, hit, G, su, sv, inv, nc, u3 = _splat_response(
                r, px, py)
            fj = jj.astype(jnp.float32)
            blended = hit & (fj <= last) & (jj < count)
            a = jnp.where(blended, alpha, 0.0)
            t_before = jnp.where(blended, T_cur / (1.0 - a), T_cur)
            w = a * t_before

            m = _map_depth(depthp)
            wm = w * m
            wm2 = wm * m
            m1b = m1_final - s_wm - wm
            m2b = m2_final - s_wm2 - wm2
            a_before = 1.0 - t_before

            dldw = (
                d_rgb[0] * r[12] + d_rgb[1] * r[13] + d_rgb[2] * r[14]
                + d_dep * depthp
                + d_nrm[0] * r[15] + d_nrm[1] * r[16] + d_nrm[2] * r[17]
                + d_dist * (
                    m * m * a_before + m2b - 2.0 * m * m1b
                    + m * m * s_w - 2.0 * m * s_wm
                )
            )

            # median: first blended splat (back-to-front) with T_before > 0.5
            is_med = blended & (t_before > MEDIAN_T) & (med_done == 0.0)
            med_done = jnp.where(is_med, 1.0, med_done)

            d_m = d_dist * (
                w * (2.0 * m * a_before - 2.0 * m1b)
                + w * (2.0 * m * s_w - 2.0 * s_wm)
            )
            dm_dd = (DIST_FAR * DIST_NEAR / (DIST_FAR - DIST_NEAR)) / (
                jnp.maximum(depthp, 1e-6) ** 2
            )
            d_d = d_dep * w + d_m * dm_dd + jnp.where(is_med, d_med, 0.0)

            one_minus = jnp.maximum(1.0 - a, 1.0 - ALPHA_CLAMP)
            d_a = jnp.where(
                blended,
                dldw * t_before + (acc_a - acc_w - dt_term) / one_minus,
                0.0,
            )

            # update suffix accumulators (include j)
            acc_w = acc_w + dldw * w
            acc_a = acc_a + d_dist * w * m * m * t_before
            s_w = s_w + w
            s_wm = s_wm + wm
            s_wm2 = s_wm2 + wm2

            # alpha -> opacity, rho -> geometry
            d_op_plane = jnp.where(nc, G * d_a, 0.0)
            d_rho = jnp.where(nc, -0.5 * r[18] * G * d_a, 0.0)
            d_rho3d = jnp.where(u3, d_rho, 0.0)  # rho2d path: no grads
            d_su = 2.0 * su * d_rho3d + r[9] * d_d
            d_sv = 2.0 * sv * d_rho3d + r[10] * d_d
            gate = blended  # only blended splats receive gradients
            d_su = jnp.where(gate, d_su, 0.0)
            d_sv = jnp.where(gate, d_sv, 0.0)
            d_d_g = jnp.where(gate, d_d, 0.0)
            d_pu = d_su * inv
            d_pv = d_sv * inv
            d_pw = -(su * d_su + sv * d_sv) * inv

            # p = x*c1 + y*c2 + c3 per component (u, v, w).
            # Gradients materialize via a per-chunk two-stage reduction:
            # each splat sublane-reduces its 19 contribution planes into its
            # (REC, BX) slab of scratch (static sublane rows, dynamic
            # leading index); after the chunk, ONE lane reduction over
            # (CHUNK, REC, BX) yields the (CHUNK, REC) block stored at
            # dynamic sublane j0 (scalar and dynamic-lane VMEM stores don't
            # lower; batching amortizes the lane-reduce + store).
            w_gated = jnp.where(gate, w, 0.0)

            def put(comp, row):
                # scratch is flat-lane (CHUNK*OUTREC//128, 128, BX): splat
                # k's component `comp` lives at flat sublane k*OUTREC+comp.
                # Unrolled (Mosaic): k static -> static store indices (a
                # dynamic mid-dim sublane store would not lower). Rolled
                # (interpret): traced k via pl.ds.
                f = k * OUTREC + comp
                nr = row.shape[0]
                if unroll:
                    scratch[f // 128, (f % 128):(f % 128) + nr, :] = row
                else:
                    scratch[f // 128, pl.ds(f % 128, nr), :] = row

            # px is constant along sublanes, so the px-weighted sublane
            # reductions factor: sum_y(px * d) = px_row * sum_y(d). The
            # same reduced rows serve components 0-2 and 6-8, saving three
            # (BY,BX) multiplies and three plane reductions per splat.
            # The 16 sublane reductions below are 43% of this kernel
            # (measured by ablation, ROADMAP.md): they are also the
            # information-theoretic floor — 16 independent per-splat
            # moments — so the only wins left here are scheduling ones.
            px_row = px[0:1, :]
            s_pu = jnp.sum(d_pu, axis=0, keepdims=True)
            s_pv = jnp.sum(d_pv, axis=0, keepdims=True)
            s_pw = jnp.sum(d_pw, axis=0, keepdims=True)
            rows = {0: px_row * s_pu, 1: px_row * s_pv, 2: px_row * s_pw,
                    6: s_pu, 7: s_pv, 8: s_pw}
            partials = [
                py * d_pu, py * d_pv, py * d_pw,
                su * d_d_g, sv * d_d_g, d_d_g,
                w_gated * d_rgb[0], w_gated * d_rgb[1], w_gated * d_rgb[2],
                w_gated * d_nrm[0], w_gated * d_nrm[1], w_gated * d_nrm[2],
                d_op_plane,
            ]
            comps = [3, 4, 5, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18]
            for comp, plane in zip(comps, partials):
                rows[comp] = jnp.sum(plane, axis=0, keepdims=True)
            # Compacted-slot target rides in packed channel 19 (record
            # channel 21; lane 0 only, so the chunk's lane reduction
            # recovers it exactly); zero past `count` so stray rows
            # scatter zeros to slot 0.
            sl = jnp.where(jj < count,
                           smem[buf, 21, (c % gc) * CHUNK + k], 0.0)
            rows[19] = lane0 * sl
            # (Paired (2,BX) stores measured even with singles — the
            # sublane concatenate costs what the saved store gains.)
            for comp_i, row in rows.items():
                put(comp_i, row)

            return (t_before, acc_w, s_w, s_wm, acc_a, med_done, s_wm2)

        # Static unroll (see _fwd_kernel.chunk_body).
        if unroll:
            for kk in range(CHUNK):
                carry = splat_body(kk, carry)
        else:
            carry = lax.fori_loop(0, CHUNK, splat_body, carry)
        rows = jnp.sum(scratch[:, :, :], axis=2)  # (CHUNK*OUTREC//128, 128)

        # Stage this chunk's rows into the group buffer (buf == the rec
        # staging parity, g % 2). On the group's first visit (descending:
        # its highest walked chunk) retire any in-flight DMA on this
        # buffer, then zero it — partial top groups and count-gated chunks
        # must contribute zero rows to the reserved group region.
        grows = group * OUTREC // 128
        crows = CHUNK * OUTREC // 128

        @pl.when(first_visit)
        def _():
            @pl.when(pend[buf, 0] == 1)
            def _():
                _grad_group_copy(gdma, dpack_ref, gsem, buf,
                                 pend[buf, 1], group).wait()
                pend[buf, 0] = 0
            gdma[pl.ds(buf * grows, grows), :] = jnp.zeros(
                (grows, 128), jnp.float32)

        gdma[pl.ds(buf * grows + (c % gc) * crows, crows), :] = rows

        # Group complete at its lowest chunk: DMA it to its packed slot.
        @pl.when((c % gc == 0) & (off + g * group + group <= pack_cap))
        def _():
            base = (off + g * group) * OUTREC // 128
            _grad_group_copy(gdma, dpack_ref, gsem, buf, base, group).start()
            pend[buf, 0] = 1
            pend[buf, 1] = base
        return carry

    # No scratch zero-init: every splat writes all OUTREC of its flat
    # sublane rows each chunk (20 x CHUNK = the whole buffer).

    def cond(carry):
        c, _ = carry
        return c >= 0

    def body(carry):
        c, acc = carry
        return c - 1, chunk_body(c, acc)

    lax.while_loop(cond, body, (start_chunk - 1, init))

    # Retire this tile's in-flight group DMAs (at most two) so the next
    # grid step may restage, and the final step leaves the semaphores
    # drained.
    for b in range(2):
        @pl.when(pend[b, 0] == 1)
        def _(b=b):
            _grad_group_copy(gdma, dpack_ref, gsem, b, pend[b, 1], group).wait()
            pend[b, 0] = 0


def _grad_group_copy(gdma, dpack_ref, gsem, buf, base, group):
    """Async copy descriptor for one staged gradient group: group*OUTREC/128
    flat lane rows from the staging buffer half `buf` to their packed slot
    of the HBM-resident output."""
    grows = group * OUTREC // 128
    return pltpu.make_async_copy(
        gdma.at[pl.ds(buf * grows, grows), :],
        dpack_ref.at[pl.ds(base, grows), :],
        gsem.at[buf])


class PallasMaps(NamedTuple):
    rgb: jnp.ndarray        # (H, W, 3) pre-background
    t_final: jnp.ndarray    # (H, W)
    depth: jnp.ndarray      # (H, W) unnormalized expected depth
    normal: jnp.ndarray     # (H, W, 3)
    median: jnp.ndarray     # (H, W)
    distortion: jnp.ndarray  # (H, W)


def _blend_call(rec3, counts, row0, *, nty, capk, interpret):
    """rec3: (T, NCH, capk) channel-major per-tile record lists."""
    t, nch, _ = rec3.shape
    group = min(GROUP, capk)  # staging granularity never exceeds capacity
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            # The channel-major record block (exactly _bin_records' output
            # — no gather, transpose, or copy between binning and
            # blending) rides the pipelined HBM->VMEM fetch; the kernel
            # stages only the walked GROUPs into SMEM for scalar reads.
            pl.BlockSpec((1, nch, capk),
                         lambda i, counts, row0: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUT_CH, BY, BX),
                               lambda i, counts, row0: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2, nch, group), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nty=nty, group=group,
                          unroll=not interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, OUT_CH, BY, BX), jnp.float32),
        interpret=interpret,
    )(counts, row0, rec3)


def _effective_counts(counts, out, group):
    """Per-tile group-aligned EFFECTIVE entry counts: entries past the
    tile's last contributor (forward early exit, out channel 12) are never
    walked by the backward, so they reserve no packed gradient rows.
    `group` (= min(GROUP, capk)) alignment makes every tile's packed
    region a whole number of the backward's DMA units (one group =
    group*OUTREC/128 flat lane rows), so the HBM-resident packed array is
    written in fixed-size group copies; the <group/2 zero slack rows per
    tile scatter +=0 to slot 0."""
    li = jnp.max(out[:, 12], axis=(1, 2)).astype(jnp.int32)  # -1 = none
    walked = jnp.where(li < 0, 0, (li // group + 1) * group)
    return jnp.minimum(-(-counts // group) * group, walked)


def _packed_offsets(counts, out, group):
    """Global packed row cursor per tile: exclusive prefix of the
    group-aligned effective counts in grid (column-major tile) order.
    Group alignment keeps every DMA's flat-lane offset (off+g*group)*
    OUTREC/128 integral and every group copy disjoint."""
    cc = _effective_counts(counts, out, group)
    return (jnp.cumsum(cc) - cc).astype(jnp.int32)


def _blend_bwd_call(rec3, counts, off, row0, out, dout, *, nty, capk,
                    pack_cap, interpret):
    t, nch, _ = rec3.shape
    group = min(GROUP, capk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, nch, capk), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OUT_CH, BY, BX),
                         lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OUT_CH, BY, BX),
                         lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # ONE global packed array, HBM-RESIDENT (ANY): at production caps
        # it exceeds scoped VMEM. The kernel DMAs completed 128-entry
        # groups into their disjoint group-aligned slots (see _bwd_kernel).
        # Flat-lane layout: zero lane padding.
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((CHUNK * OUTREC // 128, 128, BX), jnp.float32),
            pltpu.SMEM((2, nch, group), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            # double-buffered group staging for the packed gradient rows
            pltpu.VMEM((2 * group * OUTREC // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2, 2), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, nty=nty, group=group,
                          pack_cap=pack_cap, unroll=not interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (pack_cap * OUTREC // 128, 128), jnp.float32),
        interpret=interpret,
    )(counts, row0, off, rec3, out, dout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def blend_tiles(rec_c, rec3i, counts, row0, nbx, nty, capk, pack_cap,
                interpret):
    """Blend pre-binned record lists with a column-packed scatter backward.

    rec_c (K, REC): the depth-compacted differentiable records (data
    UNREAD in the forward — the gradient routing target). rec3i
    (T, NCH, capk) int32: the bitcast of _bin_records' channel-major
    per-tile record lists (numerically identical to a rec_c gather: the
    select kernel's mantissa-split carry is exact), with each record's
    compacted slot in channel 21. int32 so the custom_vjp owes it no
    cotangent — exactly like the old tile_pos index argument it replaces.
    The backward kernel emits column-packed gradient rows carrying the
    slot, and one XLA scatter-add over ~live rows routes them back to
    rec_c."""
    rec3 = lax.bitcast_convert_type(rec3i, jnp.float32)
    return _blend_call(rec3, counts, row0, nty=nty, capk=capk,
                       interpret=interpret)


def _blend_fwd(rec_c, rec3i, counts, row0, nbx, nty, capk, pack_cap,
               interpret):
    rec3 = lax.bitcast_convert_type(rec3i, jnp.float32)
    out = _blend_call(rec3, counts, row0, nty=nty, capk=capk,
                      interpret=interpret)
    # rec3 is the residual. rec_c rides along only for its shape/dtype.
    return out, (rec_c, rec3, counts, row0, out)


def _blend_bwd(nbx, nty, capk, pack_cap, interpret, res, dout):
    rec_c, rec3, counts, row0, out = res
    eff = _effective_counts(counts, out, min(GROUP, capk))
    off = (jnp.cumsum(eff) - eff).astype(jnp.int32)
    dpack = _blend_bwd_call(rec3, counts, off, row0, out, dout, nty=nty,
                            capk=capk, pack_cap=pack_cap,
                            interpret=interpret)
    flat = dpack.reshape(-1, OUTREC)
    # Rows past the global demand were never written (the HBM-resident
    # packed array is not zero-initialized): mask them to +=0 at slot 0.
    # The written prefix is exactly [0, min(demand, pack_cap)) — offsets
    # and pack_cap are GROUP-aligned, so every group either lands whole
    # or is dropped whole.
    live_row = jnp.arange(flat.shape[0], dtype=jnp.int32) < jnp.minimum(
        jnp.sum(eff), pack_cap)
    idx = jnp.where(live_row, flat[:, OUTREC - 1].astype(jnp.int32), 0)
    # Scatter the full OUTREC rows (slicing `flat` first would copy the
    # whole packed array); the slot-sum column and the no-gradient record
    # channels 19:24 are dropped/zeroed on the small (K, REC) side.
    dsum = jnp.zeros(
        (rec_c.shape[0], OUTREC), rec_c.dtype).at[idx].add(
        jnp.where(live_row[:, None], flat, 0.0))
    drec_c = jnp.concatenate(
        [dsum[:, : OUTREC - 1],
         jnp.zeros((rec_c.shape[0], REC - (OUTREC - 1)), rec_c.dtype)],
        axis=1)
    return drec_c, None, None, None


blend_tiles.defvjp(_blend_fwd, _blend_bwd)


def rasterize_pallas(splats: SplatScreen, settings, bg_color: jnp.ndarray,
                     interpret: bool = False, tile_row0=0,
                     nty_local: int | None = None,
                     row_lo=None, row_hi=None):
    """Drop-in fast backend: same (image, allmap) contract as the others.

    With (tile_row0, nty_local) only that strip of BY-pixel tile rows is
    rasterized (the unit of multi-chip distribution; tile_row0 may be a
    traced scalar and MUST be a multiple of 4 for coarse-bin alignment).
    The strip is returned un-cropped: (nty_local*BY, nbx*BX).

    With (row_lo, row_hi) — TRACED int32 tile-row bounds, exclusive hi —
    the grid stays FULL-height but only tiles inside the half-open window
    produce work (binning masks the rest to empty lists): the
    work-balanced multi-chip mode, where windows are per-device work
    quantiles at tile-row granularity and need no alignment or recompile
    (parallel/sharded.rasterize_sharded with row_balance="work").
    Out-of-window rows of the returned strip contain background only."""
    w, h = settings.width, settings.height
    n = splats.tmat.shape[0]

    nbx = -(-w // BX)
    full = nty_local is None
    nty = -(-h // BY) if full else nty_local
    t = nbx * nty

    cap = min(settings.tile_capacity, max(n, 1))
    bin_cap = max(min(settings.bin_capacity, max(n, 1)), cap)
    k_vis = min(settings.vis_capacity or n, n)

    if n >= 1 << 24:
        # Splat ids ride an f32 channel through binning (exact < 2^24).
        raise ValueError(f"pallas backend: {n} splats >= 2^24 exceeds the "
                         "f32 id channel")
    comp = binning.compact_visible(splats, k_vis)
    rec = pack_records(splats)                  # (N, REC) differentiable
    n_vis = jnp.minimum(comp.num_visible, k_vis)

    # The binning id channel carries ORIGINAL splat ids (comp.perm), so
    # the L1 record gather reads `rec` directly and the backward scatter
    # targets it directly — no depth-ordered rec[perm] copy exists at all
    # (the gather's transpose alone was a 131K-row scatter-add, ~1.5
    # ms/frame on the bench; measured round 4).
    col_cap = settings.col_capacity
    rec3, raw_counts, bin_counts, col_counts = _bin_records(
        comp.x0, comp.x1, comp.y0, comp.y1, n_vis,
        lax.stop_gradient(rec), nbx, nty, bin_cap, cap, tile_row0,
        col_cap=col_cap, ids=comp.perm, interpret=interpret,
        row_lo=row_lo, row_hi=row_hi)

    aux = {
        "_aux_bin_overflow_frac": jnp.mean(
            (bin_counts > bin_cap).astype(jnp.float32)),
        "_aux_col_overflow_frac": jnp.mean(
            (col_counts > col_cap).astype(jnp.float32)),
        "_aux_vis_overflow": (comp.num_visible > k_vis).astype(jnp.float32),
        "_aux_bin_count_max": jnp.max(bin_counts).astype(jnp.float32),
        "_aux_col_count_max": jnp.max(col_counts).astype(jnp.float32),
    }
    return blend_binned(rec, rec3, raw_counts, settings, bg_color,
                        nbx, nty, tile_row0, full, interpret, aux)


def blend_binned(rec_c, rec3, raw_counts, settings, bg_color, nbx, nty,
                 tile_row0, full, interpret, aux):
    """Blend pre-binned, depth-ordered record lists into (image, allmap).

    The shared tail of rasterize_pallas and the splat-sharded path
    (parallel/sharded.py): rec_c — the differentiable record array whose
    ROWS the binning id channel indexes ((N, REC) unsorted records
    single-device; (K, REC) merged depth-compacted records when splat
    sharded) — is the gradient target; rec3 (T, NCH, capk) channel-major
    per-tile record lists from _bin_records (stop-gradient data; slot
    channel 21 routes gradients back to rec_c rows), raw_counts (T,)
    total overlaps. `aux` = extra _aux_* diagnostics merged into
    allmap."""
    w, h = settings.width, settings.height
    t, nch, capk = rec3.shape
    counts = jnp.minimum(raw_counts, capk).astype(jnp.int32)

    # GLOBAL capacity of the backward's packed gradient rows: the sum of
    # all tiles' chunk-aligned effective counts (entries past a tile's
    # last contributor reserve no rows, _effective_counts). The upper
    # clamp is the true worst case — every tile at the (already
    # CHUNK-aligned) effective capacity capk — so an explicitly adequate
    # grad_pack_capacity is never reduced below it. The derived default
    # is 16 * lane-rounded tile capacity * image tile columns (api.py's
    # "0 = 16 * tile_capacity * tile columns" contract, mirrored by
    # Trainer._current_cap): global demand routinely exceeds many
    # multiples of capk, so anything smaller drops gradient tails for
    # callers outside the Trainer's adaptive-cap healing loop.
    pack_cap = settings.grad_pack_capacity or (16 * _round128(capk) * nbx)
    pack_cap = min(_round128(pack_cap), _round128(t * capk))
    # pack_cap must be a whole number of staging groups: the packed
    # offsets are group-aligned, and a boundary group that half-fits
    # would be dropped while the demand mask still marks its rows live —
    # the scatter would read unwritten HBM. Round UP so every group
    # below pack_cap lands whole.
    grp = min(GROUP, capk)
    pack_cap = -(-pack_cap // grp) * grp

    row0 = jnp.asarray(tile_row0, jnp.int32).reshape(1)
    # int32 bitcast at the custom_vjp boundary: index-like data owes no
    # cotangent (see blend_tiles).
    rec3i = lax.bitcast_convert_type(rec3, jnp.int32)
    out = blend_tiles(rec_c, rec3i, counts, row0, nbx, nty, capk, pack_cap,
                      interpret)

    def untile(ch):
        # column-major tile rows: t = tix*nty + tiy
        a = out[:, ch].reshape(nbx, nty, BY, BX)
        a = jnp.transpose(a, (1, 2, 0, 3)).reshape(nty * BY, nbx * BX)
        return a[:h, :w] if full else a

    # Global packed-row demand = sum of all tiles' chunk-aligned effective
    # counts (exactly what the backward will store; see _packed_offsets).
    pack_demand = jnp.sum(_effective_counts(counts, out, min(GROUP, capk)))

    t_final = untile(3)
    image = jnp.stack([untile(0), untile(1), untile(2)], axis=-1)
    image = image + t_final[..., None] * bg_color[None, None, :]
    allmap = {
        "depth_expected": untile(4),
        "alpha": 1.0 - t_final,
        "normal": jnp.stack([untile(5), untile(6), untile(7)], axis=-1),
        "depth_median": untile(8),
        "distortion": untile(9),
        # diagnostics (scalar, popped by api.render into the out dict):
        # fraction of tiles whose overlap set exceeded capacity (tail cut)
        "_aux_tile_overflow_frac": jnp.mean(
            (raw_counts > capk).astype(jnp.float32)),
        # 1.0 when the global packed gradient rows exceed
        # grad_pack_capacity (backward gradient tails dropped)
        "_aux_grad_pack_overflow_frac": (
            pack_demand > pack_cap).astype(jnp.float32),
        # true demand maxima: the Trainer's adaptive growth sizes the
        # raised cap directly from these (ONE recompile, not a 1.5x
        # doubling ladder of them)
        "_aux_tile_count_max": jnp.max(raw_counts).astype(jnp.float32),
        "_aux_grad_pack_max": pack_demand.astype(jnp.float32),
        # Work actually blended (sum of capacity-clamped tile entries) —
        # the load-balance signal: under tile-row sharding each strip
        # reports its own sum and parallel/sharded all-gathers them into a
        # (D,) vector, making cross-device imbalance observable.
        "_aux_strip_work": jnp.sum(counts).astype(jnp.float32),
        **aux,
    }
    return image, allmap


def _round128(x: int) -> int:
    return max(128, -(-x // 128) * 128)


# Channel map of the record-carrying binning levels: exactly the REC
# record channels (sublane-8-aligned for the blend kernels' DMA slices; no
# AABB channels — the exact coverage test subsumes the box overlap, since
# the te2-conic and the low-pass circle are contained in the binning box).
# The exact test reads c1/c2/c3 (0:9), filter_center (19:21), te2 (22),
# fr2 (23). Pad rows are never-hit THROUGH THE EXACT TEST: an ellipse
# (a=c=1, b=0) centered at -1e9 with te2 < 0, circle at 1e9 with fr2 < 0.
NCH = REC
_EXACT_IDX = tuple(range(9)) + (19, 20, 22, 23)
_REC_PADS = tuple(
    {0: 1.0, 4: 1.0, 6: 1e9, 7: 1e9, 19: 1e9, 22: -1.0, 23: -1.0}.get(c, 0.0)
    for c in range(REC))


def _bin_records(x0, x1, y0, y1, n_vis, rec_sg, nbx, nty, bin_cap, cap,
                 tile_row0, col_cap=32768, ids=None, interpret=False,
                 row_lo=None, row_hi=None):
    """Three-level record-carrying binning: columns -> coarse bins -> tiles.

    x0..y1: (K,) screen binning AABBs in DEPTH-ASCENDING order (never-hit
    boxes past n_vis); rec_sg: stop-gradient records indexed by the id
    channel — rows of rec_sg[ids[slot]]. With `ids` (K,) int32 given
    (single-device path: comp.perm), rec_sg is the UNSORTED (N, REC)
    record array and no depth-ordered copy of it is ever materialized;
    with ids=None (splat-sharded path), rec_sg is (K, REC) in box order
    and ids default to arange(K). Positional order of the boxes in the
    depth-compacted space makes every list front-to-back sorted and
    deterministic either way.

    Returns (rec3 (T, NCH, capk) f32 channel-major per-tile record lists —
    directly consumable by the blend kernels, NO (T, cap) row gather
    anywhere — counts (T,), bin_counts (NB,), col_counts (nbx,)).

      L1: screen columns (one BX-wide tile column each) select slim
          box+slot channels from the global compacted array — the only
          level that walks all K splats; a full-record carry there would
          blow VMEM (NCH channels x K). One row gather then builds the
          column record lists (nbx*col_cap rows, ~3x fewer than the
          per-tile gather this design replaces).
      L2: coarse bins (1 column x 4 tile rows, COLUMN-major so consecutive
          grid steps reuse the resident parent block) select full records
          from their column's candidates under the EXACT conic∪circle
          coverage test — strictly tighter than AABB overlap, and exactly
          output-preserving (the blend kernels' per-pixel hit set is a
          subset of the coverage region; see select_kernel._exact_coverage).
      L3: fine (BX x BY) tiles select from their bin's candidates, same
          exact test. Tiles are COLUMN-major (t = tix*nty + tiy) so the
          backward kernel keeps one column accumulator resident across a
          column's consecutive grid steps.

    `row_lo`/`row_hi` (optional TRACED int32 scalars, global tile-row
    units) restrict binning to the half-open tile-row window
    [row_lo, row_hi) at TILE granularity: L1's column y-range shrinks to
    the window, coarse bins entirely outside it and fine tiles outside it
    get never-hit rectangles (empty lists, counts 0). This is the
    work-balanced multi-chip mode (parallel/sharded.py): the grid stays
    full-height/static-shaped while the populated window is a traced
    quantile of the per-row work — no recompile when the balance point
    moves between cameras. Window boundaries need NO coarse (4-row)
    alignment: a straddling coarse bin keeps its full rectangle (candidate
    superset) and the per-tile exact test restores exactness.
    """
    cby = 4  # coarse bin = (BX, 4*BY) px
    nby_c = -(-nty // cby)
    f32 = jnp.float32

    kp = _round128(x0.shape[0])
    col_cap = _round128(min(col_cap, kp))
    bin_capk = _round128(min(bin_cap, col_cap))
    # capk must be a whole number of record-staging groups: the blend
    # kernels DMA records in min(GROUP, capk)-entry groups, and a capk
    # that is an odd multiple of 128 (e.g. an adaptive-growth 13440) would
    # make the LAST group's slice run past the block — a silent
    # wrong-records blend in interpret mode (dynamic-slice clamping) and
    # an out-of-bounds DMA on hardware, with no overflow counter firing
    # (round-5 review finding, reproduced at capk=384).
    capk = _round_group(min(cap, bin_capk))

    # L1: columns over the strip's full y range (AABB-only test: a
    # full-height column strip gains nothing from the exact test). The
    # record-row id rides as an f32 channel (exact: ids < 2^24).
    if ids is None:
        g0 = jnp.arange(x0.shape[0], dtype=f32)[None, :]
    else:
        g0 = ids.astype(f32)[None, :]
    if row_lo is not None:
        wlo = jnp.asarray(row_lo, f32)
        whi = jnp.asarray(row_hi, f32)
        y_lo = (wlo * BY) * jnp.ones((nbx,), f32)
        y_hi = (whi * BY - 1) * jnp.ones((nbx,), f32)
    else:
        y_lo = (jnp.asarray(tile_row0, f32) * BY) * jnp.ones((nbx,), f32)
        y_hi = y_lo + (nty * BY - 1)
    cix = jnp.arange(nbx, dtype=f32)
    cchan, col_cnt = select_kernel.select_values(
        (cix * BX, cix * BX + (BX - 1), y_lo, y_hi),
        (x0[None], x1[None], y0[None], y1[None], g0),
        jnp.zeros((nbx,), jnp.int32), col_cap,
        parent_counts=jnp.broadcast_to(n_vis, (nbx,)), interpret=interpret)

    # Column record lists: the one gather of the design (pad slots are 0 —
    # a live record — but their never-hit box channels kill them at L2).
    # Channel 21 is stamped with the record-row id: the backward scatter
    # target carried to the blend kernels.
    slot_f = cchan[:, 4]                                  # (nbx, col_cap)
    rec_col = jnp.transpose(rec_sg[slot_f.astype(jnp.int32)], (0, 2, 1))
    rec_col = rec_col.at[:, 21, :].set(slot_f)
    # L1 pads gathered record row 0 (slot pad 0 = a live record): overwrite
    # the tail with never-hit pad rows so L2's exact-only test rejects it.
    live_col = (jnp.arange(rec_col.shape[2]) < jnp.minimum(
        col_cnt, col_cap)[:, None])[:, None, :]
    pads_col = jnp.asarray(_REC_PADS, jnp.float32)[None, :, None]
    l2_in = jnp.where(live_col, rec_col, pads_col)        # (nbx, NCH, ·)

    # L2: coarse bins from their column's candidates, exact coverage.
    nb = nby_c * nbx
    bi = jnp.arange(nb, dtype=jnp.int32)
    bix = (bi // nby_c).astype(f32)
    biy = (bi % nby_c).astype(f32) + jnp.asarray(tile_row0, f32) / cby
    by0 = biy * (BY * cby)
    by1 = by0 + (BY * cby - 1)
    if row_lo is not None:
        # Drop bins ENTIRELY outside the window (straddlers keep their full
        # rectangle: candidate supersets are exact under the L3 test).
        brow0 = cby * (bi % nby_c).astype(f32)
        in_win = (brow0 < whi) & (brow0 + cby > wlo)
        by0 = jnp.where(in_win, by0, 2e9)
        by1 = jnp.where(in_win, by1, 2e9 + (BY * cby - 1))
    bin_parent = bi // nby_c
    bchan, bin_counts = select_kernel.select_values(
        (bix * BX, bix * BX + (BX - 1), by0, by1),
        l2_in, bin_parent, bin_capk,
        parent_counts=jnp.minimum(col_cnt, col_cap)[bin_parent],
        box_idx=None, exact_idx=_EXACT_IDX, pad_vals=_REC_PADS,
        interpret=interpret)

    # L3: fine tiles from their bin's candidates, exact coverage.
    t = nty * nbx
    tix = jnp.arange(t, dtype=jnp.int32) // nty
    tiy = jnp.arange(t, dtype=jnp.int32) % nty
    bin_of_tile = tix * nby_c + tiy // cby
    tx0 = (tix * BX).astype(f32)
    ty0 = ((tiy + jnp.asarray(tile_row0, jnp.int32)) * BY).astype(f32)
    if row_lo is not None:
        tin = (tiy.astype(f32) >= wlo) & (tiy.astype(f32) < whi)
        ty0 = jnp.where(tin, ty0, 2e9)
    # (L3 cannot slim its output to the 22 channels the blend kernels
    # read: the record-staging DMA slices the (nch, capk) VMEM block along
    # the channel dim, which Mosaic requires to be sublane-aligned —
    # multiple of 8 — so 24 is the minimum that fits all 22. Measured as a
    # Mosaic compile error, round 4.)
    rec3, counts = select_kernel.select_values(
        (tx0, tx0 + (BX - 1), ty0, ty0 + (BY - 1)),
        bchan, bin_of_tile, capk,
        parent_counts=jnp.minimum(bin_counts, bin_capk)[bin_of_tile],
        box_idx=None, exact_idx=_EXACT_IDX, pad_vals=_REC_PADS,
        interpret=interpret)
    return rec3, counts, bin_counts, col_cnt
