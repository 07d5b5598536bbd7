"""Pallas stream-compaction kernel: first-K overlapping splats per row.

The heart of TPU binning. XLA has no fast path for "indices of the first K
set bits per row" — gather/scatter/sort/top_k all run at ~10-40ms for the
shapes binning needs (measured on v5e) — so this kernel does the classic
GPU stream compaction with TPU-native pieces:

  * the candidate axis is walked in 128-lane blocks; the AABB hit test is
    a handful of VPU compares against the row's rectangle (scalars from
    SMEM prefetch);
  * within a block, hit *ranks* come from a lower-triangular matmul on the
    MXU (the 128-wide inclusive prefix sum), and the hit *positions* are
    compacted through a 0/1 selection matrix — a second tiny matmul. All
    products are small integers, so the bf16-pass MXU is exact;
  * compacted values land at the row's running cursor with the classic
    overlapping-write trick, expressed as accumulation into the (at most
    two) 128-aligned output rows the 128 values can span. Output rows are
    sublane-indexed, so no dynamic lane addressing is needed anywhere.

Per-row order is positional (depth order of the compacted candidate
array), so lists come out front-to-back sorted and deterministic, matching
binning.first_k_hits bit-for-bit (tests assert equality).

Levels of the binning hierarchy reuse this one kernel with different
geometry: screen columns from the global compacted array, coarse bins from
their column's candidates, fine tiles from their bin's candidates
(pallas_backend._bin_rect_kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LB = 128  # lane-block width: candidates processed per inner step


def _select_kernel(parent_ref, rx0_ref, rx1_ref, ry0_ref, ry1_ref,
                   cx0_ref, cx1_ref, cy0_ref, cy1_ref,
                   pos_ref, cnt_ref, *, mb: int, cap_rows: int):
    i = pl.program_id(0)
    rx0 = rx0_ref[i]
    rx1 = rx1_ref[i]
    ry0 = ry0_ref[i]
    ry1 = ry1_ref[i]

    f32 = jnp.float32
    # (in, out) one-hot builders; constants are hoisted out of the loop.
    # integer iota then cast: Mosaic rejects float iota.
    sub = lax.broadcasted_iota(jnp.int32, (LB, LB), 0)
    lanes2i = lax.broadcasted_iota(jnp.int32, (LB, LB), 1)
    ident = (sub == lanes2i).astype(f32)
    tril = (sub >= lanes2i).astype(f32)          # inclusive prefix (L @ v)
    lanes2 = lanes2i.astype(f32)
    loc = lax.broadcasted_iota(jnp.int32, (LB, 1), 0).astype(f32)
    lane1 = lax.broadcasted_iota(jnp.int32, (1, LB), 1).astype(f32)

    pos_ref[0] = jnp.zeros((cap_rows, LB), f32)

    def block_body(b, cursor):
        x0 = cx0_ref[0, pl.ds(b, 1), :]   # (1, LB)
        x1 = cx1_ref[0, pl.ds(b, 1), :]
        y0 = cy0_ref[0, pl.ds(b, 1), :]
        y1 = cy1_ref[0, pl.ds(b, 1), :]
        hit = (x0 <= rx1) & (x1 >= rx0) & (y0 <= ry1) & (y1 >= ry0)
        hf = hit.astype(f32)
        cnt = jnp.sum(hf).astype(jnp.int32)

        @pl.when(cnt > 0)
        def _():
            # Transpose the hit mask to sublanes, then rank it: both are
            # exact MXU products of {0,1} values.
            hit_sub = lax.dot_general(
                ident, hf, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)            # (LB, 1)
            lc = lax.dot_general(
                tril, hit_sub, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)            # (LB, 1) inclusive rank
            cur_mod = (cursor % LB).astype(f32)
            base_row = cursor // LB
            rel = lc - 1.0 + cur_mod                   # output slot, block-rel
            gate = hit_sub > 0.0
            # Selection matrices for the two aligned output rows the block
            # can span; exactly one 1 per hit column.
            sel_a = ((rel == lanes2) & gate).astype(f32)
            sel_b = ((rel - LB == lanes2) & gate).astype(f32)
            vals_a = lax.dot_general(
                loc, sel_a, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)            # (1, LB) local offsets
            vals_b = lax.dot_general(
                loc, sel_b, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)
            # Add the global block base only on the slots this block owns.
            fcnt = cnt.astype(f32)
            fb = (b * LB).astype(f32)
            own_a = (lane1 >= cur_mod) & (lane1 < cur_mod + fcnt)
            own_b = lane1 < cur_mod + fcnt - LB
            vals_a = vals_a + fb * own_a.astype(f32)
            vals_b = vals_b + fb * own_b.astype(f32)

            @pl.when(base_row < cap_rows)
            def _():
                pos_ref[0, pl.ds(base_row, 1), :] += vals_a

            @pl.when((base_row + 1 < cap_rows) & (cur_mod + fcnt > LB))
            def _():
                pos_ref[0, pl.ds(base_row + 1, 1), :] += vals_b

        return cursor + cnt

    total = lax.fori_loop(0, mb, block_body, jnp.int32(0))
    cnt_ref[i, 0] = total  # whole-array SMEM block, row per grid step


def select_rows(row_rects, cand_boxes, parent_of_row, cap: int,
                interpret: bool = False):
    """First-`cap` overlap positions per row, in candidate order.

    Args:
      row_rects: (rx0, rx1, ry0, ry1) each (R,) f32 — row rectangles
        (inclusive pixel bounds).
      cand_boxes: (cx0, cx1, cy0, cy1) each (NP, M) f32 — candidate AABBs
        per parent; M must be a multiple of 128 (pad with empty boxes).
      parent_of_row: (R,) int32 — candidate set used by each row.
      cap: output capacity per row (multiple of 128).

    Returns (pos (R, cap) int32 — positions into the parent's M axis,
    zero-filled past the count — and counts (R,) int32: TOTAL overlaps,
    which may exceed cap)."""
    rx0, rx1, ry0, ry1 = (a.astype(jnp.float32) for a in row_rects)
    cx0, cx1, cy0, cy1 = cand_boxes
    r = rx0.shape[0]
    np_, m = cx0.shape
    assert m % LB == 0 and cap % LB == 0, (m, cap)
    mb = m // LB
    cap_rows = cap // LB

    def reshaped(a):
        return a.astype(jnp.float32).reshape(np_, mb, LB)

    box_spec = pl.BlockSpec(
        (1, mb, LB),
        lambda i, parent, *_: (parent[i], 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(r,),
        in_specs=[box_spec] * 4,
        out_specs=[
            pl.BlockSpec((1, cap_rows, LB), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    pos, counts = pl.pallas_call(
        functools.partial(_select_kernel, mb=mb, cap_rows=cap_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, cap_rows, LB), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(parent_of_row.astype(jnp.int32), rx0, rx1, ry0, ry1,
      reshaped(cx0), reshaped(cx1), reshaped(cy0), reshaped(cy1))
    return pos.reshape(r, cap).astype(jnp.int32), counts.reshape(r)


def pad_candidates(boxes, m_padded: int):
    """Pad (NP, M) candidate boxes to M=m_padded with never-hit boxes."""
    cx0, cx1, cy0, cy1 = boxes
    pad = m_padded - cx0.shape[1]
    if pad <= 0:
        return boxes
    np_ = cx0.shape[0]

    def p(a, fill):
        return jnp.concatenate(
            [a, jnp.full((np_, pad), fill, a.dtype)], axis=1)

    return p(cx0, 1e9), p(cx1, -1e9), p(cy0, 1e9), p(cy1, -1e9)
