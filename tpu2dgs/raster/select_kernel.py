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


def _select_kernel(parent_ref, pcnt_ref, rx0_ref, rx1_ref, ry0_ref, ry1_ref,
                   cx0_ref, cx1_ref, cy0_ref, cy1_ref,
                   pos_ref, cnt_ref, *, mb: int, cap_rows: int):
    i = pl.program_id(0)
    rx0 = rx0_ref[i]
    rx1 = rx1_ref[i]
    ry0 = ry0_ref[i]
    ry1 = ry1_ref[i]

    f32 = jnp.float32
    # Constant one-hot builders (hoisted): integer iota then cast — Mosaic
    # rejects float iota.
    sub = lax.broadcasted_iota(jnp.int32, (LB, LB), 0)
    lanes2i = lax.broadcasted_iota(jnp.int32, (LB, LB), 1)
    ident = (sub == lanes2i).astype(f32)
    tril = (sub >= lanes2i).astype(f32)          # inclusive prefix (L @ v)
    lanes2 = lanes2i.astype(f32)
    lane1 = lax.broadcasted_iota(jnp.int32, (1, LB), 1).astype(f32)

    pos_ref[0] = jnp.zeros((cap_rows, LB), f32)
    # Candidate lists are front-packed (never-hit padding past the parent's
    # count), so only ceil(pcnt / (8*LB)) macro blocks can contain hits.
    pcnt = jnp.minimum(pcnt_ref[i], mb * LB)
    nmac = (pcnt + (8 * LB - 1)) // (8 * LB)

    def macro_body(bm, carry):
        """One (8, LB) macro block: hit test once, 8 sub-row compactions."""
        cursor, cur_row = carry
        b0 = bm * 8
        x0 = cx0_ref[0, pl.ds(b0, 8), :]   # (8, LB)
        x1 = cx1_ref[0, pl.ds(b0, 8), :]
        y0 = cy0_ref[0, pl.ds(b0, 8), :]
        y1 = cy1_ref[0, pl.ds(b0, 8), :]
        hit8 = ((x0 <= rx1) & (x1 >= rx0) & (y0 <= ry1) & (y1 >= ry0))
        hf8 = hit8.astype(f32)

        def do_macro(carry):
            cursor, cur_row = carry
            # Batched MXU transpose + inclusive prefix for all 8 sub-rows:
            # exact {0,1} products.
            hit_sub = lax.dot_general(
                ident, hf8, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)            # (LB, 8)
            lc8 = lax.dot_general(
                tril, hit_sub, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)            # (LB, 8) ranks
            # Compacted positions by counting: the (l+1)-th hit of sub-row
            # k sits at sublane #{s : rank[s] <= l} (ranks are a
            # nondecreasing 0..cnt staircase). One (LB, LB) compare + one
            # sublane reduction per sub-row, all independent — no selection
            # matmuls, no per-sub-row branching. Lanes l >= cnt come out as
            # LB and are masked off by the ownership windows below.
            vals8 = [
                jnp.sum((lc8[:, k:k + 1] <= lanes2).astype(f32), axis=0,
                        keepdims=True)                 # (1, LB)
                for k in range(8)
            ]
            cnt8 = [lc8[LB - 1, k].astype(jnp.int32) for k in range(8)]

            def sub_body(k, carry):
                # k is a Python int (unrolled): static lane slices. Empty
                # sub-rows are a cheap masked no-op (cnt = 0 => ownership
                # windows are empty and `crossed` is false).
                cursor, cur_row = carry
                cnt = cnt8[k]
                cur_mod = cursor % LB
                base_row = cursor // LB
                fmod = cur_mod.astype(f32)
                fcnt = cnt.astype(f32)
                # Rotate into stream position; lanes outside
                # [cur_mod, cur_mod+cnt) are masked off per row.
                rolled = pltpu.roll(vals8[k], cur_mod, 1)
                fb = ((b0 + k) * LB).astype(f32)
                own_a = ((lane1 >= fmod)
                         & (lane1 < fmod + fcnt)).astype(f32)
                cur_row = cur_row + (rolled + fb) * own_a
                crossed = cur_mod + cnt >= LB

                @pl.when(crossed & (base_row < cap_rows))
                def _():
                    pos_ref[0, pl.ds(base_row, 1), :] = cur_row

                own_b = (lane1 < fmod + fcnt - LB).astype(f32)
                cur_row = jnp.where(crossed, (rolled + fb) * own_b,
                                    cur_row)
                return cursor + cnt, cur_row

            carry2 = (cursor, cur_row)
            for k in range(8):
                carry2 = sub_body(k, carry2)
            return carry2

        any_hit = jnp.sum(hf8) > 0.0
        return lax.cond(any_hit, do_macro, lambda c: c, (cursor, cur_row))

    total, cur_row = lax.fori_loop(
        0, nmac, macro_body, (jnp.int32(0), jnp.zeros((1, LB), f32)))

    # Flush the trailing partial row (lanes past total%LB hold zeros).
    last_row = total // LB

    @pl.when((total % LB > 0) & (last_row < cap_rows))
    def _():
        pos_ref[0, pl.ds(last_row, 1), :] = cur_row

    cnt_ref[i, 0] = total  # whole-array SMEM block, row per grid step


def select_rows(row_rects, cand_boxes, parent_of_row, cap: int,
                parent_counts=None, interpret: bool = False):
    """First-`cap` overlap positions per row, in candidate order.

    Args:
      row_rects: (rx0, rx1, ry0, ry1) each (R,) f32 — row rectangles
        (inclusive pixel bounds).
      cand_boxes: (cx0, cx1, cy0, cy1) each (NP, M) f32 — candidate AABBs
        per parent; M must be a multiple of 128 (pad with empty boxes).
      parent_of_row: (R,) int32 — candidate set used by each row.
      cap: output capacity per row (multiple of 128).
      parent_counts: optional (R,) int32 — number of live candidates at the
        FRONT of each row's parent list. When given, the kernel only walks
        ceil(count / 1024) macro blocks; every candidate past the count
        must be a never-hit box (as produced by `pad_candidates` /
        masked-off list tails). None = walk all M candidates.

    Returns (pos (R, cap) int32 — positions into the parent's M axis,
    zero-filled past the count — and counts (R,) int32: TOTAL overlaps,
    which may exceed cap)."""
    rx0, rx1, ry0, ry1 = (a.astype(jnp.float32) for a in row_rects)
    r = rx0.shape[0]
    m_in = cand_boxes[0].shape[1]
    cx0, cx1, cy0, cy1 = pad_candidates(
        cand_boxes, -(-m_in // (8 * LB)) * (8 * LB))
    np_, m = cx0.shape
    assert cap % LB == 0, cap
    mb = m // LB
    cap_rows = cap // LB
    if parent_counts is None:
        pcnt = jnp.full((r,), m, jnp.int32)
    else:
        pcnt = parent_counts.astype(jnp.int32)

    def reshaped(a):
        return a.astype(jnp.float32).reshape(np_, mb, LB)

    box_spec = pl.BlockSpec(
        (1, mb, LB),
        lambda i, parent, *_: (parent[i], 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
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
    )(parent_of_row.astype(jnp.int32), pcnt, rx0, rx1, ry0, ry1,
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
