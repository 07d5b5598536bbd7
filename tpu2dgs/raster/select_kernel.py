"""Pallas stream-compaction kernel: first-K overlapping splats per row.

The heart of TPU binning. XLA has no fast path for "indices of the first K
set bits per row" — gather/scatter/sort/top_k all run at ~10-40ms for the
shapes binning needs (measured on v5e) — so this kernel does the classic
GPU stream compaction with TPU-native pieces:

  * the candidate axis is walked in 128-lane blocks; the hit test is a
    handful of VPU ops against the row's rectangle (scalars from SMEM
    prefetch) — either a plain AABB overlap, or (with `exact=True`) the
    EXACT splat-coverage test: does the splat's response region — the
    perspective-correct conic {pu^2+pv^2 <= tau^2 pw^2} union its
    screen-space low-pass circle — intersect the rectangle? The conic test
    minimizes the quadratic Q(x,y) = pu^2+pv^2-tau^2 pw^2 over the rect
    (clamped edge critical points + interior stationary point: exact for an
    ellipse, conservative fallback otherwise). This replaces the CUDA
    rasterizer's AABB-only tile binning with a tighter test the reference
    never had (SURVEY.md §2.10: reference bins by screen AABB [RECON]);
  * within a block, hit *ranks* come from a lower-triangular matmul on the
    MXU (the 128-wide inclusive prefix sum), and the hit *positions* are
    compacted through a 0/1 selection matrix — a second tiny matmul. All
    products are small integers, so the bf16-pass MXU is exact;
  * every candidate CHANNEL is carried through the compaction by the same
    one-hot products (bf16-exact mantissa-split: see below), so binning
    levels chain with zero XLA gathers — and with the full record carried,
    the final level's output IS the per-tile record array consumed by the
    blend kernels (no (T, cap) row gather at all);
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
(pallas_backend._bin_records).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LB = 128  # lane-block width: candidates processed per inner step


def _exact_coverage(blocks, exact_idx, rx0, rx1, ry0, ry1):
    """Splat-coverage test of (8, LB) candidate blocks vs a pixel rect.

    `exact_idx` is a static 13-tuple of channel indices: r0..r8 (the
    c1/c2/c3 intersection constants: pu = r0 x + r3 y + r6,
    pv = r1 x + r4 y + r7, pw = r2 x + r5 y + r8), fcx/fcy (low-pass
    circle center), te2 (conic tau^2, opacity-adaptive, margin-inflated),
    fr2 (circle radius^2).

    Coverage region = E ∪ K with E = {rho3d <= te2} (as the homogeneous
    quadratic Q = pu^2+pv^2-te2*pw^2 <= 0) and K = {|p-fc|^2 <= fr2}: a
    strict superset of the blend kernels' per-pixel hit set, so excluding
    non-covering candidates leaves outputs AND gradients bit-identical.
    Q <= 0 over the rect is decided by the minimum over the four clamped
    edge critical points plus the interior stationary point — exact when
    the conic is an ellipse (A > 0, C > 0, det > 0); anything else
    (hyperbolic/degenerate: near edge-on surfels) conservatively passes.
    """
    r = [blocks[exact_idx[k]] for k in range(9)]
    fcx = blocks[exact_idx[9]]
    fcy = blocks[exact_idx[10]]
    te2 = blocks[exact_idx[11]]
    fr2 = blocks[exact_idx[12]]

    # circle vs rect: clamp center into the rect
    ccx = jnp.clip(fcx, rx0, rx1)
    ccy = jnp.clip(fcy, ry0, ry1)
    dx = fcx - ccx
    dy = fcy - ccy
    circ = dx * dx + dy * dy <= fr2

    def qval(x, y):
        pu = r[0] * x + r[3] * y + r[6]
        pv = r[1] * x + r[4] * y + r[7]
        pw = r[2] * x + r[5] * y + r[8]
        return pu * pu + pv * pv - te2 * (pw * pw)

    # quadratic coefficients (derivatives of Q)
    a = r[0] * r[0] + r[1] * r[1] - te2 * (r[2] * r[2])
    b = 2.0 * (r[0] * r[3] + r[1] * r[4] - te2 * (r[2] * r[5]))
    c = r[3] * r[3] + r[4] * r[4] - te2 * (r[5] * r[5])
    d = 2.0 * (r[0] * r[6] + r[1] * r[7] - te2 * (r[2] * r[8]))
    e = 2.0 * (r[3] * r[6] + r[4] * r[7] - te2 * (r[5] * r[8]))

    one = jnp.float32(1.0)
    inv2c = 0.5 / jnp.where(c > 0.0, c, one)
    inv2a = 0.5 / jnp.where(a > 0.0, a, one)
    # vertical edges x = rx0 / rx1: y* = -(b x + e) / (2c), clamped
    y_a = jnp.clip(-(b * rx0 + e) * inv2c, ry0, ry1)
    y_b = jnp.clip(-(b * rx1 + e) * inv2c, ry0, ry1)
    # horizontal edges y = ry0 / ry1: x* = -(b y + d) / (2a), clamped
    x_c = jnp.clip(-(b * ry0 + d) * inv2a, rx0, rx1)
    x_d = jnp.clip(-(b * ry1 + d) * inv2a, rx0, rx1)
    best = jnp.minimum(
        jnp.minimum(qval(rx0, y_a), qval(rx1, y_b)),
        jnp.minimum(qval(x_c, ry0), qval(x_d, ry1)),
    )
    # interior stationary point
    det = 4.0 * a * c - b * b
    invdet = one / jnp.where(det > 0.0, det, one)
    xs = (b * e - 2.0 * c * d) * invdet
    ys = (b * d - 2.0 * a * e) * invdet
    interior = (xs >= rx0) & (xs <= rx1) & (ys >= ry0) & (ys <= ry1)
    best = jnp.where(interior, jnp.minimum(best, qval(xs, ys)), best)
    # Non-ellipse (hyperbolic/degenerate) conics conservatively pass.
    # (Boolean algebra, not a where-select: Mosaic rejects i1 selects.)
    not_ell = (a <= 0.0) | (c <= 0.0) | (det <= 0.0)
    return (best <= 0.0) | not_ell | circ


def _select_values_kernel(parent_ref, pcnt_ref, rx0_ref, rx1_ref, ry0_ref,
                          ry1_ref, chan_ref, out_ref, cnt_ref, *, mb: int,
                          cap_rows: int, n_chan: int, n_out: int,
                          pad_vals: tuple, box_idx: tuple, exact_idx):
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
    pads = jnp.concatenate(
        [jnp.full((1, LB), v, f32) for v in pad_vals[:n_out]],
        axis=0)  # (n_out, LB)

    for c in range(n_out):
        out_ref[0, c] = jnp.full((cap_rows, LB), pad_vals[c], f32)
    # Candidate lists are front-packed (never-hit padding past the parent's
    # count), so only ceil(pcnt / (8*LB)) macro blocks can contain hits.
    pcnt = jnp.minimum(pcnt_ref[i], mb * LB)
    nmac = (pcnt + (8 * LB - 1)) // (8 * LB)

    def macro_body(bm, carry):
        """One (8, LB) macro block: hit test once, 8 sub-row compactions."""
        cursor, cur_rows = carry
        b0 = bm * 8
        blocks = [chan_ref[0, c, pl.ds(b0, 8), :] for c in range(n_chan)]
        if box_idx is not None:
            x0 = blocks[box_idx[0]]
            x1 = blocks[box_idx[1]]
            y0 = blocks[box_idx[2]]
            y1 = blocks[box_idx[3]]
            hit8 = ((x0 <= rx1) & (x1 >= rx0) & (y0 <= ry1) & (y1 >= ry0))
        else:
            hit8 = None  # exact-only hit test (pads must fail it)
        if exact_idx is not None:
            exact8 = _exact_coverage(blocks, exact_idx, rx0, rx1, ry0, ry1)
            hit8 = exact8 if hit8 is None else hit8 & exact8
        hf8 = hit8.astype(f32)
        # Exact one-hot value selection on the MXU's 1-pass bf16 datapath:
        # split every value into three bf16-exact components (top / middle
        # / low 8 significand bits, via mantissa masking — exact for any
        # normal f32, and all channel values here are normal or 0). Each
        # component passes through the bf16 input conversion unrounded, so
        # a DEFAULT-precision matmul selects it exactly; recombining the
        # three aligned parts in f32 is exact. ~4x cheaper than the 6-pass
        # Precision.HIGHEST dot this replaces.
        top16 = jnp.uint32(0xFFFF0000)
        his, mids, los = [], [], []
        for b in blocks[:n_out]:  # only carried channels need the split
            hi = pltpu.bitcast(pltpu.bitcast(b, jnp.uint32) & top16, f32)
            rem = b - hi
            mid = pltpu.bitcast(
                pltpu.bitcast(rem, jnp.uint32) & top16, f32)
            his.append(hi)
            mids.append(mid)
            los.append(rem - mid)

        def do_macro(carry):
            cursor, cur_rows = carry
            # Batched MXU transpose + inclusive prefix for all 8 sub-rows:
            # exact {0,1} products.
            hit_sub = lax.dot_general(
                ident, hf8, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.DEFAULT)       # (LB, 8)
            lc8 = lax.dot_general(
                tril, hit_sub, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=lax.Precision.DEFAULT)       # (LB, 8) ranks

            def sub_body(k, carry):
                # k is a Python int (unrolled): static lane slices. Empty
                # sub-rows are a cheap masked no-op (cnt = 0 => ownership
                # windows are empty and `crossed` is false).
                cursor, cur_rows = carry
                cnt = lc8[LB - 1, k].astype(jnp.int32)
                # One-hot selection: column l of sel is the (unique) hit
                # with rank l+1, so V @ sel compacts every channel at
                # once; V stacks the bf16-exact splits (see macro_body)
                # so one 1-pass matmul reconstructs all channels exactly.
                gate = hit_sub[:, k:k + 1] > 0.0
                sel = ((lc8[:, k:k + 1] - 1.0 == lanes2) & gate).astype(f32)
                v3 = jnp.concatenate(
                    [p[k:k + 1, :] for p in his]
                    + [p[k:k + 1, :] for p in mids]
                    + [p[k:k + 1, :] for p in los], axis=0)   # (3C, LB)
                vals3 = lax.dot_general(
                    v3, sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=lax.Precision.DEFAULT)          # (3C, LB)
                vals = (vals3[:n_out] + vals3[n_out:2 * n_out]
                        + vals3[2 * n_out:])                  # (n_out, LB)
                cur_mod = cursor % LB
                base_row = cursor // LB
                fmod = cur_mod.astype(f32)
                fcnt = cnt.astype(f32)
                # Rotate into stream position; lanes outside
                # [cur_mod, cur_mod+cnt) keep their previous value.
                rolled = pltpu.roll(vals, cur_mod, 1)
                own_a = (lane1 >= fmod) & (lane1 < fmod + fcnt)  # (1, LB)
                cur_rows = jnp.where(own_a, rolled, cur_rows)
                crossed = cur_mod + cnt >= LB

                @pl.when(crossed & (base_row < cap_rows))
                def _():
                    for c in range(n_out):
                        out_ref[0, c, pl.ds(base_row, 1), :] = (
                            cur_rows[c:c + 1, :])

                own_b = lane1 < fmod + fcnt - LB
                cur_rows = jnp.where(
                    crossed, jnp.where(own_b, rolled, pads), cur_rows)
                return cursor + cnt, cur_rows

            carry2 = (cursor, cur_rows)
            for k in range(8):
                carry2 = sub_body(k, carry2)
            return carry2

        any_hit = jnp.sum(hf8) > 0.0
        return lax.cond(any_hit, do_macro, lambda c: c, (cursor, cur_rows))

    total, cur_rows = lax.fori_loop(
        0, nmac, macro_body, (jnp.int32(0), pads))

    # Flush the trailing partial row (lanes past total%LB hold pads).
    last_row = total // LB

    @pl.when((total % LB > 0) & (last_row < cap_rows))
    def _():
        for c in range(n_out):
            out_ref[0, c, pl.ds(last_row, 1), :] = cur_rows[c:c + 1, :]

    cnt_ref[i, 0] = total  # whole-array SMEM block, row per grid step


BOX_PADS = (1e9, -1e9, 1e9, -1e9)  # never-hit AABB fills for x0, x1, y0, y1


def select_values(row_rects, cand_channels, parent_of_row, cap: int,
                  parent_counts=None, pad_vals=None,
                  interpret: bool = False, box_idx=(0, 1, 2, 3),
                  exact_idx: tuple | None = None,
                  out_channels: int | None = None):
    """Stream-compact candidate CHANNELS through per-row coverage tests.

    The gather-free form of stream compaction: instead of returning
    positions (forcing the caller to gather values between binning levels —
    a pathological XLA TPU op at these shapes), each level's kernel carries
    every channel through the compaction itself via exact one-hot MXU
    products, so consecutive levels chain with zero XLA gathers.

    Args:
      row_rects: (rx0, rx1, ry0, ry1) each (R,) f32 — row rectangles
        (inclusive pixel bounds).
      cand_channels: either a tuple of (NP, M) f32 arrays, or one stacked
        (NP, C, M) f32 array (e.g. a previous level's output — zero-copy
        chaining). Channels `box_idx` must hold the candidate AABBs
        (cx0, cx1, cy0, cy1) used for the overlap test; all channels are
        carried through compaction. M is padded internally to a
        macro-block multiple.
      parent_of_row: (R,) int32 — candidate set used by each row.
      cap: output capacity per row (multiple of 128).
      parent_counts: optional (R,) int32 — number of live candidates at the
        FRONT of each row's parent list. When given, the kernel only walks
        ceil(count / 1024) macro blocks; every candidate past the count
        must be a never-hit box. None = walk all M candidates.
      pad_vals: per-channel fill past each row's output count (default:
        0.0 everywhere except never-hit box fills at box_idx) — chosen so a
        level's output tail is directly consumable as the next level's
        input.
      box_idx: indices of the 4 AABB channels used by the overlap test, or
        None to skip the AABB test entirely (exact-only rows: pad_vals must
        then be never-hit under the exact test).
      exact_idx: when set, candidates must ALSO pass the exact splat
        coverage test (see _exact_coverage) reading the 13 channels this
        static tuple indexes: r0..r8, fcx, fcy, te2, fr2.
      out_channels: carry only the FIRST k channels into the output (the
        hit tests still read all input channels) — for a final level whose
        consumers don't need the test-only channels. None = carry all.

    Returns (channels (R, C_out, cap) f32 compacted in candidate order,
    counts (R,) int32: TOTAL overlaps, which may exceed cap)."""
    rx0, rx1, ry0, ry1 = (a.astype(jnp.float32) for a in row_rects)
    r = rx0.shape[0]
    if isinstance(cand_channels, (tuple, list)):
        stacked = jnp.stack(
            [a.astype(jnp.float32) for a in cand_channels], axis=1)
    else:
        stacked = cand_channels.astype(jnp.float32)
    np_, n_chan, m_in = stacked.shape
    if pad_vals is None:
        assert box_idx is not None, "exact-only rows need explicit pad_vals"
        pad_vals = [0.0] * n_chan
        for bi, v in zip(box_idx, BOX_PADS):
            pad_vals[bi] = v
    pad_vals = tuple(float(v) for v in pad_vals)
    assert len(pad_vals) == n_chan
    stacked = pad_candidates(stacked, -(-m_in // (8 * LB)) * (8 * LB),
                             pad_vals)
    m = stacked.shape[-1]
    assert cap % LB == 0, cap
    mb = m // LB
    cap_rows = cap // LB
    if parent_counts is None:
        pcnt = jnp.full((r,), m, jnp.int32)
    else:
        pcnt = parent_counts.astype(jnp.int32)
    n_out = n_chan if out_channels is None else int(out_channels)
    assert 0 < n_out <= n_chan, (n_out, n_chan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(r,),
        in_specs=[
            pl.BlockSpec(
                (1, n_chan, mb, LB),
                lambda i, parent, *_: (parent[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, n_out, cap_rows, LB), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    out, counts = pl.pallas_call(
        functools.partial(_select_values_kernel, mb=mb, cap_rows=cap_rows,
                          n_chan=n_chan, n_out=n_out, pad_vals=pad_vals,
                          box_idx=box_idx, exact_idx=exact_idx),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, n_out, cap_rows, LB), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(parent_of_row.astype(jnp.int32), pcnt, rx0, rx1, ry0, ry1,
      stacked.reshape(np_, n_chan, mb, LB))
    return out.reshape(r, n_out, cap), counts.reshape(r)


def select_rows(row_rects, cand_boxes, parent_of_row, cap: int,
                parent_counts=None, interpret: bool = False):
    """First-`cap` overlap positions per row, in candidate order.

    Position-returning wrapper over `select_values`: carries a per-parent
    iota channel through the compaction, so pos[r, j] indexes the parent's
    M axis. Returns (pos (R, cap) int32, zero-filled past the count, and
    counts (R,) int32: TOTAL overlaps, which may exceed cap)."""
    np_, m = cand_boxes[0].shape
    g = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.float32)[None, :], (np_, m))
    channels, counts = select_values(
        row_rects, tuple(cand_boxes) + (g,), parent_of_row, cap,
        parent_counts=parent_counts,
        pad_vals=BOX_PADS + (0.0,), interpret=interpret)
    return channels[:, 4].astype(jnp.int32), counts


def pad_candidates(stacked, m_padded: int, pad_vals):
    """Pad a stacked (NP, C, M) channel array to M=m_padded."""
    pad = m_padded - stacked.shape[-1]
    if pad <= 0:
        return stacked
    np_, c, _ = stacked.shape
    fills = jnp.broadcast_to(
        jnp.array(pad_vals, stacked.dtype)[None, :, None], (np_, c, pad))
    return jnp.concatenate([stacked, fills], axis=-1)


def _count_kernel(parent_ref, pcnt_ref, rx0_ref, rx1_ref, ry0_ref,
                  ry1_ref, chan_ref, cnt_ref, *, mb: int, n_chan: int,
                  box_idx, exact_idx):
    """Count-only variant of _select_values_kernel: the same per-row hit
    test with NONE of the value-carry machinery (no mantissa splits, no
    one-hot matmuls, no output staging). The round-6 CSR plan's step 1:
    per-row counts feed a group-aligned offset cumsum so the full select
    can write a globally PACKED output at known cursors."""
    i = pl.program_id(0)
    rx0 = rx0_ref[i]
    rx1 = rx1_ref[i]
    ry0 = ry0_ref[i]
    ry1 = ry1_ref[i]
    needed = set(box_idx or ()) | set(exact_idx or ())
    pcnt = jnp.minimum(pcnt_ref[i], mb * LB)
    nmac = (pcnt + (8 * LB - 1)) // (8 * LB)

    def macro_body(bm, total):
        b0 = bm * 8
        blocks = {c: chan_ref[0, c, pl.ds(b0, 8), :] for c in needed}
        if box_idx is not None:
            hit8 = ((blocks[box_idx[0]] <= rx1)
                    & (blocks[box_idx[1]] >= rx0)
                    & (blocks[box_idx[2]] <= ry1)
                    & (blocks[box_idx[3]] >= ry0))
        else:
            hit8 = None
        if exact_idx is not None:
            exact8 = _exact_coverage(blocks, exact_idx, rx0, rx1, ry0, ry1)
            hit8 = exact8 if hit8 is None else hit8 & exact8
        return total + jnp.sum(hit8.astype(jnp.float32))

    total = lax.fori_loop(0, nmac, macro_body, jnp.float32(0.0))
    cnt_ref[i, 0] = total.astype(jnp.int32)


def select_counts(row_rects, cand_channels, parent_of_row,
                  parent_counts=None, pad_vals=None,
                  interpret: bool = False, box_idx=(0, 1, 2, 3),
                  exact_idx: tuple | None = None):
    """Per-row TOTAL hit counts under the same tests as select_values,
    without compacting anything — bit-identical to select_values' counts
    output (tested) at a fraction of its cost. Returns (R,) int32."""
    rx0, rx1, ry0, ry1 = (a.astype(jnp.float32) for a in row_rects)
    r = rx0.shape[0]
    if isinstance(cand_channels, (tuple, list)):
        stacked = jnp.stack(
            [a.astype(jnp.float32) for a in cand_channels], axis=1)
    else:
        stacked = cand_channels.astype(jnp.float32)
    np_, n_chan, m_in = stacked.shape
    if pad_vals is None:
        assert box_idx is not None, "exact-only rows need explicit pad_vals"
        pad_vals = [0.0] * n_chan
        for bi, v in zip(box_idx, BOX_PADS):
            pad_vals[bi] = v
    pad_vals = tuple(float(v) for v in pad_vals)
    stacked = pad_candidates(stacked, -(-m_in // (8 * LB)) * (8 * LB),
                             pad_vals)
    m = stacked.shape[-1]
    mb = m // LB
    if parent_counts is None:
        pcnt = jnp.full((r,), m, jnp.int32)
    else:
        pcnt = parent_counts.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(r,),
        in_specs=[
            pl.BlockSpec(
                (1, n_chan, mb, LB),
                lambda i, parent, *_: (parent[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((r, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )
    (counts,) = pl.pallas_call(
        functools.partial(_count_kernel, mb=mb, n_chan=n_chan,
                          box_idx=box_idx, exact_idx=exact_idx),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((r, 1), jnp.int32)],
        interpret=interpret,
    )(parent_of_row.astype(jnp.int32), pcnt, rx0, rx1, ry0, ry1,
      stacked.reshape(np_, n_chan, mb, LB))
    return counts.reshape(r)
