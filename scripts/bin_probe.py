"""Per-level timing of the record-carrying binning pipeline."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tpu2dgs  # noqa: E402
from tpu2dgs.raster import binning  # noqa: E402
from tpu2dgs.raster import pallas_backend as pb  # noqa: E402
from tpu2dgs.raster import preprocess as pre  # noqa: E402
from tpu2dgs.raster import select_kernel  # noqa: E402
from profile_raster import chain_timed  # noqa: E402


def main():
    tpu2dgs.enable_compilation_cache()
    w = h = 800
    n = 1 << 17
    from tpu2dgs.eval.synthetic import make_bench_scene
    cam, scene = make_bench_scene(w, h, n)
    splats = jax.jit(lambda *s: pre.preprocess(
        s[0], s[1], s[2], s[3].reshape(-1), s[4], cam, w, h, 3))(*scene)
    nbx, nty = -(-w // pb.BX), -(-h // pb.BY)
    comp = jax.jit(lambda s: binning.compact_visible(s, n))(splats)
    rec_c = jax.jit(lambda s: pb.pack_records(s)[comp.perm])(splats)
    n_vis = jnp.minimum(comp.num_visible, n)
    bin_cap, cap, col_cap = 8192, 2048, 32768
    f32 = jnp.float32
    cby = 4
    nby_c = -(-nty // cby)
    col_capk = pb._round128(min(col_cap, pb._round128(n)))
    bin_capk = pb._round128(min(bin_cap, col_capk))
    capk = pb._round128(min(cap, bin_capk))

    # L1
    g0 = jnp.arange(n, dtype=f32)[None, :]
    y_lo = jnp.zeros((nbx,), f32)
    y_hi = y_lo + (nty * pb.BY - 1)
    cix = jnp.arange(nbx, dtype=f32)
    l1_rects = (cix * pb.BX, cix * pb.BX + (pb.BX - 1), y_lo, y_hi)

    def l1(c):
        return select_kernel.select_values(
            l1_rects, (c.x0[None], c.x1[None], c.y0[None], c.y1[None], g0),
            jnp.zeros((nbx,), jnp.int32), col_capk,
            parent_counts=jnp.broadcast_to(n_vis, (nbx,)))

    chain_timed("L1 columns", lambda c: jnp.sum(l1(c)[0][:, 4, :128]),
                (comp,))
    cchan, col_cnt = jax.jit(l1)(comp)

    def colgather(rc, cc):
        slot_f = cc[:, 4]
        rec_col = jnp.transpose(rc[slot_f.astype(jnp.int32)], (0, 2, 1))
        rec_col = rec_col.at[:, 21, :].set(slot_f)
        live_col = (jnp.arange(rec_col.shape[2]) < jnp.minimum(
            col_cnt, col_capk)[:, None])[:, None, :]
        pads_col = jnp.asarray(pb._REC_PADS, f32)[None, :, None]
        return jnp.where(live_col, rec_col, pads_col)

    chain_timed("col gather+transpose", lambda rc, cc: jnp.sum(
        colgather(rc, cc)[:, 0, :128]), (rec_c, cchan))
    l2_in = jax.jit(colgather)(rec_c, cchan)

    nb = nby_c * nbx
    bi = jnp.arange(nb, dtype=jnp.int32)
    bix = (bi // nby_c).astype(f32)
    biy = (bi % nby_c).astype(f32)
    bin_parent = bi // nby_c
    l2_rects = (bix * pb.BX, bix * pb.BX + (pb.BX - 1),
                biy * (pb.BY * cby), biy * (pb.BY * cby) + (pb.BY * cby - 1))

    def l2(x):
        return select_kernel.select_values(
            l2_rects, x, bin_parent, bin_capk,
            parent_counts=jnp.minimum(col_cnt, col_capk)[bin_parent],
            box_idx=None, exact_idx=pb._EXACT_IDX, pad_vals=pb._REC_PADS)

    chain_timed("L2 coarse bins (exact)", lambda x: jnp.sum(
        l2(x)[0][:, 0, :128]), (l2_in,))
    bchan, bin_counts = jax.jit(l2)(l2_in)

    t = nty * nbx
    tix = jnp.arange(t, dtype=jnp.int32) // nty
    tiy = jnp.arange(t, dtype=jnp.int32) % nty
    bin_of_tile = tix * nby_c + tiy // cby
    tx0 = (tix * pb.BX).astype(f32)
    ty0 = (tiy * pb.BY).astype(f32)
    l3_rects = (tx0, tx0 + (pb.BX - 1), ty0, ty0 + (pb.BY - 1))

    def l3(x):
        return select_kernel.select_values(
            l3_rects, x, bin_of_tile, capk,
            parent_counts=jnp.minimum(bin_counts, bin_capk)[bin_of_tile],
            box_idx=None, exact_idx=pb._EXACT_IDX, pad_vals=pb._REC_PADS)

    chain_timed("L3 fine tiles (exact)", lambda x: jnp.sum(
        l3(x)[0][:, 0, :128]), (bchan,))

    # COUNT-ONLY variants (the round-6 CSR plan's step-1 cost): same hit
    # tests, no value carry.
    def l2c(x):
        return select_kernel.select_counts(
            l2_rects, x, bin_parent,
            parent_counts=jnp.minimum(col_cnt, col_capk)[bin_parent],
            box_idx=None, exact_idx=pb._EXACT_IDX, pad_vals=pb._REC_PADS)

    chain_timed("L2 count-only", lambda x: jnp.sum(l2c(x)), (l2_in,))

    def l3c(x):
        return select_kernel.select_counts(
            l3_rects, x, bin_of_tile,
            parent_counts=jnp.minimum(bin_counts, bin_capk)[bin_of_tile],
            box_idx=None, exact_idx=pb._EXACT_IDX, pad_vals=pb._REC_PADS)

    chain_timed("L3 count-only", lambda x: jnp.sum(l3c(x)), (bchan,))
    print("col counts:", jnp.sum(jnp.minimum(col_cnt, col_capk)),
          "bin counts:", jnp.sum(jnp.minimum(bin_counts, bin_capk)), flush=True)


if __name__ == "__main__":
    main()
