"""Fine-grained component timings for the Pallas rasterizer path.

Times each memory-movement and kernel component in isolation at the bench
shape, via the same chained in-graph method as profile_raster.py.

Usage: python scripts/microbench.py [name ...]
Env: MICRO_SCENE=shell uses the opaque-shell workload at its zero-overflow
caps (tile 13440/bin 18048/col 61440) instead of the bench pileup.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tpu2dgs  # noqa: E402
from tpu2dgs.raster import binning  # noqa: E402
from tpu2dgs.raster import pallas_backend as pb  # noqa: E402
from tpu2dgs.raster import preprocess as pre  # noqa: E402
from profile_raster import chain_timed  # noqa: E402


def main():
    tpu2dgs.enable_compilation_cache()
    which = set(sys.argv[1:])

    def want(name):
        return not which or name in which

    w = h = 800
    n = 1 << 17
    from tpu2dgs.eval.synthetic import make_bench_scene, make_shell_scene
    shell = _os.environ.get("MICRO_SCENE") == "shell"
    cam, scene = (make_shell_scene if shell else make_bench_scene)(w, h, n)

    def do_pre(xyz, scaling, rotation, opacity, features):
        return pre.preprocess(
            xyz, scaling, rotation, opacity.reshape(-1), features, cam, w, h,
            3)

    splats = jax.jit(do_pre)(*scene)
    nbx = -(-w // pb.BX)
    nty = -(-h // pb.BY)
    cap, bin_cap, col_cap = ((13440, 18048, 61440) if shell
                             else (2048, 8192, 32768))

    comp = jax.jit(lambda s: binning.compact_visible(s, n))(splats)
    rec_c = jax.jit(
        lambda s: pb.pack_records(s)[comp.perm])(splats)
    n_vis = jnp.minimum(comp.num_visible, n)

    def bin_fn(c, rc):
        return pb._bin_records(
            c.x0, c.x1, c.y0, c.y1, n_vis, rc, nbx, nty, bin_cap, cap, 0,
            col_cap=col_cap)

    rec3, raw_counts, bin_counts, col_counts = jax.jit(bin_fn)(comp, rec_c)
    capk = rec3.shape[2]
    counts = jnp.minimum(raw_counts, capk).astype(jnp.int32)
    row0 = jnp.zeros((1,), jnp.int32)
    t = nbx * nty
    # exact measured pack demand at these caps under GROUP=256 staging
    # (an undersized pack drops group stores and skews the bwd timing)
    pack_cap = 450560 if shell else 149248

    live = int(jnp.sum(counts))
    print(f"tiles={t} capk={capk} live_entries={live} "
          f"padding={1 - live / (t * capk):.2%} "
          f"max_count={int(jnp.max(raw_counts))}", flush=True)

    if want("compact"):
        chain_timed("compact_visible", lambda s: jnp.sum(
            binning.compact_visible(s, n).depth[:128]), (splats,))
    if want("pack"):
        chain_timed("pack_records", lambda s: jnp.sum(
            pb.pack_records(s)[:, 0]), (splats,))
    rec = jax.jit(pb.pack_records)(splats)
    if want("permgather"):
        chain_timed("rec[perm] (131K rows)", lambda r: jnp.sum(
            r[comp.perm][:, 0]), (rec,))
    if want("binning"):
        chain_timed("binning (L1+colgather+L2+L3)", lambda c, rc: jnp.sum(
            bin_fn(c, rc)[1]), (comp, rec_c))

    if want("fwdkernel"):
        chain_timed("fwd kernel only", lambda r3: jnp.sum(
            pb._blend_call(r3, counts, row0, nty=nty, capk=capk,
                           interpret=False)),
            (rec3,))
    out = jax.jit(lambda r3: pb._blend_call(
        r3, counts, row0, nty=nty, capk=capk, interpret=False))(rec3)
    dout = jnp.ones_like(out)
    grp = min(pb.GROUP, capk)
    off = jax.jit(lambda c, o: pb._packed_offsets(c, o, grp))(counts, out)

    if want("bwdkernel"):
        chain_timed("bwd kernel only", lambda r3: jnp.sum(
            pb._blend_bwd_call(r3, counts, off, row0, out, dout, nty=nty,
                               capk=capk, pack_cap=pack_cap,
                               interpret=False)[:, 0]), (rec3,))
    dpack = jax.jit(lambda r3: pb._blend_bwd_call(
        r3, counts, off, row0, out, dout, nty=nty, capk=capk,
        pack_cap=pack_cap, interpret=False))(rec3)

    if want("scatter"):
        def do_scatter(dp):
            flat = dp.reshape(-1, pb.OUTREC)
            idx = flat[:, pb.OUTREC - 1].astype(jnp.int32)
            dsum = jnp.zeros(
                (rec_c.shape[0], pb.OUTREC), rec_c.dtype).at[idx].add(flat)
            return jnp.sum(dsum[:, 0])
        chain_timed(f"scatter-add ({pack_cap // 1000}K packed rows)",
                    do_scatter, (dpack,))
    if want("prebwd"):
        chain_timed("preprocess+pack bwd", lambda *s: jnp.sum(
            jax.grad(lambda *a: jnp.sum(pb.pack_records(do_pre(*a))))(*s)[0]),
            scene)


if __name__ == "__main__":
    main()
