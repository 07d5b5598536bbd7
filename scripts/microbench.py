"""Fine-grained component timings for the Pallas rasterizer path.

Times each memory-movement and kernel component in isolation at the bench
shape, via the same chained in-graph method as profile_raster.py.

Usage: python scripts/microbench.py [name ...]
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tpu2dgs  # noqa: E402
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
    from tpu2dgs.eval.synthetic import make_bench_scene
    cam, scene = make_bench_scene(w, h, n)

    def do_pre(xyz, scaling, rotation, opacity, features):
        return pre.preprocess(
            xyz, scaling, rotation, opacity.reshape(-1), features, cam, w, h,
            3)

    splats = jax.jit(do_pre)(*scene)
    nbx = -(-w // pb.BX)
    nty = -(-h // pb.BY)
    cap, bin_cap = 2048, 8192

    binned = jax.jit(
        lambda s: pb._bin_rect(s, nbx, nty, bin_cap, cap, 0, n))(splats)
    comp, tile_pos = binned[:2]
    counts = jnp.minimum(binned[3], cap).astype(jnp.int32)
    row0 = jnp.zeros((1,), jnp.int32)
    t = nbx * nty
    pack_cap = 32768
    off = pb._column_offsets(counts, nbx, nty)

    live = int(jnp.sum(counts))
    print(f"tiles={t} cap={cap} live_entries={live} "
          f"padding={1 - live / (t * cap):.2%}", flush=True)

    if want("pack"):
        chain_timed("pack_records", lambda s: jnp.sum(
            pb.pack_records(s)[:, 0]), (splats,))
    rec = jax.jit(pb.pack_records)(splats)
    if want("permgather"):
        chain_timed("rec[perm] (131K rows)", lambda r: jnp.sum(
            r[comp.perm][:, 0]), (rec,))
    rec_c = jax.jit(lambda r: r[comp.perm].at[:, 21].set(
        jnp.arange(r.shape[0], dtype=r.dtype)))(rec)
    if want("tilegather"):
        chain_timed("rec_c[tile_pos] (716K rows)", lambda r: jnp.sum(
            r[tile_pos][:, :, 0]), (rec_c,))
    rec3 = jax.jit(lambda r: r[tile_pos])(rec_c)

    if want("fwdkernel"):
        chain_timed("fwd kernel only", lambda r3: jnp.sum(
            pb._blend_call(r3, counts, row0, nty=nty, interpret=False)),
            (rec3,))
    out = jax.jit(lambda r3: pb._blend_call(
        r3, counts, row0, nty=nty, interpret=False))(rec3)
    dout = jnp.ones_like(out)

    if want("bwdkernel"):
        chain_timed("bwd kernel only", lambda r3: jnp.sum(
            pb._blend_bwd_call(r3, counts, off, row0, out, dout, nty=nty,
                               pack_cap=pack_cap,
                               interpret=False)[:, :, 0]), (rec3,))
    dpack = jax.jit(lambda r3: pb._blend_bwd_call(
        r3, counts, off, row0, out, dout, nty=nty, pack_cap=pack_cap,
        interpret=False))(rec3)

    if want("scatter"):
        def do_scatter(dp):
            flat = dp.reshape(-1, pb.REC)
            idx = flat[:, 21].astype(jnp.int32)
            return jnp.sum(jnp.zeros_like(rec_c).at[idx].add(flat)[:, 0])
        chain_timed(f"scatter-add ({nbx * pack_cap // 1000}K packed rows)",
                    do_scatter, (dpack,))
    if want("prebwd"):
        chain_timed("preprocess+pack bwd", lambda *s: jnp.sum(
            jax.grad(lambda *a: jnp.sum(pb.pack_records(do_pre(*a))))(*s)[0]),
            scene)


if __name__ == "__main__":
    main()
