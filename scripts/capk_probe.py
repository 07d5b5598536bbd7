"""Is the blend kernel SMEM record fetch (capk-proportional) a bottleneck?

Times the fwd/bwd kernels with the SAME counts (same walked entries) at
different capk paddings. If time scales with capk, the per-tile block DMA
— not compute — is the limiter, and count-proportional staging wins.
"""

import sys

import jax
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tpu2dgs  # noqa: E402
from tpu2dgs.raster import binning  # noqa: E402
from tpu2dgs.raster import pallas_backend as pb  # noqa: E402
from tpu2dgs.raster import preprocess as pre  # noqa: E402
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
    rec3, raw_counts, _, _ = jax.jit(lambda rc: pb._bin_records(
        comp.x0, comp.x1, comp.y0, comp.y1, n_vis, rc, nbx, nty,
        8192, 2048, 0))(rec_c)
    base_capk = rec3.shape[2]
    row0 = jnp.zeros((1,), jnp.int32)
    pack_cap = 32768

    for capk in (1024, 2048, 4096):
        if capk <= base_capk:
            r3 = rec3[:, :, :capk]
        else:
            r3 = jnp.pad(rec3, ((0, 0), (0, 0), (0, capk - base_capk)))
        r3 = jax.device_put(r3)
        counts = jnp.minimum(raw_counts, capk).astype(jnp.int32)
        walked = int(jnp.sum(-(-counts // pb.CHUNK) * pb.CHUNK))
        print(f"capk={capk} walked_entries={walked}", flush=True)
        chain_timed(f"fwd capk={capk}", lambda r: jnp.sum(
            pb._blend_call(r, counts, row0, nty=nty, capk=capk,
                           interpret=False)), (r3,))
        out = jax.jit(lambda r: pb._blend_call(
            r, counts, row0, nty=nty, capk=capk, interpret=False))(r3)
        dout = jnp.ones_like(out)
        off = jax.jit(pb._packed_offsets)(counts, out)
        chain_timed(f"bwd capk={capk}", lambda r: jnp.sum(
            pb._blend_bwd_call(r, counts, off, row0, out, dout, nty=nty,
                               capk=capk, pack_cap=pack_cap,
                               interpret=False)[:, 0]), (r3,))


if __name__ == "__main__":
    main()
