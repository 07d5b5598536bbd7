"""Per-stage timing of the Pallas rasterizer pipeline on the attached TPU.

Usage: python scripts/profile_raster.py [stage ...]
Stages: preprocess binning gather fwd fwdbwd full
Prints ms per stage at the bench shape (800x800, 128K splats).

Timing method: N iterations chained inside ONE jit with
`lax.optimization_barrier` between them, a single scalar readback at the
end. `block_until_ready` does NOT reliably wait through the axon tunnel
(async futures), so per-call host timing wildly misreports; chaining
amortizes the tunnel round-trip to <1ms/iter and stops XLA from
overlapping or CSE-ing iterations.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

import tpu2dgs
from tpu2dgs.raster import pallas_backend as pb
from tpu2dgs.raster import preprocess as pre
from tpu2dgs.raster.api import RasterSettings, render
from tpu2dgs.train import losses


def chain_timed(name, fn, args, iters=10):
    """fn(*args) -> scalar, timed as ms/iter via in-graph chaining."""
    def many(args):
        def body(carry, _):
            a, acc = carry
            s = fn(*a)
            a = lax.optimization_barrier(a)
            acc = acc + s * 1e-30
            (acc,) = lax.optimization_barrier((acc,))
            return (a, acc), None
        (a, acc), _ = lax.scan(body, (args, jnp.float32(0)), None,
                               length=iters)
        return acc + fn(*a) * 0.0
    f = jax.jit(many)
    float(f(args))  # compile + warm
    t0 = time.perf_counter()
    float(f(args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:>32}: {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    tpu2dgs.enable_compilation_cache()
    stages = set(sys.argv[1:]) or {
        "preprocess", "binning", "gather", "fwd", "fwdbwd", "full"}
    w = h = 800
    n = 1 << 17
    settings = RasterSettings(
        width=w, height=h, sh_degree=3, backend="pallas",
        bin_capacity=8192, tile_capacity=2048,
    )
    from tpu2dgs.eval.synthetic import make_bench_scene
    cam, scene = make_bench_scene(w, h, n)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, h, w), jnp.float32)

    def do_pre(xyz, scaling, rotation, opacity, features):
        return pre.preprocess(
            xyz, scaling, rotation, opacity.reshape(-1), features, cam, w, h,
            3)

    splats = jax.jit(do_pre)(*scene)
    if "preprocess" in stages:
        chain_timed("preprocess", lambda *s: jnp.sum(do_pre(*s).depth),
                    scene)

    nbx = -(-w // pb.BX)
    nty = -(-h // pb.BY)
    cap, bin_cap = 2048, 8192

    from tpu2dgs.raster import binning

    comp = jax.jit(lambda s: binning.compact_visible(s, n))(splats)
    rec_c = jax.jit(lambda s: pb.pack_records(s)[comp.perm])(splats)
    n_vis = jnp.minimum(comp.num_visible, n)

    def bin_fn(rc):
        return pb._bin_records(
            comp.x0, comp.x1, comp.y0, comp.y1, n_vis, rc, nbx, nty,
            bin_cap, cap, 0)

    if "binning" in stages:
        chain_timed("binning (compact + selects)", lambda s, rc: jnp.sum(
            bin_fn(rc)[1])
            + jnp.sum(binning.compact_visible(s, n).depth[:1]) * 0.0,
            (splats, rec_c))

    rec3, raw_counts = jax.jit(lambda rc: bin_fn(rc)[:2])(rec_c)
    capk = rec3.shape[2]
    counts = jnp.minimum(raw_counts, capk).astype(jnp.int32)
    row0 = jnp.zeros((1,), jnp.int32)
    pack_cap = 32768
    rec3i = jax.jit(lambda r: jax.lax.bitcast_convert_type(
        r, jnp.int32))(rec3)

    def blend_sum(rc):
        return jnp.sum(pb.blend_tiles(
            rc, rec3i, counts, row0, nbx, nty, capk, pack_cap, False))

    if "fwd" in stages:
        chain_timed("fwd kernel (+gather)", blend_sum, (rec_c,))
    if "fwdbwd" in stages:
        chain_timed("fwd+bwd kernels (+merge)", lambda rc: jnp.sum(
            jax.grad(blend_sum)(rc)), (rec_c,))

    if "full" in stages:
        def loss_fn(*s):
            out = render(cam, settings, *s, bg)
            photo, _ = losses.photometric_loss(out["render"], gt, 0.2)
            ln = losses.normal_consistency_loss(
                out["rend_normal"], out["surf_normal"])
            return photo + 0.05 * ln + 100.0 * jnp.mean(out["rend_dist"])

        chain_timed("full step fwd", loss_fn, scene)
        chain_timed("full step fwd+bwd", lambda *s: jnp.sum(
            jax.grad(loss_fn)(*s)), scene)


if __name__ == "__main__":
    main()
