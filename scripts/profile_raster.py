"""Per-stage timing of the Pallas rasterizer pipeline on the attached TPU.

Usage: python scripts/profile_raster.py [stage ...]
Stages: preprocess sort coarse fine gather fwd bwd full
Prints ms per stage at the bench shape (800x800, 128K splats).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu2dgs.core import cameras
from tpu2dgs.raster import binning
from tpu2dgs.raster import pallas_backend as pb
from tpu2dgs.raster import preprocess as pre
from tpu2dgs.raster.api import RasterSettings, render
from tpu2dgs.train import losses


def timed(name, fn, *args, iters=10):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:>28}: {dt:8.2f} ms")
    return out


def main():
    stages = set(sys.argv[1:]) or {
        "preprocess", "sort", "coarse", "fine", "gather", "fwd", "bwd",
        "full"}
    w = h = 800
    n = 1 << 17
    settings = RasterSettings(
        width=w, height=h, sh_degree=3, backend="pallas",
        bin_capacity=8192, tile_capacity=2048,
    )
    cam = cameras.Camera(
        uid=0, image_name="bench", R=np.eye(3), T=np.zeros(3),
        fovx=np.pi / 2, fovy=np.pi / 2, width=w, height=h,
    ).arrays()
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1.0, 1.0, (n, 3)) * [1, 1, 0.5] + [0, 0, 2.5]
    scene = tuple(
        jnp.asarray(a, jnp.float32)
        for a in (
            xyz,
            np.exp(rng.uniform(-5.0, -3.5, (n, 2))),
            rng.normal(size=(n, 4)),
            rng.uniform(0.2, 0.95, (n,)),
            rng.normal(size=(n, 16, 3)) * 0.3,
        )
    )
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, h, w), jnp.float32)

    def do_pre(xyz, scaling, rotation, opacity, features):
        return pre.preprocess(
            xyz, scaling, rotation, opacity.reshape(-1), features, cam, w, h,
            3)

    splats = timed("preprocess", do_pre, *scene) if "preprocess" in stages \
        else jax.jit(do_pre)(*scene)

    nbx = -(-w // pb.BX)
    nty = -(-h // pb.BY)
    cap, bin_cap = 2048, 8192

    if "sort" in stages:
        timed("compact_visible", lambda s: binning.compact_visible(s, n),
              splats)
    comp = jax.jit(lambda s: binning.compact_visible(s, n))(splats)

    cby = 4
    nby_c = -(-nty // cby)
    nb = nby_c * nbx
    bix = jnp.arange(nb, dtype=jnp.float32) % nbx
    biy = jnp.arange(nb, dtype=jnp.float32) // nbx
    bx0 = bix * pb.BX
    bx1 = bx0 + (pb.BX - 1)
    by0 = biy * (pb.BY * cby)
    by1 = by0 + (pb.BY * cby - 1)

    if "coarse" in stages:
        timed("select_coarse",
              lambda c: binning.select_coarse(c, bx0, bx1, by0, by1, bin_cap),
              comp)
    cand_pos, cand_valid, _ = jax.jit(
        lambda c: binning.select_coarse(c, bx0, bx1, by0, by1, bin_cap))(comp)

    t = nty * nbx
    tix = jnp.arange(t, dtype=jnp.int32) % nbx
    tiy = jnp.arange(t, dtype=jnp.int32) // nbx
    bin_of_tile = (tiy // cby) * nbx + tix
    tx0 = (tix * pb.BX).astype(jnp.float32)
    tx1 = tx0 + (pb.BX - 1)
    ty0 = (tiy * pb.BY).astype(jnp.float32)
    ty1 = ty0 + (pb.BY - 1)

    if "fine" in stages:
        timed("select_fine",
              lambda c, cp, cv: binning.select_fine(
                  c, cp, cv, bin_of_tile, tx0, tx1, ty0, ty1, cap),
              comp, cand_pos, cand_valid)
    tile_pos, tile_valid, raw_counts = jax.jit(
        lambda c, cp, cv: binning.select_fine(
            c, cp, cv, bin_of_tile, tx0, tx1, ty0, ty1, cap))(
        comp, cand_pos, cand_valid)
    counts = jnp.minimum(raw_counts, cap).astype(jnp.int32)

    if "gather" in stages:
        timed("pack+gather",
              lambda s, tp: pb.pack_records(s)[comp.perm][tp],
              splats, tile_pos)
    rec3 = jax.jit(lambda s, tp: pb.pack_records(s)[comp.perm][tp])(
        splats, tile_pos)

    row0 = jnp.zeros((1,), jnp.int32)
    if "fwd" in stages:
        timed("fwd kernel",
              lambda r, c: pb.blend_tiles(r, c, row0, nbx, nty, False),
              rec3, counts)

    if "bwd" in stages:
        out = jax.jit(
            lambda r, c: pb._blend_call(r, c, row0, nbx=nbx, nty=nty,
                                        interpret=False))(rec3, counts)
        dout = jnp.ones_like(out)
        timed("bwd kernel",
              lambda r, c, o, d: pb._blend_bwd_call(
                  r, c, row0, o, d, nbx=nbx, interpret=False),
              rec3, counts, out, dout)

    if "full" in stages:
        def loss_fn(xyz, scaling, rotation, opacity, features):
            out = render(cam, settings, xyz, scaling, rotation, opacity,
                         features, bg)
            photo, _ = losses.photometric_loss(out["render"], gt, 0.2)
            ln = losses.normal_consistency_loss(
                out["rend_normal"], out["surf_normal"])
            ld = losses.distortion_loss(out["rend_dist"])
            return photo + 0.05 * ln + 100.0 * ld

        timed("full fwd+bwd", jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)),
              *scene)


if __name__ == "__main__":
    main()
