"""End-to-end training throughput on the attached TPU.

Synthetic production-shape run: W x H images, N-splat model, full Trainer
step (render fwd+bwd + Adam + densify stats) with the pallas backend.
Reports it/s and Mpix/s after a warmup window.

Usage: python scripts/train_bench.py [iters] [W] [N_log2]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tpu2dgs  # noqa: E402
from tpu2dgs.core import cameras  # noqa: E402
from tpu2dgs.model import splats as splats_lib  # noqa: E402
from tpu2dgs.raster.api import RasterSettings, render  # noqa: E402
from tpu2dgs.train.loop import TrainConfig, Trainer  # noqa: E402


def main():
    tpu2dgs.enable_compilation_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    w = h = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    n = 1 << (int(sys.argv[3]) if len(sys.argv) > 3 else 17)

    rng = np.random.default_rng(0)
    cams = []
    for i in range(24):
        a = 2 * np.pi * i / 24
        fwd = np.array([-np.sin(a), 0.0, -np.cos(a)])
        pos = -2.5 * fwd
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        Rw2v = np.stack([right, true_up, fwd])
        cam = cameras.Camera(
            uid=i, image_name=f"v{i}", R=Rw2v.T, T=-Rw2v @ pos,
            fovx=np.pi / 3, fovy=np.pi / 3, width=w, height=h)
        cam.image = rng.uniform(0, 1, (3, h, w)).astype(np.float32)
        cams.append(cam)

    pts = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    model = splats_lib.create_from_pcd(pts, cols, capacity=n)

    cfg = TrainConfig(
        densify_from_iter=10 ** 9,  # steady-state step timing (no growth)
        opacity_reset_interval=10 ** 9,
        normal_from_iter=0, dist_from_iter=0,
        lambda_normal=0.05, lambda_dist=100.0,
        loss_sync_interval=50,
    )
    tr = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        train_cfg=cfg, max_sh_degree=3,
        raster_kwargs=dict(backend="pallas", bin_capacity=8192,
                           tile_capacity=2048, grad_pack_capacity=0),
        seed=0,
    )

    tr.train(num_iters=20)  # compile + warm
    t0 = time.perf_counter()
    tr.train(num_iters=iters)
    # force completion
    jax.block_until_ready(tr.model.params.xyz)
    float(jnp.sum(tr.model.params.xyz))
    dt = time.perf_counter() - t0
    it_s = iters / dt
    print(f"train_bench: {w}x{h}, {n} splats, {iters} iters: "
          f"{it_s:.2f} it/s  ({it_s * w * h / 1e6:.2f} Mpix/s)")


if __name__ == "__main__":
    main()
