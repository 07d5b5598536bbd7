"""Production-shape training soak on the attached TPU.

Synthetic orbit scene at full resolution with densification + capacity
growth ON: verifies convergence, throughput stability, and that the
capacity/overflow counters stay sane as the model grows.

Usage: python scripts/soak_train.py [iters] [W]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tpu2dgs  # noqa: E402
from tpu2dgs.core import cameras, sh  # noqa: E402
from tpu2dgs.model import splats as splats_lib  # noqa: E402
from tpu2dgs.raster.api import RasterSettings, render  # noqa: E402
from tpu2dgs.train import losses  # noqa: E402
from tpu2dgs.train.loop import TrainConfig, Trainer  # noqa: E402


def orbit(i, n, radius, w, h):
    a = 2 * np.pi * i / n
    fwd = np.array([-np.sin(a), 0.12 * np.sin(3 * a), -np.cos(a)])
    fwd /= np.linalg.norm(fwd)
    pos = -radius * fwd
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    tu = np.cross(fwd, right)
    Rw2v = np.stack([right, tu, fwd])
    return cameras.Camera(
        uid=i, image_name=f"v{i}", R=Rw2v.T, T=-Rw2v @ pos,
        fovx=np.pi / 3, fovy=np.pi / 3, width=w, height=h)


def main():
    tpu2dgs.enable_compilation_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    w = h = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    rng = np.random.default_rng(0)
    # GT: a textured shell of surfels (production-like depth complexity).
    n_gt = 40000
    theta = rng.uniform(0, np.pi, n_gt)
    phi = rng.uniform(0, 2 * np.pi, n_gt)
    rr = 0.8 + 0.1 * np.sin(4 * theta) * np.cos(3 * phi)
    xyz = np.stack([rr * np.sin(theta) * np.cos(phi),
                    rr * np.cos(theta),
                    rr * np.sin(theta) * np.sin(phi)], -1).astype(np.float32)
    scaling = np.full((n_gt, 2), 0.02, np.float32)
    rotation = rng.normal(size=(n_gt, 4)).astype(np.float32)
    opacity = rng.uniform(0.7, 0.95, (n_gt,)).astype(np.float32)
    rgb = (0.5 + 0.45 * np.stack([np.sin(3 * theta), np.cos(2 * phi),
                                  np.sin(theta + phi)], -1)).astype(np.float32)
    feats = np.zeros((n_gt, 16, 3), np.float32)
    feats[:, 0] = np.asarray(sh.rgb_to_sh(jnp.asarray(np.clip(rgb, 0, 1))))
    gt_splats = tuple(jnp.asarray(a) for a in
                      (xyz, scaling, rotation, opacity, feats))

    st = RasterSettings(width=w, height=h, sh_degree=0, backend="pallas",
                        bin_capacity=8192, tile_capacity=2048)
    cams = [orbit(i, 40, 2.6, w, h) for i in range(40)]
    for c in cams:
        out = render(c.arrays(), st, *gt_splats, jnp.zeros(3))
        c.image = np.asarray(out["render"])
    print("GT rendered", flush=True)

    # Sparse noisy init.
    sel = rng.choice(n_gt, 8000, replace=False)
    init_pts = xyz[sel] + rng.normal(0, 0.02, (8000, 3)).astype(np.float32)
    model = splats_lib.create_from_pcd(
        init_pts, np.clip(rgb[sel], 0.05, 0.95), capacity=16384)

    cfg = TrainConfig(
        densify_from_iter=500, densify_until_iter=int(iters * 0.8),
        densification_interval=100, opacity_reset_interval=3000,
        normal_from_iter=700, dist_from_iter=300,
        lambda_normal=0.05, lambda_dist=100.0, loss_sync_interval=50,
    )
    tr = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=2.6,
        train_cfg=cfg, max_sh_degree=0, seed=0, max_capacity=1 << 20,
        raster_kwargs=dict(backend="pallas", bin_capacity=8192,
                           tile_capacity=2048, grad_pack_capacity=0),
        log_fn=None,
    )

    def psnr4():
        vals = []
        for c in cams[:4]:
            out = tr.render_view(c)
            vals.append(float(losses.psnr(jnp.clip(out["render"], 0, 1),
                                          jnp.asarray(c.image))))
        return float(np.mean(vals))

    p0 = psnr4()
    t0 = time.perf_counter()
    chunk = 500
    done = 0
    while done < iters:
        tr.train(num_iters=min(chunk, iters - done))
        done += chunk
        dt = time.perf_counter() - t0
        # overflow counters from one render
        out = tr.render_view(cams[0])
        ovf = {k: round(float(out[k]), 4) for k in
               ("tile_overflow_frac", "bin_overflow_frac",
                "col_overflow_frac", "grad_pack_overflow_frac")
               if k in out}
        print(f"[{done}] psnr4={psnr4():.2f} live={int(tr.model.num_live())}"
              f" cap={tr.model.capacity} {done/dt:.1f} it/s ovf={ovf}",
              flush=True)
    print(f"soak done: PSNR {p0:.2f} -> {psnr4():.2f}, "
          f"live={int(tr.model.num_live())}, cap={tr.model.capacity}",
          flush=True)


if __name__ == "__main__":
    main()
