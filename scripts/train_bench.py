"""End-to-end training throughput on the attached TPU.

Production-shape steady state: a textured surfel SHELL (opaque surfaces
that saturate transmittance early, like trained real scenes) at full
resolution and production splat count, full Trainer step (render fwd+bwd
+ Adam + densify stats) with the pallas backend. Densification/growth are
off so the measurement is the steady-state per-iteration cost; the warmup
window lets the Trainer's adaptive capacity caps settle first (growth
events are reported — a settled run has none inside the timed window).

A uniform random cloud is deliberately NOT used here: bench.py covers
that transparency-pileup regime with fidelity-checked fixed caps. (The
shell is NOT the milder workload — its silhouette tiles pile up
near-tangent disks to a deeper true demand than the pileup's: tile 8272
vs 4961 at 800px/128K, scripts/fidelity_probe.py — which is exactly why
this bench runs the adaptive caps the production Trainer runs.)

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
from tpu2dgs.train.loop import TrainConfig, Trainer  # noqa: E402


def shell_scene(n, rng):
    """Textured surfel shell: opaque surfaces, production-like depth
    complexity (same family as scripts/soak_train.py's ground truth)."""
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    rr = 0.8 + 0.1 * np.sin(4 * theta) * np.cos(3 * phi)
    xyz = np.stack([rr * np.sin(theta) * np.cos(phi),
                    rr * np.cos(theta),
                    rr * np.sin(theta) * np.sin(phi)], -1).astype(np.float32)
    rgb = (0.5 + 0.45 * np.stack([np.sin(3 * theta), np.cos(2 * phi),
                                  np.sin(theta + phi)], -1)).astype(np.float32)
    return xyz, np.clip(rgb, 0.05, 0.95)


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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    w = h = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    n = 1 << (int(sys.argv[3]) if len(sys.argv) > 3 else 17)

    rng = np.random.default_rng(0)
    cams = []
    for i in range(24):
        cam = orbit(i, 24, 2.6, w, h)
        cam.image = rng.uniform(0, 1, (3, h, w)).astype(np.float32)
        cams.append(cam)

    pts, cols = shell_scene(n, rng)
    model = splats_lib.create_from_pcd(pts, cols, capacity=n)

    cfg = TrainConfig(
        densify_from_iter=10 ** 9,  # steady-state step timing (no growth)
        opacity_reset_interval=10 ** 9,
        normal_from_iter=0, dist_from_iter=0,
        lambda_normal=0.05, lambda_dist=100.0,
        loss_sync_interval=50,
    )
    tr = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=2.6,
        train_cfg=cfg, max_sh_degree=3,
        raster_kwargs=dict(backend="pallas", bin_capacity=8192,
                           tile_capacity=2048, grad_pack_capacity=0),
        seed=0,
    )

    # Warm until the adaptive caps settle: run past at least two
    # densification-interval boundaries (cap growth triggers there) and
    # re-warm after any growth event recompile.
    settle = 0
    while True:
        before = len(tr.cap_growth_events)
        tr.train(num_iters=2 * cfg.densification_interval + 10)
        settle += 2 * cfg.densification_interval + 10
        if len(tr.cap_growth_events) == before:
            break
    if tr.cap_growth_events:
        print(f"cap growth during warmup ({settle} iters): "
              f"{tr.cap_growth_events}")

    events_before = len(tr.cap_growth_events)
    t0 = time.perf_counter()
    tr.train(num_iters=iters)
    # force completion
    jax.block_until_ready(tr.model.params.xyz)
    float(jnp.sum(tr.model.params.xyz))
    dt = time.perf_counter() - t0
    it_s = iters / dt
    assert len(tr.cap_growth_events) == events_before, (
        "cap growth inside the timed window", tr.cap_growth_events)
    print(f"train_bench: {w}x{h}, {n} splats (shell), {iters} iters: "
          f"{it_s:.2f} it/s  ({it_s * w * h / 1e6:.2f} Mpix/s)")


if __name__ == "__main__":
    main()
