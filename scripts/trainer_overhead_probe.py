"""Isolate Trainer host overhead: raw step_fn loop vs Trainer.train.

Same model/settings as train_bench; reports ms/iter for (a) the jitted
step_fn called in a tight loop with one terminal block, (b) Trainer.train.
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import tpu2dgs  # noqa: E402
from tpu2dgs.model import splats as splats_lib  # noqa: E402
from tpu2dgs.train.loop import TrainConfig, Trainer  # noqa: E402


def build():
    from tpu2dgs.core import cameras
    rng = np.random.default_rng(0)
    w = h = 800
    n = 1 << 17
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
        densify_from_iter=10 ** 9, opacity_reset_interval=10 ** 9,
        normal_from_iter=0, dist_from_iter=0,
        lambda_normal=0.05, lambda_dist=100.0, loss_sync_interval=50)
    tr = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        train_cfg=cfg, max_sh_degree=3,
        raster_kwargs=dict(backend="pallas", bin_capacity=8192,
                           tile_capacity=2048, grad_pack_capacity=0),
        seed=0)
    return tr


def main():
    tpu2dgs.enable_compilation_cache()
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    tr = build()

    # Settle the adaptive caps FIRST: cap growth clears the step-fn cache,
    # and a recompile inside a timed window turns 40 ms/iter into
    # 1400 ms/iter of pure compile (measured round 5) — the comparison is
    # only honest once no growth events can fire mid-window.
    while True:
        before = len(tr.cap_growth_events)
        tr.train(num_iters=2 * tr.cfg.densification_interval + 10)
        if len(tr.cap_growth_events) == before:
            break
    print("cap growth during settle:", tr.cap_growth_events)

    # ---- (a) raw step_fn loop ----
    step_fn = tr._get_step_fn()
    cam0 = (tr._cam_stacked, tr._idx_scalars[0])
    gt0 = tr._gt_images[0]
    bg = tr.bg
    model, adam = tr.model, tr.adam
    lam_n = jnp.float32(0.05)
    lam_d = jnp.float32(100.0)
    for _ in range(10):  # warm
        model, adam, metrics = step_fn(
            model, adam, cam0, gt0, bg, jnp.float32(1.0), lam_n, lam_d)
    float(metrics["loss"])  # scalar readback: block_until_ready on the
    # axon tunnel intermittently returns early (see bench.py)
    t0 = time.perf_counter()
    for i in range(iters):
        model, adam, metrics = step_fn(
            model, adam, cam0, gt0, bg, jnp.float32(i), lam_n, lam_d)
    float(metrics["loss"])
    dt_raw = (time.perf_counter() - t0) / iters * 1e3

    # (a2) raw loop but rotating cameras like the Trainer does
    t0 = time.perf_counter()
    for i in range(iters):
        ci = i % len(tr._cam_arrays)
        model, adam, metrics = step_fn(
            model, adam, (tr._cam_stacked, tr._idx_scalars[ci]),
            tr._gt_images[ci], bg, jnp.float32(i), lam_n, lam_d)
    float(metrics["loss"])
    dt_rot = (time.perf_counter() - t0) / iters * 1e3

    # (a3/a4) isolate WHICH rotating operand costs: cams only / gt only
    t0 = time.perf_counter()
    for i in range(iters):
        ci = i % len(tr._cam_arrays)
        model, adam, metrics = step_fn(
            model, adam, (tr._cam_stacked, tr._idx_scalars[ci]), gt0, bg,
            jnp.float32(i), lam_n, lam_d)
    float(metrics["loss"])
    dt_rc = (time.perf_counter() - t0) / iters * 1e3
    t0 = time.perf_counter()
    for i in range(iters):
        ci = i % len(tr._cam_arrays)
        model, adam, metrics = step_fn(
            model, adam, cam0, tr._gt_images[ci], bg,
            jnp.float32(i), lam_n, lam_d)
    float(metrics["loss"])
    dt_rg = (time.perf_counter() - t0) / iters * 1e3

    # ---- (b) Trainer loop ----
    tr.train(num_iters=20)  # warm its own path
    t0 = time.perf_counter()
    tr.train(num_iters=iters)
    jax.block_until_ready(tr.model.params.xyz)
    float(jnp.sum(tr.model.params.xyz))
    dt_tr = (time.perf_counter() - t0) / iters * 1e3

    # (b2) Trainer loop with the periodic loss host-sync disabled
    tr.cfg = dataclasses.replace(tr.cfg, loss_sync_interval=10 ** 9)
    t0 = time.perf_counter()
    tr.train(num_iters=iters)
    jax.block_until_ready(tr.model.params.xyz)
    float(jnp.sum(tr.model.params.xyz))
    dt_ns = (time.perf_counter() - t0) / iters * 1e3

    print("cap growth events:", tr.cap_growth_events)
    print("final raster_kwargs:", tr.raster_kwargs)
    print(f"raw step_fn loop:          {dt_raw:8.2f} ms/iter")
    print(f"raw loop, rotating cams:   {dt_rot:8.2f} ms/iter")
    print(f"raw, rotating cams only:   {dt_rc:8.2f} ms/iter")
    print(f"raw, rotating gt only:     {dt_rg:8.2f} ms/iter")
    print(f"Trainer.train:             {dt_tr:8.2f} ms/iter")
    print(f"Trainer.train (no sync):   {dt_ns:8.2f} ms/iter")


if __name__ == "__main__":
    main()
