"""End-to-end training: fit a synthetic splat scene and check convergence.

The integration gate of SURVEY.md §4f scaled down to CI size: ground-truth
images come from the oracle rendering a known splat set; a fresh model (noisy
init) must drive PSNR up by a wide margin within a few hundred steps,
exercising render -> loss -> grad -> Adam -> densify -> prune end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpu2dgs.core import cameras, sh
from tpu2dgs.model import splats as splats_lib
from tpu2dgs.raster.api import RasterSettings, render
from tpu2dgs.raster.api import render as render_op
from tpu2dgs.train import losses
from tpu2dgs.train.loop import TrainConfig, Trainer


def _orbit_camera(uid, angle, radius=3.0, w=48, h=48):
    # Camera orbiting the origin in the xz plane, looking at the origin.
    fwd = np.array([-np.sin(angle), 0.0, -np.cos(angle)])
    pos = -radius * fwd
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right = right / np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    # world->view rotation rows = (right, up, fwd); reference Camera stores
    # R = C2W rotation (cameras.py R convention: R.T used as W2V rotation).
    Rw2v = np.stack([right, true_up, fwd])  # (3,3)
    R = Rw2v.T
    T = -Rw2v @ pos
    return cameras.Camera(
        uid=uid, image_name=f"v{uid}", R=R, T=T,
        fovx=np.pi / 3, fovy=np.pi / 3, width=w, height=h,
    )


def _gt_scene(n=24, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    scaling = np.exp(rng.uniform(-2.0, -1.4, (n, 2))).astype(np.float32)
    rotation = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = rng.uniform(0.6, 0.95, (n,)).astype(np.float32)
    rgb = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    features = np.zeros((n, 16, 3), np.float32)
    features[:, 0, :] = np.asarray(sh.rgb_to_sh(jnp.asarray(rgb)))
    return (jnp.asarray(xyz), jnp.asarray(scaling), jnp.asarray(rotation),
            jnp.asarray(opacity), jnp.asarray(features)), xyz, rgb


def test_training_improves_psnr():
    w = h = 48
    gt_splats, gt_xyz, gt_rgb = _gt_scene()
    cams = [_orbit_camera(i, a, w=w, h=h)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 10, endpoint=False))]
    settings = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                              bin_capacity=256, tile_capacity=256)
    bg = jnp.zeros(3)
    for cam in cams:
        out = render(cam.arrays(), settings, *gt_splats, bg)
        cam.image = np.asarray(out["render"])

    # Noisy init near the ground truth points (same count).
    rng = np.random.default_rng(7)
    init_pts = gt_xyz + rng.normal(scale=0.05, size=gt_xyz.shape).astype(np.float32)
    init_rgb = np.clip(
        gt_rgb + rng.normal(scale=0.2, size=gt_rgb.shape), 0.05, 0.95
    ).astype(np.float32)
    model = splats_lib.create_from_pcd(init_pts, init_rgb, capacity=256)

    cfg = TrainConfig(
        densify_from_iter=50, densify_until_iter=250,
        densification_interval=100, opacity_reset_interval=10_000,
        normal_from_iter=150, dist_from_iter=10_000, lambda_normal=0.01,
    )
    trainer = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        train_cfg=cfg, max_sh_degree=0,
        raster_kwargs=dict(backend="tiled", bin_capacity=256, tile_capacity=256),
        seed=1,
    )

    def avg_psnr():
        vals = []
        for cam in cams[:4]:
            out = trainer.render_view(cam)
            vals.append(float(losses.psnr(out["render"], jnp.asarray(cam.image))))
        return float(np.mean(vals))

    psnr0 = avg_psnr()
    trainer.train(num_iters=300)
    psnr1 = avg_psnr()
    assert np.isfinite(trainer.ema_loss)
    assert psnr1 > psnr0 + 3.5, (psnr0, psnr1)
    assert psnr1 > 23.0, (psnr0, psnr1)


def test_train_step_runs_with_all_loss_terms():
    """Smoke: one jitted step with normal+dist terms active, finite outputs."""
    w = h = 32
    gt_splats, gt_xyz, gt_rgb = _gt_scene(n=12, seed=4)
    cam = _orbit_camera(0, 0.3, w=w, h=h)
    settings = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                              bin_capacity=64, tile_capacity=64)
    out = render(cam.arrays(), settings, *gt_splats, jnp.zeros(3))
    cam.image = np.asarray(out["render"])

    model = splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=64)
    trainer = Trainer(
        model, [cam], w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        train_cfg=TrainConfig(normal_from_iter=0, dist_from_iter=0,
                              lambda_dist=100.0),
        max_sh_degree=0,
        raster_kwargs=dict(backend="tiled", bin_capacity=64, tile_capacity=64),
    )
    trainer.train(num_iters=3)
    p = trainer.model.params
    for leaf in p:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_camera_batch_training():
    """Batched multi-view steps: loss decreases and matches the semantics of
    averaging per-view gradients (TPU-native extension; no reference
    counterpart)."""
    w = h = 32
    gt_splats, gt_xyz, gt_rgb = _gt_scene(n=12, seed=6)
    cams = [_orbit_camera(i, a, w=w, h=h)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 4, endpoint=False))]
    settings = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                              bin_capacity=32, tile_capacity=32)
    for cam in cams:
        cam.image = np.asarray(
            render(cam.arrays(), settings, *gt_splats, jnp.zeros(3))["render"])

    model = splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=32)
    trainer = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        train_cfg=TrainConfig(camera_batch=2, densify_from_iter=10_000,
                              normal_from_iter=10_000, dist_from_iter=10_000),
        max_sh_degree=0,
        raster_kwargs=dict(backend="tiled", bin_capacity=32, tile_capacity=32),
    )
    trainer.train(num_iters=20)
    assert np.isfinite(trainer.ema_loss)
    loss0 = trainer.ema_loss
    trainer.train(num_iters=60)
    assert trainer.ema_loss < loss0


def test_adaptive_capacity_caps():
    """A depth pileup trained with under-provisioned caps must heal
    itself: the Trainer consumes the overflow fractions and raises the
    affected caps at recompile boundaries until overflow is zero, with the
    final render matching a generously-capped render (the reference's
    CUB-sorted per-tile lists never truncate; adaptive growth is this
    framework's equivalent guarantee)."""
    import jax

    from tpu2dgs.train import losses

    w = h = 32
    rng = np.random.default_rng(5)
    n = 96
    # a stack of splats piled along the view ray: worst-case tile depth
    xyz = np.concatenate([
        rng.normal(0, 0.05, (n, 2)),
        np.linspace(1.5, 4.0, n)[:, None]], axis=1).astype(np.float32)
    rgb = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
    gt_model = splats_lib.create_from_pcd(xyz, rgb, capacity=128)
    cams = [_orbit_camera(i, a, w=w, h=h)
            for i, a in enumerate(np.linspace(-0.3, 0.3, 3))]
    p = gt_model.params
    gen = RasterSettings(width=w, height=h, sh_degree=0, backend="tiled",
                         bin_capacity=256, tile_capacity=256)
    for cam in cams:
        out = render_op(cam.arrays(), gen, p.xyz, jnp.exp(p.scaling),
                        p.rotation, jax.nn.sigmoid(p.opacity[:, 0]),
                        splats_lib.features(p), jnp.zeros(3),
                        live=gt_model.live)
        cam.image = np.asarray(out["render"])

    model = splats_lib.create_from_pcd(
        xyz + rng.normal(0, 0.01, xyz.shape).astype(np.float32), rgb,
        capacity=128)
    trainer = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        train_cfg=TrainConfig(densify_from_iter=10_000,
                              normal_from_iter=10_000,
                              dist_from_iter=10_000,
                              densification_interval=4),
        max_sh_degree=0,
        raster_kwargs=dict(backend="tiled", bin_capacity=16,
                           tile_capacity=16),  # deliberately under-capped
    )
    trainer.train(num_iters=24)
    assert trainer.cap_growth_events, "caps never grew"
    assert trainer.raster_kwargs["tile_capacity"] > 16
    # overflow must have converged to zero under the grown caps
    out = trainer.render_view(cams[0])
    assert float(out["tile_overflow_frac"]) == 0.0
    assert float(out["bin_overflow_frac"]) == 0.0
    # and the capped render now matches a generously-capped one
    p = trainer.model.params
    ref = render_op(cams[0].arrays(), gen, p.xyz, jnp.exp(p.scaling),
                    p.rotation, jax.nn.sigmoid(p.opacity[:, 0]),
                    splats_lib.features(p), jnp.zeros(3),
                    live=trainer.model.live)
    psnr_db = float(losses.psnr(jnp.clip(out["render"], 0, 1),
                                jnp.clip(ref["render"], 0, 1)))
    assert psnr_db >= 60.0, psnr_db


def test_camera_batch_demand_maxima_reduce_with_max():
    """With camera_batch > 1 the *_count_max demand metrics must be the
    MAX over the view batch, not the mean — the adaptive cap growth sizes
    caps from the worst view (round-3 advisor finding). Overflow fractions
    stay mean-reduced."""
    from tpu2dgs.model import optim as optim_lib
    from tpu2dgs.train.loop import make_train_step

    w = h = 32
    gt_splats, gt_xyz, gt_rgb = _gt_scene(n=24, seed=11)
    # view 0 sees the cluster; view 1 is panned so the cluster is entirely
    # off-screen — per-view tile_count_max demand differs (24 vs 0).
    near = _orbit_camera(0, 0.0, radius=1.2, w=w, h=h)
    far = cameras.Camera(
        uid=1, image_name="v1", R=near.R,
        T=near.T + np.array([10.0, 0.0, 0.0]),  # pan: cluster off-screen
        fovx=near.fovx, fovy=near.fovy, width=w, height=h)
    settings = RasterSettings(width=w, height=h, sh_degree=0,
                              backend="tiled", bin_capacity=32,
                              tile_capacity=8)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, h, w), jnp.float32)
    model = splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=32)
    adam = optim_lib.init_adam(model.params)

    def run(cams_arr, gts, batch):
        step = make_train_step(settings, optim_lib.OptimConfig(),
                               lambda_dssim=0.2, spatial_lr_scale=1.0,
                               camera_batch=batch)
        _, _, metrics = step(model, adam, cams_arr, gts,
                             bg, jnp.float32(1.0), jnp.float32(0.0),
                             jnp.float32(0.0))
        return metrics

    m_near = run(near.arrays(), gt, 1)
    m_far = run(far.arrays(), gt, 1)
    cam_b = jax.tree.map(lambda *a: jnp.stack(a),
                         near.arrays(), far.arrays())
    m_b = run(cam_b, jnp.stack([gt, gt]), 2)

    per_view = [float(m_near["tile_count_max"]),
                float(m_far["tile_count_max"])]
    assert per_view[0] != per_view[1], per_view  # the views must differ
    assert float(m_b["tile_count_max"]) == max(per_view), (
        float(m_b["tile_count_max"]), per_view)
    # fractions are means over the batch
    fr = [float(m_near["tile_overflow_frac"]),
          float(m_far["tile_overflow_frac"])]
    np.testing.assert_allclose(float(m_b["tile_overflow_frac"]),
                               np.mean(fr), rtol=1e-6)


def test_trainer_grad_pack_default_upper_bounds_backend():
    """Trainer._current_cap's derived grad_pack default must be >= the
    backend's own derivation (round-3 advisor HIGH finding: an UNDER-sized
    trainer view silently corrupts gradients between recompiles). The
    trainer derives from _round128(tile_capacity) while the backend clamps
    capk to the model size first (min(tile_capacity, n)), so the trainer's
    value is an upper bound, not an exact mirror — which is safe: growth
    decisions only ever compare demand against the trainer's (larger)
    view, and the backend never packs more rows than its own cap."""
    from tpu2dgs.raster import pallas_backend as pb

    w = h = 160
    gt_splats, gt_xyz, gt_rgb = _gt_scene(n=12, seed=3)
    cams = [_orbit_camera(0, 0.0, w=w, h=h)]
    cams[0].image = np.zeros((3, h, w), np.float32)
    model = splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=32)
    tc = 192
    trainer = Trainer(
        model, cams, w, h, spatial_lr_scale=1.0, scene_extent=3.0,
        raster_kwargs=dict(backend="pallas", tile_capacity=tc),
        max_sh_degree=0,
    )
    capk = pb._round128(min(tc, 32))  # backend clamps cap to n, rounds 128
    nbx = -(-w // pb.BX)
    expected = 16 * pb._round128(tc) * nbx
    assert trainer._current_cap("grad_pack_capacity") == expected
    # and the backend's own derivation from settings agrees in form:
    # 0 -> 16 * _round128(capk) * nbx (capk after its n-clamp)
    assert pb._round128(16 * capk * nbx) <= expected


def test_gt_cache_budget_matches_prestaged():
    """A gt_cache_mb budget too small to pre-stage must flip the Trainer to
    host-resident GT with async prefetch — and train BIT-IDENTICALLY to the
    pre-staged path (same seeds => same camera order => same steps)."""
    w = h = 32
    gt_splats, gt_xyz, gt_rgb = _gt_scene(n=12, seed=5)
    cams = [_orbit_camera(i, a, w=w, h=h)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 6,
                                              endpoint=False))]
    settings = RasterSettings(width=w, height=h, sh_degree=0,
                              backend="tiled", bin_capacity=128,
                              tile_capacity=128)
    bg = jnp.zeros(3)
    for cam in cams:
        cam.image = np.asarray(
            render(cam.arrays(), settings, *gt_splats, bg)["render"])

    def train_one(budget):
        model = splats_lib.create_from_pcd(gt_xyz, gt_rgb, capacity=16)
        cfg = TrainConfig(densify_from_iter=10 ** 9,
                          opacity_reset_interval=10 ** 9)
        tr = Trainer(model, cams, w, h, spatial_lr_scale=1.0,
                     scene_extent=2.0, train_cfg=cfg, max_sh_degree=0,
                     raster_kwargs=dict(backend="tiled", bin_capacity=128,
                                        tile_capacity=128),
                     seed=3, gt_cache_mb=budget)
        tr.train(num_iters=25)
        return tr

    tr_pre = train_one(None)
    assert tr_pre.gt_prestaged
    tr_cap = train_one(0.001)  # 6 x 12 KB images >> 1 KB budget
    assert not tr_cap.gt_prestaged
    np.testing.assert_array_equal(np.asarray(tr_pre.model.params.xyz),
                                  np.asarray(tr_cap.model.params.xyz))
    np.testing.assert_array_equal(np.asarray(tr_pre.model.params.opacity),
                                  np.asarray(tr_cap.model.params.opacity))
