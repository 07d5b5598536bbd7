"""Oracle rasterizer: analytic single-splat cases + gradient checks."""

import contextlib


@contextlib.contextmanager
def _x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)

import jax
import jax.numpy as jnp
import numpy as np

from tpu2dgs.core import cameras, sh, transforms
from tpu2dgs.raster.api import RasterSettings, render


def _cam(w=64, h=64, fov=np.pi / 2):
    return cameras.Camera(
        uid=0, image_name="t", R=np.eye(3), T=np.zeros(3),
        fovx=fov, fovy=fov, width=w, height=h,
    ).arrays()


def _settings(w=64, h=64, **kw):
    kw.setdefault("backend", "oracle")
    kw.setdefault("sh_degree", 0)
    return RasterSettings(width=w, height=h, **kw)


def _single_splat(xyz, log_s=(0.125, 0.125), rgb=(1.0, 0.0, 0.0), opa=0.9,
                  quat=(1.0, 0.0, 0.0, 0.0)):
    n = 1
    xyz = jnp.array([xyz], jnp.float32)
    scaling = jnp.array([log_s], jnp.float32)  # already activated scales
    rotation = jnp.array([quat], jnp.float32)
    opacity = jnp.array([opa], jnp.float32)
    features = jnp.zeros((n, 16, 3)).at[:, 0, :].set(
        sh.rgb_to_sh(jnp.array([rgb], jnp.float32))
    )
    return xyz, scaling, rotation, opacity, features


def test_facing_disk_alpha_profile():
    w = h = 64
    cam = _cam(w, h)
    s = 0.125  # world sigma; focal = 32, z = 2 -> 2px screen sigma
    xyz, scaling, rotation, opacity, features = _single_splat((0.0, 0.0, 2.0), (s, s))
    out = render(cam, _settings(w, h), xyz, scaling, rotation, opacity, features,
                 bg_color=jnp.zeros(3))

    img = np.asarray(out["render"])  # (3,H,W)
    alpha = np.asarray(out["rend_alpha"])[0]
    cx = (w - 1) / 2.0
    # Analytic alpha: sigma_px = focal * s / z = 32*0.125/2 = 2
    for px, py in [(31, 31), (33, 31), (35, 35)]:
        d2 = ((px - cx) / 2.0) ** 2 + ((py - cx) / 2.0) ** 2
        rho2d = 2.0 * ((px - cx) ** 2 + (py - cx) ** 2)
        rho = min(d2, rho2d)
        expected = 0.9 * np.exp(-0.5 * rho)
        if expected < 1 / 255.0:
            expected = 0.0
        np.testing.assert_allclose(alpha[py, px], expected, atol=2e-3)
        np.testing.assert_allclose(img[0, py, px], expected, atol=2e-3)
        assert img[1, py, px] < 1e-6

    # Depth: plane perpendicular to view at z=2.
    depth = np.asarray(out["depth_expected"])[0]
    np.testing.assert_allclose(depth[31, 31], 2.0, atol=1e-4)
    med = np.asarray(out["depth_median"])[0]
    np.testing.assert_allclose(med[31, 31], 2.0, atol=1e-4)

    # World normal: surfel normal is +/- z; flipped toward camera -> -z.
    nrm = np.asarray(out["rend_normal"])  # (3,H,W), alpha-weighted
    np.testing.assert_allclose(nrm[2, 31, 31], -alpha[31, 31], atol=2e-3)

    # Visibility & radius.
    assert np.asarray(out["visibility_filter"])[0]
    assert int(out["radii"][0]) >= 6  # 3 sigma * 2px
    np.testing.assert_allclose(np.asarray(out["mean2d"])[0], [31.5, 31.5], atol=1e-4)


def test_tilted_disk_depth_gradient_direction():
    w = h = 64
    cam = _cam(w, h)
    # Tilt 45 degrees about x: top of the disk farther or closer.
    ang = np.pi / 4
    quat = (np.cos(ang / 2), np.sin(ang / 2), 0.0, 0.0)
    xyz, scaling, rotation, opacity, features = _single_splat(
        (0.0, 0.0, 2.0), (0.4, 0.4), opa=0.99, quat=quat
    )
    out = render(cam, _settings(w, h), xyz, scaling, rotation, opacity, features,
                 bg_color=jnp.zeros(3))
    depth = np.asarray(out["depth_expected"])[0]
    # Projected center sits at (31.5, 31.5); depth is linear in y on the
    # tilted plane, so the average of the two straddling pixels is exact.
    np.testing.assert_allclose((depth[31, 31] + depth[32, 31]) / 2, 2.0, atol=1e-3)
    # Depth varies along y, constant along x.
    assert abs(depth[37, 31] - depth[25, 31]) > 0.05
    np.testing.assert_allclose(depth[31, 25], depth[31, 37], atol=1e-4)


def test_behind_camera_culled():
    cam = _cam()
    xyz, scaling, rotation, opacity, features = _single_splat((0.0, 0.0, -2.0))
    out = render(cam, _settings(), xyz, scaling, rotation, opacity, features,
                 bg_color=jnp.zeros(3))
    assert not bool(out["visibility_filter"][0])
    assert float(jnp.sum(out["rend_alpha"])) == 0.0


def test_background_composited():
    cam = _cam()
    xyz, scaling, rotation, opacity, features = _single_splat((0.0, 0.0, 2.0), opa=0.5)
    bg = jnp.array([0.0, 0.0, 1.0])
    out = render(cam, _settings(), xyz, scaling, rotation, opacity, features, bg_color=bg)
    img = np.asarray(out["render"])
    # Far corner: pure background.
    np.testing.assert_allclose(img[:, 0, 0], [0, 0, 1], atol=1e-5)
    # Center: red over blue.
    a = np.asarray(out["rend_alpha"])[0, 31, 31]
    np.testing.assert_allclose(img[:, 31, 31], [a, 0.0, 1 - a], atol=1e-5)


def test_two_splats_occlusion_order():
    w = h = 32
    cam = _cam(w, h)
    xyz = jnp.array([[0.0, 0.0, 4.0], [0.0, 0.0, 2.0]], jnp.float32)  # far first
    scaling = jnp.array([[0.5, 0.5], [0.25, 0.25]], jnp.float32)
    rotation = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (2, 1))
    opacity = jnp.array([0.9, 0.9], jnp.float32)
    rgbs = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    features = jnp.zeros((2, 16, 3)).at[:, 0, :].set(sh.rgb_to_sh(rgbs))
    out = render(cam, _settings(w, h), xyz, scaling, rotation, opacity, features,
                 bg_color=jnp.zeros(3))
    img = np.asarray(out["render"])
    c = (w - 1) // 2
    # Near red splat dominates the center (front-to-back).
    assert img[0, c, c] > 0.8
    # Far green splat only sees the residual transmittance (~0.15 * alpha).
    assert img[1, c, c] < 0.15
    # Median depth at center = near splat depth.
    np.testing.assert_allclose(np.asarray(out["depth_median"])[0, c, c], 2.0, atol=1e-3)
    # Distortion is positive where both splats overlap (two depths mix).
    assert float(out["rend_dist"][0, c, c]) > 1e-6


def _random_scene(n=12, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.uniform(-0.6, 0.6, (n, 3)) + [0, 0, 2.5], jnp.float32)
    scaling = jnp.asarray(np.exp(rng.uniform(-2.2, -1.2, (n, 2))), jnp.float32)
    rotation = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opacity = jnp.asarray(rng.uniform(0.3, 0.7, (n,)), jnp.float32)
    features = jnp.asarray(rng.normal(size=(n, 16, 3)) * 0.3, jnp.float32)
    return xyz, scaling, rotation, opacity, features


def test_gradients_match_finite_differences():
    """FD check of the rasterizer's differentiable paths.

    Gradients through opacity / SH features are exact end-to-end. xyz,
    scaling and rotation additionally feed the *intentionally*
    non-differentiable low-pass filter center (the reference removed that
    gradient, README.md:118) — their tmat path is FD-checked at the blend
    stage in test_blend_stage_gradients instead.
    """
    w = h = 24
    cam = _cam(w, h)
    settings = _settings(w, h, sh_degree=3)

    with _x64():
        cam64 = jax.tree.map(lambda x: x.astype(jnp.float64), cam)
        args = tuple(
            jnp.asarray(np.asarray(a), jnp.float64) for a in _random_scene()
        )
        bg = jnp.array([0.1, 0.2, 0.3], jnp.float64)

        def loss(xyz, scaling, rotation, opacity, features):
            out = render(cam64, settings, xyz, scaling, rotation, opacity, features, bg)
            return (
                jnp.sum(out["render"] ** 2)
                + jnp.sum(out["rend_dist"])
                + 0.1 * jnp.sum(out["surf_depth"])
                + 0.1 * jnp.sum(out["rend_normal"])
            )

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)

        rng = np.random.default_rng(7)
        eps = 1e-5
        for i in (3, 4):  # opacity, features: exact paths
            v = [jnp.zeros_like(a) for a in args]
            v[i] = jnp.asarray(rng.normal(size=args[i].shape), jnp.float64)
            f_plus = loss(*[a + eps * d for a, d in zip(args, v)])
            f_minus = loss(*[a - eps * d for a, d in zip(args, v)])
            fd = (f_plus - f_minus) / (2 * eps)
            analytic = sum(jnp.sum(g * d) for g, d in zip(grads, v))
            np.testing.assert_allclose(analytic, fd, rtol=1e-3, atol=1e-4)


def test_blend_stage_gradients():
    """FD check of the compositing stage itself (tmat/color/opacity/normal),
    with the (non-differentiable by design) filter centers held constant."""
    from tpu2dgs.raster import blend
    from tpu2dgs.raster import preprocess as pre

    w = h = 16
    cam = _cam(w, h)

    with _x64():
        cam64 = jax.tree.map(lambda x: x.astype(jnp.float64), cam)
        args = tuple(jnp.asarray(np.asarray(a), jnp.float64) for a in _random_scene(n=8, seed=5))
        xyz, scaling, rotation, opacity, features = args
        splats = pre.preprocess(
            xyz, scaling, rotation, opacity, features, cam64, w, h, sh_degree=3
        )
        fc = jax.lax.stop_gradient(splats.filter_center)
        ys, xs = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")
        px = jnp.asarray(xs.reshape(-1))
        py = jnp.asarray(ys.reshape(-1))

        def loss(tmat, color, opa, normal):
            state = blend.init_state(w * h, dtype=jnp.float64)
            alpha, depth, contrib = blend.splat_pixel_response(tmat, fc, opa, px, py)
            state = blend.blend_chunk(state, alpha, depth, contrib, color, normal)
            col, maps = blend.finalize(state, jnp.zeros(3, jnp.float64))
            return (
                jnp.sum(col**2)
                + jnp.sum(maps["distortion"])
                + 0.1 * jnp.sum(maps["depth_expected"])
                + 0.1 * jnp.sum(maps["normal"])
                + 0.1 * jnp.sum(maps["depth_median"])
            )

        blend_args = (splats.tmat, splats.color, splats.opacity, splats.normal)
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*blend_args)
        rng = np.random.default_rng(11)
        eps = 1e-6
        for i in range(4):
            v = [jnp.zeros_like(a) for a in blend_args]
            v[i] = jnp.asarray(rng.normal(size=blend_args[i].shape))
            fd = (
                loss(*[a + eps * d for a, d in zip(blend_args, v)])
                - loss(*[a - eps * d for a, d in zip(blend_args, v)])
            ) / (2 * eps)
            analytic = sum(jnp.sum(g * d) for g, d in zip(grads, v))
            np.testing.assert_allclose(analytic, fd, rtol=1e-3, atol=1e-4)


def test_mean2d_offset_gradient_nonzero():
    w = h = 24
    cam = _cam(w, h)
    settings = _settings(w, h, sh_degree=3)
    xyz, scaling, rotation, opacity, features = _random_scene(n=6, seed=3)
    bg = jnp.zeros(3)

    def loss(offset):
        out = render(cam, settings, xyz, scaling, rotation, opacity, features, bg,
                     mean2d_offset=offset)
        return jnp.sum((out["render"] - 0.5) ** 2)

    g = jax.grad(loss)(jnp.zeros((6, 2)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.linalg.norm(g)) > 1e-6
