"""Tiled (binned XLA) backend: exact equivalence with the oracle, outputs
and gradients (SURVEY.md §4b: fast backends verified allclose vs oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu2dgs.core import cameras
from tpu2dgs.raster.api import RasterSettings, render


def _cam(w, h, fov=np.pi / 2):
    return cameras.Camera(
        uid=0, image_name="t", R=np.eye(3), T=np.zeros(3),
        fovx=fov, fovy=fov, width=w, height=h,
    ).arrays()


def _random_scene(n, seed=0, spread=1.2):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(
        rng.uniform(-spread, spread, (n, 3)) * [1, 1, 0.4] + [0, 0, 2.5],
        jnp.float32,
    )
    scaling = jnp.asarray(np.exp(rng.uniform(-2.5, -0.8, (n, 2))), jnp.float32)
    rotation = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opacity = jnp.asarray(rng.uniform(0.2, 0.95, (n,)), jnp.float32)
    features = jnp.asarray(rng.normal(size=(n, 16, 3)) * 0.3, jnp.float32)
    return xyz, scaling, rotation, opacity, features


KEYS = ["render", "rend_alpha", "rend_normal", "rend_dist",
        "surf_depth", "surf_normal", "depth_median"]


def _settings(w, h, backend, **kw):
    kw.setdefault("sh_degree", 3)
    return RasterSettings(width=w, height=h, backend=backend, **kw)


def test_tiled_matches_oracle_outputs():
    w, h = 72, 56  # not multiples of 16: exercises edge-tile cropping
    cam = _cam(w, h)
    scene = _random_scene(n=200, seed=1)
    bg = jnp.array([0.1, 0.2, 0.3])

    out_o = render(cam, _settings(w, h, "oracle"), *scene, bg)
    out_t = render(
        cam,
        _settings(w, h, "tiled", tile_px=16, coarse_tiles=2,
                  bin_capacity=256, tile_capacity=256),
        *scene, bg,
    )
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(out_t[k]), np.asarray(out_o[k]), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(out_t["visibility_filter"]), np.asarray(out_o["visibility_filter"])
    )


def test_tiled_matches_oracle_gradients():
    w = h = 48
    cam = _cam(w, h)
    scene = _random_scene(n=64, seed=2)
    bg = jnp.array([0.05, 0.05, 0.05])
    n = scene[0].shape[0]

    def make_loss(backend, **kw):
        settings = _settings(w, h, backend, **kw)

        def loss(xyz, scaling, rotation, opacity, features, offset):
            out = render(cam, settings, xyz, scaling, rotation, opacity,
                         features, bg, mean2d_offset=offset)
            # The training objective's shape: photometric + distortion +
            # normal consistency. Raw surf_depth is intentionally excluded:
            # its expected-depth/alpha division is ill-conditioned at
            # alpha->0 pixels (1/alpha^2 gradient amplification, present in
            # the reference too) and only ever consumed through the
            # alpha-damped surf_normal.
            return (
                jnp.sum(out["render"] ** 2)
                + jnp.sum(out["rend_dist"])
                + 0.1 * jnp.sum(out["rend_normal"] * out["surf_normal"])
            )

        return loss

    args = scene + (jnp.zeros((n, 2)),)
    g_o = jax.grad(make_loss("oracle"), argnums=tuple(range(6)))(*args)
    g_t = jax.grad(
        make_loss("tiled", bin_capacity=128, tile_capacity=128),
        argnums=tuple(range(6)),
    )(*args)
    for a, b, name in zip(g_o, g_t, ["xyz", "scl", "rot", "opa", "sh", "off"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5, err_msg=name
        )


def test_tiled_overflow_reported():
    from tpu2dgs.raster import preprocess as pre
    from tpu2dgs.raster.tiled import rasterize_tiled

    w = h = 32
    cam = _cam(w, h)
    xyz, scaling, rotation, opacity, features = _random_scene(n=40, seed=3, spread=0.1)
    splats = pre.preprocess(
        xyz, scaling, rotation, opacity, features, cam, w, h, sh_degree=3
    )
    settings = _settings(w, h, "tiled", tile_px=16, coarse_tiles=2,
                         bin_capacity=64, tile_capacity=8)
    _, _, aux = rasterize_tiled(splats, settings, jnp.zeros(3), return_aux=True)
    assert int(aux["tile_count_max"]) > 8
    assert int(aux["tile_overflow"]) > 0


def test_tiled_jit_and_static_settings():
    w = h = 32
    cam = _cam(w, h)
    scene = _random_scene(n=32, seed=4)
    settings = _settings(w, h, "tiled", bin_capacity=64, tile_capacity=64)

    f = jax.jit(lambda *a: render(cam, settings, *a, jnp.zeros(3))["render"])
    img = f(*scene)
    assert img.shape == (3, h, w)
    assert np.all(np.isfinite(np.asarray(img)))
