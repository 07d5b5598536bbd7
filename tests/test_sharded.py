"""Multi-device rendering on the 8-virtual-CPU mesh (conftest sets
xla_force_host_platform_device_count=8): sharded == single-device, outputs
and gradients (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu2dgs.parallel.sharded import make_mesh
from tpu2dgs.raster.api import RasterSettings, render
from tests.test_tiled import _cam, _random_scene, _settings, KEYS


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_matches_single_device(mesh8):
    w, h = 64, 80  # 5 tile rows over 8 devices: uneven, padded strips
    cam = _cam(w, h)
    scene = _random_scene(n=150, seed=11)
    bg = jnp.array([0.2, 0.1, 0.0])
    settings = _settings(w, h, "tiled", bin_capacity=256, tile_capacity=256,
                         coarse_tiles=1)

    out_1 = render(cam, settings, *scene, bg)
    out_8 = jax.jit(
        lambda *a: render(cam, settings, *a, bg, mesh=mesh8)
    )(*scene)
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(out_8[k]), np.asarray(out_1[k]), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


def test_sharded_gradients_match(mesh8):
    w = h = 64
    cam = _cam(w, h)
    scene = _random_scene(n=64, seed=12)
    bg = jnp.zeros(3)
    settings = _settings(w, h, "tiled", bin_capacity=128, tile_capacity=128,
                         coarse_tiles=2)

    def make_loss(mesh):
        def loss(xyz, scaling, rotation, opacity, features):
            out = render(cam, settings, xyz, scaling, rotation, opacity,
                         features, bg, mesh=mesh)
            return (
                jnp.sum(out["render"] ** 2)
                + jnp.sum(out["rend_dist"])
                + 0.1 * jnp.sum(out["rend_normal"] * out["surf_normal"])
            )
        return loss

    g1 = jax.grad(make_loss(None), argnums=(0, 1, 3))(*scene)
    g8 = jax.jit(jax.grad(make_loss(mesh8), argnums=(0, 1, 3)))(*scene)
    for a, b, name in zip(g1, g8, ["xyz", "scaling", "opacity"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5, err_msg=name
        )


def test_sharded_pallas_matches_single_device(mesh8):
    """Pallas strips under shard_map == single-device pallas (interpret)."""
    w, h = 128, 128  # 8 tile rows over 8 devices: 4-row strips (2 devs idle-ish)
    cam = _cam(w, h)
    scene = _random_scene(n=96, seed=13)
    bg = jnp.array([0.1, 0.0, 0.2])
    settings = _settings(w, h, "pallas", bin_capacity=128, tile_capacity=128,
                         debug=True)

    out_1 = jax.jit(lambda *a: render(cam, settings, *a, bg))(*scene)
    out_8 = jax.jit(
        lambda *a: render(cam, settings, *a, bg, mesh=mesh8)
    )(*scene)
    for k in ["render", "rend_alpha", "rend_normal", "depth_median"]:
        np.testing.assert_allclose(
            np.asarray(out_8[k]), np.asarray(out_1[k]), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


def test_splat_sharded_matches_single_device(mesh8):
    """Gaussian parallelism: splat params sharded over 8 devices must
    reproduce single-device pallas outputs AND parameter gradients (the
    all-gather transpose is the splat-grad reduce-scatter)."""
    w, h = 128, 128
    cam = _cam(w, h)
    scene = _random_scene(n=128, seed=14)  # 16 splats per device
    bg = jnp.array([0.05, 0.1, 0.15])
    settings = _settings(w, h, "pallas", bin_capacity=128, tile_capacity=128,
                         debug=True)

    out_1 = jax.jit(lambda *a: render(cam, settings, *a, bg))(*scene)
    out_8 = jax.jit(
        lambda *a: render(cam, settings, *a, bg, mesh=mesh8,
                          shard_splats=True)
    )(*scene)
    for k in ["render", "rend_alpha", "rend_normal", "depth_median",
              "rend_dist", "surf_depth"]:
        np.testing.assert_allclose(
            np.asarray(out_8[k]), np.asarray(out_1[k]), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )
    # per-splat outputs keep the global (unsharded) order
    np.testing.assert_array_equal(
        np.asarray(out_8["radii"]), np.asarray(out_1["radii"]))

    def make_loss(mesh, shard):
        def loss(xyz, scaling, rotation, opacity, features):
            out = render(cam, settings, xyz, scaling, rotation, opacity,
                         features, bg, mesh=mesh, shard_splats=shard)
            return (
                jnp.sum(out["render"] ** 2)
                + jnp.sum(out["rend_dist"])
                + 0.1 * jnp.sum(out["rend_normal"] * out["surf_normal"])
            )
        return loss

    g1 = jax.grad(make_loss(None, False), argnums=(0, 1, 3, 4))(*scene)
    g8 = jax.jit(
        jax.grad(make_loss(mesh8, True), argnums=(0, 1, 3, 4)))(*scene)
    # atol looser than the row-sharded test: the all-gather transpose
    # (psum-scatter) reorders the f32 gradient accumulation across
    # devices, so near-cancelling elements carry ~1e-4 noise.
    for a, b, name in zip(g1, g8, ["xyz", "scaling", "opacity", "sh"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=3e-4, err_msg=name
        )
