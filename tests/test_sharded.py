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


def test_sharded_pallas_static_strips_match(mesh8):
    """row_balance="static" (fixed equal-height strips) stays exact too —
    the fallback mode must not rot behind the balanced default."""
    w, h = 128, 128
    cam = _cam(w, h)
    scene = _random_scene(n=96, seed=13)
    bg = jnp.array([0.1, 0.0, 0.2])
    settings = _settings(w, h, "pallas", bin_capacity=128, tile_capacity=128,
                         debug=True, row_balance="static")

    out_1 = jax.jit(lambda *a: render(cam, settings, *a, bg))(*scene)
    out_8 = jax.jit(
        lambda *a: render(cam, settings, *a, bg, mesh=mesh8)
    )(*scene)
    for k in ["render", "rend_alpha", "depth_median"]:
        np.testing.assert_allclose(
            np.asarray(out_8[k]), np.asarray(out_1[k]), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )


def test_sharded_work_balance_beats_static(mesh8):
    """The load-balance point of row_balance="work": on a scene whose
    splats pile into one horizontal band, static strips put ~all work on
    the band's devices while balanced windows split it ~evenly. strip_work
    (the all-gathered per-device diagnostic) must show max/mean near 1 for
    "work" and >> 1 for "static"."""
    w, h = 128, 256  # 16 tile rows over 8 devices
    cam = _cam(w, h)
    xyz, scaling, rotation, opacity, features = _random_scene(n=96, seed=21)
    # squash all splats into a thin band near the image-center rows
    xyz = xyz.at[:, 1].set(xyz[:, 1] * 0.05)
    scene = (xyz, scaling, rotation, opacity, features)
    bg = jnp.zeros(3)

    works = {}
    for mode in ("static", "work"):
        settings = _settings(w, h, "pallas", bin_capacity=128,
                             tile_capacity=128, debug=True, row_balance=mode)
        out = jax.jit(
            lambda *a, s=settings: render(cam, s, *a, bg, mesh=mesh8)
        )(*scene)
        works[mode] = np.asarray(out["strip_work"])
    # identical total entries either way (same global tile set)
    assert works["static"].sum() == pytest.approx(works["work"].sum())
    total = works["work"].sum()
    assert total > 0
    imb = {m: v.max() / (v.sum() / len(v)) for m, v in works.items()}
    # At this toy scale the granularity floor binds (a single tile row
    # can't be split), so assert a large RELATIVE improvement; the probe
    # (scripts/strip_balance_probe.py) covers production scale, where 50
    # rows over 8 devices reach ~1.1.
    assert imb["work"] < 0.7 * imb["static"], (imb, works)
    assert imb["static"] > 2.5, (imb, works)


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


def test_splat_sharded_routed_exchange_matches(mesh8):
    """Strip-routed all_to_all exchange (xfer_capacity > 0) must reproduce
    the all-gather path exactly at sufficient capacity — outputs AND
    parameter gradients — in both row_balance modes, with a zero xfer
    overflow counter. (Overflow dropping needs k_loc > 128 to be
    reachable — the volume model + counter at scale are covered by
    scripts/collective_probe.py.)"""
    w, h = 128, 128
    cam = _cam(w, h)
    scene = _random_scene(n=128, seed=15)  # k_loc = 16 per device
    bg = jnp.array([0.05, 0.1, 0.15])

    def run(xfer, mode, grad=False):
        settings = _settings(w, h, "pallas", bin_capacity=128,
                             tile_capacity=128, debug=True,
                             row_balance=mode, xfer_capacity=xfer)
        if not grad:
            return jax.jit(
                lambda *a: render(cam, settings, *a, bg, mesh=mesh8,
                                  shard_splats=True))(*scene)

        def loss(xyz, scaling, rotation, opacity, features):
            out = render(cam, settings, xyz, scaling, rotation, opacity,
                         features, bg, mesh=mesh8, shard_splats=True)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["rend_dist"])
        return jax.jit(jax.grad(loss, argnums=(0, 1, 3)))(*scene)

    for mode in ("work", "static"):
        ref = run(0, mode)
        routed = run(128, mode)  # >= k_loc: exact
        for k in ["render", "rend_alpha", "rend_normal", "depth_median",
                  "rend_dist"]:
            np.testing.assert_allclose(
                np.asarray(routed[k]), np.asarray(ref[k]),
                rtol=1e-5, atol=1e-6, err_msg=(mode, k))
        assert float(routed["xfer_overflow_frac"]) == 0.0

    g_ref = run(0, "work", grad=True)
    g_rt = run(128, "work", grad=True)
    for a, b, name in zip(g_ref, g_rt, ["xyz", "scaling", "opacity"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=3e-4,
            err_msg=name)
