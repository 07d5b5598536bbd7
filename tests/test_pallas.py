"""Pallas fused kernels vs the oracle: outputs and gradients (interpret
mode on CPU; the same kernels compile for TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_tiled import _cam, _random_scene, _settings, KEYS
from tpu2dgs.raster import preprocess as pre
from tpu2dgs.raster.api import render
from tpu2dgs.raster.pallas_backend import rasterize_pallas


def _render_pallas(cam, settings, scene, bg, **kw):
    w, h = settings.width, settings.height
    from tpu2dgs.raster.api import decode_outputs

    splats = pre.preprocess(*scene[:5], cam, w, h, settings.sh_degree, **kw)
    image, allmap = rasterize_pallas(splats, settings, bg, interpret=True)
    return decode_outputs(cam, settings, splats, image, allmap)


def test_pallas_matches_oracle_outputs():
    w, h = 150, 90  # not multiples of (128, 16): exercises edge cropping
    cam = _cam(w, h)
    scene = _random_scene(n=120, seed=21)
    bg = jnp.array([0.15, 0.05, 0.3])
    settings = _settings(w, h, "pallas", bin_capacity=256, tile_capacity=128)

    out_o = render(cam, _settings(w, h, "oracle"), *scene, bg)
    out_p = _render_pallas(cam, settings, scene, bg)
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(out_p[k]), np.asarray(out_o[k]), rtol=2e-4, atol=2e-4,
            err_msg=k,
        )


def test_pallas_early_termination_semantics():
    # opaque stack: front splats saturate; deep splats must be killed
    w, h = 128, 16
    cam = _cam(w, h)
    n = 40
    xyz = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (n, 1)) + jnp.linspace(
        0, 0.5, n)[:, None] * jnp.array([[0.0, 0.0, 1.0]])
    scaling = jnp.full((n, 2), 0.8)
    rotation = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1))
    opacity = jnp.full((n,), 0.99)
    features = jnp.zeros((n, 16, 3)).at[:, 0, :].set(0.8)
    scene = (xyz, scaling, rotation, opacity, features)
    bg = jnp.zeros(3)

    out_o = render(cam, _settings(w, h, "oracle"), *scene, bg)
    out_p = _render_pallas(
        cam, _settings(w, h, "pallas", bin_capacity=64, tile_capacity=64),
        scene, bg)
    np.testing.assert_allclose(
        np.asarray(out_p["render"]), np.asarray(out_o["render"]),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_p["rend_alpha"]), np.asarray(out_o["rend_alpha"]),
        rtol=1e-5, atol=1e-5)


def test_pallas_gradients_match_oracle():
    w, h = 128, 32
    cam = _cam(w, h)
    scene = _random_scene(n=48, seed=22)
    bg = jnp.array([0.05, 0.05, 0.05])

    def loss_terms(out):
        return (
            jnp.sum(out["render"] ** 2)
            + jnp.sum(out["rend_dist"])
            + 0.1 * jnp.sum(out["rend_normal"] * out["surf_normal"])
            + 0.05 * jnp.sum(out["depth_median"])
        )

    def loss_o(*args):
        return loss_terms(render(cam, _settings(w, h, "oracle"), *args, bg))

    def loss_p(*args):
        return loss_terms(_render_pallas(
            cam, _settings(w, h, "pallas", bin_capacity=64, tile_capacity=64),
            args, bg))

    g_o = jax.grad(loss_o, argnums=(0, 1, 2, 3, 4))(*scene)
    g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(*scene)
    for a, b, name in zip(g_o, g_p, ["xyz", "scl", "rot", "opa", "sh"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-3, atol=3e-5, err_msg=name
        )


def test_pallas_grad_pack_truncation_is_clean():
    """Global packed-gradient overflow must DROP tails, never corrupt:
    with pack_cap >= demand the gradients are invariant to pack_cap; with
    pack_cap < demand the overflow flag is set, gradients stay finite,
    and no gradient grows (dropped rows only remove contributions)."""
    w, h = 128, 64
    cam = _cam(w, h)
    scene = _random_scene(n=200, seed=31)
    bg = jnp.zeros(3)

    def grads(pack_cap):
        # debug=True -> the public API runs the pallas path in interpret
        # mode and maps the _aux_ diagnostics into the out dict
        s = _settings(w, h, "pallas", bin_capacity=256, tile_capacity=256,
                      grad_pack_capacity=pack_cap, debug=True)

        def loss(*args):
            out = render(cam, s, *args, bg)
            return jnp.sum(out["render"] ** 2) + jnp.sum(out["rend_dist"])

        g = jax.grad(loss, argnums=(0, 3))(*scene)
        out = render(cam, s, *scene, bg)
        return g, float(out["grad_pack_overflow_frac"]), \
            float(out["grad_pack_max"])

    g_big, ovf_big, demand = grads(8192)
    assert ovf_big == 0.0
    # demand-sized cap: bit-identical gradients (lane-round up)
    cap_fit = max(128, -(-int(demand) // 128) * 128)
    g_fit, ovf_fit, demand_fit = grads(cap_fit)
    assert ovf_fit == 0.0 and demand_fit == demand
    for a, b in zip(g_big, g_fit):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # under-capacity: flagged, finite, never corrupting other rows
    cap_small = max(128, (int(demand) // 2) // 128 * 128)
    g_small, ovf_small, demand_small = grads(cap_small)
    assert ovf_small == 1.0 and demand_small == demand
    for a in g_small:
        assert np.all(np.isfinite(np.asarray(a)))


def test_effective_counts_respect_early_exit():
    from tpu2dgs.raster import pallas_backend as pb

    counts = jnp.array([300, 64, 0, 5], jnp.int32)
    # out channel 12 = last contributor plane per tile
    out = jnp.full((4, 16, 2, 2), -1.0)
    out = out.at[0, 12].set(130.0)  # walked into the 2nd GROUP of 128
    out = out.at[1, 12, 0, 0].set(63.0)  # within the 1st GROUP
    # tile 2: never blended (-1) -> 0 rows; tile 3: no contributor -> 0
    # (effective counts are GROUP=128-aligned: the backward DMAs whole
    # 128-entry groups into the packed array)
    eff = np.asarray(pb._effective_counts(counts, out, 128))
    np.testing.assert_array_equal(eff, [256, 128, 0, 0])
    off = np.asarray(pb._packed_offsets(counts, out, 128))
    np.testing.assert_array_equal(off, [0, 256, 384, 384])


def test_pallas_mean2d_offset_gradient():
    w, h = 128, 16
    cam = _cam(w, h)
    scene = _random_scene(n=12, seed=23)
    bg = jnp.zeros(3)
    settings = _settings(w, h, "pallas", bin_capacity=32, tile_capacity=32)

    def loss(offset):
        out = _render_pallas(cam, settings, scene, bg, mean2d_offset=offset)
        return jnp.sum((out["render"] - 0.5) ** 2)

    g = jax.grad(loss)(jnp.zeros((12, 2)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.linalg.norm(g)) > 1e-6


def test_pallas_group_unaligned_capacity():
    """A tile capacity that is an odd multiple of 128 (e.g. an
    adaptive-growth 384 or 13440) must still blend correctly: with
    GROUP=256 staging, an unrounded capk made the LAST record group's DMA
    slice run past the block — silently blending wrong records with zero
    overflow reported (round-5 review finding; _round_group now aligns
    capk to the staging group). Deep tiles (counts > 256) force the
    multi-group walk that exposed it."""
    w, h = 128, 32
    cam = _cam(w, h)
    # pile many splats into the same tiles so counts exceed 2 groups
    xyz, scaling, rotation, opacity, features = _random_scene(n=400, seed=31)
    xyz = xyz.at[:, :2].set(xyz[:, :2] * 0.15)
    scene = (xyz, scaling, rotation, opacity, features)
    bg = jnp.array([0.1, 0.2, 0.05])

    out_o = render(cam, _settings(w, h, "oracle"), *scene, bg)
    settings = _settings(w, h, "pallas", bin_capacity=512,
                         tile_capacity=384, debug=True)  # 384 % 256 != 0
    out_p = render(cam, settings, *scene, bg)
    # capacity-truncated tiles can differ from the oracle legitimately;
    # require zero overflow so the comparison is exact
    assert float(out_p["tile_overflow_frac"]) == 0.0, "test needs caps >= demand"
    assert float(out_p["tile_count_max"]) > 256, "test needs a multi-group walk"
    for k in ["render", "rend_alpha", "depth_median", "rend_dist"]:
        np.testing.assert_allclose(
            np.asarray(out_p[k]), np.asarray(out_o[k]), rtol=2e-4, atol=2e-4,
            err_msg=k,
        )
