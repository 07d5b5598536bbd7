"""Front-to-back surfel alpha blending — the shared compositing math.

Exact semantics of the reference `renderCUDA` tile loop (SURVEY.md §2.10
[RECON], validated against the paper's executable rasterizer spec):

  * perspective-correct ray-splat intersection: for pixel (x,y) the plane
    constraints k = x*a3 - a1 and l = y*a3 - a2 intersect in splat-local
    coordinates (u,v,1) ~ k x l; rho3d = u^2 + v^2,
  * screen-space low-pass: rho2d = 2 * |pix - filter_center|^2 (no gradient),
  * rho = min(rho3d, rho2d); alpha = min(0.99, opacity * exp(-rho/2)),
  * skip alpha < 1/255; a splat that would drop transmittance below 1e-4 is
    NOT blended and permanently terminates the pixel (sticky done flag),
  * median depth = intersection depth of the last blended splat with
    pre-blend transmittance > 0.5,
  * Mip-NeRF-360-style depth distortion accumulated pairwise-incrementally
    over NDC-mapped depth m = far*(t-near)/((far-near)*t), near=0.2, far=100.

The chunk formulation vectorizes the sequential loop: within a chunk of S
splats x P pixels everything is (S,P) dense VPU math; the order dependence is
captured by exclusive cumulative products/sums along S. This is the TPU
answer to CUDA's per-pixel serial loop — identical results, vector ALUs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from tpu2dgs.raster.common import (
    ALPHA_CLAMP,
    ALPHA_MIN,
    CUTOFF,
    DIST_FAR,
    DIST_NEAR,
    FILTER_INV_SQUARE,
    INTERSECT_NEAR,
    MEDIAN_T,
    T_EPS,
)


class PixelState(NamedTuple):
    """Per-pixel compositing state; every leaf has shape (P,) or (P,C)."""

    transmittance: jnp.ndarray  # (P,)
    done: jnp.ndarray           # (P,) bool — sticky early-termination flag
    color: jnp.ndarray          # (P,3)
    depth: jnp.ndarray          # (P,) alpha-weighted expected depth (unnormalized)
    normal: jnp.ndarray         # (P,3) alpha-weighted view-space normal
    median: jnp.ndarray         # (P,)
    m1: jnp.ndarray             # (P,) sum w*m   (distortion accumulators)
    m2: jnp.ndarray             # (P,) sum w*m^2
    distortion: jnp.ndarray     # (P,)


def init_state(num_pixels: int, dtype=jnp.float32) -> PixelState:
    p = num_pixels
    z = jnp.zeros((p,), dtype)
    return PixelState(
        transmittance=jnp.ones((p,), dtype),
        done=jnp.zeros((p,), bool),
        color=jnp.zeros((p, 3), dtype),
        depth=z,
        normal=jnp.zeros((p, 3), dtype),
        median=z,
        m1=z,
        m2=z,
        distortion=z,
    )


def splat_pixel_response(tmat, filter_center, opacity, px, py):
    """Alpha and intersection depth of S splats at P pixels.

    Args:
      tmat: (S,3,3) splat->homogeneous-pixel transforms.
      filter_center: (S,2) screen centers for the low-pass term.
      opacity: (S,)
      px, py: (P,) pixel coordinates.

    Returns:
      alpha: (S,P), depth: (S,P), contrib: (S,P) bool.
    """
    a1 = tmat[:, :, 0][:, None, :]  # (S,1,3)
    a2 = tmat[:, :, 1][:, None, :]
    a3 = tmat[:, :, 2][:, None, :]
    pix = jnp.stack([px, py], axis=-1)[None, :, :]  # (1,P,2)

    k = pix[..., 0:1] * a3 - a1  # (S,P,3)
    m = pix[..., 1:2] * a3 - a2
    # p = k x m (homogeneous intersection point in splat-local coords)
    p_u = k[..., 1] * m[..., 2] - k[..., 2] * m[..., 1]
    p_v = k[..., 2] * m[..., 0] - k[..., 0] * m[..., 2]
    p_w = k[..., 0] * m[..., 1] - k[..., 1] * m[..., 0]
    valid = p_w != 0.0
    inv_w = jnp.where(valid, 1.0, 0.0) / jnp.where(valid, p_w, 1.0)
    su = p_u * inv_w
    sv = p_v * inv_w
    rho3d = su * su + sv * sv

    d = lax.stop_gradient(filter_center)[:, None, :] - pix
    rho2d = FILTER_INV_SQUARE * jnp.sum(d * d, axis=-1)
    rho = jnp.where(rho3d <= rho2d, rho3d, rho2d)

    depth = su * a3[..., 0] + sv * a3[..., 1] + a3[..., 2]

    alpha = jnp.minimum(ALPHA_CLAMP, opacity[:, None] * jnp.exp(-0.5 * rho))
    # Hard CUTOFF-sigma truncation of the conic path: a pixel only responds if
    # it lies inside the projected 3-sigma disk OR inside the low-pass
    # footprint (rho2d governs, and alpha >= 1/255 bounds |d| <= ~2.35px <=
    # MIN_RADIUS). This makes the contribution set exactly representable by
    # the screen AABBs that tile binning uses, so oracle == tiled == pallas.
    inside = (rho3d <= CUTOFF * CUTOFF) | (rho2d <= rho3d)
    contrib = valid & inside & (depth >= INTERSECT_NEAR) & (alpha >= ALPHA_MIN)
    return alpha, depth, contrib


def map_depth(t: jnp.ndarray) -> jnp.ndarray:
    """NDC-map depth to [0,1] for the distortion loss (near 0.2, far 100)."""
    safe = jnp.maximum(t, 1e-6)
    return DIST_FAR * (safe - DIST_NEAR) / ((DIST_FAR - DIST_NEAR) * safe)


def blend_chunk(
    state: PixelState,
    alpha: jnp.ndarray,    # (S,P)
    depth: jnp.ndarray,    # (S,P)
    contrib: jnp.ndarray,  # (S,P) bool
    color: jnp.ndarray,    # (S,3)
    normal: jnp.ndarray,   # (S,3)
) -> PixelState:
    """Composite a depth-ordered chunk of S splats into the pixel state.

    Equivalent to running the serial front-to-back loop splat by splat; the
    serial dependence is closed-form via exclusive cumprod/cumsum along S.
    """
    s = alpha.shape[0]
    contrib = contrib & ~state.done[None, :]
    a = jnp.where(contrib, alpha, 0.0)

    one_minus = 1.0 - a
    # Exclusive cumulative transmittance within the chunk.
    cum_excl = jnp.cumprod(one_minus, axis=0) / one_minus  # may be inf/nan if a=1
    # a is clamped to 0.99 so 1-a >= 0.01: division is safe.
    t_before = state.transmittance[None, :] * cum_excl  # (S,P)

    test_t = t_before * one_minus
    kill = contrib & (test_t < T_EPS)
    has_kill = jnp.any(kill, axis=0)
    first_kill = jnp.where(has_kill, jnp.argmax(kill, axis=0), s)  # (P,)
    idx = jnp.arange(s)[:, None]
    blended = contrib & (idx < first_kill[None, :])

    w = jnp.where(blended, a * t_before, 0.0)  # (S,P)

    # Distortion (needs exclusive prefix sums of w*m and w*m^2).
    m = map_depth(depth)
    wm = w * m
    wm2 = w * m * m
    m1_before = state.m1[None, :] + jnp.cumsum(wm, axis=0) - wm
    m2_before = state.m2[None, :] + jnp.cumsum(wm2, axis=0) - wm2
    acc_before = 1.0 - t_before
    dist_e = w * (m * m * acc_before + m2_before - 2.0 * m * m1_before)

    # Median depth: last blended splat with pre-blend T > 0.5.
    med_cand = blended & (t_before > MEDIAN_T)
    any_med = jnp.any(med_cand, axis=0)
    last_med = s - 1 - jnp.argmax(med_cand[::-1, :], axis=0)  # (P,)
    med_depth = jnp.take_along_axis(depth, last_med[None, :], axis=0)[0]
    median = jnp.where(any_med, med_depth, state.median)

    t_out = state.transmittance * jnp.prod(jnp.where(blended, one_minus, 1.0), axis=0)

    return PixelState(
        transmittance=t_out,
        done=state.done | has_kill,
        color=state.color + jnp.einsum("sp,sc->pc", w, color),
        depth=state.depth + jnp.sum(w * depth, axis=0),
        normal=state.normal + jnp.einsum("sp,sc->pc", w, normal),
        median=median,
        m1=state.m1 + jnp.sum(wm, axis=0),
        m2=state.m2 + jnp.sum(wm2, axis=0),
        distortion=state.distortion + jnp.sum(dist_e, axis=0),
    )


def finalize(state: PixelState, bg_color: jnp.ndarray):
    """Composite background; return (color (P,3), allmap dict of (P,) / (P,3))."""
    color = state.color + state.transmittance[:, None] * bg_color[None, :]
    alpha = 1.0 - state.transmittance
    return color, {
        "depth_expected": state.depth,   # unnormalized (allmap ch0)
        "alpha": alpha,                  # ch1
        "normal": state.normal,          # ch2-4, view space, alpha-weighted
        "depth_median": state.median,    # ch5
        "distortion": state.distortion,  # ch6
    }
