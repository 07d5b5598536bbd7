"""Per-splat preprocessing: world -> screen surfel transforms.

TPU-native equivalent of the reference rasterizer's `preprocessCUDA` stage
(SURVEY.md §2.10 [RECON]; interface pinned by
/root/reference/gaussian_renderer/__init__.py:37-106). Pure jnp, fully
vectorized over splats — XLA fuses this into a handful of elementwise ops, so
no Pallas is needed here.

Geometry: a surfel maps (u, v, 1) in its tangent plane to homogeneous pixel
coordinates (x*w, y*w, w) through the 3x3 matrix

    T = splat2world[[u-axis, v-axis, center]] @ world2pix[:, [x, y, w]]

(the Python mirror of this composition is gaussian_renderer/__init__.py:66-75).
Column j of T is the coefficient vector a_j with (u,v,1)·a_0 = x*w etc., and
w equals the view-space depth of the plane point.

The projected splat center is made an explicit differentiable intermediate
(`mean2d`), reparametrizing T's third row as ((mean2d + offset) * w, w). The
gradient w.r.t. `offset` is then exactly the reference's screen-space
`means2D.grad` used for densification (train.py:126-131,
scene/gaussian_model.py:405-407), without the side-channel `.retain_grad()`
trick — idiomatic JAX instead.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from tpu2dgs.core import sh as sh_lib
from tpu2dgs.core import transforms
from tpu2dgs.core.cameras import CameraArrays, ndc_to_pix
from tpu2dgs.raster.common import (ALPHA_MIN, CUTOFF, FILTER_INV_SQUARE,
                                   MIN_RADIUS, NEAR_CULL)


class SplatScreen(NamedTuple):
    """Per-splat screen-space quantities consumed by all blend backends."""

    tmat: jnp.ndarray      # (N,3,3) rows [u; v; center]: (u,v,1)@tmat = (xw, yw, w)
    color: jnp.ndarray     # (N,3) RGB from SH at the center view direction
    opacity: jnp.ndarray   # (N,) activated opacity
    normal: jnp.ndarray    # (N,3) view-space unit normal, flipped toward camera
    mean2d: jnp.ndarray    # (N,2) projected center (pixel coords)
    filter_center: jnp.ndarray  # (N,2) CUTOFF-conic AABB center: the
                           # low-pass circle center used by rho2d
    depth: jnp.ndarray     # (N,) view-space center depth (sort key); +inf if culled
    radius: jnp.ndarray    # (N,) int32 screen radius in pixels; 0 if culled
    half_extent: jnp.ndarray  # (N,2) per-axis CUTOFF-conic half extents
                           # (>= the low-pass footprint): the reference's
                           # radii contract
    box_center: jnp.ndarray  # (N,2) binning AABB center — the tight union
    box_half: jnp.ndarray    # (N,2) of the opacity-adaptive te2-conic box
                             # and the low-pass circle box (subset of the
                             # legacy CUTOFF box)
    te2: jnp.ndarray       # (N,) adaptive conic tau^2 for binning:
                           # min(CUTOFF^2, 2 ln(opacity/ALPHA_MIN)),
                           # margin-inflated (coverage test, never blending)
    fr2: jnp.ndarray       # (N,) low-pass circle radius^2 for binning:
                           # 2 ln(opacity/ALPHA_MIN) / FILTER_INV_SQUARE
    visible: jnp.ndarray   # (N,) bool


def conic_bounds(tmat: jnp.ndarray, tau2=None):
    """Screen AABB of the projected tau-sigma disk (default tau = CUTOFF).

    Extremes of the projective map x = (a1·m)/(a3·m) over the homogeneous
    conic u^2+v^2 = tau^2 (dual conic D = diag(tau^2, tau^2, -1)):
      center = (a1^T D a3) / (a3^T D a3),
      half_extent^2 = center^2 - (a1^T D a1)/(a3^T D a3).

    tau2: () or (N,) conic level; None = CUTOFF^2.
    Returns (center (N,2), half_extent (N,2), valid (N,)).
    """
    a1 = tmat[..., :, 0]
    a2 = tmat[..., :, 1]
    a3 = tmat[..., :, 2]
    c2 = CUTOFF * CUTOFF if tau2 is None else tau2
    c2 = jnp.broadcast_to(jnp.asarray(c2, tmat.dtype), tmat.shape[:-2])
    ones = jnp.ones_like(c2)
    d = jnp.stack([c2, c2, -ones], axis=-1)

    def quad(x, y):
        return jnp.sum(x * d * y, axis=-1)

    denom = quad(a3, a3)
    valid = jnp.abs(denom) > 1e-12
    safe = jnp.where(valid, denom, 1.0)
    cx = quad(a1, a3) / safe
    cy = quad(a2, a3) / safe
    ex2 = cx * cx - quad(a1, a1) / safe
    ey2 = cy * cy - quad(a2, a2) / safe
    center = jnp.stack([cx, cy], axis=-1)
    half_extent = jnp.sqrt(jnp.maximum(jnp.stack([ex2, ey2], axis=-1), 1e-4))
    return center, half_extent, valid


def preprocess(
    xyz: jnp.ndarray,          # (N,3)
    scaling: jnp.ndarray,      # (N,2) activated (exp) scales
    rotation: jnp.ndarray,     # (N,4) raw wxyz quaternion
    opacity: jnp.ndarray,      # (N,) activated (sigmoid) opacity
    features: jnp.ndarray,     # (N,K,3) SH coefficients (dc first)
    cam: CameraArrays,
    width: int,
    height: int,
    sh_degree: int,
    mean2d_offset: jnp.ndarray | None = None,  # (N,2) zeros; grad = means2D.grad
    scale_modifier: float = 1.0,
    live: jnp.ndarray | None = None,           # (N,) bool mask for padded slots
    override_color: jnp.ndarray | None = None,  # (N,3)
    axes_override=None,  # (tu, tv, tw) each (N,3): the reference's
                         # cov3D_precomp path (precomputed splat2world basis,
                         # gaussian_renderer/__init__.py:60-75)
) -> SplatScreen:
    n = xyz.shape[0]
    f32 = jnp.float32
    if mean2d_offset is None:
        mean2d_offset = jnp.zeros((n, 2), f32)

    if axes_override is not None:
        tu, tv, tw = axes_override
        tu = tu * scale_modifier
        tv = tv * scale_modifier
    else:
        tu, tv, tw = transforms.splat_axes(scaling * scale_modifier, rotation)

    world2pix = cam.full_proj @ ndc_to_pix(width, height, cam.znear, cam.zfar)
    wp = world2pix[:, jnp.array([0, 1, 3])]  # (4,3): world -> (xw, yw, w)

    row_u = tu @ wp[:3, :]                       # directions: no translation
    row_v = tv @ wp[:3, :]
    row_c = transforms.homogenize(xyz) @ wp      # (N,3) homogeneous pixel center

    # View-space center & frustum cull.
    p_view = transforms.homogenize(xyz) @ cam.world_view
    z = p_view[:, 2]
    in_front = z > NEAR_CULL

    # Differentiable screen center (reparametrized third row).
    wc = row_c[:, 2]
    safe_wc = jnp.where(jnp.abs(wc) > 1e-12, wc, 1.0)
    mean2d = row_c[:, :2] / safe_wc[:, None]
    row_c = jnp.concatenate(
        [(mean2d + mean2d_offset) * wc[:, None], wc[:, None]], axis=-1
    )

    tmat = jnp.stack([row_u, row_v, row_c], axis=-2)  # (N,3,3)

    # Screen bounds (non-differentiable: binning / visibility only).
    center, half_extent, conic_ok = conic_bounds(lax.stop_gradient(tmat))
    radius_f = jnp.maximum(jnp.max(half_extent, axis=-1), MIN_RADIUS)
    radius = jnp.ceil(radius_f).astype(jnp.int32)

    # Opacity-adaptive coverage bounds for binning. A pixel blends only if
    # alpha = opacity*exp(-rho/2) >= ALPHA_MIN, so the conic never matters
    # past tau_a^2 = 2 ln(opacity/ALPHA_MIN) — usually tighter than the
    # fixed CUTOFF sigma AABB the reference bins with [RECON]. The binning
    # box is the union of the te2-conic box and the low-pass circle box
    # (the circle branch of the hit test: rho2d <= tau_a^2). Both levels
    # are inflated by a small margin so the f32 coverage test in the
    # select kernel can only err conservative (false positives blend to
    # exactly zero; a false negative would change outputs).
    op_sg = lax.stop_gradient(opacity)
    tau_a2 = 2.0 * jnp.log(jnp.maximum(op_sg, 1e-12) / ALPHA_MIN)
    te2 = jnp.clip(tau_a2, 1e-6, CUTOFF * CUTOFF) * 1.001 + 1e-5
    fr2 = jnp.maximum(tau_a2, 1e-6) / FILTER_INV_SQUARE * 1.001 + 1e-5
    a_center, a_half, a_ok = conic_bounds(lax.stop_gradient(tmat), te2)
    fr = jnp.sqrt(fr2)[:, None]
    legacy_half = jnp.maximum(half_extent, MIN_RADIUS)
    lo = jnp.where(a_ok[:, None],
                   jnp.minimum(a_center - a_half, center - fr),
                   center - legacy_half)
    hi = jnp.where(a_ok[:, None],
                   jnp.maximum(a_center + a_half, center + fr),
                   center + legacy_half)
    # never wider than the legacy CUTOFF box (it bounds the full hit set)
    lo = jnp.maximum(lo, center - legacy_half)
    hi = jnp.minimum(hi, center + legacy_half)
    box_center = 0.5 * (lo + hi)
    box_half = 0.5 * (hi - lo)

    # Cull splats whose AABB misses the screen entirely.
    on_screen = (
        (center[:, 0] + radius_f >= 0.0)
        & (center[:, 0] - radius_f <= width - 1)
        & (center[:, 1] + radius_f >= 0.0)
        & (center[:, 1] - radius_f <= height - 1)
    )

    visible = in_front & conic_ok & on_screen
    if live is not None:
        visible = visible & live
    radius = jnp.where(visible, radius, 0)
    depth = jnp.where(visible, z, jnp.inf)

    # Color from SH at the center view direction (the rasterizer-internal
    # path; pipe.convert_SHs_python is force-False in the reference,
    # gaussian_renderer/__init__.py:82).
    if override_color is not None:
        color = override_color
    else:
        dirs = transforms.normalize(xyz - cam.cam_center[None, :])
        shs = jnp.swapaxes(features, -1, -2)  # (N,3,K)
        color = jnp.maximum(sh_lib.eval_sh(sh_degree, shs, dirs) + 0.5, 0.0)

    # View-space normal flipped to face the camera (dual-visible surfels).
    n_view = tw @ cam.world_view[:3, :3]
    facing = jnp.sum(p_view[:, :3] * n_view, axis=-1)
    n_view = jnp.where(facing[:, None] < 0.0, n_view, -n_view)

    return SplatScreen(
        tmat=tmat,
        color=color,
        opacity=opacity,
        normal=n_view,
        mean2d=mean2d,
        filter_center=lax.stop_gradient(center),
        depth=depth,
        radius=radius,
        half_extent=legacy_half,
        box_center=box_center,
        box_half=box_half,
        te2=te2,
        fr2=fr2,
        visible=visible,
    )
