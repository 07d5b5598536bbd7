"""Quaternion / surfel geometry transforms.

Conventions match the reference (so checkpoints interoperate):
  * quaternions are (w, x, y, z), un-normalized in the parameter store,
    normalized on use (reference utils/general_utils.py:78-97).
  * `splat_axes` returns the two scaled tangent axes t_u, t_v and the unit
    normal t_w: columns 0/1/2 of R(q) scaled by (s_u, s_v, 1) — the rows of
    the reference's 4x4 splat2world (scene/gaussian_model.py:27-33).

All functions are elementwise over a leading batch dim and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` (torch F.normalize semantics: clamped norm)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix.

    Normalizes the quaternion first (reference utils/general_utils.py:78-97).
    """
    q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def splat_axes(scaling: jnp.ndarray, rotation: jnp.ndarray):
    """Per-splat world-space frame.

    Args:
      scaling: (..., 2) activated tangential scales (s_u, s_v).
      rotation: (..., 4) wxyz quaternion (not necessarily normalized).

    Returns:
      (tu, tv, tw): each (..., 3). tu = s_u * R[:,0], tv = s_v * R[:,1],
      tw = R[:,2] (unit normal). These are rows 0..2 of the reference's
      splat2world 4x4 (scene/gaussian_model.py:27-33, with third scale = 1).
    """
    R = quat_to_rotmat(rotation)
    tu = R[..., :, 0] * scaling[..., 0:1]
    tv = R[..., :, 1] * scaling[..., 1:2]
    tw = R[..., :, 2]
    return tu, tv, tw


def homogenize(p: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 4) with trailing 1."""
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))
